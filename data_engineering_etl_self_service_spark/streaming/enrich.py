"""Streaming temporal enrichment: attach the dimension attribute that
was valid AT EACH FACT'S OWN EVENT TIME to a fact stream — the
continuous-ingest shape of the batch ``point_in_time_join``.

The batch form resolves "latest interval start <= fact time" with a
window-based as-of carry; a stream can't run that window (arbitrary
per-fact windows are unsupported in append mode). The streaming shape
instead CLOSES the intervals first — one batch-side ``lead`` turns the
SCD2 change log into half-open [valid_from, valid_to_excl) rows, so
every fact matches EXACTLY ONE interval and the lookup becomes a plain
stream-static join with a range predicate. No per-fact dedup, no state:
the join is stateless because the static side is already unambiguous.

Scale: the dimension is the small side (an SCD2 history is |entities| ×
|changes|, not fact-sized) — Spark broadcasts it per micro-batch, so
the stream side never shuffles; re-planning each batch also picks up a
refreshed dimension snapshot when the static source is a versioned
table (the standard slowly-changing-enrichment deployment). Equal
``valid_from`` duplicates collapse deterministically to the latest
island (max tiebreak column) BEFORE closing, same rule as the batch
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def close_intervals(
    dim: DataFrame,
    on: str,
    t_col: str = "valid_from",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """SCD2 change rows -> half-open interval rows.

    Input: one row per attribute regime with its start ``t_col``.
    Output: input columns + ``valid_to_excl`` (the next regime's start;
    NULL for the current regime). Rows sharing (key, t_col) ALWAYS
    collapse first — to the greatest ``tiebreak_col`` when given, else
    to the greatest remaining-column struct (stable either way) — so
    downstream range joins are single-match by construction.
    """
    d = dim
    # ALWAYS collapse (key, t_col) duplicates — leaving two rows at the
    # same instant makes lead() tie-dependent (one would get an empty
    # [t, t) interval chosen by partition nondeterminism). With no
    # tiebreak_col the survivor is still deterministic: greatest
    # remaining-column struct wins (an arbitrary but stable total
    # order).
    if tiebreak_col is not None:
        order = F.desc(tiebreak_col)
    else:
        rest = [c for c in d.columns if c not in (on, t_col)]
        order = F.desc(F.struct(*rest)) if rest else F.lit(1).asc()
    w_tie = Window.partitionBy(on, t_col).orderBy(order)
    d = (
        d.withColumn("_rn", F.row_number().over(w_tie))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w = Window.partitionBy(on).orderBy(t_col)
    return d.withColumn("valid_to_excl", F.lead(t_col).over(w))


def temporal_enrich_stream(
    facts: DataFrame,
    dim_closed: DataFrame,
    on: str,
    ts_col: str = "ts",
    t_col: str = "valid_from",
) -> DataFrame:
    """Stream-static point-in-time join: each streaming fact picks up
    the dimension row whose [t_col, valid_to_excl) interval contains
    its ``ts_col``. Facts before the entity's first interval are
    dropped (inner semantics, like the batch as-of). ``dim_closed``
    comes from :func:`close_intervals`."""
    d = dim_closed.withColumnRenamed(on, f"_{on}")
    cond = (
        (facts[on] == d[f"_{on}"])
        & (facts[ts_col] >= d[t_col])
        & (d["valid_to_excl"].isNull() | (facts[ts_col] < d["valid_to_excl"]))
    )
    return facts.join(d, cond, "inner").drop(f"_{on}")
