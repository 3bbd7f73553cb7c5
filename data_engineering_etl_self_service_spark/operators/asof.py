"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row of the same key with
``right.ts <= left.ts``. Two implementations:

- :func:`asof_join` (default): union both sides with a side marker, ONE
  window pass per user ordered by (ts, side, tiebreaks) carrying the last
  non-null right-side payload forward (``last(..., ignorenulls=True)``),
  then keep left rows. ONE shuffle on the key, no join at all — this is the
  100 TB shape: cost is a sort within key partitions, immune to the
  row-explosion an inequality join would cause.
- :func:`asof_join_pandas`: per-key ``pd.merge_asof`` via ``applyInPandas``
  (Arrow-batched). Kept as the fallback for semantics the window trick
  can't express (nearest-direction, tolerance windows).

Equal timestamps: the right row sorts BEFORE the left row (marker order),
matching the inclusive (>=) semantics of DuckDB/pandas as-of joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """Inclusive backward as-of join, window-based (one shuffle, no join).

    Returns all ``left`` columns plus ``<ts_col><suffix>`` and each
    requested right column as ``<col><suffix>``; left rows with no earlier
    right row are DROPPED (inner semantics, like SQL ASOF JOIN).
    """
    carry = [ts_col, *right_cols]
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carry],
    )
    r = right.select(
        *[
            F.col(c) if c in (on, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in carry
        ],
    )
    out = carried.filter(F.col("_side") == 1).filter(
        F.col(f"{ts_col}{suffix}").isNotNull()
    )
    return out.drop("_side", *[f"_r_{c}" for c in carry])


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """Per-key ``pd.merge_asof`` via ``applyInPandas`` (inner, backward).

    Arrow-batched fallback for variants the window form can't express.
    """
    import pandas as pd

    carry = [ts_col, *right_cols]
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    for c in carry:
        out_fields.append(f"{c}{suffix} {right.schema[c].dataType.simpleString()}")
    out_schema = ", ".join(out_fields)

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(on, *carry).withColumn("_side", F.lit(0))

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["_side"] == 1].drop(columns=["_side"]).sort_values(ts_col)
        rpdf = (
            pdf[pdf["_side"] == 0][[on, *carry]]
            .sort_values(ts_col)
            .rename(columns={c: f"{c}{suffix}" for c in carry})
        )
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame(columns=[*lpdf.columns, *[f"{c}{suffix}" for c in carry]])
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=ts_col,
            right_on=f"{ts_col}{suffix}",
            by=on,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged.dropna(subset=[f"{ts_col}{suffix}"])

    cols = list(dict.fromkeys([*lt.columns, *rt.columns]))
    lt_full = lt.select(*[F.col(c) if c in lt.columns else F.lit(None).alias(c) for c in cols])
    rt_full = rt.select(*[F.col(c) if c in rt.columns else F.lit(None).alias(c) for c in cols])
    return (
        lt_full.unionByName(rt_full)
        .groupBy(on)
        .applyInPandas(per_key, schema=out_schema)
    )
