"""Greedy coverage-based data selection (submodular set cover).

North-star curation operator (no counterpart in the reference): pick the
documents that cover the most yet-uncovered vocabulary — the classical
greedy algorithm for maximum coverage / set cover (Nemhauser-Wolsey-
Fisher 1978: greedy achieves a (1 - 1/e) guarantee for monotone
submodular objectives), which is the workhorse behind
diversity-maximizing corpus pruning and eval-set selection in
training-data pipelines.

Why this distributes despite being iterative (the k-means / BPE /
PageRank discipline):

- The corpus collapses ONCE to the distinct (doc, token) incidence table
  — the only data-sized shuffle.
- Per pick: one anti-join against the covered-token set (broadcast — it
  grows by at most one doc's vocabulary per round, bounded by
  picks x max-doc-tokens), one map-side-combined per-doc gain count, and
  a 1-row argmax collect (the bounded driver artifact).
- The covered set re-materializes per round via localCheckpoint, so pick
  T never replans picks 1..T-1.

Determinism: argmax tiebreak is (gain DESC, doc_id ASC); both that and
the anti-join are reproduced exactly by the unrolled-CTE DuckDB oracle
(queries.py `corpus_cover_picks`), so the selected documents hash-match
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..runtime import truncate_lineage, truncate_lineage_lazy


def greedy_set_cover(
    incidence: DataFrame,
    n_picks: int,
    id_col: str = "doc_id",
    item_col: str = "tok",
) -> list[tuple[int, object, int]]:
    """Greedily pick ``n_picks`` ids maximizing new-item coverage.

    ``incidence``: distinct (id, item) pairs. Returns
    [(pick_rank, id, gain)] in pick order; stops early when nothing new
    is coverable. Ties break on ascending id.
    """
    inc = incidence.select(
        F.col(id_col).alias("_id"), F.col(item_col).alias("_it")
    ).persist()
    inc.count()
    spark = incidence.sparkSession
    it_type = dict(inc.dtypes)["_it"]
    covered = spark.createDataFrame([], schema=f"_it {it_type}")
    picks: list[tuple[int, object, int]] = []
    for rank in range(1, n_picks + 1):
        gains = (
            inc.join(F.broadcast(covered), "_it", "left_anti")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("_id"))
            .limit(1)
            .collect()
        )
        if not gains or gains[0]["gain"] == 0:
            break
        doc, gain = gains[0]["_id"], gains[0]["gain"]
        picks.append((rank, doc, gain))
        covered = (
            covered.unionByName(
                inc.filter(F.col("_id") == doc).select("_it")
            )
            .distinct()
            .transform(truncate_lineage_lazy)
        )
    inc.unpersist()
    return picks
