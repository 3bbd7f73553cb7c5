"""Python UDTF surface (Spark 4 user-defined table functions).

The reference's only extensibility point is the DQ check registry
(ref: operators/data_quality_operator.py:77-117) — driver-side Python. Our
engine's equivalent of "custom logic that emits rows" is the Spark 4 UDTF:
a class whose ``eval`` yields zero-or-more output rows per input row,
usable from SQL via ``LATERAL``.

Design stance (matches SURVEY §2.10): UDTFs are the SLOW path —
row-at-a-time Python with serialization per row. They are the right tool
only when per-row logic is genuinely imperative AND the row fan-out is
variable. The shipped example, :class:`TokenRuns`, detects maximal runs of
a consecutively-repeated token (degenerate-repetition spans in training
text — the span-level refinement of the corpus-level ``repetition_signals``
query). Its output is also expressible as a gaps-and-islands SQL query,
which is exactly what makes it hash-oracle-checkable — and what you would
actually run at 100 TB; the UDTF exists to pin the extension surface, and
its arrow-batched variant (``useArrow=True``) to make the slow path as
fast as it gets.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id bigint, token string, run_start bigint, run_len bigint")
class TokenRuns:
    """Maximal runs of >= 3 identical consecutive whitespace tokens.

    ``run_start`` is the 1-based word position of the first token of the
    run. Emits nothing for documents without such runs (variable fan-out —
    the thing a scalar UDF cannot do)."""

    MIN_RUN = 3

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        toks = text.split()
        i, n = 0, len(toks)
        while i < n:
            j = i
            while j < n and toks[j] == toks[i]:
                j += 1
            if j - i >= self.MIN_RUN:
                yield (doc_id, toks[i], i + 1, j - i)
            i = j


def register_udtfs(spark) -> None:
    """Register all engine UDTFs in the session's SQL function registry."""
    spark.udtf.register("token_runs", TokenRuns)
