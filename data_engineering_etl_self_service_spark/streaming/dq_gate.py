"""Streaming DQ gate: per-micro-batch quality checks with branch routing.

The reference runs DQ only on batch landings (S3 → pandas → checks,
ref: operators/data_quality_operator.py:54-129); its streaming path
(kafka_stream → Spark job) ships with NO quality gate at all. This module
closes that gap: the SAME check vocabulary the YAML pipelines use
(operators/quality.py — min_row_count, unique_column, non_null, ...) runs
inside ``foreachBatch``, and each micro-batch is routed whole to the
publish table or the quarantine table.

Semantics (deliberately batch-atomic):

- A batch either passes all checks and publishes, or fails any and
  quarantines IN FULL — mirroring the batch pipeline's branch (bad data
  is never visible to consumers, but kept for forensics). Row-level
  splitting is a transformation concern, not a gate concern.
- Both destinations are versioned snapshot tables committed with the
  epoch's batch_id, so the gate inherits exactly-once across restarts
  from ``snapshot_batch_sink``'s replay skip — a replayed epoch is
  detected in EITHER table and skipped in both.
- The alert callback fires per failed batch with the structured DQReport
  (the reference's Slack hook shape, ref: dags/dag_factory.py:80-87).

Scale: run_checks fuses all checks into ONE aggregate over the batch, so
the gate adds a single job per micro-batch regardless of check count.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators.quality import DQReport, run_checks
from ..sources.snapshots import last_committed_batch, write_snapshot

AlertFn = Callable[[int, DQReport], None]


def dq_gated_batch_sink(
    publish_dir: str,
    quarantine_dir: str,
    checks: list[dict],
    alert: AlertFn | None = None,
):
    """``foreachBatch`` body: fused DQ evaluation, then batch-atomic
    routing into versioned publish/quarantine snapshot tables.

    Usage::

        stream.writeStream.foreachBatch(
            dq_gated_batch_sink(pub, quar, checks, alert)
        ).option("checkpointLocation", ckpt).start()
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        last_pub = last_committed_batch(publish_dir)
        last_quar = last_committed_batch(quarantine_dir)
        seen = max(
            (b for b in (last_pub, last_quar) if b is not None),
            default=None,
        )
        if seen is not None and batch_id <= seen:
            return  # replayed epoch — already routed, skip
        report = run_checks(batch_df, list(checks), count_rows=True)
        target = publish_dir if report.passed else quarantine_dir
        write_snapshot(
            batch_df,
            target,
            meta={
                "batch_id": batch_id,
                "dq_passed": report.passed,
                "dq_n_rows": report.n_rows,
                "dq_failures": report.failures,
            },
        )
        if not report.passed and alert is not None:
            alert(batch_id, report)

    return _write
