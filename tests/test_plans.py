"""Plan-shape regression tests: the physical properties SCALE.md promises.

These assert on the executed plan string, so a refactor that silently
loses predicate pushdown, broadcasts, or single-shuffle sessionization
fails CI instead of shipping a 100 TB regression.
"""

from __future__ import annotations

import pytest

from data_engineering_etl_self_service_spark.queries import QUERIES


def _plan(spark, name, sf_dir, mode="formatted"):
    df = QUERIES[name](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_q6_filters_pushed_and_columns_pruned(spark, sf_dir):
    plan = _plan(spark, "revenue_forecast", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # pruned scan: only the 4 needed columns of lineitem's 11
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate" in plan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, "regional_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def _op_count(plan: str, op: str) -> int:
    """Count physical operators in formatted-explain detail entries."""
    import re

    return len(re.findall(rf"^\(\d+\) {op}\b", plan, flags=re.M))


def _data_exchanges(plan: str) -> int:
    """Exchanges excluding the scale-adaptive scan-spread repartition
    (runtime.spread_scan): a spread plans as REPARTITION_BY_NUM, while
    every data-required shuffle (aggs, joins, windows) plans as
    ENSURE_REQUIREMENTS — and the spread is identity at real scan
    parallelism, so the data-exchange count is the 100 TB plan shape."""
    return _op_count(plan, "Exchange") - plan.count("REPARTITION_BY_NUM")


def test_sessionization_single_shuffle(spark, sf_dir):
    plan = _plan(spark, "sessionize_stats", sf_dir)
    assert _op_count(plan, "Exchange") == 1, plan


def test_funnel_depth_does_not_add_shuffles(spark, sf_dir):
    plan = _plan(spark, "funnel", sf_dir)
    # one user exchange + the final single-row aggregate exchange
    assert _op_count(plan, "Exchange") <= 2
    assert _op_count(plan, "Window") == 3  # 3 funnel steps


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(spark, "topk_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_shipping_priority_broadcasts_and_takeordered(spark, sf_dir):
    plan = _plan(spark, "shipping_priority", sf_dir)
    assert _op_count(plan, "BroadcastHashJoin") >= 1
    assert "TakeOrderedAndProject" in plan
    # all three per-table filters reach the scans
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    plan = _plan(spark, "chunk_documents", sf_dir)
    assert _op_count(plan, "Exchange") == 0, plan


def test_large_orders_reuses_orderkey_exchange(spark, sf_dir):
    # lineitem is shuffled on l_orderkey once for the HAVING list and once
    # for the outer agg — the second must be a ReusedExchange (or AQE twin)
    plan = _plan(spark, "large_orders", sf_dir)
    assert "ReusedExchange" in plan or _op_count(plan, "Exchange") <= 3, plan


def test_pack_sequences_single_shard_shuffle(spark, sf_dir):
    plan = _plan(spark, "pack_sequences", sf_dir)
    # one hash exchange on shard for the cumsum window; no global sort
    assert _op_count(plan, "Exchange") == 1, plan


def test_scd2_history_single_exchange(spark, sf_dir):
    """Both islands row_numbers AND the final groupBy must share one
    hashpartitioning(o_custkey) exchange."""
    plan = _plan(spark, "scd2_history", sf_dir)
    assert _op_count(plan, "Exchange") == 1, plan


def test_centroid_outliers_broadcasts_centroids(spark, sf_dir):
    plan = _plan(spark, "centroid_outliers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sq_ann_broadcasts_queries_no_shuffle_scan(spark, sf_dir):
    """SQ8 scoring: queries broadcast (BroadcastNestedLoop over the !=
    condition), corpus side scans without a pre-join DATA exchange.
    The scale-adaptive scan spread (REPARTITION_BY_NUM on vec_id,
    identity at real scan parallelism — opt r13 idle A/B 4.7×) is not
    a data shuffle; the 100 TB shape stays one exchange (top-k
    window on query_id)."""
    plan = _plan(spark, "sq_ann", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the only data exchange should be the top-k window's, on query_id
    assert _data_exchanges(plan) <= 1, plan
    if _op_count(plan, "Exchange") > 1:  # the spread, when present
        assert "REPARTITION_BY_NUM" in plan and "vec_id" in plan


def test_bigram_collocations_bounded_exchanges_no_python_rows(spark, sf_dir):
    """Collocation mining: bigram explode + both counts stay in
    whole-stage codegen (no row-at-a-time Python), no cartesian
    product, and the exchange count is the two count aggs + the join
    keys — not data-sized beyond the token columns."""
    from data_engineering_etl_self_service_spark.queries import PLAN_VIEWS

    df = PLAN_VIEWS["bigram_collocations"](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-40, never a global sort
    assert _op_count(plan, "Exchange") <= 6, plan


def test_codec_queries_are_single_scan_shuffle_free(spark, sf_dir):
    """Every codec/container query is ONE Arrow-batched pass over the
    scan: exactly one parquet scan, and the Python stage is Arrow
    (ArrowEvalPython / MapInPandas), never row-at-a-time
    BatchEvalPython. Exchanges: at most the ONE scale-adaptive
    scan-spread repartition (runtime.spread_scan — identity whenever
    the scan already has >= defaultParallelism splits, i.e. at any
    real scale; pinned in test_runtime.py::test_spread_scan_*), and
    when present it must be the deterministic doc_id hash partition,
    never a payload-carrying shuffle added downstream of the decode."""
    for name in (
        "jpeg420_decode",
        "jpeg422_decode",
        "jpeg_progressive_decode",
        "flac_stereo_features",
        "mp3_metadata",
        "mp4_metadata",
        "ogg_metadata",
        "html_extract_stats",
        "pdf_extract_stats",
        "tiff_metadata",
        # round 6c: compressed audio, office/mail/science/code/subtitle
        # arrival formats + unicode canonicalization
        "adpcm_decode_stats",
        "unicode_normalize_report",
        "docx_extract_stats",
        "eml_extract_stats",
        "code_file_stats",
        "srt_extract_stats",
        "latex_extract_stats",
        "tfrecord_extract_stats",
        "sqlite_extract_stats",
        "markdown_extract_stats",
        "feed_extract_stats",
        "epub_extract_stats",
        "charset_sniff_stats",
        "decompress_sniff_stats",
        # round 7: jar-less Avro OCF ingestion + parquet footer audit
        "avro_extract_stats",
        "parquet_footer_stats",
        "kafka_avro_stats",
    ):
        plan = _plan(spark, name, sf_dir)
        n_ex = _op_count(plan, "Exchange")
        assert n_ex <= 1, (name, plan)
        if n_ex:
            assert "hashpartitioning(doc_id" in plan, (name, plan)
        assert "BatchEvalPython" not in plan, name
        assert _op_count(plan, "Scan parquet") == 1, name


def test_warc_chain_is_one_fused_pass(spark, sf_dir):
    """warc_extract_stats fuses pack + member inflate + record explode
    + HTML extraction into ONE Arrow pass over ONE scan; the only
    exchanges are the final per-doc rollup and (small scans only) the
    scale-adaptive scan-spread repartition. (A draft self-joined the
    packed frame and the plan re-ran the gzip-heavy pack stage 4x —
    this pin keeps that from regressing.)"""
    plan = _plan(spark, "warc_extract_stats", sf_dir)
    assert _op_count(plan, "Scan parquet") == 1, plan
    assert _op_count(plan, "Exchange") <= 2, plan
    assert _op_count(plan, "MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan


def test_lm_fluency_bounded_exchanges_all_codegen(spark, sf_dir):
    """LM fluency scoring: unigram agg + bigram agg + doc rollup are
    the only data-sized exchanges (the scoring joins reuse the
    token-key partitioning); bigram explode stays in codegen — no
    Python rows, no cartesian. The scan-spread repartition
    (runtime.spread_scan — identity at real scan parallelism) may
    additionally appear once per consumer subtree in the pre-AQE plan;
    runtime exchange reuse collapses those, and at scale they vanish
    entirely, so the pin allows them but insists they are doc_id
    hash partitions, not payload shuffles."""
    plan = _plan(spark, "lm_fluency_scores", sf_dir)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert _data_exchanges(plan) <= 3, plan
    assert _op_count(plan, "Scan parquet") <= 3, plan


def test_exact_substr_scrub_single_scan_no_pair_join(spark, sf_dir):
    """Duplicate-substring scrub: the tokenized corpus is cached and
    read ONCE from parquet; eligibility/coverage/rebuild are bounded
    grouped stages — never a doc-pair join, never a cartesian."""
    from data_engineering_etl_self_service_spark.queries import PLAN_VIEWS

    df = PLAN_VIEWS["exact_substr_scrub"](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert _op_count(plan, "Scan parquet") == 1, plan
    assert _data_exchanges(plan) <= 6, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_cluster_join_not_cartesian(spark, sf_dir):
    """SemDeDup: the pair stage is a keyed join on cluster_id (the
    cluster restriction IS the scale story) — a cartesian/BNL here
    would be the corpus² plan this operator exists to avoid. Centroid
    assignment is a pure expression, so exchanges stay at the pair
    join + output join."""
    plan = _plan(spark, "semantic_dedup", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert _op_count(plan, "Exchange") <= 2, plan


def test_shard_manifest_single_scan_single_exchange(spark, sf_dir):
    """Shard layout manifest: map-side LCG arithmetic + partial agg,
    ONE exchange on the 16-value shard key, one pruned scan."""
    plan = _plan(spark, "shard_manifest", sf_dir)
    assert _op_count(plan, "Scan parquet") == 1, plan
    assert _op_count(plan, "Exchange") == 1, plan
    assert "BatchEvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan


def test_point_in_time_join_no_range_join(spark, sf_dir):
    """PIT dimension lookup is the window-based as-of (union + one
    custkey-partitioned carry) — never an inequality/range join, whose
    row explosion on a hot customer is the thing this operator avoids.
    Exchanges: fact equi-join + the scd2/asof custkey sort."""
    plan = _plan(spark, "point_in_time_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert _op_count(plan, "Exchange") <= 3, plan


def test_srp_neardup_mapside_buckets_single_exchange(spark, sf_dir):
    """SRP-LSH: bucket assignment is map-side literal arithmetic (the
    small-k kmeans posture), so the whole query plans ONE exchange (the
    (table,bucket) candidate join); verification joins ride broadcast.
    No Python, no cartesian."""
    from data_engineering_etl_self_service_spark.queries import PLAN_VIEWS

    df = PLAN_VIEWS["srp_neardup"](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert _op_count(plan, "Exchange") <= 1, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_lake_audit_rollups_are_footer_sized(spark, sf_dir):
    """lake_audit (round 8): the audit never touches data pages — ONE
    binaryFile scan feeds the per-file footer decode, and every
    exchange downstream moves per-file / per-file-column rows, never
    row data. No cartesian joins, no row-at-a-time Python."""
    p = _plan(spark, "lake_audit", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the per-file footer frame is eagerly checkpointed, so all five
    # partition rollups read ONE materialization instead of re-reading
    # the lake per branch (and a re-audit can't see stale cached rows)
    assert p.count("Scan ExistingRDD") >= 5
    assert "binaryFile" not in p  # the lake scan ran exactly once


def test_scan_pruning_is_footer_sized(spark, sf_dir):
    """scan_pruning (round 8): same posture as lake_audit — no
    cartesian joins, no row-at-a-time Python, the audit rollup moves
    per-file rows only."""
    p = _plan(spark, "scan_pruning", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert _op_count(p, "Scan binaryFile") == 1  # one footer scan
    assert _data_exchanges(p) == 1  # the per-partition rollup


def test_scan_pruning_pages_is_index_sized(spark, sf_dir):
    """scan_pruning_pages (round 9): the PageIndex audit keeps the
    scan_pruning posture — one binaryFile listing projecting (path,
    length) only, one rollup exchange, no content column anywhere in
    the plan (footer + index region ranged reads happen inside the
    Arrow-batched per-file pass)."""
    p = _plan(spark, "scan_pruning_pages", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert _op_count(p, "Scan binaryFile") == 1
    assert _data_exchanges(p) == 1
    assert "content" not in p


def test_bloom_point_lookup_is_footer_sized(spark, sf_dir):
    """bloom_point_lookup (round 9): footer + bloom-bytes ranged reads
    inside the Arrow-batched per-file pass — one binaryFile listing
    projecting (path, length), one rollup exchange, content never
    projected."""
    p = _plan(spark, "bloom_point_lookup", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert _op_count(p, "Scan binaryFile") == 1
    assert _data_exchanges(p) == 1
    assert "content" not in p


def test_scan_pruning_typed_is_footer_sized(spark, sf_dir):
    """scan_pruning_typed (round 9, fused round 12): the three typed
    pruning modes evaluate in ONE footer pass over ONE binaryFile
    listing (pruning_report_multi — each mode formerly paid its own
    listing + decode), one rollup exchange on (mode, partition), and
    the content column never projected."""
    p = _plan(spark, "scan_pruning_typed", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert _op_count(p, "Scan binaryFile") == 1
    assert _data_exchanges(p) == 1
    assert "content" not in p


def test_encoding_audit_is_footer_sized(spark, sf_dir):
    """encoding_audit (round 9): the scan_pruning posture — one
    binaryFile listing projecting (path, length), one rollup exchange
    on (partition, column), content never projected."""
    p = _plan(spark, "encoding_audit", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert _op_count(p, "Scan binaryFile") == 1
    assert _data_exchanges(p) == 1
    assert "content" not in p


def test_clustering_depth_reads_footers_once(spark, sf_dir):
    """clustering_depth (round 9): the sweep and the file counts both
    fan out of ONE materialized per-file footer pass (eager
    localCheckpoint — the lake_audit discipline), so the lake is
    listed once; downstream exchanges move two event rows per file,
    never data."""
    p = _plan(spark, "clustering_depth", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "binaryFile" not in p  # checkpointed: listed exactly once
    assert p.count("Scan ExistingRDD") >= 2
    assert "content" not in p


def test_skip_index_scan_reads_only_survivors(spark, sf_dir):
    """skip_index_scan (round 9): the data side of the plan reads the
    PRUNED parquet file list with the predicate pushed to the scan;
    the accounting side reads the persisted index table. No cartesian
    joins, no row-at-a-time Python, no binary content."""
    p = _plan(spark, "skip_index_scan", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "binaryFile" not in p  # index built+persisted pre-plan
    # the pruned data read keeps the predicate at the scan
    assert "PushedFilters: [IsNotNull(v), GreaterThanOrEqual(v,16)" in p
    assert "content" not in p


def test_domain_mix_broadcasts_weights(spark, sf_dir):
    """domain_mix (round 9): the per-domain weights frame joins back
    to the corpus via BROADCAST (one row per domain); the only
    whole-frame exchange is the single-partition window over the
    domain rollup, never the corpus."""
    p = _plan(spark, "domain_mix", sf_dir)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
