"""Text-analysis column functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    langid,
    token_count,
    word_shingles,
)


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("v"))
        .collect()[0]
        .v
    )


def test_token_count_collapses_whitespace(spark):
    assert _one(spark, "  a  b\tc\nd ", token_count(F.col("text"))) == 4


def test_word_shingles_short_doc_guard(spark):
    assert _one(spark, "a b", word_shingles(F.col("text"), k=3)) == []
    assert _one(spark, "a b c d", word_shingles(F.col("text"), k=3)) == ["a b c", "b c d"]


def test_shingles_are_distinct(spark):
    assert _one(spark, "x y x y x y", word_shingles(F.col("text"), k=2)) == ["x y", "y x"]


def test_fingerprint_normalization(spark):
    a = _one(spark, "  Hello   World ", fingerprint(F.col("text")))
    b = _one(spark, "hello world", fingerprint(F.col("text")))
    assert a == b and len(a) == 32


def test_langid_picks_stopword_language(spark):
    assert _one(spark, "the cat and the hat of a dog", langid(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist da", langid(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwerty plugh", langid(F.col("text"))) == "und"


def test_bpe_ish_counts_long_words_more(spark):
    assert _one(spark, "hi there", bpe_ish_token_count(F.col("text"))) == 1 + 2
    assert _one(spark, "internationalization", bpe_ish_token_count(F.col("text"))) == 5


def test_redact_pii_all_categories(spark):
    from data_engineering_etl_self_service_spark.functions.text import redact_pii

    dirty = "mail a.b+c@ex-ample.co.uk call +4917012345678 host 192.168.0.1 ok"
    out = _one(spark, dirty, redact_pii(F.col("text")))
    assert out == "mail <EMAIL> call <PHONE> host <IP> ok"


def test_redact_pii_noop_on_clean_text(spark):
    from data_engineering_etl_self_service_spark.functions.text import redact_pii

    clean = "version 1.2 costs 3 dollars at example dot com"
    assert _one(spark, clean, redact_pii(F.col("text"))) == clean


def test_pii_counts(spark):
    from data_engineering_etl_self_service_spark.functions.text import pii_counts

    dirty = "a@b.io c@d.io +1234567890 10.0.0.1"
    df = spark.createDataFrame([(dirty,)], "text string")
    row = df.select(
        *[c.alias(k) for k, c in pii_counts(F.col("text")).items()]
    ).collect()[0]
    assert (row.n_email, row.n_phone, row.n_ip) == (2, 1, 1)


def test_repetition_signals_known_fractions(spark, tmp_path):
    """'a b a b a b' → bigrams [ab, ba, ab, ba, ab]: top=3/5, dup=5/5;
    all-distinct doc → top=1/n, dup=0."""
    from data_engineering_etl_self_service_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "p q r s")], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in QUERIES["repetition_signals"](spark, str(tmp_path)).collect()
    }
    assert abs(out[1].top_bigram_frac - 3 / 5) < 1e-12
    assert abs(out[1].dup_bigram_frac - 1.0) < 1e-12
    assert abs(out[2].top_bigram_frac - 1 / 3) < 1e-12
    assert out[2].dup_bigram_frac == 0.0


def test_hll_sketch_union_consistency(spark):
    """Union-of-per-group-sketches must equal one direct global sketch,
    and estimates must sit within the configured rsd of the exact count."""
    from pyspark.sql import functions as F

    from data_engineering_etl_self_service_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = {
        r.event_type: r.distinct_users_est
        for r in QUERIES["hll_sketch_union"](spark, sf).collect()
    }
    from data_engineering_etl_self_service_spark.catalog import load_table

    e = load_table(spark, sf, "events")
    exact = e.select("user_id").distinct().count()
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("n")
    ).collect()[0]["n"]
    assert out["ALL"] == direct  # merge == direct, deterministic
    assert abs(out["ALL"] - exact) / exact < 0.05
    assert all(v <= out["ALL"] * 1.05 for k, v in out.items() if k != "ALL")


def test_trigram_rarity_flags_ood_doc(spark, tmp_path):
    """A doc written in an alien alphabet must score ~1e6 ppm rare while
    clones of a common doc score 0."""
    from data_engineering_etl_self_service_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "the cat sat on the mat"),
            (4, "zzqqxxjjvvkkwwzzqqxx"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in QUERIES["trigram_rarity"](spark, str(tmp_path)).collect()
    }
    assert out[1].rare_ppm == 0 and out[2].rare_ppm == 0
    assert out[4].rare_ppm == 1000000
    assert out[4].n_tris == len(
        {"zzqqxxjjvvkkwwzzqqxx"[i : i + 3] for i in range(18)}
    )


def test_compression_ratio_signal(spark):
    """Repetition compresses far below natural prose; empty text is 1.0;
    ratios are positive and bounded by a small constant overhead."""
    from data_engineering_etl_self_service_spark.functions.text import (
        compression_ratio,
    )

    prose = "the quick brown fox jumps over the lazy dog and runs far " * 3
    df = spark.createDataFrame(
        [(1, prose), (2, "spam " * 200), (3, ""), (4, "xyz")],
        "id long, text string",
    )
    r = {
        row["id"]: row["r"]
        for row in df.select(
            "id", compression_ratio("text").alias("r")
        ).collect()
    }
    assert r[2] < 0.1 < r[1]  # repetition compresses much harder
    assert r[3] == 1.0
    assert all(0 < v <= 4.0 for v in r.values())


def test_quality_score_op_compression_column(spark, tmp_path):
    from data_engineering_etl_self_service_spark.plans.pipeline import run_pipeline
    from data_engineering_etl_self_service_spark.plans.spec import spec_from_dict

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "natural text with words"), (2, "dup " * 50)],
        "doc_id long, text string",
    ).write.parquet(src)
    spec = spec_from_dict(
        {
            "pipeline_info": {"name": "q"},
            "source": {"type": "file", "format": "parquet", "path": src},
            "transformations": [
                {"op": "quality_score", "compression": True},
                {"op": "filter", "predicate": "compression_ratio > 0.2"},
            ],
            "data_quality_checks": [
                {"check_type": "min_row_count", "threshold": 1}
            ],
            "destination": {
                "type": "parquet",
                "path": str(tmp_path / "out"),
            },
        }
    )
    assert not spec.warnings
    res = run_pipeline(spark, spec)
    assert res.passed
    kept = [r.doc_id for r in spark.read.parquet(res.published_path).collect()]
    assert kept == [1]
