"""Property-based tests (SURVEY §5.4): invariants on random inputs.

Examples are kept small and few — each example drives real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.quality import run_checks
from data_engineering_etl_self_service_spark.operators.sessionize import sessionize

T0 = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # user
        st.integers(min_value=0, max_value=10_000),     # minutes offset
    ),
    min_size=1,
    max_size=40,
)

ids_strategy = st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40)

_SPARK = None


def _get_spark():
    global _SPARK
    if _SPARK is None:
        from data_engineering_etl_self_service_spark import get_spark

        _SPARK = get_spark(app_name="property-tests", shuffle_partitions=4)
    return _SPARK


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionizer_invariants(rows):
    """Sessions partition the events; no intra-session gap exceeds the
    threshold; session boundaries always exceed it."""
    spark = _get_spark()
    df = spark.createDataFrame(
        [
            (i, f"u{u}", T0 + dt.timedelta(minutes=m))
            for i, (u, m) in enumerate(rows)
        ],
        "event_id long, user_id string, ts timestamp",
    )
    sess = sessionize(df, gap_minutes=30).cache()
    try:
        assert sess.count() == len(rows)  # partition: every event labelled

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        us = F.unix_micros(F.col("ts"))
        gaps = sess.select(
            "user_id",
            "session_seq",
            (us - F.lag(us).over(w)).alias("gap"),
            (F.col("session_seq") != F.lag("session_seq").over(w)).alias("boundary"),
        ).filter(F.col("gap").isNotNull())
        thirty = 30 * 60 * 1_000_000
        # same session → gap <= threshold; new session → gap > threshold
        assert gaps.filter(~F.col("boundary") & (F.col("gap") > thirty)).count() == 0
        assert gaps.filter(F.col("boundary") & (F.col("gap") <= thirty)).count() == 0
    finally:
        sess.unpersist()


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids_strategy)
def test_uniqueness_check_matches_groupby_dupfinder(ids):
    """unique_column verdict ≡ 'no group has count>1' (the reference's
    pandas is_unique semantics, ref: data_quality_operator.py:106)."""
    spark = _get_spark()
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    rep = run_checks(df, [{"check_type": "unique_column", "column": "id"}])
    dupes = df.groupBy("id").count().filter(F.col("count") > 1).count()
    assert rep.passed == (dupes == 0)


def test_scd2_intervals_partition_the_change_log(spark):
    """SCD2 islands: intervals per customer are ordered, non-overlapping,
    cover every order exactly once, and adjacent intervals differ in the
    tracked attribute."""
    from data_engineering_etl_self_service_spark.queries import QUERIES

    out = QUERIES["scd2_history"](spark, "/root/testdata/sf0.001")
    rows = sorted(
        out.collect(), key=lambda r: (r.o_custkey, r.valid_from, r.first_orderkey)
    )
    import duckdb

    n_orders = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchone()[0]
    assert sum(r.n_orders for r in rows) == n_orders
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for ivs in by_cust.values():
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to <= b.valid_from
            assert a.o_orderpriority != b.o_orderpriority or a.valid_to < b.valid_from


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=8,
    )
)
def test_sq8_quantization_error_bound(vecs):
    """Dequantized int8 components are within half a step (max|x|/127/2,
    plus float slack) of the original — the property that bounds SQ8
    ranking error."""
    import math

    for v in vecs:
        maxabs = max(abs(x) for x in v)
        if maxabs == 0:
            continue
        s = 127.0 / maxabs
        for x in v:
            q = math.floor(x * s + 0.5)
            assert abs(q / s - x) <= (1.0 / s) * 0.5 + 1e-9
            assert -127 <= q <= 127


graph_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # src node
        st.integers(min_value=0, max_value=6),   # dst node
        st.integers(min_value=1, max_value=9),   # weight
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(graph_strategy)
def test_pagerank_matches_python_model_on_random_graphs(edges):
    """Both execution tiers must reproduce the pure-Python integer
    recurrence on arbitrary random weighted digraphs (self-loops,
    dangling nodes, duplicate edges included)."""
    from data_engineering_etl_self_service_spark.operators.graph import (
        SCALE,
        pagerank_fixedpoint,
    )

    def ref(edges, n_iters=2, num=85, den=100):
        agg = {}
        for s, d, w in edges:
            agg[(s, d)] = agg.get((s, d), 0) + w
        nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
        outw = {}
        for (s, _), w in agg.items():
            outw[s] = outw.get(s, 0) + w
        n = len(nodes)
        base = (SCALE * (den - num)) // (den * n)
        rank = {v: SCALE // n for v in nodes}
        for _ in range(n_iters):
            inc = {v: 0 for v in nodes}
            for (s, d), w in agg.items():
                r, o = rank[s], outw[s]
                inc[d] += (r // o) * w + ((r % o) * w) // o
            rank = {v: base + (num * inc[v]) // den for v in nodes}
        return rank

    spark = _get_spark()
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    expected = ref(edges)
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixedpoint(df, n_iters=2).collect()
    }
    assert got == expected


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=5,
        max_size=14,
    ),
    min_size=2,
    max_size=5,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_span_extents_match_bruteforce(token_docs):
    """duplicate_span_extents (k=2, cap high enough to disable the skew
    band's upper bound) must equal a brute-force python scan for the
    maximal shared runs of every doc pair."""
    from data_engineering_etl_self_service_spark.operators.dedup import (
        duplicate_span_extents,
    )

    def brute(docs, k=2):
        out = set()
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                ta, tb = docs[a], docs[b]
                # all maximal common runs >= k, by diagonal
                for d in range(-len(tb) + 1, len(ta)):
                    run = 0
                    for i in range(max(0, d), min(len(ta), len(tb) + d)):
                        j = i - d
                        if ta[i] == tb[j]:
                            run += 1
                        else:
                            if run >= k:
                                out.add(
                                    (a + 1, b + 1, run,
                                     i - run + 1, i - d - run + 1)
                                )
                            run = 0
                    i = min(len(ta), len(tb) + d)
                    if run >= k:
                        out.add(
                            (a + 1, b + 1, run, i - run + 1, i - d - run + 1)
                        )
        return out

    # brute() counts runs of matching TOKENS; the operator counts runs of
    # matching k-grams and reports run + k - 1 tokens — identical for
    # spans built from grams every position of which matches. Gram-level
    # eligibility ([2, cap]) must not bite: set cap huge.
    spark = _get_spark()
    docs = [(i + 1, " ".join(t)) for i, t in enumerate(token_docs)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.span_tokens, r.start_a, r.start_b)
        for r in duplicate_span_extents(
            df, k=2, max_gram_occ=10_000, top=1000
        ).collect()
    }
    expected = brute([t for t in token_docs], k=2)
    assert got == expected


ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["append", "overwrite"]),
        st.integers(min_value=0, max_value=4),   # which value-block to write
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops_strategy)
def test_snapshot_versions_replay_a_python_model(ops):
    """Model-based check of the snapshot table: after ANY sequence of
    append/overwrite commits, every version v must read back exactly the
    model's state after the first v ops (time travel is total history)."""
    import tempfile

    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    spark = _get_spark()
    blocks = {i: list(range(i * 10, i * 10 + 3)) for i in range(5)}
    with tempfile.TemporaryDirectory() as td:
        base = f"{td}/tbl"
        model: list[list[int]] = []
        state: list[int] = []
        for mode, blk in ops:
            df = spark.createDataFrame(
                [(v,) for v in blocks[blk]], "v long"
            )
            write_snapshot(df, base, mode=mode)
            state = (state + blocks[blk]) if mode == "append" else list(
                blocks[blk]
            )
            model.append(list(state))
        assert snapshot_versions(base) == list(range(1, len(ops) + 1))
        for v, expected in enumerate(model, start=1):
            got = sorted(
                r.v for r in read_snapshot(spark, base, version=v).collect()
            )
            assert got == sorted(expected), (v, ops)


ranks_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # sort value (ties likely)
        st.integers(min_value=0, max_value=10_000),  # unique-ish tiebreak
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],  # tiebreak column is unique → total order
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ranks_strategy, st.integers(min_value=1, max_value=7))
def test_distributed_rank_and_ntile_match_global_window(rows, k):
    """distributed_rank == global row_number and ntile_bucket == NTILE(k)
    on random data with ties, any shard count, any k."""
    from data_engineering_etl_self_service_spark.operators.ranking import (
        distributed_rank,
        ntile_bucket,
    )

    spark = _get_spark()
    df = spark.createDataFrame(rows, "v long, tb long")
    ranked, n, h = distributed_rank(
        df, [F.col("v"), F.col("tb")], "rnk", num_shards=5
    )
    got = {
        r["tb"]: (r["rnk"], r["b"])
        for r in ranked.withColumn("b", ntile_bucket(F.col("rnk"), n, k)).collect()
    }
    h.unpersist()
    want = {
        r["tb"]: (r["rnk"], r["b"])
        for r in df.select(
            "tb",
            F.row_number().over(W.orderBy("v", "tb")).alias("rnk"),
            F.ntile(k).over(W.orderBy("v", "tb")).alias("b"),
        ).collect()
    }
    assert n == len(rows)
    assert got == want


keys_strategy = st.lists(
    st.integers(min_value=0, max_value=500), min_size=1, max_size=80, unique=True
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys_strategy)
def test_sharded_key_gaps_match_python_model(keys):
    """sharded_key_gaps == the obvious sorted-scan gap model, any shard
    count vs key distribution."""
    from data_engineering_etl_self_service_spark.operators.ranking import (
        sharded_key_gaps,
    )

    spark = _get_spark()
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    got = sorted(tuple(r) for r in sharded_key_gaps(df, "key", 5).collect())
    s = sorted(keys)
    want = sorted(
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(s, s[1:])
        if b - a > 1
    )
    assert got == want


_words = st.lists(
    st.sampled_from(["red", "blue", "fox", "dog", "run", "hop", "sky"]),
    min_size=3,
    max_size=12,
)
_docs_strategy = st.lists(
    _words.map(" ".join), min_size=2, max_size=10
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs_strategy)
def test_prefix_filter_lossless_on_random_corpora(texts):
    """AllPairs/PPJoin prefix filtering must equal the all-pairs exact
    Jaccard join on arbitrary small corpora — heavy shingle repetition
    from the tiny vocabulary stresses the frequency-ordered prefixes."""
    from data_engineering_etl_self_service_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_prefix_pairs,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, k=3, threshold=0.5).collect()
    }
    pf = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_prefix_pairs(
            df, k=3, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert pf == exact


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=60),
    st.integers(min_value=2, max_value=6),
)
def test_sharded_running_sum_property(vals, shards):
    """Sharded prefix scan equals the sequential running sum for any
    input and shard count."""
    from data_engineering_etl_self_service_spark.operators.ranking import (
        sharded_running_agg,
    )
    from pyspark.sql import functions as F

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    out, h = sharded_running_agg(
        df, ["i"], "v", agg="sum", out_col="run", num_shards=shards
    )
    got = {r.i: r.run for r in out.collect()}
    h.unpersist()
    acc, want = 0, {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert got == want


# ---------------------------------------------------------------------------
# codec properties (no Spark): arbitrary content through the pure-Python
# codecs — FLAC is lossless everywhere; progressive JPEG must transport
# exactly the baseline coefficients; PNG round-trips bit-exactly.
# ---------------------------------------------------------------------------

_flac_strategy = st.tuples(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from(
        ["verbatim", "fixed0", "fixed1", "fixed2", "lpc2", "lpc6"]
    ),
    st.sampled_from(
        ["mono", "independent", "left_side", "right_side", "mid_side"]
    ),
    st.sampled_from([0, 2]),  # requested wasted bits (clamped per block)
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_flac_strategy)
def test_flac_roundtrip_is_lossless_on_arbitrary_signals(case):
    """FLAC invariant: ANY int16 signal round-trips exactly through any
    mode x channel assignment x wasted-bits request — the predictor fit
    quality may vary, correctness may not."""
    from data_engineering_etl_self_service_spark.operators.flac import (
        build_flac,
        decode_flac,
        decode_flac_channels,
    )

    samples, mode, assign, wasted = case
    if assign == "mono":
        raw = build_flac(
            8000, samples, block_size=64, mode=mode, wasted_bits=wasted
        )
        assert decode_flac(raw)[2] == samples
    else:
        other = [(-v) // 2 for v in samples]
        raw = build_flac(
            8000,
            (samples, other),
            block_size=64,
            mode=mode,
            stereo_mode=assign,
            wasted_bits=wasted,
        )
        assert decode_flac_channels(raw)[2] == [samples, other]


_img_strategy = st.tuples(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from(["444", "420"]),
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_img_strategy)
def test_jpeg_progressive_equals_baseline_on_arbitrary_images(case):
    """Progressive invariant: for ANY image the SOF2 scan script decodes
    to pixels bit-identical to the baseline encoding (same quantized
    coefficients by construction)."""
    import numpy as np

    from data_engineering_etl_self_service_spark.operators.jpeg import (
        build_jpeg,
        decode_jpeg,
    )

    h, w, seed, sub = case
    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )
    base = decode_jpeg(build_jpeg(img, subsampling=sub))
    prog = decode_jpeg(build_jpeg(img, subsampling=sub, progressive=True))
    assert prog is not None and (prog == base).all()


_png_strategy = st.tuples(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([1, 2, 4, 8]),
    st.booleans(),
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_png_strategy)
def test_png_palette_roundtrip_on_arbitrary_indices(case):
    """PNG invariant: arbitrary palette images at every depth, with and
    without Adam7, decode to exactly palette[index]."""
    import numpy as np

    from data_engineering_etl_self_service_spark.operators.multimodal import (
        build_png_ex,
        decode_png,
    )

    h, w, seed, depth, interlace = case
    rng = np.random.default_rng(seed)
    n = 1 << depth
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    out = decode_png(
        build_png_ex(
            idx, ctype=3, depth=depth, palette=pal, interlace=interlace
        )
    )
    assert out is not None and (out == pal[idx]).all()


_container_strategy = st.tuples(
    st.sampled_from(["mp3", "mp4", "ogg"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(_container_strategy)
def test_container_builders_parse_back_exactly(case):
    """Container invariant: every parameter combination the builders can
    emit parses back to exactly the declared metadata (MP3 frame walk,
    MP4 box tree incl. both mvhd layouts, Ogg pages under both granule
    clocks)."""
    kind, seed = case
    if kind == "mp3":
        from data_engineering_etl_self_service_spark.operators.mp3 import (
            _SPF, build_mp3, parse_mp3,
        )

        version = "1" if seed % 2 == 0 else "2"
        bidx = 1 + seed % 14
        ridx = (seed // 2) % 3
        mono = seed % 3 == 0
        nf = 1 + seed % 20
        xing = seed % 5 == 0
        m = parse_mp3(
            build_mp3(version, bidx, ridx, mono, nf, xing=xing)
        )
        assert m is not None and m["version"] == version
        assert m["n_frames"] == nf and m["channels"] == (1 if mono else 2)
        assert m["xing_frames"] == (nf if xing else None)
        frames = nf
        assert m["duration_ms"] == (
            frames * _SPF[version] * 1000 // m["sample_rate"]
        )
    elif kind == "mp4":
        from data_engineering_etl_self_service_spark.operators.mp4 import (
            build_mp4, parse_mp4,
        )

        ts = 1 + seed % 100000
        dur = seed % 10**7
        ver = seed % 2
        tracks = tuple(
            (b"vide" if i % 2 == 0 else b"soun", 16 * (i + 1), 9 * (i + 1))
            for i in range(1 + seed % 4)
        )
        m = parse_mp4(
            build_mp4(
                timescale=ts, duration=dur, tracks=tracks,
                mvhd_version=ver,
            )
        )
        assert m is not None and m["timescale"] == ts
        assert m["duration_ms"] == dur * 1000 // ts
        assert m["n_tracks"] == len(tracks)
        assert m["video_width"] == 16  # first video track
    else:
        from data_engineering_etl_self_service_spark.operators.ogg import (
            build_ogg, parse_ogg,
        )

        codec = "vorbis" if seed % 2 == 0 else "opus"
        ch = 1 + seed % 2
        rate = 44100 if codec == "vorbis" else 48000
        granule = 1000 + seed % 10**6
        pages = 1 + seed % 8
        m = parse_ogg(
            build_ogg(
                codec=codec, channels=ch, sample_rate=rate,
                final_granule=granule, n_audio_pages=pages,
            )
        )
        assert m is not None and m["codec"] == codec
        assert m["channels"] == ch and m["n_pages"] == pages + 1
        assert m["last_granule"] == granule
        if codec == "vorbis":
            assert m["duration_ms"] == granule * 1000 // rate
        else:
            assert m["duration_ms"] == max(0, granule - 312) * 1000 // 48000


# --------------------------------------------------- round 6: scrub

corpus_strategy = st.lists(
    st.lists(
        st.sampled_from("alpha beta gamma delta eps zeta".split()),
        min_size=1,
        max_size=12,
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


def _ref_scrub(texts, k=3, cap=16):
    """Pure-Python duplicate-span scrub: total-occurrence band [2,cap],
    coverage by any containing k-gram, kept tokens rejoined."""
    docs = {i: t.lower().split() for i, t in enumerate(texts)}
    from collections import Counter

    occ = Counter()
    for toks in docs.values():
        for s in range(len(toks) - k + 1):
            occ[tuple(toks[s : s + k])] += 1
    out = {}
    for i, toks in docs.items():
        covered = set()
        for s in range(len(toks) - k + 1):
            if 2 <= occ[tuple(toks[s : s + k])] <= cap:
                covered.update(range(s, s + k))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out[i] = (len(toks), len(covered), len(kept), " ".join(kept))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_scrub_matches_python_reference_on_random_corpora(texts):
    """scrub_duplicate_spans == the pure-Python reference on arbitrary
    small-vocab corpora (small vocab forces dense gram collisions —
    the regime where coverage logic can go wrong), and the accounting
    invariant n_dup + n_kept == n_tokens holds row by row."""
    import hashlib

    from data_engineering_etl_self_service_spark.operators.dedup import (
        scrub_duplicate_spans,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in scrub_duplicate_spans(df, k=3, max_gram_occ=16).collect()
    }
    ref = _ref_scrub(texts, k=3, cap=16)
    assert set(got) == set(ref)
    for i, (n_tok, n_dup, n_kept, scrub) in ref.items():
        r = got[i]
        assert (r.n_tokens, r.n_dup_tokens, r.n_kept_tokens) == (
            n_tok,
            n_dup,
            n_kept,
        ), (i, texts[i])
        assert r.n_dup_tokens + r.n_kept_tokens == r.n_tokens
        assert r.scrub_md5 == hashlib.md5(scrub.encode()).hexdigest()


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=7),
    counts=st.lists(
        st.integers(min_value=1, max_value=50), min_size=3, max_size=3
    ),
    extra=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=2, max_size=4),
            st.integers(min_value=1, max_value=50),
        ),
        max_size=4,
    ),
)
def test_unigram_viterbi_matches_bruteforce_enumeration(word, counts, extra):
    """viterbi_segment (the exact DP the Spark operator runs per word
    type) must find the TRUE maximum-likelihood segmentation: compare
    against brute-force enumeration of every split of the word, with
    the same IEEE-double value arithmetic."""
    from data_engineering_etl_self_service_spark.operators.bpe import (
        viterbi_segment,
    )

    vocab = {"a": counts[0], "b": counts[1], "c": counts[2]}
    for tok, cnt in extra:
        vocab.setdefault(tok, cnt)
    total = sum(vocab.values())
    sc = {t: c / total for t, c in vocab.items()}

    def enumerate_best(w):
        n = len(w)
        best = None
        for mask in range(1 << (n - 1)):
            cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
            pieces = [w[cuts[j] : cuts[j + 1]] for j in range(len(cuts) - 1)]
            if any(len(p) > 4 for p in pieces):
                continue
            v = 1.0
            ok = True
            for p in pieces:
                if p in sc:
                    v = v * sc[p]
                elif len(p) == 1:
                    v = v * (1 / total)
                else:
                    ok = False
                    break
            if ok and (best is None or v > best[0]):
                best = (v, pieces)
        return best[0]

    prob, path = viterbi_segment(word, sc, 1 / total, 4)
    assert prob == enumerate_best(word)
    # the returned path re-scores to the returned prob in the same order
    v = 1.0
    for p in path.split("+"):
        v = v * sc.get(p, 1 / total)
    assert v == prob
