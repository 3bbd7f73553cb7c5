"""Code-file analysis (operators/code.py): block comments, shebang
fallback, SPDX detection, counting invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.code import (
    analyze_source,
    build_source,
)


def test_block_comment_spans_lines():
    src = "int a;\n/* open\nstill comment int b;\nclose */\nint c;\n"
    r = analyze_source("f.c", src)
    assert r["code_lines"] == 2
    assert r["comment_lines"] == 3
    assert r["blank_lines"] == 0


def test_one_line_block_comment_does_not_latch():
    r = analyze_source("f.c", "/* one line */\nint a;\n")
    assert r["comment_lines"] == 1 and r["code_lines"] == 1


def test_shebang_fallback_without_extension():
    r = analyze_source("script", "#!/usr/bin/env python3\nx = 1\n")
    assert r["lang"] == "python" and r["has_shebang"]
    r = analyze_source("run", "#!/usr/bin/env node\nlet x = 1;\n")
    assert r["lang"] == "javascript"
    r = analyze_source("data.bin", "just words\n# hashy\n")
    assert r["lang"] == "unknown" and r["comment_lines"] == 1


def test_spdx_detected_anywhere():
    r = analyze_source("f.py", "x = 1\n# SPDX-License-Identifier: Apache-2.0\n")
    assert r["has_license"] and r["license_id"] == "Apache-2.0"


def test_counts_partition_total():
    for did in range(8):
        fn, src = build_source("a b c d e f g h i j k l m", did)
        r = analyze_source(fn, src)
        assert (
            r["code_lines"] + r["comment_lines"] + r["blank_lines"]
            == r["total_lines"]
        )


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300), st.sampled_from(["f.py", "f.js", "f.c", "f"]))
def test_analyze_never_raises_and_partitions(content, fn):
    r = analyze_source(fn, content)
    assert (
        r["code_lines"] + r["comment_lines"] + r["blank_lines"]
        == r["total_lines"]
    )
