"""Greedy set cover: parity with a reference implementation."""

from __future__ import annotations

from data_engineering_etl_self_service_spark.operators.selection import (
    greedy_set_cover,
)


def _ref_greedy(sets: dict[int, set], n):
    covered: set = set()
    picks = []
    for rank in range(1, n + 1):
        best = None
        for d in sorted(sets):
            gain = len(sets[d] - covered)
            if best is None or gain > best[1]:
                best = (d, gain)
        if best is None or best[1] == 0:
            break
        picks.append((rank, best[0], best[1]))
        covered |= sets[best[0]]
    return picks


def test_greedy_set_cover_matches_reference(spark):
    sets = {
        0: {"a", "b", "c", "d"},
        1: {"c", "d", "e"},      # overlaps the first pick heavily
        2: {"e", "f", "g"},      # disjoint tail — picked second
        3: {"a", "b"},           # fully covered after pick 1 -> gain 0
        4: {"h"},
    }
    rows = [(d, t) for d, its in sets.items() for t in its]
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    got = greedy_set_cover(df, n_picks=10)
    assert got == _ref_greedy(sets, 10)
    # everything coverable is covered; zero-gain docs never picked
    assert {p[1] for p in got} <= {0, 1, 2, 4}


def test_greedy_set_cover_tiebreak_is_lowest_id(spark):
    df = spark.createDataFrame(
        [(7, "x"), (7, "y"), (3, "p"), (3, "q")], "doc_id long, tok string"
    )
    got = greedy_set_cover(df, n_picks=1)
    assert got == [(1, 3, 2)]  # equal gains -> ascending id wins
