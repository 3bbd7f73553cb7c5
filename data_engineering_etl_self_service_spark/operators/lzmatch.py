"""Shared greedy LZ match finder for the pure-Python block writers.

One implementation of the classic greedy 4-byte-prefix hash parse
(probe a {prefix → last position} table, extend byte-wise, restart
after each match) serving all three codec writers — ``lz4``,
``snappy``, and ``zstd_enc`` each previously carried their own copy of
the identical loop, differing only in end rules and offset window
(review r8b: a matcher fix or speed improvement had to land three
times). Callers parameterize:

- ``max_offset``: the format's back-reference window (64 KiB - 1 for
  lz4/snappy 2-byte offsets; None = bounded only by block size);
- ``last_start``: last legal match START (lz4's spec demands matches
  start >= 12 bytes before block end; snappy/zstd just need 4 prefix
  bytes);
- ``match_end_cap``: first position a match may NOT cover (lz4's final
  5 bytes are always literals; snappy/zstd match to the end).

Returns ``(matches, final_anchor)`` where each match is
``(lit_start, match_start, offset, length)`` — literals for a match
are ``src[lit_start:match_start]`` and the trailing literals are
``src[final_anchor:]``.
"""

from __future__ import annotations


def greedy_matches(
    src: bytes,
    max_offset: int | None,
    last_start: int,
    match_end_cap: int,
):
    matches: list = []
    table: dict[int, int] = {}
    anchor = pos = 0
    while pos <= last_start:
        key = int.from_bytes(src[pos : pos + 4], "little")
        cand = table.get(key)
        table[key] = pos
        if cand is not None and (
            max_offset is None or pos - cand <= max_offset
        ):
            m, c = pos + 4, cand + 4
            while m < match_end_cap and src[m] == src[c]:
                m += 1
                c += 1
            matches.append((anchor, pos, pos - cand, m - pos))
            pos = anchor = m
        else:
            pos += 1
    return matches, anchor
