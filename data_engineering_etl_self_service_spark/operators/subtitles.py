"""SubRip (.srt) subtitle parsing — subtitle corpora (the OpenSubtitles
lineage) are a standard conversational-text pretraining source, and
their cue timing powers audio/video-text alignment.

The format is public and simple: numbered cues, ``HH:MM:SS,mmm -->
HH:MM:SS,mmm`` timing lines, 1-2 text lines, blank-line separated.
`parse_srt` is a tolerant cue walker (bad indices or timing lines skip
the cue instead of raising — dirty-corpus property); `build_srt` is the
deterministic builder whose cue count, timing sums, and text are known
symbolically from (doc_id, text) — see queries.py srt_extract_stats.

Scale: files are independent rows; Arrow-batched per-row parse,
shuffle-free and linear.
"""

from __future__ import annotations

import re

CUE_TOKENS = 8

_TIMING = re.compile(
    r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})"
)


def _fmt_ts(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, ms = divmod(rem, 1_000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def cue_start_ms(doc_id: int, i: int) -> int:
    return i * 3_500 + (doc_id % 7) * 250


def cue_duration_ms(i: int) -> int:
    return 2_000 + (i % 3) * 500


def build_srt(text: str, doc_id: int) -> str:
    """Deterministic SRT: 8-token cues; cues longer than 4 tokens split
    into two text lines (the real-world two-line convention)."""
    tokens = text.split(" ")
    out = []
    for i in range(0, len(tokens), CUE_TOKENS):
        chunk = tokens[i : i + CUE_TOKENS]
        idx = i // CUE_TOKENS
        start = cue_start_ms(doc_id, idx)
        end = start + cue_duration_ms(idx)
        lines = (
            [" ".join(chunk[:4]), " ".join(chunk[4:])]
            if len(chunk) > 4
            else [" ".join(chunk)]
        )
        out.append(
            f"{idx + 1}\n{_fmt_ts(start)} --> {_fmt_ts(end)}\n"
            + "\n".join(lines)
        )
    return "\n\n".join(out) + "\n"


def parse_srt(raw: str) -> "list[dict]":
    """Parse SRT text → cue dicts ``{index, start_ms, end_ms, text}``
    (text lines joined with one space). Cues with unparseable timing
    are skipped; indices are taken from the file but not trusted."""
    cues = []
    for block in re.split(r"\n\s*\n", raw.strip()):
        lines = [ln for ln in block.split("\n") if ln.strip() != ""]
        if len(lines) < 2:
            continue
        pos = 0
        index = None
        if lines[0].strip().isdigit():
            index = int(lines[0].strip())
            pos = 1
        if pos >= len(lines):
            continue
        m = _TIMING.search(lines[pos])
        if not m:
            continue
        g = [int(x) for x in m.groups()]
        start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
        end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
        cues.append(
            {
                "index": index,
                "start_ms": start,
                "end_ms": end,
                "text": " ".join(ln.strip() for ln in lines[pos + 1 :]),
            }
        )
    return cues
