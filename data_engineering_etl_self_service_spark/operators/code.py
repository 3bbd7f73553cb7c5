"""Source-code file analysis — the curation stage for CODE corpora
(The Stack / StarCoder lineage): language identification, license
detection, and comment/code/blank line accounting, the signals used to
filter and mix code into a pretraining set.

`analyze_source` is language-aware line classification: extension (+
shebang) identification, line comments (``#`` / ``//``), block comments
(``/* ... */`` spanning lines — the wrinkle line-based counters get
wrong), SPDX/license detection via the public ``SPDX-License-
Identifier`` convention. `build_source` is the builder-exercises-parser
twin: it wraps fixture text into a deterministic fake source file
(Python/JavaScript/C by doc_id, optional license header, every third
body line a comment) so every count is known symbolically from
(doc_id, n_tokens) — see queries.py code_file_stats.

Scale: per-row Python over Arrow batches, shuffle-free, linear;
files are independent rows.
"""

from __future__ import annotations

import re

LANGS = ["python", "javascript", "c"]
EXTS = {"py": "python", "js": "javascript", "c": "c", "h": "c"}
LINE_TOKENS = 6

_SPDX = re.compile(r"SPDX-License-Identifier:\s*(\S+)")


def build_source(text: str, doc_id: int) -> tuple[str, str]:
    """Deterministic fake source file → ``(filename, content)``.

    Language = LANGS[doc_id % 3]; license header when doc_id is even;
    body = 6-token chunks, every third line a comment.
    """
    lang = LANGS[doc_id % 3]
    ext = {"python": "py", "javascript": "js", "c": "c"}[lang]
    tokens = text.split(" ")
    chunks = [
        " ".join(tokens[i : i + LINE_TOKENS])
        for i in range(0, len(tokens), LINE_TOKENS)
    ]
    lines: list[str] = []
    if lang == "python":
        lines.append("#!/usr/bin/env python3")
        if doc_id % 2 == 0:
            lines.append("# SPDX-License-Identifier: MIT")
        lines.append("")
    else:
        if doc_id % 2 == 0:
            lines += ["/*", " * SPDX-License-Identifier: MIT", " */", ""]
    for k, chunk in enumerate(chunks):
        if k % 3 == 2:
            marker = "# " if lang == "python" else "// "
            lines.append(marker + chunk)
        elif lang == "python":
            lines.append(f"x_{k} = '{chunk}'")
        elif lang == "javascript":
            lines.append(f"const x_{k} = '{chunk}';")
        else:
            lines.append(f'char *x_{k} = "{chunk}";')
    return f"src_{doc_id}.{ext}", "\n".join(lines) + "\n"


def analyze_source(filename: str, content: str) -> dict:
    """Classify a source file → ``{lang, has_shebang, has_license,
    license_id, total_lines, code_lines, comment_lines, blank_lines}``.

    A line inside a ``/* */`` block counts as comment regardless of its
    own content; a trailing newline does not create a phantom line.
    Unknown extensions fall back to shebang sniffing, else 'unknown'
    with ``#``/``//`` both treated as comments (conservative).
    """
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    lang = EXTS.get(ext)
    lines = content.split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    if lang is None and lines and lines[0].startswith("#!"):
        first = lines[0]
        if "python" in first:
            lang = "python"
        elif "node" in first:
            lang = "javascript"
    lang = lang or "unknown"
    line_markers = {
        "python": ("#",),
        "javascript": ("//",),
        "c": ("//",),
        "unknown": ("#", "//"),
    }[lang]
    block_ok = lang in ("javascript", "c", "unknown")
    code = comment = blank = 0
    in_block = False
    for i, line in enumerate(lines):
        s = line.strip()
        if in_block:
            comment += 1
            if "*/" in s:
                in_block = False
            continue
        if not s:
            blank += 1
        elif i == 0 and s.startswith("#!"):
            comment += 1  # shebang is metadata, not code
        elif any(s.startswith(m) for m in line_markers):
            comment += 1
        elif block_ok and s.startswith("/*"):
            comment += 1
            if "*/" not in s[2:]:
                in_block = True
        else:
            code += 1
    m = _SPDX.search(content)
    return {
        "lang": lang,
        "has_shebang": bool(lines) and lines[0].startswith("#!"),
        "has_license": m is not None,
        "license_id": m.group(1) if m else None,
        "total_lines": len(lines),
        "code_lines": code,
        "comment_lines": comment,
        "blank_lines": blank,
    }
