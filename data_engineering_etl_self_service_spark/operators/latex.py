"""LaTeX text extraction — arXiv-style sources are a core scientific
pretraining corpus, and detex-style markup stripping (public knowledge:
comments, environments, command/argument classification, math removal)
is the curation stage that precedes every text operator on them.

Extraction rules, in order (each standard detex behavior):

1. ``%`` comments to end of line (escaped ``\\%`` survives as a
   literal);
2. display-math environments (``equation``/``align``/``displaymath``)
   drop whole;
3. inline math ``$...$`` drops;
4. keep-argument commands (``\\section``/``\\subsection``/``\\title``/
   ``\\emph``/``\\textbf``/``\\textit``) unwrap to their argument text,
   innermost-first so nesting works;
5. every remaining ``\\command[opt]{arg}`` drops with its arguments
   (``\\documentclass``, ``\\usepackage``, ``\\maketitle``,
   ``\\begin``/``\\end``, ...);
6. whitespace collapses to single spaces.

`build_latex` is the builder-exercises-parser twin: a full article
skeleton (commented preamble, title, 20-token ``\\section``'d
paragraphs with every 7th token ``\\emph``-wrapped, an ``equation``
environment on every 5th doc) whose extraction image is a pinned
formula of (doc_id, text) — see queries.py latex_extract_stats.

Scale: pure per-row regex/string work over Arrow batches; shuffle-free
and linear.
"""

from __future__ import annotations

import re

SECTION_TOKENS = 20
EMPH_EVERY = 7

_KEEP_ARG = re.compile(
    r"\\(?:section|subsection|title|emph|textbf|textit)\*?\{([^{}]*)\}"
)
_DROP_ENV = re.compile(
    r"\\begin\{(equation|align|displaymath)\*?\}.*?"
    r"\\end\{\1\*?\}",
    re.S,
)
_COMMENT = re.compile(r"(?<!\\)%[^\n]*")
_INLINE_MATH = re.compile(r"\$[^$]*\$")
_COMMAND = re.compile(r"\\[a-zA-Z]+\*?(?:\[[^\]]*\])?(?:\{[^{}]*\})*")


def build_latex(text: str, doc_id: int) -> str:
    """Deterministic article wrapping ``text``."""
    tokens = text.split(" ")
    parts = [
        "% generated fixture, do not edit",
        r"\documentclass{article}",
        r"\usepackage[utf8]{inputenc}",
        r"\begin{document}",
        rf"\title{{Document {doc_id}}}",
        r"\maketitle",
    ]
    n_sec = 0
    for i in range(0, len(tokens), SECTION_TOKENS):
        n_sec += 1
        chunk = [
            rf"\emph{{{t}}}" if (j + 1) % EMPH_EVERY == 0 else t
            for j, t in enumerate(tokens[i : i + SECTION_TOKENS])
        ]
        parts.append(rf"\section{{Part {n_sec}}}")
        parts.append(" ".join(chunk) + " % trailing comment")
    if doc_id % 5 == 0:
        parts.append(r"\begin{equation}" "\n" r"E = mc^2" "\n" r"\end{equation}")
    parts.append(r"\end{document}")
    return "\n".join(parts) + "\n"


def extract_latex_text(src: str) -> str:
    """detex-style plain-text extraction (rules in the module doc)."""
    src = _COMMENT.sub("", src)
    src = _DROP_ENV.sub(" ", src)
    src = _INLINE_MATH.sub(" ", src)
    while True:
        new = _KEEP_ARG.sub(r"\1", src)
        if new == src:
            break
        src = new
    src = _COMMAND.sub(" ", src)
    src = src.replace(r"\%", "%")
    return re.sub(r"\s+", " ", src).strip()
