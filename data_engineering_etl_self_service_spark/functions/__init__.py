"""Column-expression building blocks (all JVM-side, codegen-friendly)."""

from .numeric import dsum, davg, dsum_expr  # noqa: F401
from .text import (  # noqa: F401
    tokens,
    token_count,
    word_shingles,
    normalize_text,
    fingerprint,
    stopword_hits,
    quality_score_cols,
)
from .vector import dot, norm, cosine  # noqa: F401
