"""Text-analysis column expressions for training-data pipelines.

All of these are pure ``pyspark.sql.functions`` compositions — JVM-side,
whole-stage-codegen'd, no Python in the hot path — so they scale linearly
with executors over a 100 TB corpus. (The reference has no text functions at
all; its only string work is path templating, ref: operators/api_to_s3.py:65.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the heuristic language-ID operator.
#: Public common-words lists; deliberately minimal (heuristic, not a model).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(text: Column | str, lower: bool = True) -> Column:
    """Whitespace tokenization → array<string>.

    ``trim`` + regex split instead of split + ``filter(≠'')``: higher-order
    functions with lambdas run interpreted (outside whole-stage codegen) and
    measured ~5× slower per row; trimming first makes the filter unnecessary.
    """
    c = F.col(text) if isinstance(text, str) else text
    if lower:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the cheap proxy for a BPE token count)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """A BPE-ish token estimate: count regex word-pieces + non-space symbols.

    Splits words longer than 4 chars into ~len/4 pieces, which tracks how a
    byte-pair encoder fragments rare words. Pure column arithmetic.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    per_tok = F.transform(
        toks, lambda t: F.greatest(F.lit(1), F.ceil(F.length(t) / F.lit(4)).cast("int"))
    )
    return F.aggregate(per_tok, F.lit(0), lambda acc, x: acc + x)


def normalize_text(text: Column | str) -> Column:
    """Canonical form used for exact-dup hashing: lower, trim, collapse ws."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint = md5(normalized text).

    md5 is available verbatim in every SQL engine, so the fingerprint is
    portable (and oracle-checkable), unlike Spark-private hashes.
    """
    return F.md5(normalize_text(text))


def word_shingles(text: Column | str, k: int = 3, distinct: bool = True) -> Column:
    """Word k-shingles → array<string> (distinct set by default; pass
    ``distinct=False`` for the positional multiset, e.g. occurrence counting).

    ``sequence(1, size-k+1)`` is guarded because Spark's ``sequence``
    *descends* when start > stop (a classic footgun); short docs yield [].
    """
    toks = tokens(text)
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_distinct(sh) if distinct else sh


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``words`` (with multiplicity)."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def quality_score_cols(text: Column | str) -> dict[str, Column]:
    """Document-quality signals: token count, mean token length, stopword
    ratio, and a composite score in [0,1]. Integer-count-derived doubles
    only, so the values are bit-reproducible against a SQL oracle.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_len = total_len.cast("double") / n_tok
    stop = stopword_hits(toks, LANG_STOPWORDS["en"]).cast("double") / n_tok
    # Composite heuristic: enough tokens, plausible word length, some stopwords.
    score = (
        F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0)) * F.lit(0.4)
        + F.when((mean_len >= 3) & (mean_len <= 8), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(stop * F.lit(4.0), F.lit(1.0)) * F.lit(0.3)
    )
    return {
        "n_tokens": n_tok,
        "mean_token_len": mean_len,
        "stopword_ratio": stop,
        "quality_score": score,
    }


#: PII patterns chosen to mean the same thing in Java regex (Spark) and RE2
#: (DuckDB): character classes, bounded repetition and ASCII \b only — no
#: lookaround, no backrefs — so redaction is oracle-checkable cross-engine.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(text: Column | str) -> Column:
    """Replace emails, international phone numbers, and IPv4 addresses with
    typed placeholder tokens. Pure ``regexp_replace`` chain — JVM-side,
    codegen'd, linear over a 100 TB corpus. Order matters: emails first so
    their digit runs can't be half-eaten by the phone/IP patterns.
    """
    c = F.col(text) if isinstance(text, str) else text
    for _name, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (audit signal alongside redaction)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{name}": F.regexp_count(c, F.lit(pat)).cast("bigint")
        for name, pat, _repl in PII_PATTERNS
    }


def langid_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the heuristic language-ID input)."""
    toks = tokens(text)
    return {lang: stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


def langid(text: Column | str) -> Column:
    """Heuristic language-ID: argmax stopword hits, ties → alphabetical lang,
    zero hits everywhere → 'und' (undetermined). Deterministic."""
    scores = langid_scores(text)
    # argmax with deterministic tie-break: iterate langs alphabetically and
    # keep the first strictly-greater score.
    langs = sorted(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def compression_ratio(text: Column | str, level: int = 6) -> Column:
    """zlib-compressed bytes / raw bytes — the Gopher-lineage
    repetitiveness signal: heavily duplicated or templated text
    compresses far below natural prose, so a LOW ratio flags
    boilerplate/spam and an extremely HIGH one flags random noise.

    Runs as an Arrow-batched pandas UDF (zlib is per-row Python by
    nature; there is no JVM expression for it) — shuffle-free, linear.
    Deterministic for a fixed zlib version/level but NOT replayable in
    SQL, so it ships as a quality column + pytest invariants
    (monotonicity under repetition, bounds), not an oracled query —
    its filtering role is covered by the exact-oracled repetition and
    dup-ngram operators.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s):
        import zlib

        def one(t: str) -> float:
            raw = (t or "").encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    c = F.col(text) if isinstance(text, str) else text
    return _ratio(c)
