"""Text-analysis column expressions for the LLM-pipeline surface.

All JVM-side built-ins (split/regexp/md5/transform) — no Python UDFs —
so they run inside whole-stage codegen and scale linearly with input.
Each Spark expression has a DuckDB oracle twin (``*_sql``) kept adjacent
so the two stay in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = "\\\\s+"   # Spark SQL literal: parser eats one backslash level
WS_D = "\\s+"  # DuckDB literal: backslashes are literal

# Tiny per-language stopword lists for the heuristic language classifier.
# Deterministic and public-knowledge; scoring = stopword-hit ratio.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "por", "con"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}


def tokens(col: str) -> Column:
    """Whitespace tokenization -> ARRAY<STRING> (empty tokens dropped)."""
    return F.expr(f"filter(split({col}, '{WS}'), x -> x != '')")


def tokens_sql(col: str) -> str:
    return f"list_filter(regexp_split_to_array({col}, '{WS_D}'), x -> x != '')"


def token_count(col: str) -> Column:
    return F.size(tokens(col))


def token_count_sql(col: str) -> str:
    return f"CAST(len({tokens_sql(col)}) AS INTEGER)"


# A BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_token_count(col: str) -> Column:
    return F.expr(f"size(regexp_extract_all({col}, '{BPE_RE}', 0))")


def bpe_token_count_sql(col: str) -> str:
    return f"CAST(len(regexp_extract_all({col}, '{BPE_RE}')) AS INTEGER)"


def shingles_from_tokens(tok_col: str, n: int = 3) -> Column:
    """n-word shingles from a *precomputed* token-array column.

    Keep tokenization in its own projection: inlining it here would make
    the transform lambda re-split the text for every shingle (O(tokens^2)).
    Guarded: Spark's ``sequence(1, 0)`` DESCENDS, so short docs need an
    explicit empty-array branch.
    """
    return F.expr(
        f"if(size({tok_col}) >= {n}, "
        f"transform(sequence(1, size({tok_col}) - {n - 1}, 1), "
        f"i -> concat_ws(' ', slice({tok_col}, i, {n}))), "
        f"cast(array() as array<string>))"
    )


def word_shingles(col: str, n: int = 3) -> Column:
    """Overlapping n-word shingles -> ARRAY<STRING> (basis for MinHash).

    NOTE: for hot paths prefer ``tokens()`` into a column then
    :func:`shingles_from_tokens` (avoids re-splitting per element).
    """
    return shingles_from_tokens(f"filter(split({col}, '{WS}'), x -> x != '')", n)


def word_shingles_sql(col: str, n: int = 3) -> str:
    toks = tokens_sql(col)
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' '))"
    )


def char_shingles(col: str, k: int = 8) -> Column:
    """Overlapping k-char shingles (for SimHash / winnowing fingerprints)."""
    return F.expr(
        f"if(length({col}) >= {k}, "
        f"transform(sequence(1, length({col}) - {k - 1}, 1), i -> substring({col}, i, {k})), "
        f"cast(array() as array<string>))"
    )


def char_shingles_sql(col: str, k: int = 8) -> str:
    return (
        f"list_transform(generate_series(1, greatest(length({col}) - {k - 1}, 0)), "
        f"i -> substr({col}, i, {k}))"
    )


def normalize_text(col: str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.expr(f"trim(regexp_replace(lower({col}), '{WS}', ' '))")


def normalize_text_sql(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '{WS_D}', ' ', 'g'))"


def fingerprint(col: str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))


def fingerprint_sql(col: str) -> str:
    return f"md5({normalize_text_sql(col)})"


def stopword_hits(col: str, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"size(filter(filter(split(lower({col}), '{WS}'), x -> x != ''), t -> array_contains(array({arr}), t)))"
    )


def stopword_hits_sql(col: str, lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({tokens_sql(f'lower({col})')}, t -> list_contains([{arr}], t))) AS INTEGER)"
    )
