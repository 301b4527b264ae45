"""Property-based tests (hypothesis) on the pure-Python operator cores —
the invariants that must hold for ANY input, not just fixtures.
Spark stays out of the hypothesis loop (too slow per example); these
cover the logic the Spark stages wrap.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from dataingestionplayground_spark.ingest.chunker import semantic_splits, token_windows
from dataingestionplayground_spark.ingest.embed import hash_embed
from dataingestionplayground_spark.sources.markdown import parse_markdown

KINDS = {
    "header", "paragraph", "footer", "image", "table", "section", "code",
    "footnote", "definition_term", "definition",  # advanced extensions (r3)
    "math", "diagram", "figure_caption",  # advanced extensions (r6)
}

texts = st.text(alphabet=string.printable, max_size=2000)
tokens = st.lists(st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8), max_size=200)


@settings(max_examples=200, deadline=None)
@given(tokens, st.integers(1, 50))
def test_token_windows_cover_exactly_without_overlap(toks, max_tokens):
    wins = token_windows(toks, max_tokens, overlap=0)
    flat = [t for w in wins for t in w]
    assert flat == toks  # partition: no loss, no duplication, order kept
    assert all(1 <= len(w) <= max_tokens for w in wins)


@settings(max_examples=200, deadline=None)
@given(tokens, st.integers(2, 50), st.integers(0, 10))
def test_token_windows_overlap_invariants(toks, max_tokens, overlap):
    overlap = min(overlap, max_tokens - 1)
    wins = token_windows(toks, max_tokens, overlap)
    assert all(len(w) <= max_tokens for w in wins)
    # consecutive windows share exactly `overlap` tokens (except the tail)
    for a, b in zip(wins, wins[1:]):
        assert a[len(a) - overlap :] == b[:overlap] or len(b) < max_tokens
    # every token position is covered
    step = max_tokens - overlap
    covered = sum(1 for i, _ in enumerate(toks) if i < len(wins) * step + overlap)
    assert covered == len(toks)


@settings(max_examples=100, deadline=None)
@given(texts)
def test_parse_markdown_total_and_deterministic(text):
    """The parser never raises on arbitrary printable input, emits only
    known element kinds, and is deterministic."""
    els1 = parse_markdown("d", text)
    els2 = parse_markdown("d", text)
    assert [e.kind for e in els1] == [e.kind for e in els2]
    assert all(e.kind in KINDS for e in els1)
    # non-section elements carry markdown; text-bearing kinds carry text
    for e in els1:
        if e.kind in ("paragraph", "footer", "header"):
            assert e.text and e.text.strip()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet=string.ascii_lowercase + " .", min_size=1, max_size=60), max_size=10),
       st.floats(0.0, 1.0), st.integers(1, 64))
def test_semantic_splits_respect_content(sentences, threshold, max_tokens):
    sentences = [s for s in sentences if s.strip()]
    chunks = semantic_splits(sentences, hash_embed, threshold, max_tokens)
    # every sentence lands in exactly one chunk, in order
    assert " ".join(chunks).split() == " ".join(sentences).split()


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + " ", max_size=200))
def test_hash_embed_deterministic_unit_norm(text):
    import math

    v = hash_embed(text)
    assert v == hash_embed(text)
    assert len(v) == 384
    n = math.sqrt(sum(x * x for x in v))
    assert n == 0.0 or abs(n - 1.0) < 1e-3


@settings(max_examples=300, deadline=None)
@given(
    st.lists(  # corpus rows
        st.lists(st.integers(-8, 8), min_size=4, max_size=4), min_size=1, max_size=8
    ),
    st.lists(  # centroids (duplicates allowed -> exact ties exercised)
        st.lists(st.integers(-8, 8), min_size=4, max_size=4), min_size=1, max_size=6
    ),
)
def test_cosine_argmax_matches_sql_semantics(rows, cents):
    """The numpy argmax stage must reproduce the SQL form
    array_position(sims, array_max(sims)) - 1 exactly: first-index-of-max
    tie-break, zero-norm centroids never selected (null cosine), all-null
    rows -> -1. Integer-valued vectors keep every dot product exact in
    float64, so the python reference and the BLAS matmul agree bitwise."""
    import math

    import numpy as np

    from dataingestionplayground_spark.operators.similarity import _cosine_argmax_np

    E = np.asarray(rows, dtype=np.float64)
    C = np.asarray(cents, dtype=np.float64)
    got = _cosine_argmax_np(E, C)
    for r, e in enumerate(rows):
        en = math.sqrt(sum(x * x for x in e))
        sims = []
        for c in cents:
            cn = math.sqrt(sum(x * x for x in c))
            dot = float(sum(a * b for a, b in zip(e, c)))
            sims.append(None if en * cn == 0.0 else dot / (en * cn))
        non_null = [s for s in sims if s is not None]
        if not non_null:
            want = -1
        else:
            want = sims.index(max(non_null))  # first index of the max
        assert got[r] == want, (e, cents, sims, got[r], want)


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 500), st.integers(1, 24))
def test_ntile_buckets_match_sql_standard_distribution(n, k):
    """operators/prefix._ntile_buckets vs the SQL-standard definition:
    the first n%k buckets get n//k+1 rows, the rest n//k — built
    independently here row by row. This is the arithmetic every sharded
    ntile rewrite rests on."""
    import numpy as np

    from dataingestionplayground_spark.operators.prefix import _ntile_buckets

    ranks = np.arange(1, n + 1, dtype="int64")
    got = list(_ntile_buckets(ranks, n, k))
    q, r = divmod(n, k)
    expect = []
    for bucket in range(1, k + 1):
        expect.extend([bucket] * (q + (1 if bucket <= r else 0)))
    assert got == expect
    assert len(set(got)) == min(n, k)  # every bucket used (when n >= k)
