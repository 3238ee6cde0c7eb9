"""Unit tests for the BPE tokenizer (operators/bpe.py): merge
semantics, tie-breaks, the vocab cap, partitioning invariance, and
encode/train agreement."""

import pytest

from quake_vector_search_spark.operators.bpe import (
    _apply_merge,
    encode_corpus,
    train_bpe,
    train_bpe_on_corpus,
    word_frequencies,
)


def test_apply_merge_greedy_left_to_right_non_overlapping():
    # 'aaaa' -> (aa, aa); 'aaa' -> (aa, a): the canonical greedy pass
    assert _apply_merge(tuple("aaaa"), "a", "a", "aa") == ("aa", "aa")
    assert _apply_merge(tuple("aaa"), "a", "a", "aa") == ("aa", "a")
    # merged token never re-matches within the same pass
    assert _apply_merge(("ab", "a", "b"), "a", "b", "ab") == ("ab", "ab")
    # no false positive across token boundaries (token equality, not
    # substring matching)
    assert _apply_merge(("ab", "c"), "b", "c", "bc") == ("ab", "c")
    assert _apply_merge(("x",), "a", "b", "ab") == ("x",)


def test_train_bpe_counts_and_tiebreak():
    # 'abab' freq 2 -> pairs: (a,b):4(2 per word occ x freq 2... ) etc.
    merges = train_bpe([("abab", 2), ("ab", 3)], n_merges=2)
    # step 1: (a,b) count = 2*2 + 1*3 = 7 beats (b,a) = 2
    assert merges[0] == (1, "a", "b", "ab", 7)
    # after merge: 'abab' -> (ab, ab), 'ab' -> (ab,)
    # step 2: only pair left is (ab, ab) with count 2
    assert merges[1] == (2, "ab", "ab", "abab", 2)


def test_train_bpe_tiebreak_is_lexicographic():
    # (a,b) and (c,d) both count 1 -> (a,b) wins by (left, right) asc
    merges = train_bpe([("ab", 1), ("cd", 1)], n_merges=1)
    assert merges[0][1:4] == ("a", "b", "ab")


def test_train_bpe_raises_when_pairs_exhausted():
    with pytest.raises(ValueError, match="exhausted"):
        train_bpe([("ab", 5)], n_merges=3)  # only 2 merges possible


def test_word_frequencies_cap_is_deterministic(spark):
    rows = [(1, "zz zz aa aa bb"), (2, "Bb cc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # freq: zz=2 aa=2 bb=2 cc=1; cap 2 keeps (aa,2),(bb,2) by word asc
    got = sorted((r["word"], r["freq"])
                 for r in word_frequencies(df, max_words=2).collect())
    assert got == [("aa", 2), ("bb", 2)]


def test_train_is_partitioning_invariant(spark, sf_dir):
    from quake_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = train_bpe_on_corpus(spark, docs, n_merges=6)
    b = train_bpe_on_corpus(spark, docs.repartition(13), n_merges=6)
    assert a == b and len(a) == 6
    # merged token is always left||right and counts are positive
    for step, l, r, m, c in a:
        assert m == l + r and c > 0


def test_encode_matches_training_tokenization(spark):
    rows = [(1, "the theme there"), (2, "other than the"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = [(r["word"], r["freq"])
          for r in word_frequencies(df).collect()]
    merges = train_bpe(wf, n_merges=4)
    out = {r["doc_id"]: r for r in encode_corpus(df, merges).collect()}
    assert out[3]["n_words"] == 0 and out[3]["n_tokens"] == 0
    # independently recompute: apply merges per word
    import re
    for doc_id, text in rows:
        n_tok = 0
        for w in re.findall("[a-z]+", text.lower()):
            t = tuple(w)
            for _, l, r, m, _ in merges:
                t = _apply_merge(t, l, r, m)
            n_tok += len(t)
        assert out[doc_id]["n_tokens"] == n_tok
        # merging only ever reduces token count
        assert out[doc_id]["n_tokens"] <= sum(
            len(w) for w in re.findall("[a-z]+", text.lower()))


def test_encode_handles_oov_words(spark):
    train = spark.createDataFrame(
        [(1, "low lower lowest")], "doc_id long, text string")
    wf = [(r["word"], r["freq"])
          for r in word_frequencies(train).collect()]
    merges = train_bpe(wf, n_merges=2)
    # encode a corpus containing a word never seen in training
    test = spark.createDataFrame(
        [(9, "slow")], "doc_id long, text string")
    row = encode_corpus(test, merges).collect()[0]
    assert row["n_words"] == 1
    # 'slow': merges trained on low* apply where the pair occurs
    t = tuple("slow")
    for _, l, r, m, _ in merges:
        t = _apply_merge(t, l, r, m)
    assert row["n_tokens"] == len(t)


def test_api_tokenizer_and_whiten_facades(spark):
    import numpy as np

    from quake_vector_search_spark import api

    docs = spark.createDataFrame(
        [(1, "pack my box with five dozen jugs"),
         (2, "pack the box again")],
        "doc_id long, text string")
    merges = api.train_tokenizer(spark, docs, n_merges=3)
    assert len(merges) == 3 and merges[0][0] == 1
    enc = {r["doc_id"]: r["n_tokens"]
           for r in api.tokenize(docs, merges).collect()}
    assert enc[1] > 0 and enc[2] > 0

    rng = np.random.RandomState(2)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in rng.randn(4) * [3, 1, 1, 0.2]])
         for i in range(100)],
        "vec_id long, embedding array<double>")
    Y = np.stack([r["proj"] for r in api.whiten(emb, k=2).collect()])
    assert Y.shape == (100, 2)
    assert np.abs(np.cov(Y.T, bias=True) - np.eye(2)).max() < 1e-8


def test_tokenize_words_boundaries(spark):
    from quake_vector_search_spark.operators.bpe import tokenize_words

    merges = [(1, "a", "b", "ab", 9), (2, "ab", "c", "abc", 5)]
    words = spark.createDataFrame(
        [("abcab",), ("xyz",), ("ab",)], "word string")
    got = {r["word"]: (r["toks"], r["n_toks"])
           for r in tokenize_words(words, merges).collect()}
    assert got["abcab"] == ("abc ab", 2)
    assert got["xyz"] == ("x y z", 3)
    assert got["ab"] == ("ab", 1)


# ------------------------- property tests (hypothesis, SURVEY.md §5.2)
from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1,
    max_size=30)


@settings(max_examples=60, deadline=None)
@given(_WORDS, st.integers(min_value=1, max_value=6))
def test_bpe_training_invariants(words, n_merges):
    """Pure-driver properties on arbitrary corpora: merged token is
    always the concat of its parts; applying the merge list to any
    training word reconstructs that word exactly (lossless); token
    count never increases; pair counts are positive and derived from
    the actual pre-merge state."""
    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    wf = sorted(freqs.items())
    try:
        merges = train_bpe(wf, n_merges=n_merges)
    except ValueError:
        # exhaustion is legitimate ONLY if some k < n_merges merges
        # collapse every distinct word to a single token (no adjacent
        # pairs remain anywhere)
        k = n_merges - 1
        while k > 0:
            try:
                partial = train_bpe(wf, n_merges=k)
                break
            except ValueError:
                k -= 1
        else:
            partial = []
        for w, _ in wf:
            t = tuple(w)
            for _, l, r, m, _ in partial:
                t = _apply_merge(t, l, r, m)
            assert len(t) == 1, (w, t)
        return
    for step, l, r, m, c in merges:
        assert m == l + r and c >= 1
    for w, _ in wf:
        t = tuple(w)
        for _, l, r, m, _ in merges:
            t = _apply_merge(t, l, r, m)
        assert "".join(t) == w          # lossless reconstruction
        assert 1 <= len(t) <= len(w)    # merging never grows


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="ab", min_size=2, max_size=40))
def test_apply_merge_equals_naive_rescan(word):
    """_apply_merge's single pass must equal the naive left-to-right
    scan-with-restart definition for the overlap-heavy (a,a) pair."""
    got = _apply_merge(tuple(word), "a", "a", "aa")
    out, i = [], 0
    while i < len(word):
        if word[i:i + 2] == "aa":
            out.append("aa")
            i += 2
        else:
            out.append(word[i])
            i += 1
    assert list(got) == out
