"""Byte-pair-encoding tokenizer training + corpus encoding — the
canonical LLM-pipeline operator the earlier rounds deliberately
deferred ("hard to oracle").  The oracle problem is solved the same
way emb_pagerank's was: the merge loop is a FIXED number of
deterministic steps, so the DuckDB oracle unrolls them as plain CTE
layers (pair-count -> argmax -> greedy merge via list_reduce), giving
a real independent cross-engine re-derivation — no frozen digests.

Algorithm (Sennrich et al. 2016, the standard word-frequency model):
  1. count word occurrences over the corpus (distributed),
  2. keep the top ``max_words`` words by (freq DESC, word ASC),
  3. repeat n_merges times: count adjacent token pairs weighted by
     word frequency, take the most frequent pair (ties broken by
     (left, right) ascending), replace its occurrences left-to-right
     non-overlapping in every word.

Scale design (the part that must survive 100 TB):
  - The only corpus-sized work is the word count: one explode + one
    hash-shuffle groupBy, then a distributed top-N
    (TakeOrderedAndProject — no global sort materialization).
  - The merge loop itself runs driver-side over the top-N
    word-frequency table.  That is the industry-standard shape
    (HuggingFace tokenizers / SentencePiece train on a word-count
    model, never the raw corpus): the table is Heaps-law-bounded and
    hard-capped at ``max_words`` rows regardless of corpus size, so
    driver memory and train time are O(max_words · word_len ·
    n_merges) — independent of corpus bytes.
  - Encoding streams the corpus through Arrow-batched mapInPandas
    with the merge list shipped by closure (n_merges tiny strings)
    and a per-batch word->tokens memo, so each distinct word in a
    batch is tokenized once.

Reference parity note: the reference repo has no tokenizer (its
surface is ANN search — QUAKE_working_demo.ipynb cell-1); this
operator belongs to the training-data-pipeline surface the build
brief adds on top.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lowercase alphabetic words only: keeps the symbol alphabet ASCII so
# Spark, DuckDB, and Python re agree byte-for-byte on both the word
# split and the (left, right) tie-break collation.
WORD_PATTERN = "[a-z]+"


def word_frequencies(docs: DataFrame, text_col: str = "text",
                     max_words: int | None = 2000) -> DataFrame:
    """(word, freq) for the ``max_words`` most frequent words, ordered
    by (freq DESC, word ASC) — a deterministic total order, so the cap
    is reproducible on any engine and any partitioning.  ``None``
    returns every distinct word (no ordering clause) — the shape
    tokenize_words wants for full-vocab application."""
    words = F.explode(F.expr(
        f"regexp_extract_all(lower({text_col}), '{WORD_PATTERN}', 0)"
    )).alias("word")
    wf = (docs.select(words)
          .groupBy("word")
          .agg(F.count("*").cast("long").alias("freq")))
    if max_words is None:
        return wf
    return wf.orderBy(F.col("freq").desc(), F.col("word")) \
             .limit(max_words)


def _apply_merge(toks: tuple, left: str, right: str,
                 merged: str) -> tuple:
    """One BPE merge pass: replace (left, right) occurrences
    left-to-right, non-overlapping — 'aaaa' with (a,a) -> (aa, aa)."""
    out = []
    i = 0
    n = len(toks)
    while i < n:
        if i + 1 < n and toks[i] == left and toks[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return tuple(out)


def train_bpe(word_freqs: list, n_merges: int = 16) -> list:
    """Driver-side merge training over a (word, freq) list.  Returns
    [(step, left, right, merged, pair_count), ...] with step 1-based.
    Raises if the pair space is exhausted before ``n_merges`` — a loud
    failure beats an oracle row-count mismatch."""
    toks = {w: tuple(w) for w, _ in word_freqs}
    freq = {w: int(f) for w, f in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict = {}
        for w, t in toks.items():
            f = freq[w]
            for i in range(len(t) - 1):
                p = (t[i], t[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            raise ValueError(
                f"train_bpe: pair space exhausted at step {step} "
                f"(< n_merges={n_merges}); lower n_merges")
        # most frequent pair; ties by (left, right) ascending — the
        # same total order the oracle's ORDER BY cnt DESC, l, r uses
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        merges.append((step, left, right, merged, cnt))
        for w, t in toks.items():
            toks[w] = _apply_merge(t, left, right, merged)
    return merges


def train_bpe_on_corpus(spark, docs: DataFrame, n_merges: int = 16,
                        max_words: int = 2000) -> list:
    """Distributed word count -> driver-side merge loop (see module
    docstring for why the collect is vocabulary-bounded, not
    corpus-bounded)."""
    wf = word_frequencies(docs, max_words=max_words).collect()
    return train_bpe([(r["word"], r["freq"]) for r in wf],
                     n_merges=n_merges)


def tokenize_words(words: DataFrame, merges: list,
                   word_col: str = "word") -> DataFrame:
    """Tokenize a relation of distinct words with a trained merge
    list: (word, toks 'a b c', n_toks).  Same sequential merge
    application as encode_corpus — exposed separately so the exact
    token BOUNDARIES (not just counts) can be verified per word."""
    merge_ops = [(m[1], m[2], m[3]) for m in merges]

    def gen(batches):
        for pdf in batches:
            toks = []
            for w in pdf[word_col]:
                t = tuple(w)
                for left, right, merged in merge_ops:
                    t = _apply_merge(t, left, right, merged)
                toks.append(t)
            yield pd.DataFrame({
                "word": pdf[word_col],
                "toks": [" ".join(t) for t in toks],
                "n_toks": pd.Series([len(t) for t in toks],
                                    dtype="int64"),
            })

    return words.select(F.col(word_col).alias("word")).mapInPandas(
        gen, "word string, toks string, n_toks long")


def encode_corpus(docs: DataFrame, merges: list,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Apply a trained merge list to every document: (doc_id, n_words,
    n_tokens).  Every word — in-vocab or OOV — is tokenized by
    applying the merges in rank order, one left-to-right pass each,
    which reproduces the training tokenization exactly for in-vocab
    words (training applied the same passes in the same order)."""
    merge_ops = [(m[1], m[2], m[3]) for m in merges]
    pat = re.compile(WORD_PATTERN)
    id_c, text_c = id_col, text_col

    def gen(batches):
        memo: dict = {}

        def n_toks(w: str) -> int:
            n = memo.get(w)
            if n is None:
                t = tuple(w)
                for left, right, merged in merge_ops:
                    t = _apply_merge(t, left, right, merged)
                n = len(t)
                memo[w] = n
            return n

        for pdf in batches:
            words = [pat.findall(s.lower()) if s is not None else []
                     for s in pdf[text_c]]
            yield pd.DataFrame({
                "doc_id": pdf[id_c].astype("int64"),
                "n_words": pd.Series(
                    [len(ws) for ws in words], dtype="int64"),
                "n_tokens": pd.Series(
                    [sum(n_toks(w) for w in ws) for ws in words],
                    dtype="int64"),
            })

    return docs.select(id_col, text_col).mapInPandas(
        gen, "doc_id long, n_words long, n_tokens long")
