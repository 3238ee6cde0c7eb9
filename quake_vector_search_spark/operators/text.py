"""Text-analysis operators (E13 + training-data pipeline surface):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure Catalyst expressions (regexp/string built-ins,
whole-stage codegen) — no UDFs, so they run JVM-side at full scan speed
and reproduce exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quake_vector_search_spark.sources.catalog import spread

# shared stopword sets for the language-ID vote (tiny, frozen)
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "los", "una", "es"),
    "de": ("der", "die", "und", "das", "ein", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "un", "une", "est"),
}

# a BPE-ish tokenizer regex: word pieces, numbers, or single
# non-space symbols — the shape GPT-2-style pre-tokenizers use
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts, distinct-word count, average
    word length — the basic curation statistics. avg_token_len is an
    integer ratio, so it rounds via the exact integer path (_r6), not
    float ROUND — see quality_score."""
    docs = spread(docs)
    words = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    # escape for the SQL string literal (Spark eats single backslashes)
    bpe_sql_pattern = BPE_ISH_PATTERN.replace("\\", "\\\\")
    bpe = F.expr(
        rf"regexp_extract_all({text_col}, '{bpe_sql_pattern}', 0)")
    nz_chars = F.length(
        F.regexp_replace(text_col, r"\s+", "")).cast("long")
    n_words = F.greatest(F.size(words), F.lit(1)).cast("long")
    return docs.select(
        id_col,
        F.size(words).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        _r6(nz_chars, n_words).alias("avg_token_len"),
        F.length(text_col).alias("n_chars"))


def _r6(p, q):
    """Exact HALF_UP decimal rounding of the non-negative rational p/q
    to 6 places via integer arithmetic:
    floor((2·p·10⁶ + q) / (2·q)) / 10⁶. Engine-agnostic — float
    ROUND(x, 6) flips between engines when the double for p/q sits on
    a .xxxxxx5 boundary (observed: quality 0.8178125 rounding to
    ...12 on Spark and ...13 on DuckDB at sf0.1).

    Integer division is (a − a mod b) / b: the subtraction makes the
    dividend an exact multiple, so the double division returns the
    exact integer quotient while a = 2·p·10⁶ + q stays below 2⁵³ —
    p ≤ q and q ≤ 10·n_chars·n_tokens means documents up to
    ~100k chars × 450 tokens are exact, far past any real row."""
    a = F.lit(2) * p * F.lit(1_000_000) + q
    b = F.lit(2) * q
    return (((a - F.pmod(a, b)) / b).cast("long")
            .cast("double") / 1e6)


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: alpha/punct/digit/whitespace ratios +
    a stopword ratio, combined into [0,1]. The formula is arbitrary but
    frozen; what matters is that it's deterministic, cheap (one scan,
    codegen'd), and mirrors what C4/Gopher-style filters measure.

    Every emitted ratio is a rational with integer numerator and
    denominator, so rounding happens in exact integer arithmetic
    (_r6) and the bucket thresholds compare cross-multiplied integers
    — bit-identical across engines at any scale, immune to
    double-rounding flips."""
    docs = spread(docs)
    L = F.greatest(F.length(text_col), F.lit(1)).cast("long")
    na = F.length(F.regexp_replace(text_col, "[^a-zA-Z]", "")).cast("long")
    nd = F.length(F.regexp_replace(text_col, "[^0-9]", "")).cast("long")
    np_ = F.length(
        F.regexp_replace(text_col, r"[^.,;:!?'\"()-]", "")).cast("long")
    words = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    T = F.greatest(F.size(words), F.lit(1)).cast("long")
    ns = F.size(F.filter(
        words, lambda w: F.lower(w).isin(*LANG_STOPWORDS["en"]))) \
        .cast("long")
    # quality = 0.5·na/L + 0.3·(1−np/L) + 0.1·(1−nd/L) + 0.1·ns/T
    #         = [T·(5·na + 3·(L−np) + (L−nd)) + L·ns] / (10·L·T)
    P = (T * (F.lit(5) * na + F.lit(3) * (L - np_) + (L - nd))
         + L * ns)
    Q = F.lit(10) * L * T
    return docs.select(
        id_col,
        _r6(na, L).alias("alpha_ratio"),
        _r6(np_, L).alias("punct_ratio"),
        _r6(nd, L).alias("digit_ratio"),
        _r6(ns, T).alias("stopword_ratio"),
        _r6(P, Q).alias("quality"),
        # P/Q >= t  ⇔  100·P >= 100·t·Q, exact in integers
        F.when(F.lit(100) * P >= F.lit(55) * Q, "high")
         .when(F.lit(100) * P >= F.lit(45) * Q, "mid")
         .otherwise("low").alias("quality_bucket"))


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: count hits from each language's
    stopword list over the token set; CJK codepoints short-circuit to
    'zh'; ties break in frozen (en, es, de, fr) order; zero hits →
    'unknown'. A deliberately simple, fully-SQL heuristic (the fastText
    class of models would ride in a pandas UDF — see multimodal/)."""
    docs = spread(docs)
    words = F.expr(rf"regexp_extract_all(lower({text_col}), '\\S+', 0)")
    h = {lang: F.size(F.filter(words, lambda w: w.isin(*sw)))
         for lang, sw in LANG_STOPWORDS.items()}
    has_cjk = F.length(
        F.regexp_replace(text_col, r"[^一-鿿]", "")) > 0
    # cascade: first listed language with the (weakly) max vote wins
    pred = (
        F.when(has_cjk, "zh")
        .when((h["en"] > 0) & (h["en"] >= h["es"]) & (h["en"] >= h["de"])
              & (h["en"] >= h["fr"]), "en")
        .when((h["es"] > 0) & (h["es"] >= h["de"]) & (h["es"] >= h["fr"]),
              "es")
        .when((h["de"] > 0) & (h["de"] >= h["fr"]), "de")
        .when(h["fr"] > 0, "fr")
        .otherwise("unknown"))
    return docs.select(id_col, pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of casefolded, punctuation-stripped,
    whitespace-collapsed text — catches formatting-only duplicates that
    exact dedup misses. Emits the fingerprint and a keep-first dup
    flag (one shuffle on the fingerprint)."""
    docs = spread(docs)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
        " +", " "))
    from pyspark.sql import Window
    fp = docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (fp.withColumn("_rn", F.row_number().over(w))
            .select(id_col, "fingerprint", (F.col("_rn") > 1).alias("is_dup")))


def tfidf_top_terms(docs: DataFrame, top_n: int = 3,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-N terms per document by tf-idf (E13): term frequency per
    (doc, term), document frequency per term, idf = ln(N/df). Two
    shuffles (tf groupBy, df groupBy) + one window for the ranked
    top-N; the corpus-size scalar rides in via a broadcast cross join
    so the whole plan stays distributed. Tie-break (tfidf DESC, term
    ASC) for hash-stable output."""
    from pyspark.sql import Window
    tok = (spread(docs.select(id_col, text_col))
           .select(F.col(id_col),
                   F.explode(F.split(F.lower(F.col(text_col)), " "))
                    .alias("term"))
           .where(F.col("term") != ""))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("term").agg(
        F.countDistinct(id_col).alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn(
                  "tfidf",
                  F.col("tf") * F.log(F.col("n_docs")
                                      / F.col("df").cast("double"))))
    w = (Window.partitionBy(id_col)
         .orderBy(F.desc("tfidf"), F.asc("term")))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= top_n)
            .select(F.col(id_col), "term",
                    F.round("tfidf", 6).alias("tfidf"),
                    F.col("rn").cast("int").alias("rank")))


def chunk_fixed(docs: DataFrame, size: int = 200, overlap: int = 50,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixed-size character chunking with overlap — the training-data
    pipeline's document splitter. Chunk i covers
    ``[i*stride, i*stride + size)`` with ``stride = size - overlap``;
    every character position is covered and consecutive chunks share
    ``overlap`` characters. Emits (id, chunk_id, chunk_text, chunk_len).

    Pure Catalyst: sequence + posexplode + substring, so chunking is a
    narrow per-row transform (no shuffle, whole-stage codegen) — at
    100 TB it streams through the scan, and the output inherits the
    input partitioning for downstream tokenize/dedup stages.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    # last start index: smallest i with i*stride + size >= len, so the
    # final chunk reaches the end and is never fully contained in its
    # predecessor (its length is provably > overlap, or == size)
    n_last = F.greatest(F.ceil((F.length(text_col) - size) / stride),
                        F.lit(0))
    return (docs
            .select(F.col(id_col),
                    F.posexplode(F.sequence(F.lit(0), n_last))
                     .alias("chunk_id", "_start"),
                    F.col(text_col))
            .select(id_col, "chunk_id",
                    F.substring(F.col(text_col),
                                (F.col("_start") * stride + 1).cast("int"),
                                size).alias("chunk_text"))
            .withColumn("chunk_len", F.length("chunk_text")))


def ngram_frequencies(docs: DataFrame, n: int = 2, top: int = 20,
                      text_col: str = "text") -> DataFrame:
    """Corpus-level n-gram frequency table (training-data analysis:
    boilerplate detection, contamination probes). Whitespace words →
    per-doc n-gram list (with duplicates — corpus frequency counts
    every occurrence) → explode → count → deterministic top-``top``
    by (count DESC, ngram ASC).

    One narrow explode + one count shuffle + TakeOrdered; at corpus
    scale the count aggregate partial-combines map-side, so the shuffle
    moves distinct n-grams, not occurrences.
    """
    w = F.split(F.col(text_col), " ")
    gram = " , ".join(f"element_at(_w, i + {j})" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(_w) >= {n} THEN "
        f"transform(sequence(1, size(_w) - {n - 1}), "
        f"i -> concat_ws(' ', {gram})) "
        f"ELSE array() END")
    return (docs.select(w.alias("_w"))
            .select(F.explode(grams).alias("ngram"))
            .groupBy("ngram")
            .agg(F.count("*").alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
            .limit(top))


def kgram_fingerprints(docs: DataFrame, k: int = 8, w: int = 4,
                       method: str = "winnow",
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """K-gram fingerprinting (MOSS-style local fingerprints): hash
    every k-character window of the normalized text, then thin the
    hash stream to ~1/w density with a deterministic selection rule:

    - ``winnow``: keep position i iff its hash is the minimum of the
      forward window [i, i+w-1] — a winnowing-style density-1/w
      sampler (the classic algorithm's any-containing-window argmin
      differs on ties/middle-window cases; this variant trades its
      max-gap bound for a one-frame window expression). Plan: one
      window function partitioned by doc — a single shuffle on doc_id.
    - ``modp``: keep positions where hash % w == 0 (Broder 0-mod-p
      selection) — a NARROW transform, zero shuffles, for when the
      fingerprint step must ride inside an ingest scan at 100 TB.

    Each k-gram is hashed independently with the portable md5 → bigint
    construction (a columnar engine gains nothing from an O(1) rolling
    update — every substring hash is one vectorized expression), so
    fingerprints are deterministic cross-engine and the DuckDB oracle
    computes the identical selection.

    Returns (id, pos, fp_hash) for selected positions; docs shorter
    than k yield no rows.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    d = docs.select(F.col(id_col), norm.alias("_t")).where(
        F.length("_t") >= k)
    pos = F.explode(F.sequence(
        F.lit(0), F.length("_t") - k)).alias("pos")
    d = d.select(id_col, "_t", pos)
    gram = F.expr(f"substr(_t, pos + 1, {k})")
    h = (F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long"))
    d = d.select(id_col, "pos", h.alias("fp_hash"))
    if method == "modp":
        return d.where(F.col("fp_hash") % w == 0)
    from pyspark.sql import Window as W
    fwd = (W.partitionBy(id_col).orderBy(F.col("pos").asc())
           .rowsBetween(0, w - 1))
    return (d.withColumn("_mn", F.min("fp_hash").over(fwd))
            .where(F.col("fp_hash") == F.col("_mn"))
            .drop("_mn"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 3) -> DataFrame:
    """Within-document repetition signal (the Gopher/MassiveText
    quality-rule family: high duplicate-n-gram fraction marks
    boilerplate, keyword stuffing, and degenerate generations):
    per document, the fraction of n-gram OCCURRENCES that repeat an
    earlier n-gram in the same document — dup_frac = (T − D)/T with
    T = total occurrences, D = distinct.

    Purely narrow (per-row array arithmetic, no shuffle at all), so it
    composes into an ingest scan at any scale. dup_frac is a rational
    of two in-row integers, rounded with the exact integer HALF_UP
    arithmetic (_r6) — engine-portable, no float boundary flips.

    Returns (id, n_grams, n_distinct, dup_frac); docs shorter than n
    words report T = 0, dup_frac = 0.
    """
    w = F.split(F.col(text_col), " ")
    gram = " , ".join(f"element_at(_w, i + {j})" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(_w) >= {n} THEN "
        f"transform(sequence(1, size(_w) - {n - 1}), "
        f"i -> concat_ws(' ', {gram})) "
        f"ELSE array() END")
    d = (docs.select(F.col(id_col), w.alias("_w"))
         .select(id_col, grams.alias("_g"))
         .select(id_col,
                 F.size("_g").cast("long").alias("n_grams"),
                 F.size(F.array_distinct("_g")).cast("long")
                  .alias("n_distinct")))
    dup = F.when(F.col("n_grams") > 0,
                 _r6(F.col("n_grams") - F.col("n_distinct"),
                     F.col("n_grams"))).otherwise(F.lit(0.0))
    return d.select(id_col, "n_grams", "n_distinct",
                    dup.alias("dup_frac"))


def bigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Corpus-LM fluency score (the perplexity-filter shape of LLM
    data pipelines, with the corpus itself as the language model):
    train an MLE bigram model on the whole corpus in one aggregation,
    then score every document by its mean bigram log-probability
    avg ln P(w2|w1), P(w2|w1) = c(w1 w2) / c(w1 ·). Low scores mark
    text whose transitions are rare in the corpus — gibberish,
    boilerplate with unusual joins, wrong-language fragments.

    Plan: one narrow explode to (doc, w1, w2) occurrences; bigram and
    context counts are two partial-combining aggregates over distinct
    grams (shuffle moves the vocabulary, not the occurrences); the
    scoring join is occurrences ⋈ bigram-counts on (w1, w2) — a plain
    equi-join that AQE handles at any scale. Every document bigram
    exists in the model by construction (the corpus trained on it), so
    MLE needs no smoothing and no log(0) guard.

    Returns (id, n_bigrams, avg_logp) for documents with ≥ 1 bigram;
    avg_logp rounded to 4 (an irrational log sum — float rounding,
    same class as the revenue aggregates, not a .5-boundary rational).
    """
    w = F.split(F.col(text_col), " ")
    pairs = F.expr(
        "CASE WHEN size(_w) >= 2 THEN "
        "transform(sequence(1, size(_w) - 1), "
        "i -> struct(element_at(_w, i) AS w1, "
        "element_at(_w, i + 1) AS w2)) "
        "ELSE array() END")
    occ = (docs.select(F.col(id_col), w.alias("_w"))
           .select(id_col, F.explode(pairs).alias("p"))
           .select(id_col, "p.w1", "p.w2"))
    bg = occ.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ctx = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = bg.join(ctx, "w1")
    scored = (occ.join(model, ["w1", "w2"])
              .groupBy(id_col)
              .agg(F.count("*").alias("n_bigrams"),
                   F.avg(F.log(F.col("c12").cast("double")
                               / F.col("c1"))).alias("_alp")))
    return scored.select(id_col, "n_bigrams",
                         F.round("_alp", 4).alias("avg_logp"))


def chunk_dedup_stats(docs: DataFrame, size: int = 200,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Sub-document (paragraph-level) dedup signal — the MassiveText
    pass that document-level dedup misses: split every document into
    non-overlapping fixed chunks, keep-first-flag every identical
    chunk ACROSS the corpus, and report per document how much of it is
    repeated content from elsewhere.

    Plan: the narrow chunker (chunk_fixed, overlap 0) feeds ONE
    shuffle keyed on the chunk hash — the honest global-dedup exchange,
    moving (hash, doc, chunk) triples, never the corpus — then a tiny
    per-doc aggregate. dup_chunk_frac is an exact integer-rounded
    rational (_r6), float-boundary-proof cross-engine.

    Returns (id, n_chunks, n_dup_chunks, dup_chunk_frac).
    """
    from pyspark.sql import Window

    ch = chunk_fixed(docs, size=size, overlap=0,
                     id_col=id_col, text_col=text_col)
    w = (Window.partitionBy(F.md5("chunk_text"))
         .orderBy(F.col(id_col).asc(), F.col("chunk_id").asc()))
    flagged = ch.withColumn("_rn", F.row_number().over(w))
    agg = (flagged.groupBy(id_col)
           .agg(F.count("*").alias("n_chunks"),
                F.sum(F.when(F.col("_rn") > 1, 1).otherwise(0))
                 .cast("long").alias("n_dup_chunks")))
    return agg.select(id_col, "n_chunks", "n_dup_chunks",
                      _r6(F.col("n_dup_chunks"),
                          F.col("n_chunks")).alias("dup_chunk_frac"))


def dup_span_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 40,
                   stride: int = 20) -> DataFrame:
    """Character-window duplicated-span detection — the substring-level
    dedup signal of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL'22), re-expressed relationally: a
    suffix array over 100 TB is not a Spark-shaped object, but its
    curation OUTPUT (how much of each document is text repeated
    elsewhere in the corpus) is reachable with strided k-char windows
    hashed corpus-wide.

    Windows start at 1, 1+stride, ... while a full k-char window fits
    (docs shorter than k contribute their whole text as one window).
    A window is duplicated if its hash occurs in >= 2 DISTINCT
    documents. Plan: narrow explode (~len/stride rows/doc), then ONE
    shuffle on the window hash where a partitioned-window collect_set
    counts distinct owning docs in place (no second scan, no
    self-join — plan-audited down from the 2-scan/7-exchange
    groupBy+join form), then the per-doc aggregate. Nothing
    driver-side, no n². dup_span_frac is an exact integer-rounded
    rational (_r6).

    Returns (id, n_windows, n_dup_windows, dup_span_frac).
    """
    from pyspark.sql import Window

    docs = spread(docs)
    t = F.col(text_col)
    offs = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(k - 1), F.lit(1)),
        F.lit(stride))
    w = (docs.select(F.col(id_col), t.alias("_t"),
                     F.explode(offs).alias("off"))
         .select(id_col,
                 F.md5(F.expr(f"substring(_t, off, {k})")).alias("h")))
    nd = F.size(F.collect_set(F.col(id_col))
                .over(Window.partitionBy("h")))
    flagged = w.withColumn("nd", nd)
    agg = (flagged.groupBy(id_col)
           .agg(F.count("*").cast("long").alias("n_windows"),
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                 .cast("long").alias("n_dup_windows")))
    return agg.select(id_col, "n_windows", "n_dup_windows",
                      _r6(F.col("n_dup_windows"),
                          F.col("n_windows")).alias("dup_span_frac"))


# frozen default weights (milli-units) for the linear curation
# classifier: favor alphabetic, stopword-bearing prose; penalize
# punctuation- and digit-heavy rows. Arbitrary but frozen — the
# operator contract is the exact linear-model evaluation, not the
# particular weights (callers pass their own trained weights).
QUALITY_WEIGHTS_MILLI: dict[str, int] = {
    "alpha": 600, "punct": -300, "digit": -200,
    "stopword": 400, "bias": -250,
}


def linear_quality_classifier(docs: DataFrame,
                              weights: dict[str, int] | None = None,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """fasttext-style quality filtering, Spark-first: the trained
    model's inference is a LINEAR form over cheap per-row signals, so
    it runs as a broadcast-free pure-Catalyst projection — the shape a
    learned quality filter takes at 100 TB (model weights fold into
    the expression; no UDF, no model server in the hot path).

    Exact integer path: with milli-unit integer weights w and the
    ratio signals na/L, np/L, nd/L, ns/T,

      logit = (T·(w_a·na + w_p·np + w_d·nd) + w_s·ns·L + w_0·L·T)
              / (1000·L·T)

    so the decision (logit > 0) and the 6-place rounded logit are both
    computed in integers — bit-identical across engines, immune to
    float-sum ordering. Returns (id, logit, accept).
    """
    wts = dict(QUALITY_WEIGHTS_MILLI)
    if weights:
        wts.update(weights)
    docs = spread(docs)
    L = F.greatest(F.length(text_col), F.lit(1)).cast("long")
    na = F.length(F.regexp_replace(text_col, "[^a-zA-Z]", "")).cast("long")
    nd = F.length(F.regexp_replace(text_col, "[^0-9]", "")).cast("long")
    np_ = F.length(
        F.regexp_replace(text_col, r"[^.,;:!?'\"()-]", "")).cast("long")
    words = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    T = F.greatest(F.size(words), F.lit(1)).cast("long")
    ns = F.size(F.filter(
        words, lambda w: F.lower(w).isin(*LANG_STOPWORDS["en"]))) \
        .cast("long")
    P = (T * (F.lit(wts["alpha"]) * na + F.lit(wts["punct"]) * np_
              + F.lit(wts["digit"]) * nd)
         + F.lit(wts["stopword"]) * ns * L
         + F.lit(wts["bias"]) * L * T)
    Q = F.lit(1000) * L * T
    # signed HALF_UP via _r6 on |P| (its integer floor path assumes a
    # non-negative numerator)
    logit = (F.when(P >= 0, _r6(P, Q)).otherwise(-_r6(-P, Q)))
    return docs.select(
        id_col, logit.alias("logit"), (P > 0).alias("accept"))


FEATURE_HASH_DIM = 64


def hash_embed(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               dim: int = FEATURE_HASH_DIM) -> DataFrame:
    """Feature-hashing text embeddings (Weinberger et al., ICML'09 —
    the 'hashing trick'): tokens hash to one of ``dim`` buckets with a
    ±1 sign from a second hash, per-doc bucket sums form the vector.
    No vocabulary, no training, no model server — the only way to
    embed 100 TB of raw text inside the engine itself, and the vector
    is an INTEGER relation (portable-md5 buckets/signs, exact sums),
    so it cross-engine hash-matches with no float anywhere.

    Returns the SPARSE form (id, bucket, v) — one explode + one
    map-side-combined groupBy. Densify with :func:`hash_embed_dense`
    to feed the kNN/IVF family."""
    toks = (spread(docs)
            .select(F.col(id_col),
                    F.explode(F.expr(
                        rf"regexp_extract_all(lower({text_col}),"
                        rf" '\\S+', 0)")).alias("w")))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit("fh:"), F.col("w"))), 1, 15), 16, 10)
        .cast("long") % dim)
    sign = F.when(
        F.conv(F.substring(
            F.md5(F.concat(F.lit("fs:"), F.col("w"))), 1, 15), 16, 10)
        .cast("long") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (toks.select(id_col, bucket.alias("bucket"),
                        sign.alias("s"))
            .groupBy(id_col, "bucket")
            .agg(F.sum("s").cast("long").alias("v")))


def hash_embed_dense(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     dim: int = FEATURE_HASH_DIM,
                     normalize: bool = True) -> DataFrame:
    """Dense ``array<double>`` form of :func:`hash_embed` (zeros for
    untouched buckets, optional L2 normalization) — drop-in input for
    knn_bruteforce / IVFIndex.build over raw text."""
    sparse = hash_embed(docs, id_col, text_col, dim)
    pairs = F.array_sort(F.collect_list(F.struct("bucket", "v")))
    dense = (sparse.groupBy(id_col)
             .agg(pairs.alias("_p"))
             .select(id_col,
                     F.expr(
                         f"transform(sequence(0, {dim - 1}, 1), i -> "
                         "CAST(coalesce("
                         "element_at(map_from_entries(_p), i), 0) "
                         "AS DOUBLE))").alias("embedding")))
    if not normalize:
        return dense
    norm = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x * x))
    return dense.select(
        id_col,
        F.transform("embedding",
                    lambda x: x / (norm + F.lit(1e-12)))
         .alias("embedding"))


def hash_embed_cosine_topk(docs: DataFrame, queries: DataFrame,
                           k: int = 10, id_col: str = "doc_id",
                           text_col: str = "text",
                           dim: int = FEATURE_HASH_DIM,
                           query_id_col: str = "query_id") -> DataFrame:
    """Raw-text semantic retrieval entirely in Catalyst: feature-hash
    both sides (exact integer sparse vectors), sparse cosine via a
    bucket equi-join (integer dot products, integer squared norms,
    ONE double division + sqrt at the end), windowed top-k on the
    ROUNDED score. Because every input to the final division is an
    exact integer, the doubles are bit-identical on any engine — the
    whole retrieval pipeline value-hashes with no float-ordering risk.

    Scale shape: two explode+groupBy embedding passes, one posting-
    list join on the 64-bucket key (cost ∝ queries × docs sharing a
    bucket — queries are the bounded side and broadcastable), one
    top-k window partitioned by query."""
    emb = hash_embed(docs, id_col, text_col, dim)
    qe = (hash_embed(queries, query_id_col, text_col, dim)
          .withColumnRenamed("v", "qv"))
    return sparse_cosine_topk(emb, qe, k=k, id_col=id_col,
                              query_id_col=query_id_col)


def sparse_cosine_topk(emb: DataFrame, qe: DataFrame, k: int = 10,
                       id_col: str = "doc_id",
                       query_id_col: str = "query_id") -> DataFrame:
    """Sparse integer cosine top-k between two (id, bucket, weight)
    relations: ``emb`` carries column ``v`` per (id_col, bucket),
    ``qe`` carries ``qv`` per (query_id_col, bucket).  Integer dot
    products and squared norms, one IEEE-exact division, top-k window
    ranked on the ROUNDED score — the shared scoring core of
    hash_embed_cosine_topk and Rocchio PRF (the expanded query vector
    is just another integer ``qe`` relation)."""
    from pyspark.sql import Window

    n2 = emb.groupBy(id_col).agg(
        F.sum(F.col("v") * F.col("v")).alias("_n2"))
    qn2 = qe.groupBy(query_id_col).agg(
        F.sum(F.col("qv") * F.col("qv")).alias("_qn2"))
    dots = (emb.join(F.broadcast(qe), "bucket")
            .groupBy(query_id_col, id_col)
            .agg(F.sum(F.col("v") * F.col("qv")).alias("_dot")))
    cos = (dots.join(n2, id_col).join(F.broadcast(qn2), query_id_col)
           .select(query_id_col, id_col,
                   F.round(F.col("_dot")
                           / F.sqrt(F.col("_n2") * F.col("_qn2")), 6)
                   .alias("cosine")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("cosine").desc(), F.col(id_col).asc()))
    return (cos.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def prf_rocchio_topk(docs: DataFrame, queries: DataFrame,
                     k: int = 10, m: int = 5,
                     alpha_i: int = 7, beta_i: int = 3,
                     id_col: str = "doc_id", text_col: str = "text",
                     dim: int = FEATURE_HASH_DIM,
                     query_id_col: str = "query_id") -> DataFrame:
    """Pseudo-relevance feedback (Rocchio, SMART-era IR): retrieve
    top-m per query, build the expanded query vector

        V = alpha_i * m * v_q + beta_i * SUM_{t in top-m} v_t

    ENTIRELY in integers (the classic alpha q + beta mean(top) scaled
    by m so the mean never divides), then re-score the corpus with V
    through the same sparse-cosine core.  Because V is an exact
    integer relation, the re-ranked scores are single IEEE divisions
    of integers — bit-identical cross-engine, no float-sum ordering
    anywhere.  Cost: the base retrieval + one feedback-join (m rows
    per query) + one more scoring pass."""
    emb = hash_embed(docs, id_col, text_col, dim)
    qe = (hash_embed(queries, query_id_col, text_col, dim)
          .withColumnRenamed("v", "qv"))
    base = sparse_cosine_topk(emb, qe, k=m, id_col=id_col,
                              query_id_col=query_id_col)
    fb = base.select(query_id_col, id_col)
    fbv = (fb.join(emb, id_col)
           .groupBy(query_id_col, "bucket")
           .agg(F.sum("v").alias("_fv")))
    expanded = (qe.select(query_id_col, "bucket",
                          (F.lit(alpha_i * m) * F.col("qv"))
                          .alias("_wq"))
                .join(fbv.select(query_id_col, "bucket",
                                 (F.lit(beta_i) * F.col("_fv"))
                                 .alias("_wf")),
                      [query_id_col, "bucket"], "full_outer")
                .select(query_id_col, "bucket",
                        (F.coalesce(F.col("_wq"), F.lit(0))
                         + F.coalesce(F.col("_wf"), F.lit(0)))
                        .alias("qv"))
                .where(F.col("qv") != 0))
    return sparse_cosine_topk(emb, expanded, k=k, id_col=id_col,
                              query_id_col=query_id_col)
