"""Text-analysis queries (E13): each mirrors operators/text.py
expression-for-expression in DuckDB SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.operators import text as T
from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table

_EN = "', '".join(T.LANG_STOPWORDS["en"])


@register("text_token_stats", sql=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
            AS INT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS INT)
         AS n_distinct_tokens,
       CAST((2 * CAST(length(regexp_replace(text, '\s+', '', 'g'))
                      AS BIGINT) * 1000000
             + greatest(len(regexp_extract_all(text, '\S+')), 1))
            // (2 * CAST(greatest(len(regexp_extract_all(text, '\S+')), 1)
                         AS BIGINT))
            AS DOUBLE) / 1e6 AS avg_token_len,
       CAST(length(text) AS INT) AS n_chars
FROM documents
""")
def text_token_stats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex), distinct tokens,
    average token length — one codegen'd scan."""
    return T.token_stats(load_table(spark, sf_dir, "documents"))


@register("text_quality_score", sql=f"""
WITH m AS (
  SELECT doc_id,
    CAST(greatest(length(text), 1) AS BIGINT) AS L,
    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
      AS na,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
      AS nd,
    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
      AS BIGINT) AS np,
    CAST(greatest(len(regexp_extract_all(text, '\\S+')), 1) AS BIGINT)
      AS T,
    CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
                         w -> lower(w) IN ('{_EN}'))) AS BIGINT) AS ns
  FROM documents
), r AS (
  SELECT doc_id, L, na, nd, np, T, ns,
         T * (5 * na + 3 * (L - np) + (L - nd)) + L * ns AS P,
         10 * L * T AS Q
  FROM m
)
SELECT doc_id,
  CAST((2*na*1000000 + L) // (2*L) AS DOUBLE) / 1e6 AS alpha_ratio,
  CAST((2*np*1000000 + L) // (2*L) AS DOUBLE) / 1e6 AS punct_ratio,
  CAST((2*nd*1000000 + L) // (2*L) AS DOUBLE) / 1e6 AS digit_ratio,
  CAST((2*ns*1000000 + T) // (2*T) AS DOUBLE) / 1e6 AS stopword_ratio,
  CAST((2*P*1000000 + Q) // (2*Q) AS DOUBLE) / 1e6 AS quality,
  CASE WHEN 100 * P >= 55 * Q THEN 'high'
       WHEN 100 * P >= 45 * Q THEN 'mid'
       ELSE 'low' END AS quality_bucket
FROM r
""")
def text_quality_score(spark, sf_dir):
    """Gopher/C4-style quality heuristics: char-class ratios + stopword
    ratio folded into a frozen score and bucket. All ratios round via
    exact integer HALF_UP arithmetic on both engines (operators/
    text.py::_r6) — float ROUND(x, 6) flips on .xxxxxx5 boundaries
    between Spark and DuckDB, which a 6-figure hash gate cannot
    tolerate."""
    return T.quality_score(load_table(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    hit = {lang: (f"len(list_filter(regexp_extract_all(lower(text), '\\S+'), "
                  f"w -> w IN ('" + "', '".join(sw) + "')))")
           for lang, sw in T.LANG_STOPWORDS.items()}
    return f"""
WITH h AS (
  SELECT doc_id,
         {hit['en']} AS en, {hit['es']} AS es,
         {hit['de']} AS de, {hit['fr']} AS fr,
         length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 AS cjk
  FROM documents
)
SELECT doc_id,
  CASE WHEN cjk THEN 'zh'
       WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
       WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
       WHEN de > 0 AND de >= fr THEN 'de'
       WHEN fr > 0 THEN 'fr'
       ELSE 'unknown' END AS pred_lang
FROM h
"""


@register("text_language_id", sql=_lang_sql())
def text_language_id(spark, sf_dir):
    """Stopword-vote language ID with CJK short-circuit and frozen
    tie-break order."""
    return T.language_id(load_table(spark, sf_dir, "documents"))


@register("text_fingerprint", sql="""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g'))) AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint, (rn > 1) AS is_dup FROM (
  SELECT doc_id, fingerprint,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM fp)
""")
def text_fingerprint(spark, sf_dir):
    """Normalized-content md5 fingerprint + keep-first dup flag —
    catches formatting-only duplicates."""
    return T.fingerprint(load_table(spark, sf_dir, "documents"))


@register("text_tfidf", sql="""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE t.term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, ROUND(raw, 6) AS tfidf, CAST(rn AS INT) AS rank
FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS raw,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
             ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                      tf.term ASC) AS rn
  FROM tf JOIN df USING (term) CROSS JOIN n
) s
WHERE rn <= 3
""")
def text_tfidf(spark, sf_dir):
    """tf-idf top-3 terms per document (E13): tf/df aggregates + ranked
    window, corpus size broadcast."""
    return T.tfidf_top_terms(load_table(spark, sf_dir, "documents"))


@register("q_train_test_split", sql="""
WITH s AS (
  SELECT doc_id,
         CASE WHEN CAST(concat('0x', substr(md5(concat('42', ':',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 10000
                   < 8000
              THEN 'train' ELSE 'test' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM s GROUP BY split
""")
def q_train_test_split(spark, sf_dir):
    """Deterministic 80/20 train/test split (training-pipeline staple):
    portable md5 bucket per id — same assignment on any engine or
    partitioning; the id_checksum pins the exact membership."""
    from quake_vector_search_spark.operators.sampling import (
        train_test_split,
    )
    docs = load_table(spark, sf_dir, "documents")
    return (train_test_split(docs, train_frac=0.8, seed=42)
            .groupBy("split")
            .agg(F.count("*").alias("n"),
                 F.sum("doc_id").alias("id_checksum")))


@register("text_chunking", sql="""
WITH starts AS (
  SELECT doc_id, text,
         CAST(unnest(generate_series(
           0, greatest(CAST(ceil((length(text) - 200) / 150.0) AS BIGINT),
                       0))) AS INT)
           AS chunk_id
  FROM documents
)
SELECT doc_id, chunk_id,
       substring(text, chunk_id * 150 + 1, 200) AS chunk_text,
       length(substring(text, chunk_id * 150 + 1, 200)) AS chunk_len
FROM starts
""")
def text_chunking(spark, sf_dir):
    """Fixed-size overlapping chunking (training-pipeline splitter):
    200-char chunks, 50-char overlap. Narrow transform — sequence +
    posexplode + substring, zero shuffles (E13)."""
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_fixed(docs, size=200, overlap=50)


@register("text_bigram_freq", sql="""
WITH words AS (
  SELECT string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT unnest(CASE WHEN len(w) >= 2
                THEN list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i + 1])
                ELSE [] END) AS ngram
  FROM words
)
SELECT ngram, COUNT(*) AS n_occurrences
FROM grams GROUP BY ngram
ORDER BY n_occurrences DESC, ngram ASC
LIMIT 20
""")
def text_bigram_freq(spark, sf_dir):
    """Corpus bigram frequency top-20 (E13 / training-data analysis):
    occurrence counts with map-side partial aggregation, deterministic
    (count DESC, ngram ASC) tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return T.ngram_frequencies(docs, n=2, top=20)


@register("text_cms_wordcount", sql="""
WITH words0 AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
), words AS (
  SELECT word FROM words0 WHERE word <> ''
), js AS (
  SELECT unnest(generate_series(0, 3)) AS j
), sk AS (
  SELECT js.j,
         CAST(concat('0x', substr(md5(concat(js.j, ':', word)), 1, 15))
              AS BIGINT) % 256 AS bucket,
         COUNT(*) AS c
  FROM words CROSS JOIN js
  GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT word FROM words
), cb AS (
  SELECT cand.word, js.j,
         CAST(concat('0x', substr(md5(concat(js.j, ':', cand.word)),
              1, 15)) AS BIGINT) % 256 AS bucket
  FROM cand CROSS JOIN js
), est AS (
  SELECT cb.word, MIN(sk.c) AS est_count
  FROM cb JOIN sk ON sk.j = cb.j AND sk.bucket = cb.bucket
  GROUP BY cb.word
)
SELECT word, est_count FROM est
ORDER BY est_count DESC, word ASC
LIMIT 20
""")
def text_cms_wordcount(spark, sf_dir):
    """Count-min-sketch word frequencies (training-data analysis at
    scale): the sketch bounds state at depth×width counters however
    large the vocabulary — the shuffle moves ≤ 4·256 rows after
    map-side combine. The portable-md5 hashing makes the whole sketch
    deterministic, so the DuckDB oracle builds the IDENTICAL sketch and
    the estimates hash-match exactly (est ≥ true by construction;
    tests pin the guarantee against exact counts)."""
    from quake_vector_search_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = (docs.select(F.explode(F.split(F.lower(F.col("text")), " "))
                         .alias("word"))
             .where(F.col("word") != ""))
    sk = cms_sketch(words, "word")
    est = cms_estimate(sk, words, "word")
    return (est.orderBy(F.desc("est_count"), F.asc("word"))
            .limit(20))


@register("text_pack_sequences", sql="""
WITH toks AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         CAST(concat('0x', substr(md5(concat('pack', ':',
              CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8 AS shard
  FROM documents
), pre AS (
  SELECT doc_id, n_tokens, shard,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
  FROM toks
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard,
       CAST(floor(p / 512) AS BIGINT) AS bin,
       CAST(p % 512 AS BIGINT) AS bin_start_offset
FROM pre
""")
def text_pack_sequences(spark, sf_dir):
    """Sequence packing for training batches (operators/packing.py):
    prefix-sum binning at capacity 512 tokens over 8 portable-hash
    shards — one window per shard, no sequential state, identical on
    every engine/partitioning (the oracle computes the same cumsum
    formula). Fill error is bounded by the largest document."""
    from quake_vector_search_spark.operators.packing import pack_documents

    docs = load_table(spark, sf_dir, "documents")
    out = pack_documents(docs, capacity=512, n_shards=8)
    return out.select("doc_id",
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "shard", "bin", "bin_start_offset")


@register("text_kgram_fingerprints", sql="""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t
  FROM documents
), grams AS (
  SELECT doc_id, g.pos,
         CAST(concat('0x', substr(md5(substr(t, g.pos + 1, 8)), 1, 15))
              AS BIGINT) AS fp_hash
  FROM norm
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, len(t) - 8)) AS pos) g
  WHERE len(t) >= 8
), sel AS (
  SELECT doc_id, pos, fp_hash,
         MIN(fp_hash) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
  FROM grams
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_fp,
       CAST(COUNT(DISTINCT fp_hash) AS BIGINT) AS n_distinct_fp,
       bit_xor(fp_hash) AS fp_set_sig
FROM sel WHERE fp_hash = mn
GROUP BY doc_id
""")
def text_kgram_fingerprints(spark, sf_dir):
    """Per-document k-gram fingerprint summary (operators/text.py::
    kgram_fingerprints, winnow rule, k=8 w=4): count, distinct count,
    and an order-insensitive XOR signature of the selected fingerprint
    set — the compact form a plagiarism/near-dup index would store.
    The DuckDB oracle recomputes the identical selection (same md5
    k-gram hashes, same forward-window minimum)."""
    from quake_vector_search_spark.operators.text import (
        kgram_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = kgram_fingerprints(docs, k=8, w=4, method="winnow")
    return (fp.groupBy("doc_id")
            .agg(F.count("*").alias("n_fp"),
                 F.count_distinct("fp_hash").alias("n_distinct_fp"),
                 F.expr("bit_xor(fp_hash)").alias("fp_set_sig")))
