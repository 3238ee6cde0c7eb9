"""Dedup / similarity queries (E12 + training-data pipeline surface).

Every oracle reuses the exact arithmetic of operators/dedup.py: the
md5-hex→bigint token hash and the frozen MinHash constants, so hashes
match bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.operators import dedup as D
from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table

# DuckDB fragments mirroring operators/dedup.py arithmetic ------------

# distinct word-3-gram shingles of documents.text
SQL_SHINGLES = """
shingled AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           list_distinct([string_split(text, ' ')[i] || ' ' ||
                          string_split(text, ' ')[i+1] || ' ' ||
                          string_split(text, ' ')[i+2]
                          for i in range(1, len(string_split(text, ' ')) - 1)])
         ELSE [] END AS shs
  FROM documents
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM shingled)
"""

SQL_TOKEN_HASH = ("(CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT) "
                  "% 2147483647)")

SQL_JACCARD_PAIRS = SQL_SHINGLES + """,
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
"""


@register("dedup_exact", sql="""
SELECT doc_id, (rn > 1) AS is_dup FROM (
  SELECT doc_id,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents)
""")
def dedup_exact(spark, sf_dir):
    """Exact dedup (E12): keep-first duplicate flag on identical text —
    one shuffle on the text key."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dup_flags(docs)


def _sql_jaccard_capped(cap: int) -> str:
    """Jaccard CTE chain with the hot-shingle df cap mirrored exactly:
    shingles in > cap docs are dropped from BOTH the intersection join
    and the per-doc set sizes (same consistency as the Spark side)."""
    return SQL_SHINGLES + f""",
hot AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > {cap}),
shf AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
"""


@register("dedup_ngram_jaccard",
          sql="WITH " + _sql_jaccard_capped(D.DEFAULT_MAX_SHINGLE_DF) + """
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= 0.8
""")
def dedup_ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard near-dup pairs ≥ 0.8 via the inverted-index
    shingle join (never a crossJoin). Runs the operator DEFAULT — the
    scale-safe hot-shingle cap (DEFAULT_MAX_SHINGLE_DF) — with the cap
    mirrored in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.jaccard_pairs(docs, threshold=0.8)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register("dedup_ngram_jaccard_uncapped_oracle",
          sql="WITH " + SQL_JACCARD_PAIRS + """
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= 0.8
""")
def dedup_ngram_jaccard_uncapped_oracle(spark, sf_dir):
    """Exact UNCAPPED Jaccard — Σdf² posting-list volume is unbounded,
    so this form is differential/oracle-only (the *_oracle naming
    convention for non-scale-safe exact forms); the default path is
    dedup_ngram_jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.jaccard_pairs(docs, threshold=0.8, max_shingle_df=None)
    return out.withColumn("jaccard", F.round("jaccard", 6))


def _minhash_sql() -> str:
    h = SQL_TOKEN_HASH.format(x="sh")
    mins = ",\n         ".join(
        f"MIN(({D.MINHASH_A[i]} * h + {D.MINHASH_B[i]}) % 2147483647) AS mh{i}"
        for i in range(32))
    band_keys = []
    for bnd in range(D.N_BANDS):
        cols = [f"mh{bnd * D.BAND_WIDTH + j}" for j in range(D.BAND_WIDTH)]
        key = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_keys.append(f"SELECT doc_id, {bnd} AS band, {key} AS key FROM sig")
    banded = "\nUNION ALL\n".join(band_keys)
    return ("WITH " + SQL_JACCARD_PAIRS + f""",
hashed AS (SELECT doc_id, {h} AS h FROM sh),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hashed GROUP BY doc_id
),
banded AS ({banded}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, ROUND(j.jaccard, 6) AS jaccard
FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= 0.5
""")


@register("dedup_minhash_lsh", sql=_minhash_sql())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs (the 100 TB dedup path): 32-perm
    signatures, 8×4 banding, bucket-join candidates, exact-Jaccard
    verify at ≥ 0.5. Oracle runs the identical frozen permutations."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.minhash_lsh_pairs(docs, threshold=0.5)
    return out.withColumn("jaccard", F.round("jaccard", 6))


def _simhash_sql() -> str:
    h = SQL_TOKEN_HASH.format(x="sh")
    sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32))
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(32))
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS sh
  FROM documents
),
hashed AS (SELECT doc_id, {h} AS h FROM tok WHERE sh <> ''),
sums AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
"""


@register("dedup_simhash_oracle", sql=_simhash_sql())
def dedup_simhash_oracle(spark, sf_dir):
    """ORACLE-ONLY n² SimHash pair scan (hamming ≤ 2, 32-bit
    fingerprints) — kept to differential-test the production
    ``dedup_simhash_blocked`` path, which must hash-match it exactly.
    Never the pipeline default (demoted per round-1 audit)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs_exhaustive(docs, max_hamming=2)


@register("dedup_embedding_cosine_oracle", sql="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
""")
def dedup_embedding_cosine_oracle(spark, sf_dir):
    """ORACLE-ONLY n² embedding-cosine pair scan (≥ 0.45) — kept for
    differential testing; the production defaults are
    ``dedup_embedding_lsh`` (sign-LSH bucketing, see extra_queries) and
    IVF-kNN. Never the pipeline default (demoted per round-1 audit)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # BLAS twin: same pair set and cosines as the pair-join form
    # (exact re-verify through cosine_similarity_col), ~70x faster
    out = D.cosine_pairs_exhaustive_blas(emb, threshold=0.45)
    return out.withColumn("cosine", F.round("cosine", 6))


@register("dedup_simhash_blocked", sql=_simhash_sql())
def dedup_simhash_blocked(spark, sf_dir):
    """SimHash via pigeonhole blocking (the scale path): hamming ≤ 2
    ⇒ at least one of 3 fingerprint blocks matches exactly, so an
    equality join on (block, key) generates candidates ∝ dup density.
    Must hash-match the n² variant's oracle EXACTLY — blocking is a
    lossless candidate filter at this threshold."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs_blocked(docs, max_hamming=2)


# tight-cap variant: cap low enough (10) to actually bite at sf0.01,
# so the cap's exact effect on scores is driver-verifiable (the default
# cap of 1000 is a no-op below 1000 docs)
_CAP = 10


@register("dedup_ngram_jaccard_capped",
          sql="WITH " + _sql_jaccard_capped(_CAP) + """
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= 0.8
""")
def dedup_ngram_jaccard_capped(spark, sf_dir):
    """Jaccard with the hot-shingle frequency cap engaged (df > 10
    dropped) — the join-skew guard the 100 TB path runs with, here
    oracle-pinned so the cap's exact effect on scores is verified."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.jaccard_pairs(docs, threshold=0.8, max_shingle_df=_CAP)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register("dedup_clusters", sql="WITH RECURSIVE "
          + _sql_jaccard_capped(D.DEFAULT_MAX_SHINGLE_DF) + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.8
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.8
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, MIN(dst) AS cluster_id,
       (MIN(dst) = src) AS is_canonical
FROM reach GROUP BY src
""")
def dedup_clusters(spark, sf_dir):
    """Near-dup clustering (E12 / training-pipeline): connected
    components over the ≥0.8 Jaccard pair graph; every document gets
    its component's minimum doc_id as cluster key and the canonical
    (keep-this-one) flag. Spark side defaults to the large-star/
    small-star algorithm (round 6 — diameter-independent O(log² n)
    rounds, the 100 TB requirement: web-corpus boilerplate produces
    large/stringy components where min-label's diameter-bounded rounds
    blow up). Min-label propagation remains the differential twin via
    dedup_cleaned_corpus / dedup_keep_longest and the unit suite; the
    oracle computes the same fixpoint as a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    comp = D.connected_components_star(docs, pairs)
    return comp.select(
        "doc_id", "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).alias("is_canonical"))


@register("dedup_clusters_star", sql="WITH RECURSIVE "
          + _sql_jaccard_capped(D.DEFAULT_MAX_SHINGLE_DF) + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.8
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.8
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, MIN(dst) AS cluster_id,
       (MIN(dst) = src) AS is_canonical
FROM reach GROUP BY src
""")
def dedup_clusters_star(spark, sf_dir):
    """Same contract as dedup_clusters, computed by the alternating
    large-star/small-star algorithm (Kiveris et al., SoCC'14) instead
    of min-label propagation: O(log² n) rounds independent of graph
    diameter — the variant that wins when near-dup graphs develop long
    chains. Identical oracle: both must reach the same fixpoint."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    comp = D.connected_components_star(docs, pairs)
    return comp.select(
        "doc_id", "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).alias("is_canonical"))


@register("dedup_cleaned_corpus", sql="WITH RECURSIVE "
          + _sql_jaccard_capped(D.DEFAULT_MAX_SHINGLE_DF) + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.8
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.8
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), clusters AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN clusters c ON c.doc_id = d.doc_id
WHERE c.cluster_id = d.doc_id
""")
def dedup_cleaned_corpus(spark, sf_dir):
    """The end-to-end dedup DELIVERABLE: the corpus with near-dup
    groups collapsed to one canonical document each (cluster minimum
    doc_id — the deterministic keep-first rule). Composes
    jaccard_pairs → connected_components → semi-join back to the
    corpus; at 100 TB the output is what actually ships to training,
    so it's pinned here as its own oracle-checked query rather than
    leaving composition to the caller."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    comp = D.connected_components(docs, pairs)
    keep = (comp.where(F.col("cluster_id") == F.col("doc_id"))
            .select("doc_id"))
    return (docs.join(keep, "doc_id", "left_semi")
            .select("doc_id", "lang", "source", "n_chars"))


@register("dedup_fingerprint_overlap", sql="""
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
), fps AS (
  SELECT DISTINCT doc_id, fp_hash FROM sel WHERE fp_hash = mn
), rare AS (
  SELECT fp_hash FROM fps GROUP BY fp_hash
  HAVING COUNT(*) <= 50
), pruned AS (
  SELECT f.doc_id, f.fp_hash FROM fps f JOIN rare r USING (fp_hash)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pruned a JOIN pruned b
  ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 10
""")
def dedup_fingerprint_overlap(spark, sf_dir):
    """Near-dup pairs by shared k-gram fingerprints (the MOSS overlap
    detector): winnowed fingerprint sets, inverted-index self-join on
    fp_hash — a key-equality join, never a crossJoin — with a
    hot-hash cap (df ≤ 50, pinned identically in the oracle) so no
    boilerplate substring can explode a posting list at scale; pairs
    sharing ≥ 10 fingerprints survive. Complements jaccard/minhash/
    simhash: fingerprint overlap localizes WHICH passages match."""
    from quake_vector_search_spark.operators.text import (
        kgram_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    fps = (kgram_fingerprints(docs, k=8, w=4, method="winnow")
           .select("doc_id", "fp_hash").distinct())
    rare = (fps.groupBy("fp_hash").agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= 50).select("fp_hash"))
    pruned = fps.join(rare, "fp_hash", "left_semi")
    a = pruned.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = pruned.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    return (a.join(b, "fp_hash")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= 10))


@register("dedup_keep_longest", sql="WITH RECURSIVE "
          + _sql_jaccard_capped(D.DEFAULT_MAX_SHINGLE_DF) + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.8
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.8
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), clusters AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
), ranked AS (
  SELECT d.doc_id, c.cluster_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
  FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
)
SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE rn = 1
""")
def dedup_keep_longest(spark, sf_dir):
    """Keep-BEST canonical selection (vs dedup_cleaned_corpus's
    keep-first): within each near-dup cluster the longest document
    wins (n_chars DESC, doc_id ASC tie) — the 'most complete variant'
    rule real corpus dedup uses. One extra window over the tiny
    cluster assignment; the heavy work (pairs, components) is shared
    with the other dedup queries."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    comp = D.connected_components(docs, pairs)
    w = (W.partitionBy("cluster_id")
         .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc()))
    return (docs.join(comp.select("doc_id", "cluster_id"), "doc_id")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("doc_id", "cluster_id", "n_chars"))


@register("dedup_semantic_clustered", sql="""
WITH cent AS (
  SELECT e.label, g.i AS dim_pos,
         AVG(CAST(e.embedding[g.i + 1] AS DOUBLE)) AS c
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
  GROUP BY e.label, g.i
), dims AS (
  SELECT e.vec_id, g.i AS dim_pos,
         CAST(e.embedding[g.i + 1] AS DOUBLE) AS v
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
), dists AS (
  SELECT d.vec_id, cent.label AS cand_label,
         SUM((d.v - cent.c) * (d.v - cent.c)) AS d2
  FROM dims d JOIN cent ON cent.dim_pos = d.dim_pos
  GROUP BY d.vec_id, cent.label
), assigned AS (
  SELECT vec_id, cand_label AS cluster_id
  FROM (SELECT vec_id, cand_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cand_label ASC) AS rn
        FROM dists)
  WHERE rn = 1
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster_id,
       ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])), 6)
         AS cosine
FROM assigned a
JOIN assigned b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[])) >= 0.45
""")
def dedup_semantic_clustered(spark, sf_dir):
    """SemDeDup-style semantic near-dup (training-pipeline surface):
    cluster the embedding space, compare exhaustively only WITHIN each
    cluster (operators/dedup.py::cluster_blocked_cosine_pairs). Here
    the clustering is nearest-label-centroid assignment — the same
    fully-relational Rocchio shape as emb_nearest_centroid, so the
    whole pipeline (centroids → assignment → blocked pairs → cosine
    verify) is value-hash-checked against DuckDB end to end. With
    k-means cells instead (tests), the operator is the published
    SemDeDup recipe; candidate volume is Σ|cluster|², never global n².

    Cross-engine float safety of the argmin (round-5 ADVICE): the d2
    sums accumulate in different orders on Spark vs DuckDB, so a
    near-tie between two candidate labels could in principle flip an
    assignment. Measured on the generated embeddings, the smallest
    best-vs-second-best d2 gap is 1.2e-4 (sf0.001), 8.3e-6 (sf0.01),
    3.2e-6 (sf0.1) on d2 ≈ 0.9 — while double-precision reassociation
    noise on a 64-term sum is ~1e-15 absolute, nine-plus orders of
    magnitude smaller. The (d2, cand_label) struct tie-break on both
    engines covers the exact-tie case; a genuinely adversarial corpus
    would need a tolerance-aware property encoding instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim_pos", "v0")) \
        .withColumn("v", F.col("v0").cast("double")).drop("v0")
    cent = (emb.select(F.col("label").alias("cand_label"),
                       F.posexplode("embedding").alias("dim_pos", "c0"))
            .withColumn("c", F.col("c0").cast("double"))
            .groupBy("cand_label", "dim_pos")
            .agg(F.avg("c").alias("c")))
    diff = F.col("v") - F.col("c")
    d2 = (dims.join(F.broadcast(cent), "dim_pos")
          .groupBy("vec_id", "cand_label")
          .agg(F.sum(diff * diff).alias("d2")))
    assigned = (d2.groupBy("vec_id")
                .agg(F.min_by("cand_label", F.struct("d2", "cand_label"))
                     .alias("cluster_id")))
    clustered = emb.select("vec_id", "embedding").join(assigned, "vec_id")
    out = D.cluster_blocked_cosine_pairs(
        clustered, threshold=0.45, cluster_col="cluster_id")
    return out.withColumn("cosine", F.round("cosine", 6))
