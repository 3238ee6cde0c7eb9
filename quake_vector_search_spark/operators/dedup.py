"""Deduplication operators for LLM-pipeline data curation (E12 + the
extended training-data surface): exact dedup, n-gram Jaccard, MinHash
LSH, SimHash, embedding-cosine near-dup.

All hashing is *portable arithmetic* — `md5` hex → bigint → affine
transforms mod a 31-bit prime — so every operator is reproducible in
ANSI SQL (the DuckDB oracle runs the identical formula) and stable
across Spark versions (no reliance on Spark-internal hash functions).

Scale notes (the part that matters at 100 TB):
- Near-dup candidate generation is always a *key-equality join*
  (shingle → doc inverted index, or LSH band buckets), never a
  crossJoin. Shuffles are on shingle/band keys; hot shingles can be
  frequency-capped (``max_shingle_df``).
- MinHash-LSH is the scale path: candidate pairs ∝ true near-dups,
  not n².
- The brute-force cosine pair scan is the *oracle* for the LSH and
  kNN variants, only run at verification scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINHASH_PRIME = 2147483647          # 2^31 - 1; keeps products in int64

# 32 seeded affine perms (a odd, in [1, P); b in [0, P)) — generated once
# with numpy default_rng(1234) and frozen as literals so the DuckDB
# oracle can embed the identical constants.
_rng = np.random.default_rng(1234)
MINHASH_A = [int(a) | 1 for a in _rng.integers(1, MINHASH_PRIME, size=32)]
MINHASH_B = [int(b) for b in _rng.integers(0, MINHASH_PRIME, size=32)]
N_BANDS = 8
BAND_WIDTH = 4  # 8 bands × 4 rows = 32 signature slots


def token_hash_expr(col: str = "sh"):
    """Portable 31-bit token hash: first 15 hex chars of md5 → bigint
    mod P. DuckDB equivalent:
    ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) % 2147483647``.
    """
    return (F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10)
            .cast("long") % MINHASH_PRIME)


def shingles_col(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles of a whitespace-tokenized text
    column (empty array when the doc has < n words)."""
    w = f"split({text_col}, ' ')"
    gram = " , ".join(f"element_at({w}, i + {j})" for j in range(n))
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({w}) - {n - 1}), "
        f"i -> concat_ws(' ', {gram}))) "
        f"ELSE array() END")


from quake_vector_search_spark.sources.catalog import spread  # noqa: F401,E402  (shared read-path helper)


def _words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _w: array<string>) with the whitespace split materialized
    ONCE — element_at over a concrete column instead of re-splitting
    the text inside every lambda evaluation."""
    return spread(docs.select(id_col, text_col)).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_w"))


def _grams_expr(n: int):
    """Distinct n-gram shingle array over a materialized `_w` words
    column (same semantics as shingles_col, minus the per-element
    re-split)."""
    gram = " , ".join(f"element_at(_w, i + {j})" for j in range(n))
    return F.expr(
        f"CASE WHEN size(_w) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(_w) - {n - 1}), "
        f"i -> concat_ws(' ', {gram}))) "
        f"ELSE array() END")


def doc_shingles(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3,
                 max_shingle_df: int | None = None) -> DataFrame:
    """Exploded (id, shingle) inverted-index input. Optionally drops
    shingles occurring in more than ``max_shingle_df`` docs — the
    standard hot-key guard for the join at scale."""
    w = _words(docs, id_col, text_col)
    sh = w.select(F.col(id_col), F.explode(_grams_expr(n)).alias("sh"))
    if max_shingle_df is not None:
        hot = (sh.groupBy("sh").agg(F.count("*").alias("df"))
               .where(F.col("df") > max_shingle_df).select("sh"))
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    return sh


def exact_dup_flags(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Exact dedup (E12): keep-first flag per identical text.
    One shuffle on the text hash; no compare loops."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    return (docs.select(id_col,
                        F.row_number().over(w).alias("_rn"))
            .select(id_col, (F.col("_rn") > 1).alias("is_dup")))


# Default hot-shingle frequency cap for jaccard_pairs. The posting-list
# pair volume is Σ df² over shingles; one boilerplate shingle shared by
# 10⁶ docs is a 10¹²-pair bomb, so the DEFAULT path must be bounded —
# pairs per shingle ≤ cap². Shingles hotter than this carry ~no Jaccard
# signal for high-threshold pairs anyway. Pass max_shingle_df=None to
# get the exact uncapped semantics (oracle/differential use only).
DEFAULT_MAX_SHINGLE_DF = 1000


def jaccard_pairs(docs: DataFrame, threshold: float,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3,
                  max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
                  ) -> DataFrame:
    """N-gram Jaccard near-dup pairs via the inverted-index join:
    explode shingles → equi-join on shingle → per-pair intersection
    count → |A∪B| from per-doc set sizes. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.

    ``max_shingle_df`` defaults to DEFAULT_MAX_SHINGLE_DF (scale-safe);
    shingles above the cap are dropped from BOTH the intersection and
    the per-doc set sizes, so scores stay internally consistent.
    """
    sh = doc_shingles(docs, id_col, text_col, n, max_shingle_df)
    if max_shingle_df is None:
        # |shingle set| is computable narrowly (no extra shuffle)
        # straight from the words column; only the hot-key-capped
        # variant needs the post-filter groupBy.
        sizes = _words(docs, id_col, text_col).select(
            F.col(id_col), F.size(_grams_expr(n)).alias("n_sh"))
    else:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    # Intersection counts via posting-list pair explosion: ONE pass over
    # the shingle pipeline (a self-join would recompute the explode+hash
    # for both sides), one shuffle to build posting lists, ordered pairs
    # generated inside each list. Pair volume is Σ df², identical to the
    # self-join's output; hot shingles are bounded by max_shingle_df.
    posting = (sh.groupBy("sh")
               .agg(F.sort_array(F.collect_list(F.col(id_col)))
                    .alias("ids"))
               .where(F.size("ids") >= 2))
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS doc_a, y AS doc_b))))")
    inter = (posting.select(F.explode(pair_expr).alias("p"))
             .groupBy(F.col("p.doc_a").alias("doc_a"),
                      F.col("p.doc_b").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col(id_col).alias("doc_a"),
                      F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"),
                      F.col("n_sh").alias("nb"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard",
                        F.col("inter")
                        / (F.col("na") + F.col("nb") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3) -> DataFrame:
    """32-slot MinHash signature per doc: min over shingles of
    (a_i·h + b_i) mod P for each frozen perm — one groupBy with 32
    min-aggregates (single shuffle, map-side combined)."""
    sh = doc_shingles(docs, id_col, text_col, n)
    h = sh.withColumn("h", token_hash_expr("sh"))
    aggs = [F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]))
                  % MINHASH_PRIME).alias(f"mh{i}")
            for i in range(32)]
    return h.groupBy(id_col).agg(*aggs)


def band_explode(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Signature row → (id, band, key) LSH bucket rows via ONE explode
    over the signature (NOT a union of N_BANDS re-aggregations — each
    union branch would recompute the whole signature shuffle).
    Shared by the in-memory pair path and the persisted index."""
    band_arr = F.array(*[
        F.struct(
            F.lit(bnd).alias("band"),
            F.concat_ws("_", *[
                F.col(f"mh{bnd * BAND_WIDTH + j}").cast("string")
                for j in range(BAND_WIDTH)]).alias("key"))
        for bnd in range(N_BANDS)])
    return (sig.select(F.col(id_col), F.explode(band_arr).alias("bk"))
            .select(id_col, "bk.band", "bk.key"))


def shingle_sets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """Per-doc exact shingle-hash set + size — the verification payload
    next to LSH candidates (exact Jaccard needs the full sets)."""
    return (doc_shingles(docs, id_col, text_col, n)
            .groupBy(id_col).agg(F.collect_set("sh").alias("shs"),
                                 F.count("*").alias("n_sh")))


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3) -> DataFrame:
    """MinHash-LSH near-dup pairs (the 100 TB path): band the signature
    (8 bands × 4 rows), bucket-join on (band, key) for candidates —
    candidate volume scales with true duplicate density, not n² — then
    verify candidates with exact Jaccard ≥ threshold.
    Returns (doc_a, doc_b, jaccard)."""
    sig = minhash_signatures(docs, id_col, text_col, n)
    banded = band_explode(sig, id_col)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"))
            .distinct())
    # Verify with exact Jaccard computed ONLY on candidate pairs —
    # cost ∝ candidates (true-dup density), never the all-pairs join.
    sets = shingle_sets(docs, id_col, text_col, n)
    sa = sets.select(F.col(id_col).alias("doc_a"),
                     F.col("shs").alias("sa"), F.col("n_sh").alias("na"))
    sb = sets.select(F.col(id_col).alias("doc_b"),
                     F.col("shs").alias("sb"), F.col("n_sh").alias("nb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard",
                        inter / (F.col("na") + F.col("nb") - inter))
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint: (id, simhash LONG). One explode +
    one groupBy with ``bits`` conditional-sum aggregates."""
    tok = (_words(docs, id_col, text_col)
           .select(F.col(id_col),
                   F.explode(F.array_distinct(F.col("_w"))).alias("sh"))
           .where(F.col("sh") != ""))
    h = tok.withColumn("h", token_hash_expr("sh"))
    aggs = [F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1,
                         1).otherwise(-1)).alias(f"s{b}")
            for b in range(bits)]
    sums = h.groupBy(id_col).agg(*aggs)
    fp = sum((F.when(F.col(f"s{b}") > 0, F.lit(2 ** b)).otherwise(0)
              for b in range(bits)), F.lit(0))
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_pairs_exhaustive(docs: DataFrame, max_hamming: int = 6,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """ORACLE-ONLY n² SimHash pair scan — do NOT use as a pipeline
    default (all-pairs self-join: a scale-killer past verification
    size). The production path is ``simhash_pairs_blocked`` (pigeonhole
    blocking, identical output); this form exists to differential-test
    it and to serve as the registry oracle.
    """
    s = simhash(docs, id_col, text_col)
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (pairs.select(F.col(f"a.{id_col}").alias("doc_a"),
                         F.col(f"b.{id_col}").alias("doc_b"),
                         ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def cosine_pairs_exhaustive(emb: DataFrame, threshold: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """ORACLE-ONLY n² embedding-cosine pair scan — do NOT use as a
    pipeline default (all-pairs self-join). Production paths:
    ``cosine_pairs_lsh`` (sign-LSH bucketing, candidates ∝ collision
    density) or IVF-kNN (operators.ivf) when top-k semantics fit."""
    from quake_vector_search_spark.functions.vector import (
        cosine_similarity_col,
    )
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cosine_similarity_col("va", "vb"))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _lsh_hyperplanes(n_bits: int, dim: int, seed: str) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 integer
    arithmetic — the same trick as token_hash_expr, so a DuckDB oracle
    regenerates IDENTICAL float64 components:
    ``(md5int(seed:b:i) % 2001 - 1000) / 1000.0`` ∈ [-1, 1]."""
    import hashlib
    out = []
    for b in range(n_bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{b}:{i}".encode()).hexdigest()
            row.append((int(h[:15], 16) % 2001 - 1000) / 1000.0)
        out.append(row)
    return out


def cosine_pairs_lsh(emb: DataFrame, threshold: float,
                     n_bits: int = 64, n_bands: int = 16,
                     dim: int | None = None,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: str = "lsh1",
                     impl: str = "pandas",
                     max_bucket_size: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-LSH bucketing — the
    scale path (the n² sibling is ``cosine_pairs_exhaustive``):

    1. signature: ``n_bits`` random-hyperplane sign bits per vector
       (narrow, no shuffle);
    2. banding: split the signature into ``n_bands`` bands; vectors
       agreeing on ANY whole band become candidates via an equality
       join on (band, key) — candidates ∝ collision density, never n²;
    3. exact verify: cosine ≥ threshold on candidates only.

    Standard LSH recall semantics: a qualifying pair is emitted iff it
    collides in ≥1 band (P ≈ 1-(1-p^r)^b, p = 1-θ/π). Deterministic:
    hyperplanes are md5-derived from ``seed`` (SQL-expressible, see
    _lsh_hyperplanes), so the output is a pure function of the input
    — differential-testable on any engine.

    ``dim`` defaults to the width of the first vector (one limit-1
    scan). A vector whose width disagrees with ``dim`` raises at run
    time instead of the old failure mode — zip_with null-padding every
    band key so the join silently returned ZERO pairs.

    ``max_bucket_size`` is the web-scale guard (round 6), the exact
    analogue of the jaccard family's ``max_shingle_df``: candidate
    volume per band is Σ|bucket|², and the bucket SPACE is only
    2^(n_bits/n_bands) keys (16 at the 4-bit default — chosen for
    recall at the testdata's low 0.45 threshold), so near-isotropic
    data degenerates toward n²/buckets collisions. Capping drops
    (band, key) buckets larger than the cap from candidate generation
    — hot buckets carry the least signal per pair (their members
    agree on a band by bulk, not by similarity) and every dropped
    pair can still surface through its other n_bands−1 chances.
    ``None`` (default) keeps exact reference-oracle semantics; at
    corpus scale set it (e.g. 10·expected-dup-cluster size) or widen
    the bands.

    ``impl`` picks the signature kernel (round 6): ``"pandas"``
    (default) computes all n_bits sign bits per Arrow batch as ONE
    NumPy matmul — the 64 per-bit zip_with/aggregate Column
    expressions dominated the whole pipeline's runtime (14.5 s of a
    15.7 s sf0.1 run for 136 pairs). ``"column"`` keeps the pure
    Column-expression twin; a unit test pins the two paths
    bit-identical. Near-zero dot products (|dot| < 1e-9) are
    recomputed with the same left-to-right sequential fold the Column
    path uses, so the twins agree even on rounding-order-sensitive
    sign flips."""
    if dim is None:
        # infer from a NON-NULL vector: F.size(NULL) is -1, and a -1
        # dim would send every row into the width-mismatch raise_error
        # branch with a nonsense message (round-5 ADVICE)
        nn = (emb.where(F.col(vec_col).isNotNull())
              .select(F.size(F.col(vec_col)).alias("d")).first())
        if nn is None:
            if emb.select(id_col).first() is None:
                # empty input: no pairs, trivially
                return emb.select(
                    F.col(id_col).alias("id_a"),
                    F.col(id_col).alias("id_b"),
                    F.lit(0.0).alias("cosine")).limit(0)
            raise ValueError(
                f"cosine_pairs_lsh: every {vec_col!r} value is NULL — "
                f"cannot infer dim; pass dim= explicitly or clean the "
                f"input")
        dim = int(nn["d"])
    # NULL vectors are missing data, not a width mismatch: they can't
    # participate in any pair, and NULL falls into the raise_error
    # branch of the width check below — drop them up front
    emb = emb.where(F.col(vec_col).isNotNull())
    planes = _lsh_hyperplanes(n_bits, dim, seed)
    per_band = n_bits // n_bands
    if impl == "pandas":
        from pyspark.sql.functions import pandas_udf

        P = np.array(planes, dtype=np.float64)      # (n_bits, dim)
        exp_dim = dim

        @pandas_udf("array<long>")
        def band_keys(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                # empty Arrow batch: np.stack below would raise on a
                # zero-length array list
                return pd.Series([], dtype=object)
            lens = vs.map(len).to_numpy()
            if (lens != exp_dim).any():
                bad = int(lens[lens != exp_dim][0])
                raise ValueError(
                    f"cosine_pairs_lsh: vector width {bad} != "
                    f"expected dim {exp_dim}")
            X = np.stack(vs.to_numpy()).astype(np.float64)
            S = X @ P.T                              # (n, n_bits)
            # twin contract: the Column path folds left-to-right;
            # BLAS accumulation order differs, so a dot within 1e-9
            # of zero could flip sign between the twins — recompute
            # those few entries with the exact sequential fold
            ri, ci = np.nonzero(np.abs(S) < 1e-9)
            for r, c in zip(ri.tolist(), ci.tolist()):
                acc = 0.0
                row, plane = X[r], P[c]
                for i in range(exp_dim):
                    acc += row[i] * plane[i]
                S[r, c] = acc
            bits = S >= 0                            # (n, n_bits)
            keys = np.zeros((len(X), n_bands), dtype=np.int64)
            for band in range(n_bands):
                for j in range(per_band):
                    keys[:, band] += (
                        bits[:, band * per_band + j].astype(np.int64)
                        << j)
            return pd.Series(list(keys))

        banded = (emb.select(F.col(id_col),
                             band_keys(F.col(vec_col).cast(
                                 "array<double>")).alias("keys"))
                  .select(F.col(id_col),
                          F.posexplode("keys").alias("band", "key")))
    elif impl == "column":
        # fail fast on width mismatch — NullType from raise_error
        # coerces into the array<double> branch type
        v = F.when(F.size(F.col(vec_col)) == F.lit(dim),
                   F.col(vec_col).cast("array<double>")) \
             .otherwise(F.raise_error(F.format_string(
                 "cosine_pairs_lsh: vector width %s != expected dim "
                 + str(dim), F.size(F.col(vec_col)))))
        bits = []
        for b in range(n_bits):
            lit = F.array(*[F.lit(x) for x in planes[b]])
            dot = F.aggregate(F.zip_with(v, lit, lambda x, h: x * h),
                              F.lit(0.0), lambda a, x: a + x)
            bits.append((dot >= 0).cast("long").alias(f"bit{b}"))
        sig = emb.select(F.col(id_col), F.col(vec_col), *bits)
        keys = []
        for band in range(n_bands):
            key = sum((F.col(f"bit{band * per_band + j}") * (2 ** j)
                       for j in range(per_band)), F.lit(0))
            keys.append(F.struct(F.lit(band).alias("band"),
                                 key.cast("long").alias("key")))
        banded = sig.select(
            F.col(id_col), F.explode(F.array(*keys)).alias("bk")) \
            .select(id_col, "bk.band", "bk.key")
    else:
        raise ValueError(f"cosine_pairs_lsh: unknown impl {impl!r} "
                         "(pandas|column)")
    if max_bucket_size is not None:
        bw = Window.partitionBy("band", "key")
        banded = (banded
                  .withColumn("_bsz", F.count("*").over(bw))
                  .where(F.col("_bsz") <= max_bucket_size)
                  .drop("_bsz"))
    a, b2 = banded.alias("a"), banded.alias("b")
    cand = (a.join(b2, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())
    from quake_vector_search_spark.functions.vector import (
        cosine_similarity_col,
        cosine_similarity_pandas,
    )
    # the verify dominates at tight band widths (4-bit keys = 16
    # buckets/band, so collision volume is large even when the final
    # pair set is tiny): vectorize it on the pandas path — same
    # formula, einsum per Arrow batch instead of a per-row fold
    cos_fn = (cosine_similarity_pandas if impl == "pandas"
              else cosine_similarity_col)
    ea = emb.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("va"))
    eb = emb.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).alias("vb"))
    return (cand.join(ea, "id_a").join(eb, "id_b")
            .withColumn("cosine", cos_fn("va", "vb"))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def simhash_pairs_blocked(docs: DataFrame, max_hamming: int = 2,
                          bits: int = 32,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """SimHash near-dup pairs via pigeonhole blocking — the scale path
    promised by simhash_pairs: split the fingerprint into
    ``max_hamming + 1`` bit blocks; any pair within ``max_hamming``
    differing bits must agree on at least one whole block, so an
    equality join on (block_idx, block_key) finds every qualifying
    pair with candidates ∝ near-dup density, never n². Exact-hamming
    verification then filters false candidates. Output is IDENTICAL to
    simhash_pairs (same oracle)."""
    s = simhash(docs, id_col, text_col, bits)
    n_blocks = max_hamming + 1
    base, extra = divmod(bits, n_blocks)
    keys, shift = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        keys.append(F.struct(
            F.lit(i).alias("blk"),
            F.shiftright(F.col("simhash"), shift)
             .bitwiseAND((1 << w) - 1).alias("key")))
        shift += w
    banded = (s.select(F.col(id_col), F.explode(F.array(*keys)).alias("bk"))
              .select(id_col, "bk.blk", "bk.key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"))
            .distinct())
    sa = s.select(F.col(id_col).alias("doc_a"),
                  F.col("simhash").alias("sh_a"))
    sb = s.select(F.col(id_col).alias("doc_b"),
                  F.col("simhash").alias("sh_b"))
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         a_col: str = "doc_a", b_col: str = "doc_b",
                         max_iters: int = 25) -> DataFrame:
    """Connected components over near-dup pairs: label every node with
    the minimum node id reachable through the pair graph — the cluster
    key for keep-one-representative dedup. Returns (id, cluster_id).

    Min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels (one join + one groupBy per
    round), stopping when a round changes nothing. Rounds needed =
    graph diameter — tiny for dup clusters (near-cliques). Each round
    localCheckpoints the labels so lineage (and thus plan size) stays
    constant. At 100 TB scale the same loop runs with the pairs table
    bucketed by node; the large-star/small-star variant halves rounds
    if diameters grow.

    The iteration runs over EDGE-TOUCHED nodes only (round-5): a dup
    graph is sparse — almost every node is a singleton whose label
    can neither change nor influence anyone, so hauling the full node
    table through every round's join + checkpoint is pure waste. The
    working set is the (tiny) connected subgraph; singletons join
    back once at the end with cluster_id = own id. Same fixpoint,
    identical output.

    Raises if max_iters rounds don't converge (un-converged labels
    would be nondeterministic).
    """
    # materialize the edge set ONCE: pairs is usually the tail of a
    # whole candidate-generation pipeline (LSH banding, shingle joins)
    # and every propagation round joins edges — without this the
    # pipeline re-executes per round, O(diameter × pair-generation)
    edges = (pairs.select(F.col(a_col).alias("src"),
                          F.col(b_col).alias("dst"))
             .unionAll(pairs.select(F.col(b_col).alias("src"),
                                    F.col(a_col).alias("dst")))
             .localCheckpoint())
    labels = (edges.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint())

    def _with_singletons(lab):
        return (nodes.select(F.col(id_col)).distinct()
                .join(lab.select(F.col("node").alias(id_col),
                                 F.col("label")), id_col, "left")
                .select(F.col(id_col),
                        F.coalesce("label", F.col(id_col))
                         .alias("cluster_id")))

    for _ in range(max_iters):
        neighbor_min = (edges.join(labels,
                                   edges.src == labels.node)
                        .groupBy("dst")
                        .agg(F.min("label").alias("nmin")))
        new_labels = (labels.join(neighbor_min,
                                  labels.node == neighbor_min.dst,
                                  "left")
                      .select(F.col("node"),
                              F.least(F.col("label"),
                                      F.coalesce("nmin", "label"))
                               .alias("label"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .count())
        labels = new_labels
        if changed == 0:
            return _with_singletons(labels)
    raise RuntimeError(f"components did not converge in {max_iters} "
                       "rounds")


def _star_sym(e: DataFrame) -> DataFrame:
    return e.unionAll(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u links its LARGER neighbors to
    m(u) = min(Γ(u) ∪ {u}). One groupBy + one join per round."""
    sym = _star_sym(e).distinct()
    m = (sym.groupBy("u").agg(F.min("v").alias("mn"))
         .select("u", F.least("u", "mn").alias("m")))
    return (sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: edges directed to the larger endpoint; every
    node u links its smaller neighbors (and itself) to the minimum."""
    d = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .where(F.col("u") != F.col("v")).distinct())
    m = (d.groupBy("u").agg(F.min("v").alias("mn"))
         .select("u", F.least("u", "mn").alias("m")))
    return (d.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(m.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct())


def connected_components_star(nodes: DataFrame, pairs: DataFrame,
                              id_col: str = "doc_id",
                              a_col: str = "doc_a", b_col: str = "doc_b",
                              max_iters: int = 30) -> DataFrame:
    """Connected components via alternating large-star/small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log² n) rounds REGARDLESS of
    graph diameter, vs. diameter rounds for min-label propagation
    (``connected_components``). Same output contract: (id, cluster_id)
    with cluster_id = the component's minimum node id.

    The scale story: near-dup graphs are usually near-cliques (small
    diameter — label propagation wins on constant factors), but link
    graphs / citation chains develop long paths where diameter rounds
    ≫ log² n; each round here is still just a groupBy + join on the
    edge list, so the 100 TB cost per round is one shuffle of the
    (shrinking) edge set. Labels localCheckpoint each round to keep
    lineage constant.
    """
    e = (pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct().localCheckpoint())
    prev_sig = None
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint()
        # bit_xor: order-insensitive edge-set signature that cannot
        # overflow (sum of hashes trips ANSI long-overflow checks)
        sig = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"),
                       F.lit(0)).alias("h")
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"star components did not converge in "
                           f"{max_iters} rounds")
    # converged edge set is (child → root); roots and isolated nodes
    # label themselves
    roots = e.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return (nodes.select(F.col(id_col))
            .distinct()
            .join(roots.withColumnRenamed("u", id_col), id_col, "left")
            .select(id_col,
                    F.coalesce("cluster_id", F.col(id_col))
                     .alias("cluster_id")))


def cluster_blocked_cosine_pairs(emb: DataFrame, threshold: float,
                                 cluster_col: str,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: exhaustive cosine only
    WITHIN a cluster (the caller supplies any assignment column —
    k-means cells, nearest-centroid labels, IVF partitions).

    The published semantic-dedup recipe for web-scale corpora: cluster
    the embedding space, then compare only within clusters. The join is
    a plain equi-join on the cluster key, so candidate volume is
    Σ |cluster|² — bounded by the clustering granularity (k ≈ n/1000
    keeps it ~1000·n), never global n²; pairs straddling two clusters
    are out of scope by design (that's the recall tradeoff the recipe
    accepts; cosine_pairs_lsh covers the unblocked case).

    Returns (id_a, id_b, cluster_id, cosine), id_a < id_b.
    """
    from quake_vector_search_spark.functions.vector import (
        cosine_similarity_col,
    )
    a = emb.select(F.col(cluster_col).alias("cluster_id"),
                   F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"))
    b = emb.select(F.col(cluster_col).alias("cluster_id"),
                   F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"))
    return (a.join(b, ["cluster_id"])
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cosine_similarity_col("va", "vb"))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cluster_id", "cosine"))


def decontaminate_flags(train: DataFrame, eval_docs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 5) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM training-data rule:
    drop or flag training documents that share any long word n-gram
    with an evaluation set — exact-substring leakage detection at the
    n-gram granularity).

    Plan shape for 100 TB of train vs a benchmark-sized eval set: the
    eval side reduces to its DISTINCT n-gram set (benchmarks are
    thousands of documents — broadcast-scale by nature), the train
    side's shingles semi-join against that broadcast, and the flag is
    a groupBy on the train id. The train table is scanned once,
    narrow, and never shuffles its text — only (id, gram-hit) rows
    after the broadcast join. If the eval set ever outgrew broadcast,
    drop the hint and the same plan runs as a shuffle join.

    Returns (id, n_shared_grams, contaminated) for EVERY train doc.
    """
    tg = doc_shingles(train, id_col, text_col, n=n)
    eg = (doc_shingles(eval_docs, id_col, text_col, n=n)
          .select("sh").distinct())
    hits = (tg.join(F.broadcast(eg), "sh")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_shared_grams")))
    return (train.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_shared_grams", F.lit(0))
                     .alias("n_shared_grams"))
            .withColumn("contaminated", F.col("n_shared_grams") > 0))


def semantic_dedup_pairs(emb: DataFrame, threshold: float,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         label_col: str = "label") -> DataFrame:
    """Operator-level semantic dedup, BLAS assignment path — the fast
    twin of the registered ``dedup_semantic_clustered`` query (which
    keeps the fully-relational posexplode→join→min_by assignment so
    DuckDB can hash-match the whole pipeline; ~7 s at sf0.01 there vs
    one matmul per Arrow batch here).

    Same SemDeDup shape: label centroids → nearest-centroid
    assignment → exhaustive cosine only within clusters. The centroid
    table is labels × d doubles (broadcast-scale by construction — one
    row per class, not per vector), so collecting it driver-side is
    the same bounded pattern the IVF search path uses for its
    centroids. argmin ties break toward the lowest label on both
    paths (np.argmin lowest index over label-sorted centroids ≡ the
    relational (d2, cand_label) struct-min); measured label-centroid
    gaps on the generated embeddings are ≥3.2e-6 — far above kernel
    float noise (see dedup_semantic_clustered's docstring)."""
    import numpy as np

    from quake_vector_search_spark.operators.kmeans import assign_clusters

    cent_rows = (emb.select(F.col(label_col),
                            F.posexplode(vec_col).alias("dim_pos", "v"))
                 .groupBy(label_col, "dim_pos")
                 .agg(F.avg(F.col("v").cast("double")).alias("c"))
                 .collect())
    labels = sorted({r[label_col] for r in cent_rows})
    lab_ix = {lab: i for i, lab in enumerate(labels)}
    d = max(r["dim_pos"] for r in cent_rows) + 1
    cents = np.zeros((len(labels), d), dtype=np.float64)
    for r in cent_rows:
        cents[lab_ix[r[label_col]], r["dim_pos"]] = float(r["c"])
    assigned = assign_clusters(emb.select(id_col, vec_col), cents,
                               vec_col=vec_col, out_col="_cix")
    ix_to_label = F.create_map(
        *[x for i, lab in enumerate(labels)
          for x in (F.lit(i), F.lit(lab))])
    clustered = (assigned
                 .withColumn("cluster_id", ix_to_label[F.col("_cix")])
                 .drop("_cix"))
    return cluster_blocked_cosine_pairs(clustered, threshold,
                                        "cluster_id", id_col, vec_col)


def cosine_pairs_exhaustive_blas(emb: DataFrame, threshold: float,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """BLAS twin of :func:`cosine_pairs_exhaustive` — same output,
    ~10x faster: the n² cosine matrix runs as one normalized matmul
    per partition against the broadcast corpus (X_part @ X_allᵀ,
    NumPy/Arrow), which generates CANDIDATES at ``threshold − 1e-6``;
    the tiny candidate set is then re-verified with the exact
    Catalyst `cosine_similarity_col` expression at the true
    threshold, so threshold-boundary membership is decided by the
    SAME float path as the sequential form and the DuckDB oracle
    (BLAS sum reassociation can shift a cosine by ~1 ulp — the margin
    + exact re-verify makes that invisible).

    Used by the recall-eval harness; the broadcast matrix bounds this
    to corpora that fit one executor's memory (n·dim·8 bytes — eval
    scale, not the production dedup path, which stays LSH)."""
    import numpy as np
    import pandas as pd

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((ids, Xn))
    margin = threshold - 1e-6
    n = len(ids)

    def block(batches):
        all_ids, allX = bc.value
        for pdf in batches:
            idx = pdf["i"].to_numpy()
            sims = allX[idx] @ allX.T
            for r, i in enumerate(idx):
                js = np.nonzero(sims[r] >= margin)[0]
                js = js[all_ids[js] > all_ids[i]]
                if len(js):
                    yield pd.DataFrame({
                        "id_a": np.full(len(js), all_ids[i],
                                        dtype=np.int64),
                        "id_b": all_ids[js]})

    cand = (spark.range(n).select(F.col("id").cast("int").alias("i"))
            .repartition(max(spark.sparkContext.defaultParallelism, 8))
            .mapInPandas(block, "id_a long, id_b long"))
    from quake_vector_search_spark.functions.vector import (
        cosine_similarity_col,
    )
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"))
    return (cand.join(a, "id_a").join(b, "id_b")
            .withColumn("cosine", cosine_similarity_col("va", "vb"))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def semantic_decontaminate_flags(train: DataFrame, eval_vecs: DataFrame,
                                 threshold: float,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """Embedding-space decontamination (round 6) — the SEMANTIC
    sibling of ``decontaminate_flags``: flag every training vector
    whose cosine similarity to ANY evaluation vector reaches
    ``threshold`` (the D4/SemDeDup-era rule: n-gram overlap misses
    paraphrased leakage; embedding similarity catches it).

    Plan shape for 100 TB of train vs a benchmark-sized eval set: the
    eval matrix is collected and closure-broadcast (benchmarks are
    thousands of rows — broadcast-scale by nature, same argument as
    the n-gram variant's gram set), and ONE narrow map-only pass over
    train computes each row's max cosine against the whole eval block
    via a BLAS matmul per Arrow batch. No shuffle, no join, no
    candidate explosion; at any corpus size the plan is a single scan.
    If the eval set ever outgrew the driver, fall back to
    ``cosine_pairs_lsh`` between the two sides (bucketed join).

    Returns (id, max_eval_cosine DOUBLE, contaminated BOOLEAN) for
    EVERY train row (null vectors: cosine 0.0, not contaminated).
    """
    rows = eval_vecs.where(F.col(vec_col).isNotNull()) \
                    .select(vec_col).collect()
    if not rows:
        return (train.select(id_col)
                .withColumn("max_eval_cosine", F.lit(0.0))
                .withColumn("contaminated", F.lit(False)))
    E = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                  for r in rows])
    En = E / (np.linalg.norm(E, axis=1, keepdims=True) + 1e-12)
    spark = train.sparkSession
    bc = spark.sparkContext.broadcast(En)
    thr = float(threshold)

    def flag(batches):
        En_l = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            keep = pdf[vec_col].notna()
            out = pd.DataFrame({id_col: pdf[id_col],
                                "max_eval_cosine": 0.0})
            if keep.any():
                X = np.stack(pdf.loc[keep, vec_col].to_numpy()) \
                    .astype(np.float64)
                Xn = X / (np.linalg.norm(X, axis=1, keepdims=True)
                          + 1e-12)
                out.loc[keep, "max_eval_cosine"] = (Xn @ En_l.T) \
                    .max(axis=1)
            out["contaminated"] = out["max_eval_cosine"] >= thr
            yield out

    return train.select(id_col, vec_col).mapInPandas(
        flag, f"{id_col} long, max_eval_cosine double, "
              "contaminated boolean")
