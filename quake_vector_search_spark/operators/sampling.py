"""Deterministic sampling / splitting for training-data pipelines.

Reproducible splits are a pipeline contract: the same row must land in
the same split on every engine, every partitioning, every rerun — so
the assignment is pure arithmetic on the row id (portable md5 → bigint,
same formula the dedup hashing uses), never `rand()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def split_hash_expr(id_col: str, seed: int):
    """Portable per-row bucket in [0, 10000): first 15 hex chars of
    md5(seed:id) → bigint mod 10000. DuckDB equivalent:
    ``CAST(concat('0x', substr(md5(concat(seed, ':', CAST(id AS
    VARCHAR))), 1, 15)) AS BIGINT) % 10000``."""
    tag = F.concat_ws(":", F.lit(str(seed)),
                      F.col(id_col).cast("string"))
    return (F.conv(F.substring(F.md5(tag), 1, 15), 16, 10)
            .cast("long") % SPLIT_BUCKETS)


def train_test_split(df: DataFrame, id_col: str = "doc_id",
                     train_frac: float = 0.8,
                     seed: int = 42) -> DataFrame:
    """Append a deterministic `split` column ('train' | 'test').

    Narrow transform — no shuffle, no state; the split survives
    repartitioning, engine changes, and incremental reruns (new rows
    hash independently). Expected fraction accuracy is ±1/10000."""
    bucket = split_hash_expr(id_col, seed)
    cut = int(round(train_frac * SPLIT_BUCKETS))
    return df.withColumn(
        "split", F.when(bucket < cut, "train").otherwise("test"))


def balanced_downsample(df: DataFrame, class_col: str,
                        id_col: str = "vec_id",
                        seed: int = 43) -> DataFrame:
    """Downsample every class to the minority-class count — the
    class-rebalancing step of a training-data pipeline, deterministic
    across engines and partitionings.

    Rows are ranked inside each class by the portable md5 hash (ties by
    id), and the first ``min_count`` per class survive, so the kept set
    is a pure function of (ids, seed) — re-runs and engine swaps keep
    identical rows. Plan: one tiny count aggregate (broadcast back),
    one window rank per class — a single shuffle on the class key.
    """
    counts = df.groupBy(class_col).agg(F.count("*").alias("_n"))
    min_count = counts.agg(F.min("_n").alias("_m"))
    from pyspark.sql import Window
    w = (Window.partitionBy(class_col)
         .orderBy(split_hash_expr(id_col, seed).asc(),
                  F.col(id_col).asc()))
    return (df.withColumn("_rk", F.row_number().over(w))
            .crossJoin(F.broadcast(min_count))
            .where(F.col("_rk") <= F.col("_m"))
            .drop("_rk", "_m"))


def weighted_sample(df: DataFrame, weight_col: str, n: int,
                    id_col: str, seed: int = 44) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each row draws u ∈ (0,1] from the
    portable md5 hash of (seed, id) and scores key = ln(u)/w — the
    monotone log of the classic u^(1/w) — and the n LARGEST keys win.
    Inclusion probability is proportional to weight, and the selection
    is a pure function of (ids, weights, seed): same rows on every
    engine, partitioning, and rerun, unlike ``rand()``-based sampling.

    Plan: one narrow projection + global TakeOrdered(n) — partial
    top-n per partition, no full sort, no shuffle of losers. Rows with
    weight ≤ 0 never qualify (key = -inf analog via NULL filter).
    """
    h = (F.conv(F.substring(F.md5(
            F.concat_ws(":", F.lit(str(seed)),
                        F.col(id_col).cast("string"))), 1, 15), 16, 10)
         .cast("long"))
    # u in (0, 1]: (h+1) / 2^60  (15 hex chars = 60 bits)
    u = (h + F.lit(1)).cast("double") / F.lit(float(2 ** 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (df.where(F.col(weight_col) > 0)
            .withColumn("sample_key", key)
            .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
            .limit(n))


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resilient equi-join: spread each hot ``key`` across
    ``n_salt`` reducers by salting the big (left) side with a
    deterministic per-row salt and replicating the small-per-key
    (right) side once per salt value. Output is row-identical to the
    plain join — only the shuffle distribution changes: a key holding
    p% of the rows caps any one task at p/n_salt%.

    Complements AQE's skew-join splitting (which salts only after a
    stage materializes skewed partitions); explicit salting keeps the
    first shuffle itself balanced. Salt = positive_mod(xxhash64(all
    left columns), n_salt) — deterministic, no rand().

    Only ``inner`` and ``left`` are supported: under ``right``/``full``
    an unmatched right row survives once per salt replica (n_salt
    copies), so those modes cannot be row-identical to the plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full would emit unmatched right rows once per salt "
            "replica")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                   F.lit(n_salt))
    l = left.withColumn("_salt", lsalt)
    r = (right.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0).cast("long"),
                                 F.lit(n_salt - 1).cast("long")))))
    return (l.join(r, [key, "_salt"], how)
            .drop("_salt"))


def stratified_sample(df: DataFrame, strata_col: str, frac: float,
                      id_col: str, seed: int = 45) -> DataFrame:
    """Deterministic stratified sampling: keep ~``frac`` of every
    stratum by portable-hash bucket — the engine-stable analog of
    ``df.sampleBy``. A NARROW transform (no shuffle, no per-stratum
    counts): each row's fate is a pure function of (id, seed), so the
    sample is identical across engines/partitionings/reruns and
    composes with incremental ingest (new rows sample themselves).
    Per-stratum accuracy is ±1/10000 of frac like train_test_split;
    use balanced_downsample when exact per-class counts matter.
    """
    cut = int(round(frac * SPLIT_BUCKETS))
    return df.where(split_hash_expr(id_col, seed) < cut)


def mixture_sample(df: DataFrame, weights: dict[str, float], n_total: int,
                   id_col: str = "doc_id", source_col: str = "source",
                   seed: int = 47) -> DataFrame:
    """Deterministic source-mixture sampling — the data-MIXING step of
    a training pipeline (sample each corpus source at a target
    proportion, e.g. 40% web / 30% code / 30% books).

    Per-source quotas come from largest-remainder apportionment of
    ``n_total`` over ``weights`` (computed on the driver — the weight
    table is metadata-scale); rows are ranked inside each source by
    the portable md5 hash (ties by id) and the first quota_i survive.
    Like balanced_downsample, the kept set is a pure function of
    (ids, weights, seed): re-runs, engine swaps, and repartitioning
    keep identical rows. Sources absent from ``weights`` are dropped;
    a source with fewer rows than its quota contributes all of them
    (the shortfall is NOT redistributed — at 100 TB redistribution
    would need a second pass; callers wanting exact n_total should
    oversize weights). One shuffle on the source key.
    """
    from pyspark.sql import Window
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    exact = {s: n_total * w / total_w for s, w in weights.items()}
    quota = {s: int(exact[s]) for s in weights}
    leftover = n_total - sum(quota.values())
    # largest remainder, ties by source name for determinism
    for s in sorted(weights, key=lambda s: (-(exact[s] - quota[s]), s)):
        if leftover <= 0:
            break
        quota[s] += 1
        leftover -= 1
    qdf = df.sparkSession.createDataFrame(
        sorted(quota.items()), f"{source_col} string, _quota long")
    w = (Window.partitionBy(source_col)
         .orderBy(split_hash_expr(id_col, seed).asc(),
                  F.col(id_col).asc()))
    return (df.join(F.broadcast(qdf), source_col)
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= F.col("_quota"))
            .drop("_rk", "_quota"))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 1024,
                 alpha: float = 1.0) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023) — the principled version of "pick raw-corpus documents that
    look like the target distribution", the data-selection step of an
    LLM pretraining pipeline:

    1. featurize both sides as HASHED n-gram counts (unigrams +
       bigrams → ``n_buckets`` via the engine-portable md5 hash);
    2. fit two bag-of-buckets models with Laplace smoothing,
       p̂(b) = (c_b + α) / (total + α·B);
    3. score every raw document with its importance log-weight
       Σ_b c_b(doc) · ln(p̂_target(b) / p̂_raw(b)).

    Cross-engine exactness (the repo's _r6 discipline, adapted to
    logs): the per-bucket log-ratio is frozen as an INTEGER microlog
    L(b) = round(1e6 · ln ratio) — one libm ln per bucket, B of them,
    agreeing across engines to 1 ulp — and each document's weight is
    the exact integer Σ c_b·L(b). Summation order can never flip a
    hash, unlike a float Σ of per-gram logs.

    Scale: featurization is a narrow explode; the two model fits are
    B-bounded aggregates (map-side combined — the shuffle moves
    buckets, not occurrences); the scoring join broadcasts the B-row
    ratio table against the doc-bucket counts. No collect touches
    anything data-sized (two scalar totals only).

    Returns (id, n_grams, w_micro) — w_micro is the integer microlog
    weight; rank descending for target-likeness.
    """
    def grams(df):
        # empty tokens (consecutive spaces) are dropped BEFORE n-gram
        # formation so bigrams can't contain phantom '' members
        # (ADVICE r8: unigrams filtered but bigrams didn't)
        w = F.filter(F.split(F.col(text_col), " "),
                     lambda x: x != F.lit(""))
        uni = df.select(F.col(id_col), F.explode(w).alias("g"))
        pairs = F.expr(
            "CASE WHEN size(_w) >= 2 THEN "
            "transform(sequence(1, size(_w) - 1), "
            "i -> concat(element_at(_w, i), ' ', "
            "element_at(_w, i + 1))) ELSE array() END")
        bi = (df.select(F.col(id_col), w.alias("_w"))
              .select(id_col, F.explode(pairs).alias("g")))
        both = uni.unionByName(bi)
        return both.withColumn(
            "bucket",
            F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
            .cast("long") % n_buckets).drop("g")

    g_raw = grams(raw)
    g_tgt = grams(target)
    c_raw = g_raw.groupBy("bucket").agg(F.count("*").alias("c_r"))
    c_tgt = g_tgt.groupBy("bucket").agg(F.count("*").alias("c_t"))
    # two scalar totals (driver-side metadata, like the quota tables)
    tot_r = c_raw.agg(F.sum("c_r")).collect()[0][0] or 0
    tot_t = c_tgt.agg(F.sum("c_t")).collect()[0][0] or 0
    denom_r = float(tot_r) + alpha * n_buckets
    denom_t = float(tot_t) + alpha * n_buckets
    # only buckets present in RAW can be scored — a raw doc never
    # holds a bucket with c_r = 0
    ratio = (c_raw.join(c_tgt, "bucket", "left")
             .select("bucket",
                     F.round(F.log(
                         ((F.coalesce(F.col("c_t"), F.lit(0))
                           + F.lit(alpha)) / F.lit(denom_t))
                         / ((F.col("c_r") + F.lit(alpha))
                            / F.lit(denom_r))) * 1e6)
                     .cast("long").alias("l_micro")))
    doc_b = g_raw.groupBy(id_col, "bucket").agg(
        F.count("*").alias("c"))
    return (doc_b.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(F.sum("c").alias("n_grams"),
                 F.sum(F.col("c") * F.col("l_micro"))
                 .alias("w_micro")))


def dsir_select(raw: DataFrame, target: DataFrame, n: int,
                id_col: str = "doc_id", text_col: str = "text",
                **kwargs) -> DataFrame:
    """Top-``n`` raw documents by DSIR importance weight — the
    selected training subset. Deterministic: exact integer weights,
    (w_micro DESC, id ASC) tie-break. orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition top-n then a driver merge
    of n-bounded slices, never a single-task global sort (the same
    shape as every global top-n in the engine)."""
    wts = dsir_weights(raw, target, id_col=id_col, text_col=text_col,
                       **kwargs)
    return (wts.orderBy(F.col("w_micro").desc(), F.col(id_col).asc())
            .limit(n)
            .select(id_col, "n_grams", "w_micro"))


def dsir_sample(raw: DataFrame, target: DataFrame, n: int,
                temperature: float = 1.0, seed: int = 47,
                id_col: str = "doc_id", text_col: str = "text",
                **kwargs) -> DataFrame:
    """DSIR's actual RESAMPLING step (Xie et al. §2: sample without
    replacement ∝ importance weight) — the stochastic counterpart of
    ``dsir_select``'s deterministic top-n, via the Gumbel-top-k
    trick: key(doc) = logw/T + Gumbel(doc), take the n largest keys.
    Sampling keeps tail diversity that greedy top-n loses — the
    reason the paper resamples instead of thresholding.

    Deterministic and engine-portable: the Gumbel noise is
    −ln(−ln(u)) of the portable md5 uniform u(seed, id) (the same
    hash every sampler in this module draws from), and ranking uses
    the ROUNDED key with an id tie-break — two docs' float keys can
    land within an ulp of each other across engines, the rounded
    rank cannot flip. ``temperature`` sharpens (<1) or flattens (>1)
    the weight distribution."""
    wts = dsir_weights(raw, target, id_col=id_col, text_col=text_col,
                       **kwargs)
    u = ((F.conv(F.substring(F.md5(
        F.concat_ws(":", F.lit(seed), F.col(id_col))), 1, 15),
        16, 10).cast("long") % 1_000_000).cast("double")
        + 0.5) / 1_000_000.0
    gumbel = -F.log(-F.log(u))
    key = (F.col("w_micro").cast("double") / 1e6
           / F.lit(float(temperature)) + gumbel)
    return (wts.withColumn("key", F.round(key, 6))
            .orderBy(F.col("key").desc(), F.col(id_col).asc())
            .limit(n)
            .select(id_col, "n_grams", "w_micro", "key"))
