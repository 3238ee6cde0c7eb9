"""Sketch operators for training-data analysis at scale.

A 100 TB corpus can't afford exact per-item state for high-cardinality
frequency questions (vocabulary counts, URL hit tallies). The count-min
sketch bounds memory at depth×width counters with a one-sided error
guarantee: est ≥ true, est ≤ true + εN with probability 1−δ (ε = e/width,
δ = e^−depth).

The sketch here is DETERMINISTIC — hash j of an item is the same
portable md5 → bigint construction the sampling/dedup operators use
(sampling.py::split_hash_expr), so the full sketch, and any estimate
read from it, is reproducible cross-engine and cross-partitioning and
can be DuckDB-oracle-checked exactly (no tolerance needed: both engines
build the identical sketch).

Plan shape: building the sketch is one groupBy over (depth × width)
keys — the shuffle moves at most depth·width rows after map-side
partial aggregation, regardless of corpus size. Estimates join
candidates against the broadcast-scale sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket_expr(j_col, item_col, width: int):
    """Row j's bucket for an item: first 15 hex chars of
    md5('<j>:<item>') → bigint mod width. DuckDB twin:
    ``CAST(concat('0x', substr(md5(concat(j, ':', item)), 1, 15))
    AS BIGINT) % width``."""
    tag = F.concat_ws(":", j_col.cast("string"), item_col.cast("string"))
    return (F.conv(F.substring(F.md5(tag), 1, 15), 16, 10)
            .cast("long") % width)


def cms_sketch(items: DataFrame, item_col: str,
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch: (j, bucket, c) counters, one per touched cell.
    The explode multiplies rows ×depth BEFORE the aggregate, but the
    groupBy partial-combines map-side down to ≤ depth·width rows per
    task — the shuffle is constant-size."""
    expanded = (items
                .select(F.col(item_col).alias("item"),
                        F.explode(F.sequence(
                            F.lit(0), F.lit(depth - 1))).alias("j")))
    return (expanded
            .withColumn("bucket",
                        _bucket_expr(F.col("j"), F.col("item"), width))
            .groupBy("j", "bucket")
            .agg(F.count("*").alias("c")))


def cms_estimate(sketch: DataFrame, candidates: DataFrame,
                 item_col: str, depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-query the sketch for every candidate item: min over the
    depth rows of each row's bucket counter. The sketch is ≤
    depth·width rows → broadcast; the candidates never shuffle."""
    expanded = (candidates
                .select(F.col(item_col).alias("item"))
                .distinct()
                .select("item",
                        F.explode(F.sequence(
                            F.lit(0), F.lit(depth - 1))).alias("j"))
                .withColumn("bucket",
                            _bucket_expr(F.col("j"), F.col("item"),
                                         width)))
    # LEFT join + coalesce(c, 0): a candidate whose (j, bucket) cell was
    # never touched must count that cell as ZERO (standard CMS returns 0
    # for an empty cell) — an inner join would silently drop the
    # candidate (all cells empty) or overestimate (min over only the
    # non-empty cells).
    return (expanded.join(F.broadcast(sketch), ["j", "bucket"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .alias("est_count"))
            .select(F.col("item").alias(item_col), "est_count"))


def kmv_distinct(df: DataFrame, item_col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count sketch: hash every item to
    (0, 1], keep the k smallest distinct hashes, estimate
    n_distinct ≈ (k − 1) / kth_min. The sketch is k doubles —
    MERGEABLE (union two sketches = merge-sort + truncate to k), which
    is the property that matters at 100 TB: every partition ships k
    values, the combine is associative, and Spark's TakeOrdered does
    exactly that partial top-k per partition with no full shuffle.

    Same portable md5 → bigint hash as the CMS above, so the estimate
    is a pure function of the distinct item set: identical on every
    engine and partitioning, DuckDB-oracle-checkable exactly (no
    tolerance). Exact error bound: relative error ~ 1/sqrt(k−2).

    Returns a single row (kth_min_hash, est_distinct)."""
    h = (F.conv(F.substring(F.md5(
            F.concat_ws(":", F.lit("kmv"),
                        F.col(item_col).cast("string"))), 1, 15), 16, 10)
         .cast("long"))
    u = (h + F.lit(1)).cast("double") / F.lit(float(2 ** 60))
    mins = (df.select(u.alias("u")).where(F.col("u").isNotNull())
            .distinct()
            .orderBy(F.col("u").asc())
            .limit(k))
    return (mins.agg(F.max("u").alias("kth_min_hash"),
                     F.count("*").alias("n_kept"))
            .select(F.round("kth_min_hash", 10).alias("kth_min_hash"),
                    F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
                     .otherwise((F.lit(k - 1)) / F.col("kth_min_hash"))
                     .cast("double").alias("est_distinct_raw"),
                    F.col("n_kept"))
            .select("kth_min_hash",
                    F.round("est_distinct_raw", 4).alias("est_distinct"),
                    "n_kept"))


BLOOM_M = 4096   # bits
BLOOM_K = 4      # hash functions


def bloom_bits(df: DataFrame, item_col: str,
               m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Bloom filter as a relation: the DISTINCT set bit positions of
    every item under k portable md5 hashes — ≤ m rows total however
    many items went in, MERGEABLE by plain union (the same property
    that makes the CMS/KMV relations the distributed sketch forms).
    One narrow explode + one distinct shuffle bounded by m.

    The third sketch in the family: CMS answers "how often", KMV
    answers "how many distinct", Bloom answers "have I seen this" —
    the membership gate of dedup-at-ingest and join pre-filtering.
    Hashing is the same portable md5 → bigint scheme, so any engine
    builds the identical bit set (the DuckDB oracle does).

    Returns (bit) rows, bit ∈ [0, m).
    """
    d = df.select(F.col(item_col).alias("item")) \
          .where(F.col("item").isNotNull())
    bits_arr = F.array(*_bloom_bit_exprs(F.col("item"), m, k))
    return (d.select(F.explode(bits_arr).alias("bit")).distinct())


#: Bloom bit-derivation scheme version. v1 (rounds <=5) hashed each
#: lane with its own md5('<j>:bloom:<item>'); v2 (round 6+) takes all
#: k lanes from ONE md5. The schemes produce DIFFERENT bit positions —
#: a mask/bit relation persisted under v1 would FALSE-NEGATIVE when
#: probed with v2 derivations, which a bloom filter must never do.
#: Nothing in this repo persists sketches across versions (masks and
#: bit relations are built and probed within one query), but any
#: caller that does persist them must store this constant alongside
#: the bits and refuse to probe on mismatch.
BLOOM_HASH_SCHEME = 2


def _bloom_bit_exprs(item, m: int, k: int) -> list:
    """The k bloom bit positions of one item from ONE md5 (round 6,
    scheme v2 — see BLOOM_HASH_SCHEME for the persistence caveat):
    lane j = 7 hex chars starting at 1+7j of md5('bloom:' || item) →
    bigint % m. One hash call instead of k (the md5 dominated the
    prefilter's per-row cost); 28 bits/lane bounds m at 2^28, and four
    lanes fit the 32-hex digest. DuckDB mirror per lane::

        CAST(concat('0x', substr(md5(concat('bloom:', CAST(x AS
             VARCHAR))), 1 + 7*j, 7)) AS BIGINT) % m
    """
    if k * 7 > 32:
        raise ValueError(f"bloom k={k} needs {k * 7} hex chars; "
                         "md5 has 32 (k <= 4)")
    if m > (1 << 28):
        raise ValueError(f"bloom m={m} exceeds the 28-bit lane range")
    h = F.md5(F.concat(F.lit("bloom:"), item.cast("string")))
    return [
        (F.conv(F.substring(h, 1 + 7 * j, 7), 16, 10)
         .cast("long") % m)
        for j in range(k)
    ]


def bloom_membership(bits: DataFrame, candidates: DataFrame,
                     item_col: str,
                     m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Probe the sketch: a candidate is maybe-present iff ALL k of its
    bits are set (no false negatives ever; false-positive rate
    ≈ (1 − e^{−kn/m})^k). The bit relation broadcasts (≤ m rows);
    candidates stay distributed and never shuffle.

    Returns (item_col, maybe_present).
    """
    cand = (candidates.select(F.col(item_col))
            .where(F.col(item_col).isNotNull())
            .distinct())
    bits_arr = F.array(*_bloom_bit_exprs(F.col(item_col), m, k))
    probe = cand.select(item_col,
                        F.explode(bits_arr).alias("_pbit"))
    setbits = bits.select(F.col("bit").alias("_setbit"))
    hit = F.when(F.col("_setbit").isNotNull(), 1).otherwise(0)
    return (probe.join(F.broadcast(setbits),
                       probe["_pbit"] == setbits["_setbit"], "left")
            .groupBy(item_col)
            .agg((F.sum(hit) == F.lit(k)).alias("maybe_present")))


def bloom_mask(bits: DataFrame, m: int = BLOOM_M) -> list[int]:
    """Collapse the bit relation to a packed bitmask: ⌈m/64⌉ signed
    longs, bit b set in word b>>6 at position b&63. The collect is
    bounded by m (the filter's size by construction — 4096 bits =
    64 longs), the same bounded-metadata pattern as IVF centroids.
    This is the shippable form of the filter: a literal the executors
    evaluate with two integer ops per probe, no join at all."""
    words = [0] * ((m + 63) // 64)
    for r in bits.select("bit").collect():
        b = int(r["bit"])
        words[b >> 6] |= 1 << (b & 63)
    # wrap to signed 64-bit so the literals are valid Spark longs
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prefilter(df: DataFrame, item_col: str, mask: list[int],
                    m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Pre-filter a (huge) table by bloom membership of ``item_col`` —
    the runtime-filter shape: rows whose k hash bits are not ALL set
    in the mask cannot match the build side and are dropped at the
    scan, BEFORE any shuffle. Pure narrow Catalyst (k md5s + two
    integer ops per row against the broadcast-literal mask); no false
    negatives, so a subsequent exact join returns exactly the unfiltered
    join's rows — the surviving false positives are removed there.

    At 100 TB this is what saves the shuffle: the big side sheds
    non-matching rows at (say) ~1% FPR for 4096 bits/4 hashes over a
    small key set, so the exchange moves matches + ε instead of the
    whole table. Spark's own AQE runtime bloom does this adaptively;
    this operator is the explicit, engine-portable, oracle-checkable
    form of the same idea."""
    mask_arr = F.array(*[F.lit(int(w)) for w in mask])
    conds = []
    for bit in _bloom_bit_exprs(F.col(item_col), m, k):
        word = F.element_at(mask_arr, (bit / 64).cast("int") + 1)
        conds.append(F.getbit(word, (bit % 64).cast("int")) == 1)
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    return df.where(pred)


MG_K = 16


def misra_gries(items: DataFrame, item_col: str, k: int = MG_K) -> DataFrame:
    """Distributed Misra-Gries heavy-hitters summary: (item, est) rows,
    at most ``k`` of them, with the classic deterministic guarantees
    for ANY row order and ANY partitioning:

      * underestimate: est <= true_count
      * bounded error: true_count - est <= N / (k+1)
      * completeness: every item with true_count > N / (k+1) survives

    Plan shape: one Arrow-batched ``mapInPandas`` pass builds a <= k
    counter summary PER PARTITION (constant memory, no shuffle), then
    the standard mergeable-summaries reduction (Agarwal et al.,
    "Mergeable Summaries", PODS'12) combines them: sum counters by
    item and subtract the (k+1)-th largest sum from everything. The
    partials are sketch-sized by construction (<= k x num_partitions
    rows — 16x32 = 512 here, and still only ~16M rows for k=16 on a
    million-partition 100 TB scan), so the merge is a bounded
    driver-side fold, the same "collect the sketch, not the data"
    pattern as the CMS/KMV readers. Frequencies never hinge on row
    order, so the guarantee booleans the registry query emits are
    stable across engines, partitionings, and reruns.
    """
    import pandas as pd

    def part(batches):
        # vectorized MG: each Arrow batch's EXACT value_counts is a
        # valid (zero-error) summary, merged into the running summary
        # with the same PODS'12 reduction used for the cross-partition
        # merge (sum, subtract the (k+1)-th largest, drop <= 0). The
        # pairwise-merge error bound telescopes, so the per-partition
        # guarantee class is identical to per-token MG — at pandas
        # speed instead of a Python loop per token.
        counters: dict = {}
        for pdf in batches:
            for it, c in pdf["item"].value_counts().items():
                counters[it] = counters.get(it, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {i: v - sub
                            for i, v in counters.items() if v > sub}
        if counters:
            yield pd.DataFrame({"item": list(counters.keys()),
                                "c": list(counters.values())})

    partials = (items.select(F.col(item_col).cast("string").alias("item"))
                .mapInPandas(part, "item string, c long"))
    merged: dict = {}
    for row in partials.groupBy("item").agg(
            F.sum("c").alias("c")).collect():
        merged[row["item"]] = int(row["c"])
    if len(merged) > k:
        sub = sorted(merged.values(), reverse=True)[k]
        merged = {i: v - sub for i, v in merged.items() if v > sub}
    spark = items.sparkSession
    if not merged:
        return spark.createDataFrame([], "item string, est long")
    return spark.createDataFrame(
        [(i, v) for i, v in sorted(merged.items())], "item string, est long")


def kmv_distinct_by(df: DataFrame, group_col: str, item_col: str,
                    k: int = 256) -> DataFrame:
    """Grouped KMV: one k-minimum-values sketch PER GROUP — the
    "distinct users per segment / distinct tokens per domain" shape.
    Same portable hash and estimator as :func:`kmv_distinct`; the
    per-group k smallest survive a single partitioned window over the
    DISTINCT (group, hash) pairs, so the shuffle carries at most the
    distinct pairs and each group's state is k doubles. Returns
    (group, kth_min_hash, est_distinct, n_kept) per group."""
    from pyspark.sql import Window

    h = (F.conv(F.substring(F.md5(
            F.concat_ws(":", F.lit("kmv"),
                        F.col(item_col).cast("string"))), 1, 15), 16, 10)
         .cast("long"))
    u = (h + F.lit(1)).cast("double") / F.lit(float(2 ** 60))
    pairs = (df.select(F.col(group_col), u.alias("u"))
             .where(F.col("u").isNotNull()).distinct())
    w = Window.partitionBy(group_col).orderBy(F.col("u").asc())
    mins = (pairs.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k))
    agg = (mins.groupBy(group_col)
           .agg(F.max("u").alias("kth"),
                F.count("*").alias("n_kept")))
    return agg.select(
        F.col(group_col),
        F.round("kth", 10).alias("kth_min_hash"),
        F.round(F.when(F.col("n_kept") < k,
                       F.col("n_kept").cast("double"))
                 .otherwise(F.lit(k - 1) / F.col("kth")), 4)
         .alias("est_distinct"),
        F.col("n_kept"))
