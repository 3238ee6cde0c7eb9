"""Fuzzy string matching via lossless pigeonhole blocking.

The near-match join a catalog/SKU/entity-resolution pipeline needs:
pairs of strings whose token sequences differ in at most ``max_hamming``
positions. All-pairs comparison is n²; the pigeonhole principle gives a
LOSSLESS blocking instead — split the token sequence into
``max_hamming + 1`` contiguous chunks; any pair within the distance
budget must agree on at least one whole chunk, so an equality join on
(chunk_idx, chunk_text, n_tokens) finds every qualifying pair, with
candidates ∝ chunk-collision density (vocabulary-bounded), never n².
The exact hamming verify then filters false candidates.

Same blocking family as dedup.simhash_pairs_blocked (bit blocks) and
dedup.cosine_pairs_lsh (sign bands); this one is exact (recall 1.0)
because token-hamming pigeonholes losslessly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_hamming_join(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 1, sep: str = " ") -> DataFrame:
    """Self-join on token-hamming distance ≤ ``max_hamming`` (equal
    token counts). Returns (id_a, id_b, n_diff) with id_a < id_b.

    One narrow tokenize pass → (max_hamming + 1)-way chunk explode →
    equality join on (chunk_idx, chunk, n_tokens) → exact verify on
    the candidate set only. Plan contains no cartesian/nested-loop
    join (pinned in tests/test_plan_shape.py).
    """
    n_chunks = max_hamming + 1
    words = (df.select(F.col(id_col).alias("_id"),
                       F.split(F.col(text_col), sep).alias("_w"))
             .withColumn("_n", F.size("_w")))
    # contiguous chunk boundaries: chunk i covers tokens
    # [floor(i·n/c)+1 .. floor((i+1)·n/c)]  (1-based slice)
    chunks = []
    for i in range(n_chunks):
        lo = f"cast(floor({i} * _n / {n_chunks}) as int)"
        hi = f"cast(floor({i + 1} * _n / {n_chunks}) as int)"
        chunks.append(F.struct(
            F.lit(i).alias("blk"),
            F.expr(f"concat_ws('\\u0001', slice(_w, {lo} + 1, "
                   f"{hi} - {lo}))").alias("key")))
    # Empty chunks exist only when _n < n_chunks (string shorter than
    # the chunk count). For those short strings EVERY equal-length pair
    # is within budget (distance ≤ _n ≤ max_hamming), so the empty
    # chunk must stay joinable or such pairs are silently dropped —
    # recall hole fixed here. For longer strings no chunk is empty and
    # the filter is a no-op kept for defense against degenerate keys.
    blocked = (words.select("_id", "_n",
                            F.explode(F.array(*chunks)).alias("bk"))
               .select("_id", "_n", "bk.blk", "bk.key")
               .where((F.col("key") != "")
                      | (F.col("_n") < F.lit(n_chunks))))
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a._n") == F.col("b._n"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"))
            .distinct())
    wa = words.select(F.col("_id").alias("id_a"), F.col("_w").alias("_wa"))
    wb = words.select(F.col("_id").alias("id_b"), F.col("_w").alias("_wb"))
    n_diff = F.expr(
        "size(filter(zip_with(_wa, _wb, (x, y) -> IF(x = y, 0, 1)), "
        "v -> v = 1))")
    return (cand.join(wa, "id_a").join(wb, "id_b")
            .withColumn("n_diff", n_diff.cast("int"))
            .where(F.col("n_diff") <= max_hamming)
            .select("id_a", "id_b", "n_diff"))
