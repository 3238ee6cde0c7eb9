"""Scalar quantization (SQ8) for embedding columns — a capability the
reference lacks (SURVEY.md §2.2: "no quantization (PQ/SQ)").

At 100 TB the vector scan is bandwidth-bound: SQ8 stores each float32
dimension as one uint8 against per-dimension [min, max] ranges — 4×
less data moved per probe — and search pays a small accuracy cost that
an exact *rerank* of the top candidates cancels.

All pure Catalyst: encode/decode are `transform` expressions (no UDF),
ranges are one tiny aggregate (broadcastable). The rerank pattern is
candidate-k× oversampling → join back to the full-precision vectors →
exact top-k, deterministic tie-breaks throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = 255  # uint8 code points


def dim_ranges(df: DataFrame, vec_col: str = "embedding",
               d: int | None = None) -> tuple[list, list]:
    """Per-dimension [min, max] over the corpus: one aggregate pass
    (posexplode → groupBy dim). Returns (mins, maxs) as Python lists —
    k·d floats, broadcast-scale."""
    if d is None:
        d = len(df.select(vec_col).head()[0])
    agg = (df.select(F.posexplode(vec_col).alias("dim", "x"))
           .groupBy("dim")
           .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
           .collect())
    mins = [0.0] * d
    maxs = [0.0] * d
    for r in agg:
        mins[r["dim"]] = float(r["mn"])
        maxs[r["dim"]] = float(r["mx"])
    return mins, maxs


def _ranges_arrays(mins: list, maxs: list):
    mn = F.array(*[F.lit(float(v)) for v in mins])
    span = F.array(*[F.lit(float(mx - mn) if mx > mn else 1.0)
                     for mn, mx in zip(mins, maxs)])
    return mn, span


def sq8_encode(df: DataFrame, mins: list, maxs: list,
               vec_col: str = "embedding",
               code_col: str = "codes") -> DataFrame:
    """float32 vector → array<int> of uint8 codes (pure expression):
    code_i = round((x_i - min_i) / span_i * 255), clamped to [0, 255]."""
    mn, span = _ranges_arrays(mins, maxs)
    zipped = F.arrays_zip(
        F.col(vec_col).cast("array<double>").alias("v"),
        mn.alias("mn"), span.alias("sp"))
    code = F.transform(
        zipped,
        lambda t: F.greatest(
            F.lit(0),
            F.least(F.lit(LEVELS),
                    F.round((t["v"] - t["mn"]) / t["sp"] * LEVELS)
                     .cast("int"))))
    return df.withColumn(code_col, code)


def sq8_decode_expr(code_col: str, mins: list, maxs: list):
    """Codes → approximate float64 vector: x̂_i = min_i + c_i/255·span_i."""
    mn, span = _ranges_arrays(mins, maxs)
    zipped = F.arrays_zip(F.col(code_col).alias("c"),
                          mn.alias("mn"), span.alias("sp"))
    return F.transform(
        zipped,
        lambda t: t["mn"] + t["c"] / F.lit(float(LEVELS)) * t["sp"])


def knn_sq8(corpus_df: DataFrame, queries, k: int = 10,
            oversample: int = 4,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate kNN over SQ8 codes with exact rerank:

    1. quantize the corpus (ranges from one aggregate pass),
    2. brute-force top-(k·oversample) on the DECODED approximations
       (4× less data to scan at scale — codes travel, floats don't),
    3. join the candidates back to full-precision vectors and take the
       exact top-k (deterministic (dist, id) tie-break).

    With oversample ≥ 4 the exact answer survives quantization noise in
    practice; tests assert a recall floor, not hash equality.
    """
    from quake_vector_search_spark.operators.knn import knn_bruteforce

    mins, maxs = dim_ranges(corpus_df, vec_col)
    enc = sq8_encode(corpus_df.select(id_col, vec_col), mins, maxs,
                     vec_col=vec_col)
    approx_corpus = enc.select(
        F.col(id_col),
        sq8_decode_expr("codes", mins, maxs).alias(vec_col))
    cand = knn_bruteforce(approx_corpus, queries, k=k * oversample,
                          id_col=id_col, vec_col=vec_col)
    # exact rerank on the true vectors of the candidate set only
    full = corpus_df.select(F.col(id_col),
                            F.col(vec_col).alias("_fv"))
    from quake_vector_search_spark.functions.vector import l2_col

    qdf = (queries if isinstance(queries, DataFrame) else None)
    if qdf is None:
        import pandas as pd
        qids, qmat = queries
        spark = corpus_df.sparkSession
        qdf = spark.createDataFrame(
            pd.DataFrame({"query_id": qids,
                          "embedding": [list(map(float, v))
                                        for v in qmat]}))
    qv = qdf.select(F.col("query_id"),
                    F.col("embedding").cast("array<double>").alias("_qv"))
    from pyspark.sql import Window
    rer = (cand.select("query_id", id_col)
           .join(full, id_col)
           .join(F.broadcast(qv), "query_id")
           .withColumn("dist", l2_col("_fv", "_qv")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("dist").asc(), F.col(id_col).asc()))
    return (rer.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist", "rank"))
