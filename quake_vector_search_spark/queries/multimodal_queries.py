"""Multimodal pipeline queries — rows-only driver checks (the fake
decoder's md5-seeded output is deliberately not SQL-expressible; the
Spark plumbing is what's under test — see tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.multimodal import binary as MM
from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table


@register("mm_extract_features")  # rows-only
def mm_extract_features(spark, sf_dir):
    """Binary-asset featurization: documents → binary assets → Arrow-
    batched decode (stubbed codec) → fixed-dim feature vectors."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.extract_features(MM.synthesize_assets(docs), dim=16)


@register("mm_frame_sample")  # rows-only
def mm_frame_sample(spark, sf_dir):
    """Video-style frame sampling: one-to-many mapInPandas explode of
    decoded frames (every 4th)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.frame_sample(MM.synthesize_assets(docs, "video"), every_n=4)


@register("mm_resize")  # rows-only
def mm_resize(spark, sf_dir):
    """Fixed-shape resize/repool: every asset normalized to (8, C)
    pixels before batching — the contract a training data-loader needs."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.resize(MM.synthesize_assets(docs), target_rows=8)


@register("mm_dedup_by_features")  # rows-only (fake decode isn't SQL)
def mm_dedup_by_features(spark, sf_dir):
    """End-to-end multimodal dedup: binary assets → decoded feature
    vectors → exact-duplicate grouping on the feature fingerprint
    (md5 of the rounded vector) with keep-first canonical flag — the
    composition an image-dedup pipeline runs, with the decode seam
    stubbed. Plumbing (schema, batching, shuffle on the fingerprint) is
    the real thing; swap real_decode_stub for a codec and nothing else
    changes."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    feats = MM.extract_features(MM.synthesize_assets(docs), dim=16)
    fp = F.md5(F.to_json(F.transform(
        "features", lambda x: F.round(x, 6))))
    w = (Window.partitionBy("fingerprint")
         .orderBy(F.col("asset_id").asc()))
    return (feats.withColumn("fingerprint", fp)
            .withColumn("rn", F.row_number().over(w))
            .select("asset_id", "fingerprint",
                    (F.col("rn") == 1).alias("is_canonical")))


@register("mm_training_pairs")  # rows-only (fake decode isn't SQL)
def mm_training_pairs(spark, sf_dir):
    """Cross-modal training-pair assembly: the (text, image-features)
    table a multimodal trainer consumes. Documents flow down two
    branches — the text side keeps (lang, n_chars, token count), the
    asset side decodes to fixed-dim features — and re-join on doc_id.
    At scale both branches are narrow until the single equi-join;
    features stay an array column end-to-end (Arrow all the way into
    the data loader)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = (MM.extract_features(MM.synthesize_assets(docs), dim=16)
             .select(F.col("asset_id").alias("doc_id"), "features"))
    text_side = docs.select(
        "doc_id", "lang", "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))
    return (text_side.join(feats, "doc_id")
            .select("doc_id", "lang", "n_chars", "n_tokens",
                    F.round(F.aggregate(
                        "features", F.lit(0.0),
                        lambda s, x: s + x * x), 6).alias("feat_sq_norm")))
