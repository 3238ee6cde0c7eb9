"""Multimodal pipeline queries — driver-hash-matched against pure-SQL
DuckDB oracles.

The Spark side runs the REAL plumbing (synthesize binary assets →
Arrow-batched mapInPandas decode → feature/frame/resize stages); the
oracle recomputes the same values in SQL because ``fake_decode`` is
deliberately SQL-expressible (per-pixel md5 integer arithmetic over a
power-of-two denominator — see multimodal/binary.py:fake_decode).
Array-valued columns are projected to deterministic scalars in the
registered output (rounded per-channel values / fixed-point micro
integers) so the driver's pandas canonicalizer can sort and hash them;
the array-returning operators themselves are unchanged and unit-tested
in tests/test_multimodal.py.

Reference parity: the reference treats media as opaque payloads decoded
at the edge of the pipeline (QUAKE_working_demo.ipynb has no media
path; this surface is the LLM-training-data extension mandated by
SURVEY.md §2.3 E15).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from quake_vector_search_spark.multimodal import binary as MM
from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table

# Shared SQL fragments -------------------------------------------------
# One pixel value as an exact float64: k/2^20 with k < 2^20.
_PIX = ("(CAST(concat('0x', substr(md5(text || ':' || {i} || ':' || {j}), "
        "1, 15)) AS BIGINT) % 1048576)")

_BASE = """
base AS (
  SELECT doc_id AS asset_id, text,
         length(text)  AS n_bytes,
         strlen(text)  AS byte_len,
         (strlen(text) % 17) + 2 AS n_rows
  FROM documents
)
"""

# Per-(asset, i, j) pixel integers k; mean over i per channel j is then
# SUM(k)/2^20/n_rows — exact sum (power-of-two denominator), one final
# correctly-rounded division, identical to np.mean on the Spark side.
_PX_CELLS = """
cells AS (
  SELECT asset_id, n_bytes, byte_len, n_rows, i, js.j,
         """ + _PIX.format(i="i", j="js.j") + """ AS k
  FROM (SELECT asset_id, text, n_bytes, byte_len, n_rows,
               unnest(range(n_rows)) AS i
        FROM base)
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS js(j)
)
"""

_FEATS_SQL = """
feats AS (
  SELECT asset_id,
         any_value(n_bytes)  AS n_bytes,
         any_value(byte_len) AS byte_len,
         any_value(n_rows)   AS n_rows,
         SUM(CASE WHEN j = 0 THEN k END) / 1048576.0 / any_value(n_rows) AS f0,
         SUM(CASE WHEN j = 1 THEN k END) / 1048576.0 / any_value(n_rows) AS f1,
         SUM(CASE WHEN j = 2 THEN k END) / 1048576.0 / any_value(n_rows) AS f2,
         SUM(CASE WHEN j = 3 THEN k END) / 1048576.0 / any_value(n_rows) AS f3
  FROM cells GROUP BY asset_id
)
"""


def _fj(idx: int):
    """Rounded channel-mean feature from the array column (1-based)."""
    return F.round(F.element_at("features", idx), 6)


def _micro(col):
    """Fixed-point micro-units of an already-6-rounded feature — exact
    integers on both engines, immune to float formatting differences."""
    return F.round(col * 1000000.0, 0).cast("long")


MM_EXTRACT_SQL = f"""
WITH {_BASE}, {_PX_CELLS}, {_FEATS_SQL}
SELECT asset_id, 'image' AS media_type, n_bytes,
       ROUND(f0, 6) AS f0, ROUND(f1, 6) AS f1,
       ROUND(f2, 6) AS f2, ROUND(f3, 6) AS f3,
       byte_len AS f_len
FROM feats
"""


@register("mm_extract_features", sql=MM_EXTRACT_SQL)
def mm_extract_features(spark, sf_dir):
    """Binary-asset featurization: documents → binary assets → Arrow-
    batched decode (stubbed codec) → fixed-dim feature vectors, with the
    4 real channel means + the length slot projected to scalars for the
    hash gate (features[4..14] are structurally zero at channels=4)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = MM.extract_features(MM.synthesize_assets(docs), dim=16)
    return feats.select(
        "asset_id", "media_type", "n_bytes",
        _fj(1).alias("f0"), _fj(2).alias("f1"),
        _fj(3).alias("f2"), _fj(4).alias("f3"),
        F.element_at("features", 16).cast("long").alias("f_len"))


MM_FRAME_SQL = f"""
WITH {_BASE}
SELECT asset_id, i AS frame_idx,
       ROUND({_PIX.format(i="i", j="0")} / 1048576.0, 6) AS c0,
       ROUND({_PIX.format(i="i", j="1")} / 1048576.0, 6) AS c1,
       ROUND({_PIX.format(i="i", j="2")} / 1048576.0, 6) AS c2,
       ROUND({_PIX.format(i="i", j="3")} / 1048576.0, 6) AS c3
FROM (SELECT asset_id, text, unnest(range(n_rows)) AS i FROM base)
WHERE i % 4 = 0
"""


@register("mm_frame_sample", sql=MM_FRAME_SQL)
def mm_frame_sample(spark, sf_dir):
    """Video-style frame sampling: one-to-many mapInPandas explode of
    decoded frames (every 4th), channels projected to rounded scalars."""
    docs = load_table(spark, sf_dir, "documents")
    frames = MM.frame_sample(MM.synthesize_assets(docs, "video"), every_n=4)
    return frames.select(
        "asset_id", "frame_idx",
        F.round(F.element_at("frame", 1), 6).alias("c0"),
        F.round(F.element_at("frame", 2), 6).alias("c1"),
        F.round(F.element_at("frame", 3), 6).alias("c2"),
        F.round(F.element_at("frame", 4), 6).alias("c3"))


# np.linspace(0, n_rows-1, 8).round(): values are multiples of 1/7, never
# exactly x.5, so ROUND-half-away (DuckDB) ≡ np.round half-even here.
MM_RESIZE_SQL = f"""
WITH {_BASE}
SELECT asset_id, 8 AS height, 4 AS width, t AS row_pos,
       ROUND({_PIX.format(i="i", j="0")} / 1048576.0, 6) AS c0,
       ROUND({_PIX.format(i="i", j="1")} / 1048576.0, 6) AS c1,
       ROUND({_PIX.format(i="i", j="2")} / 1048576.0, 6) AS c2,
       ROUND({_PIX.format(i="i", j="3")} / 1048576.0, 6) AS c3
FROM (SELECT asset_id, text, t,
             CAST(ROUND((n_rows - 1) * t / 7.0, 0) AS BIGINT) AS i
      FROM base, unnest(range(8)) AS ts(t))
"""


@register("mm_resize", sql=MM_RESIZE_SQL)
def mm_resize(spark, sf_dir):
    """Fixed-shape resize/repool: every asset normalized to (8, C)
    pixels before batching; pixel rows posexploded and channel values
    projected to rounded scalars for the hash gate."""
    docs = load_table(spark, sf_dir, "documents")
    out = MM.resize(MM.synthesize_assets(docs), target_rows=8)
    return (out.select("asset_id", "height", "width",
                       F.posexplode("pixels").alias("row_pos", "pvals"))
            .select("asset_id", "height", "width",
                    F.col("row_pos").cast("long").alias("row_pos"),
                    F.round(F.element_at("pvals", 1), 6).alias("c0"),
                    F.round(F.element_at("pvals", 2), 6).alias("c1"),
                    F.round(F.element_at("pvals", 3), 6).alias("c2"),
                    F.round(F.element_at("pvals", 4), 6).alias("c3")))


MM_DEDUP_SQL = f"""
WITH {_BASE}, {_PX_CELLS}, {_FEATS_SQL},
fp AS (
  SELECT asset_id,
         md5(concat_ws(',',
             CAST(ROUND(ROUND(f0, 6) * 1000000.0, 0) AS BIGINT),
             CAST(ROUND(ROUND(f1, 6) * 1000000.0, 0) AS BIGINT),
             CAST(ROUND(ROUND(f2, 6) * 1000000.0, 0) AS BIGINT),
             CAST(ROUND(ROUND(f3, 6) * 1000000.0, 0) AS BIGINT),
             byte_len)) AS fingerprint
  FROM feats
)
SELECT asset_id, fingerprint,
       row_number() OVER (PARTITION BY fingerprint ORDER BY asset_id)
           = 1 AS is_canonical
FROM fp
"""


@register("mm_dedup_by_features", sql=MM_DEDUP_SQL)
def mm_dedup_by_features(spark, sf_dir):
    """End-to-end multimodal dedup: binary assets → decoded feature
    vectors → exact-duplicate grouping on a fixed-point feature
    fingerprint (md5 over micro-unit channel means + byte length) with
    keep-first canonical flag. Plumbing (schema, Arrow batching, shuffle
    on the fingerprint) is the real thing; swap real_decode_stub for a
    codec and nothing else changes."""
    docs = load_table(spark, sf_dir, "documents")
    feats = MM.extract_features(MM.synthesize_assets(docs), dim=16)
    fp = F.md5(F.concat_ws(
        ",", _micro(_fj(1)), _micro(_fj(2)), _micro(_fj(3)), _micro(_fj(4)),
        F.element_at("features", 16).cast("long")))
    w = Window.partitionBy("fingerprint").orderBy(F.col("asset_id").asc())
    return (feats.withColumn("fingerprint", fp)
            .withColumn("rn", F.row_number().over(w))
            .select("asset_id", "fingerprint",
                    (F.col("rn") == 1).alias("is_canonical")))


MM_PAIRS_SQL = f"""
WITH {_BASE}, {_PX_CELLS}, {_FEATS_SQL},
micro AS (
  SELECT asset_id AS doc_id,
         CAST(ROUND(ROUND(f0, 6) * 1000000.0, 0) AS BIGINT) AS m0,
         CAST(ROUND(ROUND(f1, 6) * 1000000.0, 0) AS BIGINT) AS m1,
         CAST(ROUND(ROUND(f2, 6) * 1000000.0, 0) AS BIGINT) AS m2,
         CAST(ROUND(ROUND(f3, 6) * 1000000.0, 0) AS BIGINT) AS m3
  FROM feats
)
SELECT d.doc_id, d.lang, d.n_chars,
       len(str_split_regex(trim(d.text), '\\s+')) AS n_tokens,
       m.m0 * m.m0 + m.m1 * m.m1 + m.m2 * m.m2 + m.m3 * m.m3
           AS feat_norm_micro2
FROM documents d JOIN micro m ON d.doc_id = m.doc_id
"""


@register("mm_training_pairs", sql=MM_PAIRS_SQL)
def mm_training_pairs(spark, sf_dir):
    """Cross-modal training-pair assembly: the (text, image-features)
    table a multimodal trainer consumes. Documents flow down two
    branches — the text side keeps (lang, n_chars, token count), the
    asset side decodes to fixed-dim features — and re-join on doc_id.
    At scale both branches are narrow until the single equi-join. The
    feature norm is carried as an exact fixed-point integer so the hash
    gate is float-free."""
    docs = load_table(spark, sf_dir, "documents")
    feats = (MM.extract_features(MM.synthesize_assets(docs), dim=16)
             .select(F.col("asset_id").alias("doc_id"),
                     (_micro(_fj(1)) * _micro(_fj(1))
                      + _micro(_fj(2)) * _micro(_fj(2))
                      + _micro(_fj(3)) * _micro(_fj(3))
                      + _micro(_fj(4)) * _micro(_fj(4)))
                     .alias("feat_norm_micro2")))
    text_side = docs.select(
        "doc_id", "lang", "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))
    return text_side.join(feats, "doc_id").select(
        "doc_id", "lang", "n_chars", "n_tokens", "feat_norm_micro2")
