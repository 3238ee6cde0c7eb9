"""Multimodal plumbing tests: real Spark schemas/batching with the
deterministic fake decoder; the real-codec seam raises cleanly."""

import numpy as np
import pytest

from quake_vector_search_spark.multimodal import binary as MM
from quake_vector_search_spark.sources import load_table


@pytest.fixture(scope="module")
def assets(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return MM.synthesize_assets(docs)


def test_asset_schema(assets):
    assert [f.name for f in assets.schema.fields] == [
        "asset_id", "content", "media_type", "meta"]
    assert assets.schema["content"].dataType.typeName() == "binary"


def test_extract_features_shape_and_determinism(spark, assets):
    f1 = MM.extract_features(assets, dim=16).orderBy("asset_id").collect()
    f2 = MM.extract_features(assets, dim=16).orderBy("asset_id").collect()
    assert len(f1) == assets.count()
    assert all(len(r["features"]) == 16 for r in f1[:5])
    np.testing.assert_allclose(f1[0]["features"], f2[0]["features"])
    # n_bytes folded into the last slot matches meta
    assert f1[0]["features"][-1] == f1[0]["n_bytes"]


def test_frame_sample_one_to_many(spark, assets):
    frames = MM.frame_sample(assets.limit(20), every_n=4)
    rows = frames.collect()
    assert len(rows) > 20          # more frames than assets
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    for idxs in by_asset.values():
        assert idxs == sorted(idxs)
        assert all(i % 4 == 0 for i in idxs)


def test_real_decoder_seam_raises(spark, assets):
    with pytest.raises(Exception) as exc_info:
        MM.extract_features(assets.limit(1),
                            decode=MM.real_decode_stub).collect()
    assert "NotImplementedError" in str(exc_info.value) or \
        "media codecs" in str(exc_info.value)


def test_resize_fixed_shape(spark):
    from quake_vector_search_spark.multimodal.binary import (
        resize,
        synthesize_assets,
    )
    from quake_vector_search_spark.sources import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = resize(synthesize_assets(docs), target_rows=8).collect()
    assert len(out) == docs.count()
    for r in out:
        assert r["height"] == 8
        assert len(r["pixels"]) == 8
        assert all(len(row) == r["width"] for row in r["pixels"])


def test_decode_ppm_parses_real_bytes():
    """Round 6: the real dependency-free PPM parser — header grammar
    (comments, whitespace runs), raster reshape, validation."""
    import numpy as np
    import pytest

    from quake_vector_search_spark.multimodal.binary import decode_ppm

    raster = bytes(range(2 * 3 * 3))  # 3x2 image
    img = decode_ppm(b"P6\n# a comment\n3 2\n255\n" + raster)
    assert img.shape == (2, 3, 3)
    assert img.dtype == np.uint8
    assert img.ravel().tolist() == list(range(18))
    # whitespace-run + mid-header comment variants parse identically
    img2 = decode_ppm(b"P6  \t\n#c1\n#c2\n 3\n2 #d\n 255\n" + raster)
    assert (img2 == img).all()
    with pytest.raises(ValueError, match="bad magic"):
        decode_ppm(b"P5\n3 2\n255\n" + raster)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n3 2\n255\n" + raster[:-1])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n3 2\n65535\n" + raster * 2)
    with pytest.raises(ValueError, match="bad header token"):
        decode_ppm(b"P6\n3 x\n255\n" + raster)


def test_synthesize_ppm_roundtrip(spark):
    from quake_vector_search_spark.multimodal.binary import (
        decode_ppm,
        synthesize_ppm_assets,
    )

    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s", 11),
         (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    rows = {r["asset_id"]: bytes(r["content"])
            for r in synthesize_ppm_assets(docs).collect()}
    img1 = decode_ppm(rows[1])
    assert img1.shape == ((11 % 3) + 2, (11 % 5) + 2, 3)
    img2 = decode_ppm(rows[2])
    assert img2.shape == (2, 2, 3)
