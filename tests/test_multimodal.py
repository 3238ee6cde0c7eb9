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
