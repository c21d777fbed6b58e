"""Multimodal plumbing: schema contract, Arrow batch path, stub gating."""

from __future__ import annotations

import hashlib

import pytest

from bpaotu_spark.multimodal.core import (
    decode_assets,
    decode_payload,
    multimodal_table,
)
from bpaotu_spark.registry import QUERIES, load_all

load_all()


def test_multimodal_table_schema(spark, sf_dir):
    m = multimodal_table(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<n_bytes:")
    r = m.first()
    assert r.media_type in ("image", "audio", "video")
    assert r.meta.n_bytes == len(r.payload)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "image")


def test_decode_pipeline_roundtrip(spark, sf_dir, tables):
    out = decode_assets(multimodal_table(spark, sf_dir), fake=True)
    rows = out.collect()
    assert len(rows) == tables["documents"].count()
    docs = {r.doc_id: r.text for r in tables["documents"].collect()}
    for r in rows[:20]:
        assert r.checksum == hashlib.md5(docs[r.asset_id].encode()).hexdigest()
        assert r.n_bytes == len(docs[r.asset_id].encode())
        assert (r.n_frames == 1) == (r.media_type == "image")


def test_decode_survives_repartition(spark, sf_dir):
    """Arrow batching must be partition-independent."""
    m = multimodal_table(spark, sf_dir)
    a = sorted((r.asset_id, r.checksum) for r in decode_assets(m).collect())
    b = sorted(
        (r.asset_id, r.checksum) for r in decode_assets(m.repartition(7)).collect()
    )
    assert a == b


def test_resize_geometry(spark, sf_dir):
    rows = QUERIES["multimodal_resize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert max(r.out_w, r.out_h) <= 224 or r.scale == 1.0
        if r.scale == 1.0:
            assert (r.out_w, r.out_h) == (r.src_w, r.src_h)
        else:
            assert abs(r.out_w - r.src_w * r.scale) <= 0.5 + 1e-6


def test_frame_sample_only_videos_and_stride(spark, sf_dir):
    rows = QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
    assert rows
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r.frame_idx)
    for idxs in by_asset.values():
        idxs.sort()
        assert idxs[0] == 0
        assert all(b - a == 30 for a, b in zip(idxs, idxs[1:]))


def test_features_shape_and_determinism(spark, sf_dir):
    out = QUERIES["multimodal_features"](spark, sf_dir)
    assert dict(out.dtypes)["feature"] == "array<float>"
    a = {r.asset_id: r.feature for r in out.collect()}
    b = {r.asset_id: r.feature for r in out.collect()}
    assert a == b
    assert all(len(v) == 8 and all(-1 <= x <= 1 for x in v) for v in a.values())
