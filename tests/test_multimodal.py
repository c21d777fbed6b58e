"""Multimodal plumbing: real BMP/WAV/y4m encode→decode round trip,
schema contract, Arrow batch path."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from bpaotu_spark.multimodal.core import (
    FRAME_STEP,
    decode_assets,
    decode_payload,
    encode_bmp,
    encode_wav,
    encode_y4m,
    multimodal_table,
    _audio_samples,
    _image_dims,
    _video_dims,
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


def test_decode_rejects_malformed_payloads():
    with pytest.raises(ValueError):
        decode_payload(b"\x89PNG\r\n\x1a\n", "image")  # PNG magic: no codec
    with pytest.raises(ValueError):
        decode_payload(b"OggS....", "audio")
    with pytest.raises(ValueError):
        decode_payload(b"\x00\x00\x00 ftypmp42", "video")
    with pytest.raises(ValueError):
        decode_payload(b"BM", "text")  # unknown media_type


def test_encode_decode_roundtrip_pure_python():
    """The decoders parse real headers, not our own globals: dims come
    back from the BYTES via struct/chunk-walk, and a doctored header is
    believed (proving the parse reads the payload, not the formula)."""
    for doc_id in (0, 1, 2, 3, 94, 95, 96, 1000, 12345):
        w, h = _image_dims(doc_id)
        assert decode_payload(encode_bmp(doc_id, b"abc"), "image") == (w, h, 1)
        n = _audio_samples(doc_id)
        assert decode_payload(encode_wav(doc_id, b"xy"), "audio") == (0, 0, n)
        vw, vh, nf = _video_dims(doc_id)
        assert decode_payload(encode_y4m(doc_id, b"z"), "video") == (vw, vh, nf)
    # doctor a BMP's width field: decode must report the doctored value
    b = bytearray(encode_bmp(7, b"q"))
    struct.pack_into("<i", b, 18, 999)
    assert decode_payload(bytes(b), "image")[0] == 999


def test_decode_pipeline_roundtrip(spark, sf_dir, tables):
    out = decode_assets(multimodal_table(spark, sf_dir))
    rows = out.collect()
    assert len(rows) == tables["documents"].count()
    for r in rows[:30]:
        if r.media_type == "image":
            assert (r.width, r.height) == _image_dims(r.asset_id)
            assert r.n_frames == 1
        elif r.media_type == "audio":
            assert (r.width, r.height) == (0, 0)
            assert r.n_frames == _audio_samples(r.asset_id)
        else:
            assert (r.width, r.height, r.n_frames) == _video_dims(r.asset_id)


def test_decode_survives_repartition(spark, sf_dir):
    """Arrow batching must be partition-independent."""
    m = multimodal_table(spark, sf_dir)
    a = sorted(tuple(r) for r in decode_assets(m).collect())
    b = sorted(tuple(r) for r in decode_assets(m.repartition(7)).collect())
    assert a == b


def test_resize_geometry(spark, sf_dir):
    rows = QUERIES["multimodal_resize"](spark, sf_dir).collect()
    assert rows
    seen_downscale = seen_passthrough = False
    for r in rows:
        if r.scale_ppm == 1_000_000:
            assert (r.out_w, r.out_h) == (r.src_w, r.src_h)
            seen_passthrough = True
        else:
            assert max(r.src_w, r.src_h) > 224
            assert max(r.out_w, r.out_h) == 224  # exact: floor(max*224/max)
            assert r.out_w == r.src_w * 224 // max(r.src_w, r.src_h)
            seen_downscale = True
    assert seen_downscale and seen_passthrough  # both branches exercised


def test_frame_sample_only_videos_and_stride(spark, sf_dir):
    rows = QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
    assert rows
    by_asset = {}
    for r in rows:
        assert r.asset_id % 3 == 2  # videos only
        by_asset.setdefault(r.asset_id, []).append(r.frame_idx)
    for asset_id, idxs in by_asset.items():
        idxs.sort()
        assert idxs[0] == 0
        assert all(b - a == FRAME_STEP for a, b in zip(idxs, idxs[1:]))
        nf = _video_dims(asset_id)[2]
        assert len(idxs) == -(-nf // FRAME_STEP)  # ceil(nf/step)


def test_features_shape_and_determinism(spark, sf_dir):
    """Registered entry emits scalar rows (driver contract — r6 red
    row was an array<float> column); the array-shaped extract_features
    must stay consistent with it: byte_val == round(f*127.5 + 127.5)."""
    from bpaotu_spark.multimodal.core import (
        extract_features,
        multimodal_table,
    )

    out = QUERIES["multimodal_features"](spark, sf_dir)
    assert dict(out.dtypes) == {
        "asset_id": "bigint", "media_type": "string",
        "dim": "int", "byte_val": "int",
    }
    a = {(r.asset_id, r.dim): r.byte_val for r in out.collect()}
    b = {(r.asset_id, r.dim): r.byte_val for r in out.collect()}
    assert a == b
    assert all(0 <= v <= 255 for v in a.values())
    n_assets = len({k[0] for k in a})
    assert len(a) == 8 * n_assets  # every asset exploded to 8 dims

    feats = {
        r.asset_id: r.feature
        for r in extract_features(multimodal_table(spark, sf_dir)).collect()
    }
    assert set(feats) == {k[0] for k in a}
    for aid, vec in feats.items():
        assert len(vec) == 8 and all(-1 <= x <= 1 for x in vec)
        for j, f in enumerate(vec):
            assert a[(aid, j)] == round(f * 127.5 + 127.5)


def test_image_ahash_function_properties():
    """aHash: container-equal pixels hash equal; a heavy pixel
    perturbation changes the hash; output is 16 hex chars; top-down vs
    bottom-up encodings of the same pixels collide."""
    from bpaotu_spark.multimodal.core import encode_bmp, image_ahash

    a = encode_bmp(7, b"hello world payload bytes")
    b = encode_bmp(7, b"hello world payload bytes")
    assert image_ahash(a) == image_ahash(b)
    assert len(image_ahash(a)) == 16
    int(image_ahash(a), 16)  # valid hex
    c = encode_bmp(7, bytes(200))  # all-zero pixels → different grid
    assert image_ahash(c) != image_ahash(a)


def test_phash_dedup_families(spark, sf_dir):
    """Operator invariants: every image asset appears exactly once,
    keeper is the family min, duplicates flagged iff not keeper, and
    the run is deterministic."""
    rows = QUERIES["multimodal_phash_dedup"](spark, sf_dir).collect()
    assert rows
    ids = [r.asset_id for r in rows]
    assert len(ids) == len(set(ids))
    from collections import defaultdict

    fams = defaultdict(list)
    for r in rows:
        fams[r.phash].append(r)
        assert r.is_duplicate == (r.asset_id != r.keeper_id)
    for fam in fams.values():
        keeper = min(r.asset_id for r in fam)
        assert all(r.keeper_id == keeper for r in fam)
        assert all(r.group_size == len(fam) for r in fam)
    again = {
        r.asset_id: r.phash
        for r in QUERIES["multimodal_phash_dedup"](spark, sf_dir).collect()
    }
    assert again == {r.asset_id: r.phash for r in rows}


def test_wav_rms_function_exact():
    """RMS on a constructed WAV equals the hand-computed integer value."""
    import math

    from bpaotu_spark.multimodal.core import wav_rms_floor

    samples = [0, 100, -200, 300, -400, 32767]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    n, peak, rms = wav_rms_floor(wav)
    assert n == 6 and peak == 32767
    assert rms == math.isqrt(sum(s * s for s in samples) // 6)


def test_wav_rms_operator_census(spark, sf_dir):
    """The per-asset profile covers every audio asset exactly once with
    a band label consistent with its rms_floor."""
    rows = QUERIES["multimodal_wav_rms"](spark, sf_dir).collect()
    assert rows
    bounds = {"silent": (0, 1000), "quiet": (1000, 8000),
              "loud": (8000, 20000), "hot": (20000, 1 << 31)}
    seen = set()
    for r in rows:
        lo, hi = bounds[r.rms_band]
        assert lo <= r.rms_floor < hi
        assert 0 <= r.rms_floor <= r.peak_abs <= 32768
        assert r.n_samples > 0
        seen.add(r.asset_id)
    from bpaotu_spark.multimodal.core import multimodal_table

    n_audio = (
        multimodal_table(spark, sf_dir)
        .filter(F.col("media_type") == "audio")
        .count()
    )
    assert len(rows) == len(seen) == n_audio


def test_phash_near_pairs_contains_exact_families(spark, sf_dir):
    """Every exact-phash duplicate pair appears with hamming 0, all
    reported pairs respect the threshold, and hamming matches a python
    recompute from the per-asset hashes."""
    from collections import defaultdict

    from bpaotu_spark.multimodal.core import multimodal_table, phash_assets

    hashes = {
        r.asset_id: r.phash
        for r in phash_assets(multimodal_table(spark, sf_dir)).collect()
    }
    pairs = QUERIES["multimodal_phash_near_pairs"](spark, sf_dir).collect()
    got = {(r.asset_a, r.asset_b): r.hamming for r in pairs}
    for (a, b), h in got.items():
        want = bin(int(hashes[a], 16) ^ int(hashes[b], 16)).count("1")
        assert h == want and h <= 3
    fams = defaultdict(list)
    for aid, ph in hashes.items():
        fams[ph].append(aid)
    for ids in fams.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                assert got.get((a, b)) == 0
