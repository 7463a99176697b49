"""Multimodal plumbing tests: binary payloads, mapInPandas decode stub,
frame sampling — the Spark-side machinery is real even though the codec is
stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators import multimodal as M
from pucminas_data_pipelines_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _assets(spark, n=20):
    docs = load_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < n)
    return docs, M.attach_binary_payload(docs, "doc_id", "text")


def test_payload_roundtrip(spark):
    docs, assets = _assets(spark)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in assets.collect():
        assert bytes(r["payload"]).decode("utf-8") == texts[r["asset_id"]]
        assert r["meta"]["byte_len"] == len(texts[r["asset_id"]].encode())


def test_decode_stub_matches_local_reference(spark):
    docs, assets = _assets(spark)
    decoded = {r["asset_id"]: r for r in M.decode_assets(assets).collect()}
    for r in docs.collect():
        payload = r["text"].encode()
        width, height, feature = M.decode_stub(payload, "png")
        got = decoded[r["doc_id"]]
        assert (got["width"], got["height"]) == (width, height)
        assert list(got["feature"]) == pytest.approx(feature)
        assert got["byte_len"] == len(payload)


def test_decode_stub_rejects_unknown_format():
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"xx", "mp4")


def test_frame_sample_counts(spark):
    docs, assets = _assets(spark)
    frames = M.sample_frames(assets, every_nth_byte=64, max_frames=4)
    counts = {r[0]: r[1] for r in frames.groupBy("asset_id").count().collect()}
    lens = {r["doc_id"]: len(r["text"].encode()) for r in docs.collect()}
    for did, n in counts.items():
        expected = min(4, (lens[did] + 63) // 64)
        assert n == expected


def test_resize_stub_geometry_and_features(spark):
    from pucminas_data_pipelines_spark.operators import multimodal as M

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    decoded = M.decode_assets(M.attach_binary_payload(docs, "doc_id", "text"))
    resized = {r["asset_id"]: r for r in M.resize_assets(decoded).collect()}
    for r in decoded.collect():
        out = resized[r["asset_id"]]
        scale = min(256 / r["width"], 256 / r["height"], 1.0)
        assert out["resized_width"] == max(int(r["width"] * scale), 1)
        assert out["resized_height"] == max(int(r["height"] * scale), 1)
        expect_feat = r["feature"] if scale >= 1.0 else r["feature"][::2]
        assert out["feature"] == expect_feat
        # never upscale
        assert out["resized_width"] <= r["width"]
        assert out["resized_height"] <= r["height"]


def test_shard_roundtrip_recovers_every_asset(spark):
    """Every shard must report all_roundtrip_ok=True — the md5 extraction
    check is the point of the query, not just a column to hash-match (the
    original offset math anchored at shard_id*64KiB and sliced garbage for
    shards whose first asset crossed the boundary; this pins the fix)."""
    from pucminas_data_pipelines_spark.plans import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["multimodal_shard_roundtrip"](spark, SF_SMOKE).collect()
    assert rows and all(r["all_roundtrip_ok"] for r in rows)


def test_frame_sample_rejects_degenerate_parameters(spark):
    """max_frames=0 would make sequence(0,-1) count DOWNWARD (Spark's
    sequence is descending when stop < start) and silently emit a garbage
    frame_no=-1 row per asset; every_nth_byte=0 would emit duplicate
    offset-0 frames. Both refuse loudly."""
    _, assets = _assets(spark)
    with pytest.raises(ValueError, match="max_frames"):
        M.sample_frames(assets, max_frames=0)
    with pytest.raises(ValueError, match="every_nth_byte"):
        M.sample_frames(assets, every_nth_byte=0)
