"""Resize / frame-sample multimodal plumbing: schema, filters, shapes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hnormalise_spark.ops import multimodal as M


def test_resize_only_touches_images_and_rewrites_metadata(spark):
    media = M.synth_media(spark, 60)
    out = M.resize_images(media, 64, 48)
    rows = out.collect()
    # 60 rows, ids % 3 == 0 are images -> 20
    assert len(rows) == 20
    for r in rows:
        assert r["kind"] == "image"
        assert (r["width"], r["height"]) == (64, 48)
        assert r["n_bytes_out"] == len(bytes(r["payload"]))
        assert 1 <= r["n_bytes_out"] <= 16


def test_resize_payload_is_deterministic_prefix(spark):
    media = M.synth_media(spark, 30)
    got = {r["media_id"]: bytes(r["payload"]) for r in M.resize_images(media, 64, 48).collect()}
    for i in range(0, 30, 3):
        full = hashlib.md5(str(i).encode()).digest()
        w, h = i % 640 + 1, i % 480 + 1
        k = max(1, int(16 * min(1.0, (64 * 48) / (w * h))))
        assert got[f"m-{i:06d}"] == full[:k]


def test_frame_sample_explodes_rows_per_duration(spark):
    media = M.synth_media(spark, 60)
    out = M.frame_sample(media, every_ms=7)
    assert out.schema == M.FRAME_SCHEMA
    rows = out.collect()
    assert all(r["kind"] in ("audio", "video") for r in rows)
    # per-media frame count = duration // every + 1; t_ms arithmetic holds
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, frames in by_media.items():
        i = int(mid.split("-")[1])
        dur = i % 60000
        assert len(frames) == dur // 7 + 1
        for fr in frames:
            assert fr["t_ms"] == fr["frame_idx"] * 7
            assert len(bytes(fr["frame_payload"])) == 4


def test_frame_sample_filter_is_jvm_side(spark):
    media = M.synth_media(spark, 30)
    plan = M.frame_sample(media, 7)._jdf.queryExecution().executedPlan().toString()
    # the duration_ms null filter must run BEFORE the Python stage, not
    # inside it — Catalyst may rewrite it onto the source columns (here
    # it becomes a CASE over id), so assert the structural fact: a
    # Filter node sits below MapInPandas in the physical plan
    below_udf = plan.split("MapInPandas")[-1]
    assert "Filter " in below_udf or "+- Filter" in below_udf
