"""media_dedup: hashlib replay of the hex-hop fingerprint, dup
grouping, cross-kind surfacing, null payloads."""

import hashlib

import pytest

from hnormalise_spark.ops.multimodal import media_dedup, synth_media


def _fp(payload: bytes) -> str:
    # md5 over the UPPERCASE hex form — Spark's hex() casing
    return hashlib.md5(payload.hex().upper().encode()).hexdigest()


ROWS = [
    ("m-1", "image", b"\x01\x02"),
    ("m-2", "video", b"\x01\x02"),   # same bytes, other modality
    ("m-3", "image", b"\x01\x02"),
    ("m-4", "audio", b"\xff"),
    ("m-5", "audio", None),
    ("m-6", "video", None),
]


def test_groups_and_fingerprint(spark):
    df = spark.createDataFrame(
        ROWS, "media_id string, kind string, payload binary"
    )
    got = {r.fingerprint: r for r in media_dedup(df).collect()}
    k = _fp(b"\x01\x02")
    assert got[k].keeper_id == "m-1"
    assert got[k].n_copies == 3
    assert got[k].n_bytes == 2
    assert got[k].kinds == "image,video"
    assert got[_fp(b"\xff")].n_copies == 1
    # null payloads group under the null fingerprint
    assert got[None].n_copies == 2 and got[None].keeper_id == "m-5"


def test_synth_media_dup_mod(spark):
    flat = media_dedup(synth_media(spark, 74, dup_mod=37)).collect()
    assert len(flat) == 37
    assert all(r.n_copies == 2 for r in flat)
    # without dup_mod every payload is unique
    uniq = media_dedup(synth_media(spark, 74)).collect()
    assert len(uniq) == 74 and all(r.n_copies == 1 for r in uniq)
