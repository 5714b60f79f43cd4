"""Real multimodal decode (VERDICT round-3 ask #4): the P6 PPM parser
must decode GENUINE image bytes — handcrafted goldens with
non-constant rasters, comment headers, and malformed payloads — and
the Spark pipeline must produce stats that equal a reference decode of
the same bytes (not the generator formulas)."""

from __future__ import annotations

import numpy as np
import pytest

from beeradvocate_crawler_spark.plans.textops import (
    multimodal_payload_cols,
    parse_p6_ppm,
    q_multimodal_meta,
)

SF_DIR = "/root/testdata/sf0.001"


def _ppm(w: int, h: int, px: bytes, header_extra: str = "") -> bytes:
    return f"P6\n{header_extra}{w} {h}\n255\n".encode() + px


def test_golden_gradient_image_decodes_exactly():
    """2x3 RGB gradient — every byte distinct, so a fake decode that
    ignores the raster cannot produce these stats."""
    px = bytes(range(10, 10 + 2 * 3 * 3))  # 18 raster bytes: 10..27
    w, h, arr = parse_p6_ppm(_ppm(2, 3, px))
    assert (w, h) == (2, 3)
    assert arr.tolist() == list(range(10, 28))
    assert (int(arr.min()), int(arr.max()), int(arr.sum())) == (10, 27, 333)


def test_golden_header_comment_and_multidigit_dims():
    px = bytes([255] * (12 * 11 * 3))
    w, h, arr = parse_p6_ppm(_ppm(12, 11, px, header_extra="# a comment\n"))
    assert (w, h) == (12, 11)
    assert int(arr.sum()) == 12 * 11 * 3 * 255


def test_malformed_payloads_rejected():
    with pytest.raises(ValueError, match="P6"):
        parse_p6_ppm(b"P5\n2 2\n255\n" + bytes(12))
    with pytest.raises(ValueError, match="truncated"):
        parse_p6_ppm(_ppm(4, 4, bytes(10)))  # needs 48 raster bytes
    with pytest.raises(ValueError, match="8-bit"):
        parse_p6_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_spark_payloads_are_decodable_ppm_bytes(spark):
    """The JVM-built payload column must hold REAL PPM files: decode a
    sample with the pure-Python parser (no Spark) and check the stats
    against an independent byte-level recompute."""
    rows = (
        multimodal_payload_cols(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "n_chars")
        )
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        buf = bytes(r["payload"])
        w, h, px = parse_p6_ppm(buf)
        # independent recompute straight off the tail bytes
        raster = np.frombuffer(buf[-w * h * 3 :], dtype=np.uint8)
        assert px.tolist() == raster.tolist()
        assert 4 <= w <= 16 and 4 <= h <= 10


def test_query_matches_reference_decode_of_same_bytes(spark):
    """End-to-end: q_multimodal_meta's per-doc stats equal a
    driver-side reference decode of the identical payload bytes."""
    got = {
        r["doc_id"]: r
        for r in q_multimodal_meta(spark, SF_DIR).limit(50).collect()
    }
    payloads = (
        multimodal_payload_cols(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "n_chars")
        ).collect()
    )
    checked = 0
    for p in payloads:
        if p["doc_id"] not in got:
            continue
        w, h, px = parse_p6_ppm(bytes(p["payload"]))
        g = got[p["doc_id"]]
        assert (g["width"], g["height"], g["channels"]) == (w, h, 3)
        assert g["n_pixels"] == w * h
        assert (g["px_min"], g["px_max"]) == (int(px.min()), int(px.max()))
        assert g["px_sum"] == int(px.sum(dtype=np.int64))
        checked += 1
    assert checked >= 50
