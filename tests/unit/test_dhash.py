"""Perceptual dHash (corpus/multimodal.py): hash construction matches an
independent Python reference byte-for-byte, a planted last-byte edit is
found as a sub-threshold pair, banding is complete for Hamming <= 3, and
unrelated payloads are not paired."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from who_focus_crawler_spark.corpus.multimodal import (
    DHASH_BAND_BITS,
    DHASH_BANDS,
    dhash_bands,
    dhash_pairs,
)


def ref_dhash_bands(payload: bytes) -> list[int]:
    """Independent Python reference of the frozen construction."""
    n = len(payload)
    px = [payload[(i * (n - 1)) // 71] for i in range(72)]
    bands = [0] * DHASH_BANDS
    for r in range(8):
        for c in range(8):
            if px[r * 9 + c] > px[r * 9 + c + 1]:
                j = r * 8 + c
                bands[j // DHASH_BAND_BITS] |= 1 << (j % DHASH_BAND_BITS)
    return bands


def _media(spark, payloads: dict[str, bytes]):
    return spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(payloads.items())],
        T.StructType(
            [
                T.StructField("media_id", T.StringType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )


def _payload(tag: str, size: int = 300) -> bytes:
    out = b""
    i = 0
    while len(out) < size:
        out += hashlib.md5(f"{tag}:{i}".encode()).digest()
        i += 1
    return out[:size]


def test_bands_match_python_reference(spark):
    payloads = {f"p{i}": _payload(f"seed{i}", 100 + 37 * i) for i in range(12)}
    rows = (
        _media(spark, payloads)
        .select("media_id", dhash_bands(F.col("payload")).alias("bands"))
        .collect()
    )
    for r in rows:
        assert r.bands == ref_dhash_bands(payloads[r.media_id]), r.media_id
        assert all(0 <= b < (1 << DHASH_BAND_BITS) for b in r.bands)


def test_planted_edit_is_paired_and_unrelated_are_not(spark):
    base = _payload("doc", 400)
    edited = base[:-1] + b"~"  # one byte changed in place
    payloads = {"a_base": base, "b_edit": edited}
    payloads.update({f"z{i}": _payload(f"other{i}", 400) for i in range(6)})
    got = {
        (r.media_a, r.media_b): r.hamming
        for r in dhash_pairs(_media(spark, payloads)).collect()
    }
    assert ("a_base", "b_edit") in got
    # exact Hamming from the reference hashes
    ra, rb = ref_dhash_bands(base), ref_dhash_bands(edited)
    want = sum(bin(x ^ y).count("1") for x, y in zip(ra, rb))
    assert got[("a_base", "b_edit")] == want <= 3
    for (a, b), h in got.items():
        # every reported pair is verified sub-threshold, never all-pairs noise
        assert h <= 3


def test_banding_complete_for_hamming3(spark):
    """Every payload pair with reference Hamming <= 3 is returned (the
    4x16 pigeonhole), verified against brute force over the pool."""
    payloads = {f"p{i:02d}": _payload(f"pool{i}", 256) for i in range(20)}
    # plant three graded edits of p00's payload
    base = payloads["p00"]
    payloads["q_edit1"] = base[:-1] + b"\x00"
    payloads["q_edit2"] = base[:150] + bytes([base[150] ^ 0xFF]) + base[151:]
    ref = {k: ref_dhash_bands(v) for k, v in payloads.items()}
    ids = sorted(ref)
    brute = {
        (a, b): sum(bin(x ^ y).count("1") for x, y in zip(ref[a], ref[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    want = {p: h for p, h in brute.items() if h <= 3}
    got = {
        (r.media_a, r.media_b): r.hamming
        for r in dhash_pairs(_media(spark, payloads)).collect()
    }
    assert got == want and want  # non-vacuous: the planted edits qualify
