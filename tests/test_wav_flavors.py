"""WAV flavor extensions: 8/24-bit, stereo, IMA ADPCM (multimodal.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sql_data_warehouse_analytics_project_spark.llm import multimodal as M


def test_ima_adpcm_hand_stepped_state_machine():
    # encode [0, 100] from (pred=0, index=0): diff=100 over step 7
    # quantizes to nibble 7 → decode delta 7 + 3 + 1 = 11, index → 8.
    # next nibble 0 at step_table[8]=16 → delta 2, index 8-1=7.
    assert M._ima_nibble_decode(0, 0, 7) == (11, 8)
    assert M._ima_nibble_decode(11, 8, 0) == (13, 7)
    # sign bit subtracts; clamping holds at both rails
    assert M._ima_nibble_decode(-32760, 88, 15) == (-32768, 88)
    assert M._ima_nibble_decode(32760, 88, 7) == (32767, 88)
    # a hand-built block: header (pred=0, idx=0) + byte 0x07 → [0, 11, 13]
    block = struct.pack("<hBB", 0, 0, 0) + bytes([0x07])
    assert M._ima_adpcm_decode_block(block, 3) == [0, 11, 13]


def test_ima_adpcm_roundtrip_quality_and_partial_block():
    t = np.arange(2000)
    sig = (8000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    blob = M.encode_wav_ima_adpcm(sig, 8000)
    d = M.decode_wav_ex(blob)
    assert (d["codec"], d["channels"], d["sample_rate"]) == (
        "ima_adpcm", 1, 8000)
    got = d["samples"][:, 0]
    assert got.shape == sig.shape  # fact chunk trims the padded block
    err = np.abs(got - sig)
    assert float(err.mean()) < 200 and np.corrcoef(got, sig)[0, 1] > 0.99
    # constant signals are an exact fixed point (the qd75 property)
    const = np.full(600, -1234, dtype=np.int64)
    got2 = M.decode_wav_ex(M.encode_wav_ima_adpcm(const))["samples"][:, 0]
    assert np.array_equal(got2, const)


def test_pcm_flavor_roundtrips_exact():
    n = 97
    s8 = (np.arange(n) * 13 % 256 - 128).astype(np.int64)
    d = M.decode_wav_ex(M.encode_wav_ex(s8, bits=8))
    assert d["bits"] == 8 and np.array_equal(d["samples"][:, 0], s8)
    s24 = (np.arange(n) * 170001 % (1 << 24) - (1 << 23)).astype(np.int64)
    d = M.decode_wav_ex(M.encode_wav_ex(s24, bits=24))
    assert d["bits"] == 24 and np.array_equal(d["samples"][:, 0], s24)
    left = (np.arange(n) * 13 % 4096 - 2048).astype(np.int64)
    st = np.stack([left, left + 2], axis=1)
    d = M.decode_wav_ex(M.encode_wav_ex(st, channels=2))
    assert d["channels"] == 2 and np.array_equal(d["samples"], st)
    # the 16-bit mono path agrees with the round-9 decoder
    s16 = left
    old, rate = M.decode_wav(M.encode_wav_ex(s16))
    assert rate == 8000 and np.array_equal(old.astype(np.int64), s16)


def test_wav_ex_guards():
    with pytest.raises(NotImplementedError):
        M.encode_wav_ex(np.zeros(4, dtype=np.int64), bits=32)
    with pytest.raises(ValueError):
        M.encode_wav_ex(np.array([200], dtype=np.int64), bits=8)
    with pytest.raises(ValueError):
        M.decode_wav_ex(b"RIFFxxxxNOPE")
    # float WAV (tag 3) refuses honestly
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        M.decode_wav_ex(blob)
    # stereo ADPCM refuses honestly
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 256, 4, 2, 505)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        M.decode_wav_ex(blob)


def test_audio_features_ex_spark_surface(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (4, 5, 6, 7, 97)], "doc_id bigint"
    )
    rows = M.audio_features_ex(
        M.synthesize_wav_flavors_media(docs)).collect()
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[97]["decode_ok"] is False
    # closed forms per flavor
    for i in (4, 5, 6, 7):
        n = 64 + i % 32
        k = np.arange(n, dtype=np.int64)
        if i % 4 == 0:
            s, bits, ch, codec = (i * 7 + k * 13) % 256 - 128, 8, 1, "pcm"
        elif i % 4 == 1:
            s, bits, ch, codec = (
                (i * 11 + k * 17) % (1 << 24) - (1 << 23), 24, 1, "pcm")
        elif i % 4 == 2:
            s, bits, ch, codec = (
                (i * 7 + k * 13) % 4096 - 2048 + 1, 16, 2, "pcm")
        else:
            s = np.full(n, i * 13 % 4096 - 2048, dtype=np.int64)
            bits, ch, codec = 16, 1, "ima_adpcm"
        r = by_id[i]
        assert (r["bits"], r["channels"], r["codec"]) == (bits, ch, codec)
        assert r["n_frames"] == n and r["amp_sum"] == int(s.sum())
        assert r["energy"] == int((s * s).sum())
        assert r["zero_crossings"] == int(
            np.count_nonzero(s[:-1] * s[1:] < 0))
