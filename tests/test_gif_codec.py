"""GIF codec: LZW conformance, animation compositing, Spark surface."""

from __future__ import annotations

import numpy as np
import pytest

from sql_data_warehouse_analytics_project_spark.llm import multimodal as M


def test_lzw_hand_computed_bitstream():
    # mcs=2 over [1,1,1,1,1]: codes (clear=4, 1, 6, 6, eoi=5).
    # Widths: first four at 3 bits; the decoder's table hits 8 entries
    # while processing the tail code, so EOI goes out at 4 bits.
    # LSB-first packing of 100|001|110|110|0101 → bytes 0x8C, 0xBD? no:
    # acc: 4 +(1<<3)+(6<<6)=396 → byte 0x8C, carry 1 bit; 1|(6<<1)=13;
    # 13|(5<<4)=93 → byte 0x5D.
    assert M._lzw_compress(bytes([1, 1, 1, 1, 1]), 2) == b"\x8c\x5d"
    assert M._lzw_decompress(b"\x8c\x5d", 2) == bytes([1, 1, 1, 1, 1])


def test_lzw_roundtrip_crosses_width_boundaries_and_reset():
    rng = np.random.RandomState(7)
    for mcs in (2, 4, 8):
        # enough distinct pairs to push past 4096 entries → clear + reset
        data = rng.randint(0, 1 << mcs, size=60000).astype(np.uint8).tobytes()
        enc = M._lzw_compress(data, mcs)
        assert M._lzw_decompress(enc, mcs) == data
    # constant runs compress hard and exercise cScSc chains
    data = bytes([3]) * 5000
    assert M._lzw_decompress(M._lzw_compress(data, 2), 2) == data
    with pytest.raises(ValueError):
        M._lzw_decompress(b"\xff\xff\xff\xff", 2)  # code beyond dictionary


def test_gif_roundtrip_plain_interlaced_and_palette():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    frame = rng.randint(0, 16, size=(23, 17)).astype(np.uint8)
    for interlace in (False, True):
        blob = M.encode_gif([frame], pal, interlace=interlace)
        gif = M.decode_gif(blob)
        assert (gif["width"], gif["height"], gif["n_frames"]) == (17, 23, 1)
        assert np.array_equal(gif["frames"][0], pal[frame])


def test_gif_animation_rects_transparency_disposal():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]],
                   dtype=np.uint8)
    base = np.ones((4, 4), dtype=np.uint8)  # all red
    patch = np.array([[2, 3], [3, 2]], dtype=np.uint8)  # green + transparent
    blob = M.encode_gif(
        [base, patch, patch],
        pal,
        rects=[(0, 0), (1, 1), (2, 2)],
        disposals=[1, 3, 1],
        transparent_index=3,
        delays_cs=[5, 7, 9],
    )
    gif = M.decode_gif(blob)
    assert gif["delays_cs"] == [5, 7, 9]
    f0, f1, f2 = gif["frames"]
    # frame 0: base composits over background-color canvas
    assert np.array_equal(f0, pal[base])
    # frame 1: patch at (1,1); transparent (3) keeps red underneath
    expect1 = pal[base].copy()
    expect1[1, 1] = pal[2]
    expect1[2, 2] = pal[2]
    assert np.array_equal(f1, expect1)
    # disposal 3 on frame 1 → frame 2 composits on the frame-0 canvas
    expect2 = pal[base].copy()
    expect2[2, 2] = pal[2]
    expect2[3, 3] = pal[2]
    assert np.array_equal(f2, expect2)


def test_gif_disposal_background_restore():
    pal = np.array([[5, 5, 5], [250, 1, 2]], dtype=np.uint8)
    f = np.ones((2, 2), dtype=np.uint8)
    blob = M.encode_gif([f, np.zeros((1, 1), dtype=np.uint8)], pal,
                        rects=[(0, 0), (0, 0)], disposals=[2, 1],
                        background_index=0)
    gif = M.decode_gif(blob)
    # after frame 0, disposal 2 restores its rect to the background color;
    # frame 1 only covers (0,0)
    expect = np.tile(pal[0], (2, 2, 1))
    expect[0, 0] = pal[0]
    assert np.array_equal(gif["frames"][1], expect)


def test_gif_guards():
    with pytest.raises(ValueError):
        M.decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):
        M.decode_gif(b"GIF89a\x00")  # truncated
    pal = np.zeros((4, 3), dtype=np.uint8)
    blob = M.encode_gif([np.zeros((3, 3), dtype=np.uint8)], pal)
    with pytest.raises(ValueError):
        M.decode_gif(blob[:-10])  # truncated mid-stream
    with pytest.raises(ValueError):
        M.encode_gif([np.zeros((2, 2), dtype=np.uint8)],
                     np.zeros((5, 3), dtype=np.uint8))  # non-power-of-two
    with pytest.raises(ValueError):
        M.encode_gif([np.full((2, 2), 9, dtype=np.uint8)], pal)


def test_gif_frame_stats_spark_surface(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 5, 97)], "doc_id bigint"
    )
    media = M.synthesize_gif_media(docs)
    rows = M.gif_frame_stats(media).collect()
    by_key = {(r["media_id"], r["frame_index"]): r for r in rows}
    bad = by_key[(97, None)]
    assert bad["decode_ok"] is False and bad["r_sum"] is None
    # closed form for id=1: 3 frames of 10x12, idx=(1+3f+2x+5y)%8
    pal = [( (c * 37 + 11) % 256, (c * 53 + 7) % 256, (c * 29 + 3) % 256)
           for c in range(8)]
    h, w, nf = 10, 12, 3
    for f in range(nf):
        sums = [0, 0, 0]
        for y in range(h):
            for x in range(w):
                c = (1 + 3 * f + 2 * x + 5 * y) % 8
                for ch in range(3):
                    sums[ch] += pal[c][ch]
        r = by_key[(1, f)]
        assert (r["r_sum"], r["g_sum"], r["b_sum"]) == tuple(sums)
        assert (r["width"], r["height"], r["delay_cs"]) == (w, h, 4)
    # every_n sampling keeps frames 0, 2
    sampled = M.gif_frame_stats(media, every_n=2).collect()
    got = sorted(r["frame_index"] for r in sampled if r["media_id"] == 1)
    assert got == [0, 2]
