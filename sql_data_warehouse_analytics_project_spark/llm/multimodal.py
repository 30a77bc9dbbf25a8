"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed batch-wise via
``mapInPandas`` (Arrow-batched — the only sanctioned Python hot path).

The decode libraries (PIL/ffmpeg/librosa) are typically NOT in this
container, so the kernels are capability-probed: ``decode="fake"`` runs a
deterministic pure-Python fake (parses our own fake header format) so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is
real and tested end-to-end; ``decode="real"`` probes for PIL at call
time and runs a real Pillow kernel when the environment has it, raising
NotImplementedError (on the driver, before any job launches) when it
does not. ``decode="png"`` (round 9) needs NO probe: PNG is fully
decodable with stdlib zlib + numpy scanline unfiltering
(:func:`decode_png` / :func:`encode_png`), so real pixel decode,
resize, and pixel statistics run dependency-free and are oracle-checked
(qd57) — WAV is fully decodable with stdlib ``struct`` (RIFF is a
container, not a codec), so real audio decode, feature extraction, and
decimation run dependency-free too (qd59) — and BASELINE JPEG (round
10) decodes with stdlib bit-reading + a numpy IDCT
(:func:`decode_jpeg` / :func:`encode_jpeg`, oracle-checked via qd67's
per-block-constant exactness property); progressive/arithmetic JPEG,
subsampled chroma, mp3/flac, and video keep the honest capability
guards. Video frame sampling keeps its ffmpeg integration point
stubbed."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal schema: content is opaque bytes; metadata is typed.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Fake on-disk format for tests: b"FAKE" + <u32 width> + <u32 height> + payload
FAKE_MAGIC = b"FAKE"


def _require_pil():
    """Capability probe for the real decode path: returns ``PIL.Image``
    when Pillow is importable, raises NotImplementedError otherwise —
    called on the DRIVER before any job launches, so a missing codec
    fails fast instead of as a mid-job executor error."""
    try:
        from PIL import Image  # noqa: PLC0415 — probed at call time

        return Image
    except ImportError as e:
        raise NotImplementedError(
            "decode='real' requires Pillow (PIL), which this environment "
            "does not provide — use decode='fake' to exercise the plumbing"
        ) from e


def pack_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    return FAKE_MAGIC + struct.pack("<II", width, height) + payload


def _decode_fake(content: bytes) -> tuple[int, int]:
    if content is None or content[:4] != FAKE_MAGIC:
        raise ValueError("not a FAKE image")
    w, h = struct.unpack("<II", content[4:12])
    return w, h


# -- dependency-free PNG codec (round-9, verdict #6) ------------------------
#
# PNG is decodable with nothing but stdlib zlib + numpy: chunks are
# length/type/data/crc records, pixel data is zlib-deflated scanlines,
# each prefixed by one of five byte-difference filters. Supporting the
# non-interlaced 8-bit-depth color types (gray / gray+alpha / RGB /
# RGBA) closes the real-pixel half of the multimodal gap without
# Pillow; JPEG keeps the honest capability guard (entropy coding is a
# codec, not a container format).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(content: bytes):
    if content is None or content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def png_dims(content: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR chunk — the cheap metadata probe
    (no inflate, no unfiltering)."""
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            return int(w), int(h)
        break
    raise ValueError("PNG missing IHDR")


def decode_png(content: bytes) -> "object":
    """Full stdlib PNG decode → ``numpy uint8 (height, width, channels)``.

    Supports non-interlaced, bit-depth-8 gray/gray+alpha/RGB/RGBA (the
    shapes a training pipeline's thumbnails use); palette, 16-bit, and
    Adam7 raise NotImplementedError honestly. Scanline unfiltering
    implements all five PNG filters: None/Up vectorize per row; Sub/
    Average/Paeth are sequential in x by definition (each byte depends
    on the reconstructed byte one pixel left), so they run a per-byte
    loop along the row — rows are short, and the whole kernel sits
    inside an Arrow-batched ``mapInPandas``."""
    import zlib

    import numpy as np

    ihdr = None
    idat = b""
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit_depth={depth} color_type={color} interlace={interlace}"
            " not supported by the stdlib decoder (8-bit non-interlaced"
            " gray/GA/RGB/RGBA only)"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos:pos + stride], dtype=np.uint8).astype(
            np.int32
        )
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else zero
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth: sequential in x by definition
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:  # Sub
                    pred = a
                elif ft == 3:  # Average
                    pred = (a + b) // 2
                elif ft == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter {ft}")
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def encode_png(arr) -> bytes:
    """Minimal stdlib PNG encoder (filter 0 scanlines, one IDAT): the
    write half of the codec — used by resize re-encoding and by the
    deterministic fixture generator the oracle checks against. ``arr``
    is uint8 ``(h, w)`` or ``(h, w, channels in {1,2,3,4})``."""
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("aspect_ratio", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def synthesize_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake-media table from any id column: dims are pure
    functions of the id (width = 64 + id%8·32, height = 64 + id%5·48),
    every 97th row is corrupt bytes. Exists so the multimodal plumbing can
    be driven — and ORACLE-CHECKED, since the decode output is closed-form
    in the id — from the driver's plain parquet tables."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda i: b"CORRUPT"
            if i % 97 == 0
            else pack_fake_image(64 + (i % 8) * 32, 64 + (i % 5) * 48)
        )

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("image").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def extract_image_features(df: DataFrame, *, decode: str = "fake") -> DataFrame:
    """Decode + feature-extract over Arrow batches (``mapInPandas``).

    Batch shape: the kernel sees pandas DataFrames of whole rows; output
    rows are independent of batching (pure per-row kernel), so the operator
    is partition-count invariant — safe to repartition freely at scale.

    ``decode="real"`` probes for Pillow on the driver and decodes actual
    image bytes (PNG/JPEG/…) executor-side; ``decode="png"`` decodes real
    PNG bytes with the dependency-free stdlib codec (:func:`decode_png` —
    dims come from IHDR, no inflate); corrupt media flags the row like
    the fake path.
    """
    if decode not in ("fake", "real", "png"):
        raise ValueError(decode)
    if decode == "real":
        _require_pil()  # fail fast on the driver if the codec is absent

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            import io

            from PIL import Image  # probed on the driver; import per worker

            def dims(content: bytes) -> tuple[int, int]:
                with Image.open(io.BytesIO(content)) as img:
                    return img.width, img.height
        elif decode == "png":
            dims = png_dims
        else:
            dims = _decode_fake
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    w, h = dims(content)
                    out.append((media_id, w, h, w / h if h else None,
                                len(content), True))
                except Exception:  # noqa: BLE001 — corrupt media → flagged row
                    out.append((media_id, None, None, None,
                                len(content) if content is not None else None, False))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "aspect_ratio",
                              "n_bytes", "decode_ok"]
            )

    return df.select("media_id", "content").mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_side: int, *, decode: str = "fake") -> DataFrame:
    """Resize plumbing: recompute target dims (aspect-preserving clamp to
    ``max_side``) and re-encode. Fake path rewrites the fake header; the
    real path runs Pillow's resize when the capability probe finds it
    (re-encoded as PNG — lossless, format-independent); the ``png`` path
    decodes with the stdlib codec, nearest-neighbor resamples in numpy,
    and re-encodes with :func:`encode_png` — real pixels, zero
    dependencies."""
    if decode not in ("fake", "real", "png"):
        raise ValueError(decode)
    if decode == "real":
        _require_pil()

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            import io

            from PIL import Image

            def shrink(content: bytes) -> tuple[bytes, int, int]:
                with Image.open(io.BytesIO(content)) as img:
                    w, h = img.width, img.height
                    scale = min(1.0, max_side / max(w, h)) if max(w, h) else 1.0
                    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                    buf = io.BytesIO()
                    img.resize((nw, nh)).save(buf, format="PNG")
                    return buf.getvalue(), nw, nh
        elif decode == "png":
            import numpy as np

            def shrink(content: bytes) -> tuple[bytes, int, int]:
                arr = decode_png(content)
                h, w = arr.shape[:2]
                scale = min(1.0, max_side / max(w, h)) if max(w, h) else 1.0
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                ys = (np.arange(nh) * (h / nh)).astype(int)
                xs = (np.arange(nw) * (w / nw)).astype(int)
                return encode_png(arr[ys][:, xs]), nw, nh
        else:

            def shrink(content: bytes) -> tuple[bytes, int, int]:
                w, h = _decode_fake(content)
                scale = min(1.0, max_side / max(w, h)) if max(w, h) else 1.0
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                return pack_fake_image(nw, nh), nw, nh

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rows.append((media_id, *shrink(content)))
                except Exception:  # noqa: BLE001
                    rows.append((media_id, None, None, None))
            yield pd.DataFrame(rows, columns=["media_id", "content", "width", "height"])

    return df.select("media_id", "content").mapInPandas(kernel, out_schema)


def synthesize_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-PNG media table from any id column: each row is
    an actual RGB PNG (stdlib-encoded) whose pixel values are the
    closed-form ``(id + 3*y + 5*x + 7*c) % 256`` over a
    ``(16 + id%5) x (16 + id%8)`` gradient — so pixel statistics are
    exact integer formulas an SQL oracle can replay (qd57). Every 97th
    row is corrupt bytes, like the fake generator."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            if i % 97 == 0:
                return b"CORRUPT"
            h, w = 16 + int(i) % 5, 16 + int(i) % 8
            y, x, c = np.ogrid[0:h, 0:w, 0:3]
            arr = ((int(i) + 3 * y + 5 * x + 7 * c) % 256).astype(np.uint8)
            return encode_png(arr)

        return ids.map(one)

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("image").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("png").alias("format"),
        ).alias("meta"),
    )


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_mean", T.DoubleType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_pixel_stats(df: DataFrame, *, decode: str = "png") -> DataFrame:
    """REAL pixel statistics per image — the feature extraction that
    needs actual decoded pixels (not just container metadata): sum/mean/
    min/max over all samples, plus dims and channel count. ``png`` and
    ``jpeg`` run the dependency-free stdlib codecs; ``real`` uses Pillow
    when present. Integer sums make the mean an exact ratio —
    engine-portable, so the qd57/qd67 oracles replay it from the
    fixtures' closed forms. Corrupt or unsupported media flags the row
    instead of failing the job."""
    if decode not in ("png", "jpeg", "real"):
        raise ValueError(decode)
    if decode == "real":
        _require_pil()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if decode == "real":
            import io

            from PIL import Image

            def pixels(content: bytes):
                with Image.open(io.BytesIO(content)) as img:
                    arr = np.asarray(img, dtype=np.uint8)
                return arr if arr.ndim == 3 else arr[:, :, None]
        elif decode == "jpeg":

            def pixels(content: bytes):
                return decode_jpeg(content)
        else:

            def pixels(content: bytes):
                return decode_png(content)

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    arr = pixels(content)
                    h, w, ch = arr.shape
                    s = int(arr.sum(dtype=np.int64))
                    rows.append(
                        (media_id, w, h, ch, s, round(s / arr.size, 6),
                         int(arr.min()), int(arr.max()), True)
                    )
                except Exception:  # noqa: BLE001 — corrupt media → flagged row
                    rows.append(
                        (media_id, None, None, None, None, None, None, None,
                         False)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels",
                         "pixel_sum", "pixel_mean", "pixel_min", "pixel_max",
                         "decode_ok"],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, PIXEL_STATS_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, *, decode: str = "fake"
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (explodes duration/every_ms rows per video). Fake path synthesizes
    frame ids from metadata; real path is the ffmpeg integration point."""
    if decode == "real":
        raise NotImplementedError("real frame sampling requires ffmpeg")
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
        )
        .withColumn("timestamp_ms", F.col("frame_index") * every_ms)
    )


# -- dependency-free WAV codec (round 9) -------------------------------------
#
# RIFF/WAVE PCM is a pure container format — no entropy coding — so like
# PNG it decodes with nothing but stdlib ``struct``: a RIFF header, an
# ``fmt `` chunk (format tag / channels / rate / bit depth), and a
# ``data`` chunk of little-endian PCM samples. Supporting 16-bit mono
# PCM (the shape a speech/training pipeline normalizes to anyway) closes
# the real-decode half of the AUDIO gap with zero dependencies; mp3/flac
# keep the honest capability guard (those are codecs, not containers).

_RIFF_MAGIC = b"RIFF"
_WAVE_MAGIC = b"WAVE"


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal stdlib WAV encoder: 16-bit mono PCM, one ``data`` chunk.
    ``samples`` is any int sequence in [-32768, 32767]; out-of-range
    values raise (an int16 cast would silently wrap them — or raise
    OverflowError on newer numpy, an inconsistent failure mode)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.size and (int(arr.min()) < -32768 or int(arr.max()) > 32767):
        raise ValueError("WAV samples out of int16 range [-32768, 32767]")
    pcm = arr.astype(np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        _WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return _RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes):
    """Full stdlib WAV decode → ``(numpy int16 samples, sample_rate)``.

    Walks the RIFF chunk list (tolerating extra chunks like ``LIST``),
    validates PCM/16-bit/mono in ``fmt ``, and reads ``data`` verbatim.
    Compressed format tags (mp3/adpcm/float) raise NotImplementedError
    honestly — they are codecs, not containers."""
    import numpy as np

    if content is None or content[:4] != _RIFF_MAGIC or content[8:12] != _WAVE_MAGIC:
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(content):
        ctype = content[pos:pos + 4]
        (length,) = struct.unpack("<I", content[pos + 4:pos + 8])
        chunk = content[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated WAV chunk")
        if ctype == b"fmt ":
            fmt = chunk
        elif ctype == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:  # struct.error here would leak an undocumented type
        raise ValueError("malformed fmt chunk")
    tag, channels, rate, _bps, _align, depth = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1 or depth != 16 or channels != 1:
        raise NotImplementedError(
            f"WAV format_tag={tag} channels={channels} bit_depth={depth} not"
            " supported by the stdlib decoder (16-bit mono PCM only)"
        )
    return np.frombuffer(data, dtype="<i2"), int(rate)


def synthesize_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-WAV media table from any id column: each row is
    an actual 8 kHz 16-bit mono PCM WAV whose samples follow the closed
    form ``((id*7 + n*13) % 4096) - 2048`` over ``64 + id%32`` samples —
    so decoded amplitude statistics are exact integer formulas an SQL
    oracle can replay (qd59). Every 97th row is corrupt bytes, like the
    image generators."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            if i % 97 == 0:
                return b"CORRUPT"
            n = 64 + int(i) % 32
            s = (int(i) * 7 + np.arange(n, dtype=np.int64) * 13) % 4096 - 2048
            return encode_wav(s, sample_rate=8000)

        return ids.map(one)

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("audio").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("wav").alias("format"),
        ).alias("meta"),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("amp_sum", T.LongType(), True),
        T.StructField("energy", T.LongType(), True),
        T.StructField("amp_min", T.IntegerType(), True),
        T.StructField("amp_max", T.IntegerType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def audio_features(df: DataFrame, *, decode: str = "wav") -> DataFrame:
    """REAL audio feature extraction per clip — the statistics a speech
    pipeline filters on (silence, clipping, activity): amplitude sum,
    energy (sum of squared samples), min/max, and strict zero-crossing
    count (adjacent samples with opposite sign; a zero sample breaks a
    crossing). All-integer reductions make every feature engine-portable,
    so the qd59 oracle replays them from the fixture's closed form.
    Corrupt or unsupported media flags the row instead of failing the
    job. ``decode='wav'`` is the dependency-free stdlib path; other
    codecs would plug in behind the same kernel seam."""
    if decode != "wav":
        raise NotImplementedError(
            "only the stdlib WAV decoder is available in this environment"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    s, rate = decode_wav(content)
                    w = s.astype(np.int64)
                    rows.append(
                        (
                            media_id,
                            rate,
                            len(s),
                            int(len(s) * 1000 // rate),
                            int(w.sum()),
                            int((w * w).sum()),
                            int(w.min()) if len(w) else None,
                            int(w.max()) if len(w) else None,
                            int(np.count_nonzero(w[:-1] * w[1:] < 0)),
                            True,
                        )
                    )
                except Exception:  # noqa: BLE001 — corrupt media → flagged row
                    rows.append(
                        (media_id, None, None, None, None, None, None, None,
                         None, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "duration_ms",
                         "amp_sum", "energy", "amp_min", "amp_max",
                         "zero_crossings", "decode_ok"],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, AUDIO_FEATURE_SCHEMA
    )


def downsample_audio(df: DataFrame, factor: int) -> DataFrame:
    """Integer-factor decimation (every ``factor``-th sample, rate/factor)
    through a full decode → slice → re-encode round trip — the audio
    analogue of ``resize_images``. Returns (media_id, content, sample_rate,
    n_samples); corrupt rows null out. A real pipeline would low-pass
    first; plain decimation keeps the kernel exact for the round-trip
    tests."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    s, rate = decode_wav(content)
                    out = s[::factor]
                    new_rate = max(rate // factor, 1)
                    rows.append(
                        (media_id, encode_wav(out, new_rate), new_rate, len(out))
                    )
                except Exception:  # noqa: BLE001
                    rows.append((media_id, None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "sample_rate", "n_samples"]
            )

    return df.select("media_id", "content").mapInPandas(kernel, out_schema)


# -- dependency-free baseline JPEG codec (round 10) ---------------------------
#
# Baseline sequential DCT JPEG (ITU-T T.81) decodes with nothing but
# stdlib bit twiddling + a numpy float64 IDCT: marker parse → DQT/DHT
# tables → Huffman-decoded (DC diff, AC run-length) coefficients →
# dequantize → de-zigzag → IDCT → level shift. The qd57/qd59
# methodology applies unchanged: the fixture encoder writes REAL
# baseline bitstreams whose 8×8 blocks are CONSTANT, for which the DCT
# is exactly its DC coefficient — so decode is bit-exact and an SQL
# oracle replays the pixel statistics from the closed form (lossy JPEG
# is exactly lossless on per-block-constant images under unit quant
# tables). Progressive (SOF2), arithmetic coding, 12-bit precision, and
# chroma subsampling keep honest NotImplementedError guards.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard Huffman tables (T.81 Annex K.3) — (BITS counts for code
# lengths 1..16, symbol values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits, vals):
    """Canonical Huffman assignment (T.81 C.2): symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    d = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    d[0, :] /= np.sqrt(2.0)
    return d  # F = D f Dᵀ ; f = Dᵀ F D


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


class _JpegBitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if not self.n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:  # a marker inside entropy data — stream overran
                    raise ValueError("unexpected marker in JPEG entropy data")
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Align to the next RSTn marker and consume it."""
        self.n = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing JPEG restart marker")


def _finish_planes(planes, comps, hmax, vmax, fh, fw):
    """Upsample subsampled planes by replication, crop to frame dims,
    stack, and convert 3-component YCbCr → RGB (shared by the baseline
    and progressive reconstruction paths)."""
    import numpy as np

    full = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(
                np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(p[:fh, :fw])
    arr = np.stack(full, axis=2)
    if len(comps) == 3:  # JFIF YCbCr → RGB
        y = arr[:, :, 0].astype(np.float64)
        cb = arr[:, :, 1].astype(np.float64) - 128.0
        cr = arr[:, :, 2].astype(np.float64) - 128.0
        rgb = np.stack(
            [y + 1.402 * cr,
             y - 0.344136 * cb - 0.714136 * cr,
             y + 1.772 * cb],
            axis=2,
        )
        arr = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return arr


def _comp_block_grid(frame, hs: int, vs: int):
    """Non-interleaved block grid of one component: ``ceil`` of its OWN
    sampled dimensions over 8 (T.81 A.2.2) — NOT padded to MCU
    multiples the way the interleaved store is."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    cw = -(-fw * hs // hmax)
    ch = -(-fh * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past entropy data to the next real marker (skipping
    stuffed 0x00 and RSTn)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    raise ValueError("JPEG entropy data ran off the end of the stream")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(w: _JpegBitWriter, coefs, prev_dc: int,
                  dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzagged coefficient block; returns its DC."""
    dc = int(coefs[0])
    diff = dc - prev_dc
    cat = _category(diff)
    code, ln = dc_codes[cat]
    w.write(code, ln)
    if cat:
        w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last = 63
    while last > 0 and coefs[last] == 0:
        last -= 1
    for i in range(1, last + 1):
        v = int(coefs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_codes[(run << 4) | cat]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _decode_block(r: _JpegBitReader, prev_dc: int, dc_tbl, ac_tbl):
    """Huffman-decode one block → (zigzagged int64 array, dc)."""
    import numpy as np

    def read_symbol(tbl):
        code, ln = 0, 0
        while True:
            code = (code << 1) | r.bit()
            ln += 1
            if ln > 16:
                raise ValueError("invalid JPEG Huffman code")
            sym = tbl.get((code, ln))
            if sym is not None:
                return sym

    def extend(v: int, cat: int) -> int:
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    out = np.zeros(64, dtype=np.int64)
    cat = read_symbol(dc_tbl)
    diff = extend(r.bits(cat), cat) if cat else 0
    dc = prev_dc + diff
    out[0] = dc
    i = 1
    while i < 64:
        sym = read_symbol(ac_tbl)
        if sym == 0x00:  # EOB
            break
        run, cat = sym >> 4, sym & 0xF
        if cat == 0:
            if run != 15:
                raise ValueError("invalid JPEG AC symbol")
            i += 16  # ZRL
            continue
        i += run
        if i > 63:
            raise ValueError("JPEG AC run overflows block")
        out[i] = extend(r.bits(cat), cat)
        i += 1
    return out, dc


def _read_ac_symbol(r: _JpegBitReader, tbl):
    code, ln = 0, 0
    while True:
        code = (code << 1) | r.bit()
        ln += 1
        if ln > 16:
            raise ValueError("invalid JPEG Huffman code")
        sym = tbl.get((code, ln))
        if sym is not None:
            return sym


def _decode_progressive_scan(
    content, pos, frame, scan, huff, restart, store, prog_state
):
    """Decode ONE progressive (SOF2) scan into the per-component
    coefficient store (T.81 Annex G.2 / the libjpeg
    ``decode_mcu_DC_first/refine`` + ``decode_mcu_AC_first/refine``
    quartet): DC scans are interleaved over the MCU grid and build the
    DC coefficient ``ah → al`` bit by bit; AC scans are single-component
    over that component's OWN block grid, carrying an EOB-run across
    blocks, and refinement scans weave correction bits for
    already-nonzero coefficients between the newly-significant ones.
    Returns the stream position of the next marker."""
    fh, fw, comps = frame
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    members = scan["comps"]  # list of (ci, td, ta) in scan order
    r = _JpegBitReader(content, pos)

    def refine_nonzero(block, k):
        if r.bit():
            cur = int(block[k])
            if cur > 0 and not (cur & (1 << al)):
                block[k] = cur + (1 << al)
            elif cur < 0 and not (-cur & (1 << al)):
                block[k] = cur - (1 << al)

    def extend(v: int, cat: int) -> int:
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("invalid progressive scan (DC with se != 0)")
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if len(members) == 1:
            ci = members[0][0]
            _, hs, vs, _ = comps[ci]
            nby, nbx = _comp_block_grid(frame, hs, vs)
            units = [(ci, by, bx) for by in range(nby) for bx in range(nbx)]
            per_mcu = [units[i:i + 1] for i in range(len(units))]
        else:
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            per_mcu = []
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for ci, td, ta in members:
                        _, hs, vs, _ = comps[ci]
                        for byy in range(vs):
                            for bxx in range(hs):
                                mcu.append(
                                    (ci, my * vs + byy, mx * hs + bxx)
                                )
                    per_mcu.append(mcu)
        tds = {ci: td for ci, td, ta in members}
        prev = {ci: 0 for ci, _, _ in members}
        n_mcu = 0
        for mcu in per_mcu:
            if restart and n_mcu and n_mcu % restart == 0:
                r.restart()
                prev = {ci: 0 for ci in prev}
            n_mcu += 1
            for ci, by, bx in mcu:
                block = store[ci][by, bx]
                if ah == 0:  # first DC scan
                    cat = _read_ac_symbol(r, huff[(0, tds[ci])])
                    diff = extend(r.bits(cat), cat) if cat else 0
                    prev[ci] += diff
                    block[0] = prev[ci] << al
                else:  # DC refinement: one bit per block
                    if r.bit():
                        block[0] = int(block[0]) | (1 << al)
        return _skip_to_marker(content, r.pos)

    # AC scan: exactly one component (T.81 G.1.1.1.1)
    if len(members) != 1:
        raise ValueError("invalid progressive scan (interleaved AC)")
    ci, td, ta = members[0]
    _, hs, vs, _ = comps[ci]
    nby, nbx = _comp_block_grid(frame, hs, vs)
    ac_tbl = huff[(1, ta)]
    eobrun = 0
    n_blk = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart and n_blk and n_blk % restart == 0:
                r.restart()
                eobrun = 0
            n_blk += 1
            block = store[ci][by, bx]
            if ah == 0:  # first scan for these coefficients
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _read_ac_symbol(r, ac_tbl)
                    run, s = sym >> 4, sym & 0xF
                    if s == 0:
                        if run != 15:
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += r.bits(run)
                            break
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > se:
                        raise ValueError("JPEG AC run overflows band")
                    block[k] = extend(r.bits(s), s) << al
                    k += 1
            else:  # AC refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _read_ac_symbol(r, ac_tbl)
                        run, s = sym >> 4, sym & 0xF
                        newval = 0
                        if s == 0:
                            if run != 15:
                                eobrun = 1 << run
                                if run:
                                    eobrun += r.bits(run)
                                break
                            # ZRL: pass 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise ValueError(
                                    "invalid JPEG AC refinement symbol"
                                )
                            newval = (1 << al) if r.bit() else -(1 << al)
                        while k <= se:
                            if block[k] != 0:
                                refine_nonzero(block, k)
                            else:
                                if run == 0:
                                    break
                                run -= 1
                            k += 1
                        if s:
                            if k > se:
                                raise ValueError(
                                    "JPEG AC refinement overflows band"
                                )
                            block[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if block[k] != 0:
                            refine_nonzero(block, k)
                        k += 1
                    eobrun -= 1
    return _skip_to_marker(content, r.pos)


def _encode_jpeg_progressive(
    padded, h, w, nc, samp, qz, sub420, ph, pw, d, zz, dc_codes, ac_codes
) -> bytes:
    """Progressive (SOF2) emission for :func:`encode_jpeg` — the test
    oracle for the progressive decoder (same quantized coefficients as
    a baseline encode, so progressive-decode must equal baseline-decode
    pixel-for-pixel). Scan script: DC first at al=1 + DC refinement,
    then per component AC bands (1–5, 6–63) at al=1 followed by their
    al=0 refinements — exercising spectral selection, successive
    approximation, EOB-runs across blocks, ZRL-in-refinement, and the
    correction-bit (BE) buffering of T.81 Annex G (the libjpeg
    ``encode_mcu_AC_refine`` algorithm, ported faithfully — including
    the subtle invariant that a ZRL must be emitted at the FIRST
    nonzero magnitude once 15 zeros are pending inside the EOB range,
    or buffered correction bits would desynchronize the decoder's
    skip-advance)."""
    import numpy as np

    def seg(marker: int, payload: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(payload) + 2)
            + payload
        )

    # Progressive AC scans need EOBn symbols (rr << 4, rr = 1..14) that
    # the baseline Annex-K AC table does not define — emit a custom DHT:
    # every symbol we can produce at a flat 8-bit code (176 codes < 255,
    # a legal canonical table; compression is irrelevant here)
    prog_ac_vals = (
        [rr << 4 for rr in range(15)]
        + [0xF0]
        + [(run << 4) | s for run in range(16) for s in range(1, 11)]
    )
    prog_ac_bits = [0] * 16
    prog_ac_bits[7] = len(prog_ac_vals)
    ac_codes = _huff_codes(prog_ac_bits, prog_ac_vals)

    arrays = []
    for plane in padded:
        vcells, hcells = plane.shape[0] // 8, plane.shape[1] // 8
        a = np.zeros((vcells, hcells, 64), dtype=np.int64)
        for by in range(vcells):
            for bx in range(hcells):
                co = d @ plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] @ d.T
                zq = co.reshape(64)[zz] / qz
                a[by, bx] = (
                    np.floor(np.abs(zq) + 0.5) * np.sign(zq)
                ).astype(np.int64)
        arrays.append(a)

    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qz))
        + seg(
            0xC2,
            struct.pack(">BHHB", 8, h, w, nc)
            + b"".join(bytes([cid + 1, samp[cid], 0]) for cid in range(nc)),
        )
        + seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(
            0xC4,
            bytes([0x10]) + bytes(prog_ac_bits) + bytes(prog_ac_vals),
        )
    )

    def sos_seg(members, ss, se, ah, al):
        return seg(
            0xDA,
            bytes([len(members)])
            + b"".join(bytes([ci + 1, 0x00]) for ci in members)
            + bytes([ss, se, (ah << 4) | al]),
        )

    if sub420:
        mcu_blocks = []
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                units = [
                    (0, (my + by) // 8, (mx + bx) // 8)
                    for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8))
                ]
                units += [(1, my // 16, mx // 16), (2, my // 16, mx // 16)]
                mcu_blocks.append(units)
    else:
        mcu_blocks = [
            [(ci, by // 8, bx // 8) for ci in range(nc)]
            for by in range(0, ph, 8)
            for bx in range(0, pw, 8)
        ]

    def emit_dc_first(al):
        bw = _JpegBitWriter()
        prev = [0] * nc
        for units in mcu_blocks:
            for ci, by, bx in units:
                v = int(arrays[ci][by, bx, 0]) >> al
                diff = v - prev[ci]
                prev[ci] = v
                cat = _category(diff)
                code, ln = dc_codes[cat]
                bw.write(code, ln)
                if cat:
                    bw.write(
                        diff if diff >= 0 else diff + (1 << cat) - 1, cat
                    )
        return sos_seg(range(nc), 0, 0, 0, al) + bw.flush()

    def emit_dc_refine(ah, al):
        bw = _JpegBitWriter()
        for units in mcu_blocks:
            for ci, by, bx in units:
                bw.write((int(arrays[ci][by, bx, 0]) >> al) & 1, 1)
        return sos_seg(range(nc), 0, 0, ah, al) + bw.flush()

    def comp_blocks(ci):
        if sub420 and ci > 0:
            ch, cw = -(-h // 2), -(-w // 2)
        else:
            ch, cw = h, w
        nby, nbx = -(-ch // 8), -(-cw // 8)
        return [arrays[ci][by, bx] for by in range(nby) for bx in range(nbx)]

    def emit_ac_first(ci, lo, hi, al):
        bw = _JpegBitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rr = eobrun.bit_length() - 1
                code, ln = ac_codes[rr << 4]
                bw.write(code, ln)
                if rr:
                    bw.write(eobrun - (1 << rr), rr)
                eobrun = 0

        for block in comp_blocks(ci):
            run = 0
            for k in range(lo, hi + 1):
                v = int(block[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                cat = t.bit_length()
                code, ln = ac_codes[(run << 4) | cat]
                bw.write(code, ln)
                sv = t if v >= 0 else -t
                bw.write(sv if sv >= 0 else sv + (1 << cat) - 1, cat)
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return sos_seg([ci], lo, hi, 0, al) + bw.flush()

    def emit_ac_refine(ci, lo, hi, ah, al):
        bw = _JpegBitWriter()
        eobrun = 0
        be_bits: list[int] = []

        def flush_eob():
            nonlocal eobrun, be_bits
            if eobrun:
                rr = eobrun.bit_length() - 1
                code, ln = ac_codes[rr << 4]
                bw.write(code, ln)
                if rr:
                    bw.write(eobrun - (1 << rr), rr)
                eobrun = 0
                for b in be_bits:
                    bw.write(b, 1)
                be_bits = []

        for block in comp_blocks(ci):
            absvals = [abs(int(block[k])) >> al for k in range(lo, hi + 1)]
            eob_idx = -1
            for idx, t in enumerate(absvals):
                if t == 1:
                    eob_idx = idx
            run = 0
            br: list[int] = []
            for idx, t in enumerate(absvals):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and idx <= eob_idx:
                    flush_eob()
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                    for b in br:
                        bw.write(b, 1)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                flush_eob()
                code, ln = ac_codes[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if int(block[lo + idx]) >= 0 else 0, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                be_bits.extend(br)
                if eobrun == 0x7FFF or len(be_bits) > 900:
                    flush_eob()
        flush_eob()
        return sos_seg([ci], lo, hi, ah, al) + bw.flush()

    out = [head, emit_dc_first(1), emit_dc_refine(1, 0)]
    bands = ((1, 5), (6, 63))
    for ci in range(nc):
        for lo, hi in bands:
            out.append(emit_ac_first(ci, lo, hi, 1))
    for ci in range(nc):
        for lo, hi in bands:
            out.append(emit_ac_refine(ci, lo, hi, 1, 0))
    return b"".join(out) + b"\xff\xd9"


def encode_jpeg(
    pixels, quant=None, subsampling: str = "444", progressive: bool = False
) -> bytes:
    """Minimal REAL baseline-JPEG encoder: 8-bit, standard Annex-K
    Huffman tables, one interleaved scan — or, with
    ``progressive=True``, a REAL progressive (SOF2) bitstream with a
    spectral-selection + successive-approximation scan script
    (:func:`_encode_jpeg_progressive`); the quantized coefficients are
    identical either way, so the two decodes agree pixel-for-pixel.
    Input is a 2-d grayscale array (one component) or an (h, w, 3) RGB
    array (encoded as JFIF YCbCr, three components). ``subsampling``
    selects ``"444"``
    (default — every component full resolution) or ``"420"`` (RGB only:
    Y at 2×2 sampling, chroma averaged over 2×2 pixel tiles — the
    layout the overwhelming majority of real-world JPEGs use, 16×16
    interleaved MCUs). ``quant`` defaults to the all-ones table, under
    which images whose blocks are constant round-trip EXACTLY (their
    DCT is a lone integer DC coefficient) — the property the qd67/qd70
    oracles ride: per-8×8-constant grayscale for 4:4:4, and
    per-16×16-constant ACHROMATIC (r=g=b) RGB for 4:2:0, where the
    color transform is also exact (y = v, cb = cr = 128). Arbitrary
    images encode fine too (quantization then rounds coefficients,
    ordinary lossy JPEG)."""
    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420': {subsampling}")
    pix = np.asarray(pixels, dtype=np.uint8)
    if pix.ndim == 2:
        comps = [pix.astype(np.float64)]
        subsampling = "444"  # one component: nothing to subsample
    elif pix.ndim == 3 and pix.shape[2] == 3:
        r = pix[:, :, 0].astype(np.float64)
        g = pix[:, :, 1].astype(np.float64)
        b = pix[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [np.clip(np.floor(c + 0.5), 0, 255) for c in (y, cb, cr)]
    else:
        raise ValueError("encode_jpeg expects (h, w) gray or (h, w, 3) RGB")
    h, w = pix.shape[:2]
    q = np.ones((8, 8), dtype=np.int64) if quant is None else np.asarray(
        quant, dtype=np.int64
    )
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 8x8 with entries in [1, 255]")
    sub420 = subsampling == "420"
    mcu = 16 if sub420 else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = [
        np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge") for c in comps
    ]
    if sub420:
        # chroma averaged over 2x2 pixel tiles, then rounded — exact
        # for tiles the chroma is constant over (the qd70 fixture)
        for ci in (1, 2):
            sub = padded[ci].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            padded[ci] = np.floor(sub + 0.5)
    padded = [p - 128.0 for p in padded]
    d = _dct_matrix()
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz = np.array(_ZIGZAG)
    qz = q.reshape(64)[zz]
    nc = len(comps)
    samp = [0x22, 0x11, 0x11] if sub420 else [0x11] * nc
    if progressive:
        return _encode_jpeg_progressive(
            padded, h, w, nc, samp, qz, sub420, ph, pw, d, zz,
            dc_codes, ac_codes,
        )
    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qz))
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, nc)
            + b"".join(bytes([cid + 1, samp[cid], 0]) for cid in range(nc)),
        )
        + seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
        + seg(
            0xDA,
            bytes([nc])
            + b"".join(bytes([cid + 1, 0x00]) for cid in range(nc))
            + bytes([0, 63, 0]),
        )
    )
    bw = _JpegBitWriter()
    prev = [0] * nc

    def put(ci: int, plane, by: int, bx: int) -> None:
        block = plane[by:by + 8, bx:bx + 8]
        coefs = d @ block @ d.T
        zq = coefs.reshape(64)[zz] / qz
        ints = np.floor(np.abs(zq) + 0.5) * np.sign(zq)
        prev[ci] = _encode_block(
            bw, ints.astype(np.int64), prev[ci], dc_codes, ac_codes
        )

    if sub420:
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                # 4 Y data units in raster order, then Cb, Cr (A.2.3)
                for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                    put(0, padded[0], my + by, mx + bx)
                put(1, padded[1], my // 2, mx // 2)
                put(2, padded[2], my // 2, mx // 2)
    else:
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci, plane in enumerate(padded):
                    put(ci, plane, by, bx)
    return head + bw.flush() + b"\xff\xd9"


def encode_jpeg_gray(pixels, quant=None) -> bytes:
    """Grayscale alias of :func:`encode_jpeg` (the qd67 fixture path)."""
    import numpy as np

    pix = np.asarray(pixels, dtype=np.uint8)
    if pix.ndim != 2:
        raise ValueError("encode_jpeg_gray expects a 2-d grayscale array")
    return encode_jpeg(pix, quant)


def decode_jpeg(content: bytes):
    """Full dependency-free JPEG decode → (h, w, ch) uint8: baseline
    sequential DCT (SOF0) AND progressive DCT (SOF2).

    Supports 8-bit grayscale or 3-component YCbCr → RGB per JFIF —
    4:4:4 AND chroma-subsampled frames with sampling factors up to 2×2
    (4:2:0 / 4:2:2 / 4:4:0, interleaved MCU layout, chroma upsampled by
    pixel replication) — restart intervals, 0xFF fill-byte runs and
    standalone TEM/RST markers, and multiple DQT/DHT segments.
    Progressive files decode through the full T.81 Annex G scan
    machinery (:func:`_decode_progressive_scan`): spectral selection,
    successive approximation for DC and AC, EOB-runs, and refinement
    correction bits, accumulated into a coefficient store and
    reconstructed once at EOI. The extended/lossless/hierarchical SOF
    variants, arithmetic coding (DAC), 12-bit precision, sampling
    factors beyond 2×2, and non-interleaved multi-scan BASELINE files
    raise NotImplementedError honestly — they are different entropy/
    scan structures, not containers."""
    import numpy as np

    if content is None or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    quant: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    progressive = False
    store = None  # per-component coefficient arrays (progressive)
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        # spec-valid streams may pad with runs of 0xFF fill bytes before
        # a marker code (B.1.1.2) — skip to the last 0xFF of the run
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(content):
            raise ValueError("truncated JPEG segment")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers with no length field
            pos += 2
            continue
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG segment")
        (ln,) = struct.unpack(">H", content[pos + 2:pos + 4])
        body = content[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + ln
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq:
                    raise NotImplementedError("16-bit JPEG quant tables")
                if b + 65 > len(body):
                    raise ValueError("malformed JPEG quant segment")
                quant[tq] = np.frombuffer(
                    body[b + 1:b + 65], dtype=np.uint8
                ).astype(np.int64)
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                nv = sum(bits)
                vals = list(body[b + 17:b + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("malformed JPEG Huffman segment")
                huff[(tc, th)] = {
                    (c, l): s for s, (c, l) in _huff_codes(bits, vals).items()
                }
                b += 17 + nv
        elif marker in (0xC0, 0xC2):
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        "JPEG sampling factors beyond 2x2"
                    )
                comps.append((cid, hs, vs, tq))
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if any(hmax % hs or vmax % vs for _, hs, vs, _ in comps):
                raise NotImplementedError(
                    "non-integer JPEG subsampling ratios"
                )
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})"
            )
        elif marker == 0xCC:
            raise NotImplementedError("arithmetic-coded JPEG")
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            fh, fw, comps = frame
            ns = body[0]
            tables = {}
            for s in range(ns):
                cs, tdta = body[1 + 2 * s], body[2 + 2 * s]
                tables[cs] = (tdta >> 4, tdta & 0xF)
            if progressive:
                if len(body) < 1 + 2 * ns + 3:
                    raise ValueError("malformed JPEG scan header")
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
                members = []
                for s in range(ns):
                    cs = body[1 + 2 * s]
                    if cs not in cid_to_ci:
                        raise ValueError("JPEG scan names unknown component")
                    members.append(
                        (cid_to_ci[cs], tables[cs][0], tables[cs][1])
                    )
                if store is None:
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    mcux = -(-fw // (8 * hmax))
                    mcuy = -(-fh // (8 * vmax))
                    store = [
                        np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                        for _, hs, vs, _ in comps
                    ]
                pos = _decode_progressive_scan(
                    content, pos, frame,
                    {"ss": ss, "se": se, "ah": ahal >> 4, "al": ahal & 0xF,
                     "comps": members},
                    huff, restart, store, None,
                )
                continue
            if ns != len(comps):
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG"
                )
            if len(comps) == 1:
                # a single-component scan's MCU is ONE data unit and
                # sampling factors are irrelevant (A.2.2) — normalize
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            r = _JpegBitReader(content, pos)
            d = _dct_matrix()
            zz = np.array(_ZIGZAG)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            planes = [
                np.empty((mcuy * vs * 8, mcux * hs * 8), dtype=np.uint8)
                for _, hs, vs, _ in comps
            ]
            prev = [0] * len(comps)
            n_mcu = 0
            for my_ in range(mcuy):
                for mx_ in range(mcux):
                    if restart and n_mcu and n_mcu % restart == 0:
                        r.restart()
                        prev = [0] * len(comps)
                    n_mcu += 1
                    for ci, (cid, hs, vs, tq) in enumerate(comps):
                        td, ta = tables[cid]
                        # hs*vs data units per MCU, raster order (A.2.3)
                        for byy in range(vs):
                            for bxx in range(hs):
                                coefs, prev[ci] = _decode_block(
                                    r, prev[ci], huff[(0, td)], huff[(1, ta)]
                                )
                                deq = coefs * quant[tq]
                                block = np.zeros(64, dtype=np.float64)
                                block[zz] = deq
                                f = d.T @ block.reshape(8, 8) @ d
                                pix = np.clip(
                                    np.floor(f + 128.0 + 0.5), 0, 255
                                ).astype(np.uint8)
                                yb = (my_ * vs + byy) * 8
                                xb = (mx_ * hs + bxx) * 8
                                planes[ci][yb:yb + 8, xb:xb + 8] = pix
            # chroma upsampling by pixel replication (nearest): exact on
            # the per-tile-constant oracle fixtures
            return _finish_planes(planes, comps, hmax, vmax, fh, fw)
        # APPn/COM/unknown: skipped
    if progressive and store is not None:
        return _reconstruct_progressive(frame, store, quant)
    raise ValueError("JPEG has no scan data")


def _reconstruct_progressive(frame, store, quant):
    """Dequantize + de-zigzag + IDCT the accumulated progressive
    coefficient store (vectorized over every block of each component),
    then upsample/crop/color-convert exactly like the baseline path."""
    import numpy as np

    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    d = _dct_matrix()
    zz = np.array(_ZIGZAG)
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError("JPEG scan references missing quant table")
        co = store[ci].astype(np.float64) * quant[tq][None, None, :]
        nat = np.zeros_like(co)
        nat[..., zz] = co
        nby, nbx = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(nby, nbx, 8, 8)
        f = np.einsum("ij,abjk,kl->abil", d.T, blocks, d)
        pix = np.clip(np.floor(f + 128.0 + 0.5), 0, 255).astype(np.uint8)
        planes.append(pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
    return _finish_planes(planes, comps, hmax, vmax, fh, fw)


def synthesize_jpeg420_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL 4:2:0-JPEG media table: each row is an actual
    chroma-subsampled baseline-JPEG bitstream (3-component YCbCr, Y at
    2×2 sampling, 16×16 interleaved MCUs, unit quant) whose 16×16 tiles
    are constant ACHROMATIC gray ``v = (id*5 + tx*3 + ty*7) % 256`` for
    tile column ``tx``/row ``ty``. Achromatic per-tile-constant images
    are a LOSSLESS fixed point of 4:2:0 JPEG under unit quantization:
    the color transform is exact (y = v, cb = cr = 128), every Y block
    and every averaged chroma block is constant, and replication
    upsampling restores the constants — so each decoded pixel equals
    the closed form of its tile and an SQL oracle replays the
    statistics (qd70). Dimensions are deliberately NOT multiples of 16
    (h = 21 + id%11, w = 25 + id%13), so encoder MCU padding and
    decoder cropping of partial MCUs is exercised. Every 97th row is
    corrupt bytes, like the other media generators."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            if i % 97 == 0:
                return b"CORRUPT"
            h, w = 21 + int(i) % 11, 25 + int(i) % 13
            ty, tx = np.indices((h, w)) // 16
            v = ((int(i) * 5 + tx * 3 + ty * 7) % 256).astype(np.uint8)
            return encode_jpeg(np.stack([v, v, v], axis=2), subsampling="420")

        return ids.map(one)

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("image").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("jpeg").alias("format"),
        ).alias("meta"),
    )


def synthesize_jpeg_progressive_media(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL progressive-JPEG media table: the
    :func:`synthesize_jpeg_media` fixture (per-8×8-block-constant
    grayscale, unit quant, closed form ``(id*5 + bx*3 + by*7) % 256``)
    emitted as SOF2 bitstreams — DC successive approximation + per-band
    AC scans with EOB-runs and refinement correction bits. Block-
    constant images under unit quantization are a lossless fixed point
    regardless of scan structure (the quantized coefficients are
    identical to baseline), so the SAME closed-form SQL oracle replays
    every decoded pixel (qd71). Every 97th row is corrupt bytes."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            if i % 97 == 0:
                return b"CORRUPT"
            h, w = 17 + int(i) % 5, 19 + int(i) % 8
            by, bx = np.indices((h, w)) // 8
            pix = ((int(i) * 5 + bx * 3 + by * 7) % 256).astype(np.uint8)
            return encode_jpeg(pix, progressive=True)

        return ids.map(one)

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("image").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("jpeg").alias("format"),
        ).alias("meta"),
    )


def synthesize_jpeg_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-JPEG media table: each row is an actual
    baseline-JPEG bitstream (grayscale, unit quant) whose 8×8 blocks are
    CONSTANT with value ``(id*5 + bx*3 + by*7) % 256`` for block column
    ``bx``/row ``by`` — per-block-constant images round-trip EXACTLY
    through baseline JPEG under unit quantization, so every decoded
    pixel equals the closed form of its block and an SQL oracle replays
    the statistics (qd67). Dimensions are deliberately NOT multiples of
    8 (h = 17 + id%5, w = 19 + id%8), so encoder padding and decoder
    cropping of partial blocks is exercised. Every 97th row is corrupt
    bytes, like the other media generators."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            if i % 97 == 0:
                return b"CORRUPT"
            h, w = 17 + int(i) % 5, 19 + int(i) % 8
            by, bx = np.indices((h, w)) // 8
            pix = ((int(i) * 5 + bx * 3 + by * 7) % 256).astype(np.uint8)
            return encode_jpeg_gray(pix)

        return ids.map(one)

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("image").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("jpeg").alias("format"),
        ).alias("meta"),
    )


# -- dependency-free GIF codec (round 11) ------------------------------------
#
# GIF87a/89a is the one VIDEO-ish format that is fully decodable with
# stdlib-only code: a palette container around LZW-compressed index
# streams, with an animation layer (frame rects, delays, disposal,
# transparency) on top. Implementing it for real — variable-width LSB
# LZW with dictionary resets, interlacing, local color tables, frame
# compositing — turns `sample_video_frames` from plumbing-with-a-stub
# into an operator that decodes actual moving pictures, with the same
# closed-form oracle story as PNG/WAV/JPEG (GIF is lossless, so any
# synthesized animation replays exactly). Spec: GIF89a (CompuServe,
# 1990; public), LZW per Welch 1984 with GIF's clear/EOI variant.

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_compress(indices, mcs: int) -> bytes:
    """GIF-variant LZW: variable code width (mcs+1 → 12), LSB-first
    packing, CLEAR emitted first and on dictionary overflow (4096)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    cur = b""
    for px in indices:
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        # the encoder widens as soon as the code it just ASSIGNED no
        # longer fits — the decoder mirrors this after its own insert
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        cur = bytes([px])
    if cur:
        emit(table[cur], width)
    # the decoder appends one entry while PROCESSING the tail code above
    # (its appends lag assignments by one step), so its width check fires
    # once more than the assign-time checks here — mirror it before EOI
    if next_code == (1 << width) and width < 12:
        width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, mcs: int, limit: int | None = None) -> bytes:
    """Inverse of :func:`_lzw_compress` (strict: bad codes raise)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    pos = 0  # bit cursor
    nbytes = len(data)

    def read(width: int) -> int | None:
        nonlocal pos
        if pos + width > nbytes * 8:
            return None
        byte, bit = divmod(pos, 8)
        acc = 0
        got = 0
        while got < width:
            acc |= (data[byte] >> bit) << got
            got += 8 - bit
            bit = 0
            byte += 1
        pos += width
        return acc & ((1 << width) - 1)

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code is None:
            break  # missing EOI — tolerate, real encoders differ here
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the cScSc case
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond dictionary")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry
        if limit is not None and len(out) >= limit:
            break
    return bytes(out)


def _gif_subblocks(data: bytes) -> bytes:
    """Package bytes as GIF data sub-blocks (≤255 each + terminator)."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(height: int) -> list[int]:
    """Source-row order of an interlaced image (4-pass 8/8/4/2 scheme)."""
    rows = []
    for start, step in _GIF_INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def encode_gif(
    frames,
    palette,
    *,
    delays_cs=None,
    disposals=None,
    transparent_index: int | None = None,
    rects=None,
    interlace: bool = False,
    background_index: int = 0,
    loop: bool = True,
) -> bytes:
    """Encode an animated GIF89a from palette-index frames.

    ``frames``: list of 2-D uint8 index arrays; ``palette``: (N,3) RGB
    rows, N a power of two ≥ 2. ``rects`` optionally places frame i at
    (top, left) — smaller-than-canvas frames are how real encoders emit
    deltas. Disposal codes follow the spec (1 keep, 2 restore-to-
    background, 3 restore-to-previous)."""
    import numpy as np

    palette = np.asarray(palette, dtype=np.uint8)
    n_colors = palette.shape[0]
    if n_colors < 2 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two >= 2")
    depth = max(n_colors.bit_length() - 1, 1)
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    rects = rects or [(0, 0)] * len(frames)
    height = max(t + f.shape[0] for f, (t, _) in zip(frames, rects))
    width = max(l + f.shape[1] for f, (_, l) in zip(frames, rects))
    delays_cs = delays_cs or [10] * len(frames)
    disposals = disposals or [1] * len(frames)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((depth - 1) << 4) | (depth - 1))  # GCT present
    out.append(background_index)
    out.append(0)  # square pixels
    out += palette.tobytes()
    if loop and len(frames) > 1:  # NETSCAPE2.0 infinite-loop app block
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f, (top, left), delay, disp in zip(frames, rects, delays_cs,
                                           disposals):
        tflag = 1 if transparent_index is not None else 0
        out += b"\x21\xf9\x04"
        out.append((disp & 0x7) << 2 | tflag)
        out += struct.pack("<H", delay)
        out.append(transparent_index or 0)
        out.append(0)
        fh, fw = f.shape
        out.append(0x2C)
        out += struct.pack("<HHHH", left, top, fw, fh)
        out.append(0x40 if interlace else 0)  # no LCT
        if f.max(initial=0) >= n_colors:
            raise ValueError("frame index outside palette")
        rows = f[_deinterlace_rows(fh)] if interlace else f
        mcs = max(depth, 2)
        out.append(mcs)
        out += _gif_subblocks(_lzw_compress(rows.tobytes(), mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(content: bytes) -> dict:
    """Decode + composite a GIF into RGB frames (animation-correct).

    Returns ``{"width", "height", "frames": [H×W×3 uint8 ...],
    "delays_cs", "n_frames"}``. Compositing starts from the background
    color and honors frame rects, transparency, and disposal methods
    1/2/3. Raises ``ValueError`` on structural damage."""
    import numpy as np

    if content[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF file")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    width, height = struct.unpack_from("<HH", content, 6)
    packed, bg_idx = content[10], content[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        gct = np.frombuffer(content[pos:pos + 3 * n], dtype=np.uint8)
        if gct.size < 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_idx < gct.shape[0]:
        canvas = np.tile(gct[bg_idx], (height, width, 1))
    else:
        canvas = np.zeros((height, width, 3), dtype=np.uint8)
    frames: list = []
    delays: list[int] = []
    gce_delay, gce_disposal, gce_transparent = 0, 0, None

    def subblocks() -> bytes:
        nonlocal pos
        chunks = bytearray()
        while True:
            if pos >= len(content):
                raise ValueError("truncated GIF sub-blocks")
            n = content[pos]
            pos += 1
            if n == 0:
                return bytes(chunks)
            chunks += content[pos:pos + n]
            if len(content) - pos < n:
                raise ValueError("truncated GIF sub-block")
            pos += n

    while True:
        if pos >= len(content):
            raise ValueError("GIF missing trailer")
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(content):
                raise ValueError("truncated extension")
            label = content[pos]
            pos += 1
            data = subblocks()
            if label == 0xF9 and len(data) >= 4:
                flags = data[0]
                gce_disposal = (flags >> 2) & 0x7
                gce_delay = struct.unpack_from("<H", data, 1)[0]
                gce_transparent = data[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if len(content) < pos + 9:
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", content, pos)
        pos += 8
        fpacked = content[pos]
        pos += 1
        lct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x7)
            lct = np.frombuffer(
                content[pos:pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("image block without any color table")
        mcs = content[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("bad LZW minimum code size")
        idx = np.frombuffer(
            _lzw_decompress(subblocks(), mcs, limit=fw * fh), dtype=np.uint8
        )
        if idx.size < fw * fh:
            raise ValueError("LZW stream shorter than frame")
        idx = idx[: fw * fh].reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: undo the 4-pass row shuffle
            order = _deinterlace_rows(fh)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if int(idx.max(initial=0)) >= lct.shape[0]:
            raise ValueError("palette index out of range")
        if top + fh > height or left + fw > width:
            raise ValueError("frame rect outside logical screen")

        prior = canvas.copy() if gce_disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        rgb = lct[idx]
        if gce_transparent is not None:
            mask = (idx != gce_transparent)[:, :, None]
            region[...] = np.where(mask, rgb, region)
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        delays.append(gce_delay)
        if gce_disposal == 2:
            if gct is not None and bg_idx < gct.shape[0]:
                canvas[top:top + fh, left:left + fw] = gct[bg_idx]
            else:
                canvas[top:top + fh, left:left + fw] = 0
        elif gce_disposal == 3 and prior is not None:
            canvas = prior
        gce_delay, gce_disposal, gce_transparent = 0, 0, None

    return {
        "width": int(width),
        "height": int(height),
        "frames": frames,
        "delays_cs": delays,
        "n_frames": len(frames),
    }


def synthesize_gif_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture: each id becomes a REAL animated GIF whose every frame's
    palette indices follow ``(id + 3f + 2x + 5y) % 8`` over an 8-color
    formula palette — lossless format ⇒ the decoded RGB planes replay
    closed-form in SQL (qd73). 2 + id%3 frames of (9 + id%5) × (11 +
    id%6); every 97th row corrupt."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            if i % 97 == 0:
                return b"GIF89a\x00"  # truncated header
            h, w, nf = 9 + i % 5, 11 + i % 6, 2 + i % 3
            pal = np.array(
                [((c * 37 + 11) % 256, (c * 53 + 7) % 256,
                  (c * 29 + 3) % 256) for c in range(8)],
                dtype=np.uint8,
            )
            y, x = np.indices((h, w))
            frames = [((i + 3 * f + 2 * x + 5 * y) % 8).astype(np.uint8)
                      for f in range(nf)]
            return encode_gif(frames, pal, delays_cs=[4] * nf)

        return pd.Series([one(int(v)) for v in ids], dtype=object)

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("video").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("gif").alias("format"),
        ).alias("meta"),
    )


GIF_FRAME_STATS_SCHEMA = (
    "media_id bigint, frame_index int, width int, height int, "
    "delay_cs int, r_sum bigint, g_sum bigint, b_sum bigint, "
    "decode_ok boolean"
)


def gif_frame_stats(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame sampling: decode each GIF, keep every ``every_n``-th
    composited frame, reduce exact per-channel integer sums. One output
    row per sampled frame; corrupt media → one flagged row. Pure per-row
    kernel (partition-invariant); at scale the decode parallelizes per
    media row and nothing shuffles until the caller aggregates."""
    import numpy as np  # noqa: F401 — decode_gif needs it executor-side

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    gif = decode_gif(bytes(content))
                    for fi in range(0, gif["n_frames"], every_n):
                        fr = gif["frames"][fi]
                        sums = fr.reshape(-1, 3).sum(
                            axis=0, dtype="int64")
                        rows.append((
                            media_id, fi, gif["width"], gif["height"],
                            gif["delays_cs"][fi], int(sums[0]),
                            int(sums[1]), int(sums[2]), True,
                        ))
                except Exception:  # noqa: BLE001 — corrupt → flagged
                    rows.append((media_id, None, None, None, None,
                                 None, None, None, False))
            yield pd.DataFrame(
                rows, columns=[c.split()[0] for c in
                               GIF_FRAME_STATS_SCHEMA.split(", ")],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, GIF_FRAME_STATS_SCHEMA
    )


# -- WAV flavor extensions: 8/24-bit PCM, stereo, IMA ADPCM (round 11) -------
#
# Real speech corpora arrive in more shapes than 16-bit mono: telephony
# dumps are 8-bit, studio masters 24-bit, field recordings stereo, and
# IMA/DVI ADPCM (format tag 0x11) is the classic 4-bit compressed WAV —
# an actual CODEC (adaptive step-size DPCM, IMA "Recommended Practices
# for Enhancing Digital Audio Compatibility" 1992), not just a container
# layout. All decode dependency-free; float/a-law/µ-law/32-bit keep
# honest guards (32-bit squares would overflow the exact int64 feature
# contract).

_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_nibble_decode(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM step: (predictor, index) → next state."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble & 7]))
    return pred, index


def _ima_adpcm_decode_block(block: bytes, n_keep: int) -> list[int]:
    """Decode one mono IMA block (4-byte header + nibble payload)."""
    pred, index = struct.unpack_from("<hB", block, 0)
    if index > 88:
        raise ValueError("IMA ADPCM step index out of range")
    out = [pred]
    for byte in block[4:]:
        for nibble in (byte & 0xF, byte >> 4):  # low nibble first
            pred, index = _ima_nibble_decode(pred, index, nibble)
            out.append(pred)
            if len(out) >= n_keep:
                return out
    return out[:n_keep]


def encode_wav_ima_adpcm(
    samples, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Encode mono int16 samples as a real IMA ADPCM WAV (tag 0x11),
    with the ``fact`` chunk carrying the true sample count so partial
    final blocks round-trip exactly."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.size == 0:
        raise ValueError("need at least one sample")
    if int(arr.min()) < -32768 or int(arr.max()) > 32767:
        raise ValueError("samples out of int16 range")
    spb = (block_align - 4) * 2 + 1
    blocks = bytearray()
    pos = 0
    n = arr.size
    while pos < n:
        chunk = arr[pos:pos + spb]
        pred = int(chunk[0])
        # Seed the block's step index near the block's mean |first diff|:
        # the header carries the index, so the decoder follows for free and
        # the adaptive loop skips its slow warmup from step 7.
        if chunk.size > 1:
            d = int(np.abs(np.diff(chunk)).mean())
            index = min(range(89),
                        key=lambda i: abs(_IMA_STEP_TABLE[i] - d))
        else:
            index = 0
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            target = int(s)
            step = _IMA_STEP_TABLE[index]
            diff = target - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            temp = step
            for bit in (4, 2, 1):
                if diff >= temp:
                    nib |= bit
                    diff -= temp
                temp >>= 1
            pred, index = _ima_nibble_decode(pred, index, nib)
            nibbles.append(nib)
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))  # pad block
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
        pos += spb
    spb_total = spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        (sample_rate * block_align + spb_total - 1) // spb_total,
        block_align, 4, 2, spb_total,
    )
    body = (
        _WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return _RIFF_MAGIC + struct.pack("<I", len(body)) + body


def encode_wav_ex(
    samples, sample_rate: int = 8000, *, bits: int = 16, channels: int = 1
) -> bytes:
    """PCM encoder for 8 (unsigned), 16, and 24-bit, mono or stereo.
    ``samples``: 1-D for mono, (n, 2) for stereo, SIGNED native-scale
    values (8-bit input is the centered value in [-128, 127])."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if channels == 2:
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise ValueError("stereo wants shape (n, 2)")
        flat = arr.reshape(-1)  # interleaved L R L R
    elif arr.ndim == 1:
        flat = arr
    else:
        raise ValueError("mono wants a 1-D array")
    lo = -(1 << (bits - 1))
    hi = (1 << (bits - 1)) - 1
    if flat.size and (int(flat.min()) < lo or int(flat.max()) > hi):
        raise ValueError(f"samples out of int{bits} range")
    if bits == 8:
        pcm = (flat + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        pcm = flat.astype("<i2").tobytes()
    elif bits == 24:
        u = (flat & 0xFFFFFF).astype("<u4")
        b = u.view(np.uint8).reshape(-1, 4)[:, :3]
        pcm = b.tobytes()
    else:
        raise NotImplementedError(f"{bits}-bit PCM encode not supported")
    frame = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * frame, frame, bits)
    body = (
        _WAVE_MAGIC
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return _RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav_ex(content: bytes) -> dict:
    """Decode PCM 8/16/24-bit mono/stereo and mono IMA ADPCM WAVs.

    Returns ``{"samples": (n_frames, channels) int64 ndarray (signed,
    native scale), "sample_rate", "bits", "channels", "codec"}``.
    Unsupported shapes raise NotImplementedError honestly; damage
    raises ValueError."""
    import numpy as np

    if content is None or content[:4] != _RIFF_MAGIC \
            or content[8:12] != _WAVE_MAGIC:
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = data = fact = None
    while pos + 8 <= len(content):
        ctype = content[pos:pos + 4]
        (length,) = struct.unpack("<I", content[pos + 4:pos + 8])
        chunk = content[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated WAV chunk")
        if ctype == b"fmt ":
            fmt = chunk
        elif ctype == b"data":
            data = chunk
        elif ctype == b"fact":
            fact = chunk
        pos += 8 + length + (length & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("malformed fmt chunk")
    tag, channels, rate, _bps, align, depth = struct.unpack("<HHIIHH",
                                                            fmt[:16])
    if tag == 1:
        if depth not in (8, 16, 24) or channels not in (1, 2):
            raise NotImplementedError(
                f"PCM depth={depth} channels={channels} not supported"
                " (8/16/24-bit, mono/stereo)"
            )
        if depth == 8:
            flat = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
        elif depth == 16:
            flat = np.frombuffer(
                data[: len(data) // 2 * 2], dtype="<i2"
            ).astype(np.int64)
        else:
            raw = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
            raw = raw.reshape(-1, 3).astype(np.int64)
            flat = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            flat -= (flat & 0x800000) << 1  # sign-extend 24 → 64
        frames = flat[: flat.size // channels * channels].reshape(
            -1, channels)
        return {"samples": frames, "sample_rate": int(rate), "bits": depth,
                "channels": channels, "codec": "pcm"}
    if tag == 0x11:
        if channels != 1:
            raise NotImplementedError("IMA ADPCM: mono only")
        if align < 8:
            raise ValueError("IMA ADPCM block align too small")
        spb = (align - 4) * 2 + 1
        total = struct.unpack("<I", fact[:4])[0] if fact and len(fact) >= 4 \
            else (len(data) // align) * spb
        out: list[int] = []
        for off in range(0, len(data), align):
            block = data[off:off + align]
            if len(block) < 5:
                break
            out.extend(
                _ima_adpcm_decode_block(block, min(spb, total - len(out))))
            if len(out) >= total:
                break
        if len(out) < total:
            raise ValueError("IMA ADPCM data shorter than fact count")
        frames = np.asarray(out, dtype=np.int64).reshape(-1, 1)
        return {"samples": frames, "sample_rate": int(rate), "bits": 16,
                "channels": 1, "codec": "ima_adpcm"}
    raise NotImplementedError(
        f"WAV format tag 0x{tag:02x} not supported (PCM and IMA ADPCM only;"
        " float/a-law/mu-law/mp3 are codecs this environment lacks)"
    )


def synthesize_wav_flavors_media(df: DataFrame,
                                 id_col: str = "doc_id") -> DataFrame:
    """Fixture: id%4 picks the flavor — 8-bit PCM, 24-bit PCM, stereo
    16-bit (R = L + 2 so the downmix is exactly L + 1), or IMA ADPCM of
    a CONSTANT signal (constants are an exact fixed point of the IMA
    coder at initial step index 0: nibble 0 decodes to delta
    ``step>>3 = 7>>3 = 0`` and the index stays clamped at 0, so every
    decoded sample equals the header predictor — giving the compressed
    codec a closed-form SQL twin). ``64 + id%32`` frames; every 97th
    row corrupt."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            if i % 97 == 0:
                return b"CORRUPT"
            n = 64 + i % 32
            k = np.arange(n, dtype=np.int64)
            flavor = i % 4
            if flavor == 0:
                s = (i * 7 + k * 13) % 256 - 128
                return encode_wav_ex(s, bits=8)
            if flavor == 1:
                s = (i * 11 + k * 17) % (1 << 24) - (1 << 23)
                return encode_wav_ex(s, bits=24)
            if flavor == 2:
                left = (i * 7 + k * 13) % 4096 - 2048
                return encode_wav_ex(
                    np.stack([left, left + 2], axis=1), channels=2)
            c = int(i * 13) % 4096 - 2048
            return encode_wav_ima_adpcm(np.full(n, c, dtype=np.int64))

        return pd.Series([one(int(v)) for v in ids], dtype=object)

    return df.select(F.col(id_col).alias("media_id")).select(
        "media_id",
        F.lit("audio").alias("media_type"),
        pack(F.col("media_id")).alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("wav").alias("format"),
        ).alias("meta"),
    )


AUDIO_FEATURE_EX_SCHEMA = (
    "media_id bigint, sample_rate int, n_frames bigint, channels int, "
    "bits int, codec string, duration_ms int, amp_sum bigint, "
    "energy bigint, amp_min int, amp_max int, zero_crossings bigint, "
    "decode_ok boolean"
)


def audio_features_ex(df: DataFrame) -> DataFrame:
    """`audio_features` over the full decoder matrix: features reduce
    over the mono DOWNMIX ``floor((L+R)/2)`` for stereo (native samples
    for mono), all integer-exact so the qd75 twin replays them. Pure
    per-row Arrow kernel, partition-invariant."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    d = decode_wav_ex(bytes(content))
                    fr = d["samples"]
                    mono = fr[:, 0] if d["channels"] == 1 else \
                        (fr[:, 0] + fr[:, 1]) // 2
                    nf = fr.shape[0]
                    rows.append((
                        media_id, d["sample_rate"], nf, d["channels"],
                        d["bits"], d["codec"],
                        int(nf * 1000 // d["sample_rate"]),
                        int(mono.sum()), int((mono * mono).sum()),
                        int(mono.min()) if nf else None,
                        int(mono.max()) if nf else None,
                        int(np.count_nonzero(mono[:-1] * mono[1:] < 0)),
                        True,
                    ))
                except Exception:  # noqa: BLE001 — corrupt → flagged row
                    rows.append((media_id, None, None, None, None, None,
                                 None, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[c.split()[0] for c in
                         AUDIO_FEATURE_EX_SCHEMA.split(", ")],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, AUDIO_FEATURE_EX_SCHEMA
    )
