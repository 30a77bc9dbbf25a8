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
does not. Video frame sampling keeps its ffmpeg integration point
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
    image bytes (PNG/JPEG/…) executor-side; corrupt media flags the row
    like the fake path.
    """
    if decode not in ("fake", "real"):
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
    (re-encoded as PNG — lossless, format-independent)."""
    if decode not in ("fake", "real"):
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
