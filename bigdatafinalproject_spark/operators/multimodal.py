"""Multimodal (binary) column plumbing (net-new surface, BASELINE.json
north star): images/audio/video ride as opaque ``binary`` columns with
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the sanctioned slow path — Python only where built-ins
genuinely cannot express the work).

The decode itself is STUBBED in this environment (no PIL/cv2/ffmpeg in
the container): ``decode_image_real`` raises NotImplementedError behind
an import-try, and ``fake_decode_features`` provides a deterministic
md5-based stand-in so the Spark-side plumbing — schema, batching,
partitioning, UDF signature — is fully real and oracle-testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal ingest: utf-8 bytes of the text column as
    the opaque payload (real pipelines read image/audio bytes the same
    way — a binary column plus metadata)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image_real(payload: bytes):  # pragma: no cover - env lacks codecs
    """Real decode path — requires an imaging library not present in
    this container. Kept as the integration point."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow; not available in this "
            "environment — use fake_decode_features for plumbing tests"
        ) from e
    raise NotImplementedError("wire Image.open(BytesIO(payload)) here")


def fake_decode_features(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in decoder: md5 of the payload drives the
    'image' dimensions. SQL-equivalent (DuckDB):
        width  = ('0x' || substr(md5(text), 1, 4))::INT % 1024
        height = ('0x' || substr(md5(text), 5, 4))::INT % 1024
        mean   = (('0x' || substr(md5(text), 9, 4))::INT % 256) / 1.0
    """
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return (
        int(h[0:4], 16) % 1024,
        int(h[4:8], 16) % 1024,
        3,
        float(int(h[8:12], 16) % 256),
    )


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    decode runs per-row inside the batch (vectorized transfer, scalar
    decode — the realistic shape for codec work)."""

    # The decode is re-declared inside the closure so the pickled task is
    # self-contained — executor Python workers must not need this package
    # importable (the driver may run from anywhere).
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def decode(payload: bytes) -> tuple[int, int, int, float]:
            h = hashlib.md5(payload).hexdigest()
            return (
                int(h[0:4], 16) % 1024,
                int(h[4:8], 16) % 1024,
                3,
                float(int(h[8:12], 16) % 256),
            )

        for pdf in batches:
            feats = pdf[payload_col].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": feats.map(lambda t: t[0]).astype("int32"),
                    "height": feats.map(lambda t: t[1]).astype("int32"),
                    "channels": feats.map(lambda t: t[2]).astype("int32"),
                    "mean_pixel": feats.map(lambda t: t[3]).astype("float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, FEATURE_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio leg of the multimodal surface: same Arrow-batched
    ``mapInPandas`` plumbing as :func:`extract_image_features`, with the
    codec stubbed deterministically (no soundfile/librosa in the
    container). A real deployment swaps ``decode`` for a soundfile read;
    schema, batching and partitioning stay identical."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def decode(payload: bytes) -> tuple[int, int, float, float]:
            rates = (8000, 16000, 22050, 44100)
            h = hashlib.md5(payload).hexdigest()
            rate = rates[int(h[0:4], 16) % 4]
            n_samples = len(payload) * 4  # fake 4 samples/byte
            return (
                rate,
                n_samples,
                float(n_samples) / rate,
                float(int(h[4:8], 16) % 1000) / 1000.0,
            )

        for pdf in batches:
            feats = pdf[payload_col].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "sample_rate": feats.map(lambda t: t[0]).astype("int32"),
                    "n_samples": feats.map(lambda t: t[1]).astype("int64"),
                    "duration_sec": feats.map(lambda t: t[2]).astype("float64"),
                    "rms": feats.map(lambda t: t[3]).astype("float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, AUDIO_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 256,
    stride: int = 4,
) -> DataFrame:
    """'Video' frame sampling as pure column ops: slice the payload into
    fixed-size frames, keep every ``stride``-th — demonstrating that
    even multimodal slicing stays JVM-side until an actual codec is
    required. Returns (id, frame_no, frame binary)."""
    n_frames = F.floor(F.length(payload_col) / frame_bytes).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
        "frame_no"
    )
    return (
        df.select(id_col, payload_col)
        .filter(F.length(payload_col) >= frame_bytes)
        .select(id_col, idx, payload_col)
        .filter(F.col("frame_no") % stride == 0)
        .select(
            id_col,
            "frame_no",
            F.expr(f"substring({payload_col}, frame_no * {frame_bytes} + 1, {frame_bytes})")
            .alias("frame"),
        )
    )
