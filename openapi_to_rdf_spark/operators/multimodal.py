"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct — the Spark-side contract (schema, partition sizing, Arrow
batch shape, mapInPandas signatures) is real and tested; the actual codec
calls are STUBBED (Pillow/librosa/ffmpeg are not in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a clearly-marked deterministic fake decoder (payload-hash-seeded) stands
in so downstream feature plumbing is exercised end-to-end.

Scale notes: binary payloads dominate row size, so feature extraction first
projects (id, payload) only — column pruning keeps the metadata scan-free —
and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds Arrow batch
memory (decode working set = batch_size x payload)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("features", ArrayType(DoubleType()), True),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_payload_len", LongType(), False),
])


def synth_media(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic opaque payloads for testing the binary plumbing:
    payload = sha2 of the doc text repeated — content-addressed, so the same
    doc always yields the same bytes at any parallelism."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.to_binary(F.repeat(F.sha2(F.col(text_col), 256), 4), F.lit("hex"))
        .alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).alias("source_len"),
        ).alias("meta"),
    )


def decode_image_features(media: DataFrame, fake: bool = False,
                          n_features: int = 8) -> DataFrame:
    """mapInPandas image decode + feature extraction.

    Real path: Pillow/torchvision decode — NOT available in this container;
    raises NotImplementedError per batch unless fake=True. Fake path is a
    DETERMINISTIC STAND-IN (first bytes of the payload scaled to [0,1]) that
    keeps the batch shape, schema, and partition behavior of the real thing.
    """
    pruned = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires Pillow; not installed in this "
                    "environment — pass fake=True for the deterministic stub")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload[:n_features], dtype=np.uint8)
                feats = (buf.astype(np.float64) / 255.0).tolist()
                # fake dimensions derived from payload bytes (deterministic)
                rows.append((mid, int(payload[0]) + 1, int(payload[1]) + 1, feats))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "features"])

    return pruned.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("duration_ms", IntegerType(), True),
    StructField("mfcc", ArrayType(DoubleType()), True),
])

RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("payload_len", LongType(), False),
])


def extract_audio_features(media: DataFrame, fake: bool = False,
                           n_mfcc: int = 4) -> DataFrame:
    """mapInPandas audio decode + MFCC-shaped features. Real path needs
    librosa/soundfile (absent) — NotImplementedError unless fake=True; the
    fake derives duration and coefficients deterministically from payload
    bytes, preserving batch shape and schema."""
    pruned = media.filter(F.col("kind") == "audio").select("media_id", "payload")

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires librosa/soundfile; not installed — "
                    "pass fake=True for the deterministic stub")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload[:n_mfcc * 2], dtype=np.uint8)
                mfcc = (buf[:n_mfcc].astype(np.float64) - 128.0).tolist()
                rows.append((mid, len(payload) * 8, mfcc))
            yield pd.DataFrame(rows, columns=["media_id", "duration_ms", "mfcc"])

    return pruned.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  fake: bool = False) -> DataFrame:
    """mapInPandas image resize. Real path needs Pillow (absent) —
    NotImplementedError unless fake=True; the fake emits a payload-length
    proportional to the target dimensions (deterministic)."""
    pruned = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires Pillow; not installed — pass "
                    "fake=True for the deterministic stub")
            rows = [(mid, width, height, min(len(p), width * height))
                    for mid, p in zip(pdf["media_id"], pdf["payload"])]
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "payload_len"])

    return pruned.mapInPandas(run, RESIZED_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 4,
                        fake: bool = False) -> DataFrame:
    """mapInPandas frame sampler: one output row per sampled frame.

    Real path needs ffmpeg/pyav (absent) — NotImplementedError unless
    fake=True; the fake treats each 16-byte payload block as one 'frame'.
    """
    pruned = media.filter(F.col("kind") == "video").select("media_id", "payload")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg/pyav; not installed — pass "
                    "fake=True for the deterministic stub")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(len(payload) // 16, 1)
                for i in range(0, n_frames, every_n):
                    rows.append((mid, i, min(16, len(payload) - i * 16)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_payload_len"])

    return pruned.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
