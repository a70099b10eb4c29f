"""Multimodal (image/audio/video) column plumbing — pipeline extension.

Design: media travel as opaque ``binary`` columns next to typed metadata
(the lakehouse pattern), and every decode/feature step is an Arrow-batched
``mapInPandas`` whose *Spark-side contract* — schema, batch shape,
partitioning — is real and tested. The decoders themselves are STUBS:
the image/audio libraries are not in this container, so ``decode_image``
raises ``NotImplementedError`` unless handed an injected decoder, and
tests exercise the pipeline with ``fake_decode_image`` (a deterministic
pure-Python "decoder").

At scale this shape matters more than the codec: binary payloads stay in
Arrow record batches end-to-end (no per-row pickling), metadata predicates
prune before any decode runs, and ``spark.sql.files.maxPartitionBytes`` /
``repartition`` control how many media blobs land in one Python worker
batch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Real decoder hook — (width, height, mean_intensity).

    STUB: no imaging library in this environment. Inject a decoder into
    ``image_features(..., decoder=...)`` (e.g. PIL/opencv in production).
    """
    raise NotImplementedError(
        "image decoding requires an imaging library; inject decoder="
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in decoder for tests: derives a fake geometry
    and intensity from the payload bytes alone."""
    n = len(payload)
    width = (n % 64) + 1
    height = (n // 64) % 64 + 1
    mean_intensity = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, mean_intensity


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, float]] | None = None,
) -> DataFrame:
    """media(media_id long, payload binary) → per-image features.

    Arrow-batched ``mapInPandas``: one Python invocation per record batch,
    bytes arrive zero-copy-ish from the JVM, output conforms to
    IMAGE_FEATURES_SCHEMA.
    """
    decode = decoder or decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mean_intensity": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* skeleton: declares the output shape
    (media_id, frame_idx, frame binary) and the partition strategy; frame
    extraction itself is the injected decoder's job.

    Shown here as the explode of a computed frame-index array — the real
    pipeline replaces the payload slicing with codec output.
    """
    n_frames = (F.length("payload") / F.lit(1024)).cast("int") + 1
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
        F.col("payload").alias("frame"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests: treat document text bytes as opaque payloads
    (the engine has no binary testdata column — FIXTURES.md)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
