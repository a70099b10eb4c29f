"""Registered multimodal-pipeline queries — oracle-checked.

The multimodal component (``operators/multimodal.py``) carries opaque
``binary`` payloads through Arrow-batched ``mapInPandas``. No reference
counterpart (the reference is text-only); this is the engine's
LLM-pipeline extension. The container has no imaging library, so the
registered queries run the deterministic ``fake_decode_image`` stand-in —
but because the fake decoder is pure byte math and ``documents.text`` is
ASCII (verified: octet_length == length at every SF), its output is
exactly expressible in DuckDB SQL. That promotes the whole mapInPandas
pipeline — schema, batch shape, adapter — from pytest-only to the
driver's rows+schema+hash correctness gate.

Scale notes: one decode pass per payload batch, no shuffle at all for
``media_image_features`` (map-only over the scan); ``media_frame_sample``
is scan → generate (explode) — also shuffle-free. Both plans survive
100 TB trivially: work is linear in payload bytes and embarrassingly
parallel per file split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.operators.multimodal import (
    documents_as_media,
    fake_decode_image,
    frame_sample_plan,
    image_features,
)
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table


def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract every media payload (documents-as-media
    adapter) via the Arrow-batched ``mapInPandas`` image pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return image_features(documents_as_media(docs), decoder=fake_decode_image)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plan (every 10th frame) over the same
    payloads; projects frame byte-length so results are hashable."""
    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample_plan(documents_as_media(docs), every_n=10)
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame").alias("frame_bytes"),
    )


# fake_decode_image byte math transcribed to SQL: payload = UTF-8 bytes of
# text (ASCII ⇒ byte i == ascii(char i), n_bytes == length(text)).
_IMAGE_FEATURES_SQL = """
SELECT doc_id AS media_id,
       CAST((length(text) % 64) + 1 AS INTEGER) AS width,
       CAST(((length(text) // 64) % 64) + 1 AS INTEGER) AS height,
       CAST(length(text) AS BIGINT) AS n_bytes,
       (CAST(coalesce(list_aggregate(
              list_transform(range(1, least(length(text), 256) + 1),
                             i -> ascii(text[i])), 'sum'), 0) AS DOUBLE)
        / CAST(greatest(least(length(text), 256), 1) AS DOUBLE)) / 255.0
         AS mean_intensity
FROM documents
"""

_FRAME_SAMPLE_SQL = """
SELECT media_id, CAST(f AS INTEGER) AS frame_idx, frame_bytes
FROM (
  SELECT doc_id AS media_id,
         unnest(range(0, (length(text) // 1024) + 1, 10)) AS f,
         CAST(length(text) AS INTEGER) AS frame_bytes
  FROM documents
)
"""

register(QuerySpec("media_image_features", media_image_features,
                   _IMAGE_FEATURES_SQL, doc=media_image_features.__doc__))
register(QuerySpec("media_frame_sample", media_frame_sample,
                   _FRAME_SAMPLE_SQL, doc=media_frame_sample.__doc__))
