"""Registered multimodal-pipeline queries — oracle-checked.

The multimodal component (``operators/multimodal.py``) carries opaque
``binary`` payloads through Arrow-batched ``mapInPandas``. No reference
counterpart (the reference is text-only); this is the engine's
LLM-pipeline extension. ``media_image_features`` is END-TO-END REAL: the
payloads are genuine binary-PPM (P6) images rendered JVM-side from the
documents table (``documents_as_ppm``) and the default ``decode_image``
parses their actual headers/raster with numpy — no injected stand-in.
Because the raster bytes are the documents' ASCII text (verified:
octet_length == length at every SF) padded with spaces, the decoded
features are also exactly expressible in DuckDB SQL, keeping the whole
mapInPandas pipeline under the driver's rows+schema+hash gate.

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
    documents_as_ppm,
    frame_sample_plan,
    image_features,
)
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table


def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real binary-PPM payloads (rendered from the documents
    table) via the Arrow-batched ``mapInPandas`` image pipeline — the
    default header-parsing ``decode_image``, no injected decoder."""
    docs = load_table(spark, sf_dir, "documents")
    return image_features(documents_as_ppm(docs))


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


# documents_as_ppm + decode_image transcribed to SQL. The P6 payload is
# "P6\n{w} {h}\n255\n" + text rpadded with spaces (ascii 32) to w·h·3
# bytes (ASCII text ⇒ byte i == ascii(char i)); decode_image returns the
# header dims, total payload length, and raster mean / 255.0 computed as
# double(int_sum / n_raster) / 255.0 — mirrored exactly below.
_IMAGE_FEATURES_SQL = """
WITH dims AS (
  SELECT doc_id, text,
         (length(text) % 31) + 2 AS w,
         (length(text) % 15) + 2 AS h,
         ((length(text) % 31) + 2) * ((length(text) % 15) + 2) * 3 AS npix
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 + length(CAST(w AS VARCHAR)) + 1 + length(CAST(h AS VARCHAR))
            + 5 + npix AS BIGINT) AS n_bytes,
       ((coalesce(list_aggregate(
             list_transform(range(1, least(length(text), npix) + 1),
                            i -> ascii(text[i])), 'sum'), 0)
         + 32 * (npix - least(length(text), npix))) / npix) / 255.0
         AS mean_intensity
FROM dims
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
