"""Streaming maintenance of a persisted residual IVF-PQ index — the
vector-index member of the foreachBatch sink family.

``sources.sinks.ivfpq_index_append`` encodes new vectors against the
FROZEN model artifacts (centroids + codebook) in one map-side pass, but
its ``mode('append')`` write is not replay-safe: a micro-batch whose
parquet write succeeded but whose checkpoint commit did not would append
its rows AGAIN on replay. This sink keeps the one-pass frozen-model
encode and swaps the landing zone for the family's batch-stamped
overwrite layout (``streaming.ingest`` / ``streaming.sketch_sink``):
batch N's packed codes land under ``{index}/codes_stream/batch=N``,
hive-partitioned by cell inside the batch dir, so a replayed batch
overwrites its own subdir instead of doubling. Probes union the base
``codes`` partitions with the streamed ones
(``knn_ivfpq_from_index(include_streamed=True)``); both sides prune to
the probed cells BEFORE the union, so the scan stays n_probe cell
directories of M-byte rows on each side.

At 100 TB the streamed tail stays tiny relative to the base index, and a
periodic compaction folds ``codes_stream`` batches into the base
``codes`` partitions (one ``ivfpq_index_append`` of the merged tail
after quiescing the stream) to bound read-side fan-in — the same
compaction story as the sketch partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata2016w_spark.streaming.ingest import (
    _batch_dirs,
    _checkpoint_started,
)

CODES_SCHEMA = "vec_id bigint, codes array<tinyint>, cell int"


def _stream_dir(index_path: str) -> str:
    return f"{index_path}/codes_stream"


def read_streamed_codes(spark: SparkSession, index_path: str) -> DataFrame:
    """(vec_id, codes, cell): every committed micro-batch's packed codes,
    via the Hadoop batch-dir listing (never a glob — an in-flight batch's
    partial files must not leak in). No batches yet → empty typed frame.
    Each batch dir is itself hive-partitioned by cell, so a cell filter
    on this frame still prunes directories at the scan."""
    dirs = _batch_dirs(spark, _stream_dir(index_path))
    if not dirs:
        return spark.createDataFrame([], CODES_SCHEMA)
    # basePath anchors partition discovery at the stream root so each
    # batch dir's nested cell= level parses as (batch, cell) instead of
    # CONFLICTING_DIRECTORY_STRUCTURES; only committed batch dirs are
    # listed, so an in-flight batch still can't leak in
    return (
        spark.read.option("basePath", _stream_dir(index_path))
        .parquet(*dirs)
        .select("vec_id", "codes", "cell")
    )


def ivfpq_append_sink(
    emb_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
):
    """Start the index-maintenance stream: batch N's vectors are encoded
    against the index's FROZEN centroids + codebook (read once at sink
    start — appends never retrain, ``write_ivfpq_index``'s train-once
    contract) and land as packed codes in
    ``{index}/codes_stream/batch=N`` (overwrite — replay-idempotent).
    Returns the StreamingQuery.

    Raises up front when the index is empty (no model to encode against,
    the batch append's contract) and on the family's fresh-checkpoint-
    vs-populated-target mismatch: a fresh checkpoint restarts batch ids
    at 0 and would overwrite existing streamed batches one by one."""
    from bigdata2016w_spark.sources.sinks import (
        _ivfpq_frozen_models,
        ivfpq_encode_packed,
    )

    spark = emb_stream.sparkSession
    if not _checkpoint_started(spark, checkpoint_dir):
        existing = _batch_dirs(spark, _stream_dir(index_path))
        if existing:
            raise ValueError(
                f"index at {index_path!r} already holds streamed batch= "
                f"subdirs but checkpoint_dir {checkpoint_dir!r} is fresh "
                "— batch ids would restart at 0 and overwrite existing "
                "appends. Reuse the original checkpoint, or compact "
                "codes_stream into the base index first."
            )
    # frozen at sink start: every batch encodes against the SAME models,
    # so a replay of batch N is bit-identical to its first run
    cent_lit, cent, cb, n_subspaces, dim = _ivfpq_frozen_models(
        spark, index_path
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        (
            ivfpq_encode_packed(batch_df, cent_lit, cent, cb,
                                n_subspaces, dim)
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{_stream_dir(index_path)}/batch={batch_id}")
        )

    return (
        emb_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
