"""Streaming incremental view maintenance: the nation-revenue
join-aggregate view of ``plans/maintenance.orders_ivm_nation_revenue``,
maintained by a stream of order batches instead of a one-shot delta.

Each micro-batch computes its own ΔV (batch ⋈ broadcast dim →
group-by-key partial aggregate, DECIMAL money math) and lands it in a
batch-stamped subdirectory with ``overwrite`` — the replay-safety
convention shared with ``streaming.ingest`` / ``streaming.index_sink``:
a batch replayed after a lost checkpoint commit REWRITES its own delta
instead of double-applying it, so the merged view is exactly-once per
batch id with no transactional store underneath. ``read_view`` merges
the deltas at read time (sum is associative/commutative, so merge order
is irrelevant and the DECIMAL totals are bit-equal to a from-scratch
batch rebuild — pinned in tests/test_streaming.py).

At 100 TB the delta dirs are keys × batches rows of METADATA (25
nations here), so merge-on-read costs nothing; a fold into a single
base batch when fan-in ever mattered is the ``compact_sketch_batches``
marker/tombstone protocol applied verbatim to these partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.streaming.ingest import (
    _batch_dirs,
    _guard_fresh_checkpoint,
)

_DELTA_SCHEMA = ("c_nationkey int, revenue decimal(18,2), "
                 "n_orders bigint")


def apply_ivm_batch(
    batch_df: DataFrame, batch_id: int, dim: DataFrame, view_dir: str
) -> None:
    """Compute one batch's ΔV and land it in ``batch=<id>`` (overwrite:
    replays rewrite, never double-apply). ``dim`` is the static
    (c_custkey, c_nationkey) dimension — broadcast, the delta batch is
    the small side's probe at any corpus scale. The delta definition is
    ``plans.maintenance.nation_revenue_delta`` — the SAME function the
    batch IVM query uses, so the two surfaces cannot drift apart."""
    from bigdata2016w_spark.plans.maintenance import nation_revenue_delta

    delta = nation_revenue_delta(batch_df, dim, bcast_dim=True)
    delta.write.mode("overwrite").parquet(f"{view_dir}/batch={batch_id}")


def ivm_view_sink(
    orders_stream: DataFrame,
    dim: DataFrame,
    view_dir: str,
    checkpoint_dir: str,
):
    """Start the view-maintenance stream (availableNow); returns the
    StreamingQuery. view_dir and checkpoint_dir live and die together —
    same fresh-checkpoint guard (and reasoning) as the admission sinks."""
    spark = orders_stream.sparkSession
    # guard with the DELTA schema — view_dir holds delta batches, not
    # order rows; inputFiles() never reads data today, but a guard that
    # ever evaluates the frame must see the schema actually on disk
    _guard_fresh_checkpoint(spark, view_dir, checkpoint_dir, _DELTA_SCHEMA)
    dim = dim.select("c_custkey", "c_nationkey")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_ivm_batch(batch_df, batch_id, dim, view_dir)

    return (
        orders_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """Merge-on-read over the batch-stamped deltas: the maintained view
    (c_nationkey, revenue, n_orders). Empty before the first commit."""
    dirs = _batch_dirs(spark, view_dir)
    if not dirs:
        return spark.createDataFrame([], _DELTA_SCHEMA)
    return (
        spark.read.schema(_DELTA_SCHEMA).parquet(*dirs)
        .groupBy("c_nationkey")
        .agg(
            F.sum("revenue").cast("decimal(18,2)").alias("revenue"),
            F.sum("n_orders").alias("n_orders"),
        )
    )
