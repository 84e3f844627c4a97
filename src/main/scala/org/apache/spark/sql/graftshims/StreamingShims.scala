package org.apache.spark.sql.graftshims

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/**
 * graft's ONLY Spark-internal access point (round 19). A V1 streaming
 * `Source.getBatch` must return a DataFrame whose plan is tagged
 * `isStreaming=true` (`MicroBatchExecution` asserts it), and the two
 * pieces that tagging needs — `classic.Dataset.ofRows` and
 * `LogicalRDD.fromDataset` — are `private[sql]`. This object lives
 * under the `org.apache.spark.sql` namespace purely to reach them, the
 * same arrangement every DataFrame-returning streaming connector ships
 * (Delta's streaming source wraps its batch plans identically). Nothing
 * else in the repo touches Spark internals.
 */
object StreamingShims {

  /** Wrap a fully-built batch DataFrame as a streaming-tagged
    * `LogicalRDD` over its own executed RDD. Construction is lazy —
    * planning happens here, execution when the sink runs the batch. */
  def asStreamingDataFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = true))
  }

  /** The inverse direction, for a V1 streaming `Sink.addBatch`: the
    * engine hands the micro-batch as a one-shot incremental DataFrame;
    * re-planting it as a batch `LogicalRDD` over its own RDD lineage
    * makes it safely re-executable across the several jobs a MERGE
    * commit runs (winner persist, DV build, add write) — again the
    * arrangement Delta's sink ships. */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
