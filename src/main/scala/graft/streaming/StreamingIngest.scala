package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming file ingestion + partitioned parquet load — the continuous
  * twin of the batch extract/load phases (reference:
  * analysis/etl_spark.py:88-100 extract, 250-259 load): watch a landing
  * directory, process each newly arrived file exactly once, append the
  * transformed rows to a partitioned parquet table.
  *
  * Scale notes: the file source commits progress per micro-batch to the
  * checkpoint, so a 1000-executor ingest restarts exactly where it died
  * — at 100 TB/day the unit of reprocessing is one micro-batch, never
  * the backlog. `maxFilesPerTrigger` is the backpressure knob (bound
  * work per batch so state and shuffle stay executor-sized); the sink
  * writes real partitioned parquet with exactly-once file commits via
  * the sink log — downstream batch readers see only committed files.
  * Any stateless Column transform (quality flags, PII scrub, bucketing)
  * composes between source and sink unchanged.
  */
object StreamingIngest {

  /** Parquet landing-directory stream with an EXPLICIT schema — the file
    * source cannot infer on an empty directory, and schema drift should
    * fail loudly at the source, not downstream.
    */
  def parquetFileStream(
      s: SparkSession,
      landingDir: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)

  /** Append the stream to a partitioned parquet table, exactly-once.
    * `Trigger.AvailableNow` drains the current backlog in bounded
    * batches and stops — the "catch up then exit" mode a scheduled
    * ingest job wants; omit it (default trigger) for continuous tailing.
    */
  def toPartitionedParquet(
      df: DataFrame,
      outDir: String,
      checkpointDir: String,
      partitionBy: Seq[String],
      availableNow: Boolean = true): StreamingQuery = {
    val base = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(partitionBy: _*)
    (if (availableNow) base.trigger(Trigger.AvailableNow()) else base).start()
  }
}
