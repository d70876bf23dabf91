package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic batch-replay of a streaming query — the entry that puts
  * a REAL Structured Streaming execution inside the driver's DuckDB gate
  * (every other streaming component is differential-spec'd only, because
  * the gate runs batch SQL): a file-source stream over the events table,
  * a stateful complete-mode aggregation, a memory sink, drained
  * synchronously with `processAllAvailable`, final snapshot returned as
  * the query result.
  *
  * Determinism contract: complete-mode aggregation over a finite replay
  * has no watermark and drops nothing, and every aggregate is a
  * commutative monoid (count, min, max) — so the final snapshot equals
  * the batch aggregation over the same file regardless of micro-batch
  * decomposition, and a plain SQL oracle gates the whole streaming
  * execution path (source listing → StateStore merges → sink commit).
  *
  * The ts normalization is the [[graft.Tables.events]] branch verbatim
  * (read-schema-dependent nanos handling) so the gate breaks loudly if
  * the streaming read path ever diverges from the batch one.
  */
object StreamingReplay {

  private val ViewName = "graft_streaming_replay_hourly"

  /** Hourly event counts per type via a real streaming execution. */
  def hourlyTypeCounts(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val raw = s.read.parquet(path)
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    // The file source requires a DIRECTORY: stream the sf dir itself,
    // glob-filtered to the events table file.
    val agg = s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_us", tsUs)
      .withColumn("hour_bucket", expr("ts_us div 3600000000"))
      .groupBy("hour_bucket", "event_type")
      .agg(
        count(lit(1)).as("events"),
        min("ts_us").as("first_us"),
        max("ts_us").as("last_us"))
    s.catalog.dropTempView(ViewName)
    val q = agg.writeStream.format("memory").queryName(ViewName)
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(ViewName)
      .select(col("hour_bucket"), col("event_type"), col("events"),
        col("first_us"), col("last_us"))
      .orderBy("hour_bucket", "event_type")
  }

  /** DuckDB oracle: the identical hourly rollup as plain batch SQL. */
  val HourlyTypeCountsOracleSql: String =
    """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
      | count(*) AS events,
      | min(epoch_us(ts)) AS first_us,
      | max(epoch_us(ts)) AS last_us
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
