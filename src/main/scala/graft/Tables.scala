package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the benchmark tables (one parquet file per table, see
  * TESTDATA.md). All queries take the sf directory at call time so the same
  * plan builds against any scale factor — at cluster scale these would be
  * partitioned table paths instead of single files, and every reader below
  * goes through the vectorized parquet scan with pushdown/pruning intact.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects by default; read it as an epoch-nanos long (the
    * supported `nanosAsLong` path) and expose an exact epoch-micros column
    * (`ts_us`, integral `div` — no doubles: epoch-nanos exceeds 2^53).
    * This matches DuckDB's read of the same file, which truncates to
    * microsecond TIMESTAMP, so `ts_us` == `epoch_us(ts)` bit-for-bit.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
