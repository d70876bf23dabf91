package graft.sinks

import org.apache.spark.sql.DataFrame

/** Load-phase parquet writer (reference: analysis/etl_spark.py:250-259
  * persists the transformed output; here generalized to the partitioned
  * layout a 100 TB pipeline needs).
  *
  * Scale notes: partitioning by a low-cardinality column gives partition
  * pruning to every downstream reader; `sortWithinPartitions` on the
  * usual filter key maximizes parquet row-group min/max skipping without
  * a global sort; `maxRecordsPerFile` bounds file sizes so a skewed
  * partition cannot produce one giant file. Never `coalesce(1)` — that
  * funnels the write through a single task.
  */
object ParquetSink {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String],
      sortWithin: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val sorted =
      if (sortWithin.nonEmpty) df.sortWithinPartitions(sortWithin.map(df.col): _*)
      else df
    sorted.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
