package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Headered-CSV ingestion (reference: analysis/etl_spark.py:88-94 reads
  * `header=true, inferSchema=true, multiline=false` CSV from HDFS).
  *
  * Scale notes: the reference's `inferSchema` costs an extra full pass
  * over the data — at 100 TB that is a second 100 TB scan before any
  * work starts. The production path here takes an explicit schema and
  * parses timestamps in-stream; [[readInferred]] keeps the reference's
  * convenience behavior for ad-hoc use. PERMISSIVE mode + a corrupt-record
  * column make bad rows observable downstream instead of failing the job.
  */
object CsvSource {

  /** `partitions` mirrors the reference's repartition-on-extract knob
    * (reference: analysis/etl_spark.py:94) for when the file layout gives
    * too few splits to saturate the cluster (one giant gzip, a handful of
    * small files). Left unset, the scan keeps Spark's size-based splits —
    * the right default for splittable data.
    */
  def read(
      s: SparkSession,
      path: String,
      schema: StructType,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss",
      partitions: Option[Int] = None): DataFrame = {
    val df = s.read
      .option("header", "true")
      .option("multiLine", "false")
      .option("timestampFormat", timestampFormat)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
    partitions.fold(df)(df.repartition)
  }

  /** Reference-faithful inference path — ad-hoc only (extra full scan). */
  def readInferred(s: SparkSession, path: String): DataFrame =
    s.read
      .option("header", "true")
      .option("multiLine", "false")
      .option("inferSchema", "true")
      .csv(path)
}
