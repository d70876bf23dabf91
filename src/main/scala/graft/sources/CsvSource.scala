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

  def read(
      s: SparkSession,
      path: String,
      schema: StructType,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    s.read
      .option("header", "true")
      .option("multiLine", "false")
      .option("timestampFormat", timestampFormat)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Reference-faithful inference path — ad-hoc only (extra full scan). */
  def readInferred(s: SparkSession, path: String): DataFrame =
    s.read
      .option("header", "true")
      .option("multiLine", "false")
      .option("inferSchema", "true")
      .csv(path)
}
