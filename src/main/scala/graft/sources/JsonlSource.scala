package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines ingestion — the de-facto interchange format for LLM
  * training corpora (one JSON document per line).
  *
  * Scale notes: like [[CsvSource]], the production path takes an explicit
  * schema — schema inference on JSON costs a full extra pass AND widens
  * every ambiguous field to string. Line-delimited (`multiLine=false`)
  * keeps the input splittable: a 100 TB corpus of JSONL splits at line
  * boundaries across executors, whereas a multi-line JSON array must be
  * parsed by a single task per file. PERMISSIVE mode + corrupt-record
  * column surface malformed lines as data instead of job failures.
  */
object JsonlSource {

  val CorruptColumn = "_corrupt_record"

  def read(
      s: SparkSession,
      path: String,
      schema: StructType,
      partitions: Option[Int] = None): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptColumn)) schema
      else schema.add(CorruptColumn, "string")
    val df = s.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .option("multiLine", "false")
      .schema(withCorrupt)
      .json(path)
    partitions.fold(df)(df.repartition)
  }
}
