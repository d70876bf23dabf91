package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CsvSource

class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("explicit-schema CSV round-trips the events table") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val events = Tables.events(spark, TestSession.sf)
      .select("event_id", "user_id", "event_type", "value")
    events.write.mode("overwrite").option("header", "true").csv(dir)

    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val back = CsvSource.read(spark, dir, schema)
    assert(back.count() == 1000)
    assert(back.schema == schema)
    val sumOrig = events.agg(sum("event_id")).head.getLong(0)
    assert(back.agg(sum("event_id")).head.getLong(0) == sumOrig)
  }

  test("PERMISSIVE mode keeps malformed rows observable, not fatal") {
    val dir = Files.createTempDirectory("graft-csv3").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,value\n1,10.5\nnot_a_number,oops\n3,30.0\n")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("value", DoubleType),
      StructField("_corrupt_record", StringType)))
    val back = CsvSource.read(spark, s"$dir/data.csv", schema).cache()
    assert(back.count() == 3) // bad row present, not dropped
    val bad = back.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getString(2).startsWith("not_a_number"))
    assert(back.filter(col("id").isNotNull).count() == 2)
  }

  test("inferred-schema path matches the reference's convenience read") {
    val dir = Files.createTempDirectory("graft-csv2").toString
    Tables.documents(spark, TestSession.sf)
      .select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = CsvSource.readInferred(spark, dir)
    assert(back.count() == 500)
    assert(back.schema("doc_id").dataType == LongType ||
      back.schema("doc_id").dataType == IntegerType)
  }
}
