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
