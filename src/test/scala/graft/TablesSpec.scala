package graft

import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary. A Spark engine upgrade changed how parquet
  * TIMESTAMP(NANOS) surfaces (nanos-as-long under the legacy conf →
  * native timestamp_ntz in 4.1+), which silently broke every `events`
  * consumer at once. These cheap assertions fail with a pointed message
  * on the next such drift instead of 29 opaque downstream errors:
  *   1. `Tables.events` must expose an epoch-micros BIGINT `ts_us`
  *      whatever the engine does with the raw `ts` column, and its value
  *      must equal the independently-computed epoch micros of the row.
  *   2. Every registered query must at least pass analysis (`.schema`
  *      forces resolution without executing) at sf0.001.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("events.ts_us is an epoch-micros BIGINT under the current engine") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_us").dataType == LongType,
      s"ts_us must be BIGINT, got ${ev.schema("ts_us").dataType}; " +
        "the engine's parquet TIMESTAMP(NANOS) read path changed — fix Tables.events")
  }

  test("events.ts_us matches an independent micros computation on a sample row") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).orderBy("event_id").limit(5)
    // Independent path: format the raw ts to a string and re-parse. Works for
    // both engine read modes (long nanos / timestamp_ntz) without sharing the
    // arithmetic under test.
    val rows = ev.select(col("ts").cast("string").as("ts_str"), col("ts_us")).collect()
    rows.foreach { r =>
      val tsUs = r.getLong(1)
      val str = r.getString(0)
      val expected =
        if (str.forall(c => c.isDigit || c == '-')) str.toLong / 1000L // nanos-as-long mode
        else {
          val ldt = java.time.LocalDateTime.parse(str.replace(' ', 'T'))
          val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
          inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        }
      assert(tsUs == expected, s"ts_us=$tsUs != independent micros $expected (raw=$str)")
    }
  }

  test("every registered query analyzes at sf0.001 (resolution only, no execution)") {
    val failures = Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { val s: StructType = fn(spark, sf).schema; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"queries failing analysis:\n${failures.mkString("\n")}")
  }
}
