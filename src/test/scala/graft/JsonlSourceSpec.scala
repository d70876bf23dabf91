package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonlSource

class JsonlSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("explicit-schema JSONL round-trips documents") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, TestSession.sf)
      .select("doc_id", "text", "lang")
    docs.write.mode("overwrite").json(dir)

    val back = JsonlSource.read(spark, dir, schema)
    assert(back.count() == docs.count())
    val sumOrig = docs.agg(sum("doc_id")).head.getLong(0)
    assert(back.agg(sum("doc_id")).head.getLong(0) == sumOrig)
    // Embedded newlines survive JSONL escaping — the ingest path the
    // dot-all fingerprint oracles exist for.
    assert(back.schema.fieldNames.contains(JsonlSource.CorruptColumn))
  }

  test("malformed lines land in the corrupt-record column, not as failures") {
    val dir = Files.createTempDirectory("graft-jsonl2").toString
    Files.writeString(
      Paths.get(s"$dir/data.jsonl"),
      """{"doc_id": 1, "text": "ok one", "lang": "en"}
        |this is not json
        |{"doc_id": 3, "text": "line\nwith\nnewlines", "lang": "en"}
        |""".stripMargin)
    val back = JsonlSource.read(spark, s"$dir/data.jsonl", schema).cache()
    assert(back.count() == 3)
    assert(back.filter(col(JsonlSource.CorruptColumn).isNotNull).count() == 1)
    val multi = back.filter(col("doc_id") === 3).head.getString(1)
    assert(multi == "line\nwith\nnewlines")
    back.unpersist()
  }
}
