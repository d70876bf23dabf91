package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.AvroSink

/** The Avro container arm: exact roundtrip, partition layout, and the
  * family's distinguishing feature — schema EVOLUTION on read (Avro
  * schema resolution between the file's writer schema and a different
  * reader schema).
  */
class AvroSinkSpec extends AnyFunSuite {
  private val spark = TestSession.spark
  private val sf = TestSession.sf

  private def scratch(tag: String) =
    s"/tmp/graft-avro-spec/${ProcessHandle.current().pid()}-$tag"

  test("documents roundtrip bit-exact through the avro container") {
    val docs = Tables.documents(spark, sf)
    val path = scratch("rt")
    AvroSink.writePartitioned(docs, path, partitionBy = "lang")
    val dataSchema = StructType(docs.schema.fields.filterNot(_.name == "lang"))
    val back = AvroSink.read(spark, path, dataSchema, "lang")
    val cols = docs.columns.sorted.toIndexedSeq
    val a = docs.select(cols.map(docs.col): _*).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val b = back.select(cols.map(back.col): _*).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("schema evolution: reader adds a defaulted field and drops one") {
    import spark.implicits._
    val df = Seq((1L, "alpha", "g1"), (2L, "beta", "g2"))
      .toDF("id", "name", "grp")
    val path = scratch("evo")
    AvroSink.writePartitioned(df, path, partitionBy = "grp")
    // Evolved reader: `name` dropped, nullable `score` added — Avro
    // resolution skips the former and fills the latter with its null
    // default, with no rewrite of the files.
    val evolved = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType, nullable = true)))
    val back = AvroSink.read(spark, path, evolved, "grp")
      .orderBy("id").collect()
    assert(back.toSeq == Seq(
      Row(1L, null, "g1"), Row(2L, null, "g2")))
  }

  test("partition layout: one directory per value, partition pruning by path") {
    import spark.implicits._
    val df = Seq((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "a"))
      .toDF("id", "payload", "part")
    val path = scratch("layout")
    AvroSink.writePartitioned(df, path, partitionBy = "part")
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq == Seq("part=a", "part=b"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", StringType)))
    val back = AvroSink.read(spark, path, schema, "part")
    assert(back.filter($"part" === "a").count() == 2)
    assert(back.count() == 3)
  }
}
