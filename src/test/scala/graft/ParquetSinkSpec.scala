package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.ParquetSink

class ParquetSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("partitioned write round-trips and prunes partitions") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val docs = Tables.documents(spark, TestSession.sf)
    ParquetSink.writePartitioned(docs, dir, Seq("lang"), sortWithin = Seq("doc_id"))

    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    // partition layout on disk: lang=<value> directories
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("lang=")))
    // partition pruning: a lang filter reads only that partition
    val plan = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    val en = back.filter(col("lang") === "en").count()
    assert(en == docs.filter(col("lang") === "en").count())
  }

  test("orc round-trips with identical contents (alternate columnar format)") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/docs"
    val docs = Tables.documents(spark, TestSession.sf).select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").partitionBy("lang").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = back.select("doc_id", "lang").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq)
    // Predicate pushdown reaches the ORC reader too.
    val plan = back.filter(col("n_chars") > 300).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars"), plan)
  }
}
