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
}
