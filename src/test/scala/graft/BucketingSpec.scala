package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the pre-shuffle strategy the scale
  * design (SURVEY §5) names for repeated fact-fact joins: both tables
  * bucketed on the join key join WITHOUT any Exchange.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("bucketed tables join with no shuffle exchange") {
    // warehouse dir is set statically in GraftSession (/tmp/graft-warehouse)
    val orders = Tables.orders(spark, TestSession.sf)
    val lineitem = Tables.lineitem(spark, TestSession.sf)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("lines"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 6000L)
      // the join keys must never be shuffled — the bucket layout IS the
      // partitioning (the post-join groupBy key may still exchange)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
