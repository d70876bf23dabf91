package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.GraftSession


/** Scratch diagnostic (not part of the driver contract): print the
  * bit-length of the optimizer's `sizeInBytes` statistic per converged
  * min-label round, for jump depths 1..3 — quantifies the statistics
  * compounding through localCheckpoint's carried `originStats` that can
  * send Catalyst's BigInt arithmetic superlinear in round count.
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val jumps = args.headOption.map(_.toInt).getOrElse(1)
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val s = GraftSession.build("8", "stats-probe")
    s.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(s, sfDir)
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_partkey"))
    val und = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val dirEdges = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = dirEdges.select(col("src").as("node")).distinct()
    val n = nodes.count()
    var labels = GraphOps.truncate(s, nodes.withColumn("label", col("node")))
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val neighborMin = dirEdges
        .join(GraphOps.roundSide(labels.withColumnRenamed("node", "src"), n), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("label").as("nbr_label"))
      val combined = labels
        .join(GraphOps.roundSide(neighborMin, n), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          col("label").as("prev_label"))
      val jumped = GraphOps.staleJumps(combined, labels, Some(n), "node", "label", jumps)
      val next = GraphOps.truncate(s, jumped)
      val changed = next.filter(col("label") =!= col("prev_label")).isEmpty
      val bits = next.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"round $r%2d  jumps=$jumps  bits=$bits%10d  ms=$ms%8.1f  converged=$changed")
      labels = next.select("node", "label")
      if (changed) { println("fixpoint"); return }
    }
  }
}
