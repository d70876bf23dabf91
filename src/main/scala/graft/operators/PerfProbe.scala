package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-isolation timing probe (guide §1.4/§1.5): times named sub-frames
  * of expensive query families with the noop sink so the computation, not
  * the output write, is measured. Diagnostic main only — never registered,
  * never part of the bench; exists so plan-level claims in
  * OPTIMIZATION_r*.md trace to a committed, re-runnable measurement.
  *
  * Usage: `runMain graft.operators.PerfProbe <family> [reps]` with
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as in [[graft.Bench]].
  */
object PerfProbe {

  private def time(s: SparkSession, name: String, reps: Int)(
      df: => DataFrame): Unit = {
    s.sparkContext.setJobDescription(s"probe: $name")
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"PROBE $name%-38s median ${ts(ts.size / 2)}%7.3f  reps ${ts.map(t => f"$t%.3f").mkString(" ")}")
    s.sparkContext.setJobDescription(null)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val s = graft.GraftSession.build(cpus, "graft-perfprobe")
    s.sparkContext.setLogLevel("ERROR")
    val family = args.headOption.getOrElse("ann")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    def t(name: String)(df: => DataFrame): Unit = time(s, name, reps)(df)

    family match {
      case "ann" =>
        t("embeddings.scan")(graft.Tables.embeddings(s, dir))
        t("ivf.codedScan") {
          import org.apache.spark.sql.functions._
          val (cents, _) = LloydOps.frozenCentroids(s, dir, LloydOps.K)
          graft.Tables.embeddings(s, dir).select(
            col("vec_id").as("c_id"),
            LloydOps.clusterCol(cents)(
              LloydOps.quantizeCol(col("embedding"))).as("cluster"))
        }
        t("pqEncode")(PqOps.pqEncode(s, dir))
        t("annTopK.exact")(AnnOps.annTopK(s, dir))
        t("ivfProbeFrames.asg") {
          val (asg, _) = LloydOps.ivfProbeFrames(s, dir, 5, LloydOps.IvfProbes)
          asg
        }
        t("annIvfPqTopK")(PqOps.annIvfPqTopK(s, dir))
        t("annRecallIvfPq")(PqOps.annRecallIvfPq(s, dir))
        t("annIvfPqRerankTopK")(PqOps.annIvfPqRerankTopK(s, dir))
        t("annRecallIvfPqRerank")(PqOps.annRecallIvfPqRerank(s, dir))
        t("annPqTopK")(PqOps.annPqTopK(s, dir))
        t("annLshPqTopK")(PqOps.annLshPqTopK(s, dir))
      case "bpe" =>
        t("charStream-ish: documents scan")(graft.Tables.documents(s, dir))
        t("bpeMerges rounds=2")(BpeOps.bpeMerges(s, dir, rounds = 2))
        t("bpeMerges rounds=8")(BpeOps.bpeMerges(s, dir, rounds = 8))
      case "tri" =>
        t("triangle_count")(GraphOps.triangleCount(s, dir))
        t("clustering_coeff")(LinkOps.clusteringCoeff(s, dir))
      case "edges" =>
        t("edges.build")(GraphOps.edges(s, dir))
        val tmp = java.nio.file.Files.createTempDirectory("graft-edges-probe")
        GraphOps.edges(s, dir).write.mode("overwrite").parquet(tmp.toString)
        t("edges.storedRead")(s.read.parquet(tmp.toString))
        t("degrees.viaBuild")(GraphOps.degrees(s, dir))
      case "mid" =>
        import org.apache.spark.sql.functions._
        t("profile_columns")(ProfileOps.profileColumns(s, dir))
        t("quantiles_density")(WindowOps.quantilesDensityByFlag(s, dir))
        t("median_density")(WindowOps.medianDensityByFlag(s, dir))
        t("hist.asIs") {
          graft.Tables.lineitem(s, dir)
            .select(col("l_returnflag"),
              floor(col("l_extendedprice") / (col("l_quantity") + lit(1)) * 1000 + 0.5)
                .cast("long").as("density_milli"))
            .groupBy("l_returnflag", "density_milli")
            .agg(count(lit(1)).as("c"))
        }
        t("hist.parallelized") {
          graft.Tables.parallelized(graft.Tables.lineitem(s, dir))
            .select(col("l_returnflag"),
              floor(col("l_extendedprice") / (col("l_quantity") + lit(1)) * 1000 + 0.5)
                .cast("long").as("density_milli"))
            .groupBy("l_returnflag", "density_milli")
            .agg(count(lit(1)).as("c"))
        }
      case other =>
        println(s"unknown family: $other")
    }
    s.stop()
  }
}
