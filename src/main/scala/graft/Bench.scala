package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every registered query end-to-end against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Methodology: each query is executed with a **sort-preserving action** —
  * a write to the `noop` datasource — so plans that end in a global orderBy
  * pay for it (a bare `.count()` lets Catalyst's EliminateSorts drop the
  * final sort and under-measures the real plan). Each query gets one
  * warm-up run, then the median of 3 timed runs; queries whose warm-up
  * exceeds [[Bench.slowCutoffSec]] get a single timed run instead to bound
  * total wall time. A query that throws is reported with `-1` time and its
  * error class in the `errors` map — never silently folded into the total.
  */
object Bench {
  // Queries whose warm-up stays under this take the median of 3 timed
  // runs; slower ones get a single run to bound wall time. 15s covers
  // the iterative graph queries (~9-12s) — with a single run, one GC or
  // contention spike pollutes their recorded number (a clean 11.2s
  // pagerank measured 46.9s once in r5); a median does not.
  private val slowCutoffSec = 15.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the real core count: an unset env var must mean "use the
    // box", not a silent local[4] that quarters shuffle parallelism and
    // invalidates every number printed below.
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark: SparkSession = GraftSession.build(cpus, "graft-bench")

    def runOnce(name: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, None)
      } catch {
        case e: Throwable =>
          ((System.nanoTime() - t0) / 1e9, Some(e.getClass.getSimpleName))
      }
    }

    // Optional comma-separated filter for quick single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val names = SparkEntry.queries.keys.toVector.sorted
      .filter(n => only.forall(_.contains(n)))
    val results: Vector[(String, Double, Option[String])] = names.map { n =>
      val out = runOnce(n) match {
        case (_, Some(err)) => (n, -1.0, Some(err))
        case (warmSec, None) =>
          val reps = if (warmSec > slowCutoffSec) 1 else 3
          val timed = Vector.fill(reps)(runOnce(n))
          timed.collectFirst { case (_, Some(err)) => err } match {
            case Some(err) => (n, -1.0, Some(err))
            case None =>
              val sorted = timed.map(_._1).sorted
              (n, sorted(sorted.size / 2), None)
          }
      }
      // Clear between QUERIES, not between reps: iterative queries persist
      // intermediate frames, and the warm-up run is supposed to leave them
      // warm for the timed reps (clearing per-rep silently turned the
      // medians into cold-cache numbers in r4); clearing here still keeps
      // the session from accumulating every query's persisted frames.
      spark.sharedState.cacheManager.clearCache()
      out
    }

    val qs = results
      .map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results
      .collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
