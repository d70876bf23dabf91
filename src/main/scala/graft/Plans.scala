package graft

/** Dev utility: print the formatted physical plan of registered queries
  * (`runMain graft.Plans [name ...]`) for pushdown/broadcast/codegen
  * audits. Not part of the driver contract.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-plans")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
