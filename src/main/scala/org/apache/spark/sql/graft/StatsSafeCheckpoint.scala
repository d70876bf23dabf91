package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Strip the `originStats` a `Dataset.checkpoint`/`localCheckpoint` carries
  * into its `LogicalRDD` (SPARK-39834).
  *
  * Why this exists: Catalyst's size-only estimator multiplies child
  * `sizeInBytes` through every join, and `LogicalRDD.fromDataset` persists
  * the ORIGIN plan's estimate into the checkpointed leaf — so in an
  * iterative loop each round's estimate compounds multiplicatively into
  * the next round's leaf. The estimate is an unbounded `BigInt`: measured
  * on the converged min-label loop at sf0.01, its BIT LENGTH doubles per
  * round per previous-frame reference (~1e6 bits by round 15 with one
  * stale-jump reference; a deeper jump chase reached ~1e9 bits, where one
  * Karatsuba/Toom-Cook multiply inside `SizeInBytesOnlyStatsPlanVisitor`
  * runs for MINUTES of driver CPU — the loop wall cost turns
  * superlinear in round count, i.e. exactly the 100×-scale hazard the
  * converged modes exist to avoid).
  *
  * The checkpoint exists to TRUNCATE lineage; carrying the origin's
  * estimate re-couples rounds through the stats channel. Dropping it
  * resets the leaf to `defaultSizeInBytes` (conservative: never
  * accidentally broadcast) — every loop join is explicitly size-guarded
  * (`roundSide`) and AQE re-plans from RUNTIME shuffle sizes, so no join
  * decision in this codebase reads the dropped estimate.
  *
  * Lives under `org.apache.spark.sql` because `Dataset.ofRows` is
  * `private[sql]`; everything referenced is Spark's public-source API
  * surface (ExistingRDD.scala), no reflection.
  */
object StatsSafeCheckpoint {

  /** Rebuild a just-checkpointed DataFrame around the same checkpointed
    * RDD, partitioning and ordering, but without the carried origin
    * statistics/constraints. No-op for non-`LogicalRDD` plans.
    */
  def dropOriginStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val clean = LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(ds.sparkSession, None, None)
        classic.Dataset.ofRows(ds.sparkSession, clean)
      case _ => df
    }
  }
}
