package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hierarchical exact ranking — the reusable form of the pattern
  * [[WindowOps.lengthQuartiles]] introduced: a global (or per-group)
  * dense 1-based rank over (value, tie) computed WITHOUT ever sorting a
  * whole group through one task. Rows bucket by a coarse value
  * expression; per-bucket counts collapse map-side; a narrow carry-in
  * window (bucket-domain-bounded rows — the ONLY serial step) prefixes
  * the counts; each row's rank is carry-in + row_number within its
  * bucket. Exactly row_number() over (partition by part order by value,
  * tie) — proven by the native-window oracles of every query built on
  * this — at bucket-level parallelism instead of group-level.
  */
object RankOps {

  /** Adds `rankCol` = 1-based exact rank of (value, tie) within `part`
    * (global when `part` is empty — the carry window then runs over the
    * value-bucket domain, never the rows). `bucketExpr` is a SQL
    * expression over the row that must be ascending-aligned with
    * `value` (same bucket ⇒ contiguous value range), e.g.
    * `"n_chars div 16"`. CAVEAT: `div` truncates toward zero, so a
    * plain `value div K` bucket is ascending-aligned only for
    * NON-NEGATIVE values (−5 div 16 == +5 div 16 == 0 would merge the
    * signs); every current caller ranks a non-negative measure — offset
    * the value first if a signed domain ever needs ranking.
    */
  def withHierarchicalRank(
      df: DataFrame,
      part: Seq[String],
      value: String,
      tie: String,
      bucketExpr: String,
      rankCol: String): DataFrame = {
    val vb = s"__vb_$rankCol"
    val cc = s"__carry_$rankCol"
    val d = df.withColumn(vb, expr(bucketExpr))
    val carryWin = Window.partitionBy(part.map(col): _*).orderBy(vb)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = d.groupBy((part :+ vb).map(col): _*)
      .agg(count(lit(1)).as(s"__c_$rankCol"))
      .withColumn(cc,
        coalesce(sum(s"__c_$rankCol").over(carryWin), lit(0L)))
      .select((part :+ vb :+ cc).map(col): _*)
    val rowWin = Window.partitionBy((part :+ vb).map(col): _*)
      .orderBy(col(value), col(tie))
    d.join(carry, part :+ vb)
      .withColumn(rankCol, col(cc) + row_number().over(rowWin))
      .drop(vb, cc)
  }

  /** NTILE(`buckets`) bucket of a 1-based `rank` among `cnt` rows — the
    * exact SQL NTILE contract (first `cnt % buckets` tiles take the
    * extra row) as pure integer Column arithmetic.
    */
  def ntileOf(rank: String, cnt: String, buckets: Int): Column = expr(
    s"""CASE WHEN $rank <= ($cnt div $buckets + 1) * ($cnt % $buckets)
       | THEN ($rank - 1) div ($cnt div $buckets + 1) + 1
       | ELSE ($cnt % $buckets) +
       |  ($rank - 1 - ($cnt div $buckets + 1) * ($cnt % $buckets)) div ($cnt div $buckets) + 1
       |END""".stripMargin)
}
