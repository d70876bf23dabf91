package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables

/** As-of join — for each left row, the single right row with the largest
  * time <= the left row's time, per key. Spark has no native ASOF
  * operator; the brief's extension ladder names it a canonical candidate,
  * and tier (a) — composition — fully expresses it:
  *
  * tag both sides, union them, and run ONE running-frame window per key
  * ordered by (time, side, tie): a `last(right_payload, ignoreNulls)`
  * carry-forward makes every left row see exactly the most recent
  * right-side row at or before its timestamp. Right rows sort before
  * left rows at equal timestamps (side 0 < 1), giving `right.t <= left.t`
  * inclusive semantics; the tie column makes the winner among equal
  * right timestamps deterministic (max tie wins).
  *
  * Scale notes (100 TB): ONE shuffle total — the exchange on the key for
  * the window — versus the naive `left join right on key and r.t <= l.t`
  * + max-filter, which fans out |L|×|R| rows per key before pruning
  * (quadratic on hot keys). The running frame is computed incrementally
  * in a single pass per partition with O(1) carry state, and AQE
  * skew-splitting applies to the one exchange. This union+carry shape is
  * also exactly how the streaming twin would express it
  * (flatMapGroupsWithState carrying the same struct).
  */
object AsofJoinOps {

  /** Internal tag/carry columns the union+window formulation introduces;
    * inputs must not already use these names (or `matchedName`), or the
    * `struct(left.columns...)` capture and final select would resolve
    * against the wrong columns — validated, not silently misbehaving.
    */
  private val ReservedCols = Seq("__k", "__t", "__tie", "__side", "__l", "__r")

  /** Generic as-of join: returns every `left` row (all its columns) plus
    * `matched` — a struct of the as-of `right` row's columns, null when
    * no right row precedes. `key`/`time`/`tie` must exist in both frames.
    * Input columns must not collide with the reserved internal names or
    * `matchedName` (validated; IllegalArgumentException otherwise).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tie: String,
      matchedName: String = "matched"): DataFrame = {
    val clash = (left.columns ++ right.columns).distinct
      .filter(c => ReservedCols.contains(c) || c == matchedName)
    require(
      clash.isEmpty,
      s"asOfJoin inputs collide with reserved/internal column names: " +
        s"${clash.mkString(", ")} (reserved: ${ReservedCols.mkString(", ")}, " +
        s"matchedName: $matchedName)")
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lNorm = left.select(
      col(key).as("__k"), col(time).as("__t"), col(tie).as("__tie"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rNorm = right.select(
      col(key).as("__k"), col(time).as("__t"), col(tie).as("__tie"),
      lit(0).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.union(rNorm)
      .withColumn(matchedName, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col(matchedName)): _*)
  }

  /** Registered query: each purchase joined as-of to the user's most
    * recent click at or before it, with the microsecond gap (a classic
    * attribution query). Integral microsecond times keep it engine-exact.
    */
  def purchaseAsofClick(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts_us"), col("event_id"))
    asOfJoin(side("purchase"), side("click"), "user_id", "ts_us", "event_id")
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        col("matched.event_id").as("click_event_id"),
        col("matched.ts_us").as("click_ts_us"),
        (col("ts_us") - col("matched.ts_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** DuckDB oracle: the identical union + running carry-forward window
    * (DuckDB's native ASOF JOIN exists but leaves ties among equal right
    * timestamps unspecified; this formulation is deterministic in both
    * engines).
    */
  val OracleSql: String =
    """WITH u AS (
      | SELECT user_id, epoch_us(ts) AS ts_us, 0 AS side, event_id
      | FROM events WHERE event_type = 'click'
      | UNION ALL
      | SELECT user_id, epoch_us(ts), 1, event_id
      | FROM events WHERE event_type = 'purchase'),
      |w AS (
      | SELECT user_id, ts_us, side, event_id,
      |  last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER win AS click_event_id,
      |  last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS) OVER win AS click_ts_us
      | FROM u
      | WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, side, event_id ROWS UNBOUNDED PRECEDING))
      |SELECT event_id, user_id, ts_us, click_event_id, click_ts_us,
      | ts_us - click_ts_us AS gap_us
      |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin
}
