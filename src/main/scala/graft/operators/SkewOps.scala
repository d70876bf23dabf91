package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Explicit skew mitigation: two-phase salted aggregation.
  *
  * A power-law key (one user producing a large share of events) turns a
  * plain `groupBy(key)` into a single hot reducer. The salted form first
  * aggregates on `(key, salt)` — spreading a hot key over `salts`
  * reducers — then merges the partials per key. Both phases are hash
  * aggregates with map-side partial combine; the result is bit-identical
  * to the unsalted aggregate because the merged measures (counts and
  * decimal sums) are associative and order-independent.
  *
  * AQE's skew-join splitting handles skewed JOINS automatically, but
  * skewed AGGREGATIONS still need this shape when a single key's
  * partial-aggregate state is itself too hot — the registered query
  * proves the equivalence against the plain-SQL oracle.
  */
object SkewOps {

  /** Per-user event count + exact value sum via salted two-phase
    * aggregation; salt = event_id mod `salts` (any uniform row-level
    * value works — the salt only has to spread rows, not be random).
    */
  def saltedUserStats(s: SparkSession, dir: String, salts: Int = 16): DataFrame =
    Tables.events(s, dir)
      .select(
        col("user_id"),
        pmod(col("event_id"), lit(salts)).as("salt"),
        col("value"))
      .groupBy("user_id", "salt")
      .agg(
        count(lit(1)).as("partial_cnt"),
        sum(col("value").cast("decimal(25,10)")).as("partial_sum"))
      .groupBy("user_id")
      .agg(
        sum("partial_cnt").cast("long").as("events"),
        round(sum("partial_sum").cast("double"), 4).as("value_sum"))
      .orderBy("user_id")
}
