package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Audience analytics over the events stream: behavioral-segment overlap
  * (which event-type audiences share users) and exponential-decay
  * recency scoring (the "engagement freshness" feature a ranking model
  * consumes). Both collapse the corpus to bounded frames — |types|² and
  * per-user rows — before any join or window runs.
  */
object AudienceOps {

  private val DayUs = 86400000000L

  /** Audience-overlap matrix: for every event-type pair (a ≤ b), how
    * many distinct users did both, with the Jaccard overlap in ppm. The
    * corpus collapses to distinct (user, type) pairs first (one
    * map-side-combined exchange); the pair self-join is user-keyed with
    * per-user fan-out ≤ |types|², a constant — never a corpus×corpus
    * join. Per-type audience sizes ride a broadcast join onto the
    * |types|²-row result.
    */
  def audienceOverlap(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = ut.as("x")
      .join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") <= col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("both_users"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("na"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("nb"))), "type_b")
      .select(col("type_a"), col("type_b"), col("both_users"),
        expr("(1000000 * both_users) div (na + nb - both_users)")
          .as("jaccard_ppm"))
      .orderBy("type_a", "type_b")
  }

  val AudienceOverlapOracleSql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |sz AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type),
      |iv AS (
      | SELECT x.event_type AS type_a, y.event_type AS type_b,
      |  count(*) AS both_users
      | FROM ut x JOIN ut y ON x.user_id = y.user_id
      |  AND x.event_type <= y.event_type
      | GROUP BY 1, 2)
      |SELECT iv.type_a, iv.type_b, iv.both_users,
      | (1000000 * iv.both_users) // (a.n + b.n - iv.both_users)
      |  AS jaccard_ppm
      |FROM iv JOIN sz a ON a.event_type = iv.type_a
      | JOIN sz b ON b.event_type = iv.type_b
      |ORDER BY type_a, type_b""".stripMargin

  /** Exponential-decay recency scores: each event contributes
    * `1e6 div 2^min(age_days, 40)` (half-life = one day, integer power
    * of two via shift — no engine-variant floating exp), summed per
    * user; top `k` users by decayed engagement. The age clamp keeps the
    * shift in range and is semantically free (2^-40 is below the e6
    * fixed-point floor). One scalar max-day broadcast, one user-keyed
    * map-side-combined aggregate, TakeOrdered top-k.
    */
  def recencyScores(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val ev = Tables.events(s, dir)
    val mx = ev.agg(expr(s"max(ts_us div $DayUs)").as("mxday"))
    ev.crossJoin(broadcast(mx))
      .select(col("user_id"),
        expr(s"mxday - (ts_us div $DayUs)").as("age"))
      .select(col("user_id"),
        expr("1000000 div shiftleft(1L, cast(least(age, 40L) as int))")
          .as("w"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("events"), sum("w").as("recency_e6"))
      .orderBy(desc("recency_e6"), col("user_id"))
      .limit(k)
  }

  def recencyScoresOracleSql(k: Int = 100): String =
    s"""WITH e AS (
       | SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |m AS (SELECT max(day) AS mxday FROM e),
       |w AS (
       | SELECT user_id,
       |  1000000 // (1::BIGINT << CAST(least(mxday - day, 40) AS INTEGER)) AS w
       | FROM e, m)
       |SELECT user_id, count(*) AS events,
       | CAST(sum(w) AS BIGINT) AS recency_e6
       |FROM w GROUP BY user_id
       |ORDER BY recency_e6 DESC, user_id LIMIT $k""".stripMargin

  /** A/B experiment readout: users hash-split into two arms
    * (`user_id % 2` — the deterministic stand-in for an assignment
    * service), then per event type each arm reports its audience, event
    * volume, and events-per-user in milli, plus the B-vs-A lift in ppm.
    * The shape every experimentation pipeline runs: one (type, arm)
    * aggregate (map-side combined, &#124;types&#124;×2 rows), pivoted by a
    * conditional re-aggregate — no self-join of the corpus.
    */
  def abMetrics(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2).as("arm"))
      .groupBy("event_type", "arm")
      .agg(countDistinct("user_id").as("users"), count(lit(1)).as("events"))
      .groupBy("event_type")
      .agg(
        sum(when(col("arm") === 0, col("users"))).as("users_a"),
        sum(when(col("arm") === 1, col("users"))).as("users_b"),
        sum(when(col("arm") === 0, col("events"))).as("events_a"),
        sum(when(col("arm") === 1, col("events"))).as("events_b"))
      .select(col("event_type"),
        col("users_a"), col("users_b"), col("events_a"), col("events_b"),
        expr("(1000 * events_a) div greatest(users_a, 1)").as("epu_a_milli"),
        expr("(1000 * events_b) div greatest(users_b, 1)").as("epu_b_milli"),
        expr("""(1000000 * ((1000 * events_b) div greatest(users_b, 1)
          |  - (1000 * events_a) div greatest(users_a, 1)))
          | div greatest((1000 * events_a) div greatest(users_a, 1), 1)"""
          .stripMargin).as("lift_ppm"))
      .orderBy("event_type")
  }

  val AbMetricsOracleSql: String =
    """WITH g AS (
      | SELECT event_type, user_id % 2 AS arm,
      |  count(DISTINCT user_id) AS users, count(*) AS events
      | FROM events GROUP BY 1, 2),
      |p AS (
      | SELECT event_type,
      |  sum(CASE WHEN arm = 0 THEN users END) AS users_a,
      |  sum(CASE WHEN arm = 1 THEN users END) AS users_b,
      |  sum(CASE WHEN arm = 0 THEN events END) AS events_a,
      |  sum(CASE WHEN arm = 1 THEN events END) AS events_b
      | FROM g GROUP BY event_type)
      |SELECT event_type,
      | CAST(users_a AS BIGINT) AS users_a, CAST(users_b AS BIGINT) AS users_b,
      | CAST(events_a AS BIGINT) AS events_a, CAST(events_b AS BIGINT) AS events_b,
      | CAST((1000 * events_a) // greatest(users_a, 1) AS BIGINT) AS epu_a_milli,
      | CAST((1000 * events_b) // greatest(users_b, 1) AS BIGINT) AS epu_b_milli,
      | CAST((1000000 * ((1000 * events_b) // greatest(users_b, 1)
      |   - (1000 * events_a) // greatest(users_a, 1)))
      |  // greatest((1000 * events_a) // greatest(users_a, 1), 1) AS BIGINT)
      |  AS lift_ppm
      |FROM p ORDER BY event_type""".stripMargin
}
