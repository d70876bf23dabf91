package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed-Dataset aggregation: bounded top-k per group via a custom
  * [[Aggregator]] used as a `TypedColumn` — the `Dataset[T]` tier of the
  * API surface.
  *
  * Scale notes: because it runs through `KeyValueGroupedDataset.agg`,
  * Spark applies it with partial aggregation — each map task reduces its
  * rows into a k-element buffer BEFORE the shuffle, so the exchange
  * carries at most k entries per (task, key). A window-function top-k
  * shuffles every row to sort whole partitions; for "top 3 of millions
  * per key" this moves orders of magnitude less data.
  */
object TopKOps {

  type Entry = (Double, Long) // (value, event_id) — id breaks ties

  final case class TopKBuffer(items: List[Entry])
  final case class TopKOutput(items: Seq[Entry])

  /** Keeps the k largest entries (value desc, id asc), associatively.
    * Input rows are (event_type, value, event_id); the type key is
    * handled by groupByKey, the aggregator only buffers (value, id).
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[(String, Double, Long), TopKBuffer, TopKOutput] {
    private def desc(e: Entry): (Double, Long) = (-e._1, e._2)
    // Amortized bounded insert (same shape as AnnOps.CosTopK): cons per
    // row, prune back to the k largest only at 2k occupancy.
    override def zero: TopKBuffer = TopKBuffer(Nil)
    override def reduce(buf: TopKBuffer, row: (String, Double, Long)): TopKBuffer = {
      val grown = (row._2, row._3) :: buf.items
      TopKBuffer(
        if (grown.lengthCompare(2 * k) >= 0) grown.sortBy(desc).take(k) else grown)
    }
    override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
      TopKBuffer((a.items ++ b.items).sortBy(desc).take(k))
    override def finish(r: TopKBuffer): TopKOutput = TopKOutput(r.items.sortBy(desc).take(k))
    override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
    override def outputEncoder: Encoder[TopKOutput] = Encoders.product[TopKOutput]
  }

  /** Top `k` events by value per event type, exploded back to rows:
    * (event_type, rank, event_id, value) ordered by type then rank.
    */
  def topEventsPerType(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .filter(col("value").isNotNull)
      .as[(String, Double, Long)]
    val topCol = new TopKAggregator(k).toColumn
    events
      .groupByKey(_._1)
      .agg(topCol.name("top"))
      .toDF("event_type", "top")
      .select(col("event_type"), posexplode(col("top.items")))
      .select(
        col("event_type"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("event_id"),
        col("col._1").as("value"))
      .orderBy("event_type", "rank")
  }

  /** Log-compaction / latest-record-per-key — the CDC pattern: for every
    * user, the single most recent event ((ts, id)-max; id breaks
    * timestamp ties deterministically), payload carried along.
    *
    * Scale shape: `max(struct(...))` is an ordinary aggregate — partial
    * aggregation reduces each map task to ONE candidate row per key
    * before the exchange, so the shuffle carries O(keys) rows. The
    * `row_number() = 1` window formulation (which the ORACLE runs — an
    * independent algorithm) would instead shuffle and SORT every row of
    * every key; at 100 TB of append logs that difference is the job.
    * Struct comparison is lexicographic by field order, so (ts_us,
    * event_id) leads the struct and the payload never participates.
    */
  def latestEventPerUser(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(max(struct(
        col("ts_us"), col("event_id"), col("event_type"), col("value"))).as("m"))
      .select(
        col("user_id"),
        col("m.ts_us").as("ts_us"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"),
        col("m.value").as("value"))
      .orderBy("user_id")

  val LatestOracleSql: String =
    """WITH r AS (
      | SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
      |  row_number() OVER (PARTITION BY user_id
      |   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      | FROM events)
      |SELECT user_id, ts_us, event_id, event_type, value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** CDC merge (upsert): fold an update batch into a keyed snapshot with
    * latest-wins conflict resolution — the lakehouse MERGE shape. The
    * registered entry carves `events` deterministically (event_id mod 10:
    * 0-7 = the standing snapshot's source rows, 8-9 = the incoming
    * batch), reduces EACH side to its latest row per user, then resolves
    * per key: `insert` (key new in the batch), `update` (batch row is
    * newer), `stale_update` (batch row is older than the snapshot — the
    * out-of-order delivery a naive overwrite corrupts), `carry` (no batch
    * row; snapshot state flows through).
    *
    * Scale shape: both sides collapse via the same bounded max(struct)
    * partial aggregation as [[latestEventPerUser]] — the shuffle carries
    * one row per key per side, never the event log — and the resolve is
    * ONE full-outer join on the key. A production snapshot is bucketed by
    * key on disk, so its side joins exchange-free and the merge cost is
    * O(batch keys + touched buckets), independent of snapshot size.
    * Ordering compares (ts_us, event_id) — the struct's leading fields,
    * unique per event — so the payload never decides a winner.
    */
  def cdcMerge(s: SparkSession, dir: String): DataFrame = {
    def latest(df: DataFrame) = df.groupBy("user_id")
      .agg(max(struct(
        col("ts_us"), col("event_id"), col("event_type"), col("value"))).as("m"))
    val ev = Tables.events(s, dir)
    val snap = latest(ev.filter(col("event_id") % 10 < 8)).withColumnRenamed("m", "sm")
    val upd = latest(ev.filter(col("event_id") % 10 >= 8)).withColumnRenamed("m", "um")
    val updWins = col("sm").isNull || (col("um").isNotNull && col("um") > col("sm"))
    val merged = when(updWins, col("um")).otherwise(col("sm"))
    snap.join(upd, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        when(col("sm").isNull, lit("insert"))
          .when(col("um").isNull, lit("carry"))
          .when(col("um") > col("sm"), lit("update"))
          .otherwise(lit("stale_update")).as("op"),
        merged.getField("ts_us").as("ts_us"),
        merged.getField("event_id").as("event_id"),
        merged.getField("event_type").as("event_type"),
        merged.getField("value").as("value"))
      .orderBy("user_id")
  }

  val CdcMergeOracleSql: String =
    """WITH e AS (
      | SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
      | FROM events),
      |snap AS (
      | SELECT user_id, ts_us, event_id, event_type, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |   ORDER BY ts_us DESC, event_id DESC) AS rn
      |  FROM e WHERE event_id % 10 < 8) WHERE rn = 1),
      |upd AS (
      | SELECT user_id, ts_us, event_id, event_type, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |   ORDER BY ts_us DESC, event_id DESC) AS rn
      |  FROM e WHERE event_id % 10 >= 8) WHERE rn = 1),
      |m AS (
      | SELECT coalesce(s.user_id, u.user_id) AS user_id,
      |  CASE WHEN s.user_id IS NULL THEN 'insert'
      |   WHEN u.user_id IS NULL THEN 'carry'
      |   WHEN (u.ts_us, u.event_id) > (s.ts_us, s.event_id) THEN 'update'
      |   ELSE 'stale_update' END AS op,
      |  CASE WHEN s.user_id IS NULL
      |    OR (u.user_id IS NOT NULL AND (u.ts_us, u.event_id) > (s.ts_us, s.event_id))
      |   THEN u.ts_us ELSE s.ts_us END AS ts_us,
      |  CASE WHEN s.user_id IS NULL
      |    OR (u.user_id IS NOT NULL AND (u.ts_us, u.event_id) > (s.ts_us, s.event_id))
      |   THEN u.event_id ELSE s.event_id END AS event_id,
      |  CASE WHEN s.user_id IS NULL
      |    OR (u.user_id IS NOT NULL AND (u.ts_us, u.event_id) > (s.ts_us, s.event_id))
      |   THEN u.event_type ELSE s.event_type END AS event_type,
      |  CASE WHEN s.user_id IS NULL
      |    OR (u.user_id IS NOT NULL AND (u.ts_us, u.event_id) > (s.ts_us, s.event_id))
      |   THEN u.value ELSE s.value END AS value
      | FROM snap s FULL OUTER JOIN upd u ON s.user_id = u.user_id)
      |SELECT user_id, op, ts_us, event_id, event_type, value
      |FROM m ORDER BY user_id""".stripMargin
}
