package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSessionize

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("session_window splits on the inactivity gap like the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")

    val t0 = 1700000000000L // fixed epoch millis
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    input.addData(
      (1L, ts(0), 1.0),
      (1L, ts(600), 2.0),   // 10 min gap -> same session
      (1L, ts(2401), 3.0),  // > 1800s after previous -> NEW session
      (2L, ts(0), 5.0))

    val query = StreamingSessionize.sessions(events)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("sessions_test").collect()
      val u1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getTimestamp(1).getTime)
      assert(u1.length == 2, s"expected 2 sessions for user 1, got ${u1.length}")
      assert(u1(0).getLong(3) == 2L) // first session: 2 events
      assert(u1(1).getLong(3) == 1L) // second session: 1 event
      val u2 = rows.filter(_.getLong(0) == 2L)
      assert(u2.length == 1 && u2.head.getLong(3) == 1L)
    } finally query.stop()
  }

  test("streaming as-of matches the batch operator's tie and order semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AsofInput, StreamingAsof}
    val input = MemoryStream[AsofInput]

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    // Out-of-order arrivals: the probe at t=50 must match the reference
    // AT t=50 (inclusive tie, max id), the probe at t=5 has no match.
    input.addData(
      AsofInput(1L, ts(50), 200L, is_left = true),   // probe
      AsofInput(1L, ts(10), 100L, is_left = false),
      AsofInput(1L, ts(5), 201L, is_left = true),    // probe, no match
      AsofInput(1L, ts(45), 102L, is_left = false),
      AsofInput(1L, ts(50), 101L, is_left = false),  // tie at probe ts
      AsofInput(1L, ts(60), 202L, is_left = true))   // probe -> id 101

    val query = StreamingAsof.matches(spark, input.toDS())
      .writeStream.format("memory").queryName("asof_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // Advance the watermark past every probe, then trigger the group.
      input.addData(AsofInput(1L, ts(4000), 900L, is_left = false))
      query.processAllAvailable()
      input.addData(AsofInput(1L, ts(4001), 901L, is_left = false))
      query.processAllAvailable()
      val rows = spark.table("asof_test").collect()
        .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      assert(rows == Map(200L -> Some(101L), 201L -> None, 202L -> Some(101L)),
        s"got $rows")
    } finally query.stop()
  }

  test("streaming as-of flushes a quiet key via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AsofInput, StreamingAsof}
    val input = MemoryStream[AsofInput]

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    // Key 1 gets a reference + probe, then goes silent forever; only key 2
    // advances the watermark. The probe must still be emitted (matched to
    // the reference) via the event-time timeout, not by new key-1 input.
    input.addData(
      AsofInput(1L, ts(10), 100L, is_left = false),
      AsofInput(1L, ts(50), 200L, is_left = true))

    val query = StreamingAsof.matches(spark, input.toDS())
      .writeStream.format("memory").queryName("asof_timeout_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      input.addData(AsofInput(2L, ts(4000), 900L, is_left = false))
      query.processAllAvailable()
      input.addData(AsofInput(2L, ts(4001), 901L, is_left = false))
      query.processAllAvailable()
      val key1 = spark.table("asof_timeout_test").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      assert(key1 == Map(200L -> Some(100L)), s"got $key1")
    } finally query.stop()
  }

  test("streaming as-of advance folds consumed reference rows to one entry") {
    import graft.streaming.{AsofBuf, StreamingAsof}
    val (out, next) = StreamingAsof.advance(
      AsofBuf(None, None, Nil, Nil),
      newRights = Seq((10L, 100L), (45L, 102L), (50L, 101L), (4000L, 900L)),
      newLefts = Seq((50L, 200L), (5L, 201L), (60L, 202L)),
      wmMs = 100L)
    assert(out == Seq(
      (5L, 201L, None),
      (50L, 200L, Some((50L, 101L))),
      (60L, 202L, Some((50L, 101L)))))
    assert(next.bestTs.contains(50L) && next.bestId.contains(101L))
    assert(next.rights == List((4000L, 900L)) && next.lefts.isEmpty)
  }

  test("streaming dedup keeps the first copy of each text within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    input.addData(
      (1L, ts(0), "alpha beta"),
      (2L, ts(10), "alpha beta"),   // duplicate text, later arrival -> dropped
      (3L, ts(20), "gamma delta"),
      (4L, ts(30), "gamma  delta")) // different whitespace -> distinct digest

    val query = graft.streaming.StreamingDedup.firstSeen(docs)
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val ids = spark.table("dedup_test").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 3L, 4L), s"survivors=${ids.toSeq}")
    } finally query.stop()
  }

  test("streaming funnel folds out-of-order events in event-time order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{FunnelInput, StreamingFunnel}
    val input = MemoryStream[FunnelInput]

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    // User 1: click ARRIVES before its view but is event-time later ->
    // both stages count once the watermark finalizes them, in order.
    // User 2: click's event time precedes the first view -> stage 2 never
    // reached, so the later purchase can't fire either.
    input.addData(
      FunnelInput(1L, ts(100), "click"),
      FunnelInput(1L, ts(50), "view"),
      FunnelInput(1L, ts(150), "purchase"),
      FunnelInput(2L, ts(40), "click"),
      FunnelInput(2L, ts(60), "view"),
      FunnelInput(2L, ts(90), "purchase"))
    // Advance the watermark far past the data (30 min delay).
    input.addData(FunnelInput(99L, ts(10000), "view"))

    val query = StreamingFunnel.stages(spark, input.toDS())
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("funnel_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows.filter(_._1 == 1L).map(_._2) == Seq(1L, 2L, 3L),
        s"user 1 stages: $rows")
      assert(rows.filter(_._1 == 2L).map(_._2) == Seq(1L), s"user 2 stages: $rows")
    } finally query.stop()
  }

  test("streaming funnel advance is pure and order-insensitive to arrival") {
    import graft.streaming.{FunnelBuf, StreamingFunnel}
    val empty = FunnelBuf(None, None, None, Nil)
    // Batch A arrives first but finalizes nothing (wm low).
    val (o1, b1) = StreamingFunnel.advance(empty, Seq((100L, 2), (150L, 3)), 0L)
    assert(o1.isEmpty && b1.pending.length == 2)
    // View arrives later; watermark passes everything -> all three fire.
    val (o2, _) = StreamingFunnel.advance(b1, Seq((50L, 1)), 1000L)
    assert(o2 == Seq((1L, 50L), (2L, 100L), (3L, 150L)))
    // Same events, single batch: identical result.
    val (o3, _) = StreamingFunnel.advance(
      empty, Seq((50L, 1), (100L, 2), (150L, 3)), 1000L)
    assert(o3 == o2)
  }

  test("streaming curation filters, scrubs, and dedups in one query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    // 30 quality-passing tokens (avg len in band, stopwords present).
    val base = ("the quick brown fox jumps over lazy dogs near banks " * 3).trim
    input.addData(
      (1L, ts(0), base + " mail bob@example.com now"),
      (2L, ts(10), base + " mail eve@example.net now"), // same text after scrub
      (3L, ts(20), "tiny doc."),                        // fails quality filter
      (4L, ts(30), base))                               // distinct, kept

    val query = graft.streaming.StreamingCuration.curate(docs)
      .writeStream.format("memory").queryName("curation_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("curation_test").collect()
      val ids = rows.map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 4L), s"survivors=${ids.toSeq}")
      // PII never reaches the output; the scrubbed marker does.
      val clean1 = rows.find(_.getLong(0) == 1L).get.getString(2)
      assert(clean1.contains("[EMAIL]") && !clean1.contains("bob@example.com"))
    } finally query.stop()
  }

  test("digest-only curation agrees with full curation on survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    val base = ("the quick brown fox jumps over lazy dogs near banks " * 3).trim
    input.addData(
      (1L, ts(0), base + " mail bob@example.com now"),
      (2L, ts(10), base + " mail eve@example.net now"), // dup after scrub
      (3L, ts(20), "tiny doc."),                        // fails quality
      (4L, ts(30), base))
    val query = graft.streaming.StreamingCuration.curateDigests(docs)
      .writeStream.format("memory").queryName("curation_digests_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("curation_digests_test").collect()
      // Same survivor set as `curate`, no body column in the output.
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
      assert(rows.head.schema.fieldNames.toSeq == Seq("doc_id", "ts", "clean_hash"))
      assert(rows.map(_.getString(2)).distinct.length == 2)
    } finally query.stop()
  }

  test("file-stream ingest loads a partitioned parquet table exactly once") {
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamingIngest
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest")
    val landing = tmp.resolve("landing").toString
    val out = tmp.resolve("table").toString
    val ckpt = tmp.resolve("ckpt").toString
    // Stage the sf corpus into the landing dir as the arriving batch.
    val docs = Tables.documents(spark, TestSession.sf)
    docs.write.parquet(landing)

    val stream = StreamingIngest.parquetFileStream(
      spark, landing, docs.schema, maxFilesPerTrigger = 2)
    // Compose a stateless transform between source and sink.
    val transformed = graft.operators.TextOps.qualityFlags(stream)
      .select("doc_id", "lang", "n_chars", "keep")
    val q = StreamingIngest.toPartitionedParquet(
      transformed, out, ckpt, Seq("lang"))
    q.awaitTermination()

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("lang=")))
    // Restart with no new files: exactly-once means no duplicate rows.
    val stream2 = StreamingIngest.parquetFileStream(spark, landing, docs.schema)
    val q2 = StreamingIngest.toPartitionedParquet(
      graft.operators.TextOps.qualityFlags(stream2)
        .select("doc_id", "lang", "n_chars", "keep"),
      out, ckpt, Seq("lang"))
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == docs.count(), "duplicated on restart")
    // The keep flag matches the batch operator's verdicts.
    val streamKeep = spark.read.parquet(out).filter(col("keep") === 1).count()
    val batchKeep = graft.operators.TextOps.qualityFlags(docs)
      .filter(col("keep") === 1).count()
    assert(streamKeep == batchKeep)
  }

  test("stream-static decontamination drops exactly the eval digests") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val evalDocs = Seq("leaked eval question", "another benchmark item")
      .toDF("text")

    input.addData(
      (1L, "ordinary training text"),
      (2L, "leaked eval question"),    // exact eval match -> dropped
      (3L, "another benchmark item"),  // exact eval match -> dropped
      (4L, "leaked eval question?"))   // different text -> kept

    val query = graft.streaming.StreamingDecontaminate.clean(docs, evalDocs)
      .writeStream.format("memory").queryName("decontam_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val ids = spark.table("decontam_test").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 4L), s"survivors=${ids.toSeq}")
    } finally query.stop()
  }

  test("stream-stream join matches follow-up events inside the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)

    val joined = graft.streaming.StreamJoins.followedWithin(
      clicks.toDF().toDF("user_id", "ts", "value"),
      buys.toDF().toDF("user_id", "ts", "value"))
    val query = joined.writeStream.format("memory")
      .queryName("stream_join_test").outputMode("append").start()
    try {
      clicks.addData((1L, ts(0), 1.0), (2L, ts(0), 2.0))
      buys.addData(
        (1L, ts(300), 10.0),  // within 600s -> match
        (2L, ts(700), 20.0))  // outside -> no match
      query.processAllAvailable()
      val rows = spark.table("stream_join_test").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L && rows.head.getDouble(4) == 10.0)
    } finally query.stop()
  }

  test("tumbling-window aggregation groups events into fixed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val events = input.toDF().toDF("event_type", "ts", "value")

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000)
    input.addData(
      ("click", ts(0), 1.0),
      ("click", ts(30), 2.0),   // same 10-min window
      ("click", ts(700), 4.0),  // next window
      ("view", ts(10), 8.0))

    val query = graft.streaming.StreamingAggregates.windowedTypeCounts(events)
      .writeStream.format("memory").queryName("winagg_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val rows = spark.table("winagg_test").collect()
      val clicks = rows.filter(_.getString(0) == "click")
        .sortBy(_.getTimestamp(1).getTime)
      assert(clicks.length == 2)
      assert(clicks(0).getLong(2) == 2L && clicks(0).getDouble(3) == 3.0)
      assert(clicks(1).getLong(2) == 1L && clicks(1).getDouble(3) == 4.0)
      assert(rows.count(_.getString(0) == "view") == 1)
    } finally query.stop()
  }
}
