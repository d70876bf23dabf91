package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, length}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.streaming._

/** Streaming-tier throughput bench: drives the stateful streaming
  * components with an in-memory source and reports rows/s per component
  * as one JSON line (plus `streaming_bench.json`).
  *
  * Methodology: rows are generated on the driver (deterministic, seeded
  * by row index — no clocks, no RNG), pre-loaded into a [[MemoryStream]]
  * in chunks, and the query drains them to the `noop` sink with
  * `processAllAvailable`. Timing covers query start → fully drained, so
  * stream init + state-store writes + watermark bookkeeping are all
  * inside the measurement — the number a capacity plan actually needs.
  * Throughput = input rows / elapsed. MemoryStream + noop isolates
  * OPERATOR cost: no source parsing or sink I/O in the measurement, the
  * same reason the batch bench writes to noop.
  *
  * Components measured (the stateful tier — stateless streaming stages
  * are the identical codegen'd Column algebra the batch bench already
  * times): curation (filter→redact→watermark dedup), stateful sessions
  * (flatMapGroupsWithState), exact dedup (dropDuplicatesWithinWatermark),
  * windowed aggregation (tumbling window + watermark).
  *
  * Isolation: every component runs in its OWN freshly-built session
  * (context stop clears the JVM-level loadedProviders state-store maps)
  * — the batch bench's session-recycling lesson. r14 ran all components
  * in one aging JVM and ordering artifacts inverted a comparison: the
  * digest-only near-dup variant measured SLOWER in-suite (6.6 k vs
  * 9.8 k docs/s) than the full variant it strictly beats in isolated
  * JVMs (7.6–7.9 k vs 4.2–4.9 k) — each earlier component's ~1–2 M
  * state-store entries stayed resident and GC-taxed whatever ran next.
  */
object StreamBench {

  private val t0 = 1700000000000L // fixed epoch millis — no wall clock

  /** ~45-token quality-passing document text; every 10th row repeats the
    * base verbatim (planted duplicates keep the dedup state store honest)
    * while the rest carry a unique tail token.
    */
  private def docText(i: Long): String = {
    val base = "the quick brown fox is one of the lazy dogs and it runs " +
      "to the old mill near the wide river bank while the sun is high " +
      "over the field of ripe wheat and the wind is low in the trees"
    if (i % 10 == 0) base else s"$base tag$i"
  }

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
  final case class Event(ts: Timestamp, event_type: String, value: Double)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val scratch =
      s"/tmp/graft-streambench-${ProcessHandle.current().pid()}"

    /** Drain `writer` (already configured with the transformed stream),
      * timing start → all pre-loaded chunks processed.
      */
    def drain[T](name: String, rows: Long, writer: DataStreamWriter[T]): (String, String) = {
      val query = writer
        .format("noop")
        .option("checkpointLocation", s"$scratch/$name")
        .start()
      val start = System.nanoTime()
      try {
        query.processAllAvailable()
        val sec = (System.nanoTime() - start) / 1e9
        val rps = rows / sec
        (name,
          f"""{"rows":$rows,"sec":$sec%.2f,"rows_per_sec":${rps.toLong}}""")
      } finally query.stop()
    }

    // Chunk size was A/B-measured: 2500-row chunks fragment the drain
    // into many microbatches whose per-batch planning+commit overhead
    // HALVES every component's throughput; 20000 keeps the drain in a
    // few large batches.
    val chunk = 20000

    // Optional comma-separated component filter for diagnosis runs;
    // filtered output goes to streaming_bench_partial.json so a partial
    // run can never clobber the committed full record (the same guard
    // the batch bench grew in r11 after two clobber incidents).
    val only = sys.env.get("SPARK_GRAFT_STREAM_ONLY")
      .map(_.split(',').map(_.trim).toSet)

    // One fresh session per component (see the isolation note above):
    // the previous component's session is stopped first, which clears
    // the JVM-level state-store provider maps before the next
    // measurement starts.
    var current: SparkSession = null
    def component(name: String)(
        body: SparkSession => (String, String)): Option[(String, String)] =
      if (only.forall(_.contains(name))) {
        if (current != null) {
          current.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
        }
        current = GraftSession.build(cpus, "graft-stream-bench")
        current.sparkContext.setLogLevel("OFF")
        Some(body(current))
      } else None

    // 1) Streaming curation: quality filter → PII redact → watermarked
    // first-seen dedup on the cleaned digest.
    val curation = component("curation") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val curationRows = 100000L
      val curationIn = MemoryStream[Doc]
      (0L until curationRows).grouped(chunk).foreach { ids =>
        curationIn.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), docText(i))))
      }
      drain("curation", curationRows,
        StreamingCuration.curate(curationIn.toDF()).writeStream.outputMode("append"))
    }

    // 1b) The stateless curation tier alone (filter → redact → digest,
    // no state store): prices the columnar work separately so the
    // curation number can be attributed between regex/digest cost and
    // state-store commit cost instead of guessed at.
    val curationStateless = component("curation_stateless") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 100000L
      val in = MemoryStream[Doc]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), docText(i))))
      }
      drain("curation_stateless", rows,
        StreamingCuration.cleaned(in.toDF()).writeStream.outputMode("append"))
    }

    // 1c) The digest-only curation scale path: same semantics, but the
    // cleaned body never enters the dedup exchange or state store. The
    // three curation rows decompose the pipeline's cost — stateless
    // regex/digest tier, + state commit (digests), + body serialization
    // (full curate).
    val curationDigests = component("curation_digests") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 100000L
      val in = MemoryStream[Doc]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), docText(i))))
      }
      drain("curation_digests", rows,
        StreamingCuration.curateDigests(in.toDF()).writeStream.outputMode("append"))
    }

    // 2) Stateful sessionization (flatMapGroupsWithState): 5000 users,
    // consecutive events per user arrive > gap apart, so nearly every
    // event closes a session — worst-case state churn.
    val sessions = component("stateful_sessions") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val sessionRows = 200000L
      val sessionIn = MemoryStream[SessionEvent]
      (0L until sessionRows).grouped(chunk).foreach { ids =>
        sessionIn.addData(ids.map(i =>
          SessionEvent(i % 5000, new Timestamp(t0 + i * 1000), (i % 100).toDouble)))
      }
      drain("stateful_sessions", sessionRows,
        StatefulSessions.sessions(s, sessionIn.toDS()).writeStream.outputMode("append"))
    }

    // 3) Streaming exact dedup alone (the state-heaviest single stage).
    val dedup = component("dedup") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val dedupRows = 200000L
      val dedupIn = MemoryStream[Doc]
      (0L until dedupRows).grouped(chunk).foreach { ids =>
        dedupIn.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), docText(i))))
      }
      drain("dedup", dedupRows,
        StreamingDedup.firstSeen(dedupIn.toDF()).writeStream.outputMode("append"))
    }

    // 3b) Streaming MinHash near-dup: mostly-unique docs (unique token
    // streams — the repeating-text corpus above would make EVERY pair a
    // near-dup and explode any LSH stage by design), with every 50th doc
    // a near-copy of its predecessor. State: 32 bucket rows per unique
    // doc, each one signature list; hits ≈ rows/50 × agreeing buckets.
    val nearDup = component("near_dup") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 60000L
      def uniqueText(i: Long): String = {
        val words = (0 until 18).map(k => s"u${i}w$k")
        if (i % 50 == 1)
          ((0 until 17).map(k => s"u${i - 1}w$k") :+ s"u${i}x").mkString(" ")
        else words.mkString(" ")
      }
      val in = MemoryStream[Doc]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), uniqueText(i))))
      }
      drain("near_dup", rows,
        StreamingNearDup.pairs(s, in.toDF()).writeStream.outputMode("append"))
    }

    // 3c) Digest-only near-dup candidates: identical corpus and banding,
    // but only (bucket, doc_id) crosses the exchange and the state store
    // — prices the signature's 64-long state/shuffle mass against the
    // full estimating variant above.
    val nearDupDigest = component("near_dup_digest") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 60000L
      def uniqueText(i: Long): String = {
        val words = (0 until 18).map(k => s"u${i}w$k")
        if (i % 50 == 1)
          ((0 until 17).map(k => s"u${i - 1}w$k") :+ s"u${i}x").mkString(" ")
        else words.mkString(" ")
      }
      val in = MemoryStream[Doc]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), uniqueText(i))))
      }
      drain("near_dup_digest", rows,
        StreamingNearDup.candidates(s, in.toDF()).writeStream.outputMode("append"))
    }

    // 4) Watermarked tumbling-window aggregation.
    val agg = component("windowed_agg") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val aggRows = 500000L
      val aggIn = MemoryStream[Event]
      (0L until aggRows).grouped(chunk).foreach { ids =>
        aggIn.addData(ids.map(i =>
          Event(new Timestamp(t0 + i * 100), s"type${i % 5}", (i % 100).toDouble)))
      }
      drain("windowed_agg", aggRows,
        StreamingAggregates.windowedTypeCounts(aggIn.toDF())
          .writeStream.outputMode("append"))
    }

    // 5) Streaming CDC upsert changelog (mapGroups latest-state store):
    // 5000 keys, every batch touches every key, 1-in-3 rows out of order.
    val upsert = component("cdc_upsert") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val upsertRows = 200000L
      val upsertIn = MemoryStream[UpsertEvent]
      (0L until upsertRows).grouped(chunk).foreach { ids =>
        upsertIn.addData(ids.map { i =>
          val shuffled = if (i % 3 == 0) i / 2 else i // out-of-order arrivals
          UpsertEvent(i % 5000, new Timestamp(t0 + shuffled * 100), i,
            s"type${i % 5}", (i % 100).toDouble)
        })
      }
      drain("cdc_upsert", upsertRows,
        StreamingUpsert.changelog(s, upsertIn.toDS()).writeStream.outputMode("append"))
    }

    // 6) Streaming shard manifest: O(nShards) state rows regardless of
    // row volume — prices the per-row fingerprint + grouped-state commit.
    val manifest = component("shard_manifest") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 200000L
      val in = MemoryStream[Doc]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), docText(i))))
      }
      drain("shard_manifest", rows,
        StreamingManifest.manifests(
          in.toDF().withColumn("n_chars", length(col("text")).cast("long")))
          .writeStream.outputMode("update"))
    }

    // 7) Streaming quantile sketch: grid-bounded state (types × occupied
    // buckets) — the mergeable profile a dashboard reads live.
    val qsketch = component("quantile_sketch") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 500000L
      val in = MemoryStream[Event]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i =>
          Event(new Timestamp(t0 + i * 100), s"type${i % 5}", (i % 100).toDouble)))
      }
      drain("quantile_sketch", rows,
        StreamingQuantileSketch.sketch(in.toDF())
          .writeStream.outputMode("update"))
    }

    // 8) Streaming IVF ingest: frozen-centroid list assignment (stateless
    // Column algebra, 64 lists x 64 dims per vector) + per-list monoid
    // manifests — state is one row per list regardless of volume.
    val ivfIngest = component("ivf_ingest") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 100000L
      val lists = 64
      val cents: Array[Array[Long]] = Array.tabulate(lists, 64)((c, d) =>
        ((c * 64L + d) % 97L) * 10000L)
      val in = MemoryStream[(Long, Array[Float])]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i =>
          (i, Array.tabulate(64)(d => ((i + d) % 100).toFloat / 100f))))
      }
      drain("ivf_ingest", rows,
        graft.streaming.StreamingIvfIngest
          .manifests(in.toDF().toDF("vec_id", "embedding"), cents)
          .writeStream.outputMode("update"))
    }

    // 9) Streaming RAG chunking: stateless map-only projection — the
    // ceiling a continuous chunk-ingest pipeline runs at.
    val chunking = component("chunking") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 200000L
      val in = MemoryStream[Doc]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => Doc(i, new Timestamp(t0 + i * 100), docText(i))))
      }
      drain("chunking", rows,
        StreamingChunks.chunks(in.toDF()).writeStream.outputMode("append"))
    }

    // 10) Streaming funnel (event-time-buffered fMGWS ladder): rows
    // buffer until the watermark passes them, so the drain prices
    // buffer-insert + in-order finalize + stage emission together. A
    // trailing far-future sentinel flushes the tail INSIDE the timed
    // window (the replay-gate pattern), so the number covers the full
    // state lifecycle, not just enqueue.
    val funnel = component("funnel") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 200000L
      val stages = Array("view", "click", "purchase")
      val in = MemoryStream[FunnelInput]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => FunnelInput(i % 5000,
          new Timestamp(t0 + i * 100), stages((i % 3).toInt))))
      }
      in.addData(Seq(FunnelInput(-1L,
        new Timestamp(t0 + rows * 100 + 365L * 86400000L), "view")))
      drain("funnel", rows,
        StreamingFunnel.stages(s, in.toDS()).writeStream.outputMode("append"))
    }

    // 11) Streaming as-of matcher (the other event-time-buffered fMGWS):
    // alternating reference/probe rows per key, same sentinel flush.
    val asof = component("asof") { s =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = 200000L
      val in = MemoryStream[AsofInput]
      (0L until rows).grouped(chunk).foreach { ids =>
        in.addData(ids.map(i => AsofInput(i % 5000,
          new Timestamp(t0 + i * 100), i, is_left = i % 2 == 1)))
      }
      in.addData(Seq(AsofInput(-1L,
        new Timestamp(t0 + rows * 100 + 365L * 86400000L), -1L, is_left = false)))
      drain("asof", rows,
        StreamingAsof.matches(s, in.toDS()).writeStream.outputMode("append"))
    }

    val comps =
      Seq(curation, curationStateless, curationDigests, sessions, dedup,
        nearDup, nearDupDigest, agg, upsert, manifest, qsketch, ivfIngest,
        chunking, funnel, asof).flatten
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val out =
      s"""{"metric":"streaming_throughput","unit":"rows_per_sec","components":$comps,"cpus":$cpus}"""
    val target =
      if (only.isDefined) "streaming_bench_partial.json" else "streaming_bench.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(target), out + "\n")
    println(out)
    System.out.flush()
    if (current != null) current.stop()
  }
}
