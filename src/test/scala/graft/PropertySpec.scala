package graft

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{SessionEvent, StatefulSessions}

class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Deterministic generator driver (no scalatest-scalacheck bridge in the
    * offline cache): fixed seeds, explicit iteration.
    */
  private def forAllSeeded[A](gen: Gen[A], cases: Int = 100)(body: A => Unit): Unit =
    (0 until cases).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val eventsGen: Gen[List[Long]] =
    Gen.listOfN(40, Gen.chooseNum(0L, 100000L)) // offsets in seconds

  test("property: stateful session merge conserves events and respects gaps") {
    forAllSeeded(eventsGen) { offsets =>
      val gapMs = 1800 * 1000L
      val evs = offsets.sorted.map(o => SessionEvent(1L, new Timestamp(o * 1000), 1.0))
      val (closed, open) = StatefulSessions.mergeEvents(1L, evs, None, gapMs)
      val total = closed.map(_.events).sum + open.map(_.events).getOrElse(0L)
      assert(total == evs.length.toLong)
      // consecutive closed sessions are separated by >= gap
      closed.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.session_start.getTime - a.session_end.getTime >= gapMs)
        case _ =>
      }
      // sessions never contain an internal gap >= gapMs by construction:
      // each closed session's span is bounded by (events-1) * gap
      closed.foreach { c =>
        assert(c.session_end.getTime - c.session_start.getTime <= (c.events - 1) * gapMs)
      }
    }
  }

  test("property: vec_dot matches a driver-side double fold on random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.GraftFunctions.vec_dot

    val vecGen = Gen.listOfN(64, Gen.chooseNum(-100f, 100f))
    val pairs: Seq[(Seq[Float], Seq[Float])] =
      Gen.listOfN(100, Gen.zip(vecGen, vecGen))
        .pureApply(Gen.Parameters.default, Seed(7L))
        .map { case (a, b) => (a.toSeq, b.toSeq) }
    val df = pairs.toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("property: pii redaction is idempotent and length-sane") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val piiish = Gen.listOfN(8, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const("a.b@x-y.co"),
      Gen.const("555-0134"),
      Gen.const("10.0.0.255"),
      Gen.const("999.999.999.999"),
      Gen.const("@@.."),
      Gen.const("x@y"),           // not a valid email (no dot-tld)
      Gen.const("1.2.3"))).map(_.mkString(" "))
    val texts = (0 until 60).map(i =>
      piiish.pureApply(Gen.Parameters.default, Seed(7L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = df.select(col("doc_id"), graft.operators.PiiOps.redact(col("text")).as("r"))
    val twice = once.select(col("doc_id"), graft.operators.PiiOps.redact(col("r")).as("r"))
    val a = once.orderBy("doc_id").collect().map(_.getString(1))
    val b = twice.orderBy("doc_id").collect().map(_.getString(1))
    a.zip(b).foreach { case (x, y) => assert(x == y, s"not idempotent: $x vs $y") }
    a.foreach { r =>
      assert(!r.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"),
        s"email survived: $r")
    }
  }

  test("property: streaming funnel emissions are insensitive to batch splits") {
    import graft.streaming.{FunnelBuf, StreamingFunnel}
    val evGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(1, 3)))
    forAllSeeded(evGen, cases = 60) { evs =>
      val empty = FunnelBuf(None, None, None, Nil)
      // The watermark contract: once the watermark passed 500, no event
      // at or below 500 can still arrive (Spark drops it upstream of the
      // stateful op). So the second batch may only contain ts > 500.
      val (first, restRaw) = evs.splitAt(evs.length / 2)
      val rest = restRaw.filter(_._1 > 500L)
      // One shot over the events that actually reach the operator.
      val (all, _) = StreamingFunnel.advance(empty, first ++ rest, 2000L)
      // Same events, two-phase arrival with an intermediate watermark.
      val (o1, b1) = StreamingFunnel.advance(empty, first, 500L)
      val (o2, _) = StreamingFunnel.advance(b1, rest, 2000L)
      assert(o1 ++ o2 == all,
        s"split emission ${o1 ++ o2} != one-shot $all for $evs")
    }
  }

  test("property: zorder interleave matches a naive bit-interleave in Spark") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pairGen = Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L))
    val pairs = (0 until 200).map(i =>
      pairGen.pureApply(Gen.Parameters.default, Seed(99L + i)))
    def naive(x: Long, y: Long): Long =
      (0 until 8).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    // Drive the SAME SQL fragment LayoutOps generates for the oracle/plan
    // through Spark, on raw bucket pairs (identity scaling).
    val df = pairs.toDF("xb", "yb")
    val zExpr = (0 until 8).map { i =>
      s"(((xb) div ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + (((yb) div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    val got = df.selectExpr("xb", "yb", s"($zExpr) as z")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == naive(x, y), s"($x,$y): $z != ${naive(x, y)}")
    }
  }

  test("mixture plan invariants: pure downsampling, exact target shares") {
    val rows = graft.operators.SampleOps.mixturePlan(spark, TestSession.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val outTotal = rows.map(_._3).sum
    rows.foreach { case (lang, n, take, rate) =>
      assert(take <= n, s"$lang upsampled: take $take > n $n")
      assert(rate <= 1000, s"$lang rate $rate > 1000")
      // take is exactly target share of the planned output (integer div):
      // all targets equal here, so takes are all equal.
      assert(take == rows.head._3, s"unequal takes under uniform targets")
    }
    // The binding language is fully consumed at rate 1000 (or capacity
    // rounding leaves it within one doc of full consumption).
    assert(rows.exists { case (_, n, take, _) => n - take <= (1000L / 200) },
      s"no binding language: $rows")
    assert(outTotal > 0)
  }
}
