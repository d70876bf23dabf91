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
}
