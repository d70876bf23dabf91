package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsofJoinOps

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("as-of semantics: latest right at-or-before, ties inclusive, max tie wins") {
    import spark.implicits._
    // (key, time, tie/id)
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("user_id", "ts_us", "event_id")
    val right = Seq(
      (1L, 10L, 200L), (1L, 10L, 201L), // tie at t=10: 201 must win
      (1L, 15L, 202L),                  // latest before t=20
      (2L, 6L, 203L)                    // after left t=5: no match
    ).toDF("user_id", "ts_us", "event_id")

    val out = AsofJoinOps
      .asOfJoin(left, right, "user_id", "ts_us", "event_id")
      .select(col("event_id"),
        col("matched.event_id").as("m_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(100L) == Some(201L)) // inclusive t=10, max event_id among ties
    assert(out(101L) == Some(202L)) // strictly latest preceding
    assert(out(102L) == None)       // nothing at or before t=5
  }

  test("as-of join matches a naive reference on randomized collisions") {
    import spark.implicits._
    // Deterministic pseudo-random rows over a tiny key space so every
    // interesting case (ties, multiple candidates, no-match) occurs.
    def gen(seed: Long, n: Int) = (1 to n).map { i =>
      val x = i * 2654435761L + seed
      (x % 7, (x / 7) % 50, 1000 * seed + i) // (key, time, id)
    }
    val left = gen(1, 120).toDF("user_id", "ts_us", "event_id")
    val right = gen(2, 150).toDF("user_id", "ts_us", "event_id")
    val out = AsofJoinOps.asOfJoin(left, right, "user_id", "ts_us", "event_id")
      .select(col("event_id"), col("matched.event_id").as("m"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    val rightRows = gen(2, 150)
    val expected = gen(1, 120).map { case (k, t, id) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(c => (c._2, c._3))._3))
    }.toMap
    assert(out == expected)
  }

  test("as-of join rejects inputs colliding with reserved/internal names") {
    import spark.implicits._
    val plain = Seq((1L, 10L, 100L)).toDF("user_id", "ts_us", "event_id")
    val reserved = plain.withColumn("__side", lit(1))
    val e1 = intercept[IllegalArgumentException] {
      AsofJoinOps.asOfJoin(reserved, plain, "user_id", "ts_us", "event_id")
    }
    assert(e1.getMessage.contains("__side"))
    val matchedClash = plain.withColumn("matched", lit(0))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoinOps.asOfJoin(plain, matchedClash, "user_id", "ts_us", "event_id")
    }
    assert(e2.getMessage.contains("matched"))
    // A non-default matchedName dodges the clash on "matched".
    val ok = AsofJoinOps.asOfJoin(
      matchedClash, plain, "user_id", "ts_us", "event_id", matchedName = "asof")
    assert(ok.columns.contains("asof") && ok.count() == 1)
  }

  test("bucketed range join equals the naive range join") {
    val bucketed = graft.operators.RangeJoinOps.purchaseViewsWithin(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
    val naive = ev.filter(col("event_type") === "purchase").as("p")
      .join(ev.filter(col("event_type") === "view").as("v"),
        col("v.ts_us") >= col("p.ts_us") &&
          col("v.ts_us") < col("p.ts_us") + 3600000000L,
        "left")
      .groupBy(col("p.event_id"))
      .agg(sum(when(col("v.event_id").isNotNull, 1L).otherwise(0L)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed == naive)
    assert(bucketed.values.sum > 0, "corpus should have co-occurrences")
  }

  test("registered query: gaps are non-negative and clicks precede purchases") {
    val rows = AsofJoinOps.purchaseAsofClick(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length == purchases)
    rows.filter(r => !r.isNullAt(5)).foreach { r =>
      assert(r.getLong(5) >= 0, s"purchase ${r.getLong(0)}")
      assert(r.getLong(4) <= r.getLong(2))
    }
    // A real corpus should match most purchases to some prior click.
    val matched = rows.count(r => !r.isNullAt(3))
    assert(matched > rows.length / 2, s"matched=$matched of ${rows.length}")
  }
}
