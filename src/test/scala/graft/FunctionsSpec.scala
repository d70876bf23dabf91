package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions.{poly_hash, vec_dot}

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("vec_dot matches the zip_with/aggregate fold bit-for-bit") {
    val emb = Tables.embeddings(spark, TestSession.sf).limit(50)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
    val declarative = aggregate(
      zip_with(col("va"), col("vb"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)
    val diff = pairs
      .select(vec_dot(col("va"), col("vb")).as("native"), declarative.as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
  }

  test("vec_dot is null on null input and resolves via SQL registration") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    val rows = df.select(vec_dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    // SparkSessionExtensions registration: plain SQL resolves vec_dot.
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").collect()
    assert(viaSql(0).getDouble(0) == 11.0)
  }

  test("vec_dot stays inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, TestSession.sf).limit(5)
    val plan = emb.select(vec_dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_dot"), plan)
  }

  test("poly_hash matches the regexp/aggregate fold on real documents") {
    val declarative = aggregate(
      regexp_extract_all(col("text"), lit("."), lit(0)),
      lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % 1000000007L)
    val diff = Tables.documents(spark, TestSession.sf)
      .select(poly_hash(col("text"), 31, 1000000007L).as("native"),
        declarative.as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
  }

  test("poly_hash handles empty strings, nulls, and SQL resolution") {
    import spark.implicits._
    val df = Seq(Some("abc"), Some(""), None).toDF("s")
    val rows = df.select(poly_hash(col("s"), 31, 1000000007L).as("h")).collect()
    // ('a'*31 + 'b')*31 + 'c' = (97*31 + 98)*31 + 99
    assert(rows(0).getLong(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).isNullAt(0))
    df.createOrReplaceTempView("ph_strings")
    val viaSql =
      spark.sql("SELECT poly_hash(s, 31, 1000000007) AS h FROM ph_strings").collect()
    assert(viaSql(0).getLong(0) == rows(0).getLong(0))
  }

  test("simhash_pack matches the per-bit aggregate formulation") {
    import spark.implicits._
    val df = Seq(
      Seq(0L, 1L, 2L, 3L, 0x7FFFFFFFFFFFFFFFL),
      Seq(5L),
      Seq.empty[Long]).toDF("hs")
    val bits = 7
    val declarative = (0 until bits).map { j =>
      val bitSum = aggregate(
        col("hs"),
        lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(bitSum >= 0, lit(1L << (j + 3))).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = df.select(
      graft.functions.GraftFunctions.simhash_pack(col("hs"), bits, 3).as("native"),
      declarative.as("decl")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("vec_simhash matches the fixed-point zip_with/aggregate formulation") {
    def weightAt(h: Int, d: org.apache.spark.sql.Column) =
      ((lit(h.toLong * 1000003L) + d + lit(1L)) * lit(2654435761L)) % lit(2000003L) -
        lit(1000001L)
    val bits = 12
    val xq = transform(col("embedding"), x => floor(x.cast("double") * lit(1048576.0)))
    val declarative = (0 until bits).map { h =>
      val proj = aggregate(
        zip_with(xq, sequence(lit(0L), lit(63L)), (q, d) => q * weightAt(h, d)),
        lit(0L),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
    val diff = Tables.embeddings(spark, TestSession.sf)
      .select(
        graft.functions.GraftFunctions.vec_simhash(col("embedding"), bits).as("native"),
        declarative.as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
  }

  test("poly_hash and vec_simhash stay inside whole-stage codegen") {
    val docPlan = Tables.documents(spark, TestSession.sf)
      .select(poly_hash(col("text"), 31, 1000000007L))
      .queryExecution.executedPlan.toString
    assert(docPlan.contains("*(1) Project [poly_hash"), docPlan)
    val embPlan = Tables.embeddings(spark, TestSession.sf)
      .select(graft.functions.GraftFunctions.vec_simhash(col("embedding"), 10))
      .queryExecution.executedPlan.toString
    assert(embPlan.contains("*(1) Project [vec_simhash"), embPlan)
  }
}
