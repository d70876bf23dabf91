package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions.vec_dot

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
}
