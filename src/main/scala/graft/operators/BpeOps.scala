package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed byte-pair-encoding vocabulary induction — the merge-table
  * builder every tokenizer pipeline starts from, run as `rounds`
  * data-parallel iterations over a character symbol stream.
  *
  * Semantics (the classic corpus-level BPE step, made fully
  * deterministic):
  *  - symbols start as the characters of each whitespace word; pairs
  *    never cross word boundaries;
  *  - each round counts ADJACENT symbol pairs corpus-wide, picks the
  *    most frequent (ties broken lexicographically on the pair), and
  *    merges its occurrences GREEDILY LEFT-TO-RIGHT without overlap —
  *    in a run of back-to-back occurrences ("aaaa" under pair (a,a)),
  *    the 1st, 3rd, … merge and the even ones are skipped, exactly what
  *    a sequential tokenizer does;
  *  - the merged token becomes one symbol for later rounds, so merges
  *    compose into longer subwords.
  *
  * Shape at scale: the stream is (doc, word, pos, sym) rows — one
  * (doc, word)-keyed exchange per round, with pair counting a
  * map-side-combined aggregate and the argmax a 1-row
  * TakeOrdered (the only driver action per round, mirroring the scalar
  * convergence reads of [[GraphOps.pagerankConverged]]). The greedy
  * non-overlap rule is pure window algebra: occurrence runs are detected
  * by the `seq − row_number` constancy trick and the even offsets within
  * each run are kept — no sequential scan, no UDF. Lineage truncates per
  * round. Vocabulary induction conventionally runs on a corpus SAMPLE;
  * the registered query carves `doc_id % 20 == 0` (5%, deterministic) —
  * the carve is the documented contract, shared by the oracle, which
  * unrolls the identical eight rounds in SQL.
  */
object BpeOps {

  /** Initial character stream over the sampled corpus. */
  private def charStream(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(expr("doc_id % 20 = 0"))
      .select(col("doc_id").as("d"),
        posexplode(split(col("text"), " ")).as(Seq("w", "word")))
      .filter(length(col("word")) > 0)
      .select(col("d"), col("w"),
        posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
      .filter(col("sym") =!= "")

  /** The learned merge table: one row per round — (round, left_sym,
    * right_sym, cnt) where cnt is the corpus-wide pair frequency at
    * selection time.
    */
  def bpeMerges(s: SparkSession, dir: String, rounds: Int = 8): DataFrame =
    mergesFromStream(s, charStream(s, dir), rounds)

  /** The merge loop over an explicit (d, w, pos, sym) symbol stream —
    * split out so the greedy semantics are unit-testable on hand-built
    * words.
    */
  def mergesFromStream(s: SparkSession, initial: DataFrame, rounds: Int): DataFrame = {
    val win = Window.partitionBy("d", "w").orderBy("pos")
    var stream = GraphOps.truncate(s, initial)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val withNext = stream
        .withColumn("nxt", lead("sym", 1).over(win))
        .withColumn("i", row_number().over(win))
      val top = withNext.filter(col("nxt").isNotNull)
        .groupBy("sym", "nxt").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("sym"), col("nxt"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (ls, rs, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        results += ((r.toLong, ls, rs, cnt))
        // Greedy non-overlap: within each word, occurrence runs are
        // maximal blocks of consecutive sequence indices; keep the even
        // offsets of each run (1st, 3rd, ... occurrence merges).
        val occWin = Window.partitionBy("d", "w").orderBy("i")
        val taken = withNext
          .filter(col("sym") === ls && col("nxt") === rs)
          .withColumn("run", col("i") - row_number().over(occWin))
          .withColumn("mn", min("i").over(Window.partitionBy("d", "w", "run")))
          .filter(expr("(i - mn) % 2 = 0"))
          .select(col("d"), col("w"), col("i"), lit(1).as("take"))
        val merged = withNext
          .join(taken, Seq("d", "w", "i"), "left")
          .withColumn("ptake", lag("take", 1).over(win))
          .filter(col("ptake").isNull || col("ptake") =!= 1)
          .select(col("d"), col("w"), col("pos"),
            when(col("take") === 1, concat(col("sym"), col("nxt")))
              .otherwise(col("sym")).as("sym"))
        stream = GraphOps.truncate(s, merged)
      }
      r += 1
    }
    import s.implicits._
    results.toSeq.toDF("round", "left_sym", "right_sym", "cnt")
      .orderBy("round")
  }

  /** The identical eight rounds unrolled in SQL (the merge/greedy logic
    * is re-derived from the same window algebra, with DuckDB's zipped
    * `unnest`/`generate_subscripts` standing in for `posexplode`).
    */
  def bpeMergesOracleSql(rounds: Int = 8): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS (
        | SELECT doc_id AS d,
        |  generate_subscripts(string_split(text, ' '), 1) AS w,
        |  unnest(string_split(text, ' ')) AS word
        | FROM documents WHERE doc_id % 20 = 0),
        |s0 AS MATERIALIZED (
        | SELECT d, w,
        |  generate_subscripts(string_split(word, ''), 1) AS pos,
        |  unnest(string_split(word, '')) AS sym
        | FROM w0 WHERE length(word) > 0)""".stripMargin)
    for (i <- 1 to rounds) {
      sb.append(s""",
        |p$i AS MATERIALIZED (
        | SELECT d, w, pos, sym,
        |  lead(sym) OVER (PARTITION BY d, w ORDER BY pos) AS nxt,
        |  row_number() OVER (PARTITION BY d, w ORDER BY pos) AS i
        | FROM s${i - 1}),
        |t$i AS MATERIALIZED (
        | SELECT sym AS ls, nxt AS rs, count(*) AS cnt
        | FROM p$i WHERE nxt IS NOT NULL
        | GROUP BY sym, nxt ORDER BY cnt DESC, ls, rs LIMIT 1),
        |tk$i AS (
        | SELECT d, w, i FROM (
        |  SELECT d, w, i, min(i) OVER (PARTITION BY d, w, run) AS mn FROM (
        |   SELECT p.d, p.w, p.i,
        |    p.i - row_number() OVER (PARTITION BY p.d, p.w ORDER BY p.i) AS run
        |   FROM p$i p, t$i t WHERE p.sym = t.ls AND p.nxt = t.rs))
        | WHERE (i - mn) % 2 = 0),
        |s$i AS MATERIALIZED (
        | SELECT d, w, pos,
        |  CASE WHEN take THEN sym || nxt ELSE sym END AS sym FROM (
        |  SELECT p.d, p.w, p.pos, p.sym, p.nxt, p.i,
        |   tk.i IS NOT NULL AS take,
        |   lag(tk.i IS NOT NULL) OVER (PARTITION BY p.d, p.w ORDER BY p.i) AS ptake
        |  FROM p$i p LEFT JOIN tk$i tk
        |   ON p.d = tk.d AND p.w = tk.w AND p.i = tk.i)
        | WHERE ptake IS NULL OR NOT ptake)""".stripMargin)
    }
    sb.append((1 to rounds).map(i =>
        s"SELECT CAST($i AS BIGINT) AS round, ls AS left_sym, rs AS right_sym, " +
          s"CAST(cnt AS BIGINT) AS cnt FROM t$i")
      .mkString("\nSELECT * FROM (\n", "\n UNION ALL ", "\n) ORDER BY round"))
    sb.toString
  }
}
