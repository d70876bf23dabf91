package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis + exact-dedup operators over `documents.text` — the
  * LLM-training-pipeline surface (tokenize/quality/language-ID/fingerprint;
  * reference: analysis/etl_spark.py:119-159 computes the same class of
  * per-document text features: word counts, readability, special-char
  * fractions).
  *
  * Every operator is a native Column expression (regexp_count /
  * regexp_extract_all / sha2 / aggregate lambdas) — no UDFs, so the whole
  * row pipeline stays inside whole-stage codegen and scales linearly with
  * a 100 TB corpus: one parquet scan, narrow projections, and (for dedup)
  * a single hash-partitioned shuffle on the text digest.
  *
  * Numerical design: ratio features are fixed-point integers
  * (`(1000*x) div y`) instead of rounded doubles, so hash-checked results
  * are bit-identical in any engine at any parallelism.
  */
object TextOps {

  /** Non-whitespace token runs; no empty-string artifacts at either end.
    * THE tokenization contract — shared by every text operator (incl.
    * [[TfIdfOps]]) so what counts as a token is defined exactly once.
    */
  private[operators] val tokens: Column =
    regexp_extract_all(col("text"), lit("\\S+"), lit(0))

  /** Longest-alternative-first so Java regex and RE2 agree on every match. */
  private val stopwordsRe = "\\b(the|and|is|of|to|in|it|a)\\b"
  private val punctRe = "[.,!?;:]"

  /** Exact duplicate groups, keep-first semantics: text digest, group size,
    * surviving doc_id. The groupBy key is `sha2(text)` — at 100 TB the
    * shuffle carries 64-byte digests + ids, never the document bodies.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(sha2(col("text"), 256).as("text_hash"), col("doc_id"))
      .groupBy("text_hash")
      .agg(count(lit(1)).as("copies"), min("doc_id").as("survivor_id"))
      .orderBy("text_hash")

  /** Corpus-level dedup summary: one row (total docs, distinct texts,
    * duplicate groups, rows a keep-first dedup would drop).
    */
  def dedupStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(sha2(col("text"), 256).as("text_hash"))
      .groupBy("text_hash")
      .agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c")).cast("long").as("total_docs"),
        count(lit(1)).as("distinct_texts"),
        sum(when(col("c") > 1, 1).otherwise(0)).cast("long").as("dup_groups"),
        sum(col("c") - 1).cast("long").as("dup_rows"))

  /** Per-document repetition / lexical-diversity stats — the Gopher-style
    * repetition signals (type-token ratio, most-frequent-token share)
    * that quality pipelines threshold on.
    *
    * Scale shape: ZERO shuffle — the max token frequency is computed as
    * the longest run in the sorted token array via an `aggregate` lambda
    * over each row (a per-row narrow expression inside codegen), instead
    * of the explode → groupBy(doc, token) → max relational formulation
    * that shuffles one row per token occurrence. The DuckDB oracle runs
    * the relational formulation — an independent algorithm computing the
    * same quantity, so this is a true cross-check.
    */
  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), tokens.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        expr(
          """aggregate(array_sort(toks),
            | named_struct('prev', cast(null as string),
            |  'run', cast(0 as bigint), 'best', cast(0 as bigint)),
            | (acc, t) -> named_struct(
            |  'prev', t,
            |  'run', if(acc.prev <=> t, acc.run + 1, cast(1 as bigint)),
            |  'best', greatest(acc.best,
            |   if(acc.prev <=> t, acc.run + 1, cast(1 as bigint)))),
            | acc -> acc.best)""".stripMargin).as("max_token_count"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        col("max_token_count"),
        expr("(1000 * n_distinct_tokens) div greatest(n_tokens, 1)").as("ttr_milli"),
        expr("(1000 * max_token_count) div greatest(n_tokens, 1)").as("max_freq_milli"))
      .orderBy("doc_id")

  val RepetitionOracleSql: String =
    """WITH tok AS (
      | SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |x AS (SELECT doc_id, unnest(toks) AS t FROM tok),
      |g AS (SELECT doc_id, t, count(*) AS c FROM x GROUP BY 1, 2),
      |a AS (
      | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_distinct_tokens, CAST(max(c) AS BIGINT) AS max_token_count
      | FROM g GROUP BY 1)
      |SELECT tok.doc_id,
      | coalesce(n_tokens, 0) AS n_tokens,
      | coalesce(n_distinct_tokens, 0) AS n_distinct_tokens,
      | coalesce(max_token_count, 0) AS max_token_count,
      | (1000 * coalesce(n_distinct_tokens, 0)) // greatest(coalesce(n_tokens, 0), 1) AS ttr_milli,
      | (1000 * coalesce(max_token_count, 0)) // greatest(coalesce(n_tokens, 0), 1) AS max_freq_milli
      |FROM tok LEFT JOIN a ON tok.doc_id = a.doc_id ORDER BY tok.doc_id""".stripMargin

  /** Per-document duplicate n-gram repetition — the Gopher/MassiveText
    * quality rules `repetition_stats` does NOT cover: duplicate word
    * 2-gram / 3-gram share and top-2-gram share (templated spam repeats
    * PHRASES, not just tokens, so a doc can pass the unigram TTR gate
    * while a single boilerplate bigram covers a third of it).
    *
    * Scale shape: ZERO shuffle, like `repetition_stats` — the n-gram
    * arrays are built per row (`transform` over an index `sequence`),
    * distinct counts via `array_distinct`, and the top-bigram count is
    * the longest run in the sorted bigram array (an `aggregate` lambda,
    * all inside codegen). The DuckDB oracle runs the relational
    * explode → GROUP BY formulation — an independent algorithm for the
    * same quantities. `sequence(0, size-2)` DESCENDS for size < 2 (Spark
    * yields [0,-1]), hence the explicit size guards.
    */
  def ngramRepetition(s: SparkSession, dir: String): DataFrame =
    ngramRepetitionOf(Tables.documents(s, dir))

  def ngramRepetitionOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens.as("toks"))
      .select(
        col("doc_id"),
        expr(
          """CASE WHEN size(toks) >= 2 THEN
            | transform(sequence(0, size(toks) - 2),
            |  i -> concat(toks[i], ' ', toks[i + 1]))
            |ELSE cast(array() as array<string>) END"""
            .stripMargin.replace("\n", " ")).as("g2"),
        expr(
          """CASE WHEN size(toks) >= 3 THEN
            | transform(sequence(0, size(toks) - 3),
            |  i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))
            |ELSE cast(array() as array<string>) END"""
            .stripMargin.replace("\n", " ")).as("g3"))
      .select(
        col("doc_id"),
        size(col("g2")).cast("long").as("n2_total"),
        size(array_distinct(col("g2"))).cast("long").as("n2_distinct"),
        expr(
          """aggregate(array_sort(g2),
            | named_struct('prev', cast(null as string),
            |  'run', cast(0 as bigint), 'best', cast(0 as bigint)),
            | (acc, t) -> named_struct(
            |  'prev', t,
            |  'run', if(acc.prev <=> t, acc.run + 1, cast(1 as bigint)),
            |  'best', greatest(acc.best,
            |   if(acc.prev <=> t, acc.run + 1, cast(1 as bigint)))),
            | acc -> acc.best)""".stripMargin).as("top2"),
        size(col("g3")).cast("long").as("n3_total"),
        size(array_distinct(col("g3"))).cast("long").as("n3_distinct"))
      .select(
        col("doc_id"), col("n2_total"), col("n2_distinct"),
        expr("(1000 * (n2_total - n2_distinct)) div greatest(n2_total, 1)")
          .as("dup2_milli"),
        expr("(1000 * top2) div greatest(n2_total, 1)").as("top2_milli"),
        col("n3_total"), col("n3_distinct"),
        expr("(1000 * (n3_total - n3_distinct)) div greatest(n3_total, 1)")
          .as("dup3_milli"))
      .orderBy("doc_id")

  val NgramRepetitionOracleSql: String =
    """WITH tok AS (
      | SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |b AS (
      | SELECT doc_id, toks[u.i+1] || ' ' || toks[u.i+2] AS g
      | FROM tok, unnest(range(greatest(len(toks)-1, 0))) AS u(i)),
      |g2 AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
      |a2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2_total,
      |        CAST(count(*) AS BIGINT) AS n2_distinct,
      |        CAST(max(c) AS BIGINT) AS top2
      |       FROM g2 GROUP BY 1),
      |t3 AS (
      | SELECT doc_id, toks[u.i+1] || ' ' || toks[u.i+2] || ' ' || toks[u.i+3] AS g
      | FROM tok, unnest(range(greatest(len(toks)-2, 0))) AS u(i)),
      |g3 AS (SELECT doc_id, g, count(*) AS c FROM t3 GROUP BY 1, 2),
      |a3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3_total,
      |        CAST(count(*) AS BIGINT) AS n3_distinct FROM g3 GROUP BY 1)
      |SELECT tok.doc_id,
      | coalesce(n2_total, 0) AS n2_total,
      | coalesce(n2_distinct, 0) AS n2_distinct,
      | (1000 * (coalesce(n2_total, 0) - coalesce(n2_distinct, 0)))
      |   // greatest(coalesce(n2_total, 0), 1) AS dup2_milli,
      | (1000 * coalesce(top2, 0)) // greatest(coalesce(n2_total, 0), 1) AS top2_milli,
      | coalesce(n3_total, 0) AS n3_total,
      | coalesce(n3_distinct, 0) AS n3_distinct,
      | (1000 * (coalesce(n3_total, 0) - coalesce(n3_distinct, 0)))
      |   // greatest(coalesce(n3_total, 0), 1) AS dup3_milli
      |FROM tok LEFT JOIN a2 ON tok.doc_id = a2.doc_id
      |         LEFT JOIN a3 ON tok.doc_id = a3.doc_id
      |ORDER BY tok.doc_id""".stripMargin

  /** Corpus-wide top-k word-bigram heavy hitters — the boilerplate probe
    * a pipeline runs before choosing its stop-shingle df cap (the
    * `dedup_ngram` mitigation): which exact bigrams dominate the corpus,
    * with occurrence counts. Every occurrence counts (not per-doc
    * distinct), so templated boilerplate stands out by its repetition.
    *
    * Scale shape: explode → groupBy benefits from map-side partial
    * aggregation (the exchange carries one row per distinct bigram per
    * task, not per occurrence), and `orderBy.limit(k)` collapses to a
    * TakeOrderedAndProject — no global sort of the distinct-bigram table.
    */
  def topBigrams(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    Tables.documents(s, dir)
      .select(tokens.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(desc("occurrences"), col("bigram"))
      .limit(k)

  def topBigramsOracleSql(k: Int = 20): String =
    s"""WITH tok AS (
       | SELECT regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |bg AS (
       | SELECT unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS bigram
       | FROM tok WHERE len(toks) >= 2)
       |SELECT bigram, count(*) AS occurrences
       |FROM bg GROUP BY bigram
       |ORDER BY occurrences DESC, bigram LIMIT $k""".stripMargin

  /** Per-document bigram "surprise" — a language-model-flavored novelty /
    * quality proxy with no model: how RARE a document's word bigrams are
    * against the corpus bigram frequency table. Boilerplate scores near
    * 0 (its bigrams are everywhere); novel prose scores high. Integer
    * contract: `rarity(bg) = 1000 − (1000·c(bg)) div c_max`, per-doc mean
    * in milli units.
    *
    * Scale shape: the bigram frequency table is vocabulary²-bounded, not
    * corpus-bounded, but at 100 TB it is still large — the probe is a
    * plain shuffle join on the bigram key (AQE broadcasts it when small);
    * the production-hardening knobs are the same as `dedup_ngram`'s
    * df-cap (drop hapax bigrams from the table; their rarity saturates at
    * 1000 anyway) or a CMS approximation of the counts.
    */
  def bigramSurprise(s: SparkSession, dir: String): DataFrame = {
    val bg = Tables.documents(s, dir)
      .select(col("doc_id"), tokens.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("bigram"))
    val counts = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
    val cmax = counts.agg(max("c").as("cmax"))
    bg.join(counts, "bigram")
      .crossJoin(broadcast(cmax))
      .select(col("doc_id"),
        expr("1000 - (1000 * c) div cmax").as("rarity_milli"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum("rarity_milli").as("sr"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sr div n_bigrams").as("mean_rarity_milli"))
      .orderBy("doc_id")
  }

  val BigramSurpriseOracleSql: String =
    """WITH tok AS (
      | SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |bg AS (
      | SELECT doc_id, unnest([toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))]) AS bigram
      | FROM tok WHERE len(toks) >= 2),
      |c AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1),
      |m AS (SELECT max(c) AS cmax FROM c),
      |r AS (
      | SELECT bg.doc_id, 1000 - (1000 * c.c) // m.cmax AS rarity_milli
      | FROM bg JOIN c ON bg.bigram = c.bigram CROSS JOIN m)
      |SELECT doc_id, count(*) AS n_bigrams,
      | CAST(sum(rarity_milli) // count(*) AS BIGINT) AS mean_rarity_milli
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Benchmark-decontamination: drop every training document whose EXACT
    * text digest appears in the eval set — the anti-join every serious
    * training-data pipeline runs so eval questions never leak into the
    * training corpus. Generic API: returns the surviving `train` rows.
    *
    * Scale notes: only 64-byte sha256 digests cross the network — the
    * eval side is reduced to a distinct digest column before the join,
    * and an eval set (thousands-to-millions of rows) is broadcast-sized
    * next to a 100 TB training corpus, so the `left_anti` typically
    * runs as a broadcast hash anti-join with NO shuffle of the training
    * side at all (AQE picks this from the digest frame's runtime size).
    */
  def decontaminate(train: DataFrame, evalDocs: DataFrame): DataFrame = {
    val evalDigests = evalDocs
      .select(sha2(col("text"), 256).as("__eval_digest"))
      .distinct()
    train.join(
      evalDigests,
      sha2(train("text"), 256) === evalDigests("__eval_digest"),
      "left_anti")
  }

  /** Registered query: per-language decontamination report. The stand-in
    * eval set is carved deterministically from the corpus itself (docs
    * whose PolyHash fingerprint ≡ 0 mod 10 — ~10%), so the query is
    * self-contained and oracle-checkable; a real pipeline passes its
    * actual benchmark corpus as `evalDocs`. Removed counts exceed the
    * eval carve wherever exact duplicates of an eval text exist — which
    * is exactly the leak decontamination exists to catch.
    */
  def decontaminationStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val evalSet = docs.filter(
      graft.functions.GraftFunctions.poly_hash(col("text"), 31, 1000000007L) % 10 === 0)
    val kept = decontaminate(docs, evalSet)
      .groupBy("lang").agg(count(lit(1)).as("kept"))
    docs.groupBy("lang").agg(count(lit(1)).as("total"))
      .join(kept, Seq("lang"), "left")
      .select(
        col("lang"),
        col("total"),
        coalesce(col("kept"), lit(0L)).as("kept"),
        (col("total") - coalesce(col("kept"), lit(0L))).as("removed"))
      .orderBy("lang")
  }

  def decontaminationOracleSql: String =
    s"""WITH ev AS (
       | SELECT DISTINCT sha256(text) AS d FROM documents
       | WHERE ${SampleOps.FingerprintSql} % 10 = 0),
       |k AS (
       | SELECT lang, count(*) AS kept FROM documents t
       | WHERE sha256(t.text) NOT IN (SELECT d FROM ev) GROUP BY lang),
       |tot AS (SELECT lang, count(*) AS total FROM documents GROUP BY lang)
       |SELECT tot.lang, total, coalesce(kept, 0) AS kept,
       | total - coalesce(kept, 0) AS removed
       |FROM tot LEFT JOIN k ON tot.lang = k.lang ORDER BY tot.lang""".stripMargin

  /** N-gram-overlap decontamination — the stricter industry-standard form
    * (GPT-3-style): a training document is contaminated if it shares ANY
    * token n-gram with the eval set, catching partial quotes that exact
    * digest matching misses. Returns per-train-doc shared-gram counts.
    *
    * Scale shape: the eval side collapses to its DISTINCT n-gram set —
    * eval suites are thousands of documents, so this set broadcasts —
    * and the training side explodes per-doc distinct grams into a
    * broadcast hash semi-join with NO shuffle of the corpus; the only
    * exchange is the per-doc count aggregation over MATCHED rows, which
    * is bounded by eval-gram hits, not corpus size.
    */
  /** Per-row distinct token n-grams, keyed by `keyCol`: the one copy of
    * the gram-boundary expression every decontamination path shares (a
    * tokenization fix lands everywhere at once).
    */
  private def distinctGrams(df: DataFrame, keyCol: String, n: Int): DataFrame =
    df.select(col(keyCol), tokens.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(keyCol), explode(array_distinct(expr(
        s"transform(sequence(0, size(toks) - $n), i -> array_join(slice(toks, i + 1, $n), ' '))")))
        .as("g"))

  def decontaminateNgram(train: DataFrame, evalDocs: DataFrame, n: Int = 5): DataFrame = {
    val evalGrams = distinctGrams(evalDocs, "doc_id", n).select("g").distinct()
    val matched = distinctGrams(train, "doc_id", n)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_ngrams"))
    train.select("doc_id")
      .join(matched, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("shared_ngrams"), lit(0L)).as("shared_ngrams"),
        (coalesce(col("shared_ngrams"), lit(0L)) > 0).cast("long").as("contaminated"))
      .orderBy("doc_id")
  }

  /** Fixed eval-carve size for the registered `decontamination_ngram`
    * entry: the K documents with the smallest (fingerprint, doc_id).
    * CORPUS-INDEPENDENT by construction — real eval suites are fixed-size
    * regardless of how big the training corpus grows, so the registered
    * plan's broadcast eval-gram set must be bounded too (a %-of-corpus
    * carve grows the broadcast linearly with N and OOMs executors at
    * 100×). K documents → the gram set is O(K · tokens-per-doc), constant
    * at any scale.
    */
  val EvalCarveDocs: Int = 64

  /** Registered query: 5-gram decontamination of the corpus against a
    * deterministic FIXED-SIZE eval carve — the [[EvalCarveDocs]] docs with
    * the smallest (fingerprint, doc_id), selected via a bounded top-k
    * (TakeOrderedAndProject, never a global sort). Train = everything
    * else, so eval self-matches don't drown the signal; hits are real
    * cross-document overlap (exact/near dups whose twin fell in the
    * carve). Same plan shape as production use: the eval side collapses
    * to a broadcast gram set, the corpus side never shuffles.
    */
  def decontaminationNgram(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val fp = graft.functions.GraftFunctions.poly_hash(col("text"), 31, 1000000007L)
    val evalSet = docs.withColumn("fp", fp)
      .orderBy(col("fp"), col("doc_id")).limit(EvalCarveDocs)
    val train = docs.join(
      broadcast(evalSet.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    decontaminateNgram(train, evalSet.drop("fp"))
  }

  /** Multi-suite n-gram decontamination: screen the corpus against K
    * eval suites in ONE pass — the production shape (a pipeline checks
    * dozens of benchmarks before a training run, and K separate
    * decontamination scans of a 100 TB corpus would cost K corpus
    * reads). Per-suite distinct gram sets are tagged with their suite id
    * and travel as ONE broadcast; the corpus explodes its grams once,
    * the matched rows aggregate per (doc, suite) into static per-suite
    * columns. Broadcast size is O(Σ suite grams) — suites are fixed-size
    * — and the corpus side still never shuffles.
    *
    * The registered entry carves 3 disjoint [[EvalCarveDocs]]-doc suites
    * from the (fingerprint, doc_id) rank order — same corpus-independent
    * bound as `decontamination_ngram`; the rank window runs over the
    * 192-row carve, never the corpus.
    */
  def decontaminationNgramMulti(
      s: SparkSession,
      dir: String,
      nSuites: Int = 3,
      n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val fp = graft.functions.GraftFunctions.poly_hash(col("text"), 31, 1000000007L)
    val carve = docs.withColumn("fp", fp)
      .orderBy(col("fp"), col("doc_id")).limit(nSuites * EvalCarveDocs)
      .withColumn("rn", row_number().over(Window.orderBy(col("fp"), col("doc_id"))))
      .withColumn("suite_id", expr(s"cast((rn - 1) div $EvalCarveDocs as int)"))
    val train = docs.join(
      broadcast(carve.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    val suiteGrams = distinctGrams(carve, "suite_id", n).distinct()
    val trainGrams = distinctGrams(train, "doc_id", n)
    val aggCols = (0 until nSuites).map(k =>
      sum(when(col("suite_id") === k, 1L).otherwise(0L)).as(s"shared_s$k"))
    val matched = trainGrams
      .join(broadcast(suiteGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
    val sharedCols = (0 until nSuites).map(k =>
      coalesce(col(s"shared_s$k"), lit(0L)).as(s"shared_s$k"))
    val anyShared = (0 until nSuites)
      .map(k => coalesce(col(s"shared_s$k"), lit(0L)))
      .reduce(_ + _)
    train.select("doc_id")
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id") +: sharedCols :+
        (anyShared > 0).cast("long").as("contaminated_any"): _*)
      .orderBy("doc_id")
  }

  def decontaminationNgramMultiOracleSql(nSuites: Int = 3): String = {
    val shared = (0 until nSuites).map(k =>
      s"CAST(coalesce(max(CASE WHEN suite_id = $k THEN c END), 0) AS BIGINT) AS shared_s$k")
      .mkString(",\n | ")
    val anySum = (0 until nSuites).map(k =>
      s"coalesce(max(CASE WHEN suite_id = $k THEN c END), 0)").mkString(" + ")
    s"""WITH tok AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks,
       |  ${SampleOps.FingerprintSql} AS fp
       | FROM documents),
       |ev AS (
       | SELECT doc_id, toks, row_number() OVER (ORDER BY fp, doc_id) AS rn
       | FROM tok ORDER BY fp, doc_id LIMIT ${nSuites * EvalCarveDocs}),
       |evs AS (SELECT CAST((rn - 1) // $EvalCarveDocs AS INT) AS suite_id, doc_id, toks FROM ev),
       |eg AS (
       | SELECT DISTINCT suite_id, unnest([array_to_string(toks[i:i+4], ' ')
       |   for i in range(1, len(toks) - 3)]) AS g
       | FROM evs WHERE len(toks) >= 5),
       |tr AS (SELECT doc_id, toks FROM tok
       | WHERE doc_id NOT IN (SELECT doc_id FROM ev)),
       |x AS (
       | SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
       |   for i in range(1, len(toks) - 3)])) AS g
       | FROM tr WHERE len(toks) >= 5),
       |m AS (
       | SELECT doc_id, suite_id, count(*) AS c FROM x JOIN eg USING (g)
       | GROUP BY doc_id, suite_id)
       |SELECT tr.doc_id,
       | $shared,
       | CAST(($anySum) > 0 AS BIGINT) AS contaminated_any
       |FROM tr LEFT JOIN m ON tr.doc_id = m.doc_id
       |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin
  }

  val DecontaminationNgramOracleSql: String =
    s"""WITH tok AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks,
       |  ${SampleOps.FingerprintSql} AS fp
       | FROM documents),
       |ev_ids AS (SELECT doc_id FROM tok ORDER BY fp, doc_id LIMIT $EvalCarveDocs),
       |ev AS (
       | SELECT DISTINCT unnest([array_to_string(toks[i:i+4], ' ')
       |   for i in range(1, len(toks) - 3)]) AS g
       | FROM tok WHERE doc_id IN (SELECT doc_id FROM ev_ids) AND len(toks) >= 5),
       |tr AS (SELECT doc_id, toks FROM tok
       | WHERE doc_id NOT IN (SELECT doc_id FROM ev_ids)),
       |x AS (
       | SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+4], ' ')
       |   for i in range(1, len(toks) - 3)])) AS g
       | FROM tr WHERE len(toks) >= 5),
       |m AS (
       | SELECT doc_id, count(*) AS shared FROM x JOIN ev USING (g) GROUP BY doc_id)
       |SELECT tr.doc_id, CAST(coalesce(shared, 0) AS BIGINT) AS shared_ngrams,
       | CAST(coalesce(shared, 0) > 0 AS BIGINT) AS contaminated
       |FROM tr LEFT JOIN m ON tr.doc_id = m.doc_id ORDER BY tr.doc_id""".stripMargin

  /** Exact dedup after text normalization (C4-style): lowercase, strip
    * punctuation, collapse whitespace runs — so casing/spacing variants
    * of one document collapse into one group. Same contract and scale
    * shape as [[dedupExact]]: the shuffle carries normalized-text digests
    * + ids, never bodies; normalization itself is zero-shuffle codegen.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,!?;:]", ""), "\\s+", " "))

  def dedupNormalized(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(sha2(normalizeText(col("text")), 256).as("norm_hash"), col("doc_id"))
      .groupBy("norm_hash")
      .agg(count(lit(1)).as("copies"), min("doc_id").as("survivor_id"))
      .orderBy("norm_hash")

  val DedupNormalizedOracleSql: String =
    """WITH n AS (
      | SELECT doc_id,
      |  sha256(trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
      |   '\s+', ' ', 'g'))) AS norm_hash
      | FROM documents)
      |SELECT norm_hash, count(*) AS copies, min(doc_id) AS survivor_id
      |FROM n GROUP BY norm_hash ORDER BY norm_hash""".stripMargin

  /** Incremental (batch-vs-snapshot) dedup — the shape every growing
    * training corpus actually runs: a NEW ingest batch is deduped against
    * the EXISTING corpus's fingerprint index without ever re-pairing the
    * corpus with itself. The registered entry carves the `documents`
    * table deterministically (doc_id mod 10: 0-7 = existing corpus,
    * 8-9 = incoming batch) and reports, per language: batch size, rows
    * rejected because their normalized hash already exists in the corpus,
    * rows rejected as later copies within the batch itself, and rows
    * admitted.
    *
    * Scale shape: the corpus side collapses to DISTINCT hashes before the
    * join — a narrow 32-byte column, the persisted "fingerprint index" of
    * a production pipeline (at 100 TB it lives hash-bucketed on disk, so
    * only the new batch shuffles; rewriting it is an append). The batch
    * side reduces to one survivor id per hash (map-side combined min),
    * then classifies each batch ROW against that and the corpus index —
    * every exchange keys on the hash and carries hash-level rows, never
    * document bodies, and the survivor-join reuses the same
    * h-partitioning. Work per ingest is O(batch + matched index
    * partitions), independent of total corpus size.
    *
    * Dedup groups are hash-level across language tags: a batch document
    * duplicated under two `lang` values admits ONCE (the min-doc_id row,
    * attributed to its own language); the copy counts as a batch dup in
    * its language. Language never fragments a dedup group.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"), col("lang"),
      sha2(normalizeText(col("text")), 256).as("h"))
    val corpusHashes = docs.filter(col("doc_id") % 10 < 8).select("h").distinct()
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    val survivors = batch.groupBy("h").agg(min("doc_id").as("survivor_id"))
    batch
      .join(survivors, Seq("h"))
      .join(corpusHashes.withColumn("in_corpus", lit(1)), Seq("h"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("batch_docs"),
        sum(when(col("in_corpus").isNotNull, 1L).otherwise(0L)).as("corpus_dups"),
        sum(when(col("in_corpus").isNull && col("doc_id") =!= col("survivor_id"), 1L)
          .otherwise(0L)).as("batch_dups"),
        sum(when(col("in_corpus").isNull && col("doc_id") === col("survivor_id"), 1L)
          .otherwise(0L)).as("admitted"))
      .orderBy("lang")
  }

  val DedupIncrementalOracleSql: String =
    """WITH n AS (
      | SELECT doc_id, lang,
      |  sha256(trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
      |   '\s+', ' ', 'g'))) AS h
      | FROM documents),
      |corpus AS (SELECT DISTINCT h FROM n WHERE doc_id % 10 < 8),
      |b AS (SELECT doc_id, lang, h FROM n WHERE doc_id % 10 >= 8),
      |s AS (SELECT h, min(doc_id) AS survivor_id FROM b GROUP BY h),
      |f AS (SELECT b.lang, b.doc_id, s.survivor_id, (c.h IS NOT NULL) AS in_corpus
      | FROM b JOIN s ON b.h = s.h LEFT JOIN corpus c ON b.h = c.h)
      |SELECT lang,
      | CAST(count(*) AS BIGINT) AS batch_docs,
      | CAST(sum(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT) AS corpus_dups,
      | CAST(sum(CASE WHEN NOT in_corpus AND doc_id <> survivor_id THEN 1 ELSE 0 END) AS BIGINT) AS batch_dups,
      | CAST(sum(CASE WHEN NOT in_corpus AND doc_id = survivor_id THEN 1 ELSE 0 END) AS BIGINT) AS admitted
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-document token/quality statistics, all integral:
    * token count, non-whitespace chars, punctuation count, stopword count,
    * mean token length and stopword ratio in fixed-point milli units.
    */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(tokens).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_chars_nows"),
        regexp_count(col("text"), lit(punctRe)).cast("long").as("n_punct"),
        regexp_count(col("text"), lit(stopwordsRe)).cast("long").as("n_stopwords"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_chars_nows"), col("n_punct"),
        col("n_stopwords"),
        expr("(1000 * n_chars_nows) div greatest(n_tokens, 1)").as("avg_token_len_milli"),
        expr("(1000 * n_stopwords) div greatest(n_tokens, 1)").as("stopword_ratio_milli"))
      .orderBy("doc_id")

  /** Marker-word language identification (n-gram heuristic): per-language
    * marker counts, argmax with a fixed priority tie-break, compared to
    * the labeled `lang`. Emits the scores so the decision is auditable.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir).select(
      col("doc_id"),
      col("lang"),
      regexp_count(col("text"), lit("\\b(the|and|is|of)\\b")).cast("long").as("s_en"),
      regexp_count(col("text"), lit("\\b(el|la|de|que|y)\\b")).cast("long").as("s_es"),
      regexp_count(col("text"), lit("\\b(le|les|et|est|une)\\b")).cast("long").as("s_fr"),
      regexp_count(col("text"), lit("\\b(der|die|und|das|ist)\\b")).cast("long").as("s_de"))
    scored
      .withColumn(
        "predicted_lang",
        when(col("s_en") > 0 && col("s_en") >= col("s_es") &&
          col("s_en") >= col("s_fr") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") > 0 && col("s_es") >= col("s_fr") &&
            col("s_es") >= col("s_de"), "es")
          .when(col("s_fr") > 0 && col("s_fr") >= col("s_de"), "fr")
          .when(col("s_de") > 0, "de")
          .otherwise("und"))
      .withColumn("is_correct",
        (col("predicted_lang") === col("lang")).cast("int").cast("long"))
      .select("doc_id", "lang", "s_en", "s_es", "s_fr", "s_de",
        "predicted_lang", "is_correct")
      .orderBy("doc_id")
  }

  /** BPE-style pre-tokenizer piece pattern (GPT-2-family shape, RE2-safe:
    * no lookahead, explicit ASCII classes — the corpus is pure ASCII):
    * a leading-space word, a leading-space number run, a leading-space
    * punctuation run, or a whitespace run. Leftmost-first alternation
    * gives identical piece boundaries in Java regex and RE2.
    */
  private val bpePieceRe = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  /** Token counting, whitespace vs BPE-ish: per document, the whitespace
    * token count, the BPE-style piece count (the LLM-pipeline cost
    * metric — pieces are what a tokenizer bills for), and their ratio in
    * fixed-point milli units. Pure regexp_count Column algebra.
    */
  def tokenCountBpe(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(tokens).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit(bpePieceRe)).cast("long").as("n_bpe_pieces"))
      .select(
        col("doc_id"), col("n_ws_tokens"), col("n_bpe_pieces"),
        expr("(1000 * n_bpe_pieces) div greatest(n_ws_tokens, 1)")
          .as("pieces_per_token_milli"))
      .orderBy("doc_id")

  /** Declared-vs-detected language confusion matrix — the curation audit
    * that tells you whether a feed's `lang` labels can be trusted before
    * the mixture plan weights by them: one cell per (declared, [[langId]]
    * argmax) combination with the doc count and its milli share of the
    * declared language's row. Aggregates the same scored frame as the
    * per-doc `lang_id` entry, so the two registered views can never
    * disagree; cells are |langs|² — metadata-sized at any corpus scale.
    */
  def langConfusion(s: SparkSession, dir: String): DataFrame = {
    val scored = langId(s, dir).select("lang", "predicted_lang")
    val perLang = scored.groupBy("lang")
      .agg(count(lit(1)).as("lang_docs"))
    scored
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("docs"))
      .join(broadcast(perLang), "lang")
      .select(col("lang"), col("predicted_lang"), col("docs"),
        expr("(1000 * docs) div lang_docs").as("share_milli"))
      .orderBy("lang", "predicted_lang")
  }

  /** Cohen's kappa between the declared `lang` column and the n-gram
    * detector's verdict — the single-number chance-corrected agreement
    * statistic read beside [[langConfusion]]'s full matrix (raw accuracy
    * flatters a detector on a skewed language mix; kappa subtracts the
    * agreement a label-marginal random guesser gets for free). All
    * fixed-point: po/pe in ppm, kappa in milli; the marginal product sum
    * runs in DECIMAL(38,0) (the community_stats overflow precedent — at
    * web scale Σ dc·pc exceeds INT64 long before any other term).
    * Confusion counts are bounded by the language-domain square, so
    * everything after the first map-side-combined rollup is constant
    * size.
    */
  def langKappa(s: SparkSession, dir: String): DataFrame = {
    val cm = langId(s, dir)
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("docs"))
    val tot = cm.agg(
      sum("docs").as("n_docs"),
      sum(when(col("lang") === col("predicted_lang"), col("docs"))
        .otherwise(0L)).as("agree_docs"))
    val d = cm.groupBy("lang").agg(sum("docs").as("dc"))
    val p = cm.groupBy(col("predicted_lang").as("lang"))
      .agg(sum("docs").as("pc"))
    val peRaw = d.join(p, "lang")
      .agg(sum(expr("CAST(dc AS DECIMAL(38,0)) * pc")).as("pe_raw"))
    tot.crossJoin(broadcast(peRaw))
      .select(
        col("n_docs"), col("agree_docs"),
        expr("(1000000 * agree_docs) div n_docs").as("po_ppm"),
        expr("CAST((pe_raw * 1000000) div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)")
          .as("pe_ppm"))
      .select(col("n_docs"), col("agree_docs"), col("po_ppm"), col("pe_ppm"),
        expr("(1000 * (po_ppm - pe_ppm)) div (1000000 - pe_ppm)")
          .as("kappa_milli"))
  }

  /** DuckDB oracle for [[langKappa]] (the lang_id CTEs + the same ppm
    * fixed-point; HUGEINT carries the marginal product sum).
    */
  val LangKappaOracleSql: String =
    """WITH s AS (
      | SELECT doc_id, lang,
      |  CAST(len(regexp_extract_all(text, '\b(the|and|is|of)\b')) AS BIGINT) AS s_en,
      |  CAST(len(regexp_extract_all(text, '\b(el|la|de|que|y)\b')) AS BIGINT) AS s_es,
      |  CAST(len(regexp_extract_all(text, '\b(le|les|et|est|une)\b')) AS BIGINT) AS s_fr,
      |  CAST(len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) AS BIGINT) AS s_de
      | FROM documents),
      |pr AS (
      | SELECT lang,
      |  CASE
      |   WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
      |   WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_de THEN 'es'
      |   WHEN s_fr > 0 AND s_fr >= s_de THEN 'fr'
      |   WHEN s_de > 0 THEN 'de'
      |   ELSE 'und' END AS predicted_lang
      | FROM s),
      |cm AS (SELECT lang, predicted_lang, count(*) AS docs FROM pr GROUP BY 1, 2),
      |tot AS (
      | SELECT CAST(sum(docs) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN lang = predicted_lang THEN docs ELSE 0 END) AS BIGINT) AS agree_docs
      | FROM cm),
      |dm AS (SELECT lang, CAST(sum(docs) AS BIGINT) AS dc FROM cm GROUP BY lang),
      |pm AS (SELECT predicted_lang AS lang, CAST(sum(docs) AS BIGINT) AS pc FROM cm GROUP BY 1),
      |pe AS (SELECT sum(CAST(dc AS HUGEINT) * pc) AS pe_raw FROM dm JOIN pm USING (lang)),
      |f AS (
      | SELECT n_docs, agree_docs,
      |  (1000000 * agree_docs) // n_docs AS po_ppm,
      |  CAST((pe_raw * 1000000) // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS pe_ppm
      | FROM tot, pe)
      |SELECT n_docs, agree_docs, po_ppm, pe_ppm,
      | (1000 * (po_ppm - pe_ppm)) // (1000000 - pe_ppm) AS kappa_milli
      |FROM f""".stripMargin

  val LangConfusionOracleSql: String =
    """WITH s AS (
      | SELECT doc_id, lang,
      |  CAST(len(regexp_extract_all(text, '\b(the|and|is|of)\b')) AS BIGINT) AS s_en,
      |  CAST(len(regexp_extract_all(text, '\b(el|la|de|que|y)\b')) AS BIGINT) AS s_es,
      |  CAST(len(regexp_extract_all(text, '\b(le|les|et|est|une)\b')) AS BIGINT) AS s_fr,
      |  CAST(len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) AS BIGINT) AS s_de
      | FROM documents),
      |p AS (
      | SELECT lang,
      |  CASE
      |   WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
      |   WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_de THEN 'es'
      |   WHEN s_fr > 0 AND s_fr >= s_de THEN 'fr'
      |   WHEN s_de > 0 THEN 'de'
      |   ELSE 'und' END AS predicted_lang
      | FROM s),
      |pl AS (SELECT lang, count(*) AS lang_docs FROM p GROUP BY lang)
      |SELECT p.lang, predicted_lang, count(*) AS docs,
      | CAST((1000 * count(*)) // any_value(pl.lang_docs) AS BIGINT) AS share_milli
      |FROM p JOIN pl ON p.lang = pl.lang
      |GROUP BY p.lang, predicted_lang
      |ORDER BY p.lang, predicted_lang""".stripMargin

  /** Per-document character-bigram self-information — the compressibility
    * proxy curation pipelines use as a junk detector (boilerplate and
    * repeated patterns carry few bits per character; random gibberish
    * carries many). For a doc with `n` bigram slots where bigram `g`
    * occurs `cnt_g` times, the score is `Σ cnt_g · floor(log2(n div
    * cnt_g))` bits — the [[lmSurprise]] bit-length trick (`bitlen(x)−1`,
    * exact integers in both engines) applied to the document's OWN
    * statistics instead of the corpus vocabulary, so repetitive docs
    * score low even when their tokens are corpus-common. One explode +
    * one (doc, bigram)-keyed aggregate; emitted per doc with the milli
    * mean bits-per-bigram.
    */
  def docCharEntropy(s: SparkSession, dir: String): DataFrame =
    docCharEntropyOf(Tables.documents(s, dir))

  /** The same computation over an arbitrary `(doc_id, text)` frame — the
    * composition surface (and the crafted-corpus test seam).
    */
  def docCharEntropyOf(docs: DataFrame): DataFrame = {
    Tables.parallelized(docs)
      .select(col("doc_id"),
        // The per-doc slot total is the bigram count itself —
        // greatest(len-1, 1) — known from the row BEFORE the explode,
        // so it rides along as a constant grouping key and no window
        // pass over the counted bigrams is needed at all.
        expr("greatest(length(text) - 1, 1)").as("n"),
        explode(expr(
          "transform(sequence(1, greatest(length(text) - 1, 1))," +
            " i -> substring(text, i, 2))")).as("bg"))
      .groupBy("doc_id", "n", "bg")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_bigrams"),
        sum(expr("cnt * (length(bin(n div cnt)) - 1)")).as("entropy_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("entropy_bits"),
        expr("(1000 * entropy_bits) div n_bigrams").as("mean_bits_milli"))
      .orderBy("doc_id")
  }

  val DocCharEntropyOracleSql: String =
    """WITH bg AS (
      | SELECT doc_id,
      |  unnest([substr(text, i, 2)
      |          for i in range(1, greatest(len(text) - 1, 1) + 1)]) AS bg
      | FROM documents),
      |c AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
      |n AS (SELECT doc_id, sum(cnt) AS n FROM c GROUP BY 1)
      |SELECT c.doc_id,
      | CAST(any_value(n.n) AS BIGINT) AS n_bigrams,
      | CAST(sum(cnt * (length(bin(n.n // cnt)) - 1)) AS BIGINT) AS entropy_bits,
      | CAST((1000 * sum(cnt * (length(bin(n.n // cnt)) - 1)))
      |  // any_value(n.n) AS BIGINT) AS mean_bits_milli
      |FROM c JOIN n ON c.doc_id = n.doc_id
      |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin

  /** Gopher-style document quality filter: each heuristic rule is its own
    * auditable flag column (too few tokens; mean token length outside the
    * natural-language band; zero stopwords; punctuation-heavy), and `keep`
    * is their conjunction — the pipeline both filters AND reports WHY each
    * document was dropped, which is what a curation run needs to tune
    * thresholds. All rules are fixed-point integer comparisons on the
    * [[textStats]] signals: one scan, no shuffle, engine-exact.
    */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    qualityFlags(Tables.documents(s, dir))
      .select("doc_id", "r_few_tokens", "r_token_len", "r_no_stopwords",
        "r_punct_heavy", "keep")
      .orderBy("doc_id")

  /** The rule columns appended to an arbitrary documents frame — the
    * composition surface ([[SampleOps.curationPipeline]] chains this with
    * sampling and sharding in one scan; the registered `quality_filter`
    * query is the audit projection of the same frame).
    */
  def qualityFlags(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", size(tokens).cast("long"))
      .withColumn("n_chars_nows",
        length(regexp_replace(col("text"), "\\s", "")).cast("long"))
      .withColumn("n_punct", regexp_count(col("text"), lit(punctRe)).cast("long"))
      .withColumn("n_stopwords",
        regexp_count(col("text"), lit(stopwordsRe)).cast("long"))
      .withColumn("r_few_tokens", (col("n_tokens") < 20).cast("long"))
      .withColumn("r_token_len",
        (!expr("(1000 * n_chars_nows) div greatest(n_tokens, 1)")
          .between(3000, 5000)).cast("long"))
      .withColumn("r_no_stopwords", (col("n_stopwords") === 0).cast("long"))
      .withColumn("r_punct_heavy",
        (expr("(1000 * n_punct) div greatest(n_tokens, 1)") > 200).cast("long"))
      .withColumn("keep",
        (col("r_few_tokens") + col("r_token_len") +
          col("r_no_stopwords") + col("r_punct_heavy") === 0).cast("long"))

  /** Quality-rule ablation matrix — the threshold-tuning table for the
    * Gopher-style filter: per rule, how many documents (and tokens) it
    * flags at all, and how many it flags ALONE (no other rule fires) —
    * i.e. exactly what the corpus regains if that one rule is dropped
    * or loosened. A rule whose solo counts are ~0 is redundant with its
    * siblings; a rule carrying most of its flags solo is the one whose
    * threshold actually decides the corpus. One scan over the
    * [[qualityFlags]] frame, a 4-way per-row explode of (rule, flag,
    * solo) triples, one 4-row aggregate — no shuffle wider than the
    * rule key.
    */
  def qualityAblation(s: SparkSession, dir: String): DataFrame = {
    val f = qualityFlags(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("r_few_tokens"),
        col("r_token_len"), col("r_no_stopwords"), col("r_punct_heavy"))
    val rules = Seq("r_few_tokens", "r_token_len", "r_no_stopwords",
      "r_punct_heavy")
    val total = rules.map(col).reduce(_ + _)
    val triples = rules.map { r =>
      struct(
        lit(r).as("rule"),
        col(r).as("flag"),
        ((col(r) === 1L) && (total === col(r))).cast("long").as("solo"))
    }
    f.select(col("n_tokens"), explode(array(triples: _*)).as("t"))
      .select(col("n_tokens"), col("t.rule").as("rule"),
        col("t.flag").as("flag"), col("t.solo").as("solo"))
      .groupBy("rule")
      .agg(
        sum("flag").as("flagged_docs"),
        sum("solo").as("solo_docs"),
        sum(col("flag") * col("n_tokens")).as("flagged_tokens"),
        sum(col("solo") * col("n_tokens")).as("solo_tokens"))
      .orderBy("rule")
  }

  val QualityAblationOracleSql: String =
    """WITH t AS (
      | SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars_nows,
      |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
      |  CAST(len(regexp_extract_all(text, '\b(the|and|is|of|to|in|it|a)\b')) AS BIGINT) AS n_stopwords
      | FROM documents),
      |r AS (
      | SELECT doc_id, n_tokens,
      |  CAST(n_tokens < 20 AS BIGINT) AS r_few_tokens,
      |  CAST((1000 * n_chars_nows) // greatest(n_tokens, 1) NOT BETWEEN 3000 AND 5000 AS BIGINT) AS r_token_len,
      |  CAST(n_stopwords = 0 AS BIGINT) AS r_no_stopwords,
      |  CAST((1000 * n_punct) // greatest(n_tokens, 1) > 200 AS BIGINT) AS r_punct_heavy
      | FROM t),
      |x AS (
      | SELECT n_tokens, 'r_few_tokens' AS rule, r_few_tokens AS flag,
      |  CAST(r_few_tokens = 1 AND r_token_len + r_no_stopwords + r_punct_heavy = 0 AS BIGINT) AS solo FROM r
      | UNION ALL
      | SELECT n_tokens, 'r_token_len', r_token_len,
      |  CAST(r_token_len = 1 AND r_few_tokens + r_no_stopwords + r_punct_heavy = 0 AS BIGINT) FROM r
      | UNION ALL
      | SELECT n_tokens, 'r_no_stopwords', r_no_stopwords,
      |  CAST(r_no_stopwords = 1 AND r_few_tokens + r_token_len + r_punct_heavy = 0 AS BIGINT) FROM r
      | UNION ALL
      | SELECT n_tokens, 'r_punct_heavy', r_punct_heavy,
      |  CAST(r_punct_heavy = 1 AND r_few_tokens + r_token_len + r_no_stopwords = 0 AS BIGINT) FROM r)
      |SELECT rule,
      | CAST(sum(flag) AS BIGINT) AS flagged_docs,
      | CAST(sum(solo) AS BIGINT) AS solo_docs,
      | CAST(sum(flag * n_tokens) AS BIGINT) AS flagged_tokens,
      | CAST(sum(solo * n_tokens) AS BIGINT) AS solo_tokens
      |FROM x GROUP BY rule ORDER BY rule""".stripMargin

  /** Per-document polynomial rolling-hash fingerprint over code points
    * (base 31, mod 1e9+7) — order-sensitive, so near-identical docs with
    * swapped words fingerprint differently. The native
    * [[graft.functions.PolyHash]] expression: one fused JIT loop per
    * document instead of a per-character array + interpreted lambda.
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        graft.functions.GraftFunctions.poly_hash(col("text"), 31, 1000000007L)
          .as("fingerprint"))
      .orderBy("doc_id")

  /** Cross-source n-gram overlap matrix: for every pair of document
    * sources, how many distinct 5-grams they share — the
    * leakage-between-corpora diagnostic a mixture curator reads before
    * weighting sources (two "independent" crawls sharing most of their
    * grams are one source for dedup purposes).
    *
    * Scale shape: the per-source distinct gram set is an inverted-index
    * build ([[distinctGrams]] + distinct — one shuffle keyed on
    * (source, gram)); the self-join shuffles on the gram key, and each
    * gram's fan-out is bounded by |sources|² pairs, a constant — so
    * total join work is O(distinct grams × pairs-per-gram), never
    * all-pairs over documents. Output is ≤ C(|sources|, 2) rows.
    */
  def sourceNgramOverlap(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val grams = distinctGrams(Tables.documents(s, dir), "source", n).distinct()
    grams.as("a")
      .join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .orderBy("source_a", "source_b")
  }

  /** Span-level duplication map: for every document, how many of its
    * positional `n`-token spans (rolling, NOT per-doc-distinct) appear
    * verbatim in at least one OTHER document — the sub-document
    * exact-substring dedup signal (doc-level Jaccard says "these two
    * docs are similar"; this says "42% of THIS doc's token positions
    * are boilerplate shared with the rest of the corpus", the number a
    * span-removal pass acts on).
    *
    * Scale shape: the positional explode is O(corpus tokens) narrow
    * rows; the multi-doc gram set comes from a (doc, gram)-distinct
    * aggregation (map-side combined) and joins back by gram key — work
    * scales with true cross-document collisions, the same contract as
    * the n-gram dedup family. No broadcast of anything corpus-sized.
    */
  def spanDedup(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), tokens.as("toks"))
      .filter(size(col("toks")) >= n)
    val grams = toks.select(col("doc_id"), explode(expr(
      s"transform(sequence(0, size(toks) - $n), i -> array_join(slice(toks, i + 1, $n), ' '))"))
      .as("g"))
    val multi = grams.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("dc"))
      .filter(col("dc") >= 2)
      .select(col("g"), lit(1L).as("dup"))
    grams.join(multi, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("dup_spans"))
      .withColumn("dup_bp", expr("(dup_spans * 10000) div n_spans"))
      .orderBy("doc_id")
  }

  /** Seed width for the variable-length substring dedup. */
  val SubstringSeed = 8
  /** Minimum reported match length (tokens) — strictly beyond the fixed
    * seed, so the query only reports what [[spanDedup]]'s fixed spans
    * cannot measure. */
  val SubstringMinTokens = 12
  /** PolyHash modulus for the seed keys — the largest prime admissible
    * at base 31 (mod·base + maxCodePoint < 2^63), so the exchange
    * carries 8-byte keys instead of ~60-char gram strings. At 5M seeds
    * the expected number of colliding PAIRS corpus-wide is ~1e-4
    * (birthday bound n²/2m); both engines hash identically, so the gate
    * stays exact regardless.
    */
  val SubstringHashMod = 297528130221085727L

  /** Variable-length exact-substring dedup — the Lee et al. 2022
    * longest-duplicated-substring signal [[spanDedup]]'s fixed 8-token
    * spans miss: for every cross-document pair sharing at least one
    * seed span, the length (in tokens) of the LONGEST exactly shared
    * token run, of any length.
    *
    * Algorithm (suffix-ordering re-expressed relationally): any shared
    * run of ≥ seed tokens contains shared positional seed `n`-grams at
    * every offset, and a pair's matching seed positions with equal
    * diagonal `pos_a − pos_b` form a CONSECUTIVE integer run exactly as
    * long as `run_tokens − n + 1` — so longest-match = longest
    * consecutive-island per (pair, diagonal) + n − 1, the classic
    * `pos − row_number()` island trick instead of a per-pair suffix
    * sort. Seeds are occurrence-capped (the family's df-cap formula,
    * replayed from count(*) in the oracle): a seed occurring more than
    * cap times corpus-wide is template mass whose C(occ,2) join fan-out
    * the cap exists to bound — dropping it can only SPLIT a reported
    * run, never invent one, and the oracle drops identically so the
    * gate stays exact.
    *
    * Scale shape: positional explode is O(corpus tokens); the seed join
    * shuffles on the gram key with per-gram fan-out ≤ C(cap, 2); the
    * island window partitions by (pair, diagonal) — bounded by actual
    * match volume, never all-pairs. Output ≤ one row per genuinely
    * overlapping pair.
    */
  def substringDedup(
      s: SparkSession, dir: String,
      n: Int = SubstringSeed, minTokens: Int = SubstringMinTokens): DataFrame =
    substringDedupOf(Tables.documents(s, dir), n, minTokens)

  /** [[substringDedup]] over an explicit documents frame (needs `doc_id`,
    * `text`) — the planted-substring test seam.
    */
  private[graft] def substringDedupOf(
      docs: DataFrame,
      n: Int = SubstringSeed, minTokens: Int = SubstringMinTokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = MinHashOps.defaultDfCap(docs.count())
    // Seeds shuffle as 8-byte keys, never gram strings — and the keys
    // are built WITHOUT materializing gram strings at all: each token
    // hashes once (PolyHash), and a seed's key folds its n token-hashes
    // (`acc = ((acc·31) mod M + h) mod M`, every step < 2^63 because M
    // is the base-31 PolyHash cap). The first draft built 5M ~60-char
    // gram strings per sf1 pass just to hash them; this shape is one
    // codegen'd hash per token plus 8 multiply-adds per position.
    // [[SubstringHashMod]] documents the collision arithmetic; the
    // oracle folds identically, so the gate stays exact.
    val m = SubstringHashMod
    val spans = docs
      .select(col("doc_id"), tokens.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        transform(col("toks"), t =>
          graft.functions.GraftFunctions.poly_hash(t, 31, m)).as("tokh"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(tokh) - $n),
           |  i -> aggregate(slice(tokh, i + 1, $n), 0L,
           |         (acc, h) -> ((acc * 31) % ${m}L + h) % ${m}L))""".stripMargin))
        .as(Seq("pos", "gh")))
      // One materialized seed pass: the eligibility aggregate and BOTH
      // sides of the self-join read this frame — unpersisted, the plan
      // re-runs the tokenize+hash generation four times (read in the
      // formatted plan, not guessed). Released by scopedCaches.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eligible = spans.groupBy("gh")
      .agg(count(lit(1)).as("occ"), count_distinct(col("doc_id")).as("dc"))
      .filter(col("dc") >= 2 && col("occ") <= cap)
      .select("gh")
    val sp = spans.join(eligible, "gh")
    val matches = sp.as("a")
      .join(sp.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"), (col("a.pos") - col("b.pos")).as("delta"))
      .distinct()
    val w = Window.partitionBy("doc_a", "doc_b", "delta").orderBy("pos_a")
    val runs = matches
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "delta", "island")
      .agg(count(lit(1)).as("run"))
    runs.groupBy("doc_a", "doc_b")
      .agg(
        (max(col("run")) + (n - 1)).as("longest_tokens"),
        sum(col("run")).as("dup_seed_spans"))
      .filter(col("longest_tokens") >= minTokens)
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB oracle for [[substringDedup]]: identical positional seed
    * grid, identical PolyHash seed keys, identical occurrence cap
    * (derived from count(*)), identical diagonal-island run length via
    * `pos − row_number()`.
    */
  def substringDedupOracleSql(
      n: Int = SubstringSeed, minTokens: Int = SubstringMinTokens): String =
    s"""WITH tok AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |th AS (
       | SELECT doc_id,
       |  list_transform(toks, t ->
       |   list_reduce(
       |    list_prepend(0::BIGINT,
       |     list_transform(regexp_extract_all(t, '(?s).'), ch -> unicode(ch)::BIGINT)),
       |    (acc, x) -> (acc * 31 + x) % $SubstringHashMod)) AS tokh
       | FROM tok WHERE len(toks) >= $n),
       |sp AS (
       | SELECT doc_id,
       |  generate_subscripts([
       |    list_reduce(list_prepend(0::BIGINT, tokh[i:i+${n - 1}]),
       |      (acc, h) -> ((acc * 31) % $SubstringHashMod + h) % $SubstringHashMod)
       |    for i in range(1, len(tokh) - ${n - 2})], 1) - 1 AS pos,
       |  unnest([
       |    list_reduce(list_prepend(0::BIGINT, tokh[i:i+${n - 1}]),
       |      (acc, h) -> ((acc * 31) % $SubstringHashMod + h) % $SubstringHashMod)
       |    for i in range(1, len(tokh) - ${n - 2})]) AS gh
       | FROM th),
       |cap AS (SELECT least(greatest(16, count(*) // 100), 64) AS cap FROM documents),
       |elig AS (
       | SELECT gh FROM sp GROUP BY gh
       | HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= (SELECT cap FROM cap)),
       |m AS (
       | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  a.pos AS pos_a, a.pos - b.pos AS delta
       | FROM sp a JOIN elig e ON a.gh = e.gh JOIN sp b ON a.gh = b.gh
       | WHERE a.doc_id < b.doc_id),
       |r AS (
       | SELECT doc_a, doc_b, delta, pos_a,
       |  pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, delta ORDER BY pos_a) AS island
       | FROM m),
       |runs AS (
       | SELECT doc_a, doc_b, delta, island, count(*) AS run
       | FROM r GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b,
       | CAST(max(run) + ${n - 1} AS BIGINT) AS longest_tokens,
       | CAST(sum(run) AS BIGINT) AS dup_seed_spans
       |FROM runs GROUP BY doc_a, doc_b
       |HAVING max(run) + ${n - 1} >= $minTokens
       |ORDER BY doc_a, doc_b""".stripMargin

  val SpanDedupOracleSql: String =
    """WITH tok AS (
      | SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |g AS (
      | SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
      |   for i in range(1, len(toks) - 6)]) AS g
      | FROM tok WHERE len(toks) >= 8),
      |multi AS (
      | SELECT g FROM (SELECT DISTINCT doc_id, g FROM g) GROUP BY g
      | HAVING count(*) >= 2)
      |SELECT doc_id, count(*) AS n_spans,
      | CAST(sum(CASE WHEN g IN (SELECT g FROM multi) THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
      | (CAST(sum(CASE WHEN g IN (SELECT g FROM multi) THEN 1 ELSE 0 END) AS BIGINT) * 10000) // count(*) AS dup_bp
      |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Vocabulary coverage / OOV-rate audit: induce a frequency-ranked
    * vocabulary of [[VocabSize]] tokens from the corpus itself (count
    * desc, token asc at the boundary — deterministic), then report each
    * language's out-of-vocabulary token share in basis points — the
    * pre-tokenizer-training check that tells you which languages a
    * shared vocab will shortchange.
    *
    * Scale shape: the vocab build is a token-count aggregation (map-side
    * combined) collapsed through a bounded top-K (TakeOrderedAndProject,
    * never a global sort), and the coverage pass joins the corpus's
    * token stream against the BROADCAST vocab — fixed-size by
    * construction — so the second pass is map-side only.
    */
  val VocabSize: Int = 1000

  def vocabOovAudit(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("lang"), explode(tokens).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(VocabSize)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_bp", expr("(oov_tokens * 10000) div tokens"))
      .orderBy("lang")
  }

  val VocabOovOracleSql: String =
    s"""WITH t AS (
       | SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents),
       |v AS (SELECT tok FROM t GROUP BY tok ORDER BY count(*) DESC, tok LIMIT $VocabSize)
       |SELECT lang, count(*) AS tokens,
       | CAST(sum(CASE WHEN tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END) AS BIGINT) AS oov_tokens,
       | (CAST(sum(CASE WHEN tok IN (SELECT tok FROM v) THEN 0 ELSE 1 END) AS BIGINT) * 10000) // count(*) AS oov_bp
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** Distinctive-token profile per source: each source's top-k tokens by
    * LIFT — P(tok | source) / P(tok), in integer basis points — with a
    * minimum-support floor so rare-token noise can't dominate. The
    * mixture-curation companion to [[sourceNgramOverlap]]: overlap says
    * how much two sources share, lift says what makes each one distinct
    * (the tokens a reweighting would amplify or suppress).
    *
    * Scale shape: all four frames reduce through map-side-combined
    * aggregations of the SAME (source, tok) count frame — the raw token
    * stream is shuffled once; corpus totals re-aggregate the collapsed
    * counts. Per-source totals and the grand total broadcast (|sources|
    * rows / 1 row); the rank window partitions by source over its
    * vocab-bounded, support-floored token rows, never raw text. Lift is
    * integer `div` end to end — no float ratio crosses the oracle.
    */
  def tokenLiftProfile(
      s: SparkSession,
      dir: String,
      k: Int = 3,
      minCount: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(tokens).as("tok"))
    val bySrc = toks.groupBy("source", "tok").agg(count(lit(1)).as("c_src"))
    val byTok = bySrc.groupBy("tok").agg(sum("c_src").as("c_all"))
    val bySrcTotal = bySrc.groupBy("source").agg(sum("c_src").as("s_src"))
    val grand = bySrc.agg(sum("c_src").as("s_all"))
    // STAGED fixed-point: src_ppm then lift, never c_src·s_all·10⁴ in one
    // product — that monomial overflows BIGINT near 10²⁴ at 100 TB token
    // counts (c_src ~5e10 × s_all ~2e13 × 1e4). Staged, every
    // intermediate is ≤ max(c·10⁶, ppm·10⁴) — safe to ~9×10¹² tokens per
    // source/corpus; the oracle runs the IDENTICAL staging so the
    // (≤1 bp) quantization is shared, not drift. `greatest(all_ppm, 1)`
    // guards the sub-ppm-rarity floor, which the support threshold
    // should dominate anyway in production.
    bySrc.filter(col("c_src") >= minCount)
      .join(byTok, Seq("tok"))
      .join(broadcast(bySrcTotal), Seq("source"))
      .crossJoin(broadcast(grand))
      .withColumn("src_ppm", expr("(c_src * 1000000) div s_src"))
      .withColumn("all_ppm", expr("(c_all * 1000000) div s_all"))
      .withColumn("lift_bp",
        expr("(src_ppm * 10000) div greatest(all_ppm, 1)"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("source")
          .orderBy(col("lift_bp").desc, col("tok"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("tok"), col("c_src"), col("lift_bp"), col("rk"))
      .orderBy("source", "rk")
  }

  val TokenLiftOracleSql: String =
    """WITH t AS (
      | SELECT source, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents),
      |bs AS (SELECT source, tok, count(*) AS c_src FROM t GROUP BY 1, 2),
      |bt AS (SELECT tok, CAST(sum(c_src) AS BIGINT) AS c_all FROM bs GROUP BY 1),
      |st AS (SELECT source, CAST(sum(c_src) AS BIGINT) AS s_src FROM bs GROUP BY 1),
      |g AS (SELECT CAST(sum(c_src) AS BIGINT) AS s_all FROM bs),
      |l AS (
      | SELECT source, tok, c_src,
      |  (((c_src * 1000000) // s_src) * 10000)
      |   // greatest((c_all * 1000000) // s_all, 1) AS lift_bp
      | FROM bs CROSS JOIN g JOIN bt USING (tok) JOIN st USING (source)
      | WHERE c_src >= 10),
      |r AS (
      | SELECT *, CAST(row_number() OVER (PARTITION BY source
      |   ORDER BY lift_bp DESC, tok) AS BIGINT) AS rk
      | FROM l)
      |SELECT source, tok, c_src, lift_bp, rk FROM r WHERE rk <= 3
      |ORDER BY source, rk""".stripMargin

  /** Unigram LM surprise scoring — the CCNet-style "how far from the
    * corpus language model is this document" quality signal, in EXACT
    * integer bits instead of floating log-probs: a token occurring `cnt`
    * times in a corpus of `T` tokens carries
    * `floor(log2(T div cnt)) = bitlen(T div cnt) − 1` surprise bits
    * (bit length via `bin()`, pure integer — no engine-variant log), and
    * a document scores the sum and per-token milli-mean of its tokens'
    * bits. High mean ⇒ rare-token-heavy (gibberish / non-language);
    * low ⇒ boilerplate. Shape: one corpus-collapse to the vocab frame,
    * one token-keyed join of the exploded corpus against it (the vocab
    * frame is Zipf-small relative to the corpus but unbounded, so it
    * stays a shuffle join, not a broadcast), one doc-keyed aggregate.
    */
  def lmSurprise(s: SparkSession, dir: String): DataFrame =
    surpriseScored(Tables.documents(s, dir)).orderBy("doc_id")

  /** The unordered per-doc surprise frame — factored out so consumers
    * that bucket or join the scores ([[ccnetBuckets]]) don't inherit a
    * wasted total sort.
    */
  private[operators] def surpriseScored(docs: DataFrame): DataFrame = {
    // ONE cached (doc, token, tf) collapse feeds both the vocab build
    // and the scoring join — the raw token explode (the expensive pass)
    // runs once instead of twice, and every downstream row count is
    // per-doc-DISTINCT tokens, not occurrences.
    val tf = docs
      .select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = tf.groupBy("token").agg(sum("tf").as("cnt"))
    val total = vocab.agg(sum("cnt").as("t_tokens"))
    val bits = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        expr("length(bin(t_tokens div cnt)) - 1").cast("long").as("bits"))
    tf.join(bits, Seq("token"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(expr("bits * tf")).as("surprise_bits"))
      .select(col("doc_id"), col("n_tokens"), col("surprise_bits"),
        expr("(1000 * surprise_bits) div n_tokens").as("mean_surprise_milli"))
  }

  val LmSurpriseOracleSql: String =
    """WITH t AS (
      | SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
      | FROM documents),
      |v AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
      |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_tokens FROM v),
      |b AS (
      | SELECT token, length(bin(t_tokens // cnt)) - 1 AS bits
      | FROM v CROSS JOIN tt)
      |SELECT t.doc_id, count(*) AS n_tokens,
      | CAST(sum(b.bits) AS BIGINT) AS surprise_bits,
      | CAST((1000 * sum(b.bits)) // count(*) AS BIGINT) AS mean_surprise_milli
      |FROM t JOIN b USING (token)
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** CCNet-style perplexity-bucketed corpus split (Wenzek et al. 2020):
    * per language, rank documents by their [[lmSurprise]] mean (the
    * integer-bits perplexity stand-in — low ⇒ fluent/common, high ⇒
    * rare-token-heavy) and cut into head/middle/tail terciles; report
    * per (lang, bucket) the doc and token mass plus the score range.
    * CCNet trains on head, samples middle, drops tail — this is the
    * planning table that decision reads from.
    *
    * The tercile cut here is an exact NTILE over (score, doc_id) — a
    * per-language window, so parallelism is |langs| at this step (the
    * window input is three narrow columns, not documents). At 100 TB
    * the production cut is two score THRESHOLDS per language taken from
    * this very table's min/max readout (CCNet itself computes them once
    * on a sample) — a stateless filter; the exact NTILE is the
    * oracle-replay contract, mirrored tie-break and all.
    *
    * Coverage contract: documents with zero tokens have no surprise
    * score and drop out of the cut entirely, and a language with fewer
    * than three scored documents emits fewer than three buckets
    * (`ntile(3)` assigns only as many tiles as rows) — consumers must
    * key on the (lang, bucket) rows present, not assume a dense
    * head/middle/tail per language.
    */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val scored = surpriseScored(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "n_tokens", "mean_surprise_milli")
    val w = Window.partitionBy("lang")
      .orderBy(col("mean_surprise_milli"), col("doc_id"))
    val bucketed = scored
      .withColumn("nt", ntile(3).over(w))
      .withColumn("bucket", expr(
        "CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"))
    val grouped = bucketed.groupBy("lang", "bucket")
      .agg(
        count(lit(1)).as("docs"),
        sum("n_tokens").as("tokens"),
        min("mean_surprise_milli").as("min_score_milli"),
        max("mean_surprise_milli").as("max_score_milli"))
    // Per-language totals as a window over the tiny grouped frame, NOT a
    // grouped-self-join: the join form re-evaluated the whole un-cached
    // scoring subtree (vocab join, score aggregate, per-language ntile)
    // once per join side.
    grouped
      .withColumn("lang_tokens",
        sum("tokens").over(Window.partitionBy("lang")))
      .select(
        col("lang"), col("bucket"), col("docs"),
        col("tokens").cast("long").as("tokens"),
        expr("(1000 * tokens) div lang_tokens").as("token_share_milli"),
        col("min_score_milli"), col("max_score_milli"))
      .orderBy("lang", "bucket")
  }

  val CcnetBucketsOracleSql: String =
    """WITH t AS (
      | SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
      | FROM documents),
      |v AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
      |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_tokens FROM v),
      |b AS (
      | SELECT token, length(bin(t_tokens // cnt)) - 1 AS bits
      | FROM v CROSS JOIN tt),
      |sc AS (
      | SELECT t.doc_id, count(*) AS n_tokens,
      |  CAST((1000 * sum(b.bits)) // count(*) AS BIGINT) AS m
      | FROM t JOIN b USING (token) GROUP BY t.doc_id),
      |sl AS (
      | SELECT sc.doc_id, d.lang, sc.n_tokens, sc.m,
      |  ntile(3) OVER (PARTITION BY d.lang ORDER BY sc.m, sc.doc_id) AS nt
      | FROM sc JOIN documents d USING (doc_id)),
      |g AS (
      | SELECT lang,
      |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
      |  count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
      |  min(m) AS min_score_milli, max(m) AS max_score_milli
      | FROM sl GROUP BY 1, 2),
      |lt AS (SELECT lang, CAST(sum(tokens) AS BIGINT) AS lang_tokens FROM g GROUP BY lang)
      |SELECT g.lang, g.bucket, g.docs, g.tokens,
      | CAST((1000 * g.tokens) // lt.lang_tokens AS BIGINT) AS token_share_milli,
      | g.min_score_milli, g.max_score_milli
      |FROM g JOIN lt USING (lang) ORDER BY lang, bucket""".stripMargin

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every document by how much more likely its
    * tokens are under a TARGET domain's unigram LM than under the raw
    * corpus LM, then sample high scorers to shift the training mixture
    * toward the target. The published estimator is
    * Σ_tok log p_tgt(tok) − log p_raw(tok); this twin keeps the exact
    * integer-bits formulation of [[lmSurprise]] — per-token surprise is
    * `floor(log2(total div cnt)) = bitlen(total div cnt) − 1` under each
    * LM (Laplace +1 smoothing on the target side, so out-of-domain
    * tokens cost the full smoothed-vocabulary surprise), and the score
    * is `raw_bits − tgt_bits` per token, occurrence-weighted. Positive
    * milli-score ⇒ the doc reads more like the target than the corpus.
    *
    * The target domain is the `source = targetSource` slice — the
    * "small clean seed set" of the paper (a curated wiki/book slice in
    * production; a fixed source here so the oracle is deterministic).
    *
    * Scale shape: identical to [[lmSurprise]] — ONE cached (doc, token,
    * tf) collapse feeds the raw vocab, the target vocab (a filter of the
    * same frame), and the scoring join; totals broadcast as 1-row
    * frames; the token-keyed vocab join is the only corpus-sized
    * shuffle. All divisions run on nonnegative integers, and both
    * engines truncate `div` toward zero, so the subtraction-of-means
    * never crosses an engine-variant rounding rule.
    */
  def dsirWeights(
      s: SparkSession, dir: String, targetSource: String = "src0"): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), explode(tokens).as("token"))
      .groupBy("doc_id", "source", "token").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = tf.groupBy("token").agg(sum("tf").as("c_raw"))
    val tgt = tf.filter(col("source") === targetSource)
      .groupBy("token").agg(sum("tf").as("c_tgt"))
    val vocab = raw.join(tgt, Seq("token"), "left")
      .select(col("token"), col("c_raw"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = vocab.agg(
      sum("c_raw").as("t_raw"), sum("c_tgt").as("t_tgt"),
      count(lit(1)).as("v_size"))
    val bits = vocab.crossJoin(broadcast(totals))
      .select(col("token"),
        expr("length(bin(t_raw div c_raw)) - 1").cast("long").as("raw_b"),
        expr("length(bin((t_tgt + v_size) div (c_tgt + 1))) - 1")
          .cast("long").as("tgt_b"))
    val out = tf.join(bits, Seq("token"))
      .groupBy("doc_id", "source")
      .agg(sum("tf").as("n_tokens"),
        sum(expr("raw_b * tf")).as("raw_bits"),
        sum(expr("tgt_b * tf")).as("tgt_bits"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("raw_bits"), col("tgt_bits"),
        expr("(1000 * raw_bits) div n_tokens - (1000 * tgt_bits) div n_tokens")
          .as("dsir_score_milli"))
      .orderBy("doc_id")
    out
  }

  def dsirWeightsOracleSql(targetSource: String = "src0"): String =
    s"""WITH t AS (
       | SELECT doc_id, source, unnest(regexp_extract_all(text, '\\S+')) AS token
       | FROM documents),
       |tf AS MATERIALIZED (
       | SELECT doc_id, source, token, count(*) AS tf FROM t GROUP BY 1, 2, 3),
       |raw AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_raw FROM tf GROUP BY 1),
       |tgt AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_tgt FROM tf
       | WHERE source = '$targetSource' GROUP BY 1),
       |v AS (
       | SELECT raw.token, c_raw, coalesce(c_tgt, 0) AS c_tgt
       | FROM raw LEFT JOIN tgt USING (token)),
       |tot AS (
       | SELECT CAST(sum(c_raw) AS BIGINT) AS t_raw,
       |  CAST(sum(c_tgt) AS BIGINT) AS t_tgt, count(*) AS v_size FROM v),
       |b AS (
       | SELECT token,
       |  length(bin(t_raw // c_raw)) - 1 AS raw_b,
       |  length(bin((t_tgt + v_size) // (c_tgt + 1))) - 1 AS tgt_b
       | FROM v CROSS JOIN tot)
       |SELECT tf.doc_id, tf.source, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       | CAST(sum(b.raw_b * tf.tf) AS BIGINT) AS raw_bits,
       | CAST(sum(b.tgt_b * tf.tf) AS BIGINT) AS tgt_bits,
       | CAST((1000 * sum(b.raw_b * tf.tf)) // sum(tf.tf)
       |  - (1000 * sum(b.tgt_b * tf.tf)) // sum(tf.tf) AS BIGINT)
       |  AS dsir_score_milli
       |FROM tf JOIN b USING (token)
       |GROUP BY tf.doc_id, tf.source ORDER BY tf.doc_id""".stripMargin

  /** Context-window truncation-loss table — the max-seq-len planning
    * audit: for each candidate context length (powers of two), how many
    * documents exceed it, what share of corpus tokens a hard truncation
    * at that length would discard, and the packing headroom (tokens in
    * under-length docs). A pre-training run picks its sequence length
    * off exactly this curve: the knee where truncation loss stops
    * falling faster than compute cost rises.
    *
    * Scale shape: ONE narrow per-doc token-count projection (no explode
    * — `regexp_count` over the scan) cross-joined against a 4-row
    * literal window spine, aggregated map-side to 4 rows. Zero
    * corpus-sized shuffles.
    */
  def truncationLoss(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val windows = Seq(64L, 128L, 256L, 512L)
    val lens = Tables.documents(s, dir)
      .select(size(tokens).cast("long").as("n_tok"))
    lens.crossJoin(broadcast(windows.toDF("window_len")))
      .groupBy("window_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("case when n_tok > window_len then 1L else 0L end"))
          .as("docs_truncated"),
        sum("n_tok").as("corpus_tokens"),
        sum(expr("greatest(n_tok - window_len, 0L)")).as("tokens_lost"),
        sum(expr("case when n_tok <= window_len then window_len - n_tok else 0L end"))
          .as("padding_headroom"))
      .select(col("window_len"), col("n_docs"), col("docs_truncated"),
        col("tokens_lost"),
        expr("(10000 * tokens_lost) div corpus_tokens").as("loss_share_bp"),
        col("padding_headroom"))
      .orderBy("window_len")
  }

  val TruncationLossOracleSql: String =
    """WITH lens AS (
      | SELECT len(regexp_extract_all(text, '\S+')) AS n_tok FROM documents),
      |w AS (SELECT unnest([64, 128, 256, 512]) AS window_len)
      |SELECT CAST(window_len AS BIGINT) AS window_len,
      | count(*) AS n_docs,
      | CAST(sum(CASE WHEN n_tok > window_len THEN 1 ELSE 0 END) AS BIGINT)
      |  AS docs_truncated,
      | CAST(sum(greatest(n_tok - window_len, 0)) AS BIGINT) AS tokens_lost,
      | CAST((10000 * sum(greatest(n_tok - window_len, 0)))
      |  // sum(n_tok) AS BIGINT) AS loss_share_bp,
      | CAST(sum(CASE WHEN n_tok <= window_len THEN window_len - n_tok
      |  ELSE 0 END) AS BIGINT) AS padding_headroom
      |FROM lens CROSS JOIN w
      |GROUP BY window_len ORDER BY window_len""".stripMargin

  /** Vocabulary-growth (Heaps'-law) audit over ingest order: documents
    * batch by `doc_id div batchSize` (the ingest-sequence proxy — the
    * driver's synthetic ids are assigned in generation order), and each
    * batch reports its token volume, in-batch distinct tokens, tokens
    * FIRST seen in it, and the running cumulative vocabulary. The curve
    * is how a crawl operator decides when marginal data stops buying
    * vocabulary. First-seen attribution is one `min(batch)` aggregate
    * over the vocab frame; the cumulative sum walks the metadata-sized
    * batch spine only.
    */
  def vocabGrowth(s: SparkSession, dir: String, batchSize: Long = 50L): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(expr(s"doc_id div $batchSize").as("batch"),
        explode(tokens).as("token"))
    val perBatch = tok.groupBy("batch").agg(
      count(lit(1)).as("token_occurrences"),
      countDistinct("token").as("distinct_tokens"))
    val firstSeen = tok.groupBy("token").agg(min("batch").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("new_tokens"))
    perBatch.join(firstSeen, Seq("batch"), "left")
      .select(col("batch"), col("token_occurrences"), col("distinct_tokens"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("cum_vocab",
        sum("new_tokens").over(Window.orderBy("batch")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("batch")
  }

  def vocabGrowthOracleSql(batchSize: Long = 50L): String =
    s"""WITH t AS (
       | SELECT doc_id // $batchSize AS batch,
       |  unnest(regexp_extract_all(text, '\\S+')) AS token
       | FROM documents),
       |pb AS (
       | SELECT batch, count(*) AS token_occurrences,
       |  count(DISTINCT token) AS distinct_tokens
       | FROM t GROUP BY batch),
       |fs AS (
       | SELECT batch, count(*) AS new_tokens FROM (
       |  SELECT token, min(batch) AS batch FROM t GROUP BY token)
       | GROUP BY batch)
       |SELECT pb.batch, pb.token_occurrences, pb.distinct_tokens,
       | coalesce(fs.new_tokens, 0) AS new_tokens,
       | CAST(sum(coalesce(fs.new_tokens, 0)) OVER (ORDER BY pb.batch
       |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
       |FROM pb LEFT JOIN fs USING (batch)
       |ORDER BY batch""".stripMargin

  /** Zipf-law audit of the corpus token distribution: OLS slope of
    * bit-length(freq) against bit-length(rank) — the integer-exact
    * stand-in for the log-log regression (floor-log2 via `bin()`, the
    * same trick as [[lmSurprise]]; no engine-variant floating logs).
    * A Zipfian corpus slopes near −1·e4; a flat slope says the
    * generator (or a dedup bug upstream) broke the natural frequency
    * hierarchy. Rank is the exact descending frequency rank from
    * [[RankOps.withHierarchicalRank]] (ascending rank inverted off the
    * broadcast vocab size — no single-task sort); moments accumulate in
    * DECIMAL(38,0) and only the final slope quantizes (e4, floor+0.5).
    */
  def zipfAudit(s: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(s, dir)
      .select(explode(tokens).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val n = vocab.agg(count(lit(1)).as("v"))
    val ranked = RankOps.withHierarchicalRank(vocab, Seq(), "freq", "token",
        "freq div 4", "rka")
      .crossJoin(broadcast(n))
      .select(expr("v - rka + 1").as("rank"), col("freq"), col("v"))
    ranked
      .select(col("v"),
        expr("cast(length(bin(rank)) - 1 as decimal(38,0))").as("x"),
        expr("cast(length(bin(freq)) - 1 as decimal(38,0))").as("y"))
      .agg(first("v").as("vocab_size"),
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("vocab_size"),
        expr("""cast(floor(10000.0 *
            (cast(n * sxy - sx * sy as double) /
             cast(n * sxx - sx * sx as double)) + 0.5) as long)""")
          .as("slope_e4"))
  }

  val ZipfAuditOracleSql: String =
    """WITH v AS (
      | SELECT token, count(*) AS freq FROM (
      |  SELECT unnest(regexp_extract_all(text, '\S+')) AS token
      |  FROM documents) GROUP BY token),
      |r AS (
      | SELECT freq,
      |  (SELECT count(*) FROM v) AS vs,
      |  (SELECT count(*) FROM v) - row_number()
      |   OVER (ORDER BY freq, token) + 1 AS rank
      | FROM v),
      |m AS (
      | SELECT any_value(vs) AS vocab_size, count(*)::HUGEINT AS n,
      |  sum((length(bin(rank)) - 1)::HUGEINT) AS sx,
      |  sum((length(bin(freq)) - 1)::HUGEINT) AS sy,
      |  sum(((length(bin(rank)) - 1) * (length(bin(freq)) - 1))::HUGEINT) AS sxy,
      |  sum(((length(bin(rank)) - 1) * (length(bin(rank)) - 1))::HUGEINT) AS sxx
      | FROM r)
      |SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
      | CAST(floor(10000.0 *
      |  (CAST(n * sxy - sx * sy AS DOUBLE) /
      |   CAST(n * sxx - sx * sx AS DOUBLE)) + 0.5) AS BIGINT) AS slope_e4
      |FROM m""".stripMargin

  /** Pairwise cosine similarity between the sources' token-count
    * vectors — the weighted companion of [[sourceNgramOverlap]]'s
    * set-based matrix (overlap says "share grams"; cosine says "share
    * the same token DISTRIBUTION", which is what a mixture planner
    * actually wants when merging near-identical crawls). Dot products
    * ride a token-keyed join of the (source, token, count) frame with
    * itself — per-token fan-out ≤ &#124;sources&#124;², a constant — and norms
    * are per-source scalars; sums are DECIMAL(38,0)-exact, the final
    * ratio floor-quantizes to ppm.
    */
  def sourceSimilarity(s: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(s, dir)
      .select(col("source"), explode(tokens).as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
      .persist()
    val norms = bySrc.groupBy("source")
      .agg(sum(expr("c * c")).as("ss"))
    val dots = bySrc.as("x")
      .join(bySrc.as("y"),
        col("x.token") === col("y.token") &&
          col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(sum(expr("x.c * y.c")).as("dot"))
    dots
      .join(broadcast(norms.select(col("source").as("source_a"),
        col("ss").as("ssa"))), "source_a")
      .join(broadcast(norms.select(col("source").as("source_b"),
        col("ss").as("ssb"))), "source_b")
      .select(col("source_a"), col("source_b"),
        expr("""cast(floor(1000000.0 * (cast(dot as double) /
            (sqrt(cast(ssa as double)) * sqrt(cast(ssb as double)))) + 0.5)
            as long)""").as("cosine_ppm"))
      .orderBy("source_a", "source_b")
  }

  val SourceSimilarityOracleSql: String =
    """WITH t AS (
      | SELECT source, unnest(regexp_extract_all(text, '\S+')) AS token
      | FROM documents),
      |b AS (
      | SELECT source, token, count(*)::HUGEINT AS c FROM t GROUP BY 1, 2),
      |nrm AS (SELECT source, sum(c * c) AS ss FROM b GROUP BY source),
      |d AS (
      | SELECT x.source AS source_a, y.source AS source_b,
      |  sum(x.c * y.c) AS dot
      | FROM b x JOIN b y ON x.token = y.token AND x.source < y.source
      | GROUP BY 1, 2)
      |SELECT d.source_a, d.source_b,
      | CAST(floor(1000000.0 * (CAST(d.dot AS DOUBLE) /
      |  (sqrt(CAST(a.ss AS DOUBLE)) * sqrt(CAST(bb.ss AS DOUBLE)))) + 0.5)
      |  AS BIGINT) AS cosine_ppm
      |FROM d JOIN nrm a ON a.source = d.source_a
      | JOIN nrm bb ON bb.source = d.source_b
      |ORDER BY source_a, source_b""".stripMargin

  val SourceOverlapOracleSql: String =
    """WITH tok AS (
      | SELECT source, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |g AS (
      | SELECT DISTINCT source, unnest([array_to_string(toks[i:i+4], ' ')
      |   for i in range(1, len(toks) - 3)]) AS g
      | FROM tok WHERE len(toks) >= 5)
      |SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_ngrams
      |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  /** Per-source character-class composition — the script/charset profile
    * a corpus curator reads before tokenizer decisions (a Latin-text BPE
    * trained on a feed that turns out 30% digits/punct is a bug caught
    * here). Four regexp_replace strip-counts per row (letters, digits,
    * whitespace; "other" is the remainder) collapse map-side to one row
    * per source; shares are fixed-point per-mille of each source's total
    * characters. One scan, |sources| output rows, zero extra shuffles
    * beyond the source-keyed aggregate.
    */
  def charsetProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("source"),
        length(col("text")).cast("long").as("chars"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long")
          .as("letters"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
          .as("digits"),
        length(regexp_replace(col("text"), "[^ \\t\\n]", "")).cast("long")
          .as("spaces"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum("chars").as("chars"),
        sum("letters").as("letters"),
        sum("digits").as("digits"),
        sum("spaces").as("spaces"))
      .select(
        col("source"), col("docs"), col("chars"),
        expr("(1000 * letters) div chars").as("letter_permille"),
        expr("(1000 * digits) div chars").as("digit_permille"),
        expr("(1000 * spaces) div chars").as("space_permille"),
        expr("(1000 * (chars - letters - digits - spaces)) div chars")
          .as("other_permille"))
      .orderBy("source")

  def charsetProfileOracleSql(): String =
    """WITH c AS (
      | SELECT source, length(text) AS chars,
      |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS letters,
      |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
      |  length(regexp_replace(text, '[^ \t\n]', '', 'g')) AS spaces
      | FROM documents),
      |g AS (
      | SELECT source, count(*) AS docs, sum(chars) AS chars,
      |  sum(letters) AS letters, sum(digits) AS digits, sum(spaces) AS spaces
      | FROM c GROUP BY source)
      |SELECT source, docs, CAST(chars AS BIGINT) AS chars,
      | CAST((1000 * letters) // chars AS BIGINT) AS letter_permille,
      | CAST((1000 * digits) // chars AS BIGINT) AS digit_permille,
      | CAST((1000 * spaces) // chars AS BIGINT) AS space_permille,
      | CAST((1000 * (chars - letters - digits - spaces)) // chars AS BIGINT)
      |  AS other_permille
      |FROM g ORDER BY source""".stripMargin

  /** Per-source vocabulary richness: type-token ratio and hapax-
    * legomenon share. A machine-generated or template-stuffed feed has
    * an anomalously LOW TTR (few types re-served many times) and a low
    * hapax share; scraped natural text sits high on both — the lexical
    * companion to [[charsetProfile]] when triaging feeds. One
    * (source, token) count aggregate (map-side combined) collapsed to
    * |sources| rows.
    */
  def vocabBySource(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(tokens).as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(
        sum("cnt").as("tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("hapax_tokens"))
      .select(
        col("source"),
        col("tokens").cast("long").as("tokens"),
        col("distinct_tokens"), col("hapax_tokens"),
        expr("(1000 * distinct_tokens) div greatest(tokens, 1)")
          .as("ttr_milli"),
        expr("(1000 * hapax_tokens) div greatest(distinct_tokens, 1)")
          .as("hapax_milli"))
      .orderBy("source")

  val VocabBySourceOracleSql: String =
    """WITH t AS (
      | SELECT source, unnest(regexp_extract_all(text, '\S+')) AS token
      | FROM documents),
      |c AS (SELECT source, token, count(*) AS cnt FROM t GROUP BY 1, 2)
      |SELECT source, CAST(sum(cnt) AS BIGINT) AS tokens,
      | count(*) AS distinct_tokens,
      | CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |  AS hapax_tokens,
      | CAST((1000 * count(*)) // greatest(sum(cnt), 1) AS BIGINT)
      |  AS ttr_milli,
      | CAST((1000 * sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END))
      |  // greatest(count(*), 1) AS BIGINT) AS hapax_milli
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** Tokenizer fertility by declared language — pieces-per-word is the
    * tokenizer-efficiency number a multilingual mixture is budgeted in
    * (a language at 2× fertility costs 2× the compute per word, so the
    * mixture plan under-trains it unless the shares are fertility-
    * corrected). Corpus-level sums per language in exact integers; the
    * per-doc regexp work is the same single-pass `regexp_count` as
    * [[tokenCountBpe]], aggregated to |langs| rows.
    */
  def tokenFertility(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("lang"),
        size(tokens).cast("long").as("ws"),
        regexp_count(col("text"), lit(bpePieceRe)).cast("long").as("pieces"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum("ws").as("ws_tokens"),
        sum("pieces").as("bpe_pieces"))
      .select(
        col("lang"), col("docs"), col("ws_tokens"), col("bpe_pieces"),
        expr("(1000 * bpe_pieces) div greatest(ws_tokens, 1)")
          .as("fertility_milli"))
      .orderBy("lang")

  val TokenFertilityOracleSql: String =
    """WITH t AS (
      | SELECT lang,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws,
      |  CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+')) AS BIGINT) AS pieces
      | FROM documents)
      |SELECT lang, count(*) AS docs,
      | CAST(sum(ws) AS BIGINT) AS ws_tokens,
      | CAST(sum(pieces) AS BIGINT) AS bpe_pieces,
      | CAST((1000 * sum(pieces)) // greatest(sum(ws), 1) AS BIGINT)
      |  AS fertility_milli
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-source boilerplate-prefix detector: the most common leading
    * 2-token prefix per source and its milli share of the source's
    * documents — a high share means the feed stamps a template header
    * (license banner, scraper artifact) that near-dup passes then score
    * as content. Ties break to the lexicographically smallest prefix so
    * the winner is deterministic. The shuffle carries (source, 2-token
    * prefix) pairs — never bodies; output is |sources| rows.
    */
  def boilerplatePrefixes(s: SparkSession, dir: String): DataFrame =
    boilerplatePrefixesOf(Tables.documents(s, dir))

  /** The detector over any (source, text) frame — split out so a planted
    * template corpus is testable.
    */
  def boilerplatePrefixesOf(docs: DataFrame): DataFrame = {
    val prefixed = docs.select(
      col("source"),
      concat_ws(" ", slice(tokens, 1, 2)).as("prefix"))
    val bySrc = prefixed.groupBy("source")
      .agg(count(lit(1)).as("src_docs"))
    val counted = prefixed.groupBy("source", "prefix")
      .agg(count(lit(1)).as("docs_with_prefix"))
    val w = Window.partitionBy("source")
      .orderBy(col("docs_with_prefix").desc, col("prefix").asc)
    counted
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(broadcast(bySrc), "source")
      .select(
        col("source"), col("prefix"), col("docs_with_prefix"),
        col("src_docs"),
        expr("(1000 * docs_with_prefix) div src_docs").as("share_milli"))
      .orderBy("source")
  }

  val BoilerplatePrefixesOracleSql: String =
    """WITH p AS (
      | SELECT source,
      |  array_to_string(regexp_extract_all(text, '\S+')[1:2], ' ') AS prefix
      | FROM documents),
      |c AS (
      | SELECT source, prefix, count(*) AS docs_with_prefix
      | FROM p GROUP BY source, prefix),
      |r AS (
      | SELECT source, prefix, docs_with_prefix,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY docs_with_prefix DESC, prefix ASC) AS rk
      | FROM c),
      |s AS (SELECT source, count(*) AS src_docs FROM p GROUP BY source)
      |SELECT r.source, r.prefix, r.docs_with_prefix, s.src_docs,
      | (1000 * r.docs_with_prefix) // s.src_docs AS share_milli
      |FROM r JOIN s ON r.source = s.source
      |WHERE r.rk = 1 ORDER BY r.source""".stripMargin

  /** RAG chunk size / overlap defaults (tokens). Stride = size − overlap. */
  val ChunkTokens = 64
  val ChunkOverlap = 16

  /** RAG document chunking: split every document into fixed-size token
    * windows with overlap — chunk k covers tokens
    * `[1 + k·stride, 1 + k·stride + size)`, starts generated while
    * `start ≤ max(n_tokens − overlap, 1)` so the tail chunk always
    * carries more than the shared overlap (and a short doc is exactly
    * one chunk). Emits per chunk its token offsets AND a PolyHash digest
    * of the actual chunk text, so the content path (slice → join →
    * hash) is gated, not just the arithmetic — the digest is what a
    * downstream embedder/dedup keys on.
    *
    * Scale shape: one scan; the chunk starts are a per-row generated
    * sequence EXPLODED AS THE GENERATOR EXPRESSION (the §5 codegen rule:
    * never explode a lambda-built array across an unpersisted
    * projection); everything after the explode is narrow per-chunk
    * Column algebra, ~n_tokens/stride rows per doc, no shuffle before
    * the output sort.
    */
  def chunkDocuments(
      s: SparkSession, dir: String,
      chunkSize: Int = ChunkTokens, overlap: Int = ChunkOverlap): DataFrame =
    chunksOf(Tables.documents(s, dir), chunkSize, overlap)
      .orderBy("doc_id", "chunk_idx")

  /** The chunk projection over an arbitrary documents frame (needs
    * `doc_id`, `text`) without the output sort — stateless narrow
    * algebra, so [[graft.streaming.StreamingChunks]] runs the IDENTICAL
    * expressions over an unbounded stream (differential-spec'd).
    */
  private[graft] def chunksOf(
      docs: DataFrame,
      chunkSize: Int = ChunkTokens, overlap: Int = ChunkOverlap): DataFrame = {
    require(chunkSize > overlap && overlap >= 0)
    val stride = chunkSize - overlap
    docs
      .select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(
          s"sequence(1, greatest(size(toks) - $overlap, 1), $stride)"))
          .as(Seq("chunk_idx", "token_start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("token_start").cast("long").as("token_start"),
        least(lit(chunkSize), size(col("toks")) - col("token_start") + 1)
          .cast("long").as("chunk_tokens"),
        graft.functions.GraftFunctions.poly_hash(
          concat_ws(" ", slice(col("toks"), col("token_start"), lit(chunkSize))),
          31, 1000000007L).as("chunk_hash"))
  }

  /** DuckDB oracle for [[chunkDocuments]] — identical start generation,
    * slice bounds, and PolyHash over the joined chunk text.
    */
  def chunkDocumentsOracleSql(
      size: Int = ChunkTokens, overlap: Int = ChunkOverlap): String = {
    val stride = size - overlap
    s"""WITH t AS (
       | SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |st AS (
       | SELECT doc_id, toks,
       |  unnest(range(1, greatest(len(toks) - $overlap, 1) + 1, $stride)) AS token_start,
       |  generate_subscripts(range(1, greatest(len(toks) - $overlap, 1) + 1, $stride), 1) - 1 AS chunk_idx
       | FROM t),
       |c AS (
       | SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(token_start AS BIGINT) AS token_start,
       |  CAST(least($size, len(toks) - token_start + 1) AS BIGINT) AS chunk_tokens,
       |  array_to_string(toks[token_start : token_start + $size - 1], ' ') AS chunk_text
       | FROM st)
       |SELECT doc_id, chunk_idx, token_start, chunk_tokens,
       | list_reduce(
       |  list_prepend(0::BIGINT,
       |   list_transform(regexp_extract_all(chunk_text, '(?s).'), ch -> unicode(ch)::BIGINT)),
       |  (acc, x) -> (acc * 31 + x) % 1000000007) AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  }
}
