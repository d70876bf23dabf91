package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark query plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  * Column names and row order must match the oracle exactly — every query
  * ends in an explicit ORDER BY over a unique key, doubles are rounded, and
  * money sums are decimal so results are stable under any partition order.
  */
final case class RegisteredQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  import graft.operators._

  private def q(name: String, oracle: String)(run: (SparkSession, String) => DataFrame) =
    RegisteredQuery(name, run, Some(oracle))
  private def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame) =
    RegisteredQuery(name, run, None)

  /** Queries whose implementations persist intermediate frames (shingle
    * sets, inverted indexes, cached edge lists, token collapses). Their
    * registered runs are wrapped in [[operators.GraphOps.scopedCaches]]:
    * the result is materialized (lineage-truncated) and every cache the
    * build persisted that the result no longer references is released —
    * so a long-lived session pays no per-invocation storage leak. The
    * set is derived from a `persist(` audit of the operator call graphs;
    * everything else is a pure pipeline where the wrapper would only add
    * a pointless result checkpoint.
    */
  private[graft] val cacheScoped: Set[String] = Set(
    // GraphOps iterative family (cached edge/degree frames per entry).
    "pagerank", "pagerank_weighted", "pagerank_topk", "pagerank_conv",
    "hits", "connected_components", "components_conv", "triangle_count",
    "scc_components",
    "kcore", "kcore_conv", "ppr_seeded", "bfs_hops", "sssp_weighted",
    "harmonic_centrality", "betweenness_landmark",
    "graph_distance_histogram", "percolation_audit",
    // AssocOps entity resolution (persists the match-edge frame).
    "entity_clusters", "entity_clusters_conv",
    // LloydOps NN-descent family (localCheckpoints the base IVF graph).
    "knn_graph_refined", "ann_recall_knn_refined",
    "graph_assortativity", "mst_forest", "community_lpa", "community_stats",
    // MinHashOps shingle family (shingle sets + inverted indexes).
    "dedup_minhash", "dedup_ngram", "ngram_stop_shingles",
    "dedup_threshold_curve", "lsh_miss_audit", "lsh_band_curve",
    "source_novelty", "dedup_incremental_neardup",
    "dedup_sorted_neighborhood", "dedup_containment", "dedup_source_matrix",
    // SimHashOps (persisted code frame feeds two probe branches).
    "dedup_simhash",
    // MultimodalOps phash (persisted band frame feeds buckets + verify).
    "media_phash_dedup",
    // LinkOps (cached edges + wedge frames).
    "clustering_coeff", "link_prediction",
    // TemporalOps (persisted zero-filled day spine).
    "rolling_median_7d", "acf_daily",
    // DedupClusterOps family (pair graph + label loop caches).
    "dedup_clusters", "clusters_conv", "dedup_savings",
    "dedup_survivor_quality", "dedup_cluster_sizes", "dedup_consensus",
    // TextOps token collapses; SplitOps rides the pair machinery.
    "lm_surprise", "ccnet_buckets", "dsir_weights", "source_similarity",
    "split_cluster_aware", "split_leakage_audit", "dedup_substring",
    // HybridOps (persisted corpus shingle frame feeds postings + sizes).
    "hybrid_rrf_topk")

  private val raw: Vector[RegisteredQuery] = Vector(
    // ---- ETL suite (reference: analysis/etl_spark.py:119-259) ----
    q("etl_quality_stats",
      """SELECT count(*) AS total_rows,
        | CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        | CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
        | CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS invalid_value,
        | round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(value), 4) AS avg_value,
        | round(max(value), 2) AS max_value,
        | round(min(value), 2) AS min_value
        |FROM events""".stripMargin)(EtlOps.qualityStats),

    q("etl_bucketize",
      """SELECT doc_id,
        | CASE WHEN n_chars < 200 THEN 'short' WHEN n_chars < 350 THEN 'medium' ELSE 'long' END AS length_category,
        | CASE WHEN lang = 'en' THEN 'english' WHEN lang IN ('es','fr','de') THEN 'european' ELSE 'other' END AS lang_group,
        | CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'head' ELSE 'tail' END AS source_bucket
        |FROM documents ORDER BY doc_id""".stripMargin)(EtlOps.bucketize),

    q("etl_sentiment_agg",
      """WITH e AS (
        | SELECT event_type, value,
        |  CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT) AS k
        | FROM events)
        |SELECT event_type, count(*) AS cnt,
        | round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(value), 4) AS avg_value,
        | round(CAST(sum(k) AS DOUBLE) / count(k), 4) AS avg_k
        |FROM e GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin)(
      EtlOps.eventTypeAgg),

    q("etl_readability_agg",
      """SELECT lang,
        | CASE WHEN n_chars < 200 THEN 'short' WHEN n_chars < 350 THEN 'medium' ELSE 'long' END AS length_category,
        | count(*) AS cnt, round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY 1, 2 ORDER BY lang, cnt DESC, length_category""".stripMargin)(
      EtlOps.langLengthAgg),

    q("etl_clean_count",
      """SELECT
        | CAST(sum(CASE WHEN value BETWEEN 0 AND 10000 AND user_id >= 0 AND props IS NOT NULL AND ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS clean_rows,
        | CAST(sum(CASE WHEN value BETWEEN 0 AND 10000 AND user_id >= 0 AND props IS NOT NULL AND ts IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS removed_rows
        |FROM events""".stripMargin)(EtlOps.cleanCount),

    q("etl_composite_scores",
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice * (1 - l_discount), 4) AS net_price,
        | round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged_price,
        | CAST(floor(l_extendedprice / (l_quantity + 1) * 1000 + 0.5) AS BIGINT) AS value_density_milli
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, net_price, charged_price, value_density_milli"""
        .stripMargin)(EtlOps.compositeScores),

    q("etl_summary_stats",
      """SELECT event_type,
        | CASE WHEN value < 25 THEN 'low' WHEN value < 75 THEN 'mid' ELSE 'high' END AS value_band,
        | count(*) AS cnt,
        | round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, value_band""".stripMargin)(
      EtlOps.summaryStats),

    q("etl_final_metrics",
      """WITH cs AS (
        | SELECT round(l_extendedprice * (1 - l_discount), 4) AS net_price,
        |  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged_price,
        |  CAST(floor(l_extendedprice / (l_quantity + 1) * 1000 + 0.5) AS BIGINT) AS value_density_milli
        | FROM lineitem)
        |SELECT count(*) AS final_row_count,
        | round(CAST(sum(CAST(net_price AS DECIMAL(25,10))) AS DOUBLE) / count(net_price), 4) AS avg_net_price,
        | round(CAST(sum(CAST(charged_price AS DECIMAL(25,10))) AS DOUBLE) / count(charged_price), 4) AS avg_charged_price,
        | round(CAST(sum(value_density_milli) AS DOUBLE) / count(value_density_milli), 4) AS avg_value_density_milli,
        | max(net_price) AS max_net_price,
        | max(charged_price) AS max_charged_price,
        | max(value_density_milli) AS max_value_density_milli
        |FROM cs""".stripMargin)(EtlOps.finalMetrics),

    q("etl_json_props",
      """WITH e AS (
        | SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        | FROM events)
        |SELECT event_type, count(k) AS k_count, CAST(sum(k) AS BIGINT) AS k_sum,
        | min(k) AS k_min, max(k) AS k_max
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin)(
      EtlOps.jsonPropsStats),

    q("etl_daily_stats",
      """SELECT epoch_us(ts) // 86400000000 AS epoch_day, count(*) AS events,
        | count(DISTINCT user_id) AS active_users,
        | round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(value), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY epoch_day""".stripMargin)(WindowOps.dailyStats),

    q("median_density_by_flag",
      """WITH d AS (
        | SELECT l_returnflag,
        |  CAST(floor(l_extendedprice / (l_quantity + 1) * 1000 + 0.5) AS BIGINT) AS density_milli
        | FROM lineitem),
        |r AS (
        | SELECT l_returnflag, density_milli,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY density_milli) AS BIGINT) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS cnt
        | FROM d)
        |SELECT l_returnflag,
        | CAST(sum(density_milli) // count(*) AS BIGINT) AS median_density_milli
        |FROM r WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)(
      WindowOps.medianDensityByFlag),

    // Exact multi-quantile per group: one shared histogram pass, type-1
    // integer ranks — no float interpolation to disagree on.
    q("quantiles_density_by_flag", WindowOps.QuantilesOracleSql)(
      WindowOps.quantilesDensityByFlag),

    // Trailing 1h RANGE-frame activity per event: deterministic under
    // ties (RANGE includes all tied rows), decimal value sums.
    q("trailing_hour_stats", WindowOps.TrailingOracleSql)(
      (s, d) => WindowOps.trailingHourStats(s, d)),

    // Peak concurrency per day: hierarchical-prefix-sum sweep line vs
    // the oracle's flat per-day running sum (independent algorithm).
    q("peak_concurrency", WindowOps.PeakConcurrencyOracleSql)(
      WindowOps.peakConcurrency),

    // Exact NTILE(4) per-language length quartiles via hierarchical rank
    // (no single-partition window) vs the oracle's native NTILE.
    q("length_quartiles", WindowOps.LengthQuartilesOracleSql)(
      WindowOps.lengthQuartiles),

    // Cross-source 5-gram overlap matrix: inverted-index self-join,
    // fan-out bounded by |sources|² per gram.
    q("source_overlap", TextOps.SourceOverlapOracleSql)(
      (s, d) => TextOps.sourceNgramOverlap(s, d)),

    // Per-source distinctive-token lift (support-floored, integer bp):
    // what a mixture reweighting would amplify per source.
    q("token_lift", TextOps.TokenLiftOracleSql)(
      (s, d) => TextOps.tokenLiftProfile(s, d)),

    // ---- Window functions / sessionization ----
    q("window_funcs",
      """SELECT event_id, user_id,
        | CAST(row_number() OVER w AS BIGINT) AS seq,
        | CAST(floor((epoch_us(ts) - lag(epoch_us(ts), 1) OVER w) / 1000000) AS BIGINT) AS gap_s,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3) AS cum_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY event_id""".stripMargin)(WindowOps.windowFuncs),

    q("sessionize",
      """WITH g AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        | FROM events),
        |s AS (
        | SELECT user_id,
        |  sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM g)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS sessions, count(*) AS events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)(
      (s, d) => WindowOps.sessionize(s, d)),

    // Deterministic 2-sigma outlier audit: squared integer threshold
    // test, no stddev materialized — bit-identical in any engine.
    q("outlier_events", StatsOps.outlierOracleSql())(
      (s, d) => StatsOps.outlierEvents(s, d)),

    // Robust median/MAD twin: 50% breakdown point where mean/sigma
    // masks under heavy tails; three scan passes, each collapsing to a
    // bounded per-type value histogram.
    q("outlier_events_robust", StatsOps.robustOracleSql())(
      (s, d) => StatsOps.outlierEventsRobust(s, d)),

    // Per-label embedding centroids in micro fixed-point; sums go
    // negative, where Spark div and DuckDB // were verified to agree
    // (both truncate toward zero).
    q("embedding_centroids", StatsOps.CentroidsOracleSql)(
      StatsOps.embeddingCentroids),

    // Ordered funnel conversion (join ladder — per-user state is one
    // timestamp per stage, never an event-list buffer).
    q("funnel_view_click_purchase", FunnelOps.FunnelOracleSql)(FunnelOps.funnel),

    // Cohort retention matrix (first-activity-day cohorts, per-offset
    // activity shares; user-day-bounded distinct, no per-user windows).
    q("retention_matrix", FunnelOps.RetentionOracleSql)(FunnelOps.retentionMatrix),

    // Conversion-latency quartiles (histogram rank-select; oracle ranks
    // users directly with row_number — independent algorithm). The
    // histogram window is deliberately unpartitioned: its input is
    // value-domain-bounded, the median_density_by_flag trade.
    q("conversion_time_quantiles", FunnelOps.ConversionQuantilesOracleSql)(
      FunnelOps.conversionTimeQuantiles),

    // Consecutive-event transition matrix (deterministic lead window).
    q("event_transitions", FunnelOps.TransitionsOracleSql)(
      FunnelOps.eventTransitions),

    // U-shaped multi-touch attribution: exact-integer 40/20/40 credit
    // split per conversion, mass-conserving (the 'none' row carries
    // untouched purchases' full credit) - beside last-touch.
    q("attribution_u_shaped", TemporalOps.attributionUShapedOracleSql())(
      (s, d) => TemporalOps.attributionUShaped(s, d)),

    // Time-budgeted funnel: each step within 24h of the previous (greedy
    // earliest-completion, documented) - the windowed twin of funnel.
    q("funnel_windowed", FunnelOps.funnelWindowedOracleSql())(
      (s, d) => FunnelOps.funnelWindowed(s, d)),

    // Top-1 next-event predictability: the chain's in-sample mode
    // hit-rate — the headroom readout before training a sequence model.
    q("markov_top1_accuracy", FunnelOps.MarkovTop1OracleSql)(
      (s, d) => FunnelOps.markovTop1Accuracy(s, d)),

    // ---- Complex joins (reference: analysis/etl_spark.py:52 op list) ----
    q("join_nation_revenue",
      """SELECT n.n_name, count(*) AS line_items,
        | round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,10))
        |   * (CAST(1 AS DECIMAL(25,10)) - CAST(l.l_discount AS DECIMAL(25,10)))) AS DOUBLE), 2) AS revenue
        |FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)(JoinOps.nationRevenue),

    // Dataset card: the one-page release data sheet (volumes, diversity,
    // dup mass, quality survival, decon removal) as (stat, value) rows,
    // each line reusing a gated family's expressions verbatim.
    q("dataset_card", ProfileOps.DatasetCardOracleSql)(
      (s, d) => ProfileOps.datasetCard(s, d)),

    // Canonical TPC-H trio (Q3's shape is star_ship_priority): the
    // classic OLAP completeness check - pushed-down date filters,
    // broadcast dimension legs, exact decimal money math.
    q("tpch_q1", TpchOps.Q1OracleSql)((s, d) => TpchOps.q1(s, d)),
    q("tpch_q5", TpchOps.Q5OracleSql)((s, d) => TpchOps.q5(s, d)),
    q("tpch_q6", TpchOps.Q6OracleSql)((s, d) => TpchOps.q6(s, d)),
    // ...r17: the two remaining classic join shapes — Q18's
    // group-HAVING-semi-join into a deterministic top-100 (the per-order
    // rollup doubles as HAVING filter and output aggregate; no second
    // lineitem read) and Q2's correlated min over a dimension subtree
    // (window-min per part replaces the correlated subquery).
    q("tpch_q18", TpchOps.Q18OracleSql)((s, d) => TpchOps.q18(s, d)),
    q("tpch_q2", TpchOps.Q2OracleSql)((s, d) => TpchOps.q2(s, d)),

    q("join_orders_rollup",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS orders,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,10))) AS DOUBLE), 2) AS total_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)(
      JoinOps.ordersRollup),

    // CUBE: all four grouping sets in one scan + one agg exchange;
    // grouping_id disambiguates subtotals and completes the sort key.
    q("cube_lineitem_status", JoinOps.CubeOracleSql)(JoinOps.lineitemCube),

    // Pivot as pure conditional aggregation over an EXPLICIT value list
    // (no driver-side distinct pass to discover pivot values).
    q("pivot_lang_mix", EtlOps.PivotOracleSql)((s, d) => EtlOps.langPivot(s, d)),

    q("join_customer_census",
      """WITH w AS (
        | SELECT c_mktsegment, count(*) AS with_orders FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY 1),
        |wo AS (
        | SELECT c_mktsegment, count(*) AS without_orders FROM customer
        | WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY 1)
        |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
        | coalesce(w.with_orders, 0) AS with_orders,
        | coalesce(wo.without_orders, 0) AS without_orders
        |FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)(JoinOps.customerOrderCensus),

    // Referential-integrity audit: five FK relationships, one pass per
    // fact table, null-count existence joins — the pre-publish contract.
    q("ri_audit", JoinOps.RiAuditOracleSql)((s, d) => JoinOps.riAudit(s, d)),

    // Market-basket association rules: pair generation bounded by basket
    // size (never parts^2), staged-div lift so the arithmetic stays in
    // BIGINT at any corpus size; top-100 by support.
    q("basket_rules", AssocOps.basketRulesOracleSql())(
      (s, d) => AssocOps.basketRules(s, d)),

    // Blocked fuzzy record linkage: Levenshtein-verified candidate pairs
    // confined to (p_type, p_size) blocks — the entity-resolution shape
    // whose quadratic step never leaves a block.
    q("fuzzy_link_parts", AssocOps.fuzzyLinkOracleSql())(
      (s, d) => AssocOps.fuzzyLinkParts(s, d)),

    // ...and the entity-resolution step those blocked pairs feed:
    // min-label propagation collapses transitive match chains into
    // entities (one row each: label, member count, key range).
    q("entity_clusters", AssocOps.entityClustersOracleSql())(
      (s, d) => AssocOps.entityClusters(s, d)),

    // ...and its convergence-checked twin: iterate until no label moves,
    // oracle unrolled with 20-round headroom (a stable fixpoint, so the
    // extra oracle rounds are no-ops once converged) — pins that the
    // fixed-round production form's 4 rounds actually suffice at each
    // gated SF, and catches >4-hop chains the mirrored oracle can't.
    q("entity_clusters_conv", AssocOps.entityClustersOracleSql(rounds = 20))(
      (s, d) => AssocOps.entityClustersConverged(s, d)._2),

    // Skyline / Pareto frontier (min price, max size): dominance test
    // decomposed into hierarchical prefix maxima — no self-join, no
    // whole-table serial scan; the oracle runs the independent quadratic
    // NOT EXISTS definition.
    q("skyline_parts", SkylineOps.skylineOracleSql())(
      (s, d) => SkylineOps.skylineParts(s, d)),

    // Per-type OLS value-vs-time trend: normal-equation terms exact in
    // DECIMAL(38,0) over hour-centered time; only the final slope
    // division runs in IEEE doubles, quantized floor(x*1e4+0.5).
    q("trend_by_type", StatsOps.trendOracleSql())(
      (s, d) => StatsOps.trendByType(s, d)),

    // EWMA daily smoothing, alpha = 1/8 in exact milli fixed-point: the
    // genuinely-sequential recurrence folds each type's bounded day
    // series with one higher-order aggregate; recursive-CTE oracle.
    q("ewma_daily", TemporalOps.ewmaDailyOracleSql())(
      (s, d) => TemporalOps.ewmaDaily(s, d)),

    // Quantile-transform lookup table: per type each distinct milli
    // value -> min-rank quantile ppm; output is value-domain-bounded,
    // the broadcastable normalization table a feature pipeline joins.
    q("quantile_transform_table", StatsOps.quantileTransformOracleSql())(
      (s, d) => StatsOps.quantileTransformTable(s, d)),

    // Fano-factor burstiness of daily volumes (zero-filled): F=Var/mean
    // in exact integers - 1000 milli is Poisson, above is bursty.
    q("burstiness_fano", StatsOps.burstinessFanoOracleSql())(
      (s, d) => StatsOps.burstinessFano(s, d)),

    // Theil-Sen robust trend: exact lower median of the pairwise daily
    // slopes — pair stage quadratic in DAYS (the time-span domain), not
    // rows; the robust rung beside the OLS normal equations.
    q("trend_theil_sen", StatsOps.theilSenOracleSql())(
      (s, d) => StatsOps.theilSenTrend(s, d)),

    // Equi-width 20-bucket histogram export of events.value; edges from
    // one broadcast min/max scalar pair, integer output.
    q("value_histogram", StatsOps.valueHistogramOracleSql())(
      (s, d) => StatsOps.valueHistogram(s, d)),

    // Mergeable fixed-grid quantile sketch beside its exact twin: per
    // type x {p50,p90,p99}, the bucket-edge estimate, the exact value,
    // and the realized error — gated err in [0, width) by construction.
    q("quantile_sketch_audit", StatsOps.quantileSketchOracleSql())(
      (s, d) => StatsOps.quantileSketchAudit(s, d)),

    // Distributed BPE vocabulary induction: eight corpus-level merge
    // rounds with exact greedy left-to-right non-overlap semantics (run
    // detection + even offsets, pure window algebra); the oracle unrolls
    // the identical rounds in SQL. Deterministic 5% doc carve.
    q("bpe_merges", BpeOps.bpeMergesOracleSql())(
      (s, d) => BpeOps.bpeMerges(s, d)),

    // Item-item collaborative-filtering neighbors: exact integer
    // milli-Jaccard over buyer sets, basket-bounded pair space, per-item
    // top-k window (each item's own neighbor list, no global sort).
    q("item_neighbors", AssocOps.itemNeighborsOracleSql())(
      (s, d) => AssocOps.itemNeighbors(s, d)),

    // Categorical independence audit (lang x source): observed vs
    // expected-under-independence shares in ppm, staged integer division
    // so the audit is overflow-free at any corpus size.
    q("independence_audit", AssocOps.independenceAuditOracleSql())(
      (s, d) => AssocOps.independenceAudit(s, d)),

    // Shard-merge aggregation vs the oracle's DIRECT aggregate: proves
    // partial-agg maintenance is exactly associative (decimal partials).
    q("agg_shard_merge", EtlOps.ShardMergeOracleSql)(
      (s, d) => EtlOps.shardMergeAgg(s, d)),

    // RFM segmentation: three exact-NTILE quartile dimensions via the
    // hierarchical rank helper (no single-partition windows) vs three
    // native-NTILE oracle windows.
    q("rfm_segments", RfmOps.RfmOracleSql)((s, d) => RfmOps.rfmSegments(s, d)),

    // ---- Full star schema: the part/supplier arms (StarOps) ----
    // Two broadcast-hinted bounded dims (nation, supplier) + part left
    // to Catalyst/AQE (auto-broadcast at bench SF, shuffle join at
    // 100 TB where part exceeds the threshold).
    q("star_brand_margin", StarOps.BrandNationMarginOracleSql)(
      StarOps.brandNationMargin),

    // Q3-shaped top-k with exact milli fixed-point ordering; both date
    // predicates reach the scans as pushed parquet filters.
    q("star_ship_priority", StarOps.ShippingPriorityOracleSql)(
      StarOps.shippingPriority),

    // Q14-shaped promo share in integer basis points (milli div milli).
    q("star_promo_share", StarOps.PromoShareOracleSql)(StarOps.promoShare),

    // Keyless range join via interval bucketing (bucket width = interval
    // width; each interval probes <= 2 buckets). The oracle is DuckDB's
    // native range join — an independent algorithm, so this is a true
    // cross-check, not an identical-formulation one.
    q("range_join_views", RangeJoinOps.oracleSql())(
      (s, d) => RangeJoinOps.purchaseViewsWithin(s, d)),

    // As-of join via tagged-union + running carry-forward window — one
    // shuffle, no per-key range fan-out; oracle is the identical
    // deterministic formulation (native ASOF leaves ties unspecified).
    q("asof_join", AsofJoinOps.OracleSql)(AsofJoinOps.purchaseAsofClick),

    // ---- Graph suite (reference: analysis/pagerank_spark.py, triangles_spark.py) ----
    q("graph_degrees",
      """WITH und AS (
        | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT src, dst FROM und UNION ALL SELECT dst AS src, src AS dst FROM und)
        |SELECT src AS node, count(*) AS out_degree
        |FROM edges GROUP BY src ORDER BY node""".stripMargin)(GraphOps.degrees),

    q("pagerank", GraphOps.pagerankOracleSql(10))((s, d) => GraphOps.pagerank(s, d, 10)),

    // Weighted PageRank: rank mass split by co-purchase multiplicity
    // over out-strength; same exchange-free loop, unrolled oracle.
    q("pagerank_weighted", GraphOps.pagerankWeightedOracleSql(10))(
      (s, d) => GraphOps.pagerankWeighted(s, d, 10)),

    // HITS hubs/authorities over the bipartite purchase graph: integer
    // L1-normalized rounds, twice-partitioned edge caches, unrolled
    // oracle of the identical recurrence.
    q("hits", GraphOps.hitsOracleSql(10))((s, d) => GraphOps.hits(s, d, 10)),

    // The reference's headline PageRank artifact: top-N nodes by score
    // (pagerank_spark.py:204). Fixed-point scores make the ranking exact.
    q("pagerank_topk", GraphOps.pagerankTopKOracleSql(10, 20))(
      (s, d) => GraphOps.pagerankTopK(s, d, 10, 20)),

    // 5 rounds: the co-purchase graph's measured diameter is 3 at every
    // SF, and Spark and the oracle run the identical unrolled algorithm,
    // so outputs stay equal at any round count.
    q("connected_components", GraphOps.connectedComponentsOracleSql(5))(
      (s, d) => GraphOps.connectedComponents(s, d, 5)),

    // Synchronous plurality LPA, 4 fixed rounds, min-label tie-break —
    // deterministic and oracle-unrolled like CC above; communities, not
    // components (a bridge edge does not merge the dense sides).
    q("community_lpa", GraphOps.communityLpaOracleSql(4))(
      (s, d) => GraphOps.communityLpa(s, d, 4)),

    // Per-community rollup of the LPA labels: size, internal edges,
    // degree mass, and the exact-integer modularity contribution —
    // the did-LPA-find-structure audit (Σ contrib_ppm ≈ Q·1e6).
    q("community_stats", GraphOps.communityStatsOracleSql(4))(
      (s, d) => GraphOps.communityStats(s, d, 4)),

    // K-core by iterative peeling (fixed rounds = oracle entry; the
    // converged mode is the production path, mirroring CC/PageRank).
    q("kcore", GraphOps.kcoreOracleSql(60, 4))(
      (s, d) => GraphOps.kcore(s, d, 60, 4)),

    q("triangle_count",
      """WITH e AS MATERIALIZED (
        | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT count(*) AS triangles
        |FROM e e1 JOIN e e2 ON e1.dst = e2.src
        | JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin)(
      GraphOps.triangleCount),

    // ---- LLM-pipeline: exact dedup + text analysis over documents.text ----
    q("dedup_exact",
      """SELECT sha256(text) AS text_hash, count(*) AS copies,
        | min(doc_id) AS survivor_id
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin)(TextOps.dedupExact),

    q("dedup_stats",
      """WITH h AS (SELECT sha256(text) AS text_hash, count(*) AS c
        | FROM documents GROUP BY 1)
        |SELECT CAST(sum(c) AS BIGINT) AS total_docs, count(*) AS distinct_texts,
        | CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
        | CAST(sum(c - 1) AS BIGINT) AS dup_rows
        |FROM h""".stripMargin)(TextOps.dedupStats),

    q("text_stats",
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars_nows,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '\b(the|and|is|of|to|in|it|a)\b')) AS BIGINT) AS n_stopwords
        | FROM documents)
        |SELECT doc_id, n_tokens, n_chars_nows, n_punct, n_stopwords,
        | (1000 * n_chars_nows) // greatest(n_tokens, 1) AS avg_token_len_milli,
        | (1000 * n_stopwords) // greatest(n_tokens, 1) AS stopword_ratio_milli
        |FROM t ORDER BY doc_id""".stripMargin)(TextOps.textStats),

    q("lang_id",
      """WITH s AS (
        | SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(text, '\b(the|and|is|of)\b')) AS BIGINT) AS s_en,
        |  CAST(len(regexp_extract_all(text, '\b(el|la|de|que|y)\b')) AS BIGINT) AS s_es,
        |  CAST(len(regexp_extract_all(text, '\b(le|les|et|est|une)\b')) AS BIGINT) AS s_fr,
        |  CAST(len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) AS BIGINT) AS s_de
        | FROM documents)
        |SELECT doc_id, lang, s_en, s_es, s_fr, s_de,
        | CASE
        |  WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
        |  WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_de THEN 'es'
        |  WHEN s_fr > 0 AND s_fr >= s_de THEN 'fr'
        |  WHEN s_de > 0 THEN 'de'
        |  ELSE 'und' END AS predicted_lang,
        | CAST(CASE
        |  WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
        |  WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_de THEN 'es'
        |  WHEN s_fr > 0 AND s_fr >= s_de THEN 'fr'
        |  WHEN s_de > 0 THEN 'de'
        |  ELSE 'und' END = lang AS BIGINT) AS is_correct
        |FROM s ORDER BY doc_id""".stripMargin)(TextOps.langId),

    // Declared-vs-detected language confusion matrix: aggregates the
    // same scored frame as lang_id, |langs|^2 cells with milli row share.
    q("lang_confusion", TextOps.LangConfusionOracleSql)(
      TextOps.langConfusion),

    // Cohen's kappa for the detector: chance-corrected agreement as one
    // fixed-point row beside the full confusion matrix (accuracy
    // flatters any detector on a skewed language mix).
    q("lang_kappa", TextOps.LangKappaOracleSql)(
      TextOps.langKappa),

    // Per-doc character-bigram self-information (compressibility-proxy
    // junk detector): exact floor-log2 bits via the bitlen trick, the
    // document's OWN statistics rather than the corpus vocabulary.
    q("doc_char_entropy", TextOps.DocCharEntropyOracleSql)(
      TextOps.docCharEntropy),

    // Oracle is the exact computation: inverted-index candidate pairs
    // (share >= 1 shingle, i.e. Jaccard > 0) + exact fixed-point Jaccard.
    // The Spark side uses MinHash-LSH candidates instead; at 32 bands x 2
    // rows the probability a >=0.6-Jaccard pair escapes all bands is
    // ~6e-7, and both sides verify candidates exactly, so outputs match.
    q("dedup_minhash",
      """WITH tok AS (
        | SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |sh AS (
        | SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |  ELSE list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])
        |  END AS shingles
        | FROM tok),
        |e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |cand AS (
        | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id),
        |j AS (
        | SELECT c.doc_a, c.doc_b,
        |  (1000 * len(list_intersect(x.shingles, y.shingles)))
        |   // len(list_distinct(list_concat(x.shingles, y.shingles))) AS jaccard_milli
        | FROM cand c JOIN sh x ON c.doc_a = x.doc_id JOIN sh y ON c.doc_b = y.doc_id)
        |SELECT doc_a, doc_b, CAST(jaccard_milli AS BIGINT) AS jaccard_milli
        |FROM j WHERE jaccard_milli >= 600 ORDER BY doc_a, doc_b""".stripMargin)(
      MinHashOps.dedupMinhash),

    // ---- LLM-pipeline: similarity search over embeddings ----
    q("ann_topk", AnnOps.annTopkOracleSql())((s, d) => AnnOps.annTopK(s, d)),

    // Metadata-filtered exact ANN: candidates pre-filtered to the
    // query's label before scoring (never a post-filtered top-k).
    q("ann_topk_filtered", AnnOps.annTopkFilteredOracleSql())(
      (s, d) => AnnOps.annTopKFiltered(s, d)),

    // Contrastive hard-negative mining: top-k most-similar DIFFERENT-
    // label candidates per query (the filtered path's complement).
    q("hard_negatives", AnnOps.hardNegativesOracleSql())(
      (s, d) => AnnOps.hardNegatives(s, d)),

    // Approximate k-NN graph: top-k neighbors of EVERY vector — the
    // semantic-dedup primitive. Auto-SELECTING since r15: the adaptive
    // SimHash width (r13) bounds only the uniform part of the occupancy,
    // and clustered corpora still concentrate into one code (sf1: max
    // occupancy 852, measured exponent 1.10) — so the entry now reads
    // the occupancy meter and rides the Lloyd-IVF graph (bounded
    // nprobe x sqrt(n) candidates) whenever the SimHash bound is broken,
    // keeping the cheap bucket graph for genuinely spread corpora. The
    // oracle replays the decision itself from the same fixed-point codes.
    q("knn_graph", LloydOps.knnGraphSelectOracleSql())(
      (s, d) => LloydOps.knnGraphSelect(s, d)),

    // Bucket-occupancy histogram at the adaptive width: does bitsFor's
    // occupancy target hold on THIS corpus, and what does the worst
    // bucket cost (exact candidate work per band).
    q("ann_bucket_occupancy", AnnOps.bucketOccupancyOracleSql())(
      (s, d) => AnnOps.bucketOccupancy(s, d)),

    // kNN label-agreement audit: per-label mean neighborhood agreement
    // + suspect counts — the mislabel detector a labeled-embedding
    // corpus runs before training. Rides the AUTO-SELECTED graph since
    // r15 (same occupancy-meter decision as knn_graph, replayed by the
    // oracle), so the audit stays candidate-bounded on clustered corpora.
    q("knn_label_agreement", LloydOps.knnLabelAgreementSelectOracleSql())(
      (s, d) => LloydOps.knnLabelAgreementSelect(s, d)),

    // The LSH scale path for ANN as a first-class checked query: same
    // output contract as ann_topk, oracle generated from the identical
    // fixed-point code/probe constants (no recall mismatch possible).
    q("ann_lsh_topk", AnnOps.annLshOracleSql())(AnnOps.annLshTopKRegistered),

    // Integer recall@k of the LSH path vs the exact baseline — the audit
    // that guards recall collapse as bitsFor scales the code width with
    // the corpus. Oracle-gated end to end (both sides SQL-expressible).
    q("ann_recall_lsh", AnnOps.annRecallLshOracleSql())(AnnOps.annRecallLsh),

    // Product-quantization ADC search — the compressed-store scale path
    // (8-byte codes vs 256-byte vectors). All fixed-point integers, so
    // unlike the MLlib-backed IVF twin this path is oracle-gated end to
    // end, as is its recall@k audit against the exact baseline.
    q("ann_pq_topk", PqOps.pqOracleSql())((s, d) => PqOps.annPqTopK(s, d)),
    q("ann_recall_pq", PqOps.annRecallPqOracleSql())(PqOps.annRecallPq),

    // Two-tier ANN (LSH bucket pruning + PQ-compressed ADC scoring): the
    // hot path reads 8-byte codes, never raw vectors — the 100 TB search
    // shape — and both tiers are fixed-point, so the whole composition
    // plus its recall audit stays oracle-gated.
    q("ann_lshpq_topk", PqOps.lshPqOracleSql())((s, d) => PqOps.annLshPqTopK(s, d)),
    q("ann_recall_lshpq", PqOps.annRecallLshPqOracleSql())(PqOps.annRecallLshPq),

    // IVF+PQ: Lloyd coarse lists + ADC scoring — the FAISS-standard
    // composition, fully oracle-closed (index build AND search).
    q("ann_ivfpq_topk", PqOps.ivfPqOracleSql())((s, d) => PqOps.annIvfPqTopK(s, d)),
    q("ann_recall_ivfpq", PqOps.annRecallIvfPqOracleSql())(PqOps.annRecallIvfPq),

    // IVF+PQ + exact refine: the ADC pass keeps a 4k shortlist, only
    // those ids touch raw vectors — the full production serving shape.
    q("ann_ivfpq_rerank_topk", PqOps.ivfPqRerankOracleSql())(
      (s, d) => PqOps.annIvfPqRerankTopK(s, d)),
    q("ann_recall_ivfpq_rerank", PqOps.annRecallIvfPqRerankOracleSql())(
      PqOps.annRecallIvfPqRerank),

    // Binary (sign-bit) quantization ANN: 16-byte packed codes, Hamming
    // popcount shortlist, exact re-rank on shortlist ids only — the 32x-
    // compression end of the ANN storage ladder; plus its recall audit.
    q("ann_binary_topk", BinaryAnnOps.binaryOracleSql())(
      (s, d) => BinaryAnnOps.annBinaryTopK(s, d)),
    q("ann_recall_binary", BinaryAnnOps.annRecallBinaryOracleSql())(
      BinaryAnnOps.annRecallBinary),

    // SQ8 (scalar-quantized int8) ANN — the 4x-compression middle rung
    // between raw floats and PQ/binary codes (FAISS IndexScalarQuantizer
    // shape): full scan over per-vector symmetric int8 codes with the
    // exact-integer symmetric ADC, shortlist re-ranked by exact cosine;
    // recall@k audited against the exact baseline like every other rung.
    q("ann_sq8_topk", BinaryAnnOps.sq8OracleSql())(
      (s, d) => BinaryAnnOps.annSq8TopK(s, d)),
    q("ann_recall_sq8", BinaryAnnOps.annRecallSq8OracleSql())(
      BinaryAnnOps.annRecallSq8),

    // Matryoshka truncation-recall ladder: exact search over 16/32-dim
    // prefixes vs the full-width baseline — prices MRL-style dimension
    // truncation the way the PQ audits price code compression.
    q("ann_matryoshka_recall", BinaryAnnOps.annMatryoshkaRecallOracleSql())(
      (s, d) => BinaryAnnOps.annMatryoshkaRecall(s, d)),

    // Semantic decontamination: per-label counts of corpus vectors whose
    // max cosine against the fixed eval carve crosses the threshold —
    // the embedding-space complement of the lexical decontamination
    // family (paraphrases never collide on n-grams). One scan, constant
    // eval set as a broadcast literal, no join.
    q("decontamination_semantic", AnnOps.decontaminationSemanticOracleSql())(
      (s, d) => AnnOps.decontaminationSemantic(s, d)),

    // Greedy k-center (Gonzalez) diversity seeds: 7 literal-seed scans,
    // each reduced by one associative max(struct) argmax — farthest-point
    // exemplar selection with the covering-radius sequence as output.
    q("kcenter_seeds", AnnOps.kCenterOracleSql())(
      (s, d) => AnnOps.kCenterSeeds(s, d)),

    // Sub-document span duplication map: positional 8-token spans shared
    // with another doc, per-doc boilerplate fraction in bp.
    q("span_dedup", TextOps.SpanDedupOracleSql)(
      (s, d) => TextOps.spanDedup(s, d)),

    // Variable-length exact-substring dedup (Lee et al. 2022): longest
    // exactly-shared token run per cross-doc pair, from capped seed
    // spans chained along equal diagonals (pos - row_number islands).
    q("dedup_substring", TextOps.substringDedupOracleSql())(
      (s, d) => TextOps.substringDedup(s, d)),

    // Exact inverted-index n-gram Jaccard: same output contract as
    // dedup_minhash, with stop-shingles above the default df cap pruned
    // from the CANDIDATE stage only (verification keeps the full sets,
    // so emitted values are the exact uncapped Jaccard — the oracle
    // applies the identical cap to its candidate join). Documents with
    // IDENTICAL shingle sets bypass the cap entirely (the mass-
    // duplication exemption): without it, a doc duplicated 64+ times has
    // every shingle above the cap and would silently vanish from the
    // candidate stage. Residual blind spot, by design: a near-but-not-
    // exact pair whose every shared shingle is 64+-doc template mass.
    q("dedup_ngram", MinHashOps.DedupNgramOracleSql)(MinHashOps.dedupNgram),

    // Stop-shingle audit next to the capped dedup: how much index and
    // candidate volume the default df cap removes (the quadratic-bomb
    // meter for template-heavy corpora).
    q("ngram_stop_shingles", MinHashOps.NgramStopShinglesOracleSql)(
      MinHashOps.ngramStopShingles),

    // Threshold-sensitivity curve: exact pair volume per 100-milli
    // Jaccard bucket (from 300) with the cumulative at-or-above count —
    // the tuning artifact for the dedup bar.
    q("dedup_threshold_curve", MinHashOps.DedupThresholdCurveOracleSql)(
      MinHashOps.dedupThresholdCurve),

    // LSH recall contract as a gated query: modeled (1-J^2)^32 miss ppm
    // per Jaccard bucket via an exact integer chain, plus the measured
    // exact-vs-LSH differential — missed_pairs hashing to zero IS the
    // recall gate; a banding or bucket-cap regression fails it.
    q("lsh_miss_audit", MinHashOps.lshMissAuditOracleSql())(
      (s, d) => MinHashOps.lshMissAudit(s, d)),

    // Banding-config S-curve over the corpus's OWN sub-threshold pair
    // profile: modeled catch ppm for 64x1/32x2/16x4/8x8 per Jaccard
    // bucket — the retuning table beside the shipped 32x2.
    q("lsh_band_curve", MinHashOps.lshBandCurveOracleSql())(
      MinHashOps.lshBandCurve),

    // Sub-threshold redundancy meter: share of each source's shingle
    // occurrences first seen in that document (ingestion-order
    // attribution) — low novelty flags a feed re-serving known content
    // even when no pair clears the dedup bar.
    q("source_novelty", MinHashOps.SourceNoveltyOracleSql)(
      MinHashOps.sourceNovelty),

    // Dedup byte-savings per source: chars/docs the converged near-dup
    // clustering would remove, as a milli share of the source's bytes;
    // independent recursive-reachability oracle.
    q("dedup_savings", DedupClusterOps.dedupSavingsOracleSql())(
      DedupClusterOps.dedupSavings),

    // Machine-consensus contingency: per doc, the exact / normalized /
    // near-dup verdicts rolled to the 2x2x2 table — what each machine
    // adds, and any exact-dup-missed-by-neardup recall hole as a gated
    // number.
    q("dedup_consensus", DedupClusterOps.dedupConsensusOracleSql())(
      (s, d) => DedupClusterOps.dedupConsensus(s, d)),

    // Survivor POLICY audit: keep-min-id vs keep-the-quality-passing
    // member, one hashed decision row per duplicate cluster; independent
    // recursive-reachability oracle, quality CTEs from quality_filter.
    q("dedup_survivor_quality", DedupClusterOps.survivorQualityOracleSql())(
      DedupClusterOps.survivorQuality),

    // Cluster-size histogram: where the duplicate mass sits (pairs vs
    // 9+ chains) — the convergence-risk and survivor-policy readout.
    q("dedup_cluster_sizes", DedupClusterOps.clusterSizesOracleSql())(
      DedupClusterOps.clusterSizes),

    q("dedup_simhash", SimHashOps.oracleSql)(SimHashOps.dedupSimhash),

    // Cluster the near-dup pair graph (connected components) and pick one
    // survivor per cluster — the keep-one step after pair detection. The
    // Spark side iterates min-label propagation TO CONVERGENCE (a fixed
    // round count would silently under-merge long-diameter clusters); the
    // oracle is an independent recursive-reachability fixpoint, so a
    // convergence bug fails the gate instead of being mirrored.
    q("dedup_clusters", DedupClusterOps.convergedOracleSql())(
      DedupClusterOps.dedupClusters),

    // Deterministic hash-bucket stratified sampling (language rebalance):
    // keep iff fingerprint % 1000 falls under the stratum's permille rate.
    q("sample_stratified", SampleOps.sampleOracleSql())(SampleOps.sampleStratified),

    // Pre-write shard balance plan: route by fingerprint mod shard count,
    // report per-shard doc/char totals.
    q("shard_plan", SampleOps.shardOracleSql())(SampleOps.shardPlanQuery),

    // Content-addressed shard manifest: order-independent per-shard
    // digest (sum of fingerprints mod prime) + id range + byte mass —
    // the provenance record published beside each written shard.
    q("shard_manifest", SampleOps.shardManifestOracleSql())(
      SampleOps.shardManifestQuery),

    // Per-shard raw-vs-curated release diff off ONE scan (conditional
    // sums beside the raw aggregates): what quality curation removed,
    // and digest equality so unchanged shards skip re-publication.
    q("manifest_drift", SampleOps.manifestDriftOracleSql())(
      (s, d) => SampleOps.manifestDrift(s, d)),

    // Reshard-movement audit: mod-N vs rendezvous routing when the
    // shard count grows 16 -> 17 — mod moves ~N/(N+1) of the corpus,
    // rendezvous only the keys the new shard wins (~1/(N+1)); zero
    // shuffles, one map-side global aggregate.
    q("reshard_audit", SampleOps.reshardAuditOracleSql())(
      SampleOps.reshardAuditQuery),

    // Fixed-size per-stratum sample via a bounded MinK typed Aggregator
    // (partial agg; the window-oracle formulation would serialize a head
    // stratum through one task at scale).
    q("sample_fixed_per_stratum", SampleOps.fixedOracleSql())(
      (s, d) => SampleOps.fixedPerStratum(s, d)),

    // Per-source quota cap (bounded top-k aggregator; head domain can't
    // dominate the mix) — oracle is the window formulation.
    q("source_quota", SampleOps.sourceQuotaOracleSql())(
      (s, d) => SampleOps.sourceQuota(s, d)),

    // Language-mixture rebalancing plan: largest pure-downsampling corpus
    // hitting the target shares exactly; integer capacities.
    q("mixture_plan", SampleOps.mixtureOracleSql())(
      (s, d) => SampleOps.mixturePlan(s, d)),

    // Temperature-scaled (tau=1/2) source mixture: sqrt-weighted shares
    // frozen to fixed point before the integer divides; raw-vs-tempered
    // shares plus the boost factor per source.
    q("mixture_temperature", SampleOps.MixtureTemperatureOracleSql)(
      SampleOps.mixtureTemperature),

    // Leave-one-source-out quality ablation: corpus keep-rate without
    // each source + ppm delta vs the full corpus, from per-source totals
    // alone (one scan; ablation is subtraction on an additive metric).
    q("source_ablation", SampleOps.SourceAblationOracleSql)(
      (s, d) => SampleOps.sourceAblation(s, d)),

    // Score-based selection: integer composite score (quality keep +
    // exact-unique + language-known), per-source top-600-milli cut at
    // EXACT hierarchical rank; one waterline row per source. Where
    // sample_stratified keeps a hash-random fraction, this keeps the
    // best fraction.
    q("selection_scores", SampleOps.selectionScoresOracleSql())(
      (s, d) => SampleOps.selectionScores(s, d)),

    // Flagship composition: quality filter -> stratified sample -> shard
    // routing in ONE declarative plan (single scan, one agg shuffle).
    q("curation_pipeline", SampleOps.curationOracleSql())(
      (s, d) => SampleOps.curationPipeline(s, d)),

    // Weighted systematic sampling: ~k docs proportional to n_chars via
    // cumulative-weight step crossings — deterministic and rerun-stable
    // (no rand()); hierarchical prefix sum, flat-window oracle.
    q("sample_weighted", SampleOps.sampleWeightedOracleSql())(
      (s, d) => SampleOps.sampleWeighted(s, d)),

    // Pareto 80/20 coverage cut over per-source counts: the feed
    // concentration audit; cumulative window over the source list only.
    q("pareto_sources", SampleOps.paretoSourcesOracleSql())(
      (s, d) => SampleOps.paretoSources(s, d)),

    // Oracle is the identical bucketed algorithm, unrolled from the same
    // constants (fixed-point SimHash codes, Hamming<=1 probes, exact
    // cosine verify) — so query and oracle share the recall profile and
    // the gate stays meaningful on corpora that DO contain near-dups,
    // instead of an exact-vs-probabilistic pair that only agrees while
    // the corpus happens to have none.
    // Width-adaptive since r13 (same sf1 finding as knn_graph: fixed
    // 10-bit buckets went superlinear, 10.8 s at sf1).
    q("dedup_embed", AnnOps.embedAutoOracleSql())(
      (s, d) => AnnOps.embedNearDupStatsAuto(s, d)),

    // Eval-set decontamination: digest-only anti-join; the stand-in eval
    // set is a deterministic 10% fingerprint carve of the corpus.
    q("decontamination_stats", TextOps.decontaminationOracleSql)(
      TextOps.decontaminationStats),

    // N-gram-overlap decontamination (GPT-3-style): shared 5-grams with
    // the eval carve, catching partial quotes exact digests miss. Eval
    // gram set broadcasts; the corpus side never shuffles.
    q("decontamination_ngram", TextOps.DecontaminationNgramOracleSql)(
      (s, d) => TextOps.decontaminationNgram(s, d)),

    // Multi-suite decontamination: 3 disjoint eval carves screened in ONE
    // corpus pass — per-suite shared-gram columns off one tagged
    // broadcast gram set (K corpus scans collapse to 1).
    q("decontamination_multi", TextOps.decontaminationNgramMultiOracleSql())(
      (s, d) => TextOps.decontaminationNgramMulti(s, d)),

    // PII scrub audit: typed counts + redacted digest per document over a
    // deterministic planted-PII corpus (ordered RE2-safe replacements).
    q("pii_redact", PiiOps.OracleSql)(PiiOps.piiRedact),

    // k-anonymity release gate over the customer quasi-identifiers:
    // classes below each k threshold and the row ppm they hold.
    q("k_anonymity_audit", PiiOps.KAnonymityOracleSql)(
      PiiOps.kAnonymityAudit),

    // l-diversity ladder beside it: k bounds re-identification, l bounds
    // attribute disclosure (a 50-anonymous class still leaks if all 50
    // share one sensitive value).
    q("l_diversity_audit", PiiOps.LDiversityOracleSql)(
      PiiOps.lDiversityAudit),

    // ...and t-closeness, the triad's third rung: l bounds bare VARIETY,
    // t bounds distribution SHIFT (a 3-diverse class still leaks "these
    // people are overwhelmingly high-balance"). Ordered-attribute EMD
    // per class vs the global distribution, exact integers over the
    // common denominator, ppm ladder readout.
    q("t_closeness_audit", PiiOps.TClosenessOracleSql)(
      PiiOps.tClosenessAudit),

    // The privacy family's RELEASE rung: small-cell suppression + the
    // derandomized binomial mechanism (seeded PolyHash noise draw) over
    // the (type, day) cell grid. True counts are not emitted directly,
    // but the derandomized draw is publicly recomputable — this is a
    // deterministic DEMO of the release shape with zero DP guarantee.
    q("dp_release_counts", PiiOps.DpReleaseOracleSql)(
      (s, d) => PiiOps.dpReleaseCounts(s, d)),

    // C4-style normalized dedup: case/punct/whitespace-insensitive digest
    // groups — same shuffle contract as dedup_exact.
    q("dedup_normalized", TextOps.DedupNormalizedOracleSql)(TextOps.dedupNormalized),

    // Batch-vs-corpus incremental dedup: the ingest-time shape (anti-join
    // a new batch against the corpus's distinct-hash index; never re-pair
    // the corpus with itself).
    q("dedup_incremental", TextOps.DedupIncrementalOracleSql)(TextOps.dedupIncremental),

    // Near-dup twin of dedup_incremental: batch postings PROBE the capped
    // index (O(batch) candidates), full dedup_ngram exactness contract.
    q("dedup_incremental_neardup", MinHashOps.DedupIncrementalNearDupOracleSql)(
      MinHashOps.dedupIncrementalNearDup),

    // Integer-exact TF-IDF keyword extraction: vocabulary-sized df table
    // broadcast onto term rows, per-doc bounded ranking window.
    q("tfidf_top_terms", TfIdfOps.oracleSql())(
      (s, d) => TfIdfOps.tfidfTopTerms(s, d)),

    // Repetition/lexical-diversity signals: zero-shuffle sorted-array-run
    // formulation vs the oracle's relational explode+groupBy — a true
    // independent-algorithm cross-check.
    q("repetition_stats", TextOps.RepetitionOracleSql)(TextOps.repetitionStats),

    // Phrase-level repetition (Gopher dup-2/3-gram + top-2-gram share):
    // same zero-shuffle per-row shape, independent relational oracle.
    q("ngram_repetition", TextOps.NgramRepetitionOracleSql)(
      TextOps.ngramRepetition),

    // LM-flavored novelty proxy: per-doc mean bigram rarity vs the
    // corpus bigram table (boilerplate ~0, novel prose high).
    q("bigram_surprise", TextOps.BigramSurpriseOracleSql)(TextOps.bigramSurprise),

    // Boilerplate probe: corpus-wide top-20 bigram heavy hitters.
    q("top_bigrams", TextOps.topBigramsOracleSql())(
      (s, d) => TextOps.topBigrams(s, d)),

    // Vocabulary coverage: frequency-induced fixed-size vocab (bounded
    // top-K) broadcast against the token stream; per-lang OOV share.
    q("vocab_oov", TextOps.VocabOovOracleSql)(
      (s, d) => TextOps.vocabOovAudit(s, d)),

    // Per-source lexical richness: type-token ratio + hapax share —
    // the machine-generated/template-feed detector.
    q("vocab_by_source", TextOps.VocabBySourceOracleSql)(
      TextOps.vocabBySource),

    // Tokenizer fertility (BPE pieces per whitespace word) by declared
    // language — the compute-per-word correction a multilingual mixture
    // budget needs; exact integer sums per language.
    q("token_fertility", TextOps.TokenFertilityOracleSql)(
      TextOps.tokenFertility),

    // Per-source boilerplate-prefix detector: most common leading
    // 2-token prefix and its milli share of the source's docs
    // (deterministic tie-break; |sources| output rows).
    q("boilerplate_prefixes", TextOps.BoilerplatePrefixesOracleSql)(
      TextOps.boilerplatePrefixes),

    q("token_count_bpe",
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+')) AS BIGINT) AS n_bpe_pieces
        | FROM documents)
        |SELECT doc_id, n_ws_tokens, n_bpe_pieces,
        | (1000 * n_bpe_pieces) // greatest(n_ws_tokens, 1) AS pieces_per_token_milli
        |FROM t ORDER BY doc_id""".stripMargin)(TextOps.tokenCountBpe),

    // Rule-ablation matrix for the quality filter: per rule, flagged vs
    // SOLO-flagged docs/tokens — what dropping each rule would regain.
    q("quality_ablation", TextOps.QualityAblationOracleSql)(
      TextOps.qualityAblation),

    // Gopher-style quality filter: per-rule auditable flags + keep.
    q("quality_filter",
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars_nows,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '\b(the|and|is|of|to|in|it|a)\b')) AS BIGINT) AS n_stopwords
        | FROM documents),
        |r AS (
        | SELECT doc_id,
        |  CAST(n_tokens < 20 AS BIGINT) AS r_few_tokens,
        |  CAST((1000 * n_chars_nows) // greatest(n_tokens, 1) NOT BETWEEN 3000 AND 5000 AS BIGINT) AS r_token_len,
        |  CAST(n_stopwords = 0 AS BIGINT) AS r_no_stopwords,
        |  CAST((1000 * n_punct) // greatest(n_tokens, 1) > 200 AS BIGINT) AS r_punct_heavy
        | FROM t)
        |SELECT doc_id, r_few_tokens, r_token_len, r_no_stopwords, r_punct_heavy,
        | CAST(r_few_tokens + r_token_len + r_no_stopwords + r_punct_heavy = 0 AS BIGINT) AS keep
        |FROM r ORDER BY doc_id""".stripMargin)(TextOps.qualityFilter),

    // '(?s).' (dot-all): the Spark-side PolyHash hashes every code point
    // including newlines, so the oracle's per-character split must too —
    // a plain '.' skips \n and would silently diverge on any ingest path
    // whose texts contain embedded newlines.
    q("doc_fingerprint",
      """SELECT doc_id,
        | list_reduce(
        |  list_prepend(0::BIGINT,
        |   list_transform(regexp_extract_all(text, '(?s).'), c -> unicode(c)::BIGINT)),
        |  (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin)(TextOps.fingerprints),

    // Streaming tier INSIDE the driver gate: a real Structured Streaming
    // execution (file source -> stateful complete-mode agg -> memory
    // sink) drained synchronously; the monoid aggregates make the final
    // snapshot batch-equal, so plain SQL oracles the whole streaming
    // path. Every other streaming component is spec-pinned only.
    q("streaming_replay_hourly",
      graft.streaming.StreamingReplay.HourlyTypeCountsOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.hourlyTypeCounts(s, d)),

    // ...r16: two more streaming components graduate into the gate via
    // the same replay pattern. The manifest state is a per-shard monoid
    // (snapshot == the batch shard_manifest fold, same oracle); the
    // dedup gate drains the dropDuplicatesWithinWatermark state machine
    // and reads out the surviving digest SET (survivor doc choice is
    // arrival-order dependent, the set is not).
    q("streaming_manifest_replay", SampleOps.shardManifestOracleSql())(
      (s, d) => graft.streaming.StreamingReplay.manifestReplay(s, d)),
    q("streaming_dedup_replay",
      graft.streaming.StreamingReplay.DedupReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.dedupReplay(s, d)),

    // ...and two more: the windowed-HLL register state (max-monoid, the
    // Aggregator's finish is the batch SQL's exact integer estimator)
    // and the fixed-grid quantile sketch (count addition — the purest
    // monoid in the tier). Both complete-mode snapshots are batch-equal
    // by algebra, so plain SQL gates the streaming executions.
    q("streaming_hll_replay", HllOps.windowedOracleSql())(
      (s, d) => graft.streaming.StreamingReplay.hllReplay(s, d)),
    q("streaming_sketch_replay",
      graft.streaming.StreamingReplay.SketchReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.sketchReplay(s, d)),

    // ...and three more: the stateless RAG chunker (append-mode rows ==
    // the batch chunk frame), semantic decontamination at ingest (the
    // frozen eval cohort is a plan literal; the snapshot rollup is the
    // batch rollup verbatim), and live IVF index ingest (per-list
    // monoid manifests over frozen centroids). Each shares its batch
    // twin's oracle, closing the loop the r15 verdict asked to widen.
    q("streaming_chunks_replay", TextOps.chunkDocumentsOracleSql())(
      (s, d) => graft.streaming.StreamingReplay.chunksReplay(s, d)),
    q("streaming_semantic_decon_replay",
      AnnOps.decontaminationSemanticOracleSql())(
      (s, d) => graft.streaming.StreamingReplay.semanticDeconReplay(s, d)),
    q("streaming_ivf_ingest_replay", LloydOps.ivfIngestManifestOracleSql())(
      (s, d) => graft.streaming.StreamingReplay.ivfIngestReplay(s, d)),

    // ...and two more: the stream-static digest anti-join (stateless per
    // row, batch rollup shared with decontamination_stats) and the
    // flatMapGroupsWithState upsert store read out decomposition-proof
    // (per-key max over every emitted changelog row == the final state).
    q("streaming_decontaminate_replay", TextOps.decontaminationOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.decontaminateReplay(s, d)),
    q("streaming_upsert_replay",
      graft.streaming.StreamingReplay.UpsertReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.upsertReplay(s, d)),

    // ...and the stream-stream interval join: inner-join emission is
    // decomposition-proof (watermarks bound state, not output), gated
    // through a per-user pair-count + ts-mass rollup.
    q("streaming_join_replay",
      graft.streaming.StreamingReplay.JoinReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.joinReplay(s, d)),

    // ...and the FULL curation composition (quality filter -> PII scrub
    // -> watermark digest dedup) as one real streaming execution, with
    // planted PII so the scrub genuinely rewrites before digesting;
    // survivor-set readout (the dedupReplay shape).
    q("streaming_curation_replay",
      graft.streaming.StreamingReplay.CurationReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.curationReplay(s, d)),

    // ...and the continuous extract/load path: exactly-once partitioned
    // parquet FILE SINK drained AvailableNow, read back through
    // partition discovery, digested with the sink_roundtrip fidelity
    // rollup under the same format-independent oracle.
    q("streaming_ingest_replay", sinks.ParquetSink.roundtripOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.ingestReplay(s, d)),

    // ...r17: the remaining stateful tier graduates via the watermark
    // SENTINEL (a far-future one-row file staged after the events file:
    // the engine's no-data batch then finalizes append-mode session
    // windows and fires event-time timeouts — the finite-replay analogue
    // of a stream that keeps running). session_window emit-on-watermark,
    // the custom fMGWS sessionizer (its NoTimeout contract: each user's
    // final session stays open, the oracle excludes it), the buffered
    // funnel ladder, and the as-of probe matcher — each against an
    // independent lag/min-ladder/carry-forward SQL formulation.
    q("streaming_sessionize_replay",
      graft.streaming.StreamingReplay.SessionizeReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.sessionizeReplay(s, d)),
    q("streaming_sessions_state_replay",
      graft.streaming.StreamingReplay.StatefulSessionsReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.statefulSessionsReplay(s, d)),
    q("streaming_funnel_replay",
      graft.streaming.StreamingReplay.FunnelReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.funnelReplay(s, d)),
    q("streaming_asof_replay",
      graft.streaming.StreamingReplay.AsofReplayOracleSql)(
      (s, d) => graft.streaming.StreamingReplay.asofReplay(s, d)),

    // ---- LLM-pipeline: multimodal payload plumbing (SQL-checkable slice) ----
    q("multimodal_meta",
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | n_chars % 640 + 16 AS width,
        | n_chars % 480 + 16 AS height,
        | octet_length(encode(text)) // 64 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)(MultimodalOps.multimodalMeta),

    // Frame-sample digests through the real binary path (blob substr +
    // md5); the oracle re-derives them from the ASCII text column.
    q("multimodal_frames", MultimodalOps.MultimodalFramesOracleSql)(
      MultimodalOps.multimodalFrames),

    // Frame-level exact dedup: digest-grouped duplication mass over the
    // sampled frames — the media twin of text dedup_stats.
    q("frame_dedup", MultimodalOps.FrameDedupOracleSql)(
      MultimodalOps.frameDedup),

    // Content-defined chunking (FastCDC-style pure content predicate):
    // rolling-window polynomial boundaries over the payload + chunk-
    // digest dedup — catches the shifted/re-encoded duplication the
    // fixed frame grid above structurally misses. Boundaries replay
    // bit-exactly in the oracle (integer window hash).
    q("media_cdc_dedup", MultimodalOps.MediaCdcDedupOracleSql)(
      (s, d) => MultimodalOps.mediaCdcDedup(s, d)),

    // Perceptual (average-hash) near-dup over the frame grid — the
    // NEAR-dup companion of frame_dedup's exact digests (re-encoded
    // media never digest-matches but stays perceptually adjacent):
    // 64-bit aHash per distinct frame, 16-bit band buckets with the
    // df-cap precedent (dropped mass gated as the hamming=-1 row),
    // exact Hamming verify, pair-mass histogram.
    q("media_phash_dedup", MultimodalOps.MediaPhashOracleSql)(
      (s, d) => MultimodalOps.mediaPhashDedup(s, d)),

    // The mapPartitions decode-stub path, oracle-gated end to end.
    q("multimodal_features", MultimodalOps.MultimodalFeaturesOracleSql)(
      MultimodalOps.multimodalFeatures),

    // Salted two-phase aggregation: the oracle is the PLAIN aggregate —
    // the salt must be semantically invisible.
    q("salted_user_stats",
      """SELECT user_id, count(*) AS events,
        | round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 4) AS value_sum
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)(
      (s, d) => SkewOps.saltedUserStats(s, d)),

    // Typed Aggregator top-k (bounded buffers + partial agg) vs the
    // window-function formulation as oracle — same rows either way.
    q("topk_events_per_type",
      """WITH r AS (
        | SELECT event_type, value, event_id,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
        | FROM events WHERE value IS NOT NULL)
        |SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id, value
        |FROM r WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin)(
      (s, d) => TopKOps.topEventsPerType(s, d)),

    // Log-compaction: latest record per key as a partial-aggregable
    // struct-max (shuffle carries one candidate per task×key); oracle is
    // the independent row_number window formulation.
    q("latest_event_per_user", TopKOps.LatestOracleSql)(TopKOps.latestEventPerUser),

    // CDC upsert: fold an update batch into a keyed snapshot, latest-wins
    // with out-of-order updates classified (insert/update/stale/carry) —
    // both sides reduced to one row per key before the single outer join.
    q("cdc_merge", TopKOps.CdcMergeOracleSql)(TopKOps.cdcMerge),

    // Key-skew profile: the pre-flight diagnostic for choosing a skew
    // mitigation (top-k heaviest keys, share, ratio to mean).
    q("skew_profile", SkewOps.skewProfileOracleSql())(
      (s, d) => SkewOps.skewProfile(s, d)),

    // Salted shuffle JOIN (hot-probe-key spread; dim replicated salts×);
    // oracle is the plain join+agg — the salt is semantically invisible.
    q("salted_join_segments", SkewOps.SaltedJoinOracleSql)(
      (s, d) => SkewOps.saltedJoinSegments(s, d)),

    // Z-order layout plan: per-z-range file stats proving every dimension
    // prunes (narrow min/max on BOTH columns per file).
    q("zorder_plan", LayoutOps.oracleSql())((s, d) => LayoutOps.zorderPlan(s, d)),

    // Small-files compaction plan (lakehouse OPTIMIZE planning): files
    // packed in id order into merge groups by start-offset binning over
    // a per-source cumsum of the (small) file manifest.
    q("compaction_plan", LayoutOps.compactionPlanOracleSql())(
      (s, d) => LayoutOps.compactionPlan(s, d)),

    // LLM-pretraining sequence packing: hierarchical token prefix sum
    // cuts the concatenated doc stream into fixed-length sequences; the
    // oracle is the flat serial window (independent algorithm).
    q("pack_sequences", LayoutOps.packSequencesOracleSql())(
      (s, d) => LayoutOps.packSequences(s, d)),

    // RAG document chunking: fixed 64-token windows, 16-token overlap,
    // per-chunk offsets + a PolyHash digest of the actual chunk text —
    // the retrieval-ingest op downstream embedders/dedup key on.
    q("chunk_documents", TextOps.chunkDocumentsOracleSql())(
      (s, d) => TextOps.chunkDocuments(s, d)),

    // Bloom pre-filter decontamination audit: broadcast bit-set probe,
    // exact verify only on bloom-positives; demo-small m so the
    // false-positive column is non-trivially exercised.
    q("bloom_decontamination", SketchOps.bloomOracleSql())(
      SketchOps.bloomDecontaminationStats),

    // KMV set algebra: audience overlap (union/intersection estimates
    // from two bounded sketches) with exact truth columns.
    q("kmv_overlap", SketchOps.kmvOverlapOracleSql())(
      (s, d) => SketchOps.kmvOverlap(s, d)),

    // Grouped KMV: one bounded distinct-count sketch per event type via
    // the partial-aggregated MinK aggregator (oracle = rank window).
    q("kmv_distinct_by_type", SketchOps.kmvByTypeOracleSql())(
      (s, d) => SketchOps.kmvDistinctByType(s, d)),

    // Count-min sketch frequency estimation vs truth (overcount-only
    // error, integer-exact; fixed-size counter table broadcast back).
    q("cms_user_counts", SketchOps.cmsOracleSql())(
      (s, d) => SketchOps.cmsUserCounts(s, d)),

    // Deterministic KMV distinct sketch — unlike HLL/approx_count_distinct
    // the whole sketch is integer-exact, so the oracle checks the sketch
    // itself, not just its error bound.
    q("kmv_distinct_users", SketchOps.oracleSql())(SketchOps.kmvDistinctUsers),

    // Fixed-point HyperLogLog with register-merge proof: the single-pass
    // and per-shard-merged estimates must agree exactly (max-merge
    // associativity — the property federated counting relies on), and
    // every step is integer arithmetic so the sketch itself hash-matches.
    q("hll_distinct_users", HllOps.oracleSql())(HllOps.hllDistinctUsers),

    // Zero-filled (day × event_type) time-series spine — gap days emit
    // explicit 0 rows; the spine generates from two scalar aggregates,
    // never a corpus-sized shuffle.
    q("gapfill_daily", WindowOps.gapfillDailyOracleSql)(
      (s, d) => WindowOps.gapfillDaily(s, d)),

    // LOCF imputation over the same spine: gap days carry the last
    // observed day's average forward (one ignoreNulls window pass over
    // the metadata-sized grid, no self-join chain).
    q("gapfill_ffill", WindowOps.gapfillForwardFillOracleSql)(
      (s, d) => WindowOps.gapfillForwardFill(s, d)),

    // Per-group HLL: one bounded 64-register sketch per event type (the
    // per-tenant / per-source counting shape); shuffle carries at most
    // groups x 64 register rows.
    q("hll_distinct_by_type", HllOps.byTypeOracleSql())(
      (s, d) => HllOps.hllDistinctByType(s, d)),

    // Rolling 7-day distinct users — HLL register mergeability made
    // load-bearing: per-day sketches collapse the corpus once, the
    // trailing-window merge runs over the days x 64 register grid only.
    // The oracle re-derives the merge by a range join (independent
    // formulation); exact rolling distinct rides along for error context.
    q("rolling_week_uniques", TemporalOps.rollingWeekOracleSql())(
      (s, d) => TemporalOps.rollingWeekUniques(s, d)),

    // SCD2-style state intervals: each event opens [ts, next ts) for its
    // user; dwell time rolls up per state. One user-keyed exchange + lead.
    q("time_in_state", TemporalOps.timeInStateOracleSql())(
      (s, d) => TemporalOps.timeInState(s, d)),

    // Sequence mining: most frequent 3-step event-type journeys (double
    // lead per user, |types|^3-bounded count space, TakeOrdered top-k).
    q("path_trigrams", TemporalOps.pathTrigramsOracleSql())(
      (s, d) => TemporalOps.pathTrigrams(s, d)),

    // Inter-arrival latency per event class (gap to the user's previous
    // event, attributed to the later event's type; integer-div mean).
    q("interarrival_stats", TemporalOps.interarrivalOracleSql())(
      (s, d) => TemporalOps.interarrivalStats(s, d)),

    // Two-sided CUSUM drift audit over the zero-filled daily spine —
    // milli fixed-point deviations; the serial running sum walks the
    // metadata-sized day grid, never event rows.
    q("drift_cusum", TemporalOps.driftCusumOracleSql())(
      (s, d) => TemporalOps.driftCusum(s, d)),

    // Last-touch attribution via the generic as-of composition (one key
    // exchange, running-frame carry); oracle states the semantics as a
    // correlated latest-touch subquery.
    q("attribution_last_touch", TemporalOps.attributionOracleSql())(
      (s, d) => TemporalOps.attributionLastTouch(s, d)),

    // Hour-of-day x day-of-week seasonal activity heat map in ppm;
    // corpus collapses to the 168-cell grid map-side.
    q("seasonal_profile", TemporalOps.seasonalProfileOracleSql())(
      (s, d) => TemporalOps.seasonalProfile(s, d)),

    // Degree assortativity (hub-hub mixing) of the co-purchase graph:
    // exact DECIMAL(38,0) normal-equation sums, floor-quantized ratio.
    q("graph_assortativity", GraphOps.AssortativityOracleSql)(
      (s, d) => GraphOps.assortativity(s, d)),

    // Leakage-safe train/val/test assignment: splits hash the NEAR-DUP
    // CLUSTER representative, so no near-dup pair straddles a boundary;
    // the oracle recomputes clusters via the independent recursive
    // fixpoint, so an under-merged cluster fails here too.
    q("split_cluster_aware", SplitOps.oracleSql())(
      (s, d) => SplitOps.splitStats(s, d)),

    // Temporal split with a purge/embargo band: train ends strictly
    // before test starts, the gap absorbs trailing-window features, and
    // per-split user carryover is reported for population-shift evals.
    q("split_temporal_embargo", SplitOps.TemporalEmbargoOracleSql)(
      (s, d) => SplitOps.splitTemporalEmbargo(s, d)),

    // Naive vs cluster-aware split leakage, side by side: crossing
    // near-dup pairs + contaminated eval docs (cluster row must be 0).
    q("split_leakage_audit", SplitOps.leakageOracleSql())(
      SplitOps.splitLeakageAudit),

    // Token-budget epoch schedule: tempered token shares -> whole epochs
    // + remainder sampling rate per source, the loader-executable table.
    q("epoch_schedule", SampleOps.EpochScheduleOracleSql)(
      SampleOps.epochSchedule),

    // ---- ML: KMeans (reference: analysis/kmeans_spark.py:104-162) ----
    // Iterative MLlib fit is not oracle-SQL-expressible; the driver records
    // a rows-only check and the scalatest suite pins determinism at sf0.001.
    rowsOnly("kmeans_sizes")(KMeansOps.kmeansSizes),

    // Centroid display artifact (kmeans_spark.py:158-159); cluster-label-
    // permutation-stable keying, rows-only checked like kmeans_sizes.
    rowsOnly("kmeans_centroids")(KMeansOps.kmeansCentroids),

    // Row-level assignment sample (kmeans_spark.py:25-33 prints
    // `features -> cluster` rows); size-rank keying keeps it stable
    // across label permutations, rows-only like the other kmeans
    // artifacts (MLlib fit not oracle-SQL-expressible).
    rowsOnly("kmeans_assign")((s, d) => KMeansOps.kmeansAssign(s, d)),

    // Fixed-point Lloyd's twin — the oracle-CLOSED member of the KMeans
    // family: deterministic lowest-id init, 4 fixed rounds, every step
    // in e6 integers, so the DuckDB oracle replays the identical
    // algorithm round for round (the `pagerank`-style unrolled chain).
    // The MLlib entries above stay rows-only beside it by contract.
    q("kmeans_lloyd", LloydOps.oracleSql())(LloydOps.kmeansLloyd),

    // Simplified (centroid-based) silhouette over the Lloyd twin's final
    // centroids — per-cluster separation/compactness, fully replayed.
    q("kmeans_silhouette", LloydOps.silhouetteOracleSql())(
      LloydOps.kmeansSilhouette),

    // Cluster purity vs ground-truth labels (external validation next
    // to the silhouette's internal one), same replayed Lloyd chain.
    q("kmeans_purity", LloydOps.purityOracleSql())(
      LloydOps.kmeansPurity),

    // Cluster-balanced sampling (the D4/SemDeDup-family diversity step):
    // cap each SEMANTIC cluster's contribution at an equal share of the
    // corpus in deterministic hash-random order — balances LEARNED
    // structure where sample_stratified balances metadata strata; the
    // purity/silhouette audits above are this knob's go/no-go.
    q("sample_cluster_balanced", LloydOps.sampleClusterBalancedOracleSql())(
      (s, d) => LloydOps.sampleClusterBalanced(s, d)),

    // SemDedup-style semantic prune: Lloyd clusters -> within-cluster
    // sorted-neighborhood (distance-shell bands) -> exact-cosine
    // verdicts. Full per-vector decision list, fully replayed.
    q("semdedup_prune", LloydOps.semdedupOracleSql())(
      LloydOps.semdedupPrune),

    // Oracle-gated IVF twin of ann_ivf_topk: the Lloyd chain IS the
    // coarse quantizer, so index build + probe + rank all replay.
    q("ann_ivf_lloyd_topk", LloydOps.ivfLloydOracleSql())(
      (s, d) => LloydOps.ivfLloydTopK(s, d)),

    // ...and its recall@k against the exact baseline — both sides of
    // the comparison hash-verified (the MLlib IVF audit is rows-only).
    q("ann_recall_ivf_lloyd", LloydOps.annRecallIvfLloydOracleSql())(
      LloydOps.annRecallIvfLloyd),

    // IVF-bucketed knn graph: the bounded-candidate alternative the
    // SimHash occupancy audit motivates — per-vector work is capped by
    // nprobe x list size (~ sqrt(N) lists), so clustered corpora can't
    // concentrate candidate mass the way SimHash codes do. Index build,
    // probing, and ranking all replay in the adaptive-k oracle chain.
    q("knn_graph_ivf", LloydOps.knnGraphIvfOracleSql())(
      (s, d) => LloydOps.knnGraphIvf(s, d)),

    // ...and its recall@k against the exact neighbors of the
    // deterministic probe cohort (whole-graph exact is O(n^2); the
    // cohort keeps the audit linear while hashing full readouts).
    q("ann_recall_knn_ivf", LloydOps.knnRecallIvfOracleSql())(
      (s, d) => LloydOps.knnRecallIvf(s, d)),

    // One NN-descent round over the IVF graph (direct + reverse + 2-hop
    // candidates, exact re-score): k+k+k^2 bounded candidates per
    // vector, buys back recall the IVF list boundary loses.
    q("knn_graph_refined", LloydOps.knnGraphRefinedOracleSql())(
      (s, d) => LloydOps.knnGraphRefined(s, d)),

    // ...and the refined graph's recall over the same fixed cohort —
    // read beside ann_recall_knn_ivf to price the refinement round.
    q("ann_recall_knn_refined", LloydOps.knnRecallRefinedOracleSql())(
      (s, d) => LloydOps.knnRecallRefined(s, d)),

    // The capacity meter for the IVF path, symmetric with
    // ann_bucket_occupancy's SimHash readout: list-size histogram +
    // exact own-list candidate work at the sqrt(n) operating point.
    q("ivf_list_occupancy", LloydOps.ivfListOccupancyOracleSql())(
      LloydOps.ivfListOccupancy),

    // The sqrt(n)-list centroid build itself, priced honestly (direct
    // run, bypassing the frozen-centroid store the consumers ride) —
    // emits the full index artifact; the IVF analogue of kmeans_lloyd.
    q("ivf_build_centroids", LloydOps.ivfBuildCentroidsOracleSql())(
      (s, d) => LloydOps.ivfBuildCentroids(s, d)),

    // IVF ingest manifests: frozen-centroid list assignment + per-list
    // monoid manifests (count, id range, content digest) — the batch
    // replay of streaming index maintenance; the streaming twin shares
    // the identical expressions (StreamingIvfIngest, differential-spec'd).
    q("ivf_ingest_manifest", LloydOps.ivfIngestManifestOracleSql())(
      (s, d) => LloydOps.ivfIngestManifest(s, d)),

    // Mislabel audit over the bounded IVF graph — same rollup contract
    // as knn_label_agreement, for the clustered corpora where the
    // SimHash graph's candidates go superlinear.
    q("knn_label_agreement_ivf", LloydOps.knnLabelAgreementIvfOracleSql())(
      (s, d) => LloydOps.knnLabelAgreementIvf(s, d)),

    // The MLlib-backed IVF pair (AnnOps.annIvfTopK / annRecallIvf) is
    // deliberately NOT registered: an MLlib fit is not SQL-expressible,
    // and the oracle-closed Lloyd twins above (ann_ivf_lloyd_topk /
    // ann_recall_ivf_lloyd) hash-gate the identical IVF semantics end to
    // end. The MLlib path stays in the library as the prod-model-reuse
    // API; AnnSpec cross-checks its scores and pins its recall floor.

    // ---- Converged iterative modes (the documented 100×-scale paths) ----
    // r11: all four graduated from rows-only to full oracles. PageRank's
    // oracle replays the stopping decision itself (per-iteration exact
    // squared deltas over an unrolled chain, first-converged frame
    // selected). Components/kcore/clusters converge to STABLE fixpoints,
    // so an unrolled oracle with generous headroom (20 rounds vs the
    // measured ≤6) lands on the identical frame — and the clustering
    // oracle is an INDEPENDENT recursive-reachability fixpoint, so an
    // under-merge fails the gate rather than being mirrored.
    q("pagerank_conv", GraphOps.pagerankConvergedOracleSql())(
      (s, d) => GraphOps.pagerankConverged(s, d)._2),
    q("components_conv", GraphOps.connectedComponentsOracleSql(20))(
      (s, d) => GraphOps.connectedComponentsConverged(s, d)._2),

    // Strongly connected components (FW-BW-trim, Fleischer et al.) over
    // the DIRECTED add-to-cart sequence graph (earlier line position →
    // later, high-quantity lines — the thinning that yields the
    // web-graph one-giant-SCC-plus-periphery shape). Spark converges
    // each phase; the oracle unrolls 2 outer × (16 trim + 32 fwd +
    // 32 bwd) rounds, all no-op headroom past the measured fixpoints.
    q("scc_components", GraphOps.sccOracleSql())(
      (s, d) => GraphOps.sccComponents(s, d)),
    q("kcore_conv", GraphOps.kcoreOracleSql(60, 20))(
      (s, d) => GraphOps.kcoreConverged(s, d)._2),
    q("clusters_conv", DedupClusterOps.convergedOracleSql())(
      (s, d) => DedupClusterOps.clustersConverged(s, Tables.documents(s, d))._2),

    // Borůvka minimum spanning forest summary (unique forest by the
    // composite edge order; GraphSpec replays serial Kruskal). The
    // oracle unrolls the same rounds — pick/contract/relabel with fixed
    // pointer squarings — and reads the data-dependent round count off
    // the materialized per-round edge counts.
    q("mst_forest", GraphOps.boruvkaMsfOracleSql())(
      (s, d) => GraphOps.boruvkaMsf(s, d)),

    // Top-2 embedding principal components: exact integer moment sums
    // (one corpus pass, typed Aggregator), driver-sized 64×64 power
    // iteration — the double eigensolve is not SQL-expressible,
    // rows-only; AnnSpec pins the eigen identities and the fixed-point
    // twin below hash-gates the family.
    rowsOnly("embedding_pca")(PcaOps.embeddingPca),

    // ...and its ORACLE-GATED fixed-point twin (the kmeans_lloyd recipe
    // applied to the eigensolve): identical moment pass, then a
    // 40-round all-integer power iteration (truncated covariance,
    // e6-grid iterates, integer-sqrt normalization, sign-invariant
    // deflation) the DuckDB chain replays bit-identically.
    q("embedding_pca_fp", PcaOps.pcaFpOracleSql())(
      (s, d) => PcaOps.embeddingPcaFp(s, d)),

    // Whitening / axis-alignment audit: exact fp2 covariance summary
    // (trace, off-diagonal mass + ppm share, worst cell, diag extremes)
    // from the same one-pass moment buffer - all integers, so the
    // covariance STRUCTURE hash-gates directly.
    q("embedding_whitening_audit", PcaOps.whiteningOracleSql())(
      (s, d) => PcaOps.embeddingWhiteningAudit(s, d)),

    // ---- Catalog profiling + cohort survival (ProfileOps) ----
    // Per-column stats row via ONE scan (Expand'd exact distincts +
    // stack fan-out) vs per-column UNION ALL scans in the oracle.
    q("profile_columns", operators.ProfileOps.ProfileColumnsOracleSql)(
      operators.ProfileOps.profileColumns),

    // User-lifetime survival curve over the dense day-offset spine;
    // descending running sum runs over metadata (calendar days) only.
    q("survival_curve", operators.ProfileOps.SurvivalCurveOracleSql)(
      operators.ProfileOps.survivalCurve),

    // ---- Node-local graph features (LinkOps) ----
    // Local clustering coefficient via degree-oriented triangle corner
    // counts; oracle re-enumerates triangles in ID orientation.
    q("clustering_coeff", operators.LinkOps.clusteringCoeffOracleSql())(
      (s, d) => operators.LinkOps.clusteringCoeff(s, d)),

    // Resource-allocation link prediction with an oracle-mirrored hub
    // cap bounding wedge fan-out (RA's 1/deg weight makes capped hubs
    // negligible by construction).
    q("link_prediction", operators.LinkOps.linkPredictionOracleSql())(
      (s, d) => operators.LinkOps.linkPrediction(s, d)),

    // Pairwise Pearson correlation matrix in one exact-moment scan;
    // only the final ratio is floating, floor-quantized to e6.
    q("corr_matrix", operators.StatsOps.CorrMatrixOracleSql)(
      operators.StatsOps.corrMatrix),

    // Unigram LM surprise (CCNet-style quality signal) in exact integer
    // bits — bitlen instead of engine-variant floating logs.
    q("lm_surprise", operators.TextOps.LmSurpriseOracleSql)(
      (s, d) => operators.TextOps.lmSurprise(s, d)),

    // CCNet-style perplexity terciles: per-language head/middle/tail cut
    // over the lm_surprise score with doc/token mass and score ranges —
    // the train/sample/drop planning table (Wenzek et al. 2020).
    q("ccnet_buckets", operators.TextOps.CcnetBucketsOracleSql)(
      operators.TextOps.ccnetBuckets),

    // DSIR-style importance weights (target-domain vs corpus unigram LM,
    // exact integer bits) — the data-selection score, per document.
    q("dsir_weights", operators.TextOps.dsirWeightsOracleSql())(
      (s, d) => operators.TextOps.dsirWeights(s, d)),

    // Context-window truncation-loss curve: tokens lost / docs truncated
    // / padding headroom at each candidate max-seq-len. Zero shuffles.
    q("truncation_loss", operators.TextOps.TruncationLossOracleSql)(
      operators.TextOps.truncationLoss),

    // Vocabulary-growth (Heaps'-law) curve by ingest batch: first-seen
    // attribution via one min(batch) aggregate; cumulative vocab walks
    // the metadata-sized batch spine.
    q("vocab_growth", operators.TextOps.vocabGrowthOracleSql())(
      (s, d) => operators.TextOps.vocabGrowth(s, d)),

    // Behavioral audience-overlap matrix: distinct (user,type) collapse
    // first, user-keyed self-join with ≤|types|² per-user fan-out.
    q("audience_overlap", operators.AudienceOps.AudienceOverlapOracleSql)(
      operators.AudienceOps.audienceOverlap),

    // Exponential-decay recency scores via integer power-of-two shifts
    // (no engine-variant floating exp); bounded top-k.
    q("recency_scores", operators.AudienceOps.recencyScoresOracleSql())(
      (s, d) => operators.AudienceOps.recencyScores(s, d)),

    // Personalized PageRank from a deterministic seed cohort: teleport
    // mass returns only to seeds; same exchange-free loop as pagerank.
    q("ppr_seeded", GraphOps.pprSeededOracleSql())(
      (s, d) => GraphOps.pprSeeded(s, d)),

    // Markov stationary distribution of the event-type chain: corpus
    // collapses once to the ppm transition matrix; the power iteration
    // runs over metadata-sized frames only.
    q("markov_stationary", FunnelOps.markovStationaryOracleSql())(
      (s, d) => FunnelOps.markovStationary(s, d)),

    // Optimizer-style join-cardinality estimation audit: independence
    // estimate vs the TRUE size computed from per-key count frames —
    // the join itself is never materialized.
    q("join_cardinality_audit", JoinOps.JoinCardinalityOracleSql)(
      JoinOps.joinCardinalityAudit),

    // BFS hop distance and weighted Bellman-Ford SSSP from the seed
    // cohort — per-round relaxation through the cached edge list.
    q("bfs_hops", GraphOps.bfsHopsOracleSql())(
      (s, d) => GraphOps.bfsHops(s, d)),
    q("sssp_weighted", GraphOps.ssspWeightedOracleSql())(
      (s, d) => GraphOps.ssspWeighted(s, d)),

    // Seeded harmonic centrality (fixed landmark cohort, Eppstein-Wang
    // style): per node Σ 1/d(seed, node) in exact micro fixed-point —
    // the bfs_hops relaxation with seed as an extra state key.
    q("harmonic_centrality", GraphOps.harmonicCentralityOracleSql())(
      (s, d) => GraphOps.harmonicCentrality(s, d)),

    // Landmark distance histogram: the neighborhood-function /
    // effective-diameter readout, exact on the fixed cohort — pooled
    // per-hop pair counts with cumulative ppm shares.
    q("graph_distance_histogram", GraphOps.graphDistanceHistogramOracleSql())(
      (s, d) => GraphOps.graphDistanceHistogram(s, d)),

    // Hub-percolation robustness: CC before/after removing the top-32
    // degree hubs — the targeted-attack fragility readout; two
    // exchange-free CC loops, hub set a 32-row broadcast frame.
    q("percolation_audit", GraphOps.percolationOracleSql())(
      (s, d) => GraphOps.percolationAudit(s, d)),

    // Approximate betweenness from the same landmark cohort (Brandes &
    // Pich style): per seed, level-synchronous path counts over the
    // truncated BFS, then descending-level dependency accumulation in
    // exact integer micro terms — prices the centrality family beyond
    // closeness.
    q("betweenness_landmark", GraphOps.betweennessOracleSql())(
      (s, d) => GraphOps.betweennessLandmark(s, d)),

    // A/B arm readout per event type: (type, arm) aggregate + pivot;
    // epu in milli, B-vs-A lift in ppm.
    q("ab_metrics", operators.AudienceOps.AbMetricsOracleSql)(
      operators.AudienceOps.abMetrics),

    // Per-source language Gini impurity (pure-ratio diversity, no logs).
    q("gini_diversity", operators.SampleOps.GiniDiversityOracleSql)(
      operators.SampleOps.giniDiversity),

    // Gini coefficient of the key distribution (exact rank formula over
    // the hierarchical rank; DECIMAL-exact, ppm output).
    q("key_gini", SkewOps.KeyGiniOracleSql)(SkewOps.keyGini),

    // Total-variation drift of the value distribution between the two
    // halves of the observation window (log-free PSI sibling).
    q("drift_tv", StatsOps.DriftTvOracleSql)((s, d) => StatsOps.driftTv(s, d)),

    // Zipf-slope audit: integer bitlen-vs-bitlen OLS over the exact
    // descending frequency rank.
    q("zipf_audit", operators.TextOps.ZipfAuditOracleSql)(
      (s, d) => operators.TextOps.zipfAudit(s, d)),

    // Pairwise cosine similarity of source token distributions (token-
    // keyed self-join, |sources|^2-bounded fan-out, DECIMAL dot products).
    q("source_similarity", operators.TextOps.SourceSimilarityOracleSql)(
      (s, d) => operators.TextOps.sourceSimilarity(s, d)),

    // Financial reconciliation: order header totals vs line sums in
    // exact integer cents; 3-row status rollup with discrepancies.
    q("reconciliation_audit", operators.ReconOps.ReconciliationOracleSql)(
      operators.ReconOps.reconciliationAudit),

    // Dwell-weighted average value per type (TWAP) over SCD2 intervals;
    // DECIMAL-exact value x dwell products.
    q("twap_by_type", operators.ReconOps.TwapOracleSql)(
      operators.ReconOps.twapByType),

    // Session bounce rate by entry event type (30-minute gap rule).
    q("bounce_rate", operators.ReconOps.bounceRateOracleSql())(
      (s, d) => operators.ReconOps.bounceRate(s, d)),

    // KS distance of each source's length distribution from the corpus
    // (exact integer CDFs over the value-domain grid).
    q("ks_source_drift", StatsOps.KsSourceDriftOracleSql)(
      StatsOps.ksSourceDrift),

    // Sequence-integrity audit: missing event_ids + widest gaps, via
    // per-bucket arithmetic and a metadata-sized boundary stitch.
    q("id_gap_audit", StatsOps.idGapAuditOracleSql())(
      (s, d) => StatsOps.idGapAudit(s, d)),

    // Percent-of-parent hierarchical revenue report (nation within
    // region, region within total, exact cents → ppm shares).
    q("share_of_parent", JoinOps.ShareOfParentOracleSql)(
      JoinOps.shareOfParent),

    // Daily-series autocorrelation at lags 1..7 (weekly-seasonality
    // detector; exact integer num/den cleared of the rational mean).
    q("acf_daily", TemporalOps.acfDailyOracleSql())(
      (s, d) => TemporalOps.acfDaily(s, d)),

    // Benford first-digit conformance of lineitem prices (log-free
    // integer digit extraction, literal expected shares).
    q("benford_audit", StatsOps.benfordOracleSql())(
      StatsOps.benfordAudit),

    // Per-source character-class composition (letters/digits/space/other
    // per-mille) — the tokenizer-planning charset profile.
    q("charset_profile", TextOps.charsetProfileOracleSql())(
      TextOps.charsetProfile),

    // Decile lift table: exact NTILE(10) user-value deciles × purchase
    // conversion, lift vs base rate in milli.
    q("decile_lift", RfmOps.DecileLiftOracleSql)(
      RfmOps.decileLift),

    // Sorted-neighborhood blocking dedup (window-bounded candidate
    // volume; per-lang hierarchical rank, banded neighborhood join,
    // exact-Jaccard verify).
    q("dedup_sorted_neighborhood", MinHashOps.SortedNeighborhoodOracleSql)(
      (s, d) => MinHashOps.dedupSortedNeighborhood(s, d)),

    // Asymmetric containment dedup (short-doc-in-long-doc detection the
    // symmetric Jaccard threshold misses).
    q("dedup_containment", MinHashOps.ContainmentOracleSql)(
      (s, d) => MinHashOps.dedupContainment(s, d)),

    // P50/P90/P99 same-type inter-arrival gaps per event type via the
    // histogram rank-select grid (no per-group sort).
    q("gap_quantiles", TemporalOps.gapQuantilesOracleSql())(
      TemporalOps.gapQuantiles),

    // Per-label embedding L2-norm audit (codegen self-dot, e6 fixed-point
    // before any cross-row aggregation).
    q("embedding_norms", StatsOps.EmbeddingNormsOracleSql)(
      StatsOps.embeddingNorms),

    // Symmetric int8 quantization-error audit: per-label worst/average
    // reconstruction error (e9 fixed point via order-independent
    // array_max) and saturated-dimension counts.
    q("embedding_int8_audit", StatsOps.EmbeddingInt8AuditOracleSql)(
      StatsOps.embeddingInt8Audit),

    // Per-dimension mean/variance of the embedding space (collapsed-dim
    // detector; exact integer variance identity in DECIMAL).
    q("embedding_dim_stats", StatsOps.embeddingDimStatsOracleSql())(
      StatsOps.embeddingDimStats),

    // Fulfillment-latency SLA per order priority (whole-day ship lag,
    // avg + P50/P90/P99 via the histogram rank-select grid).
    q("ship_latency_quantiles", ReconOps.shipLatencyOracleSql())(
      (s, d) => ReconOps.shipLatencyQuantiles(s, d)),

    // Winsorized per-type value means (exact per-type [P5,P95] clip
    // bounds, integer cents; robust-metrics companion to the raw mean).
    q("winsorized_value_stats", StatsOps.winsorizedOracleSql())(
      (s, d) => StatsOps.winsorizedValueStats(s, d)),

    // Trailing 7-day rolling median of daily volume (spike-resistant
    // trend over the metadata day spine, bounded sorted-list median).
    q("rolling_median_7d", TemporalOps.rollingMedian7dOracleSql())(
      TemporalOps.rollingMedian7d),

    // Duplicate-event audit: same user/type/value within 1s (null-safe)
    // — the at-least-once-delivery smell test.
    q("event_dupes", TemporalOps.duplicateEventOracleSql())(
      TemporalOps.duplicateEventAudit),

    // Session-length distribution under the 30-min-gap rule (duration
    // and events-per-session P50/P90/P99 off collapsed value grids).
    q("session_length_quantiles", ReconOps.sessionLengthOracleSql())(
      (s, d) => ReconOps.sessionLengthQuantiles(s, d)),

    // Heavy-user concentration: exact top-1% membership by rank, share
    // of total events in ppm.
    q("heavy_user_share", StatsOps.HeavyUserShareOracleSql)(
      StatsOps.heavyUserShare),

    // Cross-source near-duplication matrix (exact Jaccard pairs rolled
    // to source×source cells — mixture-level contamination readout).
    q("dedup_source_matrix", MinHashOps.DedupSourceMatrixOracleSql)(
      (s, d) => MinHashOps.dedupSourceMatrix(s, d)),

    // Batch twin of the streaming anomaly detector: per-day integer
    // z-verdicts against strictly-prior history (spec pins batch ==
    // streaming algebra).
    q("anomaly_days", TemporalOps.anomalyDaysOracleSql())(
      TemporalOps.anomalyDays),

    // Ranked conjunctive keyword retrieval over the tf·idf index
    // (AND semantics, summed exact-integer scores, hierarchical-rank
    // top-10 per query).
    q("keyword_search", TfIdfOps.keywordSearchOracleSql())(
      (s, d) => TfIdfOps.keywordSearch(s, d)),

    // Exact phrase search via a positional inverted index (adjacency
    // semantics keyword_search can't express; list-comprehension oracle).
    q("phrase_search", TfIdfOps.phraseSearchOracleSql())(
      (s, d) => TfIdfOps.phraseSearch(s, d)),

    // BM25-ranked disjunctive retrieval: tf saturation + length
    // normalization in milli fixed-point, odds-ratio integer idf — the
    // standard lexical ranker beside the conjunctive tf-idf path.
    // Retrieval-quality eval: nDCG@10 of the BM25 ranking against the
    // deterministic term-coverage relevance grade; discounts are integer
    // literals so no transcendental log crosses the oracle boundary, and
    // IDCG comes from the grade histogram, never a corpus sort.
    q("ndcg_bm25_audit", TfIdfOps.ndcgOracleSql())(
      (s, d) => TfIdfOps.ndcgAudit(s, d)),

    // RAKE keyphrases: multi-word keyword extraction from stopword-free
    // token runs, deg/freq word scores in milli, corpus top-20 via
    // TakeOrderedAndProject (never a global phrase sort).
    q("rake_keyphrases", TfIdfOps.rakeOracleSql())(
      (s, d) => TfIdfOps.rakeKeyphrases(s, d)),

    q("keyword_search_bm25", TfIdfOps.bm25OracleSql())(
      (s, d) => TfIdfOps.bm25Search(s, d)),

    // Hybrid two-leg retrieval fused by reciprocal-rank fusion: exact
    // shingle-Jaccard lexical leg + exact-cosine semantic leg, integer
    // RRF (1e6 div (60 + rank)) — the standard RAG retrieval shape.
    q("hybrid_rrf_topk", HybridOps.hybridRrfOracleSql())(
      (s, d) => HybridOps.hybridRrfTopK(s, d)),

    // Week-over-week revenue growth over the dense week spine (exact
    // cents, one ppm division against the prior week).
    q("revenue_wow_growth", StarOps.WeeklyRevenueGrowthOracleSql)(
      StarOps.weeklyRevenueGrowth),

    // ---- Load phase (reference: analysis/etl_spark.py:250-259) ----
    // write → read-back fidelity digest through the partitioned parquet
    // sink; the oracle computes the same digest from the original table.
    // NOTE: roundtripAudit performs the parquet write EAGERLY when the
    // DataFrame is constructed (to a PID-suffixed /tmp scratch path) —
    // plan-only tooling (explain, schema dumps) still pays the write.
    q("sink_roundtrip", sinks.ParquetSink.roundtripOracleSql)(
      (s, d) => sinks.ParquetSink.roundtripAudit(s, d)),

    // Equi-depth range-partition boundaries via the hierarchical rank
    // (exact, reproducible repartitionByRange planning) vs a native
    // flat row_number oracle.
    q("range_boundaries", LayoutOps.RangeBoundariesOracleSql)(
      (s, d) => LayoutOps.rangeBoundaries(s, d)),

    // Hilbert-curve file plan: the locality-preserving sibling of
    // zorder_plan (consecutive cells always grid neighbors — tighter
    // per-file min/max boxes); unrolled integer per-level fold.
    q("hilbert_plan", LayoutOps.hilbertOracleSql())(
      (s, d) => LayoutOps.hilbertPlan(s, d)),

    // Zone-map (file footer min/max) pruning audit: ingest-ordered vs
    // date-sorted simulated file layouts against a one-month predicate —
    // the data-skipping half of the layout story next to zorder_plan.
    q("zonemap_audit", LayoutOps.ZoneMapOracleSql)(
      (s, d) => LayoutOps.zoneMapAudit(s, d)),

    // The curve-family DECISION readout: simulated footer pruning of one
    // 2-D box under xsort vs zorder vs hilbert at a file cut that
    // straddles quad boundaries — prices the two plans against each
    // other (measured sf0.01: hilbert 1 file, zorder 2, xsort 6).
    q("curve_layout_audit", LayoutOps.curveLayoutOracleSql())(
      (s, d) => LayoutOps.curveLayoutAudit(s, d)),

    // Same write→read-back fidelity gate through the ORC path (second
    // columnar format; the oracle digest of the ORIGINAL table is
    // format-independent, so any ORC round-trip loss breaks the hash).
    q("sink_roundtrip_orc", sinks.ParquetSink.roundtripOracleSql)(
      (s, d) => sinks.ParquetSink.roundtripAudit(s, d, format = "orc")),

    // Third format arm: JSONL. The digest's poly-hash over every text
    // byte is exactly what catches JSON string-escaping loss; the
    // read-back pays JSON's schema-inference scan, which is the
    // documented cost of the format, not a harness artifact.
    q("sink_roundtrip_jsonl", sinks.ParquetSink.roundtripOracleSql)(
      (s, d) => sinks.ParquetSink.roundtripAudit(s, d, format = "json")),

    // Fourth format arm: CSV (header on write, explicit schema on read —
    // the format is untyped, so the audit binds types instead of paying
    // an inference scan). The poly-hash digest catches quoting/escaping
    // loss, the sums catch numeric round-trip drift.
    q("sink_roundtrip_csv", sinks.ParquetSink.roundtripOracleSql)(
      (s, d) => sinks.ParquetSink.roundtripAudit(s, d, format = "csv")),

    // Avro container roundtrip — the fifth format arm, hand-rolled over
    // avro-core (this environment has no spark-avro connector): a
    // distributed Hadoop-FS DataFileWriter sink + a schema-resolving
    // reader (AvroSinkSpec pins real schema evolution), digested by the
    // same format-independent oracle as the other four arms.
    q("sink_roundtrip_avro", sinks.ParquetSink.roundtripOracleSql)(
      (s, d) => sinks.AvroSink.roundtripAudit(s, d))
  )

  val all: Vector[RegisteredQuery] = raw.map { rq =>
    if (cacheScoped(rq.name))
      rq.copy(run = (s, d) => operators.GraphOps.scopedCaches(s)(rq.run(s, d)))
    else rq
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(r => r.name -> r.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(r => r.oracle.map(r.name -> _)).toMap
}
