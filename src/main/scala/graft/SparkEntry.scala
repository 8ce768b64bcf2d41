package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's named operators; each key has a
  * DuckDB oracle in `oracleSql` (same column names, deterministic values —
  * money math is integer-exact on both sides, see graft.ext.Relational).
  */
object SparkEntry {

  type Q = Map[String, (SparkSession, String) => DataFrame]

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count — the reference's flagship app (`src/mrapps/wc.go`). */
  def entry(spark: SparkSession): DataFrame =
    apps.MrApps.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** Keys defined directly here rather than in a module object: the
    * KV-replay family and the classic relational/events names that
    * predate the per-module `queries` convention. */
  private def inlineQueries: Q = Map(
    "kv_replay" -> ((s, dir) => kv.KvReplay.fromEvents(s, dir)),
    "kv_replay_resharded" -> (kv.KvReplay.replayResharded _),
    "kv_replay_snapshot" -> (kv.KvReplay.replaySnapshotted _),
    "kv_replay_ttl" -> (kv.KvReplay.replayTtl _),
    "kv_replay_asof" -> (kv.KvReplay.replayAsOf _),
    "kv_replay_idempotent" -> (kv.KvReplay.replayIdempotent _),
    "q1_pricing_summary" -> (ext.Relational.q1PricingSummary _),
    "q3_top_orders" -> (ext.Relational.q3TopOrders _),
    "q5_region_volume" -> (ext.Relational.q5RegionVolume _),
    "top_orders_per_customer" -> (ext.Relational.topOrdersPerCustomer _),
    "orders_rollup" -> (ext.Relational.ordersRollup _),
    "customers_without_orders" -> (ext.Relational.customersWithoutOrders _),
    "nations_with_customers" -> (ext.Relational.nationsWithCustomers _),
    "events_windowed_agg" -> (ext.Events.windowedAgg _),
    "events_sliding_agg" -> (ext.Events.slidingAgg _),
    "events_json_stats" -> (ext.Events.jsonStats _),
    "events_gapfill_hourly" -> (ext.Events.gapfillHourly _),
    "events_hourly_anomaly" -> (ext.Events.hourlyAnomaly _),
    "events_mad_hourly" -> (ext.Events.madHourly _),
    "events_throttle_hourly" -> (ext.Events.throttleHourly _),
    "events_ewma_hourly" -> (ext.Events.ewmaHourly _),
    "events_cusum_hourly" -> (ext.Events.cusumHourly _),
    "events_cusum_changepoints" -> (ext.Events.cusumChangepoints _),
    "events_dow_hour_heatmap" -> (ext.Events.dowHourHeatmap _),
    "events_trend_ols" -> (ext.Events.trendOls _),
    "events_scd2_user_type" -> (ext.Events.scd2UserType _),
    "events_autocorr_hourly" -> (ext.Events.autocorrHourly _),
    "events_click_attribution" -> (ext.Events.clickAttribution _),
    "events_minute_full_outer" -> (ext.Events.minuteFullOuter _),
    "events_out_of_order" -> (ext.Events.outOfOrder _),
    "lineitem_price_quantiles" -> (ext.Events.priceQuantiles _),
    "events_sessionize" -> (ext.Events.sessionize _),
    "events_session_durations" -> (ext.Events.sessionDurations _),
    "events_markov_transitions" -> (ext.Events.markovTransitions _),
    "events_markov_stationary" -> (ext.Events.markovStationary _))

  private def inlineOracles: Map[String, String] = Map(
    "kv_replay" -> kv.KvReplay.oracleSql,
    "kv_replay_resharded" -> kv.KvReplay.reshardedOracleSql,
    "kv_replay_snapshot" -> kv.KvReplay.oracleSql,
    "kv_replay_ttl" -> kv.KvReplay.ttlOracleSql,
    "kv_replay_asof" -> kv.KvReplay.asOfOracleSql,
    "kv_replay_idempotent" -> kv.KvReplay.idempotentOracleSql,
    "q1_pricing_summary" -> ext.Relational.q1Sql,
    "q3_top_orders" -> ext.Relational.q3Sql,
    "q5_region_volume" -> ext.Relational.q5Sql,
    "top_orders_per_customer" -> ext.Relational.topOrdersSql,
    "orders_rollup" -> ext.Relational.ordersRollupSql,
    "customers_without_orders" -> ext.Relational.customersWithoutOrdersSql,
    "nations_with_customers" -> ext.Relational.nationsWithCustomersSql,
    "events_windowed_agg" -> ext.Events.windowedAggSql,
    "events_sliding_agg" -> ext.Events.slidingAggSql,
    "events_json_stats" -> ext.Events.jsonStatsSql,
    "events_gapfill_hourly" -> ext.Events.gapfillHourlySql,
    "events_hourly_anomaly" -> ext.Events.hourlyAnomalySql,
    "events_mad_hourly" -> ext.Events.madHourlySql,
    "events_throttle_hourly" -> ext.Events.throttleHourlySql,
    "events_ewma_hourly" -> ext.Events.ewmaHourlySql,
    "events_cusum_hourly" -> ext.Events.cusumHourlySql,
    "events_cusum_changepoints" -> ext.Events.cusumChangepointsSql,
    "events_dow_hour_heatmap" -> ext.Events.dowHourHeatmapSql,
    "events_trend_ols" -> ext.Events.trendOlsSql,
    "events_scd2_user_type" -> ext.Events.scd2UserTypeSql,
    "events_autocorr_hourly" -> ext.Events.autocorrHourlySql,
    "events_click_attribution" -> ext.Events.clickAttributionSql,
    "events_minute_full_outer" -> ext.Events.minuteFullOuterSql,
    "events_out_of_order" -> ext.Events.outOfOrderSql,
    "lineitem_price_quantiles" -> ext.Events.priceQuantilesSql,
    "events_sessionize" -> ext.Events.sessionizeSql,
    "events_session_durations" -> ext.Events.sessionDurationsSql,
    "events_markov_transitions" -> ext.Events.markovTransitionsSql,
    // Unrolled power-iteration chain (see Pca's top-component oracle):
    // materialized so each rk/pk step computes once in the oracle engine.
    "events_markov_stationary" ->
      ext.Hashing.materializeCtes(ext.Events.markovStationarySql))

  /** Named module registry: (module name, queries, oracles). The
    * generated ledger (`graft.tools.Ledger` → LEDGER.md, SURVEY §8)
    * walks this so the key inventory can never drift from the code;
    * [[queries]]/[[oracleSql]] are folds over it. Module name `a.B`
    * maps to `src/main/scala/graft/a/B.scala` (Ledger checks the file
    * exists). Inline legacy keys live under their defining module. */
  def modules: Seq[(String, Q, Map[String, String])] = Seq(
    ("apps.MrApps", apps.MrApps.queries, apps.MrApps.oracles),
    ("ext.TextAnalysis", ext.TextAnalysis.queries, ext.TextAnalysis.oracles),
    ("ext.Dedup", ext.Dedup.queries, ext.Dedup.oracles),
    ("ext.DedupBounded", ext.DedupBounded.queries, ext.DedupBounded.oracles),
    ("ext.Similarity", ext.Similarity.queries, ext.Similarity.oracles),
    ("ext.Multimodal", ext.Multimodal.queries, ext.Multimodal.oracles),
    ("streaming.Streaming", streaming.Streaming.queries, streaming.Streaming.oracles),
    ("kv.Sharding", kv.Sharding.queries, kv.Sharding.oracles),
    ("ext.Curation", ext.Curation.queries, ext.Curation.oracles),
    ("ext.Relational", ext.Relational.queries, ext.Relational.oracles),
    ("ext.AsOf", ext.AsOf.queries, ext.AsOf.oracles),
    ("ext.RangeJoin", ext.RangeJoin.queries, ext.RangeJoin.oracles),
    ("ext.Sketches", ext.Sketches.queries, ext.Sketches.oracles),
    ("ext.Components", ext.Components.queries, ext.Components.oracles),
    ("ext.Packing", ext.Packing.queries, ext.Packing.oracles),
    ("ext.Incremental", ext.Incremental.queries, ext.Incremental.oracles),
    ("ext.IncrementalAnn", ext.IncrementalAnn.queries, ext.IncrementalAnn.oracles),
    ("ext.Quality", ext.Quality.queries, ext.Quality.oracles),
    ("ext.Substring", ext.Substring.queries, ext.Substring.oracles),
    ("ext.Clustering", ext.Clustering.queries, ext.Clustering.oracles),
    ("ext.Formats", ext.Formats.queries, ext.Formats.oracles),
    ("ext.Chunking", ext.Chunking.queries, ext.Chunking.oracles),
    ("ext.Redaction", ext.Redaction.queries, ext.Redaction.oracles),
    ("ext.Funnel", ext.Funnel.queries, ext.Funnel.oracles),
    ("ext.AggState", ext.AggState.queries, ext.AggState.oracles),
    ("ext.Retention", ext.Retention.queries, ext.Retention.oracles),
    ("ext.Skew", ext.Skew.queries, ext.Skew.oracles),
    ("ext.Basket", ext.Basket.queries, ext.Basket.oracles),
    ("ext.Audit", ext.Audit.queries, ext.Audit.oracles),
    ("ext.PageRank", ext.PageRank.queries, ext.PageRank.oracles),
    ("ext.Tokenize", ext.Tokenize.queries, ext.Tokenize.oracles),
    ("ext.Bpe", ext.Bpe.queries, ext.Bpe.oracles),
    ("ext.Pipeline", ext.Pipeline.queries, ext.Pipeline.oracles),
    ("ext.ProductQuant", ext.ProductQuant.queries, ext.ProductQuant.oracles),
    ("ext.Audio", ext.Audio.queries, ext.Audio.oracles),
    ("ext.Bfs", ext.Bfs.queries, ext.Bfs.oracles),
    ("ext.Winnow", ext.Winnow.queries, ext.Winnow.oracles),
    ("ext.Communities", ext.Communities.queries, ext.Communities.oracles),
    ("ext.Paragraph", ext.Paragraph.queries, ext.Paragraph.oracles),
    ("ext.ScalarQuant", ext.ScalarQuant.queries, ext.ScalarQuant.oracles),
    ("ext.SparseSim", ext.SparseSim.queries, ext.SparseSim.oracles),
    ("ext.CharEntropy", ext.CharEntropy.queries, ext.CharEntropy.oracles),
    ("ext.Rfm", ext.Rfm.queries, ext.Rfm.oracles),
    ("ext.Moments", ext.Moments.queries, ext.Moments.oracles),
    ("ext.Cdc", ext.Cdc.queries, ext.Cdc.oracles),
    ("ext.Novelty", ext.Novelty.queries, ext.Novelty.oracles),
    ("ext.Qoi", ext.Qoi.queries, ext.Qoi.oracles),
    ("ext.SupplyChain", ext.SupplyChain.queries, ext.SupplyChain.oracles),
    ("ext.Sweep", ext.Sweep.queries, ext.Sweep.oracles),
    ("ext.LinkPrediction", ext.LinkPrediction.queries, ext.LinkPrediction.oracles),
    ("ext.Compaction", ext.Compaction.queries, ext.Compaction.oracles),
    ("ext.KnnEval", ext.KnnEval.queries, ext.KnnEval.oracles),
    ("ext.Tga", ext.Tga.queries, ext.Tga.oracles),
    ("ext.Experiment", ext.Experiment.queries, ext.Experiment.oracles),
    ("ext.Skyline", ext.Skyline.queries, ext.Skyline.oracles),
    ("ext.Forecast", ext.Forecast.queries, ext.Forecast.oracles),
    ("ext.CodeDetect", ext.CodeDetect.queries, ext.CodeDetect.oracles),
    ("ext.Gini", ext.Gini.queries, ext.Gini.oracles),
    ("ext.Hits", ext.Hits.queries, ext.Hits.oracles),
    ("ext.Readability", ext.Readability.queries, ext.Readability.oracles),
    ("ext.Gif", ext.Gif.queries, ext.Gif.oracles),
    ("ext.Pca", ext.Pca.queries, ext.Pca.oracles),
    ("ext.Growth", ext.Growth.queries, ext.Growth.oracles),
    ("ext.Latency", ext.Latency.queries, ext.Latency.oracles),
    ("ext.Paths", ext.Paths.queries, ext.Paths.oracles),
    ("ext.Spell", ext.Spell.queries, ext.Spell.oracles),
    ("ext.Rake", ext.Rake.queries, ext.Rake.oracles),
    ("kv.KvReplay", inlineQueries.view.filterKeys(_.startsWith("kv_replay")).toMap,
      inlineOracles.view.filterKeys(_.startsWith("kv_replay")).toMap),
    ("ext.Relational (classic)", inlineQueries.view.filterKeys(k =>
      !k.startsWith("kv_replay") && !k.startsWith("events_") &&
        k != "lineitem_price_quantiles").toMap,
      inlineOracles.view.filterKeys(k =>
        !k.startsWith("kv_replay") && !k.startsWith("events_") &&
          k != "lineitem_price_quantiles").toMap),
    ("ext.Events", inlineQueries.view.filterKeys(k =>
      k.startsWith("events_") || k == "lineitem_price_quantiles").toMap,
      inlineOracles.view.filterKeys(k =>
        k.startsWith("events_") || k == "lineitem_price_quantiles").toMap))

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5 ext). */
  def queries: Q = modules.iterator.map(_._2).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._3).reduce(_ ++ _)

  /** [[oracleSql]] with the per-SF specializations applied — what
    * Verify actually dumps. Today that is only the auto-tier rolling
    * actives: the engine replays the same plan-time count decision the
    * Spark query dispatches on and emits only the selected tier's SQL
    * (see [[ext.Growth.rollingActivesAutoSqlFor]]), so the oracle never
    * executes the tier the gate pruned. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    oracleSql + ("events_rolling_actives_auto" ->
      ext.Growth.rollingActivesAutoSqlFor(spark, sfDir))
}
