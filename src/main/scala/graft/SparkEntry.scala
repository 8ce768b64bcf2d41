package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's named operators; each key has a
  * DuckDB oracle in `oracleSql` (same column names, deterministic values —
  * money math is integer-exact on both sides, see graft.ext.Relational).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count — the reference's flagship app (`src/mrapps/wc.go`). */
  def entry(spark: SparkSession): DataFrame =
    apps.MrApps.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5 ext). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    apps.MrApps.queries ++ ext.TextAnalysis.queries ++
      ext.Dedup.queries ++ ext.Similarity.queries ++
      ext.Multimodal.queries ++ streaming.Streaming.queries ++
      kv.Sharding.queries ++ ext.Curation.queries ++
      ext.Relational.queries ++ ext.AsOf.queries ++
      ext.RangeJoin.queries ++ ext.Sketches.queries ++
      ext.Components.queries ++ ext.Packing.queries ++
      ext.Incremental.queries ++ ext.Quality.queries ++
      ext.Substring.queries ++ ext.Clustering.queries ++
      ext.Formats.queries ++ ext.Chunking.queries ++ ext.Redaction.queries ++
      ext.Funnel.queries ++ ext.AggState.queries ++ ext.Retention.queries ++ ext.Skew.queries ++ ext.Basket.queries ++ ext.Audit.queries ++ ext.PageRank.queries ++ ext.Tokenize.queries ++ ext.Bpe.queries ++ ext.Pipeline.queries ++ ext.ProductQuant.queries ++ ext.Audio.queries ++ ext.Bfs.queries ++ ext.Winnow.queries ++ ext.Communities.queries ++ ext.Paragraph.queries ++ ext.ScalarQuant.queries ++ ext.SparseSim.queries ++ ext.CharEntropy.queries ++
      ext.Rfm.queries ++ ext.Moments.queries ++ ext.Cdc.queries ++
      ext.Novelty.queries ++ ext.Qoi.queries ++ ext.SupplyChain.queries ++
      ext.Sweep.queries ++ ext.LinkPrediction.queries ++
      ext.Compaction.queries ++ ext.KnnEval.queries ++ ext.Tga.queries ++
      ext.Experiment.queries ++ ext.Skyline.queries ++
      ext.Forecast.queries ++ ext.CodeDetect.queries ++ ext.Gini.queries ++
      ext.Hits.queries ++ ext.Readability.queries ++ ext.Gif.queries ++ ext.Pca.queries ++ ext.Growth.queries ++ ext.Latency.queries ++ ext.Paths.queries ++ ext.Spell.queries ++ ext.Rake.queries ++
      Map[String, (SparkSession, String) => DataFrame](
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

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    apps.MrApps.oracles ++ ext.TextAnalysis.oracles ++
      ext.Dedup.oracles ++ ext.Similarity.oracles ++
      ext.Multimodal.oracles ++ streaming.Streaming.oracles ++
      kv.Sharding.oracles ++ ext.Curation.oracles ++
      ext.Relational.oracles ++ ext.AsOf.oracles ++
      ext.RangeJoin.oracles ++ ext.Sketches.oracles ++
      ext.Components.oracles ++ ext.Packing.oracles ++
      ext.Incremental.oracles ++ ext.Quality.oracles ++
      ext.Substring.oracles ++ ext.Clustering.oracles ++
      ext.Formats.oracles ++ ext.Chunking.oracles ++
      ext.Redaction.oracles ++ ext.Funnel.oracles ++
      ext.AggState.oracles ++ ext.Retention.oracles ++ ext.Skew.oracles ++
      ext.Basket.oracles ++ ext.Audit.oracles ++
      ext.PageRank.oracles ++ ext.Tokenize.oracles ++ ext.Bpe.oracles ++ ext.Pipeline.oracles ++ ext.ProductQuant.oracles ++ ext.Audio.oracles ++ ext.Bfs.oracles ++ ext.Winnow.oracles ++ ext.Communities.oracles ++ ext.Paragraph.oracles ++ ext.ScalarQuant.oracles ++ ext.SparseSim.oracles ++ ext.CharEntropy.oracles ++
      ext.Rfm.oracles ++ ext.Moments.oracles ++ ext.Cdc.oracles ++
      ext.Novelty.oracles ++ ext.Qoi.oracles ++ ext.SupplyChain.oracles ++
      ext.Sweep.oracles ++ ext.LinkPrediction.oracles ++
      ext.Compaction.oracles ++ ext.KnnEval.oracles ++ ext.Tga.oracles ++
      ext.Experiment.oracles ++ ext.Skyline.oracles ++
      ext.Forecast.oracles ++ ext.CodeDetect.oracles ++ ext.Gini.oracles ++
      ext.Hits.oracles ++ ext.Readability.oracles ++ ext.Gif.oracles ++ ext.Pca.oracles ++ ext.Growth.oracles ++ ext.Latency.oracles ++ ext.Paths.oracles ++ ext.Spell.oracles ++ ext.Rake.oracles ++ Map(
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
      "events_markov_stationary" -> ext.Events.markovStationarySql)
}
