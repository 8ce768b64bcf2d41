package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Growth analytics — the two reports every product warehouse keeps:
  *
  *  - Rolling active users per hour (the DAU/WAU/MAU family on the
  *    fixture's hourly cadence): EXACT distinct users over trailing
  *    6 h / 24 h / 72 h windows, plus the floored-permille stickiness
  *    ratio (short/long — "of this window's actives, how many were
  *    here today"). Sliding DISTINCT has no prefix-sum identity (users
  *    leave the window), so the exact form uses a gap-bounded COVERAGE
  *    explode: each activity hour covers the spine hours up to
  *    min(W−1, gap to the user's next activity), so every
  *    (user, spine-hour) pair is emitted exactly once with its
  *    hours-since-last-activity offset already attached — no W×
  *    intermediate, no per-(hour,user) grouping, and `active in
  *    window w` is just `off < w`. Deliberately NOT a range join: the
  *    range form plans as a broadcast nested-loop whose per-row probe
  *    cost is O(|spine|), which loses to the bounded explode once the
  *    spine is a year of hours. At 100 TB the same spine rides
  *    [[Sketches]]' mergeable HLL registers (`sketch_hll_grouped`)
  *    with union-by-window instead — the documented trade (±2% for
  *    O(spine) state), both tiers gated.
  *  - Cohort LTV: customers cohorted by first-order quarter, revenue
  *    accumulated by cohort age in quarters — the retention-revenue
  *    triangle. Quarter index is the integer year·4 + (quarter−1)
  *    (both engines' year()/quarter() are calendar-exact on
  *    timestamps), money in exact cents.
  *
  * Scale shape: both reports collapse the fact table FIRST (distinct
  * user-hours; per-customer first-order + per-order cents), then join
  * dimension-sized frames. The hour spine and the cohort triangle are
  * dashboard-sized at any SF. */
object Growth {

  /** Rolling-active windows in hours. INVARIANT (pinned here because
    * the round-9 audit flagged it): the widest window bounds the
    * per-activity coverage explode below — each activity emits
    * min(`Windows.max`, gap-to-next-activity) rows, so the fan is
    * output-sized (one row per active (user, spine-hour) pair), with
    * `Windows.max` only the WORST-case factor for users active less
    * than once per window. Still the deliberate trade vs a range join
    * (which plans as a BNLJ with O(|spine|) probes); if a caller ever
    * needs windows past a few hundred hours (say 30 days = 720×
    * worst-case), prefer the GATED HLL tier below
    * (`events_rolling_actives_hll`, [[rollingActivesHll]]): its
    * fan-out explodes hour-REGISTER rows (spine × 64,
    * corpus-independent) regardless of activity density — and
    * [[rollingActivesAuto]] makes that call from the corpus count. */
  val Windows: Seq[Int] = Seq(6, 24, 72)

  def rollingActives(spark: SparkSession, sfDir: String): DataFrame = {
    val uh = Tables.events(spark, sfDir)
      .select(col("user_id"),
        unix_micros(date_trunc("hour", col("ts")).cast("timestamp"))
          .as("uh_us"))
      .distinct()
      .localCheckpoint() // the fan-out AND the spine derive from it
    val spine = uh.select(col("uh_us").as("hour_us")).distinct()
    // Gap-bounded COVERAGE explode: `user active-in-window-w at hour t`
    // ≡ `t − (latest activity ≤ t) < w`, and the latest-activity
    // assignment needs no grouping at all — each activity hour covers
    // spine hours [h, h + min(W−1, gap_to_next_activity − 1)], so every
    // (user, spine-hour) pair is emitted EXACTLY ONCE, by its covering
    // activity, with `off` = hours-since-last-activity already in hand.
    // vs the naive |user-hours|×W fan + 3 countDistincts (which Catalyst
    // plans as an Expand ×4 then a distinct-hash over ~290 M rows at
    // sf1 — measured 67 s): one lead() window (keyed shuffle on
    // user_id), an explode bounded by min(W, actual gap) — output-sized,
    // ≈ |active (user,hour) pairs|, typically far below W× — a 1-row
    // BROADCAST spine join, and a 720-group count. Same exact integers.
    val usPerHour = 3600000000L
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("uh_us"))
    val cov = uh
      .withColumn("next_us", lead(col("uh_us"), 1).over(wNext))
      .select(col("user_id"), col("uh_us"),
        least(lit(Windows.max - 1L),
          coalesce(expr(s"(next_us - uh_us) div $usPerHour") - 1L,
            lit(Windows.max - 1L))).as("span"))
    val fan = cov
      .select(col("user_id"), col("uh_us"),
        explode(expr("sequence(0L, span)")).as("off"))
      .select(col("off"),
        (col("uh_us") + col("off") * lit(usPerHour)).as("hour_us"))
    val aggs = Windows.map { w =>
      count(when(col("off") < w, lit(1))).as(s"rau_${w}h")
    }
    fan.join(broadcast(spine), "hour_us")
      .groupBy(col("hour_us"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        expr("cast(timestamp_micros(hour_us) as timestamp_ntz)").as("hour") +:
        Windows.map(w => col(s"rau_${w}h").cast("long").as(s"rau_${w}h")) :+
        expr(s"(rau_${Windows.head}h * 1000) div rau_${Windows.max}h")
          .cast("long").as("stickiness_pm"): _*)
  }

  val rollingActivesSql: String = {
    val w0 = Windows.head
    val wMax = Windows.max
    val cols = Windows.map(w =>
      s"""CAST(COUNT(CASE WHEN off < $w
         |    THEN 1 END) AS BIGINT) AS rau_${w}h""".stripMargin)
      .mkString(",\n")
    s"""WITH uh AS (SELECT DISTINCT user_id,
       |    epoch_us(date_trunc('hour', ts)) AS uh_us
       |  FROM events),
       |spine AS (SELECT DISTINCT uh_us AS hour_us FROM uh),
       |cov AS (SELECT user_id, uh_us,
       |    LEAST($wMax - 1, COALESCE(
       |      (lead(uh_us) OVER (PARTITION BY user_id ORDER BY uh_us)
       |        - uh_us) // 3600000000 - 1, $wMax - 1)) AS span
       |  FROM uh),
       |fan AS (SELECT CAST(t.off AS BIGINT) AS off,
       |    uh_us + CAST(t.off AS BIGINT) * 3600000000 AS hour_us
       |  FROM cov, unnest(range(0, span + 1)) AS t(off)),
       |a AS (SELECT hour_us,
       |$cols
       |  FROM fan JOIN spine USING (hour_us) GROUP BY 1),
       |f AS (SELECT make_timestamp(hour_us) AS hour,
       |    rau_${w0}h, rau_24h, rau_${wMax}h,
       |    CAST((rau_${w0}h * 1000) // rau_${wMax}h AS BIGINT)
       |      AS stickiness_pm
       |  FROM a)
       |SELECT * FROM f""".stripMargin
  }

  /** HLL tier of [[rollingActives]] — the 100 TB shape the explode
    * comment above points at, now GATED rather than merely documented.
    * Per-hour 64-register HyperLogLog state ([[Sketches]]' exact-integer
    * kernel: idHash bucket/rho, shared CASE, integer alpha, integer
    * linear-counting table), then the window union = element-wise MAX of
    * registers across the window's hours. The decisive difference from
    * the exact tier: the 72× fan-out explodes REGISTER rows (hours × 64,
    * corpus-independent) instead of user-hours (corpus-sized), so the
    * widest window costs spine × windows × 64 tiny rows no matter how
    * many users exist. Estimates carry HLL's ~13% error at m=64
    * (RollingHllSpec measures it against the exact tier); both engines
    * compute identical integers, so the gate is still hash-exact. */
  def rollingActivesHll(spark: SparkSession, sfDir: String): DataFrame = {
    import Sketches.{HllM, HllWBits, HllAlphaNum, HllAlphaDen, hllRhoCase, hllLcTable}
    val S = HllWBits + 1
    val numer = (HllAlphaNum * HllM * HllM) << S
    val regs = Tables.events(spark, sfDir)
      .select(unix_micros(date_trunc("hour", col("ts")).cast("timestamp"))
          .as("hour_us"),
        Hashing.idHash(col("user_id")).as("h"))
      .selectExpr("hour_us", s"h % $HllM AS bucket", s"h div $HllM AS w")
      .select(col("hour_us"), col("bucket"), expr(hllRhoCase).as("rho"))
      .groupBy(col("hour_us"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
      .localCheckpoint() // spine + fan both derive from it
    val spine = regs.select(col("hour_us").as("t_us")).distinct()
    val fan = regs
      .select(col("hour_us"), col("bucket"), col("reg"),
        explode(expr(s"sequence(0L, ${Windows.max - 1}L)")).as("off"))
      .select((col("hour_us") + col("off") * lit(3600000000L)).as("t_us"),
        col("bucket"), col("off"), col("reg"))
    val winAggs = Windows.map(w =>
      max(when(col("off") < w, col("reg"))).as(s"reg_$w"))
    val winRegs = fan.join(spine, "t_us")
      .groupBy(col("t_us"), col("bucket"))
      .agg(winAggs.head, winAggs.tail: _*)
    val estAggs = Windows.flatMap(w => Seq(
      count(col(s"reg_$w")).as(s"nb_$w"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $S - reg_$w)")).as(s"spp_$w")))
    val estCols = Windows.map { w =>
      val sumPow = s"(COALESCE(spp_$w, 0L) + ($HllM - nb_$w) * ${1L << S}L)"
      val raw = s"(${numer}L div ($HllAlphaDen * $sumPow))"
      expr(s"""CAST(CASE WHEN ($HllM - nb_$w) > 0 AND $raw * 2 <= ${5 * HllM}
              |  THEN element_at(array(${hllLcTable.mkString(", ")}),
              |    CAST($HllM - nb_$w AS INT))
              |  ELSE $raw END AS LONG)""".stripMargin)
        .as(s"rau_${w}h_est")
    }
    winRegs
      .groupBy(col("t_us"))
      .agg(estAggs.head, estAggs.tail: _*)
      .select(expr("cast(timestamp_micros(t_us) as timestamp_ntz)")
        .as("hour") +: estCols: _*)
  }

  val rollingActivesHllSql: String = {
    import Sketches.{HllM, HllWBits, HllAlphaNum, HllAlphaDen, hllRhoCase, hllLcTable}
    val S = HllWBits + 1
    val numer = (HllAlphaNum * HllM * HllM) << S
    val wMax = Windows.max
    val winCols = Windows.map(w =>
      s"MAX(CASE WHEN off < $w THEN reg END) AS reg_$w").mkString(",\n    ")
    val estInputs = Windows.map(w =>
      s"""CAST(COUNT(reg_$w) AS BIGINT) AS nb_$w,
         |    CAST(SUM(1::BIGINT << ($S - reg_$w)) AS BIGINT) AS spp_$w"""
        .stripMargin).mkString(",\n    ")
    val estCols = Windows.map { w =>
      s"""CAST(CASE WHEN ($HllM - nb_$w) > 0
         |      AND ($numer // ($HllAlphaDen * (COALESCE(spp_$w, 0)
         |        + ($HllM - nb_$w) * ${1L << S}))) * 2 <= ${5 * HllM}
         |    THEN list_extract([${hllLcTable.mkString(", ")}],
         |      CAST($HllM - nb_$w AS INT))
         |    ELSE $numer // ($HllAlphaDen * (COALESCE(spp_$w, 0)
         |      + ($HllM - nb_$w) * ${1L << S}))
         |    END AS BIGINT) AS rau_${w}h_est""".stripMargin
    }.mkString(",\n  ")
    s"""WITH ev AS (SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
       |    ${Hashing.idHashSql("user_id")} AS h FROM events),
       |b AS (SELECT hour_us, h % $HllM AS bucket, h // $HllM AS w FROM ev),
       |r AS (SELECT hour_us, bucket, MAX($hllRhoCase) AS reg FROM b
       |  GROUP BY 1, 2),
       |sp AS (SELECT DISTINCT hour_us AS t_us FROM r),
       |f AS (SELECT r.hour_us + CAST(t.off AS BIGINT) * 3600000000 AS t_us,
       |    bucket, CAST(t.off AS BIGINT) AS off, reg
       |  FROM r, unnest(range(0, $wMax)) AS t(off)),
       |wr AS (SELECT t_us, bucket,
       |    $winCols
       |  FROM f JOIN sp USING (t_us) GROUP BY 1, 2),
       |e AS (SELECT t_us,
       |    $estInputs
       |  FROM wr GROUP BY 1)
       |SELECT make_timestamp(t_us) AS hour,
       |  $estCols
       |FROM e""".stripMargin
  }

  def cohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
          .cast("long").as("qidx"))
      .localCheckpoint() // first-order cohorts + the revenue fold
    val cohorts = o.groupBy(col("o_custkey"))
      .agg(min(col("qidx")).as("cohort_q"))
    o.join(cohorts, "o_custkey")
      .groupBy(col("cohort_q"), (col("qidx") - col("cohort_q")).as("age_q"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("price_c")).as("revenue_c"))
      .select(col("cohort_q"), col("age_q"), col("n_customers"),
        col("n_orders"),
        (col("revenue_c").cast("double") / 100.0).as("revenue"))
  }

  val cohortLtvSql: String =
    """WITH o AS (SELECT o_custkey, o_orderdate,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
      |    CAST(year(o_orderdate)*4 + quarter(o_orderdate) - 1 AS BIGINT)
      |      AS qidx
      |  FROM orders),
      |c AS (SELECT o_custkey, MIN(qidx) AS cohort_q FROM o GROUP BY 1)
      |SELECT c.cohort_q, o.qidx - c.cohort_q AS age_q,
      |  CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(price_c) AS DOUBLE)/100.0 AS revenue
      |FROM o JOIN c ON o.o_custkey = c.o_custkey
      |GROUP BY 1, 2""".stripMargin

  /** Auto-tier seam (r10 ask #5): the exact tier's WORST-CASE cost is
    * |user-hours| × widest window coverage rows (sparse users emit the
    * full window; dense users are gap-bounded — see the coverage
    * explode above), while the HLL tier's is spine × 64 registers,
    * corpus-independent. Above this worst-case-row bound the auto gate
    * flips to HLL. |events| upper-bounds |user-hours| and is a
    * metadata-cheap plan-time scalar (the [[Similarity]] adaptive-bits
    * corpus-count discipline), so both engines replay the identical
    * decision. 100 M worst-case rows keeps the EXACT tier through sf1
    * (72 M bound; measured 3.0 s post-coverage-rewrite, vs 2.3 s HLL —
    * exactness is free there) and flips at sf3 (216 M bound): past
    * that the exact tier's state grows with corpus × density while
    * HLL's stays spine-shaped — the 100 TB answer. */
  val AutoFanRowCap = 100000000L

  private[graft] def useHllTier(nEvents: Long): Boolean =
    nEvents * Windows.max > AutoFanRowCap

  /** Tier-dispatching rolling actives: one output schema (hour,
    * rau_{w}h…, tier) whichever tier runs, so callers — and the DuckDB
    * oracle, which replays the same |events|-count rule — see a stable
    * contract. Exact values below the cap, HLL estimates above it. */
  def rollingActivesAuto(spark: SparkSession, sfDir: String): DataFrame = {
    val n = eventsCount(spark, sfDir)
    if (!useHllTier(n))
      rollingActives(spark, sfDir).select(
        col("hour") +: Windows.map(w => col(s"rau_${w}h")) :+
          lit("exact").as("tier"): _*)
    else
      rollingActivesHll(spark, sfDir).select(
        col("hour") +: Windows.map(w =>
          col(s"rau_${w}h_est").as(s"rau_${w}h")) :+
          lit("hll").as("tier"): _*)
  }

  val rollingActivesAutoSql: String = {
    val raus = Windows.map(w => s"rau_${w}h").mkString(", ")
    val estAs = Windows.map(w => s"rau_${w}h_est AS rau_${w}h").mkString(", ")
    s"""WITH decision AS (
       |  SELECT COUNT(*) * ${Windows.max} > $AutoFanRowCap AS use_hll
       |  FROM events)
       |SELECT hour, $raus, 'exact' AS tier
       |FROM ($rollingActivesSql) x
       |WHERE NOT (SELECT use_hll FROM decision)
       |UNION ALL
       |SELECT hour, $estAs, 'hll' AS tier
       |FROM ($rollingActivesHllSql) y
       |WHERE (SELECT use_hll FROM decision)""".stripMargin
  }

  /** Plan-time |events| statistic, memoized per (session, sfDir) — the
    * count the auto tier dispatches on, shared with the per-SF oracle
    * specialization below. */
  private def eventsCount(spark: SparkSession, sfDir: String): Long =
    Frames.scalarMemo("events_count", spark, sfDir) {
      Tables.events(spark, sfDir).count()
    }

  /** Per-SF specialization of [[rollingActivesAutoSql]]: the static
    * UNION-of-tiers form filters each branch with an uncorrelated
    * scalar subquery, which the oracle engine cannot prune at plan
    * time — above the cap it executes the full exact tier the auto
    * gate exists to avoid. Verify replays the |events|-count decision
    * HERE (the identical [[useHllTier]] rule the Spark query runs) and
    * dumps only the selected tier's SQL, so the oracle pays only the
    * chosen tier's cost at every SF. The decision itself stays
    * cross-engine checkable: the static form remains registered as the
    * reference statement. */
  def rollingActivesAutoSqlFor(spark: SparkSession, sfDir: String): String = {
    val raus = Windows.map(w => s"rau_${w}h").mkString(", ")
    val estAs = Windows.map(w => s"rau_${w}h_est AS rau_${w}h").mkString(", ")
    if (!useHllTier(eventsCount(spark, sfDir)))
      s"SELECT hour, $raus, 'exact' AS tier FROM ($rollingActivesSql) x"
    else
      s"SELECT hour, $estAs, 'hll' AS tier FROM ($rollingActivesHllSql) y"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_rolling_actives" -> (rollingActives _),
    "events_rolling_actives_hll" -> (rollingActivesHll _),
    "events_rolling_actives_auto" -> (rollingActivesAuto _),
    "orders_cohort_ltv" -> (cohortLtv _))

  val oracles: Map[String, String] = Map(
    "events_rolling_actives" -> rollingActivesSql,
    "events_rolling_actives_hll" -> rollingActivesHllSql,
    "events_rolling_actives_auto" -> rollingActivesAutoSql,
    "orders_cohort_ltv" -> cohortLtvSql)
}
