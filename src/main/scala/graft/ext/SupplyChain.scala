package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Supply-chain analytics completing the TPC-H shape coverage (SURVEY.md
  * §7.5). The schema has no `partsupp` table, so the five TPC-H queries
  * that read it (Q2, Q9, Q11, Q16, Q20) are re-expressed on the
  * (l_partkey, l_suppkey) relation that lineitem itself carries — the
  * PLAN SHAPES the originals exercise are preserved exactly:
  *
  *  - Q2:  correlated per-group MIN subquery → self-agg + equi-join back;
  *  - Q9:  5-way fact⋈dims profit rollup with an arithmetic measure;
  *  - Q11: GROUP BY + HAVING against a global scalar aggregate;
  *  - Q16: COUNT(DISTINCT) with a NOT-IN anti-join on a dim predicate;
  *  - Q20: nested aggregation (per-pair vs per-part) with a
  *         cross-multiplied share threshold.
  *
  * Beyond-reference (the reference engine has no joins, SURVEY.md §2.6)
  * but first-class for the 100 TB posture. Money/quantity math is
  * integer-exact end to end (cents / basis points / micro-dollars, the
  * [[Relational]] convention): double sums are order-dependent across
  * partitionings, so Long is both the determinism story and the cheap
  * one at scale. Broadcast hints go only on SF-invariant frames (nation
  * subsets, 1-row totals); SF-growing dims are left to AQE size-based
  * planning.
  */
object SupplyChain {

  private def quant(c: org.apache.spark.sql.Column, factor: Int) =
    round(c * factor).cast("long")

  private def discPriceE6(price: org.apache.spark.sql.Column,
                          discount: org.apache.spark.sql.Column) =
    quant(price, 100) * (lit(10000L) - quant(discount, 10000))

  /** TPC-H Q2-shaped: minimum-cost supplier per part. For size-15 parts,
    * among EUROPE suppliers that shipped the part, keep the supplier(s)
    * whose cheapest shipped price equals the part's minimum. The
    * reference SQL's correlated `ps_supplycost = (SELECT MIN ...)`
    * subquery becomes ONE self-aggregation joined back on the same key —
    * co-partitioned on l_partkey, so the min-join adds no exchange
    * beyond the agg's own; the per-row subquery of the naive plan never
    * executes. Supplier/nation attributes are attached AFTER the
    * winners are known (the join input is winners-sized, not pair-sized).
    */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val europeSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(
        Tables.nation(spark, sfDir)
          .join(broadcast(Tables.region(spark, sfDir)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val p15 = Tables.part(spark, sfDir).filter(col("p_size") === 15)
      .select("p_partkey", "p_type")
    // Cheapest price this supplier ever shipped this part at (cents).
    // Gated bloom pre-filter (guide §3.2, r17 verdict item 1): size-15
    // parts are ~2% of the catalog; past the fact-row gate the dim no
    // longer broadcasts and the plain plan shuffles the whole fact for
    // that 2%. The bloom over p15's keys prunes the fact scan BEFORE
    // any exchange; below the gate the plan is byte-identical. Values
    // unchanged (no false negatives, FPs die in the equi-join).
    val supCost = Sketches.maybeBloomPrefilter(spark, sfDir,
        Tables.lineitem(spark, sfDir)
          .select(col("l_partkey"), col("l_suppkey"),
            quant(col("l_extendedprice"), 100).as("cost_c")),
        "l_partkey", p15.select(col("p_partkey")))
      .join(p15, col("l_partkey") === col("p_partkey"))
      .join(europeSupp.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("cost_c")).as("cost_c"))
    val partMin = supCost.groupBy(col("l_partkey").as("pm_partkey"))
      .agg(min(col("cost_c")).as("min_c"))
    supCost
      .join(partMin, col("l_partkey") === col("pm_partkey") &&
        col("cost_c") === col("min_c"))
      .join(p15, col("l_partkey") === col("p_partkey"))
      .join(europeSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_type"), col("s_name"), col("n_name"),
        col("s_acctbal"), (col("cost_c").cast("double") / 100.0).as("cost"))
  }

  val q2Sql: String =
    """WITH sc AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(CAST(round(l_extendedprice*100) AS BIGINT)) AS cost_c
      |  FROM lineitem, part, supplier, nation, region
      |  WHERE l_partkey=p_partkey AND l_suppkey=s_suppkey
      |    AND s_nationkey=n_nationkey AND n_regionkey=r_regionkey
      |    AND r_name='EUROPE' AND p_size=15
      |  GROUP BY 1,2)
      |SELECT p_partkey, p_type, s_name, n_name, s_acctbal,
      |  CAST(cost_c AS DOUBLE)/100.0 AS cost
      |FROM (SELECT *, MIN(cost_c) OVER (PARTITION BY l_partkey) AS min_c
      |      FROM sc) m
      |JOIN part ON m.l_partkey=p_partkey
      |JOIN supplier ON m.l_suppkey=s_suppkey
      |JOIN nation ON s_nationkey=n_nationkey
      |WHERE cost_c = min_c""".stripMargin

  /** TPC-H Q9-shaped: product-type profit by supplier nation and order
    * year. Without `ps_supplycost`, the unit cost proxy is the part's
    * retail price: profit = disc_price − p_retailprice·l_quantity, in
    * exact micro-dollars (cents×bp and cents×centi-qty×100 both land on
    * the 1e6 scale). Plan: the part filter prunes lineitem FIRST (name
    * predicate reaches the dim scan), then supplier→nation attaches via
    * a broadcast-eligible dim chain, and lineitem⋈orders is the only
    * fact⋈fact shuffle. Group keys are (25 nations × 7 years) — the
    * final agg is map-side-combinable to a dashboard-sized frame. */
  def q9ProfitByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val redParts = Tables.part(spark, sfDir)
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), quant(col("p_retailprice"), 100).as("retail_c"))
    val suppNation = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        discPriceE6(col("l_extendedprice"), col("l_discount")).as("rev_e6"),
        quant(col("l_quantity"), 100).as("qty_c"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("n_name"),
        (col("rev_e6") - col("retail_c") * col("qty_c") * 100L).as("profit_e6"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg((sum(col("profit_e6")).cast("double") / 1e6).as("sum_profit"))
  }

  val q9Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
      |      *(10000-CAST(round(l_discount*10000) AS BIGINT))
      |    - CAST(round(p_retailprice*100) AS BIGINT)
      |      *CAST(round(l_quantity*100) AS BIGINT)*100) AS VARCHAR)
      |    AS DOUBLE)/1e6
      |    AS sum_profit
      |FROM lineitem, part, supplier, nation, orders
      |WHERE l_partkey=p_partkey AND l_suppkey=s_suppkey
      |  AND s_nationkey=n_nationkey AND l_orderkey=o_orderkey
      |  AND p_name LIKE '%red%'
      |GROUP BY 1,2""".stripMargin

  /** TPC-H Q11-shaped: "important stock" — parts whose NATION_3-supplied
    * revenue exceeds 1/1000 of the nation's total. The HAVING-against-a-
    * global-scalar shape: per-part Long sums, a 1-row grand total
    * broadcast back (scalar attachment, not a data cross join), and the
    * threshold compared cross-multiplied (value_c·1000 > total_c) so no
    * division ever happens — exact on both engines, and at 100 TB the
    * total is one Long regardless of fact size. */
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val n3supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .filter(col("n_name") === "NATION_3").select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        quant(col("l_extendedprice"), 100).as("price_c"))
      .join(n3supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(col("price_c")).as("value_c"))
    val total = perPart.agg(sum(col("value_c")).as("total_c"))
    perPart.join(broadcast(total))
      .filter(col("value_c") * 1000L > col("total_c"))
      .select(col("p_partkey"), (col("value_c").cast("double") / 100.0).as("value"))
  }

  val q11Sql: String =
    """WITH pp AS (
      |  SELECT l_partkey, SUM(CAST(round(l_extendedprice*100) AS BIGINT))
      |    AS value_c
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey=s_suppkey AND s_nationkey=n_nationkey
      |    AND n_name='NATION_3'
      |  GROUP BY 1)
      |SELECT l_partkey AS p_partkey, CAST(value_c AS DOUBLE)/100.0 AS value
      |FROM pp WHERE value_c*1000 > (SELECT SUM(value_c) FROM pp)""".stripMargin

  /** TPC-H Q16-shaped: distinct-supplier counts per part attribute,
    * excluding an "offending" supplier set (acctbal < 0 proxies the
    * original's complaints-comment EXISTS). The exclusion is a
    * LEFT ANTI join against a tiny frame — at any scale the bad-supplier
    * set is dim-sized, so it broadcasts; COUNT(DISTINCT) shuffles once
    * on the (brand, type, size) grid after partial per-partition
    * distincting. */
  def q16SupplierCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem, part
      |WHERE l_partkey=p_partkey AND p_brand <> 'Brand#5'
      |  AND p_type <> 'PROMO' AND p_size IN (1,4,9,14,19,24,29,34)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1,2,3""".stripMargin

  /** TPC-H Q20-shaped: suppliers holding a dominant share of a part's
    * 1998 PROMO volume (2·supplier_qty > part_total — the original's
    * `ps_availqty > 0.5·sum(shipped)` half-threshold, cross-multiplied
    * exact). Nested aggregation: per-(supplier, part) quantity, then a
    * per-part rollup of THAT (partial-agg friendly both times, same
    * l_partkey partitioning reusable between them), an equi-join of the
    * two, and a winners-sized distinct before supplier attributes
    * attach. */
  def q20DominantSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val promo98 = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz"))
      .select(col("l_partkey"), col("l_suppkey"),
        quant(col("l_quantity"), 100).as("qty_c"))
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "PROMO")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
    val perPair = promo98.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty_c")).as("qty_c"))
    val perPart = perPair.groupBy(col("l_partkey").as("pt_partkey"))
      .agg(sum(col("qty_c")).as("tot_c"))
    val winners = perPair
      .join(perPart, col("l_partkey") === col("pt_partkey"))
      .filter(col("qty_c") * 2L > col("tot_c"))
      .select("l_suppkey").distinct()
    // Keyed by s_suppkey: the output is one row PER WINNING SUPPLIER on
    // both engines. (A previous revision emitted only (s_name, n_name)
    // with DISTINCT on the oracle side alone — indistinguishable while
    // supplier names are unique, but the sf1 audit's replicated names
    // made the oracle collapse 10 suppliers into one row.)
    winners
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
  }

  val q20Sql: String =
    """WITH sp AS (
      |  SELECT l_suppkey, l_partkey,
      |    SUM(CAST(round(l_quantity*100) AS BIGINT)) AS qty_c
      |  FROM lineitem, part
      |  WHERE l_partkey=p_partkey AND p_type='PROMO'
      |    AND l_shipdate >= TIMESTAMP '1998-01-01'
      |    AND l_shipdate < TIMESTAMP '1999-01-01'
      |  GROUP BY 1,2),
      |pt AS (SELECT l_partkey AS pk, SUM(qty_c) AS tot_c FROM sp GROUP BY 1)
      |SELECT DISTINCT s_suppkey, s_name, n_name
      |FROM sp, pt, supplier, nation
      |WHERE sp.l_partkey=pt.pk AND 2*qty_c > tot_c
      |  AND sp.l_suppkey=s_suppkey AND s_nationkey=n_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q9_profit_by_nation" -> (q9ProfitByNation _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q16_supplier_counts" -> (q16SupplierCounts _),
    "q20_dominant_suppliers" -> (q20DominantSuppliers _))

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2Sql,
    "q9_profit_by_nation" -> q9Sql,
    "q11_important_parts" -> q11Sql,
    "q16_supplier_counts" -> q16Sql,
    "q20_dominant_suppliers" -> q20Sql)
}
