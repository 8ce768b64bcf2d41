package graft

import org.apache.spark.sql.functions._

import graft.ext.SupplyChain

/** Invariants for the partsupp-free TPC-H shapes (Q2/Q9/Q11/Q16/Q20).
  * The DuckDB gate pins exact values at sf0.01; these specs pin the
  * SEMANTIC claims each query makes, on sf0.001, so a refactor that
  * stays hash-green on one fixture can't silently change meaning. */
class SupplyChainSpec extends SparkSpec {

  test("q2: every winner's cost IS its part's minimum over Europe suppliers") {
    val out = SupplyChain.q2MinCostSupplier(spark, sf)
    // Each part appears with exactly one distinct cost (the min), and
    // re-deriving the per-part min from the output changes nothing.
    val perPart = out.groupBy(col("p_partkey"))
      .agg(countDistinct(col("cost")).as("n_costs"))
    assert(perPart.filter(col("n_costs") =!= 1L).count() == 0)
    // All parts are size 15 — the dim predicate reached the output.
    val offSize = out.select(col("p_partkey")).distinct()
      .join(Tables.part(spark, sf), Seq("p_partkey"))
      .filter(col("p_size") =!= 15).count()
    assert(offSize == 0)
  }

  test("q9: profit decomposes as revenue minus retail cost (exact)") {
    val out = SupplyChain.q9ProfitByNation(spark, sf)
    // Totalling profit over all groups == one global ungrouped compute.
    val total = out.agg(sum(col("sum_profit"))).collect()(0).getDouble(0)
    val l = Tables.lineitem(spark, sf)
    val p = Tables.part(spark, sf).filter(col("p_name").like("%red%"))
    val global = l.join(p, col("l_partkey") === col("p_partkey"))
      .agg((sum(
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(10000L) - round(col("l_discount") * 10000).cast("long")) -
        round(col("p_retailprice") * 100).cast("long") *
          round(col("l_quantity") * 100).cast("long") * 100L
      ).cast("double") / 1e6).as("t")).collect()(0).getDouble(0)
    assert(math.abs(total - global) < 1e-6)
  }

  test("q11: kept parts each exceed 1/1000 of total; dropped parts don't") {
    val kept = SupplyChain.q11ImportantParts(spark, sf)
    val keptSum = kept.agg(sum((col("value") * 100).cast("long")))
      .collect()(0).getLong(0)
    // Rebuild the unfiltered per-part frame to find the grand total.
    val n3 = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey")).select("s_suppkey")
    val all = Tables.lineitem(spark, sf)
      .join(n3, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
    val totalC = all.agg(sum(col("v"))).collect()(0).getLong(0)
    val expectKept = all.filter(col("v") * 1000L > totalC).count()
    assert(kept.count() == expectKept)
    assert(keptSum <= totalC)
  }

  test("q16: negative-balance suppliers never contribute to any count") {
    val out = SupplyChain.q16SupplierCounts(spark, sf)
    // Upper bound: no cell can count more suppliers than exist with
    // non-negative balance.
    val goodSupp = Tables.supplier(spark, sf)
      .filter(col("s_acctbal") >= 0).count()
    val maxCell = out.agg(max(col("supplier_cnt"))).collect()(0).getLong(0)
    assert(maxCell <= goodSupp)
    // Grid keys honor the dim predicates.
    assert(out.filter(col("p_brand") === "Brand#5" ||
      col("p_type") === "PROMO").count() == 0)
  }

  test("q20: dominance is exclusive — at most one winner per part") {
    // 2·qty > total admits at most one supplier per part by pigeonhole;
    // verify on the intermediate by recomputing winners per part.
    val l = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz"))
      .join(Tables.part(spark, sf).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("q"))
    val tot = l.groupBy(col("l_partkey").as("pk")).agg(sum(col("q")).as("t"))
    val winnersPerPart = l.join(tot, col("l_partkey") === col("pk"))
      .filter(col("q") * 2L > col("t"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    assert(winnersPerPart.filter(col("n") > 1L).count() == 0)
    // And the gated output is a subset of all suppliers.
    val out = SupplyChain.q20DominantSuppliers(spark, sf)
    assert(out.count() <= Tables.supplier(spark, sf).count())
  }
}
