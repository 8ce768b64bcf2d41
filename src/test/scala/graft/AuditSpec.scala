package graft

import graft.ext.Audit

/** The integrity audit must be non-vacuous: the planted corruption
  * makes the two perturbed edges report violations (detectors FIRE)
  * while the four healthy edges stay at zero (detectors stay silent). */
class AuditSpec extends SparkSpec {

  test("planted violations fire; healthy edges stay zero") {
    val rows = Audit.integrityAudit(spark, sf).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(rows.size == 6)
    assert(rows("lineitem_order") > 0, "planted orphan lineitems not detected")
    assert(rows("order_customer") > 0, "planted dangling custkeys not detected")
    for (clean <- Seq("lineitem_part", "lineitem_supplier",
        "customer_nation", "supplier_nation"))
      assert(rows(clean) == 0, s"false positives on healthy edge $clean")
  }

  test("heaps law: checkpoints match a brute-force prefix count") {
    import spark.implicits._
    val got = Audit.heapsLaw(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (cp, nd, nt, vs) => cp -> ((nd, nt, vs)) }.toMap

    // Brute force: per checkpoint, filter the prefix and recount from
    // raw word hashes — no first-occurrence trick, no fan-out.
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", ext.Hashing.wordHashes($"text").as("ws"))
      .as[(Long, Seq[Long])].collect()
    val truth = got.keys.map { cp =>
      val prefix = docs.filter(_._1 < cp)
      cp -> ((prefix.length.toLong,
        prefix.map(_._2.size.toLong).sum,
        prefix.flatMap(_._2).distinct.length.toLong))
    }.toMap
    assert(got == truth)

    // Curve invariants: checkpoints are 2^k, all three series are
    // non-decreasing in cp, and the last checkpoint covers the corpus.
    val cps = got.keys.toSeq.sorted
    assert(cps.forall(cp => java.lang.Long.bitCount(cp) == 1))
    assert(cps.last >= docs.length)
    val series = cps.map(got)
    for (Seq(a, b) <- series.sliding(2))
      assert(a._1 <= b._1 && a._2 <= b._2 && a._3 <= b._3)
  }
}
