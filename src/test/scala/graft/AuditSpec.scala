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

  test("zipf ranks: checkpoints match a brute-force frequency sort") {
    import spark.implicits._
    val got = Audit.zipfRanks(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)

    val freqs: Seq[(Long, Long)] = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        ext.Hashing.wordHashes($"text")).as("wh"))
      .as[Long].collect().toSeq
      .groupBy(x => x).map { case (wh, xs) => (wh, xs.size.toLong) }
      .toSeq.sortBy { case (wh, f) => (-f, wh) }
    val total = freqs.map(_._2).sum
    val cum = freqs.map(_._2).scanLeft(0L)(_ + _).tail

    assert(got.nonEmpty)
    got.foreach { case (rank, f, cf, cov, ratio) =>
      assert(java.lang.Long.bitCount(rank) == 1, s"rank $rank not 2^k")
      assert(f == freqs((rank - 1).toInt)._2, s"freq at rank $rank")
      assert(cf == cum((rank - 1).toInt))
      assert(cov == cf * 1000 / total)
      if (rank == 1L) assert(ratio == 1000L)
      else assert(ratio == f * 1000 / freqs((rank / 2 - 1).toInt)._2)
    }
    // Checkpoints are consecutive doublings from 1 up to ≤ vocab size.
    val ranks = got.map(_._1)
    assert(ranks.head == 1L)
    assert(ranks.zip(ranks.tail).forall { case (a, b) => b == 2 * a })
    assert(ranks.last <= freqs.length && ranks.last * 2 > freqs.length ||
      ranks.last == Audit.ZipfMaxRank)
  }
}
