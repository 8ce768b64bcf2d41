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
}
