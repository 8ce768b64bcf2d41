package graft

import org.apache.spark.sql.functions._

import graft.ext.Redaction

/** Detector-boundary tests for the PII scrubbing chain: true positives
  * are replaced whole, near-misses survive untouched. */
class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String = {
    val df = Seq((1L, s)).toDF("doc_id", "text")
      .select(regexp_replace(regexp_replace(regexp_replace(col("text"),
        Redaction.EmailRe, "<EMAIL>"),
        Redaction.PhoneRe, "<PHONE>"),
        Redaction.Ipv4Re, "<IP>").as("r"))
    df.as[String].head()
  }

  test("true positives: each class replaced whole, mixed text intact") {
    assert(redactOne("mail a.b+c@sub.ex.org now") == "mail <EMAIL> now")
    assert(redactOne("call 415-555-0134 today") == "call <PHONE> today")
    assert(redactOne("from 192.168.0.1 port") == "from <IP> port")
    assert(redactOne("x a@b.co y 555-123-4567 z 10.0.0.255 w")
      == "x <EMAIL> y <PHONE> z <IP> w")
  }

  test("near-misses survive: no TLD, short phone, non-boundary IP") {
    assert(redactOne("not-an-email a@b c") == "not-an-email a@b c")
    assert(redactOne("short 55-555-0134 x") == "short 55-555-0134 x")
    // 5-part dotted number: the IP regex still finds a 4-part \b-bounded
    // prefix — document the greedy-prefix behavior instead of denying it.
    assert(redactOne("v 1.2.3.4.5 w") != "v 1.2.3.4.5 w")
  }

  test("gated frame: plants land where doc_id says; clean docs clean") {
    val per = Redaction.piiRedact(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    for ((id, (e, p, ip)) <- per) {
      assert((e > 0) == (id % 3 == 0), s"email plant doc $id")
      assert((p > 0) == (id % 5 == 0), s"phone plant doc $id")
      assert((ip > 0) == (id % 7 == 0), s"ip plant doc $id")
      // exactly one plant per firing class on this corpus (prose has none)
      assert(e <= 1 && p <= 1 && ip <= 1, s"spurious match doc $id")
    }
    val summary = Redaction.piiSummary(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary("email")._2 == per.values.map(_._1).sum)
    assert(summary("phone")._2 == per.values.map(_._2).sum)
    assert(summary("ipv4")._2 == per.values.map(_._3).sum)
  }

  test("k-anonymity: classes partition the table; flags match their k/l") {
    import org.apache.spark.sql.functions._
    val rows = ext.Redaction.kAnonymity(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("k")).sum == total,
      "equivalence classes must partition the customers")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") ==
        (r.getAs[Long]("k") < ext.Redaction.KAnon))
      assert(r.getAs[Boolean]("attr_leak") ==
        (r.getAs[Long]("l_diversity") == 1L))
      assert(r.getAs[Long]("l_diversity") >= 1L &&
        r.getAs[Long]("l_diversity") <= 2L)
    }
    // The fixture populates both risk arms at this SF (tiny classes
    // exist among 125 nation x segment cells over 150 customers).
    assert(rows.exists(_.getAs[Boolean]("at_risk")))
  }
}
