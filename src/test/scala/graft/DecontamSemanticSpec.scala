package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Similarity => Sim}

/** Semantic decontamination: threshold exactness against a local
  * cosine reference and probe-exclusion bookkeeping. */
class DecontamSemanticSpec extends SparkSpec {
  import spark.implicits._

  test("flags agree with a local exact cosine-threshold reference") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 10000).cast("long")).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    // same idHash order as the operator (P = 2^31 - 1)
    val P = 2147483647L
    val hashed = vecs.keys.toSeq
      .sortBy(id => (((id % P) * 40503L + 12345L) % P, id))
    val probes = hashed.take(Curation.SemEvalN).toSet
    def dot(a: Seq[Long], b: Seq[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x) * y }.sum
    val want = vecs.collect { case (id, q) if !probes.contains(id) =>
      val n = dot(q, q)
      val hits = probes.count { p =>
        val pq = vecs(p)
        val d = dot(q, pq)
        d > 0 && 25 * d * d >= 4 * n * dot(pq, pq)
      }
      id -> hits.toLong
    }
    val got = Curation.decontamSemantic(spark, sf)
      .select("vec_id", "n_probes_hit").as[(Long, Long)].collect().toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (id, h) =>
      assert(got(id) == h, s"vec $id hit count diverges")
    }
  }

  test("probes are excluded from the corpus side") {
    val n = Tables.embeddings(spark, sf).count()
    val out = Curation.decontamSemantic(spark, sf).count()
    assert(out == n - Curation.SemEvalN)
  }
}
