package graft

import org.apache.spark.sql.functions._

import graft.ext.{Hashing, Similarity}

/** Pins the greedy MMR rerank trajectory against an independent
  * from-scratch fold over the same quantized vectors. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private val P = Hashing.P

  test("gated MMR equals the independent greedy fold at sf0.001") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 10000).cast("long")).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      dot(va, vb).toDouble /
        math.sqrt(dot(va, va).toDouble * dot(vb, vb).toDouble)
    }
    val queries = vecs.keySet.toSeq
      .sortBy(id => (((id % P) * 40503 + 12345) % P, id)).take(32)
    val want = queries.flatMap { qid =>
      val cand = (vecs.keySet - qid).toSeq
        .map(c => (c, cos(qid, c)))
        .sortBy { case (c, s) => (-s, c) }.take(8)
      var selected = Vector(cand.head._1)
      var rows = Vector((qid, cand.head._1, cand.head._2,
        cand.head._2 * 0.5, 1L))
      for (r <- 2 to 4) {
        val rem = cand.filterNot { case (c, _) => selected.contains(c) }
        val scored = rem.map { case (c, s) =>
          val maxsim = selected.map(cos(c, _)).max
          (c, s, (s - maxsim) * 0.5)
        }
        val pick = scored.minBy { case (c, _, sc) => (-sc, c) }
        selected :+= pick._1
        rows :+= ((qid, pick._1, pick._2, pick._3, r.toLong))
      }
      rows
    }.toSet
    val got = Similarity.knnMmrRerank(spark, sf)
      .as[(Long, Long, Double, Double, Long)].collect().toSet
    assert(got == want, {
      val extra = got -- want; val miss = want -- got
      s"extra=${extra.take(4)} missing=${miss.take(4)}"
    })
  }

  test("MMR genuinely diversifies: some query deviates from plain top-4") {
    val mmr = Similarity.knnMmrRerank(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val top4 = Similarity.cosinePairs(spark, sf, 32)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_a"))
          .orderBy(col("cos").desc, col("vec_b"))))
      .filter(col("rk") <= 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(mmr != top4,
      "the redundancy penalty should change at least one selection")
    // And per query the sets are the same SIZE (4 each).
    assert(mmr.groupBy(_._1).forall(_._2.size == 4))
  }
}
