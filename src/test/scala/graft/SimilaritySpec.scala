package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side ground truth: the same round(x*1e4) Long quantization
    * the queries use, collected per sfDir. */
  private def quantizedVecs(sfDir: String): Map[Long, Array[Long]] =
    Tables.embeddings(spark, sfDir)
      .as[(Long, Array[Float], Int)].collect()
      .map { case (id, emb, _) =>
        id -> emb.map(x => math.round(x.toDouble * 10000))
      }.toMap

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
    dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  private def exactTop3For(vecs: Map[Long, Array[Long]],
      queries: Iterable[Long]): Map[Long, Seq[Long]] =
    queries.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(3).map(_._1)
    }.toMap

  test("knn brute force: top-3 per query, correctly ranked") {
    val rows = Similarity.knnBruteForce(spark, sf)
      .select($"vec_a", $"vec_b", $"cos", $"rank")
      .as[(Long, Long, Double, Long)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.nonEmpty)
    for ((q, ns) <- byQuery) {
      assert(ns.length == 3, s"query $q")
      assert(ns.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L))
      val ordered = ns.sortBy(_._4).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"descending cos for $q")
      assert(ns.forall(n => n._2 != q), "self excluded")
      assert(ns.forall(n => n._3 >= -1.0 && n._3 <= 1.0))
    }
  }

  test("knn brute force matches a driver-side exact computation") {
    val vecs = quantizedVecs(sf)
    val got = Similarity.knnBruteForce(spark, sf)
      .select($"vec_a", $"vec_b", $"rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // Same fixed-size hash-ordered query sample the query uses.
    def idHash(id: Long): Long = ((id % 2147483647L) * 40503L + 12345L) % 2147483647L
    val queries = vecs.keys.toSeq.sortBy(id => (idHash(id), id)).take(32)
    assert(got == exactTop3For(vecs, queries))
  }

  /** The approximate indexes must actually FIND near neighbors, not
    * just agree with the oracle SQL on whatever they return: average
    * top-3 recall vs the exact answer, over all `% 50` sample queries
    * at sf0.01 (500 vectors). Thresholds are loose on purpose — they
    * catch a broken bucket join (recall ≈ 0), not tuning drift. */
  test("ANN recall vs exact ground truth stays honest (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val vecs = quantizedVecs(sf01)
    val exact = exactTop3For(vecs, vecs.keys.filter(_ % 50 == 0))
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"vec_a", $"vec_b")
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val perQuery = exact.toSeq.map { case (q, want) =>
        got.get(q).map(g => want.count(g.contains).toDouble / want.size)
          .getOrElse(0.0)
      }
      perQuery.sum / perQuery.size
    }
    val gated = recallOf(Similarity.knnLsh(spark, sf01))
    val dense = recallOf(Similarity.knnLshDense(spark, sf01))
    val ivf = recallOf(Similarity.knnIvf(spark, sf01))
    info(f"LSH recall gated(4x8)=$gated%.2f dense(8x4)=$dense%.2f ivf=$ivf%.2f")
    // The dense config is the GATED deployable-quality setting: its
    // recall floor is a shipped claim (>= 0.5), not a broken-join guard.
    assert(dense >= 0.5, s"gated dense LSH recall below the shipped floor: $dense")
    assert(dense > gated,
      "fewer bits + more tables must trade candidates for recall")
    assert(ivf >= 0.2, s"IVF recall collapsed: $ivf")
  }

  test("gated recall audit reports consistent integer recall") {
    val rows = Similarity.knnRecallAudit(spark, sf)
      .select($"method", $"n_queries", $"n_exact", $"n_hits", $"recall_bp")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet ==
      Set("lsh", "lsh_dense", "lsh_adaptive", "ivf", "ivf_incr", "ivfpq"),
      "one row per method")
    rows.foreach { case (m, nq, ne, nh, bp) =>
      assert(nq > 0 && nq <= 32 && ne <= 3 * nq, s"$m: bad totals ($nq, $ne)")
      assert(nh >= 0 && nh <= ne, s"$m: hits out of range")
      assert(bp == (if (ne == 0) 0L else nh * 10000 / ne),
        s"$m: recall_bp must be exactly hits*10000 div exact")
    }
  }

  test("hard negatives: cross-label only, ranked, within IVF candidates") {
    val rows = Similarity.knnHardNegatives(spark, sf).collect()
    assert(rows.nonEmpty, "no hard negatives mined — gate vacuous")
    rows.foreach { r =>
      assert(r.getAs[Int]("label_a") != r.getAs[Int]("label_b"))
      val rk = r.getAs[Long]("rank")
      assert(rk >= 1L && rk <= 3L)
    }
    // Per query: ranks are dense from 1 and cosines descend with rank.
    rows.groupBy(_.getAs[Long]("vec_a")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.size).toSeq)
      val cs = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("gram matrix: equals driver outer-product sum, upper triangle only") {
    val vecs = quantizedVecs(sf)
    val d = vecs.values.head.length
    val expected =
      (for {
        i <- 0 until d; j <- i until d
      } yield (i.toLong, j.toLong) ->
        vecs.values.map(v => v(i) * v(j)).sum).toMap
    val got = Similarity.gramMatrix(spark, sf)
      .select($"dim_i", $"dim_j", $"sum_prod")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == d * (d + 1) / 2, "exactly the upper triangle")
    assert(got == expected)
  }

  test("gram matrix is partition-invariant (exact Long fold)") {
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * 10000).cast("long"))
    val base = Tables.embeddings(spark, sf).select(qv.as("qv"))
    val a = Similarity.gramOf(base.repartition(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Similarity.gramOf(base.repartition(7, col("qv"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("knn LSH returns a subset of each bucket, ranked like brute force") {
    val lsh = Similarity.knnLsh(spark, sf)
      .select($"vec_a", $"vec_b", $"cos", $"rank")
      .as[(Long, Long, Double, Long)].collect()
    // sanity: every LSH hit's cosine equals the exact pair cosine
    // (driver-side recomputation on the quantized vectors)
    val vecs = quantizedVecs(sf)
    assert(lsh.nonEmpty)
    assert(lsh.forall(r => cos(vecs(r._1), vecs(r._2)) == r._3))
  }
}
