package graft

import org.apache.spark.sql.functions._

import graft.ext.Chunking

/** Pins the chunking algebra: window/overlap/coverage invariants on
  * synthetic docs with adversarial lengths, plus corpus-level laws. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val W = Chunking.Window.toInt
  private val S = Chunking.Stride.toInt

  // Lengths straddling every boundary of the rule: sub-window, exact
  // window, one-past, exact stride multiples, and a long doc.
  private val docs = Seq(1, W - 1, W, W + 1, S, 2 * S, 2 * S + 1,
    W + S, W + S + 1, 7 * S + 13)
    .zipWithIndex
    .map { case (len, i) => (i.toLong, ("ab" * len).take(len)) }
    .toDF("doc_id", "text")

  private lazy val chunks =
    Chunking.chunksOf(docs).select($"doc_id", $"k", $"chunk", $"len").cache()

  test("chunk count: ceil(max(len-W,0)/S) + 1, never a pure-suffix tail") {
    val got = chunks.groupBy($"doc_id").agg(count(lit(1)).as("n"), first($"len").as("len"))
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    for ((len, n) <- got) {
      val kmax = if (len <= W) 0L else (len - W + S - 1) / S
      assert(n == kmax + 1, s"len=$len")
    }
  }

  test("overlap: suffix of chunk k equals prefix of chunk k+1 (W-S chars)") {
    val rows = chunks.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for ((id, cs) <- rows; Seq(a, b) <- cs.sliding(2) if a.length == W) {
      assert(a.takeRight(W - S) == b.take(W - S), s"doc $id")
    }
  }

  test("coverage: stride-prefixes + last chunk reassemble the document") {
    val rows = chunks.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val orig = docs.as[(Long, String)].collect().toMap
    for ((id, cs) <- rows) {
      val rebuilt = cs.init.zipWithIndex.map { case (c, i) =>
        // chunk i contributes text[i*S, (i+1)*S); its in-chunk prefix
        c.take(S)
      }.mkString + cs.last
      assert(rebuilt == orig(id), s"doc $id")
    }
  }

  test("property: invariants hold for arbitrary lengths (scalacheck)") {
    import org.scalacheck.Gen
    val lens = Gen.listOfN(60, Gen.chooseNum(1, 12 * S + 17)).sample.get.distinct
    val df = lens.zipWithIndex
      .map { case (len, i) => (1000L + i, ("xyzq" * (len / 4 + 1)).take(len)) }
      .toDF("doc_id", "text")
    val rows = Chunking.chunksOf(df)
      .select($"doc_id", $"k", $"chunk", $"len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val orig = df.as[(Long, String)].collect().toMap
    for ((id, cs) <- byDoc) {
      val len = cs.head._4
      val kmax = if (len <= W) 0L else (len - W + S - 1) / S
      assert(cs.length == kmax + 1, s"count doc $id len $len")
      // coverage: rebuild exactly
      val rebuilt = cs.init.map(_._3.take(S)).mkString + cs.last._3
      assert(rebuilt == orig(id), s"coverage doc $id len $len")
      // overlap between consecutive full-window chunks
      for (pair <- cs.map(_._3).toSeq.sliding(2) if pair.length == 2 &&
          pair.head.length == W)
        assert(pair.head.takeRight(W - S) == pair(1).take(W - S),
          s"overlap doc $id")
      // all non-last chunks full width
      assert(cs.init.forall(_._3.length == W), s"width doc $id len $len")
    }
  }

  test("gated frames: hash gate and stats gate reconcile on the corpus") {
    val over = Chunking.chunkOverlap(spark, sf).cache()
    val stats = Chunking.chunkStats(spark, sf)
    // stats is exactly the per-doc rollup of the chunk frame
    val re = over.groupBy($"doc_id")
      .agg(count(lit(1)).as("rn"), sum($"chunk_len").as("rc"))
    val mismatch = stats.join(re, Seq("doc_id"))
      .filter($"n_chunks" =!= $"rn" || $"chunked_chars" =!= $"rc")
    assert(mismatch.count() == 0)
    assert(stats.count() == Tables.documents(spark, sf).count())
    // every chunk except possibly the last per doc is exactly W long
    val shortNonLast = over.withColumn("mx",
        max($"chunk_idx").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .filter($"chunk_idx" < $"mx" && $"chunk_len" =!= W.toLong)
    assert(shortNonLast.count() == 0)
  }
}
