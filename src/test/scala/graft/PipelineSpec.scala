package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, Packing, Pipeline, TextAnalysis, Tokenize}

/** The end-to-end ship gate must be exactly the composition of its
  * already-verified stages — admission is the set algebra of the four
  * predicates, the manifest packs exactly the admitted docs, and the
  * summary reconciles with the manifest. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).as[Long].collect().toSet

  test("admission == quality ∩ keepers ∩ train \\ (eval ∪ contaminated)") {
    val qual = ids(TextAnalysis.textQuality(spark, sf)
      .filter(col("quality_score") >= 0.5))
    val keep = ids(Dedup.fingerprintDedup(spark, sf)
      .select(col("keeper").as("doc_id")))
    val (evalIds, overlap) = Curation.decontamParts(spark, sf)
    val excluded = ids(evalIds) ++
      ids(overlap.filter(col("contaminated") === 1L))
    val train = ids(Tables.documents(spark, sf).select(col("doc_id"))
      .filter(graft.functions.GraftFunctions.polyHash(
        concat_ws(":", lit("split"), col("doc_id").cast("string"))) % 100 < 80))
    val want = (qual intersect keep intersect train) diff excluded
    val got = ids(Pipeline.admittedTrainDocs(spark, sf))
    assert(got == want)
    // Non-vacuous in every direction: each predicate removes someone.
    assert(got.nonEmpty)
    assert((train diff qual).nonEmpty, "quality gate never fires")
    // (Keeper-rule bite is proven in DedupSpec — sf0.001 has no exact
    // duplicates, so here the predicate is exercised but removes no one.)
    assert((qual intersect keep).exists(d => !train(d)), "split never fires")
  }

  test("manifest packs exactly the admitted docs at their capped token counts") {
    val m = Pipeline.trainManifest(spark, sf).collect()
    val admitted = ids(Pipeline.admittedTrainDocs(spark, sf))
    assert(m.map(_.getAs[Long]("doc_id")).toSet == admitted)
    assert(m.length == admitted.size) // one pack row per doc (atomic mode)
    val tok = Tokenize.corpusTokenize(spark, sf)
      .select(col("doc_id"), col("n_tokens")).as[(Long, Long)].collect().toMap
    m.foreach { r =>
      val want = math.min(tok(r.getAs[Long]("doc_id")), Packing.Budget)
      assert(r.getAs[Long]("n_tok") == want)
    }
    // Pack invariants carry over: offsets within budget, packs dense.
    m.groupBy(_.getAs[Long]("pack_id")).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("n_tok")).sum <= Packing.Budget)
    }
  }

  test("summary reconciles with the manifest") {
    val m = Pipeline.trainManifest(spark, sf).collect()
    val s = Pipeline.trainSummary(spark, sf).collect().head
    assert(s.getAs[Long]("n_docs") == m.length)
    val packs = m.map(_.getAs[Long]("pack_id")).distinct.length
    assert(s.getAs[Long]("n_packs") == packs)
    val mass = m.map(_.getAs[Long]("n_tok")).sum
    assert(s.getAs[Long]("n_tokens") == mass)
    assert(s.getAs[Long]("fill_bp") == mass * 10000 / (packs * Packing.Budget))
    assert(s.getAs[Long]("fill_bp") <= 10000)
  }

  test("funnel: monotone attrition ending exactly at the shipped set") {
    val f = Pipeline.curationFunnel(spark, sf)
      .orderBy("stage_ord").collect()
    assert(f.map(_.getAs[String]("stage")).toSeq == Seq(
      "raw", "train_split", "quality", "dedup_keeper", "not_eval",
      "shipped"))
    val counts = f.map(_.getAs[Long]("n_docs")).toSeq
    // Each cumulative stage can only lose documents…
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: $counts")
    // …every stage actually bites on this corpus…
    assert(counts.distinct.length >= 4, s"funnel stages vacuous: $counts")
    // …and the funnel's mouth is exactly the manifest's doc set.
    val shipped = Pipeline.trainManifest(spark, sf).count()
    assert(counts.last == shipped,
      s"funnel tail ${counts.last} != manifest docs $shipped")
  }
}
