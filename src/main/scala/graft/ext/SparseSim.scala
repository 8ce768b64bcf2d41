package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sparse TF-IDF document-similarity join — "Pairwise Document
  * Similarity in Large Collections with MapReduce" (Elsayed, Lin & Oard
  * 2008), the inverted-index formulation: instead of comparing document
  * vectors pairwise (corpus-quadratic, dead at any scale), ship each
  * term's posting list to one reducer and emit PARTIAL dot products
  * w_a·w_b for the documents co-listed under that term; summing partials
  * per (da, db) reconstructs the full dot product exactly. The dense
  * twin of this shape is the embedding ANN family ([[Similarity]]);
  * this is the lexical half every retrieval/dedup stack also needs.
  *
  * Feature vectors: each doc's top-5 TF-IDF terms (the
  * [[TextAnalysis.tfidfTopTerms]] ranking — integer score, total-order
  * tiebreak) with weight `score div 1000` (permille-scaled so partial
  * products stay far inside Long: w ≤ 2·10⁴ ⇒ dot ≤ 5·(2·10⁴)² = 2·10⁹).
  * Weights that floor to 0 are dropped — at extreme corpus sizes a
  * term's idf can underflow the permille scale; production widens the
  * constant.
  *
  * Scale shape, stage by stage: tf agg → df agg → word-keyed join
  * (exactly the tfidf frames, shared discipline) → top-5-per-doc window
  * (bounded rank filter) → posting self-join ON WORD. The self-join's
  * fan-out is Σ_w C(p_w, 2) where p_w is the posting length IN FEATURE
  * SPACE — top-K projection already keeps p_w far below raw df on real
  * vocabularies (a stopword is nobody's most-distinctive term), and a
  * hard per-word cap ([[PostingCap]], rank by weight desc with doc_id
  * tiebreak) bounds the worst case C(cap,2)/word — the mega-basket
  * guard's discipline applied to postings. Norms stay EXACT over the
  * full feature vector (truncation affects only which candidate pairs
  * can form, never a formed pair's score).
  *
  * Cosine = dot / √(na²·nb²) in IEEE doubles on exact-Long inputs — the
  * [[Similarity.cosinePairs]] convention: mult/div/sqrt are correctly
  * rounded, so both engines produce bit-identical doubles.
  *
  * Gate: `doc_similarity_sparse` — all pairs with cosine ≥ 0.8 (243
  * organic pairs at sf0.01: the planted near-dup families surface
  * lexically, cross-validating the MinHash/SimHash dedup verdicts from
  * an independent signal).
  */
object SparseSim {

  private val TopK = 5
  private val PostingCap = 256
  private val Threshold = 0.8

  /** (doc_id, fv, n2): each doc's top-[[TopK]] integer tf-idf feature
    * vector as an array of (word, w) structs, plus its exact squared
    * norm n2 = Σw² — computed array-side on the same row, no per-doc
    * re-aggregation. tf comes from the fused
    * [[graft.functions.HashKernels.wordTfPairs]] kernel (zero shuffle),
    * df is broadcast back, and the top-[[TopK]] selection is the
    * bounded `graft_top_k_smallest` aggregate — the exchange carries
    * [[TopK]] entries per doc, not every scored (doc, word) row. */
  private[graft] def featureVectors(docs: DataFrame): DataFrame = {
    val wtf = docs
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.wordTfPairs(col("text")))
          .as("p"))
      .select(col("doc_id"), col("p.word").as("word"), col("p.tf").as("tf"))
      // two consumers (df agg + score/top-k pass) but NO lineage cut:
      // the tf stage is shuffle-free, so re-running scan+kernel beats
      // materializing the corpus-sized frame (see tfidfTopTerms).
    val df = wtf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    wtf.join(broadcast(df), Seq("word"))
      .withColumn("score", expr("(tf * 1000000L) div df"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.GraftFunctions.topKSmallest(
        struct((-col("score")).as("ns"), col("word")), TopK).as("top"))
      .withColumn("fv", expr(
        "filter(transform(top, s -> struct(s.word AS word," +
          " (-s.ns) div 1000 AS w)), s -> s.w > 0)"))
      .withColumn("n2", expr(
        "aggregate(fv, CAST(0 AS BIGINT), (acc, s) -> acc + s.w * s.w)"))
      .select(col("doc_id"), col("fv"), col("n2"))
  }

  /** (doc_id, word, w): the exploded row form of [[featureVectors]]. */
  private[graft] def featuresOf(docs: DataFrame): DataFrame =
    featureVectors(docs)
      .select(col("doc_id"), explode(col("fv")).as("s"))
      .select(col("doc_id"), col("s.word"), col("s.w"))

  /** All pairs with cosine ≥ [[Threshold]] over the feature vectors. */
  def similarPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // Lineage cut on the per-doc ARRAY frame (one compact row per doc):
    // the norms side and the posting side both read it. The posting
    // rows deliberately do NOT carry n2 — the posting self-join fans
    // out to Σ C(p_w, 2) partial rows, and every byte on them is paid
    // C(cap, 2) times per word; norms join back AFTER the (da, db)
    // aggregation, against the far smaller pairs frame (measured 25%
    // faster at sf10 than riding n2 through the fan-out).
    val fvs = featureVectors(Tables.documents(spark, sfDir))
      .localCheckpoint()
    val norms = fvs.select(col("doc_id"), col("n2"))
    val capped = fvs
      .select(col("doc_id"), explode(col("fv")).as("s"))
      .select(col("doc_id"), col("s.word"), col("s.w"))
      .withColumn("prnk", row_number().over(
        Window.partitionBy(col("word"))
          .orderBy(col("w").desc, col("doc_id"))))
      .filter(col("prnk") <= PostingCap)
      .select(col("doc_id"), col("word"), col("w"))
    val a = capped.select(col("doc_id").as("da"), col("word"),
      col("w").as("wa"))
    val b = capped.select(col("doc_id").as("db"), col("word"),
      col("w").as("wb"))
    val partials = a.join(b, Seq("word"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(sum(col("wa") * col("wb")).as("dot"),
        count(lit(1)).as("n_shared"))
    partials
      .join(norms.select(col("doc_id").as("da"), col("n2").as("na2")), "da")
      .join(norms.select(col("doc_id").as("db"), col("n2").as("nb2")), "db")
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na2").cast("double") * col("nb2").cast("double")))
      .filter(col("cos") >= Threshold)
      .select(col("da"), col("db"), col("n_shared"), col("dot"), col("cos"))
  }

  val similarPairsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word
       |  FROM documents),
       |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT doc_id, word, (tf.tf * 1000000) // df.df AS score
       |  FROM tf JOIN df USING (word)),
       |feats AS (SELECT doc_id, word, score // 1000 AS w
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY score DESC, word) AS rnk FROM scored)
       |  WHERE rnk <= $TopK AND score // 1000 > 0),
       |norms AS (SELECT doc_id, CAST(SUM(w*w) AS BIGINT) AS n2
       |  FROM feats GROUP BY doc_id),
       |capped AS (SELECT doc_id, word, w
       |  FROM (SELECT *, row_number() OVER (PARTITION BY word
       |          ORDER BY w DESC, doc_id) AS prnk FROM feats)
       |  WHERE prnk <= $PostingCap),
       |partials AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db,
       |    CAST(SUM(a.w * b.w) AS BIGINT) AS dot,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM capped a JOIN capped b
       |    ON a.word = b.word AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db, n_shared, dot,
       |  CAST(dot AS DOUBLE) /
       |    sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
       |FROM partials JOIN norms na ON partials.da = na.doc_id
       |              JOIN norms nb ON partials.db = nb.doc_id
       |WHERE CAST(dot AS DOUBLE) /
       |    sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) >= $Threshold""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_similarity_sparse" -> (similarPairs _))

  val oracles: Map[String, String] = Map(
    "doc_similarity_sparse" -> similarPairsSql)
}
