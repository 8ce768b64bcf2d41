package graft.ext
// (lives in the tools dir; declared in ext for private[ext] seam access)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Triage instrument (r18): stage-level timing of the bounded-dedup
  * retrieval pipeline, to attribute the sf30 cost of
  * dedup_jaccard_topk / dedup_*_capped before restructuring. Not part
  * of the driver contract. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_scaled/sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.apply)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    
    import graft.functions.GraftFunctions.{minhashSig, sigMatchCount,
      topKSmallest}

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = t("shingled+checkpoint") {
      Dedup.shingled(spark, sfDir).filter(size(col("sh")) > 0)
        .localCheckpoint()
    }
    t("sh count")(println("  rows=" + sh.count()))
    val prefix = Dedup.prefixTokensOf(sh, Dedup.PrefixTauPermille)
      .localCheckpoint()
    t("prefixTokens ckpt")(println("  rows=" + prefix.count()))
    val capped = t("capped posting build") {
      prefix.groupBy(col("h"))
        .agg(topKSmallest(struct(
          Hashing.idHash(col("doc_id")).as("ih"), col("doc_id")),
          Dedup.BucketCap).as("ds"))
        .select(col("h"), explode(col("ds")).as("d"))
        .select(col("h"), col("d.doc_id").as("doc_id"))
        .localCheckpoint()
    }
    println("  capped rows=" + capped.count())
    val p0 = t("self-join + distinct") {
      capped.as("x").join(capped.as("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .localCheckpoint()
    }
    println("  p0 rows=" + p0.count())
    val cands = p0.unionAll(
      p0.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val meta = sh.select(col("doc_id"),
      size(col("sh")).cast("long").as("n"), minhashSig(col("sh")).as("sig"))
    val shortlist = t("meta joins + shortlist") {
      cands
        .join(meta.select(col("doc_id").as("doc_b"), col("sig").as("sigb")),
          "doc_b")
        .join(meta.select(col("doc_id").as("doc_a"), col("sig").as("siga")),
          "doc_a")
        .withColumn("m", sigMatchCount(col("siga"), col("sigb")))
        .groupBy(col("doc_a"))
        .agg(topKSmallest(struct((-col("m")).as("nm"), col("doc_b")),
          DedupBounded.ShortlistC).as("cs"))
        .select(col("doc_a"), explode(col("cs")).as("c"))
        .select(col("doc_a"), col("c.doc_b").as("doc_b"))
        .localCheckpoint()
    }
    println("  shortlist rows=" + shortlist.count())
    t("verify joins + report") {
      import graft.functions.GraftFunctions.sortedIntersectSize
      val inter = sortedIntersectSize(col("sha"), col("shb"))
      val ver = shortlist
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")),
          "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"), inter.as("inter"),
          (size(col("sha")).cast("long") + size(col("shb")).cast("long")
            - inter).as("uni"))
        .filter(col("inter") * 1000L >=
          lit(Dedup.PrefixTauPermille) * col("uni"))
      println("  verified rows=" + ver.count())
    }
    spark.stop()
  }
}
