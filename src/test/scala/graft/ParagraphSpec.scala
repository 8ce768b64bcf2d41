package graft

import org.apache.spark.sql.functions._

import graft.ext.Paragraph

/** Paragraph (fixed-width block) keep-first dedup: block decomposition,
  * CCNet keep-first semantics, retention accounting, and
  * partition-invariance of the winner. */
class ParagraphSpec extends SparkSpec {
  import spark.implicits._

  private val blockSentence =
    (1 to Paragraph.W).map(i => s"word$i").mkString(" ")

  test("a duplicated block is kept exactly once, at its first occurrence") {
    // Doc 1 holds the block at blk 0; doc 2 repeats it at its second
    // block (after a full block of other words); doc 3 is unrelated.
    val filler = (1 to Paragraph.W).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (1L, blockSentence + " " + filler),
      (2L, filler + " " + blockSentence),
      (3L, (1 to Paragraph.W).map(i => s"unique$i").mkString(" "))
    ).toDF("doc_id", "text")

    val blks = Paragraph.blocksOf(docs)
    // 2 blocks in docs 1 and 2, 1 in doc 3.
    assert(blks.count() == 5)

    val firsts = blks.groupBy("h").agg(min("pos").as("fp"))
    val kept = blks.join(firsts, Seq("h"))
      .filter(col("pos") === col("fp"))
      .select("doc_id", "blk").as[(Long, Long)].collect().toSet
    // The shared sentence block survives only as (1, 0); the shared
    // filler block survives only at its first holding, (1, 1).
    assert(kept == Set((1L, 0L), (1L, 1L), (3L, 0L)))
  }

  test("trailing partial blocks are hashed, not dropped") {
    val docs = Seq(
      (1L, blockSentence + " tail words here"),
      (2L, "tail words here")
    ).toDF("doc_id", "text")
    val blks = Paragraph.blocksOf(docs)
    assert(blks.filter(col("doc_id") === 1L).count() == 2)
    // Identical partial-tail CONTENT at the same offset-within-block
    // hashes equal across docs: doc 1's tail block == doc 2's only block.
    val h1 = blks.filter(col("doc_id") === 1L && col("blk") === 1L)
      .select("h").as[Long].head()
    val h2 = blks.filter(col("doc_id") === 2L).select("h").as[Long].head()
    assert(h1 == h2)
  }

  test("retention accounting: duplicated doc retains 0 permille") {
    val docs = Seq(
      (1L, blockSentence),
      (2L, blockSentence) // full duplicate, later doc_id -> all dropped
    ).toDF("doc_id", "text")
    val blks = Paragraph.blocksOf(docs).localCheckpoint()
    val firsts = blks.groupBy("h").agg(min("pos").as("fp"))
    val ret = blks.join(firsts, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("pos") === col("fp"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("doc_id"), expr("n_kept * 1000 div n_blocks").as("pm"))
      .as[(Long, Long)].collect().toMap
    assert(ret(1L) == 1000L && ret(2L) == 0L)
  }

  test("fixture: duplicated-block winners are partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val a = Paragraph.blocksOf(docs)
      .groupBy("h").agg(count(lit(1)).as("n"), min("pos").as("fp"))
      .filter(col("n") >= 2)
    val b = Paragraph.blocksOf(docs.repartition(7))
      .groupBy("h").agg(count(lit(1)).as("n"), min("pos").as("fp"))
      .filter(col("n") >= 2)
    assert(a.count() > 0, "fixture must contain organic duplicated blocks")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("block volume is ~1/W of word volume (the exchange-size win)") {
    val docs = Tables.documents(spark, sf)
    val words = docs.select(
      size(graft.ext.Hashing.wordHashes(col("text"))).as("n"))
      .agg(sum("n")).as[Long].head()
    val blocks = Paragraph.blocksOf(docs).count()
    assert(blocks <= words / Paragraph.W + docs.count())
  }
}
