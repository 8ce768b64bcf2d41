package graft

import org.apache.spark.sql.functions._

import graft.ext.{Cdc, Hashing}

/** Pins the content-defined chunking recurrence against an independent
  * from-scratch fold, plus the CDC shift-resilience property fixed-width
  * spans lack: an insertion disturbs only the chunks it touches. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Independent CDC fold in plain Scala: word hashes → gear spans →
    * cuts → (hash, len) chunks. */
  private def refChunks(text: String): Seq[(Long, Long)] = {
    val P = Hashing.P
    val words = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    val whs = words.map(_.foldLeft(0L)((a, c) => (a * 31 + c) % P))
    val n = whs.length
    if (n == 0) return Seq.empty
    val spans = (0 to n - Cdc.GearW).map { i =>
      (i until i + Cdc.GearW).foldLeft(0L)((a, j) =>
        (a * 1000003 + whs(j)) % P)
    }
    val cuts = spans.indices
      .filter(i => spans(i) % Cdc.BoundaryDiv == 0 &&
        i + Cdc.GearW - 1 < n - 1)
      .map(_ + Cdc.GearW - 1)
    val starts = 0 +: cuts.map(_ + 1)
    val ends = cuts :+ (n - 1)
    starts.zip(ends).map { case (s, e) =>
      ((s to e).foldLeft(0L)((a, j) => (a * 1000003 + whs(j)) % P),
        (e - s + 1).toLong)
    }
  }

  private def sparkChunks(texts: Seq[String]): Map[Long, Seq[(Long, Long)]] =
    Cdc.chunkInstances(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_hash", "chunk_words")
      .as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap

  test("chunk instances match the independent fold on corpus docs") {
    val texts = Tables.documents(spark, sf).select("text")
      .limit(24).as[String].collect().toSeq
    val got = sparkChunks(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Seq.empty) == refChunks(t),
        s"doc $i chunking diverged")
    }
    // Chunks partition the words: lengths sum to the word count.
    texts.zipWithIndex.foreach { case (t, i) =>
      val nWords = t.toLowerCase.split("[^a-z]+").count(_.nonEmpty)
      assert(got.getOrElse(i.toLong, Seq.empty).map(_._2).sum == nWords)
    }
  }

  /** Letter-only base-26 rendering — digits would split into a
    * two-word vocabulary and starve the boundary condition. */
  private def alpha(x: Long): String = {
    var v = x; val sb = new StringBuilder
    while ({ sb.append(('a' + (v % 26)).toChar); v /= 26; v > 0 }) ()
    sb.toString
  }

  test("insertion shifts only local chunks (the CDC property)") {
    // A long synthetic doc; insert a word mid-document. Fixed-width
    // spans would shift everywhere; CDC must preserve every chunk
    // whose words lie beyond the edit's gear window.
    val words = (1 to 400).map(i => "w" + alpha(i * 48271L % 10007))
    val base = words.mkString(" ")
    val edited = (words.take(200) ++ Seq("inserted") ++
      words.drop(200)).mkString(" ")
    val a = refChunks(base)
    val b = refChunks(edited)
    val shared = a.toSet.intersect(b.toSet)
    // The tail far from the edit re-synchronizes: the LAST chunks agree.
    assert(a.takeRight(3) == b.takeRight(3),
      s"tail chunks must re-synchronize\n$a\n$b")
    assert(shared.nonEmpty)
    // And the Spark path agrees with the fold on both variants.
    val got = sparkChunks(Seq(base, edited))
    assert(got(0L) == a && got(1L) == b)
  }

  test("degenerate docs: empty, one word, all separators") {
    val got = sparkChunks(Seq("", "hello", "?!... 123"))
    assert(!got.contains(0L), "empty doc emits no chunks")
    assert(got(1L) == refChunks("hello") && got(1L).length == 1)
    assert(!got.contains(2L), "separator-only doc emits no chunks")
  }

  test("coverage: planted duplicate paragraph is detected cross-doc") {
    val common = (1 to 60).map(i => "c" + alpha(i * 7919L)).mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $common gamma delta epsilon zeta"),
      (2L, s"one two three four $common five six seven eight"),
      (3L, "totally unrelated text with nothing shared here at all"))
      .toDF("doc_id", "text")
    val inst = Cdc.chunkInstances(docs)
    val dup = inst.groupBy("chunk_hash", "chunk_words")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") >= 2)
    assert(dup.count() > 0, "shared paragraph must yield shared chunks")
    // Doc 3 shares nothing: all its chunks are unique.
    val d3 = inst.filter(col("doc_id") === 3L)
      .join(dup.select("chunk_hash", "chunk_words"),
        Seq("chunk_hash", "chunk_words"))
    assert(d3.count() == 0)
  }
}
