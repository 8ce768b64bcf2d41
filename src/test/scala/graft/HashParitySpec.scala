package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.ext.Hashing
import graft.functions.{GraftFunctions, HashKernels}

/** The native kernels (graft.functions) are performance twins of the
  * original higher-order-function columns; these specs pin the parity on
  * (a) the real corpus and (b) generated strings, so a kernel change can
  * never silently diverge from the DuckDB-oracle hash family. */
class HashParitySpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("polyHash kernel == HOF char fold on the corpus") {
    val n = docs
      .select(Hashing.stringHash(col("text")).as("a"),
        Hashing.stringHashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("charTrigramHashes kernel == positional substring+fold on the corpus") {
    val hof = when(length(col("text")) >= 3,
      expr("transform(sequence(1, length(text) - 2), i -> " +
        "((ascii(substring(text, i, 1)) * 31 + ascii(substring(text, i + 1, 1))) * 31" +
        " + ascii(substring(text, i + 2, 1))) % 2147483647L)"))
      .otherwise(array().cast("array<bigint>"))
    val n = docs
      .select(graft.functions.GraftFunctions.charTrigramHashes(col("text")).as("a"),
        hof.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(n == 0)
  }

  test("wordHashes kernel == HOF split+fold on the corpus") {
    val n = docs
      .select(Hashing.wordHashes(col("text")).as("a"),
        Hashing.wordHashesHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("shingleHashes kernel == HOF as sets on the corpus") {
    val n = docs
      .select(
        Hashing.shingleHashes(Hashing.wordHashes(col("text")), 3).as("a"),
        array_sort(Hashing.shingleHashesHof(Hashing.wordHashesHof(col("text")), 3))
          .as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("minhashSig kernel == explode+groupBy+min on the corpus") {
    import graft.ext.Hashing.{NumPerms, P, permA, permB}
    val sh = docs.select(col("doc_id"),
      Hashing.shingleHashes(Hashing.wordHashes(col("text")), 3).as("sh"))
    val aggs = (0 until NumPerms).map(i =>
      min((lit(permA(i)) * col("h") + lit(permB(i))) % P).as(s"s$i"))
    val viaAgg = sh.select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumPerms).map(i => col(s"s$i")): _*).as("sig"))
    val viaKernel = sh.filter(size(col("sh")) > 0)
      .select(col("doc_id"), GraftFunctions.minhashSig(col("sh")).as("sig"))
    assert(viaKernel.join(viaAgg, "doc_id")
      .filter(viaKernel("sig") =!= viaAgg("sig")).count() == 0)
    assert(viaKernel.count() == viaAgg.count())
  }

  test("simhash kernel == HOF bit-count fold on the corpus") {
    val hof = expr(
      """aggregate(
        |  transform(sequence(0, 30), i ->
        |    CASE WHEN aggregate(whs, CAST(0 AS BIGINT),
        |                        (acc, w) -> acc + ((shiftright(w, i) & 1) * 2 - 1)) > 0
        |         THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END),
        |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
    val n = docs.select(Hashing.wordHashes(col("text")).as("whs"))
      .select(GraftFunctions.simhash(col("whs")).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("dotLong / sortedIntersectSize == array HOF equivalents") {
    import spark.implicits._
    val pairs = Seq(
      (Array(1L, 2L, 3L), Array(1L, 3L, 5L)),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(-4L, 0L, 9L), Array(-4L, 0L, 9L))).toDF("a", "b")
    val checked = pairs.select(
      GraftFunctions.sortedIntersectSize(col("a"), col("b")).as("i"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ihof"),
      GraftFunctions.dotLong(col("a"), col("b")).as("d"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L),
        (acc, x) => acc + x).as("dhof"))
    assert(checked.filter(col("i") =!= col("ihof") || col("d") =!= col("dhof"))
      .count() == 0)
  }

  test("wordHashes property: kernel == JVM reference on ASCII-ish strings") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaChar, Gen.oneOf(' ', '.', ',', '!', '0', '9', '\n', '\t')))
      .map(_.mkString)
    for (_ <- 1 to 300) {
      val s = gen.sample.getOrElse("")
      val ref = s.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .map(_.foldLeft(0L)((acc, ch) => (acc * 31 + ch) % HashKernels.P))
      val got = HashKernels
        .wordHashes(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toLongArray()
      assert(got.toSeq == ref.toSeq, s"input: '$s'")
    }
  }

  test("charCounts kernel == regexp_extract_all+groupBy formulation") {
    // The per-character regex path this kernel replaced (round 14):
    // the count MULTISET must match exactly — on the corpus and on
    // adversarial strings (unicode incl. an astral code point, empty,
    // single char, all-same) — since entropy/Simpson are functions of
    // the sorted count vector alone.
    val kern = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.charCounts(col("text")).as("kc"))
    val ref = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("[\\s\\S]"), lit(0)))
          .as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("cnt"))).as("rc"))
    val joined = kern.join(ref, Seq("doc_id"))
    assert(joined.count() == docs.count())
    assert(joined.filter(not(col("kc") === col("rc"))).count() == 0)
    for (s <- Seq("", "a", "aaaa", "héllo wörld", "a\nb\tc a",
        "😀x😀", "  ", "ab" * 500)) {
      val got = HashKernels
        .charCounts(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toLongArray().toSeq
      val ref = s.codePoints().toArray.groupBy(identity).values
        .map(_.length.toLong).toSeq.sorted
      assert(got == ref, s"input: '$s'")
    }
  }

  test("phraseRuns kernel == window-island formulation on the corpus") {
    import org.apache.spark.sql.expressions.Window
    val stops = graft.ext.TextAnalysis.stopwords.toMap.apply("en")
    val stopsArr = array(stops.map(lit): _*)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // The pre-kernel RAKE formulation: token explode, island ids at
    // stopword breaks, per-island position-ordered reconstruction,
    // then document-ordered phrase arrays keyed by island start.
    val ref = docs
      .select(col("doc_id"), posexplode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as(Seq("pos", "word")))
      .withColumn("is_stop", array_contains(stopsArr, col("word")))
      .withColumn("phrase_id",
        sum(when(col("is_stop"), 1L).otherwise(0L))
          .over(byDoc.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .filter(!col("is_stop"))
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(array_join(expr("transform(sort_array(collect_list(" +
        "struct(pos, word))), s -> s.word)"), " ").as("phrase"),
        min(col("pos")).as("start"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(sort_array(collect_list(struct(start, phrase)))," +
        " s -> s.phrase)").as("b"))
    val joined = docs
      .select(col("doc_id"),
        GraftFunctions.phraseRuns(col("text"), stops).as("a"))
      .join(ref, Seq("doc_id"), "left")
      .withColumn("b", coalesce(col("b"), array().cast("array<string>")))
    assert(joined.count() == docs.count())
    assert(joined.filter(not(col("a") <=> col("b"))).count() == 0)
  }

  test("phraseRuns property: kernel == JVM reference on ASCII-ish strings") {
    val stops = Set("the", "of", "a", "and")
    val stopSet = new java.util.HashSet[String]()
    stops.foreach(stopSet.add)
    val gen = Gen.listOf(Gen.oneOf(
      Gen.oneOf("the", "of", "a", "and", "cat", "sat", "mat", "And", "THE"),
      Gen.oneOf(" ", ".", ", ", "7", "\n", "-")))
      .map(_.mkString(" "))
    for (_ <- 1 to 300) {
      val s = gen.sample.getOrElse("")
      val words = s.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val ref = scala.collection.mutable.ArrayBuffer.empty[String]
      val run = scala.collection.mutable.ArrayBuffer.empty[String]
      for (w <- words) {
        if (stops(w)) { if (run.nonEmpty) { ref += run.mkString(" "); run.clear() } }
        else run += w
      }
      if (run.nonEmpty) ref += run.mkString(" ")
      val got = HashKernels.phraseRuns(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), stopSet)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == ref.toSeq, s"input: '$s'")
    }
  }

  test("hyperplaneBuckets matches a direct reimplementation") {
    val qv = Array.tabulate(64)(d => ((d * 37) % 101 - 50).toLong)
    val got = HashKernels.hyperplaneBuckets(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(qv), 4, 8).toLongArray()
    val want = (0 until 4).map { t =>
      (0 until 8).foldLeft(0L) { (acc, b) =>
        val j = t * 8 + b
        val dot = (0 until 64).map(d =>
          qv(d) * (((j * 2654435761L + d * 40503L) % 2047) - 1023)).sum
        if (dot > 0) acc | (1L << b) else acc
      }
    }
    assert(got.toSeq == want)
  }
}
