package graft

import org.apache.spark.sql.functions._

import graft.ext.CodeDetect

/** Code-vs-prose detector: the symbol class counts SYMBOL characters
  * (not prose — the inverted-class regression the round-9 advisor
  * caught), closed-form counts are exact, and real-looking code scores
  * strictly above real-looking prose. */
class CodeDetectSpec extends SparkSpec {
  import spark.implicits._

  private val proseText =
    "The quick brown fox jumps over the lazy dog. " +
      "It was the best of times, it was the worst of times, " +
      "a tale told in plain sentences without any punctuation beyond " +
      "commas and periods, the way prose usually reads."

  private val codeText =
    "def f(xs: List[Int]): Int = {\n" +
      "  val y = xs.filter(_ > 0);\n" +
      "  if (y.isEmpty) { return 0; }\n" +
      "  y.map(x => x * 2).sum\n" +
      "}\n" +
      "# trailing comment <tag>"

  test("closed-form symbol and indent counts") {
    val docs = Seq(
      (1L, "abc"),          // zero symbols
      (2L, "a=b;"),         // two symbols of four chars -> 500 permille
      (3L, "(){}[]<>"),     // all symbols -> 1000 permille
      (4L, "x\n  y\n\tz")   // 2 of 3 lines indented -> 666 permille
    ).toDF("doc_id", "text")
    val m = CodeDetect.codeRatioOf(docs)
      .select("doc_id", "n_code_chars", "code_permille", "indent_permille")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(m(1L) == (0L, 0L, 0L))
    assert(m(2L) == (2L, 500L, 0L))
    assert(m(3L) == (8L, 1000L, 0L))
    assert(m(4L)._3 == 666L)
  }

  test("prose scores below code, and only code is flagged") {
    val docs = Seq((1L, proseText), (2L, codeText)).toDF("doc_id", "text")
    val m = CodeDetect.codeRatioOf(docs)
      .select(col("doc_id"), col("code_permille"),
        col("looks_like_code").cast("boolean"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (prosePm, proseFlag) = m(1L)
    val (codePm, codeFlag) = m(2L)
    assert(prosePm < codePm,
      s"prose permille $prosePm must be below code permille $codePm")
    assert(!proseFlag, "plain prose must not be flagged as code")
    assert(codeFlag, "symbol-dense code must be flagged")
  }

  test("fixture: permilles bounded and flag consistent with thresholds") {
    val a = CodeDetect.codeRatio(spark, sf).localCheckpoint()
    assert(a.count() > 0)
    val bad = a.filter(
      col("code_permille") < 0 || col("code_permille") > 1000 ||
        col("indent_permille") < 0 || col("indent_permille") > 1000 ||
        (col("looks_like_code") =!=
          (col("code_permille") > 30 || col("indent_permille") > 200)))
      .count()
    assert(bad == 0)
  }
}
