package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.engine.Tokenizer

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics oracle: Go strings.FieldsFunc(s, !IsLetter)
    * (`/root/reference/src/mrapps/wc.go:22-35`). */
  private def goTokens(s: String, ascii: Boolean): Seq[String] = {
    val isLetter: Char => Boolean =
      if (ascii) c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      else Character.isLetter
    val out = collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    for (c <- s) {
      if (isLetter(c)) sb.append(c)
      else { if (sb.nonEmpty) { out += sb.toString; sb.clear() } }
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  private def sparkTokens(ss: Seq[String], pattern: String): Seq[String] =
    ss.toDF("text")
      .select(Tokenizer.words($"text", pattern).as("w"))
      .as[String].collect().toSeq

  test("matches Go FieldsFunc on hand cases (ascii)") {
    for (s <- Seq("", "  ", "a", "Hello, world!", "a1b2c3", "--x--",
        "The quick. brown_fox", "don't stop")) {
      assert(sparkTokens(Seq(s), Tokenizer.AsciiPattern) == goTokens(s, ascii = true),
        s"input: '$s'")
    }
  }

  test("matches Go FieldsFunc on hand cases (unicode)") {
    for (s <- Seq("héllo wörld", "日本語 テスト", "aéb 123 ü", "ŁódźÅåß!"))
      assert(sparkTokens(Seq(s), Tokenizer.UnicodePattern) == goTokens(s, ascii = false),
        s"input: '$s'")
  }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.oneOf(' ', '!', '?', '0', '\n', '\t', '\'')))
      .map(_.mkString)

  test("property: concat invariance — wc(a ++ ' ' ++ b) == wc(a) + wc(b)") {
    val seed = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val a = textGen.sample.getOrElse("")
      val b = textGen.sample.getOrElse("")
      val merged = goTokens(a + " " + b, ascii = true)
        .groupBy(identity).view.mapValues(_.size).toMap
      val split = (goTokens(a, ascii = true) ++ goTokens(b, ascii = true))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(merged == split, s"a='$a' b='$b' seed=$seed")
    }
  }

  test("default pattern is the Unicode-faithful one") {
    // The default must match Go's unicode.IsLetter semantics off the
    // ASCII plane (round-10 flip), while staying identical to the ASCII
    // class on ASCII input — the property the oracle gates rely on.
    for (s <- Seq("héllo wörld", "日本語 テスト", "aéb 123 ü"))
      assert(sparkTokens(Seq(s), Tokenizer.UnicodePattern)
        == goTokens(s, ascii = false), s"input: '$s'")
    val ascii = "The quick. brown_fox don't stop"
    assert(ss2default(ascii) == goTokens(ascii, ascii = true))
    assert(ss2default("héllo wörld") == Seq("héllo", "wörld"))
  }

  private def ss2default(s: String): Seq[String] =
    Seq(s).toDF("text").select(Tokenizer.words($"text").as("w"))
      .as[String].collect().toSeq

  test("property: spark word count == sequential Go oracle (generated corpus)") {
    val ss = List.fill(50)(textGen.sample.getOrElse(""))
    val got = ss.toDF("text")
      .select(Tokenizer.words($"text").as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val want = ss.flatMap(goTokens(_, ascii = true))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }
}
