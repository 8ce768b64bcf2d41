package graft

import org.apache.spark.sql.functions._

import graft.ext.{Audio, CodeDetect}

/** Windowed audio energy + code-detection invariants. */
class AudioEnergySpec extends SparkSpec {

  test("audio energy: window accounting and voiced bounds hold") {
    val out = Audio.audioEnergy(spark, sf)
    assert(out.count() > 0)
    // A voiced window needs energy strictly above the mean, so not ALL
    // windows can be voiced (and never more than n_windows - 1).
    val bad = out.filter(col("n_windows") > 0 &&
      col("n_voiced") >= col("n_windows"))
    assert(bad.count() == 0)
    // first_voiced is 0 iff n_voiced is 0, else within [1, n_windows].
    assert(out.filter((col("n_voiced") === 0) =!=
      (col("first_voiced") === 0)).count() == 0)
    assert(out.filter(col("first_voiced") > col("n_windows")).count() == 0)
    // max window energy can't exceed the total.
    assert(out.filter(col("max_window_energy") > col("total_energy"))
      .count() == 0)
  }

  test("audio energy: synthetic silence-then-tone clip localizes the tone") {
    // Direct kernel check through the codec: 16 silent frames then 16
    // loud frames, mono — exactly window 2 is voiced.
    val pcm = (Array.fill(16)(0) ++ Array.fill(16)(1000)).map(_.toShort)
    val wav = Audio.WavCodec.decode(Audio.WavCodec.encode(8000, 1, pcm)).get
    val nw = wav.samples.length / Audio.EnergyWindowFrames
    val wes = Array.tabulate(nw) { w =>
      (w * Audio.EnergyWindowFrames until (w + 1) * Audio.EnergyWindowFrames)
        .map(i => wav.samples(i).toLong * wav.samples(i)).sum
    }
    val total = wes.sum
    val voiced = wes.map(e => e * nw > total)
    assert(voiced.toSeq == Seq(false, true))
  }

  test("code ratio: permilles and flag agree with per-row recompute") {
    val rows = CodeDetect.codeRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val nChars = r.getAs[Long]("n_chars")
      val nCode = r.getAs[Long]("n_code_chars")
      val nLines = r.getAs[Long]("n_lines")
      val nInd = r.getAs[Long]("n_indented")
      assert(r.getAs[Long]("code_permille") == nCode * 1000 / nChars)
      assert(r.getAs[Long]("indent_permille") == nInd * 1000 / nLines)
      assert(r.getAs[Boolean]("looks_like_code") ==
        (nCode * 1000 / nChars > 30 || nInd * 1000 / nLines > 200))
    }
  }

  test("code ratio: a planted code snippet trips the flag") {
    import spark.implicits._
    val code = Seq((1L,
      "def f(x):\n  if (x == 0):\n    return [1, 2];\n  return {x: f(x-1)};"))
      .toDF("doc_id", "text")
    val symbols = code.select(
      (length(col("text")) - length(regexp_replace(col("text"),
        """[^\[\]{}();=<>#_]""", ""))).cast("long")).collect()(0).getLong(0)
    val chars = code.select(length(col("text")).cast("long"))
      .collect()(0).getLong(0)
    assert(symbols * 1000 / chars > 30, "planted snippet must exceed the dial")
  }
}
