package graft

import graft.ext.Gif

/** GIF87a codec: byte-exact round trips through every LZW regime
  * (width growth 9→12, the KwKwK case, the 4096-entry clear-code
  * reset), container validation, and malformed-input rejection. */
class GifSpec extends SparkSpec {

  private def roundtrip(w: Int, h: Int, pixels: Array[Byte]): Unit = {
    val img = Gif.decode(Gif.encode(w, h, pixels))
      .getOrElse(fail(s"decode failed for ${w}x$h"))
    assert(img.width == w && img.height == h)
    assert(java.util.Arrays.equals(img.pixels, pixels),
      s"pixel mismatch at ${w}x$h")
  }

  test("round trip: constant, ramp, and KwKwK-inducing streams") {
    roundtrip(1, 1, Array(42.toByte))
    roundtrip(8, 4, Array.fill(32)(7.toByte)) // constant = KwKwK chains
    roundtrip(16, 16, Array.tabulate(256)(_.toByte)) // all roots
    // abababab... drives the textbook KwKwK code-equals-next case
    roundtrip(10, 6, Array.tabulate(60)(i => (if (i % 2 == 0) 97 else 98).toByte))
  }

  test("round trip across the 9->10->11->12-bit width growth and clear reset") {
    // A deterministic low-period pseudo-random stream long enough to
    // fill the 4096-entry dictionary several times over: every code
    // width and at least one clear-code reset are exercised.
    var x = 123456789L
    val big = Array.tabulate(64 * 1024) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) & 0xff).toByte
    }
    roundtrip(256, 256, big)
    // Low-entropy long stream: dictionary entries get LONG strings, a
    // different reset trajectory than the random case.
    val lowEntropy = Array.tabulate(64 * 1024)(i => ((i / 97) % 3).toByte)
    roundtrip(256, 256, lowEntropy)
  }

  test("malformed inputs are rejected, not mis-decoded") {
    val good = Gif.encode(4, 4, Array.tabulate(16)(_.toByte))
    assert(Gif.decode(good).isDefined)
    assert(Gif.decode(Array[Byte]()).isEmpty)
    assert(Gif.decode(good.take(10)).isEmpty) // truncated header
    assert(Gif.decode(good.dropRight(1)).isEmpty) // missing trailer
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(Gif.decode(badSig).isEmpty)
    // Truncated LZW payload: chop inside the data sub-blocks.
    assert(Gif.decode(good.take(good.length - 4)).isEmpty)
  }

  test("gated frame matches a direct pixel-sum computation") {
    import spark.implicits._
    val got = Gif.decodeGif(spark, sf)
      .select("doc_id", "sum_idx", "wsum")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2.nonEmpty)
      .map { case (id, text) =>
        val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 16 + (id % 16).toInt
        val h = 12 + (id % 8).toInt
        var s = 0L; var ws = 0L
        for (j <- 0 until w * h) {
          val v = tb(j % tb.length) & 0xffL
          s += v; ws += j * v
        }
        id -> ((s, ws))
      }.toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (id, (s, ws)) =>
      assert(got(id) == ((s, ws)), s"doc $id stats diverge")
    }
  }
}
