package graft

import graft.ext.Qoi

/** QOI codec properties: lossless round trip across all op families,
  * op-mix coverage, and malformed-input rejection. */
class QoiSpec extends SparkSpec {

  private def rt(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = Qoi.decode(Qoi.encode(w, h, rgb))
      .getOrElse(fail("round trip returned None"))
    assert(img.width == w && img.height == h)
    img.rgb
  }

  test("round trip: constant plane (max-run chunks + run flush)") {
    // 200 identical pixels force 62-run saturation (62+62+62+14) and
    // the trailing-run flush at stream end.
    val rgb = Array.fill(3 * 200)(0x41.toByte)
    assert(rt(200, 1, rgb).toSeq == rgb.toSeq)
  }

  test("round trip: gradient (DIFF/LUMA paths) and jumps (RGB escape)") {
    // Slow ramp hits DIFF (+1 steps) and LUMA; modular jumps hit RGB.
    val grad = Array.tabulate(3 * 64)(i => ((i / 3) & 0xff).toByte)
    assert(rt(8, 8, grad).toSeq == grad.toSeq)
    val jump = Array.tabulate(3 * 64)(i => ((i * 97) % 256).toByte)
    assert(rt(8, 8, jump).toSeq == jump.toSeq)
  }

  test("round trip: alternating colors exercise the 64-entry hash index") {
    val a = Array[Byte](10, 20, 30)
    val b = Array[Byte](120, 7, 99)
    val rgb = Array.tabulate(3 * 50)(i =>
      (if ((i / 3) % 2 == 0) a else b)(i % 3))
    val enc = Qoi.encode(10, 5, rgb)
    assert(rt(10, 5, rgb).toSeq == rgb.toSeq)
    // After both colors are indexed, the alternation must compress to
    // 1-byte INDEX ops: far smaller than 4 bytes/pixel.
    assert(enc.length < 14 + 8 + 50 * 2 + 8,
      s"index ops not engaged: ${enc.length} bytes")
  }

  test("op-mix: the corpus-shaped payload engages RUN, INDEX and DIFF/LUMA") {
    // A run needs >= 6 consecutive identical BYTES (two identical RGB
    // triples) — hence the 12-a block.
    val text = "the quick brown fox the quick brown fox aaaaaaaaaaaa"
    val tb = text.getBytes("UTF-8")
    val rgb = Array.tabulate(3 * 60)(i => tb(i % tb.length))
    val enc = Qoi.encode(10, 6, rgb)
    val body = enc.slice(14, enc.length - 8).map(_ & 0xff)
    def has(pred: Int => Boolean) = body.exists(pred)
    assert(has(b => (b & 0xc0) == 0xc0 && b < 0xfe), "no RUN op")
    assert(has(b => (b & 0xc0) == 0x00), "no INDEX op")
    assert(has(b => (b & 0xc0) == 0x40) || has(b => (b & 0xc0) == 0x80),
      "no DIFF/LUMA op")
    assert(rt(10, 6, rgb).toSeq == rgb.toSeq)
  }

  test("rejects malformed input") {
    val good = Qoi.encode(4, 3, Array.tabulate(36)(i => (i * 7).toByte))
    assert(Qoi.decode(good).isDefined)
    assert(Qoi.decode(Array.emptyByteArray).isEmpty)
    assert(Qoi.decode("noqoi".getBytes ++ good.drop(5)).isEmpty)
    assert(Qoi.decode(good.dropRight(1)).isEmpty, "broken end marker")
    assert(Qoi.decode(good.dropRight(9)).isEmpty, "truncated stream")
    val rgba = good.clone(); rgba(12) = 4
    assert(Qoi.decode(rgba).isEmpty, "channels=4 must be rejected")
    // Corrupt the declared height so the pixel count can't match.
    val wrongDims = good.clone(); wrongDims(11) = 9
    assert(Qoi.decode(wrongDims).isEmpty)
  }
}
