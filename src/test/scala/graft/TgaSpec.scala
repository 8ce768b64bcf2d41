package graft

import graft.ext.Tga.TgaCodec

/** TGA codec unit properties: golden bytes, round trips over both
  * image types and both row origins, RLE effectiveness, rejection of
  * malformed input. */
class TgaSpec extends SparkSpec {

  private def plane(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(3 * w * h)(i => f(i).toByte)

  test("golden bytes: 2x1 type-2 file is exactly the spec layout") {
    // Pixels (top-down RGB): (1,2,3), (4,5,6). File: bottom-up = same
    // single row, BGR order.
    val enc = TgaCodec.encode(2, 1, Array[Byte](1, 2, 3, 4, 5, 6), rle = false)
    val expect = Array[Int](
      0, 0, 2,            // no id, no cmap, type 2
      0, 0, 0, 0, 0,      // cmap spec
      0, 0, 0, 0,         // origins
      2, 0, 1, 0,         // w=2, h=1 (LE)
      24, 0,              // depth, descriptor (bottom-up)
      3, 2, 1, 6, 5, 4    // BGR, BGR
    ).map(_.toByte)
    assert(enc.toSeq == expect.toSeq)
  }

  test("round trip: raw and RLE agree with the source on varied sizes") {
    for (w <- Seq(1, 2, 5, 8); h <- Seq(1, 3, 4); rle <- Seq(false, true)) {
      val src = plane(w, h)(i => (i * 37 + w * 5 + h) % 251)
      val img = TgaCodec.decode(TgaCodec.encode(w, h, src, rle))
        .getOrElse(fail(s"decode failed w=$w h=$h rle=$rle"))
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == src.toSeq, s"w=$w h=$h rle=$rle")
    }
  }

  test("RLE actually compresses constant images") {
    val flat = plane(16, 16)(_ => 77)
    val rle = TgaCodec.encode(16, 16, flat, rle = true)
    val raw = TgaCodec.encode(16, 16, flat, rle = false)
    // One 16-px run packet (4 bytes) per row vs 48 raw bytes per row.
    assert(rle.length < raw.length / 4)
  }

  test("top-down origin flag is honored on decode") {
    // Hand-build a 1x2 type-2 file with descriptor bit 5 set (top-down):
    // file rows are then already top-down, so no flip.
    val hdr = Array[Int](0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      1, 0, 2, 0, 24, 0x20).map(_.toByte)
    val body = Array[Int](3, 2, 1, 6, 5, 4).map(_.toByte) // BGR rows
    val img = TgaCodec.decode(hdr ++ body).get
    assert(img.pixels.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // Same body with bottom-up descriptor decodes to swapped rows.
    val hdr2 = hdr.clone(); hdr2(17) = 0
    val img2 = TgaCodec.decode(hdr2 ++ body).get
    assert(img2.pixels.toSeq == Seq[Byte](4, 5, 6, 1, 2, 3))
  }

  test("malformed input decodes to None, not an exception") {
    val good = TgaCodec.encode(4, 4, plane(4, 4)(i => i), rle = true)
    assert(TgaCodec.decode(good.take(10)).isEmpty)          // truncated header
    assert(TgaCodec.decode(good.dropRight(3)).isEmpty)      // truncated body
    val wrongType = good.clone(); wrongType(2) = 7
    assert(TgaCodec.decode(wrongType).isEmpty)              // unknown type
    val wrongDepth = good.clone(); wrongDepth(16) = 32
    assert(TgaCodec.decode(wrongDepth).isEmpty)             // 32bpp unsupported
  }

  test("gate output matches a driver-side recompute on the fixture") {
    val out = graft.ext.Tga.decodeTga(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .filter(_.getString(1).nonEmpty)
    assert(out.size == docs.length)
    docs.take(25).foreach { r =>
      val id = r.getLong(0)
      val tb = r.getString(1).getBytes("UTF-8")
      val w = 2 + (id % 6).toInt; val h = 2 + (id % 5).toInt
      val rgb = Array.tabulate(3 * w * h)(i => tb(i % tb.length))
      var sums = Array.fill(3)(0L); var ws = 0L
      rgb.zipWithIndex.foreach { case (b, j) =>
        sums(j % 3) += (b & 0xffL); ws += j.toLong * (b & 0xffL)
      }
      assert(out(id) == ((w.toLong, h.toLong, id % 2 == 1,
        sums(0), sums(1), sums(2), ws)), s"doc $id")
    }
  }
}
