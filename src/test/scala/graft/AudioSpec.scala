package graft

import graft.ext.Audio.WavCodec

/** The WAV codec against hand-built bytes: a golden fixture pins the
  * exact encoded layout (a symmetric encode/decode bug cannot cancel
  * out), the parser must walk chunks rather than assume offset 44, and
  * malformed containers must decode to None, never garbage. */
class AudioSpec extends SparkSpec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def tag(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical 44-byte-layout mono WAV (no junk chunk) built by hand —
    * independent of the encoder. */
  private def canonicalWav(rate: Int, samples: Seq[Int]): Array[Byte] =
    tag("RIFF") ++ le32(36 + 2 * samples.length) ++ tag("WAVE") ++
      tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(rate) ++
      le32(rate * 2) ++ le16(2) ++ le16(16) ++
      tag("data") ++ le32(2 * samples.length) ++
      samples.toArray.flatMap(s => le16(s & 0xffff))

  test("golden fixture: encoder emits the exact expected bytes") {
    val enc = WavCodec.encode(8000, 1, Array[Short](1, -2, 32767))
    // RIFF body: WAVE(4) + fmt(8+16) + junk LIST(8+4) + data(8+6) = 54.
    val expected =
      tag("RIFF") ++ le32(54) ++ tag("WAVE") ++
        tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
        tag("LIST") ++ le32(3) ++ Array[Byte]('i', 'n', 'f', 0) ++
        tag("data") ++ le32(6) ++ le16(1) ++ le16(0xfffe) ++ le16(32767)
    assert(enc.sameElements(expected),
      s"encoded ${enc.toSeq} != expected ${expected.toSeq}")
  }

  test("decodes a hand-built canonical container (no junk chunk)") {
    val wav = WavCodec.decode(canonicalWav(16000, Seq(5, -5, 100, -32768)))
      .getOrElse(fail("decode returned None"))
    assert(wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.samples.toSeq == Seq[Short](5, -5, 100, -32768))
  }

  test("round trip preserves stereo interleave through the junk chunk") {
    val pcm = Array[Short](10, -10, 20, -20, 30, -30)
    val wav = WavCodec.decode(WavCodec.encode(44100, 2, pcm))
      .getOrElse(fail("decode returned None"))
    assert(wav.channels == 2 && wav.sampleRate == 44100)
    assert(wav.samples.toSeq == pcm.toSeq)
  }

  test("odd-sized unknown chunks are skipped with the RIFF pad rule") {
    // Hand-build: WAVE + junk of ODD size 5 (so +1 pad) + fmt + data.
    val bytes =
      tag("RIFF") ++ le32(4 + 8 + 6 + 24 + 12) ++ tag("WAVE") ++
        tag("junk") ++ le32(5) ++ Array[Byte](1, 2, 3, 4, 5, 0) ++
        tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
        tag("data") ++ le32(4) ++ le16(7) ++ le16(9)
    val wav = WavCodec.decode(bytes).getOrElse(fail("decode returned None"))
    assert(wav.samples.toSeq == Seq[Short](7, 9))
  }

  test("malformed containers decode to None") {
    val good = WavCodec.encode(8000, 1, Array[Short](1, 2, 3))
    assert(WavCodec.decode(good.take(10)).isEmpty, "truncated header")
    assert(WavCodec.decode("RIFFxxxxABCD".getBytes).isEmpty, "bad form tag")
    assert(WavCodec.decode(good.dropRight(1)).isEmpty, "truncated data chunk")
    // Non-PCM format tag (3 = IEEE float) must be rejected.
    val nonPcm = good.clone()
    // fmt chunk format tag lives at offset 20 in the encoder's layout.
    nonPcm(20) = 3
    assert(WavCodec.decode(nonPcm).isEmpty, "non-PCM accepted")
    // Frame-misaligned data chunk: stereo whose data length is not a
    // multiple of the 4-byte frame size. The length field sits 4 bytes
    // into the data chunk header (RIFF 12 + fmt 24 + LIST 12 + 4).
    val stereo = WavCodec.encode(8000, 2, Array[Short](1, 2, 3, 4))
    val bad = stereo.clone()
    bad(52) = 6 // 6 bytes = 3 samples: not divisible by 2*ch
    assert(WavCodec.decode(bad).isEmpty, "misaligned frames accepted")
  }

  test("fingerprint: gain-invariant, content-sensitive, fold-exact") {
    import graft.ext.Audio
    def clip(samples: Seq[Int], ch: Int = 1) =
      WavCodec.decode(WavCodec.encode(8000, ch,
        samples.map(_.toShort).toArray)).get
    // 32 frames -> 4 windows of 8; energies shaped low/high/low/high.
    val base = Seq.fill(8)(10) ++ Seq.fill(8)(100) ++
      Seq.fill(8)(20) ++ Seq.fill(8)(200)
    val (nw, fp) = Audio.fingerprintOf(clip(base.map(_ * 1)))
    assert(nw == 4)
    // e1>e0 (bit0), e2<e1 (no bit1), e3>e2 (bit2) -> 0b101.
    assert(fp == 5L, s"fp=$fp")
    // Amplitude scaling preserves every delta sign — the Haitsma/Kalker
    // robustness property, proven not claimed.
    assert(Audio.fingerprintOf(clip(base.map(_ * 2))) == ((4L, 5L)))
    assert(Audio.fingerprintOf(clip(base.map(_ * -3))) == ((4L, 5L)))
    // Content actually matters: reversing the shape flips the bits.
    assert(Audio.fingerprintOf(clip(base.reverse))._2 != 5L)
    // Stereo: channel 0 drives the fingerprint; channel 1 is ignored.
    val stereoSamples = base.flatMap(v => Seq(v, 9999))
    assert(Audio.fingerprintOf(clip(stereoSamples, ch = 2)) == ((4L, 5L)))
  }
}
