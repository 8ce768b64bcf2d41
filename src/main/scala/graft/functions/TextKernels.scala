package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** One-pass ASCII text-statistics kernels — performance twins of the
  * regex/HOF columns in graft.ext.TextAnalysis (each was a per-character
  * regex scan). Semantics on the ASCII corpus (FIXTURES.md) are exactly
  * the oracle SQL's:
  *
  *  - wsTokenCount   = len(list_filter(regexp_split_to_array(t,'\s+'), x<>''))
  *  - bpePieceCount  = len(regexp_extract_all(t,'[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))
  *  - punctCount     = len(regexp_extract_all(t,'[^a-zA-Z0-9\s]'))
  *  - letterCount    = sum of lengths of lowercased [a-z]+ words
  *  - wordCount      = number of [a-z]+ runs after lowercasing
  *  - stopwordCount  = words ∈ per-language stopword list (multiplicity)
  *
  * Non-ASCII bytes count as punctuation/separators byte-wise; the parity
  * specs pin the ASCII behavior (HashParitySpec/TextParitySpec).
  */
object TextKernels {

  /** Java \s = [ \t\n\x0B\f\r]. */
  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'
  private def isAlnum(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  private def isAlpha(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  def wsTokenCount(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var in = false
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (!isWs(c)) { if (!in) n += 1; in = true } else in = false
      i += 1
    }
    n
  }

  def bpePieceCount(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var inAlnum = false
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (isAlnum(c)) { if (!inAlnum) n += 1; inAlnum = true }
      else { inAlnum = false; if (!isWs(c)) n += 1 }
      i += 1
    }
    n
  }

  def punctCount(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (!isAlnum(c) && !isWs(c)) n += 1
      i += 1
    }
    n
  }

  def letterCount(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var i = 0
    while (i < b.length) { if (isAlpha(b(i) & 0xff)) n += 1; i += 1 }
    n
  }

  def wordCount(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var in = false
    var i = 0
    while (i < b.length) {
      if (isAlpha(b(i) & 0xff)) { if (!in) n += 1; in = true } else in = false
      i += 1
    }
    n
  }

  /** lower(s) with every whitespace run collapsed to one space — the
    * byte-wise twin of regexp_replace(lower(text), "\\s+", " ") on the
    * ASCII corpus (no trim, like the regex). */
  def normalizeWs(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var m = 0
    var i = 0
    var inWs = false
    while (i < b.length) {
      val c = b(i) & 0xff
      if (isWs(c)) {
        if (!inWs) { out(m) = ' '; m += 1 }
        inWs = true
      } else {
        out(m) = (if (c >= 'A' && c <= 'Z') c + 32 else c).toByte
        m += 1
        inWs = false
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, m))
  }

  /** Per-language stopword lists — the single source of truth
    * (graft.ext.TextAnalysis builds its oracle SQL from this). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "zh" -> Seq("shi", "bu", "wo", "zhe", "ren", "you"))

  private val stopSets: java.util.Map[String, java.util.Set[String]] = {
    val m = new java.util.HashMap[String, java.util.Set[String]]()
    stopwords.foreach { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      m.put(l, s)
    }
    m
  }

  /** Greedy longest-match tokenization of one word against a fixed
    * vocabulary (wordpiece-style): at each position consume the LONGEST
    * vocab piece that matches, else fall back to a single character.
    * Returns [n_pieces, n_vocab_pieces] — total pieces and how many came
    * from vocab matches (the rest are char fallbacks).
    *
    * The vocab array rides in as an ordinary column (a broadcast 1-row
    * frame), so the tokenizer is a pure function of (word, vocab) with
    * no session state; callers apply it to DISTINCT words (tokenize the
    * vocabulary, not the corpus) so the per-call linear vocab scan is
    * off the per-row hot path. Byte-wise comparison — exact on the
    * ASCII `[a-z]+` words the word tokenizer emits. */
  def greedyPieces(word: UTF8String, vocab: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = word.numBytes()
    val v = vocab.numElements()
    var p = 0
    var pieces = 0L
    var vocabHits = 0L
    while (p < n) {
      var best = 0
      var i = 0
      while (i < v) {
        val piece = vocab.getUTF8String(i)
        val m = piece.numBytes()
        if (m > best && m <= n - p) {
          var j = 0
          var ok = true
          while (ok && j < m) {
            if (piece.getByte(j) != word.getByte(p + j)) ok = false
            j += 1
          }
          if (ok) best = m
        }
        i += 1
      }
      if (best > 0) { p += best; vocabHits += 1 } else p += 1
      pieces += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(pieces, vocabHits))
  }

  /** Count of lowercased [a-z]+ words that are in `lang`'s stopword list
    * (with multiplicity). Unknown lang → 0. */
  def stopwordCount(s: UTF8String, lang: UTF8String): Long = {
    val dict = stopSets.get(lang.toString)
    if (dict == null) return 0L
    val b = s.getBytes
    var n = 0L
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i <= b.length) {
      val c = if (i < b.length) b(i) & 0xff else ' '
      val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
      if (lc >= 'a' && lc <= 'z') sb.append(lc.toChar)
      else if (sb.length > 0) {
        if (dict.contains(sb.toString)) n += 1
        sb.setLength(0)
      }
      i += 1
    }
    n
  }
}
