package graft.spark

import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-level BPE tokenization (X90) — exact `n_tokens` for
  * the packing/budget/mixing operators (X28/X44/X84) instead of the
  * whitespace heuristic, which systematically undercounts the subword
  * tokens a model actually consumes.
  *
  * The construction is the published GPT-2 byte-level BPE (Radford et al.
  * 2019; the reference implementation's `encoder.py` is public):
  *
  *  1. pre-tokenize with the published regex (contractions, optionally
  *     space-prefixed letter runs / digit runs / punctuation runs,
  *     whitespace);
  *  2. map each pre-token's UTF-8 bytes through the published reversible
  *     byte->unicode table (printable bytes map to themselves, the rest to
  *     U+0100.., so merges files are plain text — ' ' becomes 'Ġ');
  *  3. greedily apply the merges table: repeatedly fuse the adjacent pair
  *     with the LOWEST rank until none applies. Token count = surviving
  *     symbols, summed over pre-tokens.
  *
  * Any GPT-2-format merges file (lines of "A B", rank = line order) loads
  * via [[MergeTable.parse]]; the built-in `graft-bpe-v1` table is a small
  * fixed English-leaning vocabulary defined below — versioned and frozen,
  * because token budgets stamped into a corpus must be reproducible
  * forever. Counting is deterministic by construction: no RNG, no locale,
  * byte-level fallback covers every input exactly once. */
object Bpe {

  /** The published GPT-2 pre-tokenization pattern (encoder.py).
    * UNICODE_CHARACTER_CLASS so `\s` matches Unicode whitespace like
    * Python's `re` — without it U+00A0 falls into the punctuation-run
    * branch and counts diverge from the reference tokenizer. */
  private val PreToken = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** The published reversible byte->unicode map: visible latin bytes map to
    * themselves; the remaining 68 bytes map to U+0100 + running index.
    * (Numeric ranges: '!'..'~', inverted-bang..logical-not, registered-
    * sign..y-umlaut — ASCII-only source, the container's scalac has no
    * UTF-8 locale.) */
  private val ByteToChar: Array[Char] = {
    val visible = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (visible(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** The mapped space byte (0x20 is the 33rd invisible byte -> U+0120, the
    * character GPT-2 merges files print as a G-with-dot). */
  private val G: String = String.valueOf((256 + 32).toChar)
  private val CharToByte: Map[Char, Byte] =
    (0 until 256).map(b => ByteToChar(b) -> b.toByte).toMap

  /** Ranked merges. Symbols are strings over the byte->unicode alphabet. */
  final class MergeTable(val id: String, pairs: Seq[(String, String)]) {
    require(pairs.nonEmpty, "graft bpe: empty merges table")
    private[Bpe] val rank = new java.util.HashMap[String, Integer](pairs.size * 2)
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      require(a.nonEmpty && b.nonEmpty, s"graft bpe: empty merge side at rank $i")
      rank.put(a + " " + b, Integer.valueOf(i))
    }
    private[Bpe] def rankOf(a: String, b: String): Int = {
      val r = rank.get(a + " " + b)
      if (r == null) Int.MaxValue else r.intValue()
    }
  }

  object MergeTable {
    /** GPT-2 merges.txt format: one "A B" pair per line, rank = order;
      * blank lines and `#version` headers are skipped. */
    def parse(id: String, text: String): MergeTable = {
      val pairs = text.split("\n").iterator.map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val sp = l.split(" ")
          require(sp.length == 2, s"graft bpe: malformed merges line '$l'")
          (sp(0), sp(1))
        }.toSeq
      new MergeTable(id, pairs)
    }
  }

  /** `graft-bpe-v1`: a fixed, versioned 64-merge English-leaning demo
    * vocabulary (Ġ is the mapped space byte). Small on purpose — the point
    * is exact, reproducible counting; production corpora load their real
    * tokenizer's merges file through [[MergeTable.parse]]. */
  val MergesV1Text: String = {
    val plain = Seq(
      "t h", "th e", "i n", "e r", "a n", "o n", "r e", "e n", "a t", "o r",
      "e s", "s t", "a r", "o u", "i t", "i s", "a l", "e d", "in g", "an d",
      "o f", "t o", "l l", "o o", "e e", "s s", "e a", "c h", "s h", "w h",
      "c t", "l d", "r t", "n t", "m e", "h e", "l e", "s e", "v e", "a s",
      "n d", "0 0", "1 9", "2 0")
    val spaced = Seq(
      s"$G t", s"$G a", s"$G s", s"$G w", s"$G o", s"$G b", s"$G c", s"$G f",
      s"$G m", s"$G p", s"$G d", s"$G h", s"$G l", s"$G n",
      s"${G}t h", s"${G}th e", s"${G}a n", s"${G}an d", s"${G}t o",
      s"${G}o f", s"${G}i s", s"${G}i n")
    ("#version: graft-bpe-v1" +: (plain ++ spaced)).mkString("\n") + "\n"
  }

  lazy val V1: MergeTable = MergeTable.parse("graft-bpe-v1", MergesV1Text)

  def tableFor(id: String): MergeTable = id match {
    case "graft-bpe-v1" => V1
    case other => throw new IllegalArgumentException(
      s"graft bpe: unknown merges table '$other' (built-in: graft-bpe-v1); " +
        "load a custom table with MergeTable.parse and the expression's " +
        "merges-text form")
  }

  /** Pre-tokens longer than this (mapped chars = bytes) merge in
    * independent segments: the greedy loop is O(len^2) worst case, and web
    * corpora DO contain 100 KB unbroken blobs (base64, DNA, minified
    * source) that would otherwise stall a task for minutes. Segmentation
    * is deterministic and part of the frozen counting semantics; it can
    * only miss merges ACROSS a segment cut, i.e. only inside pathological
    * super-words — natural-language pre-tokens are dozens of bytes. */
  val MaxWordSegment = 4096

  /** Token count of one pre-token (symbols after greedy merging). */
  private def countWord(word: String, t: MergeTable): Int = {
    if (word.length > MaxWordSegment) {
      var total = 0
      var off = 0
      while (off < word.length) {
        val end = math.min(off + MaxWordSegment, word.length)
        total += countWord(word.substring(off, end), t)
        off = end
      }
      return total
    }
    if (word.length <= 1) return word.length
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var n = syms.length
    while (n > 1) {
      // lowest-rank adjacent pair
      var best = Int.MaxValue
      var bi = -1
      i = 0
      while (i < n - 1) {
        val r = t.rankOf(syms(i), syms(i + 1))
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0 || best == Int.MaxValue) return n
      // fuse EVERY occurrence of that pair left-to-right (the published
      // algorithm's per-iteration behavior)
      val a = syms(bi); val b = syms(bi + 1)
      val next = new Array[String](n)
      var w = 0
      i = 0
      while (i < n) {
        if (i < n - 1 && syms(i) == a && syms(i + 1) == b) {
          next(w) = a + b; w += 1; i += 2
        } else { next(w) = syms(i); w += 1; i += 1 }
      }
      syms = next
      n = w
    }
    n
  }

  /** Exact BPE token count of a document. Per-word results memoize in a
    * bounded task-local cache (natural-language corpora repeat words
    * heavily; the cache turns the merge loop into a hash lookup for them). */
  def countTokens(text: UTF8String, t: MergeTable): Long = {
    val s = text.toString
    if (s.isEmpty) return 0L
    val cache = wordCache.get()
    val m = PreToken.matcher(s)
    var total = 0L
    while (m.find()) {
      val bytes = s.substring(m.start(), m.end())
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xff)); i += 1 }
      val word = sb.toString
      if (word.length > MaxWordSegment) {
        total += countWord(word, t) // pathological blob: segmented, uncached
      } else {
        val key = t.id + " " + word
        val cached = cache.get(key)
        if (cached != null) total += cached.intValue()
        else {
          val c = countWord(word, t)
          if (cache.size < 65536) cache.put(key, Integer.valueOf(c))
          total += c
        }
      }
    }
    total
  }

  /** Full tokenization, BYTE-faithful (the spec's ground-truth surface):
    * each token's exact bytes, decoded through the reversible byte map —
    * concatenating them always reproduces the input's UTF-8 bytes, even
    * when a merge boundary splits a multi-byte character. */
  def tokenizeBytes(text: String, t: MergeTable): Seq[Array[Byte]] =
    tokenize(text, t).map { sym =>
      val bb = new Array[Byte](sym.length)
      var k = 0
      while (k < sym.length) { bb(k) = CharToByte(sym.charAt(k)); k += 1 }
      bb
    }

  /** Token SYMBOL strings over the mapped byte alphabet (space prints as
    * the U+0120 character, exactly like a GPT-2 merges file). For display
    * decode [[tokenizeBytes]] — a token holding half a multi-byte char has
    * no faithful String form. */
  def tokenize(text: String, t: MergeTable): Seq[String] = {
    val m = PreToken.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) {
      val bytes = text.substring(m.start(), m.end())
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xff)); i += 1 }
      val mapped = sb.toString
      // SAME segmentation as the counter: tokenizeBytes(...).length must
      // always equal countTokens(...)
      var off = 0
      while (off < mapped.length) {
        val seg = mapped.substring(off,
          math.min(off + MaxWordSegment, mapped.length))
        off += MaxWordSegment
        var syms = seg.map(String.valueOf(_)).toArray
        var changed = true
        while (changed && syms.length > 1) {
          var best = Int.MaxValue; var bi = -1
          var i2 = 0
          while (i2 < syms.length - 1) {
            val r = t.rankOf(syms(i2), syms(i2 + 1))
            if (r < best) { best = r; bi = i2 }
            i2 += 1
          }
          if (bi < 0 || best == Int.MaxValue) changed = false
          else {
            val a = syms(bi); val b = syms(bi + 1)
            val buf = Seq.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                buf += a + b; j += 2
              } else { buf += syms(j); j += 1 }
            }
            syms = buf.result().toArray
          }
        }
        syms.foreach(out += _)
      }
    }
    out.result()
  }

  private val wordCache =
    new ThreadLocal[java.util.HashMap[String, Integer]] {
      override def initialValue(): java.util.HashMap[String, Integer] =
        new java.util.HashMap[String, Integer](1024)
    }
}
