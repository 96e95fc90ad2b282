package graft.spark

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing primitives shared by the dedup/text operators.
  * Pure + seedable: every executor computes identical values, so signatures
  * are join/bucket keys at any scale. */
object TextHashing {
  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  def fnv1a64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fnv1a64(b, 0, b.length)
  }

  /** splitmix64 — derives the i-th hash-family parameters deterministically. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Karp–Rabin rolling polynomial hash (base 257, mod 2^64). */
  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 257L + s.charAt(i); i += 1 }
    h
  }

  def tokenize(s: String): Array[String] = {
    val out = s.split("\\s+")
    if (out.length > 0 && out(0).isEmpty) out.drop(1) else out
  }

  /** Hash-family parameters for a k-permutation MinHash family; derived
    * deterministically so every executor agrees. Built once per expression
    * instance (NOT per row — see MinHashSignature). */
  def minHashParams(numHashes: Int): (Array[Long], Array[Long]) =
    (Array.tabulate(numHashes)(i => splitmix64(2L * i) | 1L),
     Array.tabulate(numHashes)(i => splitmix64(2L * i + 1)))

  /** MinHash signature: k permutations h_i(x) = a_i*x + b_i over shingle
    * hashes (odd a_i, so the map is a bijection on Z/2^64). Shingle hashes
    * fold the tokens' UTF-8 bytes directly, WITHOUT a separator — no
    * per-shingle string is ever materialized (the hot allocation in the
    * most data-intensive operator). A boundary-straddling token split
    * ("ab","c" vs "a","bc") can therefore collide; that only WIDENS the
    * LSH candidate set — membership is decided by the exact-Jaccard
    * verify stage over real gram strings (Dedup.wordGrams), so results
    * are unaffected and the trade is deliberate (the hash parameters are
    * recall-pinned by LshRecallSpec and must stay byte-stable). */
  def minHash(text: String, as: Array[Long], bs: Array[Long], shingleSize: Int): Array[Long] = {
    val numHashes = as.length
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val toks = tokenize(text)
    if (toks.isEmpty) return sig
    val tokBytes = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) {
      tokBytes(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      t += 1
    }
    val window = math.min(shingleSize, toks.length) // <n tokens → one whole-text shingle
    val nShingles = toks.length - window + 1
    var j = 0
    while (j < nShingles) {
      var h = 0xcbf29ce484222325L
      var w = 0
      while (w < window) {
        val b = tokBytes(j + w)
        var i = 0
        while (i < b.length) {
          h ^= (b(i) & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
        w += 1
      }
      var i = 0
      while (i < numHashes) {
        val v = as(i) * h + bs(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** SimHash-64 over token unigrams: per-bit vote of token hashes. */
  def simHash(text: String): Long = {
    val toks = tokenize(text)
    val counts = new Array[Int](64)
    var j = 0
    while (j < toks.length) {
      val h = fnv1a64(toks(j))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** `minhash_signature(text)` → `array<long>` of k MinHash values over
  * word-shingles — the signature stage of MinHash-LSH dedup. Pure and
  * partition-local; banding/bucketing happens relationally on top. */
case class MinHashSignature(child: Expression, numHashes: Int = 128, shingleSize: Int = 3)
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  // hash-family parameters hoisted out of the per-row hot path
  @transient private lazy val (as, bs) = TextHashing.minHashParams(numHashes)
  override def nullSafeEval(input: Any): Any = {
    val sig = TextHashing.minHash(input.asInstanceOf[UTF8String].toString, as, bs, shingleSize)
    // unboxed array output — 128 boxed Longs per row would dominate alloc
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `minhash_band_hashes(text)` → `array<long>` of `numBands` banded-LSH
  * bucket hashes, computed in ONE pass: signature and band hashing fuse
  * inside the expression, so the LSH plan needs neither a signature
  * materialization nor a second transform over it — the exploded
  * (band-hash, id) frame is the only thing the candidate join ever sees.
  * Two documents agreeing on a band's signature slice always agree on its
  * band hash (hash of equal inputs), so the candidate recall of the
  * relational band construction is preserved exactly; spurious hash
  * collisions only ADD candidates, which the exact verify filters. */
case class MinHashBandHashes(child: Expression, numHashes: Int = 128,
                             numBands: Int = 32, shingleSize: Int = 3)
    extends UnaryExpression with GraftUnaryCodegen {
  require(numHashes % numBands == 0,
    s"numHashes ($numHashes) must be divisible by numBands ($numBands)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"
  @transient private lazy val (as, bs) = TextHashing.minHashParams(numHashes)
  override def nullSafeEval(input: Any): Any = {
    val sig = TextHashing.minHash(input.asInstanceOf[UTF8String].toString, as, bs, shingleSize)
    val rowsPerBand = numHashes / numBands
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      // band index seeds the mix so identical slices in DIFFERENT bands
      // land in different buckets (the relational form hashed (b, slice))
      var h = TextHashing.splitmix64(b.toLong * 0x9e3779b97f4a7c15L)
      var i = b * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) { h = TextHashing.splitmix64(h ^ sig(i)); i += 1 }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

/** `hot_gram_rank(gram)` → int: 0 for grams outside the driver-sampled hot
  * set, else 1..K ascending by sampled document frequency (hottest gram = K).
  * The AllPairs prefix order sorts ascending on (rank, hash, gram), so
  * sampled-frequent grams land at the END of every gram array and are
  * excluded from prefixes — the skew-resistance of exact-df order without
  * its three corpus-wide exchanges (the ranking rides the expression,
  * broadcast-style, like [[NearestCentroids]] centroids).
  *
  * The embedded map rides Java serialization into every task closure and
  * participates in case-class equality during plan canonicalization —
  * acceptable at the default hotK = 4096 (a few hundred KB, same order as
  * NearestCentroids); if hotK is ever raised by orders of magnitude, switch
  * the ranking to a broadcast variable referenced from the expression. */
case class HotGramRank(child: Expression, ranks: Map[String, Int])
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hot_gram_rank"
  // O(1) lookup keyed by UTF8String — no per-gram String materialization
  @transient private lazy val lookup = {
    val m = new java.util.HashMap[UTF8String, Integer](ranks.size * 2)
    ranks.foreach { case (g, r) => m.put(UTF8String.fromString(g), Integer.valueOf(r)) }
    m
  }
  override def nullSafeEval(input: Any): Any = {
    val r = lookup.get(input.asInstanceOf[UTF8String])
    if (r == null) 0 else r.intValue()
  }
  override protected def withNewChildInternal(newChild: Expression): HotGramRank =
    copy(child = newChild)
}

/** `bpe_token_count(text)` → long: EXACT byte-level-BPE token count (X90,
  * the published GPT-2 construction — [[graft.spark.Bpe]]) under a fixed,
  * versioned merges table (`graft-bpe-v1` built-in, or a custom
  * GPT-2-format merges file text). Deterministic and engine-portable: the
  * same merges table yields the same count anywhere, so token budgets
  * (packing X28, budget selection X44, temperature mixing X84) stamped
  * into a corpus are reproducible forever — where the whitespace heuristic
  * undercounts the subwords a model actually consumes. Codegen'd via the
  * one-virtual-call mixin; per-word results memoize task-locally. */
case class BpeTokenCount(child: Expression, mergesText: Option[String] = None)
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  @transient private lazy val table = mergesText match {
    case None => graft.spark.Bpe.V1
    case Some(t) =>
      val id = "custom-" + java.security.MessageDigest.getInstance("SHA-256")
        .digest(t.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      graft.spark.Bpe.MergeTable.parse(id, t)
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      graft.spark.Bpe.countTokens(input.asInstanceOf[UTF8String], table))
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** `simhash64(text)` → long. Near-duplicate pairs have small Hamming distance;
  * compare with `bit_count(a ^ b)` (built-in, codegen'd). */
case class SimHash64(child: Expression)
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextHashing.simHash(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `text_fingerprint(text)` → long Karp–Rabin rolling hash of the document —
  * a cheap exact-dup fingerprint (order-sensitive, unlike bag-of-words). */
case class TextFingerprint(child: Expression)
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "text_fingerprint"
  override def nullSafeEval(input: Any): Any =
    TextHashing.rollingHash(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

/** `lang_id(text)` → 2-letter code from a character/stopword n-gram heuristic
  * (profiles for en/es/de/fr/zh; deterministic tie-break by code). */
case class LangId(child: Expression)
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(LangId.detect(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  private val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con"),
    "de" -> Set("der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit", "ein", "eine"),
    "fr" -> Set("le", "la", "les", "de", "et", "un", "une", "est", "dans", "que", "pour", "sur"),
    "it" -> Set("il", "la", "di", "che", "e", "un", "una", "per", "non", "sono", "con", "del"))

  def detect(text: String): String = {
    // CJK codepoints dominate → zh before any stopword voting
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length && i < 4000) {
      val c = text.charAt(i)
      if (!c.isWhitespace) {
        total += 1
        if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 3 > total) return "zh"
    // tokenize first, lowercase only the ≤500 examined tokens (lowercasing
    // the whole document first was O(doc) work for a capped vote); ROOT
    // locale keeps the fold identical across executor default locales
    val toks = TextHashing.tokenize(text).take(500)
      .map(_.toLowerCase(java.util.Locale.ROOT))
    val scores = profiles.map { case (code, stops) =>
      (code, toks.count(stops.contains))
    }
    val best = scores.maxBy { case (code, n) => (n, -code.charAt(0).toInt) }
    if (best._2 == 0) "und" else best._1
  }
}

/** `cosine_similarity(a, b)` over two float-array embeddings, accumulated in
  * double, strictly left-to-right (bit-reproducible across engines). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  // fully inline codegen: the dot-product loop runs inside whole-stage
  // codegen with primitive locals — no boxed Double, no virtual call per
  // pair (this sits in the innermost loop of every similarity join)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $nx = 0.0;
         |double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $a.getFloat($i);
         |  final double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `nearest_centroids(embedding)` → `array<int>` of the `nprobe` centroid
  * indices nearest by cosine — the assignment/probe stage of IVF
  * (inverted-file) approximate nearest-neighbor search. Centroids are
  * trained once on the driver and ship with the expression (broadcast-style,
  * like the reference's registry cache); assignment is partition-local. */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression with GraftUnaryCodegen {
  require(nprobe >= 1 && nprobe <= centroids.size,
    s"nprobe must be in [1, ${centroids.size}]; got $nprobe")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  // centroids normalized once per expression instance, not per row
  @transient private lazy val normalized: Array[Array[Double]] = centroids.map { c =>
    val a = c.toArray
    val n = math.sqrt(a.map(x => x * x).sum)
    if (n == 0.0) a else a.map(_ / n)
  }.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = v.numElements()
    val sims = new Array[Double](normalized.length)
    var c = 0
    while (c < normalized.length) {
      val cent = normalized(c)
      val lim = math.min(n, cent.length)
      var dot = 0.0
      var nv = 0.0
      var i = 0
      while (i < lim) {
        val x = v.getFloat(i).toDouble
        dot += x * cent(i)
        nv += x * x
        i += 1
      }
      // NaN inputs (failed embeds) poison the selection below (`NaN > x` is
      // always false, which would leave `best` at -1 and crash the taken()
      // update); map them to the same sentinel as zero-norm vectors so
      // assignment stays total and deterministic
      val s = if (nv == 0.0) -2.0 else dot / math.sqrt(nv)
      sims(c) = if (java.lang.Double.isNaN(s)) -2.0 else s
      c += 1
    }
    // primitive top-nprobe selection (corpus-wide hot path: no boxing, no
    // tuple sort) — repeated max scan over ≤ nlist entries, ties by index
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](sims.length)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < sims.length) {
        if (!taken(i) && sims(i) > bestSim) { best = i; bestSim = sims(i) }
        i += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** `lsh_bucket(embedding)` → int signature of sign-bits under `numPlanes`
  * seeded random hyperplanes — the bucketing stage of approximate
  * nearest-neighbor search (near vectors collide with high probability). */
/** `lsh_buckets(embedding)` → `array<int>` of `numTables` independent
  * hyperplane signatures — the bucketing stage of approximate
  * nearest-neighbor search. A neighbor is a candidate if it collides in ANY
  * table, so recall is 1−(1−p^k)^L; tune `numPlanes` (selectivity) against
  * `numTables` (recall) for the corpus's similarity profile.
  *
  * Rademacher (±1) hyperplane components are derived from
  * splitmix64(seed, table, plane, i) — they work for ANY embedding dimension
  * (no stored fixed-size matrix, no silent truncation) and are identical on
  * every executor. Plane rows are materialized lazily per observed dimension
  * and cached per expression instance. */
case class HyperplaneLshBucket(child: Expression, numPlanes: Int = 16,
                               seed: Long = 42L, numTables: Int = 1)
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val planeCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Double]]]

  // one flat array of numTables*numPlanes plane rows per dimension
  private def planesFor(dim: Int): Array[Array[Double]] =
    planeCache.getOrElseUpdate(dim, Array.tabulate(numTables * numPlanes) { g =>
      Array.tabulate(dim) { i =>
        val h = TextHashing.splitmix64(
          seed ^ (g.toLong * 0x9e3779b97f4a7c15L) ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    })

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = v.numElements()
    val planes = planesFor(n)
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0
      var p = 0
      while (p < numPlanes) {
        var dot = 0.0
        val plane = planes(t * numPlanes + p)
        var i = 0
        while (i < n) { dot += v.getFloat(i) * plane(i); i += 1 }
        if (dot >= 0) sig |= (1 << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)
}
