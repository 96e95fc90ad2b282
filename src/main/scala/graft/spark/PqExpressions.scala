package graft.spark

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Product quantization (PQ) kernels for embedding search at corpus scale
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — the FAISS IndexPQ lineage).
  *
  * The embedding is L2-normalized (cosine geometry), split into `m`
  * subvectors, and each subvector is replaced by the index of its nearest
  * subspace centroid — `m` bytes instead of `dim` floats (32× at dim=64,
  * fp32). Search is ASYMMETRIC distance computation (ADC): the query builds
  * one lookup table of squared distances to every subspace centroid, and
  * each corpus code scores with `m` table lookups instead of a `dim`-wide
  * dot product. For unit vectors `‖q−x‖² = 2−2·cos(q,x)`, so the smallest
  * ADC distances are the highest cosines.
  *
  * Codebooks are driver-trained and ship inside the expression (the same
  * broadcast-style discipline as [[NearestCentroids]]); both encode and
  * score are partition-local — nothing shuffles. */
object Pq {
  /** ADC: sum of the code's per-subspace table entries. Static and pure so
    * codegen calls it directly inside whole-stage ([[PqAdcDistance]]). */
  def adc(lut: ArrayData, codes: Array[Byte]): Float = {
    val m = codes.length
    if (m == 0) return 0.0f
    val ksub = lut.numElements() / m
    var sum = 0.0f
    var j = 0
    while (j < m) {
      sum += lut.getFloat(j * ksub + (codes(j) & 0xff))
      j += 1
    }
    sum
  }

  /** Centroids as primitive arrays, flattened per subspace:
    * `flat(j)(c*dsub + i)`. */
  private[spark] def flatten(codebook: Seq[Seq[Seq[Double]]]): Array[Array[Double]] =
    codebook.map(_.flatten.toArray).toArray

  /** The input vector L2-normalized into a double array (zero/NaN-norm
    * vectors pass through unscaled — deterministic, re-rank corrects). */
  private[spark] def unit(v: ArrayData, dim: Int): Array[Double] = {
    val a = new Array[Double](dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) { val x = v.getFloat(i).toDouble; a(i) = x; n2 += x * x; i += 1 }
    if (n2 > 0.0 && !java.lang.Double.isNaN(n2)) {
      val inv = 1.0 / math.sqrt(n2)
      i = 0
      while (i < dim) { a(i) *= inv; i += 1 }
    }
    a
  }
}

/** `pq_encode(embedding)` → `binary` of `m` subspace-centroid indices. */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with GraftUnaryCodegen {
  require(codebook.nonEmpty && codebook.head.nonEmpty && codebook.head.size <= 256,
    "pq_encode: codebook must be m x ksub x dsub with ksub in [1, 256]")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  @transient private lazy val flat = Pq.flatten(codebook)
  private val m = codebook.size
  private val ksub = codebook.head.size
  private val dsub = codebook.head.head.size

  override def nullSafeEval(input: Any): Any = {
    val u = Pq.unit(input.asInstanceOf[ArrayData], m * dsub)
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cents = flat(j)
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cb = c * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) { val t = u(base + i) - cents(cb + i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_lut(embedding)` → `array<float>` of length m·ksub: the query's
  * squared distance to every subspace centroid (`lut[j·ksub + c]`). Built
  * ONCE per query row; every corpus code then scores with m lookups. */
case class PqLut(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val flat = Pq.flatten(codebook)
  private val m = codebook.size
  private val ksub = codebook.head.size
  private val dsub = codebook.head.head.size

  override def nullSafeEval(input: Any): Any = {
    val u = Pq.unit(input.asInstanceOf[ArrayData], m * dsub)
    val out = new Array[Float](m * ksub)
    var j = 0
    while (j < m) {
      val cents = flat(j)
      val base = j * dsub
      var c = 0
      while (c < ksub) {
        val cb = c * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) { val t = u(base + i) - cents(cb + i); d += t * t; i += 1 }
        out(j * ksub + c) = d.toFloat
        c += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `pq_adc_distance(lut, codes)` → float: the asymmetric distance — m table
  * lookups per corpus row, no floats decoded, no vector touched. Codegen is
  * a direct static call inside whole-stage. */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = FloatType
  override def prettyName: String = "pq_adc_distance"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    Pq.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.spark.Pq.adc($l, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}
