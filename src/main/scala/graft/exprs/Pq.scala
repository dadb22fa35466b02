package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Product-quantization kernels — the classic memory-bandwidth ANN tier
  * (Jégou et al. 2011): a vector becomes `m` one-byte-ish codes (argmin
  * codeword per subspace), and query-time distance is `m` table lookups
  * (ADC) instead of a `dim`-wide float dot. All arithmetic is exact
  * fixed-point (`round(x·10⁶)` with decimal HALF_UP — the engine's
  * established oracle-reproducible convention from LshSigs/kmeansStep),
  * so encode, LUT, and ADC reproduce bit-identically in DuckDB.
  *
  * Codebooks arrive as constructor constants ([m][codewords][subDim]
  * fixed-point) — tiny (m·16·subDim longs), collected once driver-side
  * and shipped inside the expression like the sq8 stats literals. All
  * three expressions are tight loops (no interpreted HOF lambdas).
  */
object Pq {
  import graft.exprs.exprs.{toColumn, toExpr}

  type Codebooks = Seq[Seq[Seq[Long]]] // [subspace][codeword][dim] fixed-point

  /** Per-subspace argmin codeword ids (ties → smaller id) as
    * array<int> of length m; null for malformed vectors. */
  def pq_encode(v: Column, codebooks: Codebooks): Column =
    toColumn(PqEncode(toExpr(v), codebooks))

  /** Flattened ADC lookup table: lut[s·C + c] = fixed-point squared L2
    * between the vector's subspace s and codeword c. */
  def pq_lut(v: Column, codebooks: Codebooks): Column =
    toColumn(PqLut(toExpr(v), codebooks))

  /** ADC distance: Σ_s lut[s·C + code_s]. */
  def pq_adc(code: Column, lut: Column): Column =
    toColumn(PqAdc(toExpr(code), toExpr(lut)))

  /** Element-wise residual `v − c` as array<double> — the IVFADC
    * residual step ([[pq_encode]]/[[pq_lut]] compose over it): both
    * inputs widen to double BEFORE the subtraction, so the arithmetic
    * is one IEEE double op per dim and replays bit-identically in
    * DuckDB (`CAST(a AS DOUBLE) - CAST(b AS DOUBLE)`) — a float-domain
    * subtraction would round differently from the oracle's
    * double-domain one on large-magnitude dims. Null (and null-for-
    * mismatched-length, the LshSigs all-or-nothing rule) so a malformed
    * vector drops instead of encoding garbage. One tight loop, no
    * interpreted HOF lambdas in the layout/probe paths. */
  def vec_residual(v: Column, c: Column): Column =
    toColumn(VecResidual(toExpr(v), toExpr(c)))

  /** Spark/DuckDB-shared fixed point: decimal HALF_UP, NOT floor(x+0.5)
    * (double-rounds) and NOT Math.round (pulls negative ties up). */
  private[graft] def fixedPoint(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}

private[exprs] trait PqVectorKernel { self: UnaryExpression =>
  def codebooks: Pq.Codebooks

  @transient protected lazy val cb: Array[Array[Array[Long]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  protected def numSub: Int = cb.length
  protected def subDim: Int = cb(0)(0).length
  protected def numCw: Int = cb(0).length

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq expects array<float|double>, got $other")
  }

  /** Fixed-point vector, or null when malformed (wrong length / null
    * element) — mirroring LshSigs' all-or-nothing rule. */
  protected def fixed(input: Any): Array[Long] = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != numSub * subDim) return null
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = Pq.fixedPoint(d * 1000000.0)
      i += 1
    }
    out
  }

  /** Fixed-point squared L2 between subspace `s` of `v` and codeword `c`. */
  protected def subDist(v: Array[Long], s: Int, c: Int): Long = {
    val cw = cb(s)(c)
    val off = s * subDim
    var acc = 0L
    var i = 0
    while (i < subDim) {
      val d = v(off + i) - cw(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

case class PqEncode(child: Expression, codebooks: Pq.Codebooks)
    extends UnaryExpression with PqVectorKernel with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = fixed(input)
    if (v == null) return null
    val code = new Array[Int](numSub)
    var s = 0
    while (s < numSub) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < numCw) {
        val d = subDist(v, s, c)
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep smaller c
        c += 1
      }
      code(s) = best
      s += 1
    }
    new GenericArrayData(code)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

case class PqLut(child: Expression, codebooks: Pq.Codebooks)
    extends UnaryExpression with PqVectorKernel with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = fixed(input)
    if (v == null) return null
    val lut = new Array[Long](numSub * numCw)
    var s = 0
    while (s < numSub) {
      var c = 0
      while (c < numCw) { lut(s * numCw + c) = subDist(v, s, c); c += 1 }
      s += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(c: Expression): PqLut = copy(child = c)
  override def prettyName: String = "pq_lut"
}

case class VecResidual(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_residual expects array<float|double>, got $other")
  }
  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(v: Any, c: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val b = c.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x - y
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecResidual =
    copy(left = l, right = r)
  override def prettyName: String = "vec_residual"
}

case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(code: Any, lut: Any): Any = {
    val cd = code.asInstanceOf[ArrayData]
    val lt = lut.asInstanceOf[ArrayData]
    val m = cd.numElements()
    // mismatched shapes (a lut built for a different m, or codes from a
    // foreign codebook) must surface as null, not as silently wrong
    // distances or an out-of-bounds task failure
    if (m == 0 || lt.numElements() % m != 0) return null
    val numCw = lt.numElements() / m
    var acc = 0L
    var s = 0
    while (s < m) {
      val c = cd.getInt(s)
      if (c < 0 || c >= numCw) return null
      acc += lt.getLong(s * numCw + c)
      s += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
