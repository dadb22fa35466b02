package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

import org.apache.spark.sql.graftbridge.Bridge

/** Scalar quantization of a float vector into 256 integer bins per
  * dimension: `floor((x - mn) / (mx - mn) * 255)` (0 when the dimension
  * is constant). The per-dim min/max come in as constructor literals (a
  * tiny collected aggregate — the BM25-stats pattern), so the hot loop
  * is branch-light JIT-compiled double math with no per-element lambda
  * dispatch. `floor` (not `round`) keeps the binning bit-identical
  * across engines — no round-half tie semantics to match.
  *
  * Same CodegenFallback tight-loop rationale as [[CosineSimilarity]].
  */
case class Sq8Quantize(child: Expression, mn: Array[Double], mx: Array[Double])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), mn.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val lo = mn(i)
      val hi = mx(i)
      out(i) =
        if (hi > lo)
          math.floor((x.getFloat(i).toDouble - lo) / (hi - lo) * 255.0).toInt
        else 0
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "sq8_quantize"
}

/** Integer dot product of two quantized vectors — the SIMD-able int math
  * that makes quantized scan the memory-bandwidth lever at scale. Exact
  * (long accumulation; either side may be array<int> or array<bigint> —
  * the asymmetric-ranking weights are Long end-to-end so the Spark
  * single-query, Spark batch, and DuckDB BIGINT oracle paths share
  * EXACT arithmetic with no int narrowing for large-magnitude vectors). */
case class DotInt(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val leftIsLong: Boolean = left.dataType match {
    case ArrayType(LongType, _)    => true
    case ArrayType(IntegerType, _) => false
    case other => throw new IllegalArgumentException(
      s"dot_int expects array<int|bigint>, got $other")
  }
  @transient private lazy val rightIsLong: Boolean = right.dataType match {
    case ArrayType(LongType, _)    => true
    case ArrayType(IntegerType, _) => false
    case other => throw new IllegalArgumentException(
      s"dot_int expects array<int|bigint>, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val a = if (leftIsLong) x.getLong(i) else x.getInt(i).toLong
      val b = if (rightIsLong) y.getLong(i) else y.getInt(i).toLong
      acc += a * b
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_int"
}

/** Fused normalized-ranking key for the SQ8 shortlist: one tight loop
  * over the stored codes computes BOTH the asymmetric integer dot
  * Σ code_i·qw_i AND the integer reconstructed norm-squared
  * Σ (a_i + code_i·b_i)² (a_i = ⌊mn_i·2¹²⌋, b_i = ⌊step_i·2¹²⌋ —
  * constructor constants from the frozen quantizer stats), returning
  * (mq + dot) / √den as one IEEE division + sqrt of EXACT integer
  * sums — order-independent, bit-identical in a DuckDB replay.
  *
  * Why normalize: the plain dot orders by reconstructed INNER PRODUCT;
  * under a wide corpus norm spread high-norm vectors crowd the fixed
  * shortlist ahead of low-norm true (cosine) neighbors — ProbeSq8Norm
  * measured recall@5 0.91 → 0.79 at a 10× spread, recovered to 0.91 by
  * this key. `mq` (= Σ ⌊q_i·mn_i·2²⁴⌋, the query-side offset constant
  * the pure-dot form cancels away) must come back in before dividing —
  * cosine is NOT invariant to the affine offset. A zero reconstructed
  * norm keys to -Double.MaxValue (sorts last). */
case class Sq8CosKey(first: Expression, second: Expression,
    third: Expression, a: Array[Long], b: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  @transient private lazy val qwIsLong: Boolean = second.dataType match {
    case ArrayType(LongType, _)    => true
    case ArrayType(IntegerType, _) => false
    case other => throw new IllegalArgumentException(
      s"sq8_cos_key expects qw array<int|bigint>, got $other")
  }

  override def nullSafeEval(codeAny: Any, qwAny: Any, mqAny: Any): Any = {
    val code = codeAny.asInstanceOf[ArrayData]
    val qw = qwAny.asInstanceOf[ArrayData]
    val mq = mqAny.asInstanceOf[java.lang.Long].longValue()
    val n = math.min(math.min(code.numElements(), qw.numElements()), a.length)
    var dot = 0L
    var den = 0L
    var i = 0
    while (i < n) {
      val c = code.getInt(i).toLong
      val w = if (qwIsLong) qw.getLong(i) else qw.getInt(i).toLong
      dot += c * w
      val r = a(i) + c * b(i)
      den += r * r
      i += 1
    }
    java.lang.Double.valueOf(
      if (den == 0L) -java.lang.Double.MAX_VALUE
      else (mq + dot).toDouble / math.sqrt(den.toDouble))
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "sq8_cos_key"
}

object Sq8 {
  /** Fixed-point scale (2^24) of the ASYMMETRIC ranking weights
    * w_i = floor(q_i · step_i · 2^24): Σ code_i·w_i then orders
    * candidates by the reconstructed inner product ⟨x̂, q⟩ up to a
    * per-query constant — the affine quantization offset cancels
    * instead of biasing the cut (the symmetric quantize-the-query dot
    * measured 0.66 recall where this form matches the exact tier; see
    * ProbeKnn). |q_i·step_i| is O(1e-3) for unit-norm embeddings, so
    * the weight keeps ~1e-5 relative precision while the integer dot
    * stays far inside int64. */
  val AdcScale: Double = (1L << 24).toDouble

  def sq8_quantize(v: Column, mn: Array[Double], mx: Array[Double]): Column =
    Bridge.column(Sq8Quantize(Bridge.expression(v), mn, mx))

  def dot_int(x: Column, y: Column): Column =
    Bridge.column(DotInt(Bridge.expression(x), Bridge.expression(y)))

  /** Normalized shortlist key — see [[Sq8CosKey]]. `a`/`b` are the
    * 2¹²-fixed-point reconstruction tables of the frozen quantizer
    * stats ([[reconTables]]); `mq` the query's offset constant
    * ([[mqOf]]). */
  def cos_key(code: Column, qw: Column, mq: Column,
      a: Array[Long], b: Array[Long]): Column =
    Bridge.column(Sq8CosKey(Bridge.expression(code), Bridge.expression(qw),
      Bridge.expression(mq), a, b))

  /** Integer reconstruction tables at 2¹² fixed point:
    * x̂_i·2¹² ≈ a_i + code_i·b_i. One driver-side pass over the
    * dim-sized frozen stats. */
  def reconTables(mn: Array[Double], mx: Array[Double]): (Array[Long], Array[Long]) =
    (mn.map(m => math.floor(m * 4096.0).toLong),
      mn.indices.map(i =>
        math.floor((mx(i) - mn(i)) / 255.0 * 4096.0).toLong).toArray)

  /** The query's affine-offset constant Σ ⌊q_i·mn_i·2²⁴⌋ — exact
    * integer, same per-dim floor-then-sum both engines. */
  def mqOf(q: Array[Float], mn: Array[Double]): Long = {
    var acc = 0L
    var i = 0
    val n = math.min(q.length, mn.length)
    while (i < n) {
      acc += math.floor(q(i).toDouble * mn(i) * AdcScale).toLong
      i += 1
    }
    acc
  }
}
