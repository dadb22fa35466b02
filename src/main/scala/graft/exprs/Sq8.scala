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
}
