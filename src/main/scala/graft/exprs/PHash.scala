package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit byte-grid perceptual hash over a string payload as one
  * tight-loop expression: 16 evenly spaced sample code points,
  * thresholded against their truncated mean, packed LSB-first.
  *
  * Replaces the `transform(sequence(0,15), ...) → aggregate → zip_with →
  * aggregate` HOF nest — Catalyst evaluates those lambdas interpreted per
  * element, the last such hot spot left in the pipeline queries. Values
  * are bit-identical to the SQL form: sample i is the code point at
  * 1-based character position `1 + (len * i) div 16` (`ascii(substring)`
  * in Spark, `ord(substr)` in DuckDB — identical on any corpus since both
  * read one code point), the mean is `sum div 16` (non-negative, so
  * truncation ≡ floor), and bit i is set when sample i exceeds the mean.
  */
case class PHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.codePointCount(0, s.length).toLong
    if (len == 0L) return java.lang.Long.valueOf(0L)
    val noSurrogates = len == s.length.toLong
    val samples = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < 16) {
      val cpIndex = ((len * i) / 16L).toInt // 0-based code-point index
      val cp =
        if (noSurrogates) s.charAt(cpIndex).toLong
        else s.codePointAt(s.offsetByCodePoints(0, cpIndex)).toLong
      samples(i) = cp
      sum += cp
      i += 1
    }
    val mean = sum / 16L
    var sig = 0L
    i = 0
    while (i < 16) {
      if (samples(i) > mean) sig |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): PHash16 = copy(child = c)
  override def prettyName: String = "phash16"
}

object PHash16 {
  import graft.exprs.exprs.{toColumn, toExpr}
  def phash16(payload: Column): Column = toColumn(PHash16(toExpr(payload)))
}
