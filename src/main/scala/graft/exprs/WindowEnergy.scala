package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-window sum-of-squared-samples over a string payload's code units —
  * the frame-energy profile of the multimodal audio path — as one
  * tight-loop expression.
  *
  * Replaces `transform(split(text,''), ascii) → aggregate(slice(...))`:
  * Catalyst evaluates HOF lambdas interpreted per element, which costs
  * ~10× over a few hundred samples per row (and the indexed
  * `substring(text,i,1)` form is O(i) per access — quadratic per row).
  * Samples are unicode code points, matching `ascii()` here and `ord()`
  * in DuckDB (identical to raw bytes on an ASCII corpus; a real audio
  * decoder feeds PCM samples through the same shape).
  */
case class WindowEnergy(child: Expression, windowSize: Int)
    extends UnaryExpression with CodegenFallback {
  require(windowSize > 0, s"windowSize must be positive, got $windowSize")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.codePointCount(0, s.length)
    val windows = n / windowSize
    if (windows == 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](windows)
    var w = 0
    var idx = 0 // char index, advanced by code point
    while (w < windows) {
      var acc = 0L
      var j = 0
      while (j < windowSize) {
        val cp = s.codePointAt(idx)
        acc += cp.toLong * cp.toLong
        idx += Character.charCount(cp)
        j += 1
      }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "window_energy"
}

object WindowEnergy {
  import graft.exprs.exprs.{toColumn, toExpr}
  def window_energy(payload: Column, windowSize: Int): Column =
    toColumn(WindowEnergy(toExpr(payload), windowSize))
}
