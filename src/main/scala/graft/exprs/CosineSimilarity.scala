package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Cosine similarity over two float vectors as one tight-loop expression.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * composition: Catalyst evaluates HOF lambdas interpreted per element,
  * which costs ~10x on a 64-dim dot product in an ANN cross join. This
  * expression does the identical arithmetic (left-to-right double
  * accumulation over float inputs — bit-for-bit the same result as the
  * HOF fold) in a single eval call per row pair.
  *
  * CodegenFallback costs one virtual call per row; the loop body itself is
  * JIT-compiled, which is where the time goes in a top-K scan.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
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
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  import graft.exprs.exprs.{toColumn, toExpr}
  def cosine_similarity(x: Column, y: Column): Column = {
    val xf = x.cast(org.apache.spark.sql.types.ArrayType(FloatType))
    val yf = y.cast(org.apache.spark.sql.types.ArrayType(FloatType))
    toColumn(CosineSimilarity(toExpr(xf), toExpr(yf)))
  }
}
