package graft.exprs

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Top-`take` nearest-centroid selection as ONE map-only tight-loop
  * expression over a BROADCAST centroid table — the IVF-family
  * assignment ([[graft.ops.Ann]]'s `(cosine desc, cid asc)` contract)
  * without either of the two shapes that kill it at scale:
  *
  *  - the `crossJoin(broadcast(cents)) + row_number().over(Window)`
  *    form shuffles n×k rows per assignment pass (at n = 10¹⁰ corpus
  *    vectors and k = √n = 10⁵ cells that is 10¹⁵ shuffled rows);
  *  - inlining every centroid as an expression LITERAL
  *    (`array(struct(lit...))` per centroid) builds a multi-hundred-MB
  *    Catalyst tree at 10⁵ cells × 768 dims — analysis itself becomes
  *    the bottleneck and codegen falls over long before.
  *
  * Here the centroid table ships ONCE per executor as a Spark broadcast
  * (the handle serializes in the task binary; `value` resolves
  * executor-side), and each row pays exactly k·dim multiply-adds in a
  * JIT-compiled while loop — no exchange, no literal bloat, plan size
  * independent of k.
  *
  * Arithmetic parity (oracle-pinned): per-centroid score is the exact
  * [[CosineSimilarity]] arithmetic — left-to-right double accumulation
  * over float inputs, `min(len)` element count — with a zero-denominator
  * (or all-null) score pinned to −2.0, strictly below every real cosine
  * (≥ −1), so malformed vectors sort below all real candidates and,
  * when nothing real exists, land deterministically in the lowest-cid
  * cells: byte-identical selections to both prior forms (the window's
  * `desc_nulls_last` + cid-asc ties, and the literal form's
  * `coalesce(cos, -2.0)`).
  *
  * CodegenFallback costs one virtual call per row; the k·dim loop body
  * is where the time goes and it JITs (the [[CosineSimilarity]]
  * rationale).
  */
case class NearestCells(child: Expression,
    cents: Broadcast[Array[(Long, Array[Float])]], take: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val cs = cents.value
    val s = math.min(take, cs.length)
    // top-s by (score desc, cid asc): insertion into a tiny sorted
    // buffer — s is the spill/probe knob, single digits in practice
    val bestC = new Array[Long](s)
    val bestS = new Array[Double](s)
    var filled = 0
    var ci = 0
    while (ci < cs.length) {
      val cid = cs(ci)._1
      val cv = cs(ci)._2
      val n = math.min(v.numElements(), cv.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = v.getFloat(i).toDouble
        val yi = cv(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      val score = if (den == 0.0) -2.0 else dot / den
      var pos = filled
      while (pos > 0 && (bestS(pos - 1) < score ||
          (bestS(pos - 1) == score && bestC(pos - 1) > cid))) pos -= 1
      if (pos < s) {
        var j = math.min(filled, s - 1)
        while (j > pos) { bestS(j) = bestS(j - 1); bestC(j) = bestC(j - 1); j -= 1 }
        bestS(pos) = score
        bestC(pos) = cid
        if (filled < s) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestC, filled))
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
  override def prettyName: String = "nearest_cells"
}

object NearestCells {
  import graft.exprs.exprs.{toColumn, toExpr}

  /** Array of the `take` nearest cell ids of `v` (cosine desc, cid asc)
    * against the broadcast centroid table. Null vector → null. */
  def nearest_cells(v: Column,
      cents: Broadcast[Array[(Long, Array[Float])]], take: Int): Column = {
    val vf = v.cast(ArrayType(FloatType))
    toColumn(NearestCells(toExpr(vf), cents, take))
  }
}
