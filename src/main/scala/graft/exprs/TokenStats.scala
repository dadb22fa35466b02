package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop token-array statistics for the text-analysis hot path.
  *
  * These replace higher-order-function forms (`filter(toks, t ->
  * t.isin(...))`, `transform(toks, h64) → aggregate(...)`) that Catalyst
  * evaluates with one interpreted lambda call PER ELEMENT — the measured
  * ~10× per-row interpreter tax that regressed the four cheap text ops in
  * round 2. One virtual call per ROW here, with the whole loop in plain
  * JVM code (the [[WindowEnergy]] pattern).
  */
object TokenStats {
  import graft.exprs.exprs.{toColumn, toExpr}

  /** Occurrences (with multiplicity) of array elements that belong to
    * `values`. Null elements don't count; null array → null. */
  def count_in_set(arr: Column, values: Seq[String]): Column =
    toColumn(CountInSet(toExpr(arr), values))

  /** Rabin-Karp rolling polynomial over the md5-derived 60-bit hash of
    * each token: acc_1 = h(t_1), acc_i = (acc_{i-1}·base + h(t_i)) mod
    * `mod`, where h(t) = first 15 md5 hex chars as a long, mod `mod` —
    * bit-identical to the DuckDB form
    * `('0x'||substr(md5(t),1,15))::BIGINT % mod`. Empty array or any null
    * element → null. */
  def rolling_token_hash(arr: Column, base: Long, mod: Long): Column =
    toColumn(RollingTokenHash(toExpr(arr), base, mod))
}

case class CountInSet(child: Expression, values: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  override protected def withNewChildInternal(c: Expression): CountInSet = copy(child = c)
  override def prettyName: String = "count_in_set"
}

case class RollingTokenHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression with CodegenFallback {
  require(mod > 1 && base > 0, "base and mod must be positive")
  // acc < mod throughout; acc*base + h must not overflow a long
  require(mod - 1 <= (Long.MaxValue - (mod - 1)) / base,
    s"base=$base mod=$mod could overflow the rolling accumulator")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = SigExprs.md5Hash60(arr.getUTF8String(i).getBytes) % mod
      acc = if (i == 0) h else (acc * base + h) % mod
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): RollingTokenHash = copy(child = c)
  override def prettyName: String = "rolling_token_hash"
}
