package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Tight-loop signature computation for the dedup/ANN hot paths.
  *
  * Each expression replaces a multi-stage DataFrame shape with one
  * map-only projection per row:
  *  - [[SimHashSig]] subsumes explode → groupBy(doc, token-hash) →
  *    63 conditional sums → bit fold (two shuffles become zero);
  *  - [[LshSigs]] subsumes a planes×dim nest of interpreted `aggregate` /
  *    `zip_with` lambdas (~1000 interpreted calls per row);
  *  - [[WinnowFps]] subsumes gram-build → hash → slide → min → distinct
  *    (a monotonic deque, O(n) instead of O(n·w) slice/min lambdas).
  *
  * Values are bit-identical to the SQL forms they replace (md5-prefix
  * hashes, exact integer arithmetic, Spark `round` HALF_UP ties), so the
  * DuckDB oracles are unchanged.
  */
object SigExprs {
  import graft.exprs.exprs.{toColumn, toExpr}

  /** 63-bit SimHash over a token array (md5-derived 60-bit token hashes;
    * occurrences weighted). Empty arrays are the caller's concern — a
    * zero-token doc hashes to 0, which the caller should filter to match
    * the explode form that simply drops such docs. */
  def simhash_sig(toks: Column): Column = toColumn(SimHashSig(toExpr(toks)))

  /** Random-hyperplane LSH bucket signatures: `tables` longs, each
    * packing `planes/tables` sign bits of exact integer projections. */
  def lsh_sigs(vec: Column, planes: Int, tables: Int, dim: Int): Column =
    toColumn(LshSigs(toExpr(vec), planes, tables, dim))

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS local
    * algorithm) over a token array: hash every k-token gram (md5-60,
    * the engine-portable family), slide a window of `w` consecutive
    * gram hashes, select each window's MINIMUM, return the distinct
    * selected values ascending. Guarantee: two documents sharing any
    * run of >= k+w-1 tokens share a fingerprint. Null (filter before
    * use) when the doc has fewer than w grams. Subsumes gram-build →
    * hash → slide → min → distinct in ONE pass per row: the window min
    * is a monotonic deque (O(n) total, not O(n·w) interpreted slice/min
    * lambdas). */
  def winnow_fps(toks: Column, k: Int, w: Int): Column =
    toColumn(WinnowFps(toExpr(toks), k, w))

  /** First 15 md5 hex chars of a UTF-8 string as a 60-bit long — the
    * engine-portable hash family base (`Hashing.h64` / DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT`). */
  private[exprs] def md5Hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (v << 4) | ((d(7) & 0xffL) >> 4)
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "gram size and window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val numGrams = n - k + 1
    if (numGrams < w) return null
    // gram hashes: md5-60 of the space-joined k tokens (null tokens
    // skipped like concat_ws, matching the shingle/minhash gram text)
    val hs = new Array[Long](numGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < numGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (!arr.isNullAt(i + j)) {
          if (sb.length > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
        }
        j += 1
      }
      hs(i) = SigExprs.md5Hash60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    // monotonic deque sliding-window min; collect distinct selections
    val deque = new Array[Int](numGrams)
    var head = 0
    var tail = 0 // deque indices in [head, tail)
    val out = new java.util.TreeSet[java.lang.Long]
    i = 0
    while (i < numGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(deque(head)))
      i += 1
    }
    val res = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFps = copy(child = c)
  override def prettyName: String = "winnow_fps"
}

case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](63)
    var i = 0
    while (i < n) {
      // a null token hashes as 0 (all bits clear), matching the SQL
      // form's when(...).otherwise(-cnt) null semantics
      val h = if (arr.isNullAt(i)) 0L
        else SigExprs.md5Hash60(arr.getUTF8String(i).getBytes)
      var bit = 0
      while (bit < 63) {
        if (((h >> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 63) {
      if (counts(bit) > 0) sig |= 1L << bit
      bit += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig = copy(child = c)
  override def prettyName: String = "simhash_sig"
}

case class LshSigs(child: Expression, planes: Int, tables: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes % tables == 0, "planes must split evenly into tables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val weights: Array[Array[Long]] =
    Array.tabulate(planes, dim)((i, j) => graft.ops.Hashing.planeWeight(i, j + 1))

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"lsh_sigs expects array<float|double>, got $other")
  }

  /** Spark `round()` semantics exactly — one shared definition
    * ([[Pq.fixedPoint]]) so the oracle-critical rounding convention
    * cannot drift between the signature and quantization families. */
  private def fixedPoint(d: Double): Long = Pq.fixedPoint(d)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // The SQL form zip_with-padded any length mismatch and propagated any
    // null element into a null dot product, which IF(null > 0, ...) turned
    // into all-zero sign bits. Reproduce that: malformed vectors hash to
    // the all-zero signature instead of a partial dot.
    var malformed = n != dim
    val vs = new Array[Long](if (malformed) 0 else n)
    var j = 0
    while (!malformed && j < n) {
      if (arr.isNullAt(j)) malformed = true
      else {
        val d = if (elemIsFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        vs(j) = fixedPoint(d * 1000000.0)
        j += 1
      }
    }
    val perTable = planes / tables
    val sigs = new Array[Long](tables)
    if (!malformed) {
      var i = 0
      while (i < planes) {
        val w = weights(i)
        var dot = 0L
        j = 0
        while (j < n) { dot += vs(j) * w(j); j += 1 }
        if (dot > 0) sigs(i / perTable) |= 1L << (i % perTable)
        i += 1
      }
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): LshSigs = copy(child = c)
  override def prettyName: String = "lsh_sigs"
}
