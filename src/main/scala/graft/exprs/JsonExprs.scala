package graft.exprs

import java.util.Comparator

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSON-shaping expressions for the document engine's ingest and output
  * paths. These mirror reference behaviors that have no Spark builtin:
  *
  *  - [[JsonResidual]]: the `_dynamic` catch-all — every top-level key of
  *    the input document that is not a declared field, kept as one JSON
  *    object (`/root/reference/src/commands/index.rs:141-161`).
  *  - [[ExpandDotsJson]]: `{"a.b": 1}` ≡ `{"a": {"b": 1}}` normalization for
  *    dynamic_object fields (`src/config/dynamic_object.rs:39-45`).
  *  - [[MergeSortedJson]]: search-output assembly — declared fields merged
  *    with hoisted `_dynamic` keys, all object keys sorted alphabetically at
  *    every level, matching the reference's BTreeMap output
  *    (`src/commands/search.rs:25-94`).
  *
  * All are ingest-time (linear, per-row, off the query hot path) or
  * top-K-output-time (≤ limit rows), so CodegenFallback costs nothing
  * observable.
  */
object JsonSupport {
  // ObjectMapper is thread-safe after configuration.
  val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  /** Recursively sort object keys alphabetically (BTreeMap semantics). */
  def sortKeys(node: JsonNode): JsonNode = node match {
    case obj: ObjectNode =>
      val sorted = mapper.createObjectNode()
      val names = new java.util.ArrayList[String]()
      obj.fieldNames().forEachRemaining(n => names.add(n))
      names.sort(Comparator.naturalOrder())
      names.forEach(n => sorted.set[JsonNode](n, sortKeys(obj.get(n))))
      sorted
    case arr if arr.isArray =>
      val out = mapper.createArrayNode()
      arr.forEach(e => out.add(sortKeys(e)): Unit)
      out
    case other => other
  }

  /** Expand dotted keys into nested objects, recursively. */
  def expandDots(node: JsonNode): JsonNode = node match {
    case obj: ObjectNode =>
      val out = mapper.createObjectNode()
      obj.fields().forEachRemaining { e =>
        val parts = e.getKey.split("\\.")
        val v = expandDots(e.getValue)
        if (parts.length == 1) out.set[JsonNode](parts(0), v)
        else {
          var cur = out
          parts.dropRight(1).foreach { p =>
            cur = cur.get(p) match {
              case o: ObjectNode => o
              case _             => val n = mapper.createObjectNode(); cur.set[JsonNode](p, n); n
            }
          }
          cur.set[JsonNode](parts.last, v)
        }
      }
      out
    case arr if arr.isArray =>
      val out = mapper.createArrayNode()
      arr.forEach(e => out.add(expandDots(e)): Unit)
      out
    case other => other
  }
}

/** Top-level keys of `child` (a JSON object string) minus `declared`;
  * null when nothing remains or input isn't a JSON object. */
case class JsonResidual(child: Expression, declared: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  private lazy val declaredSet = declared.toSet

  override def nullSafeEval(v: Any): Any = {
    try {
      JsonSupport.parse(v.asInstanceOf[UTF8String].toString) match {
        case obj: ObjectNode =>
          val out = JsonSupport.mapper.createObjectNode()
          obj.fields().forEachRemaining { e =>
            if (!declaredSet.contains(e.getKey)) out.set[JsonNode](e.getKey, e.getValue)
          }
          if (out.isEmpty) null
          else UTF8String.fromString(JsonSupport.mapper.writeValueAsString(out))
        case _ => null
      }
    } catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): JsonResidual =
    copy(child = c)
  override def prettyName: String = "json_residual"
}

case class ExpandDotsJson(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    try {
      val expanded = JsonSupport.expandDots(
        JsonSupport.parse(v.asInstanceOf[UTF8String].toString))
      UTF8String.fromString(JsonSupport.mapper.writeValueAsString(expanded))
    } catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): ExpandDotsJson = copy(c)
  override def prettyName: String = "expand_dots_json"
}

/** Merge two JSON object strings (declared-fields JSON and `_dynamic`
  * JSON), hoisting the latter's keys to the top level, then emit with all
  * object keys sorted alphabetically at every nesting level. */
case class MergeSortedJson(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null && r == null) return null
    try {
      val base = if (l == null) JsonSupport.mapper.createObjectNode()
        else JsonSupport.parse(l.asInstanceOf[UTF8String].toString)
      val merged = base match {
        case obj: ObjectNode =>
          if (r != null) {
            JsonSupport.parse(r.asInstanceOf[UTF8String].toString) match {
              case dyn: ObjectNode =>
                dyn.fields().forEachRemaining(e => obj.set[JsonNode](e.getKey, e.getValue))
              case _ =>
            }
          }
          obj
        case other => other
      }
      UTF8String.fromString(
        JsonSupport.mapper.writeValueAsString(JsonSupport.sortKeys(merged)))
    } catch { case _: Exception => null }
  }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    throw new IllegalStateException("eval is overridden")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "merge_sorted_json"
}

/** Escape neutralization for tokenizing rendered JSON TEXT: rewrites every
  * escape unit into what it means for tokenization, so the output's
  * default-tokenizer token set equals the token set of the DECODED string
  * values regardless of which escaping convention the JSON writer picked.
  *
  *  - a `\uXXXX` unit (adjacent surrogate-pair units combined) becomes its
  *    decoded character when that character is a token character
  *    (`\p{L}\p{N}` — a writer that ASCII-escapes letters must not split
  *    tokens) and a single space otherwise (controls and punctuation are
  *    token separators);
  *  - every two-char escape (`\n`, `\t`, `\"`, `\\`, `\/`, ...) decodes to
  *    a token separator and becomes a space;
  *  - everything else copies through.
  *
  * Both the ingest-side catch-all terms / split term digests
  * ([[graft.config.SchemaDerivation.ingest]], over the Jackson-canonical
  * residual text) and the query-time `_dynamic`-path tokenization
  * ([[graft.query.QueryCompiler]], over Spark's variant rendering) run on
  * this one transform, so the two token streams cannot desynchronize —
  * tokenizing RAW rendered text glued escape chars onto adjacent tokens
  * (`"x\ny"` → `[x, ny]` while the digest held `[x, y]`), a wrong-prune
  * false negative (tantivy never misses an indexed term,
  * `/root/reference/src/commands/search.rs:186-188`). Tight per-row loop,
  * no regex.
  */
case class JsonEscapeNeutralize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  // \p{L} or \p{N} — the default tokenizer's token-character class
  private def isTokenChar(cp: Int): Boolean = Character.isLetter(cp) || {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  private def hex4(s: String, at: Int): Int = {
    var v = 0
    var j = at
    while (j < at + 4) {
      val d = Character.digit(s.charAt(j), 16)
      if (d < 0) return -1
      v = (v << 4) | d
      j += 1
    }
    v
  }

  private def emitUnit(out: java.lang.StringBuilder, u: Int): Unit =
    if (isTokenChar(u)) { out.appendCodePoint(u); () } else { out.append(' '); () }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val u = if (s.charAt(i + 1) == 'u' && i + 5 < n) hex4(s, i + 2) else -1
        if (u >= 0) {
          // surrogate pair written as two adjacent \uXXXX units
          val lo = if (Character.isHighSurrogate(u.toChar) && i + 11 < n &&
              s.charAt(i + 6) == '\\' && s.charAt(i + 7) == 'u') hex4(s, i + 8)
            else -1
          if (lo >= 0 && Character.isLowSurrogate(lo.toChar)) {
            val cp = Character.toCodePoint(u.toChar, lo.toChar)
            if (isTokenChar(cp)) out.appendCodePoint(cp) else out.append(' ')
            i += 12
          } else { emitUnit(out, u); i += 6 }
        } else { out.append(' '); i += 2 } // two-char escape → separator
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
  override protected def withNewChildInternal(c: Expression): JsonEscapeNeutralize =
    copy(c)
  override def prettyName: String = "json_escape_neutralize"
}

object JsonExprs {
  import graft.exprs.exprs.{toColumn, toExpr}

  def json_residual(c: Column, declared: Seq[String]): Column =
    toColumn(JsonResidual(toExpr(c), declared))
  def expand_dots_json(c: Column): Column = toColumn(ExpandDotsJson(toExpr(c)))
  def merge_sorted_json(declared: Column, dynamic: Column): Column =
    toColumn(MergeSortedJson(toExpr(declared), toExpr(dynamic)))
  def json_escape_neutralize(c: Column): Column =
    toColumn(JsonEscapeNeutralize(toExpr(c)))
}
