package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop predicates/counters over token arrays for the SEARCH hot
  * path — the compiled query predicate and the BM25 score expression.
  *
  * These replace the higher-order-function forms (`exists(terms, t ->
  * t.startsWith(p))`, `size(filter(terms, t -> t === tok))`, ...) that
  * Catalyst evaluates with one interpreted lambda call PER ELEMENT — the
  * measured ~10× per-element interpreter tax ([[TokenStats]] has the
  * history). The reference's equivalents are all compiled code: tantivy
  * evaluates prefix/fuzzy queries through precompiled automata over the
  * term dictionary and term frequencies through posting-list cursors
  * (`/root/reference/src/commands/search.rs:186-188`). One virtual call
  * per ROW here, with the whole element loop in plain JVM code.
  *
  * Null semantics mirror the HOF forms they replace: null array → null;
  * null ELEMENTS never match/count (the lambda forms produced null for
  * such elements, which `exists`/`filter` treat as a non-match — under a
  * WHERE or a `coalesce(score, 0)` the false-vs-null distinction is
  * invisible, and every caller sits under one of the two).
  */
object ArrayMatch {
  import graft.exprs.exprs.{toColumn, toExpr}

  /** Occurrences (with multiplicity) of `token` in the array — BM25 term
    * frequency. Replaces `size(filter(arr, x => x === token))`. */
  def count_token_eq(arr: Column, token: String): Column =
    toColumn(CountTokenEq(toExpr(arr), token))

  /** True iff some element starts with `prefix` (tantivy PrefixQuery over
    * indexed terms). Replaces `exists(arr, t => t.startsWith(prefix))`. */
  def any_starts_with(arr: Column, prefix: String): Column =
    toColumn(AnyStartsWith(toExpr(arr), prefix))

  /** True iff some element contains `needle` as a substring (raw-field
    * phrase fallback). Replaces `exists(arr, e => e.contains(needle))`. */
  def any_contains(arr: Column, needle: String): Column =
    toColumn(AnyContains(toExpr(arr), needle))

  /** True iff some element is within Levenshtein distance `dist` of
    * `needle` (tantivy FuzzyTermQuery). Replaces `exists(arr, t =>
    * levenshtein(t, needle) <= dist)` — same `UTF8String`
    * distance the builtin uses, with the threshold early-exit variant. */
  def any_levenshtein_le(arr: Column, needle: String, dist: Int): Column =
    toColumn(AnyLevenshteinLe(toExpr(arr), needle, dist))

  /** True iff some element falls within [lo, hi] (bound inclusivity per
    * flag; `None` = that side unbounded). Replaces `exists(arr, e => loP
    * && hiP)` for range queries over array fields. A bounded side whose
    * literal evaluates to null (unparseable bound) matches nothing. */
  def any_in_range(arr: Column, lo: Column, hi: Column,
      loIncl: Option[Boolean], hiIncl: Option[Boolean]): Column =
    toColumn(AnyInRange(toExpr(arr), toExpr(lo), toExpr(hi), loIncl, hiIncl))

  /** Number of distinct phrase occurrences (slop-windowed positional
    * matches, deduped on the word-0 position that anchors them). This is
    * tantivy's phrase frequency — the tf a PhraseScorer feeds BM25. */
  def phrase_freq(terms: Column, words: Seq[String], slop: Int): Column =
    toColumn(PhraseFreq(toExpr(terms), words, slop, Int.MaxValue))

  /** The slop-phrase PREDICATE: same match semantics as
    * `phrase_freq > 0`, but the scan stops at the first occurrence
    * instead of counting them all across a long document. */
  def phrase_any(terms: Column, words: Seq[String], slop: Int): Column =
    toColumn(PhraseFreq(toExpr(terms), words, slop, 1)) > 0
}

case class CountTokenEq(child: Expression, token: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val tok = UTF8String.fromString(token)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && tok.equals(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  override protected def withNewChildInternal(c: Expression): CountTokenEq = copy(child = c)
  override def prettyName: String = "count_token_eq"
}

case class AnyStartsWith(child: Expression, prefix: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val pre = UTF8String.fromString(prefix)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).startsWith(pre)) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(c: Expression): AnyStartsWith = copy(child = c)
  override def prettyName: String = "any_starts_with"
}

case class AnyContains(child: Expression, needle: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val sub = UTF8String.fromString(needle)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).contains(sub)) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(c: Expression): AnyContains = copy(child = c)
  override def prettyName: String = "any_contains"
}

case class AnyLevenshteinLe(child: Expression, needle: String, dist: Int)
    extends UnaryExpression with CodegenFallback {
  require(dist >= 0, "fuzzy distance must be non-negative")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val target = UTF8String.fromString(needle)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // threshold variant returns -1 when the distance exceeds `dist` —
      // same decision as `levenshtein(t, needle) <= dist`, with the
      // banded early exit
      if (!arr.isNullAt(i) &&
          arr.getUTF8String(i).levenshteinDistance(target, dist) >= 0) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(c: Expression): AnyLevenshteinLe = copy(child = c)
  override def prettyName: String = "any_levenshtein_le"
}

/** Range membership over an array field. `first` is the array; `second`/
  * `third` are the (constant-folded) bound literals, compared with the
  * element type's interpreted ordering — the same ordering Catalyst's own
  * comparison operators use, so Parquet-storage semantics (binary IPs,
  * timestamps as micros) carry over unchanged. */
case class AnyInRange(first: Expression, second: Expression, third: Expression,
    loIncl: Option[Boolean], hiIncl: Option[Boolean])
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val elemType: DataType =
    first.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arrAny = first.eval(input)
    if (arrAny == null) return null
    val lo = if (loIncl.isDefined) {
      val v = second.eval(input)
      if (v == null) return false // bounded side with unparseable literal
      v
    } else null
    val hi = if (hiIncl.isDefined) {
      val v = third.eval(input)
      if (v == null) return false
      v
    } else null
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val e = arr.get(i, elemType)
        val loOk = loIncl match {
          case None        => true
          case Some(true)  => ord.compare(e, lo) >= 0
          case Some(false) => ord.compare(e, lo) > 0
        }
        if (loOk) {
          val hiOk = hiIncl match {
            case None        => true
            case Some(true)  => ord.compare(e, hi) <= 0
            case Some(false) => ord.compare(e, hi) < 0
          }
          if (hiOk) return true
        }
      }
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): AnyInRange = copy(first = a, second = b, third = c)
  override def prettyName: String = "any_in_range"
}

/** Phrase frequency with slop, counting each physical occurrence ONCE.
  *
  * A start position i matches when every word j is found in its window —
  * `[i + max(0, j - slop), min(n-1, i + max(0, j - slop) + 2*slop)]`,
  * i.e. the window START is clipped at i and then spans 2*slop further
  * (deliberately wider than the naive `[i+j-slop, i+j+slop]` when
  * j < slop: this mirrors the slice-based HOF form the expression
  * replaced, so match SETS are bit-identical to it). Matches are then
  * deduped on the position word 0 actually matched at: with slop > 0,
  * up to 2*slop+1 adjacent starts find the SAME word-0 occurrence, and
  * counting all of them inflated sloppy-phrase BM25 tf relative to
  * tantivy's phrase_count, which counts each match once. First-found
  * word-0 positions are non-decreasing in i, so a single lastP0 register
  * dedupes in one pass. `phrase_freq > 0` is unchanged by the dedupe
  * (the first match is always counted), so predicate semantics are
  * identical to the HOF form for every input.
  *
  * `cap` bounds the count: the predicate path passes 1 (stop scanning at
  * the first occurrence), scoring passes MaxValue for the exact tf. */
case class PhraseFreq(child: Expression, words: Seq[String], slop: Int,
    cap: Int = Int.MaxValue)
    extends UnaryExpression with CodegenFallback {
  require(words.nonEmpty, "phrase needs at least one word")
  require(slop >= 0, "slop must be non-negative")
  require(cap > 0, "cap must be positive")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val ws: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = ws.length
    if (n < m) return 0
    var count = 0
    var lastP0 = -1
    var i = 0
    while (count < cap && i <= n - m) {
      var j = 0
      var ok = true
      var p0 = -1
      while (ok && j < m) {
        var p = i + math.max(0, j - slop)
        val end = math.min(n - 1, i + math.max(0, j - slop) + 2 * slop)
        var found = false
        while (!found && p <= end) {
          if (!arr.isNullAt(p) && ws(j).equals(arr.getUTF8String(p))) found = true
          else p += 1
        }
        if (found && j == 0) p0 = p
        ok = found
        j += 1
      }
      if (ok && p0 != lastP0) { count += 1; lastP0 = p0 }
      i += 1
    }
    count
  }

  override protected def withNewChildInternal(c: Expression): PhraseFreq = copy(child = c)
  override def prettyName: String = "phrase_freq"
}
