package graft.exprs

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi-best segmentation of one word under a fixed unigram piece
  * model (Kudo 2018, "Subword Regularization" — the SentencePiece
  * unigram LM, hard-EM flavor): among all ways to cover the word with
  * vocabulary pieces, return the one minimizing total piece cost, where
  * `cost_q(piece) = ⌊-ln(p(piece)) · 10⁶⌋` is the integer-quantized
  * negative log-probability ([[graft.ops.LangModel]]'s discipline — the
  * DP then runs in exact integer arithmetic and reproduces on any
  * engine).
  *
  * Tie-break contract (what makes an all-paths oracle restatable): among
  * equal-cost segmentations, the one whose '|'-joined piece string is
  * lexicographically smallest. That choice is DP-compatible — two
  * distinct prefixes covering the same codepoints first differ at a
  * position where one has '|' and the other a word character (they
  * carry the same character subsequence), so their order is decided
  * inside the prefix and survives any common suffix; per-position
  * (cost, prefix-string) minimization is therefore globally optimal.
  * The comparison is UTF-8 BYTE order (UTF8String), not Java UTF-16
  * `compareTo`: the two differ for supplementary codepoints (UTF-16
  * sorts surrogates below U+E000..U+FFFF), and the public `unigram_encode`
  * SQL face accepts arbitrary vocabularies — byte order is what a
  * binary-collation oracle (DuckDB, tantivy) reproduces (r9 ADVICE).
  *
  * DP is O(len · maxPieceLen) table lookups per word, one virtual call
  * per row (the [[BpeEncode]] tight-loop pattern); the vocabulary rides
  * the expression as a model constant (bounded by vocab training, not
  * corpus data). Null word → null; empty word → empty array; a word
  * with a codepoint outside the vocabulary's character set → null (the
  * caller's vocabulary-completeness contract: seed vocabularies include
  * every corpus character).
  */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Long)],
    maxPieceLen: Int) extends UnaryExpression with CodegenFallback {
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  // '|' is the DP's internal path separator: a piece containing it would
  // mis-split the final piece array AND break the tie-break ordering
  // argument (piece strings would no longer first-differ at a
  // separator-vs-character position) — reject loudly, not corrupt
  require(vocab.forall(!_._1.contains('|')),
    "vocabulary pieces must not contain '|' (the segmentation separator); " +
      s"offending: ${vocab.collect { case (p, _) if p.contains('|') => p }.take(3).mkString(", ")}")
  // a piece longer than maxPieceLen can never be considered by the DP —
  // accepting it would silently return a "best" segmentation that ignores
  // the caller's cheapest pieces (the same silent-corruption class the
  // '|' require rejects)
  require(vocab.forall(p => p._1.codePointCount(0, p._1.length) <= maxPieceLen),
    s"vocabulary pieces must be <= maxPieceLen=$maxPieceLen codepoints; " +
      s"offending: ${vocab.collect {
        case (p, _) if p.codePointCount(0, p.length) > maxPieceLen => p
      }.take(3).mkString(", ")}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cost: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    // lowest cost wins on duplicate table entries
    vocab.foreach { case (p, c) =>
      val prev = m.get(p)
      if (prev == null || c < prev) m.put(p, c)
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    // codepoint-indexed symbols, so piece boundaries match engines that
    // count characters (not UTF-16 units)
    val cps = {
      val b = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n)
        i += n
      }
      b
    }
    val L = cps.length
    if (L == 0)
      return new GenericArrayData(Array.empty[Any])
    val bestCost = Array.fill[Long](L + 1)(Long.MaxValue)
    val bestFrom = Array.fill[Int](L + 1)(-1)
    bestCost(0) = 0L
    // the '|'-joined best path INTO position i, rebuilt from backpointers
    // — materialized only on exact cost ties (and at the end), so the
    // common no-tie case stays O(len · maxPieceLen) table lookups and
    // the tie comparison is byte-identical to comparing stored strings
    def pathStr(i: Int): String = {
      val sb = new java.lang.StringBuilder
      def walk(p: Int): Unit = if (p > 0) {
        val f = bestFrom(p)
        walk(f)
        if (f > 0) sb.append('|')
        var k = f
        while (k < p) { sb.append(cps(k)); k += 1 }
      }
      walk(i)
      sb.toString
    }
    var i = 1
    while (i <= L) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val j = i - l
        if (bestCost(j) != Long.MaxValue) {
          val piece = cps.slice(j, i).mkString
          val c = cost.get(piece)
          if (c != null) {
            val cand = bestCost(j) + c.longValue
            if (cand < bestCost(i)) {
              bestCost(i) = cand
              bestFrom(i) = j
            } else if (cand == bestCost(i)) {
              val candStr = if (j == 0) piece else pathStr(j) + "|" + piece
              if (UTF8String.fromString(candStr)
                    .compareTo(UTF8String.fromString(pathStr(i))) < 0)
                bestFrom(i) = j
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (bestCost(L) == Long.MaxValue) null
    else new GenericArrayData(
      pathStr(L).split('|').map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode =
    copy(child = c)
  override def prettyName: String = "unigram_encode"
}
