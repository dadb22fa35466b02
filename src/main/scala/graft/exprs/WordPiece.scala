package graft.exprs

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece (Schuster & Nakajima 2012; the BERT tokenizer family) —
  * the third trained-tokenizer family next to BPE ([[BpeEncode]]) and
  * unigram ([[UnigramEncode]]). Two expressions, mirroring how training
  * and inference genuinely differ in WordPiece:
  *
  *  - [[WordPieceSyms]]: the TRAINING-side segmentation — replay the
  *    learned merge list over a word, identical loop to [[BpeEncode]]
  *    except symbols carry the `##` continuation prefix and a merge
  *    strips the right component's `##` (rank-greedy replay ≡ sequential
  *    training application, the same argument as BPE: a merge's
  *    components always come from strictly earlier merges);
  *  - [[WordPieceEncode]]: the INFERENCE algorithm — greedy
  *    longest-match-first against the final vocabulary, `##`-prefixed
  *    past the first piece, whole word → `[UNK]` when any position fails
  *    to match (the reference WordPiece semantics, NOT merge replay —
  *    longest-match can segment differently than training did, which is
  *    why the two are separate expressions and separately gated).
  *
  * Both are tight JVM loops with the model riding as a constant (the
  * [[BpeEncode]] / [[Pq]] model-as-constant pattern): vocabulary-sized
  * state, one virtual call per row, no shuffle participation.
  */
object WordPiece {
  /** Continuation prefix — `##` can never collide with corpus symbols:
    * every tokenizer feeding these expressions strips punctuation, so
    * `#` does not survive into words. */
  val ContPrefix = "##"

  /** Codepoint-wise symbols of `w` with the continuation prefix on all
    * but the first — the WordPiece base segmentation. */
  private[graft] def initSyms(w: String): ArrayBuffer[String] = {
    val b = new ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      b += (if (i == 0) w.substring(i, i + n)
            else ContPrefix + w.substring(i, i + n))
      i += n
    }
    b
  }

  /** Merged symbol text: left + right-without-`##`. */
  private[graft] def mergedText(a: String, b: String): String =
    a + (if (b.startsWith(ContPrefix)) b.substring(ContPrefix.length) else b)
}

/** Segmentation of one word under a learned WordPiece merge list (pair
  * text space-joined, `##`-prefixed, rank = list position) — the
  * training replay. See [[WordPiece]] scaladoc for why this is distinct
  * from [[WordPieceEncode]]. Null word → null; empty → empty array. */
case class WordPieceSyms(child: Expression, merges: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => m.putIfAbsent(p, i) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    var syms = WordPiece.initSyms(w)
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestAt = j }
        j += 1
      }
      if (bestAt < 0) continue = false
      else {
        val a = syms(bestAt)
        val b = syms(bestAt + 1)
        val merged = WordPiece.mergedText(a, b)
        val out = new ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += merged; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out
        continue = syms.length >= 2
      }
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s): Any).toArray)
  }

  override protected def withNewChildInternal(c: Expression): WordPieceSyms =
    copy(child = c)
  override def prettyName: String = "wordpiece_syms"
}

/** Greedy longest-match-first WordPiece encoding of one word against a
  * fixed vocabulary — the reference inference loop: at each position take
  * the LONGEST vocabulary piece matching (with the `##` prefix required
  * past position 0); if no piece matches, the WHOLE word becomes `unk`;
  * words longer than `maxChars` codepoints are `unk` outright (the
  * standard max_input_chars_per_word guard — tokenizing a megabyte
  * "word" char-by-char is the classic crawl pathology). Null → null;
  * empty word → empty array. */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]", maxChars: Int = 100)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val vs: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    // codepoint boundaries (substr semantics are codepoint-based in both
    // engines; UTF-16 slicing would split surrogate pairs)
    val bounds = {
      val b = new ArrayBuffer[Int](w.length + 1)
      var i = 0
      b += 0
      while (i < w.length) { i += Character.charCount(w.codePointAt(i)); b += i }
      b
    }
    val nCp = bounds.length - 1
    def arr(pieces: Seq[String]): GenericArrayData =
      new GenericArrayData(pieces.map(s => UTF8String.fromString(s): Any).toArray)
    if (nCp == 0) return arr(Nil)
    if (nCp > maxChars) return arr(Seq(unk))
    val out = new ArrayBuffer[String]()
    var p = 0
    while (p < nCp) {
      var len = nCp - p
      var hit: String = null
      while (len >= 1 && hit == null) {
        val cand = (if (p == 0) "" else WordPiece.ContPrefix) +
          w.substring(bounds(p), bounds(p + len))
        if (vs.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null) return arr(Seq(unk))
      out += hit
      p += len
    }
    arr(out.toSeq)
  }

  override protected def withNewChildInternal(c: Expression): WordPieceEncode =
    copy(child = c)
  override def prettyName: String = "wordpiece_encode"
}
