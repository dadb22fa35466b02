package graft.exprs

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE encoding of one word under a fixed merge table — the
  * tokenize-the-corpus pass that follows [[graft.ops.Bpe.topPairs]]
  * training (Sennrich et al. 2016; the loop below is the reference
  * GPT-2 `bpe()` algorithm). Semantics, exactly:
  *
  *   symbols := the word's codepoints
  *   repeat:
  *     best := the lowest-rank adjacent symbol pair present in the table
  *     if none: stop
  *     merge EVERY occurrence of best in ONE left-to-right pass
  *     (after a merge the scan resumes past the merged pair, so in a
  *      run of overlapping occurrences the 1st, 3rd, ... merge — the
  *      parity rule an engine-portable oracle must restate)
  *
  * Merge keys are space-joined ("a b") to match the trainer's pair text;
  * symbols from any whitespace-splitting tokenizer never contain
  * spaces, so the join is unambiguous. Rank = position in `merges`.
  *
  * One virtual call per row, whole loop in plain JVM code (the
  * [[TokenStats]] tight-loop pattern); the merge table rides the
  * expression as a constant — it is a MODEL artifact (bounded by vocab
  * training, here 50 entries), not corpus data, the same way
  * [[Pq]] codebooks travel. Null word → null; empty word → empty array.
  */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    // first (lowest) rank wins on duplicate table entries
    merges.zipWithIndex.foreach { case (p, i) => m.putIfAbsent(p, i) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    var syms = {
      val b = new ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n)
        i += n
      }
      b
    }
    var continue = syms.length >= 2
    while (continue) {
      // lowest-rank adjacent pair present in the table
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
        val out = new ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += a + b; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out
        continue = syms.length >= 2
      }
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s): Any).toArray)
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}
