package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer lifecycle — the second
  * tokenizer family next to [[Bpe]] (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates"): a piece VOCABULARY with probabilities, and per-word
  * Viterbi-best segmentation under it. The hard-EM training signal
  * (Viterbi piece counts, ready for the re-estimate step) falls out of
  * the same segmentation pass.
  *
  * Determinism: piece costs are integer-quantized once —
  * `cost_q = ⌊-ln(cnt/total) · 10⁶⌋` (the [[LangModel]] discipline) — so
  * the Viterbi DP is exact integer arithmetic; equal-cost segmentations
  * break by lexicographic piece string (see
  * [[graft.exprs.UnigramEncode]] for why that tie-break is
  * DP-compatible and oracle-restatable).
  *
  * Scale shape: the corpus collapses ONCE to its word-frequency table
  * (output ∝ vocabulary, the [[Bpe]] argument), seed-vocab substring
  * explosion runs over DISTINCT words weighted by frequency (≤ len ×
  * maxPieceLen pieces per word), the top-V cut is TakeOrdered, and the
  * trained vocabulary is a model artifact (V + alphabet rows) collected
  * to the driver and riding the encode expression as a constant —
  * segmentation itself is map-only.
  */
object Unigram {

  /** All substrings of `w` of length 1..maxLen (the seed-vocabulary
    * candidate set), codepoint-indexed in both engines. */
  private def substrArray(w: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1), least(lit(maxLen), length(w) - i + lit(1))),
        l => w.substr(i, l))))

  /** Seed vocabulary over a `(w, freq)` word-frequency table: the top-V
    * multi-character substrings by corpus count (ties by piece text) plus
    * EVERY single character (the completeness guarantee [[encode]]'s
    * null contract relies on), with quantized costs from the normalized
    * counts. Output: (piece, cnt, cost_q). */
  def seedVocab(words: DataFrame, maxPieceLen: Int, topV: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(topV >= 0, s"topV must be >= 0, got $topV")
    val subs = words
      .select(col("freq"), explode(substrArray(col("w"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      // two consumers (top cut + singles) — snapshot, module self-join rule
      .localCheckpoint(eager = false)
    val top = subs.where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(topV)
    val singles = subs.where(length(col("piece")) === 1)
    val vocab0 = top.unionByName(singles)
    // normalizer = Σ cnt over the CHOSEN vocabulary (SentencePiece's
    // convention); 1-row scalar attach, the Mixture/Dsir shape
    val tot = vocab0.agg(sum(col("cnt")).as("total"))
    vocab0.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor(-log(col("cnt").cast("double") / col("total").cast("double")) *
          lit(1000000.0)).cast("long").as("cost_q"))
  }

  /** Viterbi-best segmentation of `word` under the trained `vocab`
    * model — see [[graft.exprs.UnigramEncode]]. Returns the piece
    * array (null for words the vocabulary cannot cover). */
  def encode(word: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Column = {
    import graft.exprs.exprs.{toColumn, toExpr}
    toColumn(graft.exprs.UnigramEncode(toExpr(word), vocab, maxPieceLen))
  }
}
