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

  /** The full unigram hard-EM training loop (Kudo 2018 §3.2, Viterbi
    * flavor — the third oracle-replayed training loop next to
    * [[Bpe.train]] and [[Ann.kmeansTrain]]): start from [[seedVocab]],
    * then per round (1) Viterbi-segment every distinct word under the
    * CURRENT costs, (2) count pieces frequency-weighted, (3)
    * re-estimate costs from the counts and PRUNE multi-character pieces
    * whose Viterbi count hit zero. Single characters never prune and
    * their counts floor at 1 (a Laplace floor on the alphabet — the
    * completeness guarantee [[graft.exprs.UnigramEncode]]'s null
    * contract needs survives every round), so every word stays
    * coverable.
    *
    * Update rule, exactly (restated by the unrolled oracle):
    *   cnt_r(p)  = Σ_w freq(w) · occurrences of p in viterbi_r(w)
    *   adj_r(p)  = max(cnt_r(p), 1) if |p| = 1 else cnt_r(p)
    *   vocab_r+1 = { (p, ⌊-ln(adj/Σadj)·10⁶⌋) : adj_r(p) > 0 }
    * The one ln per piece uses StrictMath.log — the same function
    * Catalyst's log expression evaluates, so driver-side re-estimation
    * is bit-identical to the in-plan form ([[seedVocab]]) and to the
    * oracle's ln.
    *
    * Scale shape: each round is ONE vocabulary-sized job (distinct-word
    * encode through the tight-loop expression, piece-keyed count
    * aggregate) plus model-table arithmetic on the driver — counts and
    * costs are model artifacts (V + alphabet rows), never corpus data.
    * Output: (iter, piece, cnt, cost_q) — round r's re-estimated
    * vocabulary, i.e. the model entering round r+1. */
  def train(words: DataFrame, maxPieceLen: Int, topV: Int,
      iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sp = words.sparkSession
    var vocab: Seq[(String, Long)] =
      seedVocab(words, maxPieceLen, topV)
        .select(col("piece"), col("cost_q"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    for (r <- 1 to iterations) {
      val counts: Map[String, Long] = words
        .withColumn("pieces", encode(col("w"), vocab, maxPieceLen))
        .select(explode(col("pieces")).as("piece"), col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      val adj = vocab.map { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        p -> (if (p.codePointCount(0, p.length) == 1) math.max(c, 1L) else c)
      }.filter(_._2 > 0)
      val total = adj.map(_._2).sum.toDouble
      val next = adj.map { case (p, c) =>
        (p, c, math.floor(-StrictMath.log(c.toDouble / total) * 1000000.0).toLong)
      }
      out ++= next.map { case (p, c, q) => (r.toLong, p, c, q) }
      vocab = next.map { case (p, _, q) => (p, q) }
    }
    import sp.implicits._
    out.toSeq.toDF("iter", "piece", "cnt", "cost_q")
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
