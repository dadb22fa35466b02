package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece training (Schuster & Nakajima 2012, "Japanese and Korean
  * Voice Search"; the BERT tokenizer) — the third trained-tokenizer
  * family next to [[Bpe]] and [[Unigram]]. The loop is BPE's with one
  * change that changes everything: the merge candidate is not the most
  * FREQUENT pair but the pair maximizing the likelihood gain
  * `count(pair) / (count(left) · count(right))` — rare symbols that
  * almost always co-occur merge first, so affixes win over mere
  * frequency.
  *
  * Determinism: the score is quantized once to an integer —
  * `cnt · 10^12 DIV (c_left · c_right)` with the product widened to
  * DECIMAL(38,0) before the truncating division (Spark `DIV` ≡ DuckDB
  * `//`; the widening is the [[Mixture]] DECIMAL discipline — at the
  * 100 TB design point `cnt · 10^12` overflows BIGINT where an engine
  * would wrap silently). Ties break on pair text. Score ≤ 10^12 always
  * (cnt ≤ min(c_left, c_right)), so the quantized value itself stays
  * comfortably BIGINT.
  *
  * Scale shape — identical to [[Bpe.train]]: ONE corpus collapse to the
  * word-frequency table (localCheckpoint cuts lineage), then every round
  * is vocabulary-sized (re-segment distinct words via the tight-loop
  * [[graft.exprs.WordPieceSyms]] replay, one symbol-count aggregate, one
  * pair-count aggregate, a TakeOrdered argmax of ONE row to the driver —
  * a model artifact, not a data collect).
  */
object Wordpiece {

  /** Initial WordPiece symbols of `w`: codepoints, `##`-prefixed past
    * the first ([[graft.exprs.WordPiece.initSyms]] as a column). */
  private def initSymsCol(w: Column): Column =
    when(length(w) >= 1,
      transform(sequence(lit(1), length(w)),
        i => when(i === 1, substring(w, i, lit(1)))
          .otherwise(concat(lit("##"), substring(w, i, lit(1))))))
      .otherwise(array().cast("array<string>"))

  /** Segmentation of `word` under a learned merge list — training
    * replay (see [[graft.exprs.WordPieceSyms]]). */
  def syms(word: Column, merges: Seq[String]): Column = {
    import graft.exprs.exprs.{toColumn, toExpr}
    toColumn(graft.exprs.WordPieceSyms(toExpr(word), merges))
  }

  /** Greedy longest-match-first encode against a final vocabulary — the
    * inference path (see [[graft.exprs.WordPieceEncode]]). */
  def encode(word: Column, vocab: Seq[String]): Column = {
    import graft.exprs.exprs.{toColumn, toExpr}
    toColumn(graft.exprs.WordPieceEncode(toExpr(word), vocab))
  }

  /** The full WordPiece training loop: `iterations` rounds of
    * count-symbols + count-pairs → pick the argmax likelihood-gain score
    * → merge it everywhere. Returns `(merge table, words)` where the
    * merge table is `(iter, pair, cnt, ca, cb, score_q)` in learning
    * order (pair counts, both component symbol counts, and the quantized
    * score — the full evidence an oracle replays), and `words` is the
    * checkpointed `(w, freq)` table for callers that immediately encode
    * (the [[Bpe.trainWithVocab]] contract). Stops early when no adjacent
    * pair remains. */
  def trainWithVocab(df: DataFrame, toks: Column,
      iterations: Int): (DataFrame, DataFrame) = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    val sp = df.sparkSession
    val words = df.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, Long)]
    var exhausted = false
    for (_ <- 1 to iterations if !exhausted) {
      val segCol =
        if (merges.isEmpty) initSymsCol(col("w"))
        else syms(col("w"), merges.map(_._1).toSeq)
      val seg = words.select(col("freq"), segCol.as("syms"))
        .localCheckpoint(eager = false) // two consumers: symbol + pair counts
      val symTab = seg
        .select(col("freq"), explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(sum(col("freq")).as("c"))
      val pairs = seg
        .select(col("freq"), explode(Dedup.gramArray(col("syms"), 2)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .withColumn("a", split(col("pair"), " ").getItem(0))
        .withColumn("b", split(col("pair"), " ").getItem(1))
        .join(symTab.select(col("s").as("a"), col("c").as("ca")), "a")
        .join(symTab.select(col("s").as("b"), col("c").as("cb")), "b")
        .select(col("pair"), col("cnt"), col("ca"), col("cb"),
          expr("CAST(cnt AS DECIMAL(38,0)) * 1000000000000" +
            " DIV (CAST(ca AS DECIMAL(38,0)) * CAST(cb AS DECIMAL(38,0)))")
            .as("score_q"))
        .orderBy(col("score_q").desc, col("pair").asc).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else merges += ((best(0).getString(0), best(0).getLong(1),
        best(0).getLong(2), best(0).getLong(3), best(0).getLong(4)))
    }
    import sp.implicits._
    (merges.toSeq.zipWithIndex
      .map { case ((p, cnt, ca, cb, sq), i) =>
        ((i + 1).toLong, p, cnt, ca, cb, sq)
      }
      .toDF("iter", "pair", "cnt", "ca", "cb", "score_q"), words)
  }

  /** [[trainWithVocab]]'s merge table only. */
  def train(df: DataFrame, toks: Column, iterations: Int): DataFrame =
    trainWithVocab(df, toks, iterations)._1

  /** Final vocabulary for [[encode]]: every base symbol the corpus
    * alphabet produces (first-position and `##` forms) plus each merge's
    * output text, derived from the collected merge table rows' pair
    * strings. `alphabet` is the distinct-symbol collect (alphabet-sized,
    * a model artifact). */
  def vocabFrom(alphabet: Seq[String], mergePairs: Seq[String]): Seq[String] =
    alphabet ++ mergePairs.map { p =>
      val Array(a, b) = p.split(" ", 2)
      graft.exprs.WordPiece.mergedText(a, b)
    }

  /** The corpus alphabet in WordPiece form: distinct initial symbols of
    * the distinct-word table — alphabet-sized collect. */
  def alphabet(words: DataFrame): Seq[String] =
    words.select(explode(initSymsCol(col("w"))).as("s"))
      .distinct().orderBy(col("s")).collect().map(_.getString(0)).toSeq
}
