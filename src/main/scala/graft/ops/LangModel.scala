package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality scoring (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"): train a bigram LM on a trusted corpus (CCNet uses Wikipedia;
  * here any boolean `isTrain` marker), score every document by its total
  * negative log-likelihood under the model, and keep the documents whose
  * per-bigram NLL is below a threshold — the "does this read like the
  * reference corpus" filter that runs after language id and before dedup
  * in a pretraining pipeline.
  *
  * Model: add-one-smoothed bigram probabilities
  * `p(w2|w1) = (c2(w1 w2) + 1) / (c1(w1) + V)` with `c2` the train bigram
  * count, `c1` the train count of `w1` as a bigram left-context, and `V`
  * the distinct-unigram vocabulary size of the train corpus (so unseen
  * contexts degrade to the uniform `1/V` floor instead of dividing by
  * zero).
  *
  * Engine-reproducibility (same discipline as [[Dsir]]): each bigram's
  * NLL is quantized ONCE — `floor(-ln(p) · 1e6)` as a 64-bit integer, a
  * pure function of the integer triple `(c2, c1, V)` — and a document's
  * score is the exact integer sum of quantized NLLs, immune to float
  * summation order across engines. Per-document NORMALIZATION stays
  * integral too: the keep decision `nll_q ≤ n_bigrams · perBigramNllQ`
  * is the threshold-crossed form of "average NLL below ln(ppl_max)",
  * computed without a single division.
  *
  * Scale shape: three combiner-friendly aggregates over the exploded
  * train bigram stream (bigram counts, left-context counts, a one-row
  * vocabulary size that rides the plan as a broadcast cross join — never
  * a collect); the document side pre-aggregates to (doc, bigram, count)
  * before the model join, so the gram-keyed shuffle carries distinct
  * doc-bigrams, not token positions. The model tables stay distributed —
  * at 100 TB the bigram table is itself huge, and the join runs
  * shuffle-hash on the gram key; only the 1-row vocab scalar broadcasts.
  */
object LangModel {

  /** Quantized-NLL bigram-LM scores for EVERY row of `df` (train rows
    * included — their scores are the fit diagnostic). `toks` is the
    * tokenized text, `isTrain` marks the trusted corpus, `perBigramNllQ`
    * is the keep threshold in quantized-NLL units (i.e. `ln(ppl_max)·1e6`
    * for a perplexity cutoff `ppl_max`). Output per input row:
    * `(<id>, n_bigrams, nll_q, keep)` — token-less and 1-token documents
    * have zero bigrams, score 0, and are kept (no evidence against). */
  def bigramNll(df: DataFrame, id: Column, toks: Column, isTrain: Column,
      perBigramNllQ: Long): DataFrame = {
    // one materialization: the train aggregates and the doc stream below
    // all re-derive their explodes from this compact snapshot
    val base = df
      .select(id.as("did"), toks.as("toks"), isTrain.cast("boolean").as("tr"))
      .localCheckpoint(eager = false)
    // (did, tr, g, w1): one row per bigram POSITION (gramArray is empty
    // below 2 tokens)
    val bg = base.select(col("did"), col("tr"),
        explode(Dedup.gramArray(col("toks"), 2)).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val train = bg.where(col("tr"))
    val c2 = train.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // distinct-unigram vocab of the train corpus: a 1-row aggregate that
    // stays in-plan as a broadcast cross join (never collected)
    val v = base.where(col("tr"))
      .select(explode(col("toks")).as("u"))
      .agg(count_distinct(col("u")).as("v"))
    // document side pre-aggregated to distinct (did, g) with counts, so
    // the model join shuffles doc-bigram TYPES, not positions
    val dg = bg.groupBy(col("did"), col("g"), col("w1"))
      .agg(count(lit(1)).as("cnt"))
    val qlp = floor(-log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * 1e6)
      .cast("long")
    val scored = dg
      .join(c2, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col("did")).agg(
        sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * qlp).as("nll_q"))
    base.select(col("did"))
      .join(scored, Seq("did"), "left")
      .select(col("did"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_q"), lit(0L)).as("nll_q"))
      .withColumn("keep",
        col("nll_q") <= col("n_bigrams") * lit(perBigramNllQ))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * Chen & Goodman 1998 interpolated form with fixed absolute discount
    * D = 0.75) — the LM-quality tier above add-one smoothing
    * ([[bigramNll]]) and stupid backoff ([[trigramNll]]): the lower-order
    * distribution is the CONTINUATION probability (how many distinct
    * contexts a word follows) rather than raw frequency, which is what
    * stops "francisco" (frequent, but only ever after "san") from
    * inflating unseen-context scores.
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·) + D·N1+(w1·)/c(w1·) · Pcont(w2)
    *   Pcont(w2) = (N1+(·w2) + 1) / (N_bigram_types + V)
    *
    * (+1/+V keeps Pcont positive for words never seen as continuations —
    * the same add-one floor [[bigramNll]] uses; a w1 outside the train
    * contexts backs off to Pcont alone, λ = 1.) Determinism follows the
    * module convention: the probability is one fixed-shape double
    * expression over exact integer counts, quantized ONCE to
    * `floor(−ln(p)·1e6)`, and summed as exact integers.
    *
    * Scale shape = [[bigramNll]]'s: four combiner aggregates over the
    * train bigram stream (c2, c1, and the two distinct-type counts from
    * ONE deduped bigram-type table), two 1-row scalars riding as
    * broadcast cross joins, doc side pre-aggregated to (doc, bigram)
    * types before the gram-keyed model join. Output per row:
    * `(did, n_bigrams, nll_q, keep)`. */
  def kneserNeyNll(df: DataFrame, id: Column, toks: Column, isTrain: Column,
      perBigramNllQ: Long): DataFrame = {
    val base = df
      .select(id.as("did"), toks.as("toks"), isTrain.cast("boolean").as("tr"))
      .localCheckpoint(eager = false)
    val bg = base.select(col("did"), col("tr"),
        explode(Dedup.gramArray(col("toks"), 2)).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
    val train = bg.where(col("tr"))
      .localCheckpoint(eager = false) // four aggregate consumers
    val c2 = train.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // distinct bigram TYPES once; both continuation-count tables and the
    // type-count scalar derive from it
    val types = train.select(col("w1"), col("w2")).distinct()
      .localCheckpoint(eager = false)
    val n1f = types.groupBy(col("w1")).agg(count(lit(1)).as("n1f"))
    val n1b = types.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val nbb = types.agg(count(lit(1)).as("nbb"))
    val v = base.where(col("tr"))
      .select(explode(col("toks")).as("u"))
      .agg(count_distinct(col("u")).as("v"))
    val dg = bg.groupBy(col("did"), col("g"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    // ONE fixed-shape double expression (identical text in the oracle):
    // IEEE ops over exact integer operands, quantized once
    val qlp = expr(
      """CAST(floor(-ln(
        |  CASE WHEN c1 IS NOT NULL THEN
        |    greatest(CAST(coalesce(c2, 0) AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
        |      + (0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE)) *
        |        (CAST(coalesce(n1b, 0) + 1 AS DOUBLE) / CAST(nbb + v AS DOUBLE))
        |  ELSE CAST(coalesce(n1b, 0) + 1 AS DOUBLE) / CAST(nbb + v AS DOUBLE) END
        |) * 1e6) AS BIGINT)""".stripMargin)
    val scored = dg
      .join(c2, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .join(n1f, Seq("w1"), "left")
      .join(n1b, Seq("w2"), "left")
      .crossJoin(broadcast(nbb))
      .crossJoin(broadcast(v))
      .groupBy(col("did")).agg(
        sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * qlp).as("nll_q"))
    base.select(col("did"))
      .join(scored, Seq("did"), "left")
      .select(col("did"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_q"), lit(0L)).as("nll_q"))
      .withColumn("keep",
        col("nll_q") <= col("n_bigrams") * lit(perBigramNllQ))
  }

  /** Min-K% prob membership inference (Shi et al. 2023, "Detecting
    * Pretraining Data from Large Language Models") — the contamination
    * AUDIT that complements decontamination: a document the model has
    * memorized scores suspiciously well even on its WORST tokens, so the
    * statistic is the mean NLL of the k% highest-NLL token positions.
    * Members (text inside the train corpus) sit far below non-members.
    *
    * Integer discipline throughout: per-(doc, bigram-type) quantized
    * NLLs from the [[bigramNll]] arithmetic, a per-doc window ordered by
    * (nll desc, bigram text) with a running position count, the boundary
    * type taken PARTIALLY (`take = min(cnt, ceil(n/5) − positions
    * before)` — the [[Mixture]] prefix-take pattern), and the final mean
    * as one truncating division. Output: (did, n_bigrams, mink_q) with
    * mink_q = 0 for bigram-less docs.
    *
    * Scale shape: the model tables and doc-type table are [[bigramNll]]'s;
    * the only addition is a doc-keyed window over each doc's OWN bigram
    * types (bounded by doc length, never corpus-global). */
  def minKProb(df: DataFrame, id: Column, toks: Column, isTrain: Column,
      kPercent: Int = 20): DataFrame = {
    require(kPercent > 0 && kPercent <= 100, s"bad kPercent $kPercent")
    val base = df
      .select(id.as("did"), toks.as("toks"), isTrain.cast("boolean").as("tr"))
      .localCheckpoint(eager = false)
    val bg = base.select(col("did"), col("tr"),
        explode(Dedup.gramArray(col("toks"), 2)).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val train = bg.where(col("tr"))
    val c2 = train.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = base.where(col("tr"))
      .select(explode(col("toks")).as("u"))
      .agg(count_distinct(col("u")).as("v"))
    val dg = bg.groupBy(col("did"), col("g"), col("w1"))
      .agg(count(lit(1)).as("cnt"))
    val qlp = floor(-log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * 1e6)
      .cast("long")
    val scoredTypes = dg
      .join(c2, Seq("g"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("did"), col("g"), col("cnt"), qlp.as("nllq"))
    val w = Window.partitionBy(col("did"))
      .orderBy(col("nllq").desc, col("g").asc)
    val run = sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, 0))
    val nDoc = sum(col("cnt")).over(Window.partitionBy(col("did")))
    val scored = scoredTypes
      .withColumn("n", nDoc)
      .withColumn("topn", expr(s"(n * $kPercent + 99) DIV 100")) // ceil
      .withColumn("run", run)
      .withColumn("take",
        greatest(lit(0L), least(col("cnt"), col("topn") - (col("run") - col("cnt")))))
      .where(col("take") > 0)
      .groupBy(col("did"))
      .agg(expr("CAST(sum(take * nllq) DIV max(topn) AS BIGINT)").as("mink_q"),
        max(col("n")).as("n_bigrams"))
    base.select(col("did"))
      .join(scored, Seq("did"), "left")
      .select(col("did"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("mink_q"), lit(0L)).as("mink_q"))
  }

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): score
    * every document with [[bigramNll]], then bucket each language's
    * documents into perplexity terciles — `head` = the best-fitting
    * (lowest-perplexity) third, `middle`, `tail`. CCNet trains on the
    * head bucket and uses middle/tail as progressively noisier pools.
    *
    * The per-document measure is the integer per-bigram NLL
    * `ppl_q = nll_q div n_bigrams` (0 for bigram-less docs — no evidence
    * against them, same stance as [[bigramNll]]'s keep). Boundaries are
    * `percentile_disc(1/3)` / `percentile_disc(2/3)` per language —
    * i.e. the smallest value whose cumulative count reaches ceil(n/3)
    * resp. ceil(2n/3) — computed EXACTLY without a corpus sort: one
    * histogram aggregate on (lang, ppl_q) (bounded by distinct quantized
    * scores, far below row count), a cumulative window over that
    * histogram (per-lang partitions of distinct VALUES, immune to the
    * corpus-level skew of a dominant language), and a broadcast of the
    * per-language boundary table back onto the scores (languages are
    * ISO-code-bounded — a few hundred rows at any corpus size).
    *
    * Output: `(did, lang, n_bigrams, nll_q, ppl_q, bucket)`. */
  def perplexityTerciles(df: DataFrame, id: Column, lang: Column,
      toks: Column, isTrain: Column): DataFrame = {
    // thread lang through bigramNll as part of a composite key so the
    // scores come back language-tagged without a second corpus join
    val scored = bigramNll(df, struct(id.as("i"), lang.as("l")), toks,
        isTrain, perBigramNllQ = 0L)
      .select(col("did.i").as("did"), col("did.l").as("lang"),
        col("n_bigrams"), col("nll_q"))
      .withColumn("ppl_q",
        when(col("n_bigrams") > 0, expr("nll_q div n_bigrams"))
          .otherwise(lit(0L)))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("ppl_q").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wLang = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val hist = scored.groupBy(col("lang"), col("ppl_q"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wLang))
    // percentile_disc positions: ceil(n/3) and ceil(2n/3), 1-based
    val bounds = hist.groupBy(col("lang")).agg(
      min(when(col("cum") >= expr("(n + 2) div 3"), col("ppl_q"))).as("t1"),
      min(when(col("cum") >= expr("(2 * n + 2) div 3"), col("ppl_q"))).as("t2"))
    scored.join(broadcast(bounds), Seq("lang"))
      .withColumn("bucket",
        when(col("ppl_q") <= col("t1"), lit("head"))
          .when(col("ppl_q") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("did"), col("lang"), col("n_bigrams"), col("nll_q"),
        col("ppl_q"), col("bucket"))
  }

  /** Trigram "stupid backoff" scorer (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the LM designed for
    * exactly this execution model: SCORES, not normalized
    * probabilities, no discount re-estimation, so the whole model is
    * three count tables that build in three combiner aggregates and
    * join distributed). Per trigram position (w1 w2 w3):
    *
    *   S = c3(w1w2w3) / c2(w1w2)          if the trigram was seen
    *     = 0.4 · c2(w2w3) / c1(w2)        else if the bigram was seen
    *     = 0.16 · (c1(w3)+1) / (N+V)      otherwise (Laplace floor —
    *                                       stupid backoff's 0.4² with
    *                                       a smoothed unigram, so S is
    *                                       always positive)
    *
    * quantized ONCE — floor(-ln(S)·10⁶) — then summed as exact
    * integers (the module discipline: per-doc totals are immune to
    * float summation order). `keep` thresholds the mean per-trigram
    * quantized NLL at `perTrigramNllQ`.
    *
    * Scale shape: counts are gram-keyed combiner aggregates over the
    * TRAIN side; the document side pre-aggregates to distinct
    * (doc, trigram) types, so each model join's fan-out is a gram's
    * document frequency (the [[bigramNll]] argument); the N/V scalars
    * ride as a 1-row broadcast. Output: (did, n_trigrams, nll_q,
    * keep) — one row per input document, trigram-less docs keep. */
  def trigramNll(df: DataFrame, id: Column, toks: Column, isTrain: Column,
      perTrigramNllQ: Long): DataFrame = {
    val base = df
      .select(id.as("did"), toks.as("toks"), isTrain.cast("boolean").as("tr"))
      .localCheckpoint(eager = false)
    val tg = base.select(col("did"), col("tr"),
        explode(Dedup.gramArray(col("toks"), 3)).as("g"))
      .withColumn("p12", substring_index(col("g"), " ", 2))
      .withColumn("s23", substring_index(col("g"), " ", -2))
      .withColumn("w2",
        substring_index(substring_index(col("g"), " ", 2), " ", -1))
      .withColumn("w3", substring_index(col("g"), " ", -1))
    val c3 = tg.where(col("tr")).groupBy(col("g")).agg(count(lit(1)).as("c3"))
    // bigram/unigram count tables each feed TWO joins (context and
    // backoff keys) — snapshot, the module self-join rule
    val cb = base.where(col("tr"))
      .select(explode(Dedup.gramArray(col("toks"), 2)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))
      .localCheckpoint(eager = false)
    val ug = base.where(col("tr")).select(explode(col("toks")).as("u"))
    val cu = ug.groupBy(col("u")).agg(count(lit(1)).as("cu"))
      .localCheckpoint(eager = false)
    val nv = ug.agg(count(lit(1)).as("n_tok"), count_distinct(col("u")).as("v"))
    val dg = tg.groupBy(col("did"), col("g"), col("p12"), col("s23"),
        col("w2"), col("w3"))
      .agg(count(lit(1)).as("cnt"))
    val qs = floor(-log(
        when(coalesce(col("c3"), lit(0L)) > 0,
          col("c3").cast("double") / col("c12").cast("double"))
        .when(coalesce(col("c23"), lit(0L)) > 0,
          lit(0.4) * col("c23").cast("double") / col("cw2").cast("double"))
        .otherwise(
          lit(0.16) * (coalesce(col("cw3"), lit(0L)) + 1).cast("double") /
            (col("n_tok") + col("v")).cast("double"))) * lit(1000000.0))
      .cast("long")
    val scored = dg
      .join(c3, Seq("g"), "left")
      .join(cb.select(col("b").as("p12"), col("cb").as("c12")), Seq("p12"), "left")
      .join(cb.select(col("b").as("s23"), col("cb").as("c23")), Seq("s23"), "left")
      .join(cu.select(col("u").as("w2"), col("cu").as("cw2")), Seq("w2"), "left")
      .join(cu.select(col("u").as("w3"), col("cu").as("cw3")), Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .groupBy(col("did"))
      .agg(sum(col("cnt")).as("n_trigrams"), sum(col("cnt") * qs).as("nll_q"))
    base.select(col("did"))
      .join(scored, Seq("did"), "left")
      .select(col("did"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("nll_q"), lit(0L)).as("nll_q"))
      .withColumn("keep",
        col("nll_q") <= col("n_trigrams") * lit(perTrigramNllQ))
  }
}
