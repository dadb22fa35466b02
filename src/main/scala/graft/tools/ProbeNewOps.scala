package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 10× linearity probe for the round-9 additions — span scrub, tf-idf
  * keywords, unigram segmentation, domain quota, hybrid RRF — the
  * [[ProbeLinear]] methodology (per-replica Caesar rotation keeps
  * replica vocabularies disjoint, so gram/piece tables grow with the
  * corpus like real web text and no cross-replica duplicate spans are
  * manufactured; within-replica duplicate structure is preserved, which
  * is exactly what spanScrub must keep finding).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ProbeNewOps
  *
  * Measured at sf0.1 (5k → 50k docs, local[32], 2026-08-14 final run,
  * median of 3 after warmup; the x1 runs re-time the memoized
  * snapshots/models, so ratios compare steady-state compute):
  *  - text_span_scrub   0.30 s → 0.14 s — post-snapshot compute is
  *    gram-keyed aggregates + the HOF rebuild, fixed overhead dominates;
  *    max per-doc scrubbed tokens 99 at BOTH scales (the per-replica
  *    cipher keeps duplicate structure scale-constant, so the
  *    O(tokens × dup-starts) rebuild never concentrates).
  *  - text_tfidf_top    0.71 s → 1.24 s (1.7× for 10×) — tf and df
  *    aggregates grow with distinct (doc, term); sublinear.
  *  - pipe_unigram_seg / _counts  0.06/0.10 s → 0.06/0.11 s (~1×) —
  *    with the model memoized per (session, dir), the measured path is
  *    the map-only encode + piece aggregate; corpus-size-free because
  *    both run over the DISTINCT-word table. (Before the memo, each run
  *    retrained: 0.48 → 4.48 s linear — the training cost now shows up
  *    once, in pipe_unigram_train.)
  *  - pipe_unigram_train 0.46 s → 0.36 s (~1×) — both EM rounds run
  *    over the vocabulary-sized word-frequency table; corpus size only
  *    enters through the one memoized collapse, exactly the Bpe.train
  *    scale argument.
  *  - pipe_domain_quota 0.21 s → 0.16 s (~1×) — one window shuffle,
  *    per-domain partitions 10× but 32-way parallel.
  *  - pipe_hybrid_rrf   0.49 s → 0.35 s (~1×) — stats aggregate +
  *    TakeOrdered top-k; fusion is 20 rows at any corpus size.
  *  - pipe_bloom_decontaminate 0.13 s → 0.14 s (~1×) — filter build is
  *    benchmark-sized; the corpus side is one map pass against the
  *    broadcast word table.
  *  - pipe_lm_trigram   0.42 s → 0.57 s (1.4×) — three count tables
  *    build combiner-side; the model joins' fan-out is per-gram
  *    DOCUMENT frequency (doc side pre-aggregated to trigram types),
  *    scale-constant under disjoint replica vocabularies.
  *  - pipe_bpe_bytes (round 10) 0.63 s → 0.63 s (~1× for 10×) — the
  *    byte-level lifecycle inherits Bpe.train's scale argument: one
  *    corpus collapse to the pre-token frequency table, then
  *    vocabulary-sized rounds; the regex pre-tokenizer and byte remap
  *    are map-only.
  * None exhibits the super-linear blowup the probe exists to catch
  * (candidate joins, per-row windows, hot-key concentration).
  */
object ProbeNewOps {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Unit): Unit =
      ProbeKit.median3("newops", label)(f)

    val base = spark.read.parquet(s"$dir/documents.parquet")
    val n = base.count()
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, i: Int): String = s.drop(i % 26) + s.take(i % 26)
    def replicated(k: Int): DataFrame =
      (0 until k).map(i => base
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", translate(col("text"),
          alpha + alpha.toUpperCase,
          rot(alpha, i * 7) + rot(alpha, i * 7).toUpperCase)))
        .reduce(_.unionAll(_))

    // embeddings ride unreplicated for the hybrid probe's cosine arm —
    // its cost is the ANN tier's, probed separately; what this probe
    // watches is the BM25 arm + fusion growing with the corpus
    for (k <- Seq(1, 10)) {
      val tmpPath = java.nio.file.Files.createTempDirectory(s"newops$k")
      val tmp = tmpPath.toString
      try {
      replicated(k).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      println(s"[newops] corpus x$k = ${n * k} docs")
      // knn_ivfpq_trained / dedup_simhash_recall are absent on purpose:
      // the first runs on the (unreplicated) embeddings table — its
      // scale story is the ANN tier's, probed by ProbeSemantic/PlanSpec
      // pins — and the second's truth side is the declared-diagnostic
      // exact-Jaccard join, which a corpus replica would measure instead
      // of the gate itself
      for (q <- Seq("text_span_scrub", "text_tfidf_top", "pipe_unigram_seg",
          "pipe_unigram_counts", "pipe_unigram_train", "pipe_domain_quota",
          "pipe_hybrid_rrf", "pipe_bloom_decontaminate", "pipe_lm_trigram",
          "pipe_bpe_bytes")) {
        val run = graft.queries.PipelineQueries.all(q)
        run(spark, tmp).count() // warm: codegen + parquet footers
        time(s"x$k $q")(run(spark, tmp).count(): Unit)
      }
      // spanScrub skew diagnostic: the rebuild is O(tokens x dup-starts)
      // per doc, so report the worst per-doc duplicated-start count —
      // scale-constant per replica means the HOF rebuild stays bounded
      val scr = graft.ops.Dedup.spanScrub(
        spark.read.parquet(s"$tmp/documents.parquet")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenizeDefault(col("text")).as("toks")),
        col("doc_id"), col("toks"), k = 5)
      val worst = scr.agg(max(col("n_toks") - col("n_kept")).as("m"))
        .collect()(0).getLong(0)
      println(s"[newops]   max per-doc scrubbed tokens: $worst")
      } finally ProbeKit.deleteRecursively(tmpPath)
    }
    spark.stop()
  }
}
