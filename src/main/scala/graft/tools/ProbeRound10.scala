package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 10× linearity probe for the round-10 additions — the sketch tier,
  * WordPiece, Kneser–Ney, Moore–Lewis, the two-pass quota, and the v5
  * composition — [[ProbeNewOps]]'s methodology (per-replica Caesar
  * rotation keeps replica vocabularies disjoint so model/gram tables
  * grow like real web text; lineitem replicates by key offset so
  * distinct-order cardinality genuinely ×10s).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ProbeRound10
  *
  * Measured at sf0.1 (docs 5k → 50k, lineitem 600k → 6M, local[32],
  * 2026-08-14, median of 3 after warmup; per the ProbeNewOps
  * convention, memoized models/snapshots re-time STEADY-STATE compute —
  * the one-off training/LM cost shows up in the bench gate instead):
  *  - sketch_hll          1.06 s → 0.97 s (~1× for 10×!) — the 6M-row
  *    scan rides 32-way parallel under job overhead; the SKETCH state is
  *    structurally constant: 768 register rows (3 groups × 256) at BOTH
  *    scales (printed), the register shuffle ≤ groups×256 rows forever.
  *    Estimate errors 0.4–6.0% at ×1 and 0.8–7.0% at ×10 — error does
  *    NOT grow with corpus, the HLL contract.
  *  - sketch_cms_topk     0.61 s → 0.72 s (1.2×) — tf grows with
  *    distinct bigrams (disjoint replica vocabularies), the counter
  *    grid stays 4×256 rows at both scales.
  *  - pipe_wordpiece_train 0.07 s → 0.04 s / _apply 0.18 s → 0.11 s —
  *    model memoized; the measured path is the model-artifact DF build
  *    and the distinct-word encode, both corpus-size-free.
  *  - pipe_lm_kneser_ney  0.53 s → 0.59 s (1.1×) — count/type tables
  *    combiner-build; doc side pre-aggregated to bigram types.
  *  - pipe_moore_lewis    0.03 s → 0.05 s — memoized doc-level score
  *    snapshot; the LM-chain cost is the KN/perplexity family's, above.
  *  - pipe_domain_quota_2pass 0.25 s → 0.29 s (1.2×) — count pass +
  *    map filter are parallel scans; the exact-rank window sees only
  *    quota·slack expected survivors per domain at both scales.
  *  - pipe_curate_v5      0.44 s → 0.42 s (1×) — selection reads the
  *    memoized scores; the tail windows only quota survivors.
  *  - pipe_pagerank       0.69 s → 1.18 s (1.7×) — each power iteration
  *    is one src-keyed join + one dst-keyed aggregate, linear in |E| by
  *    construction; the 10× edge list costs proportionally.
  *  - pipe_weighted_sample 0.10 s → 0.13 s / pipe_span_corrupt
  *    0.21 s → 0.25 s / pipe_fim_transform 0.11 s → 0.10 s /
  *    mm_scene_cuts 0.11 s → 0.11 s — all map-only (+ a TakeOrdered or
  *    masked-block window), flat under 32-way parallelism.
  *  - sketch_hll_window   0.46 s → 0.45 s (1×) — weekly registers and
  *    the roll-up are groups×256 rows regardless of event volume.
  * Nothing exceeds 1.7× wall for 10× data on a fixed box (and that one
  * is the |E|-linear PageRank iteration) — no candidate-join or
  * per-row-window blowup; the sketch state-constancy lines are the
  * structural evidence the wall-clock ratios corroborate.
  */
object ProbeRound10 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Unit): Unit =
      ProbeKit.median3("r10", label)(f)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val nDocs = docs.count()
    val nLi = li.count()
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, i: Int): String = s.drop(i % 26) + s.take(i % 26)
    def replicatedDocs(k: Int): DataFrame =
      (0 until k).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", translate(col("text"),
          alpha + alpha.toUpperCase,
          rot(alpha, i * 7) + rot(alpha, i * 7).toUpperCase)))
        .reduce(_.unionAll(_))
    def replicatedLi(k: Int): DataFrame =
      (0 until k).map(i => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
        .reduce(_.unionAll(_))
    val ev = spark.read.parquet(s"$dir/events.parquet")
    def replicatedEv(k: Int): DataFrame =
      (0 until k).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_.unionAll(_))

    for (k <- Seq(1, 10)) {
      val tmpPath = java.nio.file.Files.createTempDirectory(s"r10x$k")
      val tmp = tmpPath.toString
      try {
        replicatedDocs(k).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
        replicatedLi(k).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
        replicatedEv(k).write.mode("overwrite").parquet(s"$tmp/events.parquet")
        println(s"[r10] corpus x$k = ${nDocs * k} docs, ${nLi * k} lineitems")
        // pipe_cluster_balance is absent on purpose: it runs on the
        // (unreplicated) embeddings table — assignment cost is the ANN
        // tier's, probed by ProbeAnn/ProbeSemantic; its own window is
        // quota-bounded per cell by construction
        for (q <- Seq("sketch_hll", "sketch_cms_topk", "pipe_wordpiece_train",
            "pipe_wordpiece_train_apply", "pipe_lm_kneser_ney",
            "pipe_moore_lewis", "pipe_domain_quota_2pass", "pipe_curate_v5",
            "pipe_pagerank", "pipe_weighted_sample", "pipe_span_corrupt",
            "pipe_fim_transform", "mm_scene_cuts", "sketch_hll_window")) {
          val run = graft.SparkEntry.queries(q)
          run(spark, tmp).count() // warm: codegen + parquet footers + memos
          time(s"x$k $q")(run(spark, tmp).count(): Unit)
        }
        // sketch state-constancy diagnostics: register/counter tables must
        // NOT grow with the corpus — that is what makes them sketches
        val keyed = spark.read.parquet(s"$tmp/lineitem.parquet")
          .select(col("l_returnflag").as("grp"),
            col("l_orderkey").cast("string").as("k"))
        val regRows = graft.ops.Sketch
          .hllRegisters(keyed, col("grp"), col("k")).count()
        val errs = graft.queries.SketchQueries.sketch_hll(spark, tmp)
          .select(col("grp"), col("err_ppm")).collect()
          .map(r => s"${r.getString(0)}=${r.getLong(1) / 10000.0}%").mkString(" ")
        println(s"[r10]   x$k HLL register rows: $regRows (groups x 256 cap); errors: $errs")
      } finally ProbeKit.deleteRecursively(tmpPath)
    }
    spark.stop()
  }
}
