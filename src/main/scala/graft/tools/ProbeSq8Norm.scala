package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.ops.Ann

/** Norm-adversarial SQ8 probe — does the asymmetric integer-dot
  * shortlist (which orders by reconstructed INNER PRODUCT) lose recall
  * against the cosine truth when the corpus has a wide norm spread?
  *
  * Fixture: the sf embeddings with every vector scaled by
  * `(vid % 10) + 1` — a deterministic 10× norm spread that leaves the
  * COSINE truth untouched (cosine is per-vector-scale invariant), so
  * any recall movement is purely the shortlist's inner-product bias:
  * high-norm vectors crowd the fixed-size shortlist ahead of
  * low-norm true neighbors, and the quantizer's per-dim range also
  * widens ~10× (coarser codes).
  *
  * Run: runMain graft.tools.ProbeSq8Norm [sfDir]
  *
  * Measured (2026-08-15, census sizing, spill=2, R=256):
  *  - sf0.1 (2000 vecs, nlist=45, nprobe=14): uniform norms 0.91;
  *    10× spread, inner-product rank 0.79 — the shortlist DOES lose
  *    low-norm true neighbors; 10× spread, normalized rank 0.91 —
  *    fully recovered.
  *  - sf0.01 (500 vecs, nlist=23, nprobe=10): 0.96 / 0.92 / 0.92 —
  *    at this size the shortlist barely cuts (candidates ≈ R), so the
  *    residual 0.92 is quantizer coarsening (the 10× spread widens the
  *    per-dim range 10×), which no rank key can recover.
  * These numbers motivated [[Ann.ivfSq8Serving]]'s `normRank` knob and
  * the gated `knn_serving_recall_sq8_norms` registry row.
  */
object ProbeSq8Norm {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> CAST(x AS FLOAT))").as("v"))
    val scaled = base.withColumn("v",
      expr("transform(v, x -> CAST(CAST(x AS DOUBLE) * (vid % 10 + 1) AS FLOAT))"))

    val n = base.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toLong
    val nProbe = 2 * math.ceil(math.sqrt(nlist.toDouble)).toInt

    def recall(corpus: DataFrame, normRank: Boolean): Double = {
      // seed-disjoint centroids from the corpus itself (the
      // knn_serving_recall sizing discipline, 3 k-means rounds)
      val seeds = corpus.where(col("vid") >= 20 && col("vid") < 20 + nlist)
        .select(col("vid").as("cid"), col("v").as("cv"))
      val rounds = Ann.kmeansTrain(
        corpus.select(col("vid"), col("v")), seeds, 3)
      val cents = rounds.where(col("iter") === 3)
        .groupBy(col("cell").as("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(d, cq))), " +
          "x -> CAST(CAST(x.cq AS DOUBLE) / 1000000.0 AS FLOAT))").as("cv"))
      val approx = Ann.ivfSq8Serving(corpus, _ < 20, cents,
          nProbe = nProbe, spill = 2, rerank = 256, k = 5,
          normRank = normRank)
        .select(col("qid"), col("neighbor"))
      val exact = Ann.brute(
        corpus.where(col("vid") < 20).select(col("vid").as("qid"),
          col("v").as("qv")),
        corpus.select(col("vid"), col("v")), k = 5)
        .select(col("qid"), col("neighbor"))
      val hits = exact.join(approx, Seq("qid", "neighbor")).count()
      hits.toDouble / (20.0 * 5.0)
    }

    println(f"[probe-sq8norm] corpus n=$n nlist=$nlist nprobe=$nProbe")
    println(f"[probe-sq8norm] uniform norms,  ip rank:   ${recall(base, normRank = false)}%.2f")
    println(f"[probe-sq8norm] 10x norm spread, ip rank:  ${recall(scaled, normRank = false)}%.2f")
    println(f"[probe-sq8norm] 10x norm spread, cos rank: ${recall(scaled, normRank = true)}%.2f")
  }
}
