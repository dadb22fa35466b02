package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 10× corpus-growth probe for the ANN serving tier — the one operator
  * family the replication probes hadn't covered. Embeddings replicate
  * with offset ids, OFFSET LABELS (each replica keeps its own coarse
  * cells — corpus growth adds cells, the way a re-trained quantizer
  * scales k with corpus), and per-replica circular dimension shifts
  * (distinct vector content, norms preserved). The 20-query probe side
  * stays fixed: what's measured is serving cost as the CORPUS grows.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ProbeAnn
  *
  * Measured 2026-08-14 (2k → 20k vectors, median of 3 after warmup):
  * knn_cell 0.50 → 0.26 s, knn_lsh 0.61 → 0.45 s, knn_ivf 0.52 →
  * 0.37 s, knn_sq8_ivf 0.53 → 0.51 s, knn_ivf_pq 0.56 → 0.67 s — all
  * flat at 10× corpus, job overhead dominating throughout. Two distinct
  * reasons, worth keeping apart: cell/lsh are STRUCTURALLY flat (label
  * cells are per-replica, so each query's candidate set is its own
  * cell regardless of corpus size — the cells-grow-with-corpus
  * contract); the ivf family is flat here only because its fixed
  * replica-0 centroids leave 20 queries × 2 probes × ~n/16 candidates
  * — ~25k pairs at x10 — still far below fixed overhead. That
  * candidate count IS linear in the corpus under a fixed k, which is
  * why the trained path (kmeansTrain → knn_ivf_trained) re-sizes k as
  * the corpus grows; the candidate-bound pins in PlanSpec, not this
  * wall clock, carry that argument. */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Unit): Unit =
      ProbeKit.median3("ann", label)(f)

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = base.count()
    val dim = base.selectExpr("size(embedding)").first().getInt(0)
    def replicated(k: Int): DataFrame =
      (0 until k).map { i =>
        val sh = i % dim
        base
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("label", col("label") + lit(i * 1000))
          .withColumn("embedding",
            if (sh == 0) col("embedding")
            else expr(s"concat(slice(embedding, ${sh + 1}, ${dim - sh}), " +
              s"slice(embedding, 1, $sh))"))
      }.reduce(_.unionAll(_))

    for (k <- Seq(1, 10)) {
      val tmpPath = java.nio.file.Files.createTempDirectory(s"annp$k")
      val tmp = tmpPath.toString
      try {
        replicated(k).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
        println(s"[ann] corpus x$k = ${n * k} vectors")
        for (q <- Seq("knn_cell", "knn_lsh", "knn_ivf", "knn_sq8_ivf",
            "knn_ivf_pq")) {
          val run = graft.queries.PipelineQueries.all(q)
          run(spark, tmp).count() // warm
          time(s"x$k $q")(run(spark, tmp).count(): Unit)
        }
      } finally ProbeKit.deleteRecursively(tmpPath)
    }
    spark.stop()
  }
}
