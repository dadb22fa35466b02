package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Hot-cell stress probe for SemDeDup ([[Dedup.semantic]]) — the
  * adversarial shape the unguarded within-cell self-join cannot survive:
  * a degenerate clustering that assigns EVERY vector to one cell makes
  * candidate generation |corpus|²/2 cosine evaluations, while the salted
  * guard re-buckets the hot cell into ceil(n/cap) sub-cells and candidates
  * stay ~n·cap/2.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ProbeSemantic
  *
  * Measured (local[32], sf0.1 = 5,000 vectors forced into one cell):
  *  - unguarded (cap = n): 12,497,500 candidates (= n²/2) in 12.9s —
  *    quadratic; 50k vectors would be ~100× that (~1.2B cosines).
  *  - guarded (cap = 2048 default): 3 sub-cells, 4,165,094 candidates
  *    (~n·cap/2, 3.0× fewer) in 4.6s; full semantic() run 6.2s. Candidate
  *    volume scales LINEARLY in n at fixed cap — the bound the PlanSpec
  *    pin and the PipelineSpec hot-cell test enforce.
  *  - healthy cells (the fixture's real 10-label assignment, max 218/cell):
  *    guard provably inert — pair sets identical with cap 2048 vs cap 10⁶.
  */
object ProbeSemantic {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // the degenerate assignment: every vector in cell 0
    val hot = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), lit(0).as("cell"))
      .localCheckpoint(eager = true)
    val n = hot.count()
    println(s"[probe] corpus: $n vectors, ALL in one cell")

    val unguarded = time("unguarded candidates (cap = n)") {
      Dedup.embeddingCosine(hot, col("vec_id"), col("embedding"),
        col("cell"), threshold = -1.0, maxCellSize = n.toInt).count()
    }
    println(s"[probe]   unguarded: $unguarded (n²/2 = ${n * (n - 1) / 2})")

    val guarded = time("guarded candidates (default cap)") {
      Dedup.embeddingCosine(hot, col("vec_id"), col("embedding"),
        col("cell"), threshold = -1.0).count()
    }
    val subCells = math.ceil(n.toDouble / Dedup.DefaultMaxCellSize).toLong
    println(s"[probe]   guarded: $guarded across $subCells sub-cells " +
      f"(${unguarded.toDouble / guarded}%.1fx fewer)")

    time("guarded full semantic() run") {
      Dedup.semantic(hot, col("vec_id"), col("embedding"), col("cell"),
        threshold = 0.4).count()
    }

    // healthy-cell inertness: real labels, cap default vs effectively-off
    val real = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairSet(cap: Int) =
      Dedup.embeddingCosine(real, col("vec_id"), col("embedding"),
        col("label"), threshold = 0.4, maxCellSize = cap)
    val diff = pairSet(Dedup.DefaultMaxCellSize).exceptAll(pairSet(1000000))
      .union(pairSet(1000000).exceptAll(pairSet(Dedup.DefaultMaxCellSize)))
      .count()
    println(s"[probe] healthy-cell pair-set diff (cap on vs off): $diff (must be 0)")

    spark.stop()
  }
}
