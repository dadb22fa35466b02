package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.ops.Ann

/** Measures where the serving-recall row's remaining loss lives at
  * sf0.1 (r17): the PROBE ceiling (exact ranking over the spilled,
  * probed candidate set — what recall would be with a perfect
  * quantizer) vs the ADC shortlist's share below it, for the residual
  * and raw trained-PQ constructions at several rerank/nprobe knobs.
  *
  * Measured 2026-08-15 (sf0.1: n=2000, nlist=45, spill=2, k=5):
  *   nprobe=14 (2·⌈√nlist⌉, the r16 row):
  *     ceiling (rerank=1M)   0.91
  *     residual rerank=256   0.91   <- AT the ceiling
  *     raw      rerank=256   0.90
  *   nprobe=21 (3·⌈√nlist⌉):
  *     ceiling 0.96 | residual 0.96 | raw 0.94
  *   nprobe=28 (4·⌈√nlist⌉):
  *     ceiling 0.99 | residual 0.98 | raw 0.96
  * Conclusion: at the r16 probe budget the row was PROBE-bound at 0.91
  * — residual encoding closes the quantizer gap to zero (its 256-slot
  * shortlist loses nothing vs exact ranking of the same candidates,
  * where the raw-trained codes still leaked 0.01-0.03), and the next
  * recall is bought by probes, not codes. The registry row therefore
  * moves to nprobe = 3·⌈√nlist⌉, where the residual shortlist still
  * tracks its ceiling exactly (0.96) — a declared 1.5× read-cost trade
  * the now-lossless shortlist makes worthwhile.
  */
object ProbeResidual {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
    val n = e.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toLong
    println(s"[probe] n=$n nlist=$nlist")

    // trainedCentroidsK's construction: seed window vid in [20, 20+nlist)
    val init = e.where(col("vid") >= 20L && col("vid") < 20L + nlist)
      .select(col("vid").as("cid"), col("v").as("cv"))
    val rounds = Ann.kmeansTrain(e.select(col("vid"), col("v")), init, 3)
    val cents = rounds.where(col("iter") === 3)
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("d"), col("cq")))).as("ds"))
      .select(col("cell").as("cid"),
        expr("transform(ds, x -> CAST(CAST(x.cq AS DOUBLE) / 1000000.0 AS FLOAT))")
          .as("cv"))
      .localCheckpoint()

    val truth = Ann.brute(
      e.where(col("vid") < 20).select(col("vid").as("qid"), col("v").as("qv")),
      e, k = 5).select(col("qid"), col("neighbor")).localCheckpoint()

    def recall(approx: DataFrame): Double = {
      val hits = truth.join(approx, Seq("qid", "neighbor")).count()
      hits.toDouble / truth.count()
    }
    def run(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = recall(f.select(col("qid"), col("neighbor")))
      println(f"[probe] $label%-42s recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val rcb = Ann.pqCodebooksTrained(Ann.residuals(e, cents), 4,
      seedLo = 20L, codewords = 256, iterations = 2)
    val cbRaw = Ann.pqCodebooksTrained(e, 4,
      seedLo = 20L, codewords = 256, iterations = 2)

    val rowNp = 2 * math.ceil(math.sqrt(nlist.toDouble)).toInt
    for (np <- Seq(rowNp, rowNp * 3 / 2, rowNp * 2)) {
      run(s"ceiling nprobe=$np (rerank=1M)")(
        Ann.ivfPqServing(e, _ < 20, cents, np, 2, 4, 1 << 20, 5,
          Some(rcb), residual = true))
      run(s"residual nprobe=$np rerank=256")(
        Ann.ivfPqServing(e, _ < 20, cents, np, 2, 4, 256, 5,
          Some(rcb), residual = true))
      run(s"raw      nprobe=$np rerank=256")(
        Ann.ivfPqServing(e, _ < 20, cents, np, 2, 4, 256, 5,
          Some(cbRaw)))
    }
    spark.stop()
  }
}
