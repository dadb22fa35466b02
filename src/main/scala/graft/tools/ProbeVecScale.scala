package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{AnnIndex, Catalog, Indexer}

/** Vector-serving scale probe — the serving-tier counterpart of
  * [[ProbeScale100]]: the gated recall rows run at 500–5,000 vectors,
  * so this drives the REAL `train --sq8` → `knn`/`knnBatch` lifecycle
  * at 100× that (200k × 64-dim synthetic vectors, deterministic
  * integer-hash components — no RNG), measuring what the CLI tier
  * would cost on a corpus where brute force is already painful:
  *
  *  - train wall (k-means on the 256·k-capped sample + the one-pass
  *    cell-partitioned sq8 rewrite at k = ⌈√n⌉ = 448 cells);
  *  - single-query p50 and files read at nprobe = 2·⌈√k⌉ = 44
  *    (the partition-pruning contract at 448 dirs);
  *  - batch throughput: 100 queries through ONE knnBatch pass;
  *  - recall@5 vs exact brute force over all 200k (20 queries).
  *
  * Run: runMain graft.tools.ProbeVecScale [n] (default 200000)
  *
  * This probe's first run FOUND a scale flaw and drove a fix: the
  * layout writers used to fan out one parquet file per (write task ×
  * cell) — 64 files/cell here, 2,816 opens for a 44-probe query, knn
  * p50 1,284 ms, batch 145 ms/query. The cell-keyed repartition now in
  * [[graft.engine.AnnIndex]]'s writeCells (one exchange at
  * train/refresh/fold time, maxRecordsPerFile-chunked) collapses each
  * cell to one file and cut every read-side number below.
  *
  * Measured (local[32], 2026-08-15, n=200k, dim=64, sq8, spill=1,
  * AFTER the writeCells fix):
  *  - train: 76 s total (the 256·448-capped k-means + the 200k-row sq8
  *    encode + ONE cell-keyed shuffle + 448-dir partitioned write);
  *  - knn: p50 239 ms (was 1,284), files read = 88 = exactly
  *    nprobe × the two scans (rank + fetch) — the pruning contract
  *    holds at this directory count with one file per cell;
  *  - batch: 100 queries in 4.5 s = 45 ms/query amortized (was 145),
  *    5.3× the single-query rate;
  *  - recall@5 vs brute: 0.08 at nprobe=44/R=256 over 200k UNIFORM
  *    vectors ≈ the probe fraction 44/448 — the no-structure
  *    theoretical floor: uniform random vectors have no cluster
  *    structure, so IVF recall collapses to the fraction of cells
  *    probed. This is the honest adversarial case, NOT the operating
  *    point — the registry's real-embedding rows measure 0.91–0.96 at
  *    the same probe budget (knn_serving_recall*), and ProbeKnn's
  *    sf0.1 curve 0.82–0.94. An IVF user with structureless data
  *    should raise nprobe or use the brute/sq8-flat tier. */
object ProbeVecScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = 64
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("probe-vecscale").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: pv
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: vid
        |      type: !number
        |        type: i64
        |    - name: emb
        |      type: !number
        |        type: f64
        |      array: true
        |""".stripMargin)

    // synthetic corpus straight to a committed split: write the typed
    // parquet with the Indexer's own ingest path over a generated
    // DataFrame rendered as JSONL would be 200k driver strings — go
    // through a parquet temp + --format parquet instead (the CLI path)
    val gen = spark.range(n).select(col("id").as("vid"))
      .withColumn("emb", expr(
        s"""transform(sequence(0, ${dim - 1}), d ->
           |  CAST(pmod(vid * 2654435761 + d * 40503 + 13, 100000) AS DOUBLE)
           |  / 100000.0 - 0.5)""".stripMargin))
    val inDir = s"$root/gen.parquet"
    gen.write.mode("overwrite").parquet(inDir)
    val t0 = System.nanoTime()
    new Indexer(spark, cat).indexStructured("pv", inDir, "parquet")
    println(f"[probe-vecscale] ingested $n vectors in " +
      f"${(System.nanoTime() - t0) / 1e9}%.0f s")

    val ann = new AnnIndex(spark, cat)
    val t1 = System.nanoTime()
    val (cells, nTrained) = ann.train("pv", "emb", sq8 = true)
    println(f"[probe-vecscale] train --sq8: $cells cells over $nTrained " +
      f"vectors in ${(System.nanoTime() - t1) / 1e9}%.0f s")

    def qvOf(q: Long): Array[Float] = Array.tabulate(dim)(d =>
      ((((q + 500000L) * 2654435761L + d * 40503L + 13) % 100000L + 100000L)
        % 100000L) / 100000.0f - 0.5f)
    val nProbe = 2 * math.ceil(math.sqrt(cells.toDouble)).toInt

    // single-query p50 + files read (the pruning contract at 448 dirs)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: QueryStageExec        => scans(s.plan)
        case f: FileSourceScanExec    => Seq(f)
        case other                    => other.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan)
        .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    }
    var files = -1L
    val times = (0 until 10).map { q =>
      val df = ann.knn("pv", "emb", qvOf(q), 5, nProbe, rerank = 256)
      val s0 = System.nanoTime()
      df.collect(): Unit
      if (files < 0) files = filesRead(df)
      (System.nanoTime() - s0) / 1e6
    }.sorted
    println(f"[probe-vecscale] knn: p50 ${times(times.length / 2)}%.0f ms, " +
      f"files $files of $cells dirs at nprobe=$nProbe")

    // batch: 100 queries in one pass
    import spark.implicits._
    val qdf = (0L until 100L).map(q => (q, qvOf(q).toSeq)).toDF("qid", "qv")
    val t2 = System.nanoTime()
    val nb = ann.knnBatch("pv", "emb", qdf, 5, nProbe, rerank = 256)
      .collect().length
    val batchS = (System.nanoTime() - t2) / 1e9
    println(f"[probe-vecscale] batch: 100 queries in $batchS%.1f s " +
      f"($nb rows) = ${batchS * 10}%.0f ms/query amortized")

    // recall@5 vs brute over the full corpus, 20 queries
    val hits = (0 until 20).map { q =>
      val approx = ann.knn("pv", "emb", qvOf(q), 5, nProbe, rerank = 256)
        .collect().map(_.getString(1)).toSet
      val exact = ann.knn("pv", "emb", qvOf(q), 5)
        .collect().map(_.getString(1)).toSet
      exact.intersect(approx).size
    }.sum
    println(f"[probe-vecscale] recall@5 vs brute: ${hits / 100.0}%.2f " +
      f"(20 queries, worst-case uniform vectors)")
    spark.stop()
  }
}
