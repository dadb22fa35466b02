package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{AnnIndex, Catalog}

/** Vector-serving probe — measures the IVF tier's scale contract: a
  * `knn --nprobe p` query over a trained index must READ ~p/cells of
  * the data files (partition pruning at the scan), pay latency in
  * proportion, and keep recall against the brute tier high.
  *
  * Builds an index from the testdata embeddings (2,000 × 64-dim at
  * sf0.1), trains with the default √n sizing (45 cells), then for the
  * first 20 vectors as queries measures files actually read (the
  * executed scan's post-prune numFiles metric — `df.inputFiles` lists
  * the PRE-prune catalog and always shows everything), wall-clock p50,
  * and recall@5 vs the brute tier.
  *
  * Run: runMain graft.tools.ProbeKnn [sfDir]
  *
  * Measured (local[32], sf0.1 embeddings = 2,000 vectors × 64 dims,
  * 45 trained cells (√n default), 20 queries, 2026-08-14 run):
  *  - train: 8.2 s (4 Lloyd's rounds + the one-time cell-partitioned
  *    rewrite, 45 partition dirs)
  *  - brute:       1 file (everything); p50 96 ms; recall 1.0 (truth,
  *    self included — the self match is free for every tier)
  *  - nprobe=1:    1/45 files; p50 64 ms; recall@5 0.32
  *  - nprobe=7:    7/45 files; p50 62 ms; recall@5 0.63  (√nlist rule)
  *  - nprobe=14:  14/45 files; p50 61 ms; recall@5 0.82
  * Files read track nprobe EXACTLY (the partition-pruning pin, also
  * asserted in CliSpec's PartitionFilters plan check). Recall here is
  * the honest query-disjoint number — chasing the 0.94 the registry
  * gate used to report led to the seed-contamination finding recorded
  * in [[ProbeKnnDiag]] (the gate's quantizer was seeded WITH the
  * evaluation queries; its seed is now disjoint and reports 0.50,
  * consistent with this probe modulo self-inclusion). At this corpus
  * size one split holds everything so brute latency is already flat;
  * the contract that matters at 100 TB is the files-read column — the
  * trained tier touches nprobe/cells of the data regardless of corpus
  * size, while brute touches all of it. */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("probe-knn").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: pk
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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val jsonl = Files.createTempFile("pk", ".jsonl")
    val lines = emb.select(to_json(struct(col("vid"), col("emb"))))
      .collect().map(_.getString(0))
    Files.write(jsonl, lines.mkString("\n").getBytes("UTF-8"))
    new graft.engine.Indexer(spark, cat).indexFile("pk", jsonl.toString)
    println(s"[probe-knn] indexed ${lines.length} vectors")

    val queries = emb.where(col("vid") < 20)
      .select(col("vid"), expr("transform(emb, x -> CAST(x AS FLOAT))"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val ann = new AnnIndex(spark, cat)

    // files actually READ by the executed scan: the post-partition-prune
    // numFiles metric (df.inputFiles lists the pre-prune catalog)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numFiles").map(_.value).getOrElse(0L)
      }.sum

    def run(tag: String, nProbe: Int): Map[Long, Set[String]] = {
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var files = -1L
      val results = queries.map { case (qid, qv) =>
        val df = ann.knn("pk", "emb", qv, 5, nProbe)
        val t0 = System.nanoTime()
        val rows = df.collect()
        times += (System.nanoTime() - t0) / 1e6
        if (files < 0) files = filesRead(df)
        qid -> rows.map(r =>
          // doc JSON carries vid; cheap driver-side extraction
          "\"vid\":(\\d+)".r.findFirstMatchIn(r.getString(1))
            .map(_.group(1)).getOrElse("?")).toSet
      }.toMap
      val p50 = times.sorted.apply(times.length / 2)
      println(f"[probe-knn] $tag%-10s files=$files%4d p50=$p50%7.1f ms")
      results
    }

    val t0 = System.nanoTime()
    // default sizing: cells = ceil(sqrt(n)) — the registry's measured
    // rule (knn_recall_scaled); probe sqrt(cells) to ride its curve
    val (cells, n) = ann.train("pk", "emb")
    println(f"[probe-knn] train: $cells cells over $n vectors in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    val truth = run("brute", nProbe = 0)
    val pMid = math.ceil(math.sqrt(cells.toDouble)).toInt
    for (p <- Seq(1, pMid, 2 * pMid)) {
      val got = run(s"nprobe=$p", p)
      val recall = queries.map { case (qid, _) =>
        val t = truth(qid); val g = got(qid)
        if (t.isEmpty) 1.0 else t.intersect(g).size.toDouble / t.size
      }.sum / queries.length
      println(f"[probe-knn]   recall@5 vs brute: $recall%.3f")
    }
    spark.stop()
  }
}
