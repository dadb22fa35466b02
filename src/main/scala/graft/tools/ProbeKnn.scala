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
  *  - train: 5.9 s (4 Lloyd's rounds + the one-time cell-partitioned
  *    rewrite, 45 partition dirs); spill=2 retrain 2.3 s
  *  - brute:       1 file (everything); p50 61 ms; recall 1.0 (truth,
  *    self included — the self match is free for every tier)
  *  - spill=1  nprobe=1:    1/45 files; p50 51 ms; recall@5 0.32
  *  - spill=1  nprobe=7:    7/45 files; p50 44 ms; recall@5 0.63
  *  - spill=1  nprobe=14:  14/45 files; p50 44 ms; recall@5 0.82
  *  - spill=2  nprobe=1:    1/45 files; p50 71 ms; recall@5 0.45
  *  - spill=2  nprobe=7:    7/45 files; p50 83 ms; recall@5 0.82
  *  - spill=2  nprobe=14:  14/45 files; p50 102 ms; recall@5 0.94
  *  - spill=2 pq=8 TRAINED codebooks (r16, 256 codewords/subspace,
  *    integer k-means — 2026-08-15 run): nprobe=7 R=default 0.80,
  *    R=256 0.82; nprobe=14 R=default 0.88, R=256 0.94 — AT the
  *    exact-vector tier's recall at the same probes. The pre-r16
  *    16-seed codebooks ceilinged at 0.57–0.79 (np=14/R=64 0.57,
  *    R=256 0.79); training the subquantizer removed the ceiling.
  *    PQ train cost: 32 s at this sf (one-time, sample-bounded at
  *    256·256 vectors so corpus-size-independent beyond that).
  *  - spill=2 pq=8 RESIDUAL codebooks (r17, IVFADC — 2026-08-16 run,
  *    hot box: brute p50 97 ms vs the r14 run's 61): np=14 R=256
  *    recall 0.95 = the SAME run's exact spill=2 tier exactly
  *    (np=14 0.95); np=14 R=default 0.90 vs the raw form's 0.88.
  *    Two honest shape notes: per-copy residual codes no longer
  *    parquet-dedup across spill copies, so the __code column reads
  *    74 KiB vs the raw form's 21 (still 27× under exact's 2,002),
  *    and serving pays nprobe tiny per-cell LUTs + a min-over-copies
  *    aggregate instead of one LUT + copy-dedup (p50 ~354 vs exact
  *    spill=2's 171 on this run — the same ~2× relationship the raw
  *    form measured).
  *  - spill=2 sq8 (r14): nprobe=7 → 0.82, nprobe=14 → 0.94 at BOTH
  *    R=64 and R=256 — identical to the exact tier at the same probes
  *    (int8 reconstruction is lossless for ranking at 64 dims), with
  *    none of PQ's ~0.77 codebook ceiling. The asymmetric form is what
  *    buys this: ranking stored codes against the UNQUANTIZED query's
  *    fixed-point weights orders by reconstructed inner product with
  *    the affine offset cancelled; the first cut (quantize the query,
  *    integer dot of two code vectors) measured 0.66–0.68 on the same
  *    data because the per-dim offsets bias the dot.
  *  - rank-scan bandwidth (r14, parquet column footers, whole spill=2
  *    layout): exact reads the emb column = 2,002 KiB; sq8 reads
  *    __sq8 = 295 KiB (6.8× less per candidate row); pq8 reads
  *    __code = 21 KiB. The serving trade is now a proper ladder:
  *    exact (full bandwidth, truth recall) / sq8 (~1/7 bandwidth, same
  *    recall as exact here) / pq (~1/100 bandwidth, and since the r16
  *    trained codebooks the same recall as exact at R=256).
  *  - serving-model cache (r13): 188 hits / 12 misses over the probe's
  *    200 queries — a miss is a centroids/codebooks parquet read, paid
  *    once per (re)train plus the unsettled-mtime window right after a
  *    META write (the manifestStateCached discipline), then every query
  *    serves from the memo
  *  - train scaling (r13): 500 vecs/23 cells in 1.8 s vs 2000 vecs/45
  *    cells in 2.1 s — 1.2× wall on a 4× corpus, where the r12
  *    window-form assignment's n^1.5 would predict 8× (see ProbeAssign
  *    for the isolated 80× head-to-head at n=200k)
  *  - batch serving (r13): the 20 queries as ONE knnBatch relation pass
  *    against the spill=2/pq=8 layout: 1.3 s vs the per-query loop's
  *    5.8 s — 4.4× from amortizing per-query plan + listing + driver
  *    ranking, at just 20 queries (the gap widens with the relation)
  * The PQ rows measure the bandwidth/recall trade honestly: the ADC
  * shortlist is FIXED size, so more probes pour more candidates into
  * it and recall can DROP with nprobe at small R (measured 0.61 → 0.54
  * on the pre-r16 seed codebooks) — raise --rerank together with
  * nprobe; at R=256 the trained tier now converges to the exact
  * tier's recall at the same probes. The PQ files column
  * doubles because ranking and fetch are two scans of the same probed
  * partitions; BYTES are the point — the ranking scan reads 8 ints
  * per row, and only R rows fetch their stored documents.
  * Files read track nprobe EXACTLY at both spill levels (the
  * partition-pruning pin, also asserted in CliSpec's PartitionFilters
  * plan check; the metric is the post-prune scan numFiles, unwrapped
  * through AQE query stages). Spilled assignment (each vector stored
  * in its 2 nearest cells) buys the boundary neighbors back — +0.13 to
  * +0.19 recall at every probe count — for 2× storage and a
  * dedup-by-__rid exchange at query time; read cost still tracks
  * nprobe. Recall here is the honest query-disjoint number — chasing
  * the 0.94 the registry gate used to report led to the
  * seed-contamination finding recorded in [[ProbeKnnDiag]] (the gate's
  * quantizer was seeded WITH the evaluation queries; its seed is now
  * disjoint and reports 0.50, consistent with this probe modulo
  * self-inclusion). At this corpus size one split holds everything so
  * brute latency is already flat; the contract that matters at 100 TB
  * is the files-read column — the trained tier touches nprobe/cells
  * of the data regardless of corpus size, while brute touches all of
  * it. */
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
    // numFiles metric (df.inputFiles lists the pre-prune catalog); AQE
    // wraps the tree, so unwrap adaptive nodes to the final plan
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

    def run(tag: String, nProbe: Int, rerank: Int = 0): Map[Long, Set[String]] = {
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var files = -1L
      val results = queries.map { case (qid, qv) =>
        val df = ann.knn("pk", "emb", qv, 5, nProbe, rerank)
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

    def recallVsTruth(got: Map[Long, Set[String]]): Double =
      queries.map { case (qid, _) =>
        val t = truth(qid); val g = got(qid)
        if (t.isEmpty) 1.0 else t.intersect(g).size.toDouble / t.size
      }.sum / queries.length

    for (p <- Seq(1, pMid, 2 * pMid)) {
      val got = run(s"nprobe=$p", p)
      println(f"[probe-knn]   recall@5 vs brute: ${recallVsTruth(got)}%.3f")
    }

    // spill=2: each vector stored in its 2 nearest cells — the boundary
    // fix; read cost still tracks nprobe, storage doubles
    val t1 = System.nanoTime()
    ann.train("pk", "emb", spill = 2)
    println(f"[probe-knn] retrain spill=2 in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    for (p <- Seq(1, pMid, 2 * pMid)) {
      val got = run(s"s2 np=$p", p)
      println(f"[probe-knn]   recall@5 vs brute: ${recallVsTruth(got)}%.3f")
    }

    // PQ tier: spill=2 + 8-subspace codes — the candidate RANK pass
    // reads skinny codes, only top-R survivors fetch full rows
    val t2 = System.nanoTime()
    ann.train("pk", "emb", spill = 2, pq = 8)
    println(f"[probe-knn] retrain spill=2 pq=8 in ${(System.nanoTime() - t2) / 1e9}%.1f s")
    for ((p, r) <- Seq((pMid, 0), (2 * pMid, 0), (pMid, 256), (2 * pMid, 256))) {
      val got = run(f"s2pq np=$p%d R=$r%d", p, r)
      println(f"[probe-knn]   recall@5 vs brute: ${recallVsTruth(got)}%.3f")
    }

    // the candidate-RANKING scan's bandwidth: compressed parquet bytes
    // of the column each tier's rank pass reads, straight from the data/
    // file footers (runtime task metrics at this toy scale are dominated
    // by page/footer overhead and the two-scan shape; the per-row column
    // width is what scales to cells holding millions of rows)
    def columnBytes(prefix: String): Long = {
      val dataDir = new org.apache.hadoop.fs.Path(
        s"$root/indexes/pk/ann/emb/data")
      val hconf = spark.sparkContext.hadoopConfiguration
      val f = dataDir.getFileSystem(hconf)
      val it = f.listFiles(dataDir, true)
      var sum = 0L
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(st.getPath, hconf))
          try {
            r.getFooter.getBlocks.forEach { b =>
              b.getColumns.forEach { c =>
                if (c.getPath.toDotString.startsWith(prefix))
                  sum += c.getTotalSize // compressed on-disk bytes
              }
            }
          } finally r.close()
        }
      }
      sum
    }
    val rankBytesPq = columnBytes("__code")
    val rankBytesExact = columnBytes("emb")

    // SQ8 tier: spill=2 + per-dim int8 codes, ASYMMETRIC ranking — the
    // stored codes against the unquantized query's fixed-point weights
    // (reconstructed inner product, affine offset cancelled), exact
    // rerank of the top-R survivors. The middle bandwidth point with no
    // codebook recall ceiling.
    val t3 = System.nanoTime()
    ann.train("pk", "emb", spill = 2, sq8 = true)
    println(f"[probe-knn] retrain spill=2 sq8 in ${(System.nanoTime() - t3) / 1e9}%.1f s")
    for ((p, r) <- Seq((pMid, 0), (2 * pMid, 0), (pMid, 256), (2 * pMid, 256))) {
      val got = run(f"s2sq np=$p%d R=$r%d", p, r)
      println(f"[probe-knn]   recall@5 vs brute: ${recallVsTruth(got)}%.3f")
    }
    val rankBytesSq8 = columnBytes("__sq8")
    println(f"[probe-knn] rank-scan column bytes (whole layout, compressed): " +
      f"exact(emb)=${rankBytesExact / 1024}%d KiB " +
      f"sq8=${rankBytesSq8 / 1024}%d KiB pq8=${rankBytesPq / 1024}%d KiB — " +
      f"sq8 reads ${rankBytesExact.toDouble / math.max(1, rankBytesSq8)}%.1f× " +
      f"less than exact per candidate row")
    // restore the pq=8 layout the batch section below expects
    ann.train("pk", "emb", spill = 2, pq = 8)

    // batch serving vs a per-query loop: the same 20 queries answered by
    // ONE knnBatch pass against the trained spill=2/pq=8 layout — the
    // win is per-query fixed cost (plan + listing + driver ranking)
    // amortized across the relation
    {
      import spark.implicits._
      val qdf = queries.toSeq.map { case (qid, qv) => (qid, qv.toSeq) }
        .toDF("qid", "qv")
      val tLoop = System.nanoTime()
      queries.foreach { case (_, qv) =>
        ann.knn("pk", "emb", qv, 5, pMid, 256).collect(): Unit
      }
      val loopS = (System.nanoTime() - tLoop) / 1e9
      val tBatch = System.nanoTime()
      val nBatch = ann.knnBatch("pk", "emb", qdf, 5, pMid, 256).collect().length
      val batchS = (System.nanoTime() - tBatch) / 1e9
      println(f"[probe-knn] batch: ${queries.length} queries in $batchS%.1f s " +
        f"($nBatch rows) vs per-query loop $loopS%.1f s — ${loopS / batchS}%.1f×")
    }

    // serving-model cache: the queries above re-used one trained model —
    // every knn after the first must hit the memo instead of re-reading
    // + collecting centroids/ and codebooks/ (a cold object-store read
    // per query before r13). Expect misses == number of (re)trains + 1.
    val (ch, cm, cres) = AnnIndex.servingCacheStats
    println(f"[probe-knn] serving-model cache: $ch hits / $cm misses, $cres resident")

    // train scaling: 10× fewer vectors (the sf0.01 table) through the
    // same default-sized train. The r12 window-form assignment scaled
    // n×√n = n^1.5 (a 10× corpus costs 31.6×); the map-only rewrite is
    // one linear pass, so the wall ratio should sit near the data
    // ratio, not above it. (The 256·nlist k-means sample cap binds only
    // above 65k vectors — see AnnIndex.train — so at probe scale the
    // rounds are full scans on both sides of this ratio.)
    val smallDir = sfDir.replace("sf0.1", "sf0.01")
    if (smallDir != sfDir && new java.io.File(s"$smallDir/embeddings.parquet").exists()) {
      val emb2 = spark.read.parquet(s"$smallDir/embeddings.parquet")
        .select(col("vec_id").as("vid"), col("embedding").as("emb"))
      val jsonl2 = Files.createTempFile("pk2", ".jsonl")
      val lines2 = emb2.select(to_json(struct(col("vid"), col("emb"))))
        .collect().map(_.getString(0))
      Files.write(jsonl2, lines2.mkString("\n").getBytes("UTF-8"))
      cat.create(
        """version: 1
          |name: pk2
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
      new graft.engine.Indexer(spark, cat).indexFile("pk2", jsonl2.toString)
      val ts = System.nanoTime()
      val (cells2, n2) = ann.train("pk2", "emb")
      val tSmall = (System.nanoTime() - ts) / 1e9
      val tb = System.nanoTime()
      ann.train("pk", "emb") // retrain the big index, same sizing rule
      val tBig = (System.nanoTime() - tb) / 1e9
      println(f"[probe-knn] train scaling: $n2 vecs ($cells2 cells) $tSmall%.1f s vs " +
        f"$n vecs ($cells cells) $tBig%.1f s — ratio ${tBig / tSmall}%.1f× on a " +
        f"${n.toDouble / n2}%.0f× corpus (n^1.5 would be ${math.pow(n.toDouble / n2, 1.5)}%.0f×)")
    }
    spark.stop()
  }
}
