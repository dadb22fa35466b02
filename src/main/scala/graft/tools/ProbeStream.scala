package graft.tools

import java.nio.file.Files

import graft.engine.{AnnIndex, Catalog, Indexer}

/** Long-stream epoch-hygiene probe — the r13 verdict's #5:
  * StatefulStreamingSpec pins the bounded epoch span under
  * `--ann-compact-every N` for a few batches; this probe runs the SAME
  * per-batch hook sequence the stream's foreachBatch executes (split
  * commit → [[AnnIndex.refresh]] → fold when the served span reaches N)
  * for 200+ batches, and measures what a week-long stream would see:
  *
  *  - DIRECTORY COUNT under data/ after every batch — must saw-tooth
  *    between 1 and N epochs and never trend (the fold is the tier's
  *    vacuum; an unbounded count is the listing-cost killer the fold
  *    exists to prevent);
  *  - COMPACT WALL per fold — grows only with the STORED corpus (each
  *    fold rewrites the served rows once), never with the number of
  *    folds that came before it;
  *  - SERVING p50 every 25 batches (10 nprobe-probed knn queries) —
  *    must stay flat across the stream's life.
  *
  * The MemoryStream/foreachBatch wiring itself is pinned in
  * StatefulStreamingSpec (including replay idempotence); driving the
  * lifecycle directly lets the probe run 200 batches in minutes.
  *
  * Run: runMain graft.tools.ProbeStream [batches] (default 200)
  *
  * Measured (local[32], 2026-08-15, 200 batches × 2 docs, 8 dims,
  * 4 cells, fold every 25 epochs, 2.5 min wall for the whole stream):
  *  - epoch dirs: saw-tooth bounded at 24 (bound 25), 8 folds fired
  *    (batches 24, 48, …, 192), final span 9 epochs — FLAT, no trend
  *    (the r13 bounded-span contract holds at 200 batches);
  *  - compact wall: the 8 folds measured 1.0, 0.9, 0.7, 0.7, 0.9, 1.0,
  *    0.7, 0.8 s while the folded row count grew 88 → 424 — no
  *    fold-count trend (the rewrite is corpus-proportional by design;
  *    at this size fixed job overhead dominates);
  *  - serving p50 every 25 batches: 245, 289, 232, 234, 230, 255, 198,
  *    220 ms — FLAT across the stream's life; the probedScan listing
  *    stays bounded by (span × probed cells), which the fold keeps
  *    small. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(200)
    val every = 25
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("probe-stream").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: ps
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
    val idx = new Indexer(spark, cat)
    val ann = new AnnIndex(spark, cat)
    val dim = 8

    def vec(id: Long): String = (0 until dim).map { d =>
      (((id * 2654435761L + d * 40503L + 7) % 1000L + 1000L) % 1000L) / 1000.0 - 0.5
    }.mkString("[", ", ", "]")
    def writeDocs(ids: Seq[Long]): String = {
      val p = Files.createTempFile("ps", ".jsonl")
      Files.write(p, ids.map(i => s"""{"vid": $i, "emb": ${vec(i)}}""")
        .mkString("\n").getBytes("UTF-8"))
      p.toString
    }

    // seed corpus + train the quantizer once (the stream's precondition)
    idx.indexFile("ps", writeDocs(0L until 40L))
    ann.train("ps", "emb", cells = 4)

    val dataDir = java.nio.file.Paths.get(root, "indexes", "ps", "ann",
      "emb", "data")
    def epochDirs(): Int = {
      val s = java.nio.file.Files.list(dataDir).iterator()
      var c = 0
      while (s.hasNext) { if (s.next().getFileName.toString.startsWith("__epoch=")) c += 1 }
      c
    }
    def p50Knn(): Double = {
      val times = (0 until 10).map { q =>
        val qv = (0 until dim).map(d =>
          ((((q + 77L) * 2654435761L + d * 40503L + 7) % 1000L + 1000L) % 1000L)
            / 1000.0f - 0.5f).toArray
        val t0 = System.nanoTime()
        ann.knn("ps", "emb", qv, 5, nProbe = 2).collect(): Unit
        (System.nanoTime() - t0) / 1e6
      }.sorted
      times(times.length / 2)
    }

    var maxDirs = 0
    var folds = List.empty[(Int, Double, Long)]
    var p50s = List.empty[(Int, Double)]
    var nextId = 1000L
    for (b <- 1 to batches) {
      idx.indexFile("ps", writeDocs(Seq(nextId, nextId + 1)))
      nextId += 2
      ann.refresh("ps", "emb")
      val (eb, ee) = ann.epochSpan("ps", "emb")
      if (ee - eb + 1 >= every) {
        val t0 = System.nanoTime()
        val (ne, nRows) = ann.compactEpochs("ps", "emb")
        folds ::= ((b, (System.nanoTime() - t0) / 1e9, nRows))
        println(f"[probe-stream] batch $b%3d: folded $ne epochs " +
          f"($nRows rows) in ${folds.head._2}%.1f s")
      }
      maxDirs = math.max(maxDirs, epochDirs())
      if (b % 25 == 0) {
        val p = p50Knn()
        p50s ::= ((b, p))
        println(f"[probe-stream] batch $b%3d: dirs=${epochDirs()}%2d " +
          f"(max $maxDirs%2d) serving p50=$p%.0f ms")
      }
    }
    println(s"[probe-stream] summary: $batches batches, max epoch dirs " +
      s"$maxDirs (bound $every), ${folds.length} folds, final span " +
      s"${ann.epochSpan("ps", "emb")}")
    println("[probe-stream] fold walls: " + folds.reverse.map {
      case (b, s, r) => f"b$b=$s%.1fs/$r rows" }.mkString(", "))
    println("[probe-stream] serving p50 series: " + p50s.reverse.map {
      case (b, p) => f"b$b=$p%.0fms" }.mkString(", "))
    spark.stop()
  }
}
