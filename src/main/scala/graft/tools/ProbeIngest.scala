package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Indexer, Searcher}

/** Single-node engine THROUGHPUT numbers — the reference publishes none
  * (BASELINE.md: no benchmark section, no criterion dep), so these are
  * the engine's own measured figures for the three lifecycle verbs on
  * this box (local[32], 128 GiB, sf0.1 documents × 20 Caesar replicas =
  * 100k docs of ~33 MB JSONL).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ProbeIngest
  *
  * Measured 2026-08-14 (fresh index per run, median of 3):
  *  - ingest (JSONL → parse → typed columns + _terms + digests + stats
  *    → parquet split → manifest commit, ONE Spark job): 6.36 s median
  *    = 15.7k docs/s, 5.8 MB/s; spread 1.61–8.51 s — the first run
  *    pays codegen+JIT, the hot run hits 62k docs/s / 23 MB/s, and on
  *    a cluster this path is shuffle-free so it scales with executors.
  *  - merge (3 splits → 1, 300k docs): 9.65 s = 31k docs/s — one
  *    rewrite of the full corpus, the compaction cost model.
  *  - search (`text:spark`, BM25 top-10 over the merged 300k docs):
  *    p50 0.77 s — full-scan scoring of one big split; the
  *    many-split serving path with pruning is ProbeServe's 93–171 ms.
  */
object ProbeIngest {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, i: Int): String = s.drop(i % 26) + s.take(i % 26)
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val lines = (0 until 20).map(i => base
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", translate(col("text"),
          alpha + alpha.toUpperCase,
          rot(alpha, i * 7) + rot(alpha, i * 7).toUpperCase)))
      .reduce(_.unionAll(_))
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("value"))
      .localCheckpoint() // eager: corpus generation must not ride the timing
    val nDocs = lines.count()
    val mb = lines.agg(sum(length(col("value")))).first().getLong(0) / 1e6
    println(f"[ingest] corpus: $nDocs docs, $mb%.1f MB jsonl")

    val config =
      """version: 1
        |name: %s
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: doc_id
        |      type: !number
        |        type: i64
        |    - name: text
        |      type: !text
        |    - name: lang
        |      type: !text
        |        indexed:
        |          tokenizer: raw
        |    - name: source
        |      type: !text
        |        indexed:
        |          tokenizer: raw
        |    - name: n_chars
        |      type: !number
        |        type: i64
        |""".stripMargin

    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val cat = new Catalog(root)
    val indexer = new Indexer(spark, cat)

    // ingest: fresh index per run so each timing is one cold split build
    val ts = (1 to 3).map { r =>
      val name = s"ing$r"
      cat.create(config.format(name))
      val t0 = System.nanoTime()
      indexer.indexDataFrame(name, lines)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val t = ts(1)
    println(f"[ingest] index: $t%.2f s = ${nDocs / t}%.0f docs/s, ${mb / t}%.1f MB/s (min ${ts.head}%.2f max ${ts.last}%.2f)")

    // merge: 3 equal splits -> 1 (the compaction verb over the corpus)
    cat.create(config.format("mrg"))
    (1 to 3).foreach(_ => indexer.indexDataFrame("mrg", lines))
    val m0 = System.nanoTime()
    indexer.merge("mrg")
    val mt = (System.nanoTime() - m0) / 1e9
    println(f"[ingest] merge 3->1 of ${3 * nDocs} docs: $mt%.2f s = ${3 * nDocs / mt}%.0f docs/s")

    // search: term query + BM25 top-10 over the merged index
    val searcher = new Searcher(spark, cat)
    searcher.searchDf("mrg", "text:spark", 10).count() // warm
    val qs = (1 to 5).map { _ =>
      val q0 = System.nanoTime()
      searcher.searchDf("mrg", "text:spark", 10).count()
      (System.nanoTime() - q0) / 1e9
    }.sorted
    println(f"[ingest] search 'text:spark' top-10 over ${3 * nDocs} docs: p50 ${qs(2)}%.3f s")
    spark.stop()
  }
}
