package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Ad-hoc profiling/plan-inspection main — not part of the engine.
  * Current probe: near-linearity of the dedup scale paths on a 10×
  * replicated corpus (doc_ids offset so replicas are distinct docs).
  *
  * Measured at sf0.1 (5k → 50k docs, local[32]):
  *  - dedup_minhash_lsh: pairs 258 → 2,614 (10.1×, as designed); wall
  *    0.75s → 0.71s — fixed overhead dominates, the shuffle is tiny.
  *  - dedup_simhash: wall 1.2s → 3.8s for 10× input; output grows 33×
  *    because a fixed 64-bit signature + fixed hamming threshold has a
  *    false-positive rate that is quadratic in corpus size — inherent to
  *    simhash, not a plan regression (band join itself stays linear).
  *  - q_term_search: 0.22s → 0.37s for 10× docs.
  *
  * Split-pruning probe (20 monthly splits × 5k docs): all-splits term
  * search 0.44s (hits=78,360); time-ranged search pruned to 1 split
  * 0.18s (hits=3,918) — 2.4× at local scale where fixed overhead
  * dominates; the structural win is 1 file opened instead of 20, which
  * is the number that matters against an object store.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val base = spark.read.parquet(s"$dir/documents.parquet")
    val n = base.count()

    // Replica i gets its letters rotated by a per-replica Caesar cipher, so
    // cross-replica docs are NOT near-duplicates and the expected pair
    // output is exactly k x the baseline — a valid linear-scaling probe.
    // (Plain replication makes every doc a true near-dup of its copies:
    // correct detection, but quadratic output. A token-prefix transform is
    // worse: the shared prefix floods character-gram signatures and
    // degenerates simhash into all-pairs.) The cipher preserves token
    // lengths, whitespace, and within-replica similarity structure exactly.
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, i: Int): String =
      s.drop(i % 26) + s.take(i % 26)
    def replicated(k: Int): DataFrame =
      (0 until k).map(i => base
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", translate(col("text"),
          lower + lower.toUpperCase, rot(lower, i * 7) + rot(lower, i * 7).toUpperCase)))
        .reduce(_.unionAll(_))

    // register a temp view the PipelineQueries-style code paths can read;
    // simplest: write once to a temp dir and point the query at it
    for (k <- Seq(1, 10)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"scale$k").toString
      replicated(k).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      spark.read.parquet(s"$dir/embeddings.parquet")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      println(s"[scratch] corpus x$k = ${n * k} docs")
      // warmup once per scale to exclude codegen
      graft.queries.PipelineQueries.all("dedup_minhash_lsh")(spark, tmp).count()
      time(s"x$k dedup_minhash_lsh")(
        println(s"[scratch]   pairs=" +
          graft.queries.PipelineQueries.all("dedup_minhash_lsh")(spark, tmp).count()))
      graft.queries.PipelineQueries.all("dedup_simhash")(spark, tmp).count()
      time(s"x$k dedup_simhash")(
        println(s"[scratch]   pairs=" +
          graft.queries.PipelineQueries.all("dedup_simhash")(spark, tmp).count()))
      graft.queries.SearchQueries.all("q_term_search")(spark, tmp).count()
      time(s"x$k q_term_search")(
        graft.queries.SearchQueries.all("q_term_search")(spark, tmp).count())
    }

    // ---- split-pruning probe: 20 monthly splits, ranged vs full search --
    {
      import graft.engine.{Catalog, Indexer, Searcher}
      val root = java.nio.file.Files.createTempDirectory("graft-prune-probe").toString
      val cat = new Catalog(root)
      cat.create(
        """version: 1
          |name: probe
          |path: /tmp/unused
          |schema:
          |  time_field: ts
          |  fields:
          |    - name: ts
          |      type: !datetime
          |    - name: doc_id
          |      type: !number
          |        type: i64
          |    - name: text
          |      type: !text
          |""".stripMargin)
      val idx = new Indexer(spark, cat)
      val jsonl = base.select(col("doc_id"), col("text"))
      for (m <- 0 until 20) {
        val month = f"${2020 + m / 12}%04d-${m % 12 + 1}%02d"
        idx.indexDataFrame("probe", jsonl
          .withColumn("ts", lit(s"$month-15T12:00:00Z"))
          .select(to_json(struct(col("ts"), col("doc_id"), col("text"))).as("value")))
      }
      println(s"[scratch] probe splits: ${cat.liveSplits("probe").length}")
      val search = new Searcher(spark, cat)
      def run(label: String, q: String): Unit = {
        search.searchDf("probe", q, 1000000).count() // warm
        time(label)(println(s"[scratch]   hits=" +
          search.searchDf("probe", q, 1000000).count()))
      }
      run("all-splits term search", "text:spark")
      run("1-split ranged search",
        "ts:[2021-03-01T00:00:00Z TO 2021-03-31T00:00:00Z] AND text:spark")
    }
    spark.stop()
  }
}
