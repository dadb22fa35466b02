package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Indexer, Searcher}

/** Ad-hoc profiling/plan-inspection main — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val cfg =
      """version: 1
        |name: prof
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

    val jsonl = spark.read.parquet(s"$dir/documents.parquet")
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("value"))
      .persist()
    println(s"[scratch] docs: ${jsonl.count()}")

    for (round <- 1 to 2) {
      val root = Files.createTempDirectory("graft-prof").toString
      val cat = new Catalog(root)
      cat.create(cfg)
      val idx = new Indexer(spark, cat)
      time(s"r$round indexDataFrame")(idx.indexDataFrame("prof", jsonl))
      val search = new Searcher(spark, cat)
      time(s"r$round search * limit 1M")(search.searchDf("prof", "*", 1000000).count())
      time(s"r$round search term")(search.searchDf("prof", "text:spark AND n_chars:>=300", 1000000).count())

      // ingest sub-steps
      val d = new graft.config.SchemaDerivation(cat.load("prof"))
      val (cols, skip) = d.ingestProjection(col("value"))
      val typed = jsonl
        .where(col("value").isNotNull && length(trim(col("value"))) > 0)
        .where(!coalesce(skip, lit(true)))
        .select(cols: _*)
      time(s"r$round typed.count (parse only)")(typed.count())
      val out = Files.createTempDirectory("graft-prof-w").toString
      time(s"r$round typed.write")(typed.write.mode("overwrite").parquet(out))
    }
    spark.stop()
  }
}
