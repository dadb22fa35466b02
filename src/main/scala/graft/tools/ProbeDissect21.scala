package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 cost dissection: time the sub-steps of the calm-baseline
  * heavy queries (knn_mips_ivf's three serial actions; op_grammar_search's
  * ingest vs search split) so optimization effort lands on the measured
  * term, not the guessed one. Read-only instrumentation — no query
  * changes.
  *
  * Usage: runMain graft.tools.ProbeDissect21 [reps]
  */
object ProbeDissect21 {
  private def cpuBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  private def timed(tag: String)(f: => Unit): Unit = {
    val b = cpuBean
    val c0 = b.getProcessCpuTime
    val t0 = System.nanoTime()
    f
    println(f"[dissect] $tag%-32s wall ${(System.nanoTime() - t0) / 1e9}%6.3f s" +
      f"  cpu ${(b.getProcessCpuTime - c0) / 1e9}%6.3f s")
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // warmup: full query once
    graft.SparkEntry.queries("knn_mips_ivf")(s, sfDir).count()

    val mips = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
      .select(col("vid"),
        expr("transform(v, x -> (1 + vid % 10) * " +
          "CAST(round(CAST(x AS DOUBLE) * 1000000.0D) AS BIGINT))").as("f"))

    (1 to reps).foreach { _ =>
      timed("mips: m2 agg action") {
        val self = graft.exprs.Sq8.dot_int(col("f"), col("f"))
        mips.agg(max(self)).collect()
      }
      timed("mips: centroid collect") {
        mips.where(col("vid") < 16)
          .select(col("vid").cast("long"), col("f")).collect()
      }
      timed("mips: full knn_mips_ivf") {
        graft.SparkEntry.queries("knn_mips_ivf")(s, sfDir).count()
      }
      timed("mips: full knn_mips (brute)") {
        graft.SparkEntry.queries("knn_mips")(s, sfDir).count()
      }
      timed("mips: plan-only knn_mips_ivf") {
        // construction + analysis + optimization, no execution
        graft.SparkEntry.queries("knn_mips_ivf")(s, sfDir)
          .queryExecution.executedPlan
      }
    }

    // dedup_semantic split: pairs vs components vs keep logic
    {
      import graft.ops.Dedup
      val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("label"), col("vec_id").as("vid"), col("embedding").as("v"))
        .localCheckpoint(eager = false)
      emb.count()
      (1 to reps).foreach { _ =>
        timed("sem: full dedup_semantic") {
          graft.SparkEntry.queries("dedup_semantic")(s, sfDir).count()
        }
        var pc: org.apache.spark.sql.DataFrame = null
        timed("sem: cosinePairs + checkpoint") {
          pc = Dedup.embeddingCosine(
            s.read.parquet(s"$sfDir/embeddings.parquet"),
            col("vec_id"), col("embedding"), col("label"), 0.4)
            .localCheckpoint(eager = false)
          println(s"[dissect]   n_pairs = ${pc.count()}")
        }
        timed("sem: connectedComponents") {
          val (cc, rounds) = Dedup.connectedComponentsImpl(
            pc.select(col("a"), col("b")), 50)
          println(s"[dissect]   rounds = $rounds, labels = ${cc.count()}")
        }
      }
    }

    // pipe_dedup_corpus split: jaccard pairs vs components vs keep join
    (1 to reps).foreach { _ =>
      timed("corpus: full pipe_dedup_corpus") {
        graft.SparkEntry.queries("pipe_dedup_corpus")(s, sfDir).count()
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      timed("corpus: jaccard pairs") {
        val sh = graft.ops.Dedup.shingles(
          graft.Graft.table(s, sfDir, "documents")
            .withColumn("toks",
              graft.functions.TextFunctions.tokenizeDefault(col("text"))),
          col("doc_id"), col("toks"), 5).localCheckpoint(eager = false)
        pairs = graft.ops.Dedup.ngramJaccardPrefix(sh, 0.5)
          .select(col("a"), col("b")).localCheckpoint(eager = false)
        println(s"[dissect]   n_pairs = ${pairs.count()}")
      }
      timed("corpus: connectedComponents") {
        val (cc, rounds) = graft.ops.Dedup.connectedComponentsImpl(pairs, 50)
        println(s"[dissect]   rounds = $rounds, labels = ${cc.count()}")
      }
    }

    // CC conf sensitivity: is the per-round constant AQE stage latency,
    // shuffle-partition count, or inherent?
    {
      val pc = graft.ops.Dedup.embeddingCosine(
        s.read.parquet(s"$sfDir/embeddings.parquet"),
        col("vec_id"), col("embedding"), col("label"), 0.4)
        .select(col("a"), col("b")).localCheckpoint(eager = false)
      pc.count()
      for (
        (aqe, parts) <- Seq(("true", "32"), ("true", "4"), ("false", "32"),
          ("false", "4"), ("false", "1"))
      ) {
        s.conf.set("spark.sql.adaptive.enabled", aqe)
        s.conf.set("spark.sql.shuffle.partitions", parts)
        timed(s"cc: aqe=$aqe parts=$parts") {
          graft.ops.Dedup.connectedComponentsImpl(pc, 50)._1.count()
        }
        timed(s"cc: aqe=$aqe parts=$parts (rep)") {
          graft.ops.Dedup.connectedComponentsImpl(pc, 50)._1.count()
        }
      }
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.shuffle.partitions", cpus)
    }

    // op_grammar_search split: ingest vs searches
    (1 to reps).foreach { _ =>
      timed("op_grammar: full query") {
        graft.SparkEntry.queries("op_grammar_search")(s, sfDir).count()
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-dis").toString
    val cat = new graft.engine.Catalog(root)
    val cfg = """version: 1
                |name: dis
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
    cat.create(cfg)
    val jsonl = graft.Graft.table(s, sfDir, "documents")
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("value"))
      .localCheckpoint(eager = false)
    timed("op_grammar: ingest only") {
      new graft.engine.Indexer(s, cat).indexDataFrame("dis", jsonl)
    }
    val search = new graft.engine.Searcher(s, cat)
    timed("op_grammar: first search (stats)") {
      search.searchDf("dis", "text:spark AND NOT text:window", 1000000).count()
    }
    timed("op_grammar: 11 more searches") {
      Seq("text:\"key order\"", "text:wind*", "text:spork~1",
        "lang:IN [en fr]", "n_chars:[200 TO 400}", "text:spark -text:window",
        "(text:vector OR text:merge) AND n_chars:>=300", "spark", "*",
        "text:spark^2 OR text:merge", "n_chars:>=350")
        .foreach(q => search.searchDf("dis", q, 1000000).count())
    }
    s.stop()
  }
}
