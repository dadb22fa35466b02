package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query steady-state seconds.
  *
  * Each query runs once untimed (JIT + codegen + parquet footer warmup —
  * the first action in a fresh JVM otherwise pays ~10s that has nothing to
  * do with the query), then three times timed, reporting the MEDIAN — a
  * single eviction-driven recompute storm or GC stall cannot land on one
  * query and misreport it by an order of magnitude (the round-2 lesson).
  * Queries run in name order so the report is stable run-to-run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ordered = SparkEntry.queries.toList.sortBy(_._1)
    ordered.foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup FAILED for $name: $e")
      }
    }
    val results = ordered.map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] query FAILED: $name: $e")
          None
        }
      }
      // median of the successful runs: one transient failure must not
      // discard two valid measurements (-1 only when every run failed)
      val ok = Seq(once(), once(), once()).flatten.sorted
      name -> (if (ok.isEmpty) -1.0 else ok(ok.size / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failed query must not shrink total (the regression would read as a
    // speedup): report the failure count explicitly and poison the headline
    // value so a BENCH-vs-BASELINE diff flags it.
    val failed = results.count(_._2 < 0)
    val total =
      if (failed > 0) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
