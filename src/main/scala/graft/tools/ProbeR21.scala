package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sketch

/** Round-21 optimization A/B harness — same instrument as [[ProbeR20]]:
  * each candidate's OLD form (inlined verbatim from the pre-r21 code)
  * runs INTERLEAVED with the shipped NEW form (called through the
  * registry) in one JVM, so box-level drift hits both forms equally and
  * the PAIRED per-iteration ratio is the signal.
  *
  * Usage: runMain graft.tools.ProbeR21 [reps] [tag1,tag2,...]
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — the Bench contract).
  */
object ProbeR21 {

  private def cpuBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  private def timed(f: => Unit): (Double, Double) = {
    val b = cpuBean
    val c0 = b.getProcessCpuTime
    val t0 = System.nanoTime()
    f
    ((System.nanoTime() - t0) / 1e9, (b.getProcessCpuTime - c0) / 1e9)
  }

  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def ab(tag: String, reps: Int)(oldF: => Unit)(newF: => Unit): Unit = {
    oldF; newF // unmeasured warmup: JIT/codegen outside the sample
    val pairs = (1 to reps).map { _ => (timed(oldF), timed(newF)) }
    val ow = pairs.map(_._1._1); val oc = pairs.map(_._1._2)
    val nw = pairs.map(_._2._1); val nc = pairs.map(_._2._2)
    val rw = pairs.map(p => p._2._1 / p._1._1)
    val rc = pairs.map(p => p._2._2 / math.max(p._1._2, 1e-9))
    println(f"[r21ab] $tag%-24s old ${med(ow)}%6.2f s/${med(oc)}%6.2f cpu   " +
      f"new ${med(nw)}%6.2f s/${med(nc)}%6.2f cpu   " +
      f"ratio wall ${med(rw)}%.2f cpu ${med(rc)}%.2f")
  }

  // ---- OLD forms, inlined verbatim from pre-r21 code --------------------

  /** Pre-r21 tfidfTop: df aggregate + join-back onto the snapshotted tf. */
  private def tfidfOld(tokenized: DataFrame, k: Int): DataFrame = {
    val tf = tokenized.select(col("doc_id").as("id"), explode(col("toks")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = tokenized.select(col("doc_id").as("id")).agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfTab, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_q",
        floor(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) *
          lit(1000000.0)).cast("long"))
      .withColumn("tfidf_q", col("tf") * col("idf_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tfidf_q").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id").as("doc_id"), col("rank"), col("term"), col("tfidf_q"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Pre-r21 sketch_quantile_hdr (verbatim): exact tier = est joined to
    * the corpus-sized ranked table on grp, filtered to rn = r after. */
  private def hdrOld(s: SparkSession, dir: String): DataFrame = {
    val raw = graft.Graft.table(s, dir, "documents")
      .select(col("source").as("grp"),
        length(col("text")).cast("long").as("v"))
      .localCheckpoint(eager = false)
    val bk = Sketch.hdrBuckets(raw, col("grp"), col("v"))
      .localCheckpoint(eager = false)
    val merged = bk.groupBy(col("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
      .select(lit("__all__").as("grp"), col("bucket"), col("cnt"))
    val est = Sketch.hdrQuantiles(bk.unionByName(merged), Seq(50, 90, 99))
    val rawall = raw.unionByName(
      raw.select(lit("__all__").as("grp"), col("v")))
    val rk = rawall.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("v"))))
    val exact = est.select(col("grp"), col("q"), col("n"))
      .withColumn("r", expr("(q * n + 99) DIV 100"))
      .join(rk, Seq("grp"))
      .where(col("rn") === col("r"))
      .select(col("grp"), col("q"), col("v").as("exact_v"))
    est.join(exact, Seq("grp", "q"))
      .select(col("grp"), col("q"), col("n"), col("bucket"), col("est"),
        col("exact_v"),
        expr("CASE WHEN exact_v > 0 THEN abs(est - exact_v) * 1000000" +
          " DIV exact_v ELSE 0 END").as("err_ppm"))
      .orderBy(col("grp"), col("q"))
  }

  /** Pre-r21 sketch_hll (verbatim): exact tier = per-flag countDistinct
    * plus a separate global countDistinct — two corpus passes. */
  private def hllOld(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Graft.table(s, dir, "lineitem")
    val keyed = li.select(col("l_returnflag").as("grp"),
      col("l_orderkey").cast("string").as("k"))
    val regs = Sketch.hllRegisters(keyed, col("grp"), col("k"))
      .localCheckpoint(eager = false)
    val merged = regs.groupBy(col("bucket")).agg(max(col("m")).as("m"))
      .select(lit("__all__").as("grp"), col("bucket"), col("m"))
    val est = Sketch.hllEstimate(regs.unionByName(merged))
    val exact = li.groupBy(col("l_returnflag").as("grp"))
      .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
      .unionByName(li.agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
        .select(lit("__all__").as("grp"), col("exact_distinct")))
    est.join(exact, "grp")
      .select(col("grp"), col("v_empty"), col("est_distinct"),
        col("exact_distinct"),
        expr("CAST(abs(est_distinct - exact_distinct) * 1000000" +
          " DIV exact_distinct AS BIGINT)").as("err_ppm"))
      .orderBy(col("grp"))
  }

  /** Pre-r21 sketch_hll_window exact tier (verbatim). */
  private def hllWinOld(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Graft.events(s, dir)
    val keyed = ev.select(
      date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("grp"),
      col("event_id").cast("string").as("k"))
    val regs = Sketch.hllRegisters(keyed, col("grp"), col("k"))
      .localCheckpoint(eager = false)
    val merged = regs.groupBy(col("bucket")).agg(max(col("m")).as("m"))
      .select(lit("__all__").as("grp"), col("bucket"), col("m"))
    val est = Sketch.hllEstimate(regs.unionByName(merged))
    val exact = ev
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("grp"))
      .agg(countDistinct(col("event_id")).as("exact_distinct"))
      .unionByName(ev.agg(countDistinct(col("event_id")).as("exact_distinct"))
        .select(lit("__all__").as("grp"), col("exact_distinct")))
    est.join(exact, "grp")
      .select(col("grp"), col("v_empty"), col("est_distinct"),
        col("exact_distinct"),
        expr("CAST(abs(est_distinct - exact_distinct) * 1000000" +
          " DIV exact_distinct AS BIGINT)").as("err_ppm"))
      .orderBy(col("grp"))
  }

  /** Pre-r21 dedup_jaccard_prefix (verbatim): dfreq aggregate + join-back
    * prefix build, then the candidate self-join and exact verification. */
  private def jaccardPrefixOld(sh: DataFrame, threshold: Double): DataFrame = {
    val flat = sh.select(col("doc_id"), size(col("shingles")).as("nsh"),
      explode(col("shingles")).as("sh"))
    val dfreq = flat.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("sh").asc)
    val prefix = flat.join(dfreq, "sh")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <=
        col("nsh") - ceil(col("nsh") * threshold - 1e-9) + 1)
      .select(col("doc_id"), col("sh"))
      .localCheckpoint(eager = false)
    val cands = prefix.select(col("doc_id").as("a"), col("sh"))
      .join(prefix.select(col("doc_id").as("b"), col("sh")), "sh")
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val sets = sh.select(col("doc_id"), col("shingles"))
    cands
      .join(sets.select(col("doc_id").as("a"), col("shingles").as("sha")), "a")
      .join(sets.select(col("doc_id").as("b"), col("shingles").as("shb")), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .where(col("inter").cast("double") / col("uni") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("uni"))
      .orderBy(col("a"), col("b"))
  }

  /** Pre-r21 connected components (verbatim r20-fused loop: join-back
    * star phases, convergence fused into the round's materialization). */
  private def ccOldR20(pairs0: DataFrame, maxRounds: Int = 50): DataFrame = {
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
    def largeStar(edges: DataFrame): DataFrame = {
      val nbrs = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nbrs.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(edges: DataFrame): DataFrame = {
      val oriented = edges.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v"))
      val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      oriented.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    val pairs = pairs0.select(col("a"), col("b")).localCheckpoint(eager = false)
    var edges = cut(smallStar(pairs
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()))
    var round = 0
    var converged = edges.isEmpty
    while (!converged && round < maxRounds) {
      val flagged = cut(smallStar(largeStar(edges))
        .withColumn("__l", lit(1))
        .join(edges.select(col("u"), col("v"), lit(1).as("__r")),
          Seq("u", "v"), "full_outer"))
      converged = flagged
        .where(col("__l").isNull || col("__r").isNull)
        .isEmpty
      edges = flagged.where(col("__l").isNotNull).select(col("u"), col("v"))
      round += 1
    }
    if (!converged) throw new IllegalStateException("no convergence")
    val allV = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    allV.join(edges.select(col("u").as("doc_id"), col("v").as("canon_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canon_id"), col("doc_id")).as("canon_id"))
  }

  /** Pre-r21 knn_mips_ivf (verbatim): un-snapshotted corpus, struct-array
    * assignment/probe trees with per-centroid typedLits. */
  private def mipsIvfOld(s: SparkSession, dir: String): DataFrame = {
    import graft.exprs.Sq8
    val e = graft.Graft.table(s, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
      .select(col("vid"),
        expr("transform(v, x -> (1 + vid % 10) * " +
          "CAST(round(CAST(x AS DOUBLE) * 1000000.0D) AS BIGINT))").as("f"))
    val queries = e.where(col("vid") < 20)
      .select(col("vid").as("qid"), col("f").as("qf"))
    val corpus = e
    val centroids = e.where(col("vid") < 16)
      .select(col("vid").as("cid"), col("f").as("cf"))
    val nProbe = 2
    val k = 5
    val self = Sq8.dot_int(col("f"), col("f"))
    val m2 = corpus.agg(max(self)).collect()(0).getLong(0)
    val centArr = centroids
      .select(col("cid").cast("long"), col("cf"))
      .collect()
      .map { r =>
        val cf = r.getSeq[Long](1).toArray
        var acc = 0L
        var i = 0
        while (i < cf.length) { acc += cf(i) * cf(i); i += 1 }
        (r.getLong(0), cf, math.sqrt(math.max(0L, m2 - acc).toDouble))
      }
      .sortBy(_._1)
    val eX = sqrt(greatest(lit(m2) - self, lit(0L)).cast("double"))
    val asg = corpus.withColumn("cell",
      array_min(array(centArr.map { case (cid, cf, eC) =>
        struct(
          (-(Sq8.dot_int(col("f"), typedLit(cf.toSeq)).cast("double")
            + eX * lit(eC))).as("ns"),
          lit(cid).as("c"))
      }: _*)).getField("c"))
    val probes = queries.withColumn("pc",
        explode(slice(array_sort(array(centArr.map { case (cid, cf, _) =>
          struct((-Sq8.dot_int(col("qf"), typedLit(cf.toSeq))).as("ns"),
            lit(cid).as("c"))
        }: _*)), 1, nProbe)))
      .select(col("qid"), col("qf"), col("pc").getField("c").as("cell"))
    val cands = broadcast(probes).join(asg, "cell")
      .where(col("vid") =!= col("qid"))
      .withColumn("ipd", Sq8.dot_int(col("qf"), col("f")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("ipd").desc, col("vid").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vid").as("neighbor"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    def want(tag: String): Boolean = only.isEmpty || only(tag)
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

    val toks = graft.Graft.table(s, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenizeDefault(col("text")).as("toks"))
      .localCheckpoint(eager = false)
    toks.count() // materialize the shared fixture outside the timed region

    def registry(name: String): Unit =
      graft.SparkEntry.queries(name)(s, sfDir).count()

    if (want("tfidf-window"))
      ab("tfidf-window", reps) { tfidfOld(toks, 3).count() } {
        registry("text_tfidf_top")
      }
    if (want("hdr-rankpick"))
      ab("hdr-rankpick", reps) { hdrOld(s, sfDir).count() } {
        registry("sketch_quantile_hdr")
      }
    if (want("hll-fused-exact"))
      ab("hll-fused-exact", reps) { hllOld(s, sfDir).count() } {
        registry("sketch_hll")
      }
    if (want("hllwin-fused-exact"))
      ab("hllwin-fused-exact", reps) { hllWinOld(s, sfDir).count() } {
        registry("sketch_hll_window")
      }
    if (want("cc-windowstar")) {
      val pc = graft.ops.Dedup.embeddingCosine(
        graft.Graft.table(s, sfDir, "embeddings"),
        col("vec_id"), col("embedding"), col("label"), 0.4)
        .select(col("a"), col("b")).localCheckpoint(eager = false)
      pc.count()
      ab("cc-windowstar", reps) { ccOldR20(pc).count() } {
        graft.ops.Dedup.connectedComponents(pc).count()
      }
    }
    if (want("mips-expr"))
      ab("mips-expr", reps) { mipsIvfOld(s, sfDir).count() } {
        registry("knn_mips_ivf")
      }
    if (want("sem-full"))
      ab("sem-full", reps) {
        // old full dedup_semantic = old CC is the only differing term; use
        // the registry for both sides at different code states via bench
        // instead — this tag intentionally compares registry vs registry
        // to expose run-to-run noise for calibration.
        registry("dedup_semantic")
      } {
        registry("dedup_semantic")
      }
    if (want("prefix-windowdf")) {
      val sh = graft.ops.Dedup.shingles(toks, col("doc_id"), col("toks"), 5)
        .localCheckpoint(eager = false)
      sh.count()
      ab("prefix-windowdf", reps) { jaccardPrefixOld(sh, 0.5).count() } {
        registry("dedup_jaccard_prefix")
      }
    }
    s.stop()
  }
}
