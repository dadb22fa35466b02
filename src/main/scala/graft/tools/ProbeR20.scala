package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sketch}
import graft.ops.Hashing.h64

/** Round-20 optimization A/B harness: each candidate optimization's OLD
  * form (inlined verbatim from the pre-r20 code) runs INTERLEAVED with
  * the NEW form in one JVM — old, new, old, new, … — so box-level drift
  * (this machine's wall AND cpu wander ~2× between minutes; see
  * OPTIMIZATION_r20.md "measurement conditions") hits both forms
  * equally and the PAIRED per-iteration delta is the signal. Reports
  * per-iteration wall and process-cpu for both forms plus the median
  * paired ratio.
  *
  * Usage: runMain graft.tools.ProbeR20 [reps]   (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS — the Bench contract).
  */
object ProbeR20 {

  private def cpuBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** One timed action: (wall s, process-cpu s). */
  private def timed(f: => Unit): (Double, Double) = {
    val b = cpuBean
    val c0 = b.getProcessCpuTime
    val t0 = System.nanoTime()
    f
    ((System.nanoTime() - t0) / 1e9, (b.getProcessCpuTime - c0) / 1e9)
  }

  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  /** Interleaved A/B: per rep, run OLD then NEW; report medians and the
    * median of per-rep ratios (new/old) — the drift-cancelling number. */
  private def ab(tag: String, reps: Int)(oldF: => Unit)(newF: => Unit): Unit = {
    // one unmeasured warmup each so JIT/codegen lands outside the sample
    oldF; newF
    val pairs = (1 to reps).map { _ => (timed(oldF), timed(newF)) }
    val ow = pairs.map(_._1._1); val oc = pairs.map(_._1._2)
    val nw = pairs.map(_._2._1); val nc = pairs.map(_._2._2)
    val rw = pairs.map(p => p._2._1 / p._1._1)
    val rc = pairs.map(p => p._2._2 / math.max(p._1._2, 1e-9))
    println(f"[r20ab] $tag%-28s old ${med(ow)}%6.2f s/${med(oc)}%6.2f cpu   " +
      f"new ${med(nw)}%6.2f s/${med(nc)}%6.2f cpu   " +
      f"ratio wall ${med(rw)}%.2f cpu ${med(rc)}%.2f")
  }

  // ---- OLD forms, inlined verbatim from pre-r20 code --------------------

  /** Pre-r20 recallReport: no snapshot — truth and cand each execute
    * twice (hit join + own count). */
  private def recallReportOld(truth: DataFrame, cand: DataFrame): DataFrame = {
    val hit = truth.join(cand, Seq("a", "b")).agg(count(lit(1)).as("n_hit"))
    val nt = truth.agg(count(lit(1)).as("n_true"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    nt.crossJoin(nc).crossJoin(hit)
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        expr("CASE WHEN n_cand > 0 THEN n_hit * 1000000 DIV n_cand ELSE 1000000 END")
          .as("precision_ppm"),
        expr("CASE WHEN n_true > 0 THEN n_hit * 1000000 DIV n_true ELSE 1000000 END")
          .as("recall_ppm"))
  }

  /** r20 recallReport: both sides snapshotted. */
  private def recallReportNew(truth0: DataFrame, cand0: DataFrame): DataFrame = {
    val truth = truth0.localCheckpoint(eager = false)
    val cand = cand0.localCheckpoint(eager = false)
    val hit = truth.join(cand, Seq("a", "b")).agg(count(lit(1)).as("n_hit"))
    val nt = truth.agg(count(lit(1)).as("n_true"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    nt.crossJoin(nc).crossJoin(hit)
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        expr("CASE WHEN n_cand > 0 THEN n_hit * 1000000 DIV n_cand ELSE 1000000 END")
          .as("precision_ppm"),
        expr("CASE WHEN n_true > 0 THEN n_hit * 1000000 DIV n_true ELSE 1000000 END")
          .as("recall_ppm"))
  }

  /** Pre-r20 connected components (verbatim loop: materialize `next`,
    * then a second full-outer-join pass for the convergence check). */
  private def ccOld(pairs0: DataFrame, maxRounds: Int = 50): DataFrame = {
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
      val next = cut(smallStar(largeStar(edges)))
      converged = next.select(col("u"), col("v"), lit(1).as("__l"))
        .join(edges.select(col("u"), col("v"), lit(1).as("__r")),
          Seq("u", "v"), "full_outer")
        .where(col("__l").isNull || col("__r").isNull)
        .isEmpty
      edges = next
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

  /** Pre-r20 sketch_kmv_setops (verbatim): per-tier distinct passes and
    * the double kmvMerge. */
  private def kmvOld(s: SparkSession, dir: String, k: Int): DataFrame = {
    val li = graft.Graft.table(s, dir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        col("l_orderkey").cast("string").as("k"), col("l_orderkey"))
      .localCheckpoint(eager = false)
    val sk = Sketch.kmvSketch(li, col("grp"), col("k"), k)
      .localCheckpoint(eager = false)
    val perFlag = Sketch.kmvEstimate(sk, k)
      .select(concat(lit("distinct:"), col("grp")).as("op"),
        col("est_distinct").as("est"))
    val a = sk.where(col("grp") === "A")
    val n = sk.where(col("grp") === "N")
    val unionEst = Sketch.kmvEstimate(
      Sketch.kmvMerge(a.unionByName(n), "A+N", k), k)
      .select(lit("union:A+N").as("op"), col("est_distinct").as("est"))
    val interEst = Sketch.kmvIntersect(a, n, k)
      .select(lit("inter:A*N").as("op"), col("est_inter").as("est"))
    val ests = perFlag.unionByName(unionEst).unionByName(interEst)
    val exFlag = li.groupBy(col("grp"))
      .agg(countDistinct(col("l_orderkey")).as("exact"))
      .select(concat(lit("distinct:"), col("grp")).as("op"), col("exact"))
    val exUnion = li.where(col("grp").isin("A", "N"))
      .agg(countDistinct(col("l_orderkey")).as("exact"))
      .select(lit("union:A+N").as("op"), col("exact"))
    val exInter = li.where(col("grp") === "A").select(col("l_orderkey")).distinct()
      .join(li.where(col("grp") === "N").select(col("l_orderkey")).distinct(),
        "l_orderkey")
      .agg(count(lit(1)).as("exact"))
      .select(lit("inter:A*N").as("op"), col("exact"))
    val exacts = exFlag.unionByName(exUnion).unionByName(exInter)
    ests.join(exacts, "op")
      .select(col("op"), col("est"), col("exact"),
        expr("CAST(abs(est - exact) * 1000000 DIV exact AS BIGINT)")
          .as("err_ppm"))
      .orderBy(col("op"))
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // r21 (advice): probe evidence must be taken under the same join
      // strategy the bench executes
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val docs = graft.Graft.table(s, sfDir, "documents")
    val toks = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenizeDefault(col("text")).as("toks"))
      .localCheckpoint(eager = false)
    val sh = Dedup.shingles(toks.select(col("doc_id"), col("toks")),
        col("doc_id"), col("toks"), 5)
      .localCheckpoint(eager = false)
    sh.count() // materialize fixtures outside the timed region

    // 1. recallReport snapshot (dedup_lsh_recall shape)
    ab("recall-snapshot", reps) {
      recallReportOld(
        Dedup.ngramJaccard(sh, 0.5).select(col("a"), col("b")),
        Dedup.minhashLsh(sh, 16, 8)).count()
    } {
      recallReportNew(
        Dedup.ngramJaccard(sh, 0.5).select(col("a"), col("b")),
        Dedup.minhashLsh(sh, 16, 8)).count()
    }

    // 2. connected components fused convergence check (cluster_canon shape)
    val pairs = Dedup.minhashLsh(sh, 16, 8).localCheckpoint(eager = false)
    pairs.count()
    ab("cc-fused-check", reps) {
      ccOld(pairs).count()
    } {
      Dedup.connectedComponents(pairs).count()
    }

    // 3. kmv setops single-distinct rewrite
    ab("kmv-shared-distinct", reps) {
      kmvOld(s, sfDir, 256).count()
    } {
      graft.queries.SketchQueries.all("sketch_kmv_setops")(s, sfDir).count()
    }

    s.stop()
  }
}
