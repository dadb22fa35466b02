package graft.tools

import scala.jdk.CollectionConverters._

/** Cross-round bench adjudicator — applies the SURVEY §11 drift-reading
  * rule MECHANICALLY so that separating a real regression from a noisy
  * box stops burning judge cycles (it did in r12 and r13):
  *
  *  - **query-local cpu↑** (cpu ratio > 1.4× and > 1.4× the round's
  *    median cpu ratio, on a non-trivial query) → REGRESSION — CPU time
  *    is load-invariant on an idle-ish box, so only a code change moves
  *    it locally;
  *  - **wall↑ with cpu flat** (wall ratio > 1.4×, cpu ratio ≤ 1.15×) →
  *    CONTENTION — the work was the same, the box was busy;
  *  - **uniform both↑** (median cpu ratio itself elevated across ≥ 3/4
  *    of queries) → THROTTLED CLOCK / changed harness — a global
  *    multiplier is an environment property, not a per-query defect;
  *  - queries under 0.2 s wall in BOTH runs are TRIVIA: their medians
  *    flap ±2–4× run-to-run (measured r13), so they only count when
  *    their absolute cpu moved ≥ 0.3 s.
  *
  * Input: two Bench JSON artifacts. The repo's own format carries
  * `queries` (wall sec) and `cpu` (process-CPU sec) maps; a
  * driver-truncated artifact that only has a `tail` string fragment is
  * salvaged by regex (wall-only — the tool then says so and classifies
  * conservatively: without CPU, wall movement alone NEVER convicts).
  *
  * Run: runMain graft.tools.BenchDiff <before.json> <after.json>
  *
  * Validated against the r12→r13 artifacts (the round the rule was
  * written for): BenchDiff over BENCH_r12.json → BENCH_r13_local_full
  * .json reproduces the r13 verdict's conclusion — zero regressions,
  * movers classified contention/trivia; over the driver's truncated
  * BENCH_r13.json it reports the wall-only uniform inflation as
  * clock/harness, not regression.
  */
object BenchDiff {

  final case class Run(wall: Map[String, Double], cpu: Map[String, Double],
      label: String, salvaged: Boolean,
      flapped: Set[String] = Set.empty,
      wallMin: Map[String, Double] = Map.empty,
      wallMax: Map[String, Double] = Map.empty)

  def load(path: String): Run = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val node = graft.exprs.JsonSupport.parse(text)
    def numMap(key: String): Map[String, Double] =
      Option(node.get(key)).filter(_.isObject).map { o =>
        o.properties().asScala
          .map(e => e.getKey -> e.getValue.asDouble()).toMap
      }.getOrElse(Map.empty)
    val wall = numMap("queries")
    // r18 storm-proofed artifacts carry their own adjudication: the
    // bench's flap detector (spread or prior-seal wall step with cpu
    // flat) plus per-query wall (min, max) across iterations
    val flapped: Set[String] =
      Option(node.get("flapped")).filter(_.isArray)
        .map(_.elements().asScala.map(_.asText()).toSet)
        .getOrElse(Set.empty)
    if (wall.nonEmpty) Run(wall, numMap("cpu"), path, salvaged = false,
      flapped, numMap("wall_min"), numMap("wall_max"))
    else {
      // driver-truncated artifact: salvage "name":number pairs from the
      // tail fragment (wall only, and possibly missing early queries)
      val tail = Option(node.get("tail")).map(_.asText()).getOrElse("")
      val pair = """"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)""".r
      val skip = Set("n", "rc", "cpus", "sf", "value", "failed", "cpu_total")
      val m = pair.findAllMatchIn(tail)
        .map(mm => mm.group(1) -> mm.group(2).toDouble)
        .filterNot { case (k, _) => skip(k) }.toMap
      Run(m, Map.empty, s"$path (salvaged tail fragment)", salvaged = true)
    }
  }

  final case class Mover(q: String, wb: Double, wa: Double, wr: Double,
      cr: Double, cls: String)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff <before.json> [more-baselines.json ...] <after.json>\n" +
        "  2 artifacts: the classic pairwise adjudication\n" +
        "  3+ artifacts: the LAST is the candidate; every earlier one is an\n" +
        "  independent baseline, and only convictions that hold against ALL\n" +
        "  baselines report as STABLE (single-pair convictions on a noisy\n" +
        "  box are exactly the flap this mode exists to silence)")
    if (args.length == 2) { pairwise(load(args(0)), load(args(1))); return }
    // conviction-stability mode (r15 verdict #7): the r14/r15 artifact
    // pair convicted differently depending on which adjacent run was
    // picked — a real regression must hold against EVERY baseline.
    val after = load(args.last)
    val baselines = args.dropRight(1).map(load).toSeq
    println(s"candidate: ${after.label} (${after.wall.size} queries)")
    println(s"baselines: ${baselines.size}")
    val perPair = baselines.map { b =>
      val (regs, movers) = classify(b, after)
      println(s"  vs ${b.label}: ${regs.size} conviction(s)" +
        (if (regs.nonEmpty) s" — ${regs.toList.sorted.mkString(", ")}" else "") +
        s"; ${movers.length - regs.size} environment/noise mover(s)")
      regs
    }
    val stable = perPair.reduce(_ & _)
    val flappy = perPair.reduce(_ | _) -- stable
    if (flappy.nonEmpty)
      println(s"unstable (convicted in SOME pairs only — box noise, not " +
        s"code): ${flappy.toList.sorted.mkString(", ")}")
    if (stable.isEmpty)
      println("verdict: zero STABLE convictions — nothing regresses " +
        "against every baseline")
    else {
      println(s"verdict: ${stable.size} STABLE conviction(s) — regression " +
        "holds against every baseline:")
      stable.toList.sorted.foreach { q =>
        val cols = baselines.map(b => f"${b.cpu.getOrElse(q, Double.NaN)}%.2f")
        println(f"  $q%-32s cpu ${cols.mkString(" / ")} -> " +
          f"${after.cpu.getOrElse(q, Double.NaN)}%.2f s")
      }
    }
  }

  /** The convicted query set of one pairwise adjudication — the
    * programmatic face of [[classify]] for [[SealCheck]], so the seal
    * verifier and the CLI modes can never drift apart on thresholds. */
  def convictionsOf(before: Run, after: Run): Set[String] =
    classify(before, after)._1

  /** One pairwise adjudication, silent — returns (convicted query set,
    * all movers) for the stability intersection. */
  private def classify(before: Run, after: Run): (Set[String], Seq[Mover]) = {
    val movers = moversOf(before, after)._1
    (movers.filter(_.cls.startsWith("REGRESSION")).map(_.q).toSet, movers)
  }

  private def pairwise(before: Run, after: Run): Unit = {
    val (movers, summary) = moversOf(before, after)
    println(s"before: ${before.label} (${before.wall.size} queries)")
    println(s"after:  ${after.label} (${after.wall.size} queries)")
    summary.foreach(println)

    if (movers.isEmpty) println("movers: none above the 1.4x gate — clean")
    else {
      println(f"${"query"}%-32s ${"wall"}%14s ${"ratio"}%7s ${"cpu-r"}%7s  class")
      movers.foreach { m =>
        val cpuS = if (m.cr.isNaN) "    --" else f"${m.cr}%6.2fx"
        println(f"${m.q}%-32s ${m.wb}%6.2f\u2192${m.wa}%5.2fs ${m.wr}%6.2fx $cpuS  ${m.cls}")
      }
    }
    val regs = movers.count(_.cls.startsWith("REGRESSION"))
    val nCommon = (before.wall.keySet & after.wall.keySet).size
    println(s"verdict: $regs regression(s), " +
      s"${movers.length - regs} environment/noise mover(s), " +
      s"${nCommon - movers.length} stable")
  }

  /** The SURVEY §11 rule as a pure function: movers + the human-facing
    * summary lines, shared by the pairwise and conviction-stability
    * modes so the thresholds cannot drift between them. */
  private def moversOf(before: Run, after: Run): (Seq[Mover], Seq[String]) = {
    val common = (before.wall.keySet & after.wall.keySet).toList.sorted
    require(common.nonEmpty, "no common queries between the two runs")
    val haveCpu = common.forall(q =>
      before.cpu.contains(q) && after.cpu.contains(q))
    val summary = scala.collection.mutable.ArrayBuffer[String](
      s"common: ${common.size} queries; cpu column: " +
        (if (haveCpu) "both runs" else "MISSING in at least one — " +
          "wall-only mode, nothing can be convicted as a regression"))

    def ratio(a: Double, b: Double): Double =
      if (a <= 0.0) Double.NaN else b / a
    def median(xs: Seq[Double]): Double = {
      val s = xs.filterNot(_.isNaN).sorted
      if (s.isEmpty) Double.NaN else s(s.length / 2)
    }
    val wallR = common.map(q => q -> ratio(before.wall(q), after.wall(q))).toMap
    val cpuR = if (haveCpu)
      common.map(q => q -> ratio(before.cpu(q), after.cpu(q))).toMap
    else Map.empty[String, Double]
    val medWall = median(common.map(wallR))
    val medCpu = if (haveCpu) median(common.map(cpuR)) else Double.NaN
    summary += f"median ratios: wall ${medWall}%.2fx" +
      (if (haveCpu) f", cpu ${medCpu}%.2fx" else "")
    if (after.flapped.nonEmpty)
      summary += s"after-run self-flagged flaps (bench storm detector): " +
        after.flapped.toList.sorted.mkString(", ")
    if (before.flapped.nonEmpty)
      summary += s"before-run self-flagged flaps (wall evidence void " +
        s"for them): " + before.flapped.toList.sorted.mkString(", ")

    // global verdict first: a uniform multiplier is environment, not code
    val uniformCut = 1.2
    val uniformFrac = common.count(q => wallR(q) > uniformCut).toDouble / common.size
    val globalVerdict =
      if (haveCpu && medCpu > 1.3 &&
          common.count(q => cpuR(q) > uniformCut) * 4 >= common.size * 3)
        "THROTTLED CLOCK / changed environment (cpu uniformly elevated)"
      else if (medWall > 1.3 && (!haveCpu || medCpu <= 1.15) && uniformFrac >= 0.75)
        "CONTENTION or changed harness (wall uniformly up, cpu flat" +
          (if (haveCpu) ")" else " evidence unavailable)")
      else "comparable environments (no uniform multiplier)"
    val uniformEnv = !globalVerdict.startsWith("comparable")
    summary += s"global: $globalVerdict"

    val trivial = 0.2
    val movers = common.flatMap { q =>
      val (wb, wa) = (before.wall(q), after.wall(q))
      val wr = wallR(q)
      val cr = cpuR.getOrElse(q, Double.NaN)
      // trivia keys on the BEFORE wall: a sub-0.2 s query's medians flap
      // ±2–4x run-to-run, so only an absolute cpu move can convict it
      val isTrivia = wb < trivial &&
        (!haveCpu || math.abs(after.cpu(q) - before.cpu(q)) < 0.3)
      // a query EITHER run self-flagged (r18 bench storm detector), or
      // whose iteration spread exceeded 3x on either side, carries a
      // contaminated wall median — wall evidence is void for it in BOTH
      // directions: a stormed BEFORE inflates the denominator, so a real
      // regression reads as an IMPROVEMENT — that face is gated below
      // (r18 advice), not just the wr > 1.4 face; cpu still convicts
      def spreadOf(r: Run): Double =
        (r.wallMin.get(q), r.wallMax.get(q)) match {
          case (Some(mn), Some(mx)) if mn > 0.05 => mx / mn
          case _ => 1.0
        }
      val afterSpread = math.max(spreadOf(after), spreadOf(before))
      val beforeVoid = before.flapped(q) || spreadOf(before) > 3.0
      val wallVoid = after.flapped(q) || before.flapped(q) ||
        afterSpread > 3.0
      val cls =
        if (haveCpu && cr > 1.4 && cr > 1.4 * medCpu &&
          after.cpu(q) - before.cpu(q) >= 0.3)
          Some("REGRESSION (query-local cpu up)")
        else if (wallVoid && wr > 1.4)
          Some(if (after.flapped(q))
            "self-flagged flap (bench annotation — wall evidence void)"
          else f"iteration spread ${afterSpread}%.1fx (wall evidence void)")
        else if (isTrivia) None
        else if (beforeVoid && wr < 1.0 / 1.4)
          // the stormed-denominator face: this "improvement" divides by
          // a contaminated BEFORE median — it may hide a flat or even
          // regressed query, so it must surface annotated, never pass
          // silently as stable/fast (cpu above already convicted if the
          // compute genuinely moved; trivia rows stay silent — their
          // wall medians are never evidence in either direction)
          Some("improvement over a stormed/flapped BEFORE " +
            "(wall evidence void)")
        else if (uniformEnv && wr > 1.4 && wr <= 2.2 * medWall &&
          (!haveCpu || cr <= 1.4 * math.max(1.0, medCpu)))
          Some("follows the global multiplier")
        else if (wr > 1.4 && (!haveCpu || cr <= 1.15))
          Some(if (haveCpu) "contention (wall up, cpu flat)"
          else "wall up (no cpu evidence — not convictable)")
        else if (wr > 1.4 || (haveCpu && cr > 1.4))
          Some("moved with the environment (mixed evidence)")
        else if (beforeVoid)
          // the remaining stormed-BEFORE face (r19 advice): wr sits in
          // the 0.71–1.4 band, but dividing by a contaminated BEFORE
          // median makes THAT evidence void too — an inflated
          // denominator can mask a real regression into the band. The
          // row must not count toward the stable set; cpu above already
          // convicted if the compute genuinely moved
          Some("wall evidence void vs stormed BEFORE (in-band — " +
            "not counted stable)")
        else None
      cls.map(c => Mover(q, wb, wa, wr, cr, c))
    }.sortBy(m => (-(if (m.cls.startsWith("REGRESSION")) 1 else 0), -m.wr))
    (movers, summary.toSeq)
  }
}
