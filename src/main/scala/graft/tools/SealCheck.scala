package graft.tools

/** One-command verification that the committed final-seal artifacts
  * still adjudicate clean — the "self-evidently sealed" criterion as a
  * runnable check instead of a judge recipe.
  *
  * The seal protocol (SURVEY §11, r19–r20) commits FOUR bench
  * artifacts: the prior round's seal, two same-code baseline runs of
  * the sealed HEAD, and the seal run itself, plus a BenchDiff
  * transcript. "Sealed" means a cold reader can reproduce, from those
  * committed files alone, that nothing regressed: every conviction the
  * pairwise face raises must dissolve against the same-code baselines
  * (box noise convicts against SOME baselines; a code regression
  * convicts against ALL of them). This tool runs both faces through
  * the same [[BenchDiff]] classifier the CLI uses ([[BenchDiff.convictionsOf]] —
  * shared code, so the thresholds cannot drift) and asserts:
  *
  *   1. the four artifacts parse, carry full wall+cpu columns (not
  *      salvaged tail fragments); the three sealed-HEAD runs cover the
  *      IDENTICAL registry and the prior seal's registry is a subset
  *      of it (growth-only — new gates have no prior row);
  *   2. each run of the sealed HEAD reports `failed: 0` and an empty
  *      `flapped` list (no self-flagged storm rows);
  *   3. pairwise prior-seal → new-seal convicts NOTHING (the r20 seal
  *      is clean even before baseline dissolution — face 1 of the
  *      committed transcript);
  *   4. conviction-stability — candidate = seal, baselines = {base1,
  *      base2, prior seal} — yields an EMPTY stable set (face 2, the
  *      load-bearing check).
  *
  * Run: runMain graft.tools.SealCheck [artifact-dir]
  * (defaults to the repo root's committed r20 artifact names; exits
  * nonzero on any failed check). SealCheckSpec drives the same
  * [[run]] against the committed files so `sbt test` re-verifies the
  * seal every run.
  */
object SealCheck {

  final case class Check(name: String, ok: Boolean, detail: String)

  /** All seal checks over four artifact paths; pure (no printing). */
  def run(prior: String, base1: String, base2: String,
      seal: String): Seq[Check] = {
    val paths = Seq(prior, base1, base2, seal)
    val runs = paths.map(p => p -> BenchDiff.load(p)).toMap
    def name(p: String) = new java.io.File(p).getName
    val checks = scala.collection.mutable.ArrayBuffer[Check]()

    checks += Check("artifacts carry full wall+cpu columns",
      runs.values.forall(r => !r.salvaged && r.cpu.nonEmpty),
      paths.map(p => s"${name(p)}: salvaged=${runs(p).salvaged} " +
        s"cpu=${runs(p).cpu.size}").mkString("; "))
    // the three sealed-HEAD runs must cover the IDENTICAL registry;
    // the prior seal may be a SUBSET (the registry only grows between
    // rounds — new gates have no prior and pairwise ignores them), but
    // never a superset (a dropped query would silently vanish from
    // every adjudication face)
    val sealNames = runs(seal).wall.keySet
    checks += Check("registry names: sealed-HEAD runs identical, prior a subset",
      Seq(base1, base2).forall(p => runs(p).wall.keySet == sealNames) &&
        runs(prior).wall.keySet.subsetOf(sealNames),
      paths.map(p => s"${name(p)}=${runs(p).wall.size}").mkString(", ") + {
        val grown = sealNames.diff(runs(prior).wall.keySet)
        if (grown.isEmpty) "" else s" (new since prior: ${grown.toList.sorted.mkString(", ")})"
      })

    // failed: 0 + flapped: [] on every run of the sealed HEAD
    for (p <- Seq(base1, base2, seal)) {
      val failed = Option(graft.exprs.JsonSupport.parse(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8")).get("failed"))
        .map(_.asInt(-1)).getOrElse(-1)
      checks += Check(s"${name(p)}: failed=0, flapped empty",
        failed == 0 && runs(p).flapped.isEmpty,
        s"failed=$failed flapped=[${runs(p).flapped.toList.sorted.mkString(",")}]")
    }

    val pairwise = BenchDiff.convictionsOf(runs(prior), runs(seal))
    checks += Check("pairwise prior->seal: zero regressions",
      pairwise.isEmpty,
      if (pairwise.isEmpty) "clean" else pairwise.toList.sorted.mkString(", "))

    val perBaseline = Seq(base1, base2, prior)
      .map(b => b -> BenchDiff.convictionsOf(runs(b), runs(seal)))
    val stable = perBaseline.map(_._2).reduce(_ & _)
    checks += Check("conviction-stability: zero STABLE convictions",
      stable.isEmpty,
      perBaseline.map { case (b, c) =>
        s"vs ${name(b)}: ${if (c.isEmpty) "0" else c.toList.sorted.mkString("/")}"
      }.mkString("; ") +
        (if (stable.isEmpty) " -> stable set empty"
        else s" -> STABLE: ${stable.toList.sorted.mkString(", ")}"))
    checks.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".")
    val cs = run(s"$dir/BENCH_r19_local_full.json",
      s"$dir/BENCH_r20_base1.json", s"$dir/BENCH_r20_base2.json",
      s"$dir/BENCH_r20_local_full.json")
    cs.foreach(c =>
      println(f"${if (c.ok) "PASS" else "FAIL"}%s  ${c.name}%-46s ${c.detail}"))
    if (cs.forall(_.ok))
      println("SEAL VERIFIED: the committed artifacts adjudicate clean " +
        "(zero regressions, zero stable convictions)")
    else {
      println("SEAL CHECK FAILED — see FAIL rows above")
      sys.exit(1)
    }
  }
}
