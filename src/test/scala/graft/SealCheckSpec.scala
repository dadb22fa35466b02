package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed final-seal artifacts must keep adjudicating clean —
  * [[graft.tools.SealCheck]] over the four BENCH files the r20 seal
  * commit carries, so `sbt test` re-verifies the "self-evidently
  * sealed" criterion on every run instead of leaving it a judge
  * recipe. Also pins the tool's own failure face on a doctored
  * artifact (a check that cannot fail verifies nothing).
  */
class SealCheckSpec extends AnyFunSuite {

  private val root = {
    // sbt runs tests with cwd = project base; fall back on the known
    // repo root so a future harness change fails loudly, not falsely
    val cands = Seq(new java.io.File("."), new java.io.File("/root/repo"))
    cands.find(d => new java.io.File(d, "BENCH_r20_local_full.json").isFile)
      .getOrElse(fail("committed seal artifacts not found from cwd or /root/repo"))
      .getPath
  }

  test("committed r20 seal artifacts adjudicate clean end-to-end") {
    val checks = graft.tools.SealCheck.run(
      s"$root/BENCH_r19_local_full.json", s"$root/BENCH_r20_base1.json",
      s"$root/BENCH_r20_base2.json", s"$root/BENCH_r20_local_full.json")
    assert(checks.nonEmpty)
    for (c <- checks) assert(c.ok, s"${c.name}: ${c.detail}")
  }

  test("registry-names check fails when a sealed-HEAD run drops a query") {
    // delete one query from base1's wall+cpu maps: the sealed-HEAD runs
    // no longer cover the identical registry — the names check must
    // fire (a silently vanished query would escape every adjudication)
    val base1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/BENCH_r20_base1.json")), "UTF-8")
    val n = graft.exprs.JsonSupport.parse(base1)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val q = n.get("queries").properties().iterator().next().getKey
    n.get("queries").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode].remove(q)
    n.get("cpu").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode].remove(q)
    val dir = java.nio.file.Files.createTempDirectory("sealcheck")
    val dropped = dir.resolve("dropped.json")
    java.nio.file.Files.write(dropped, n.toString.getBytes("UTF-8"))
    val checks = graft.tools.SealCheck.run(
      s"$root/BENCH_r19_local_full.json", dropped.toString,
      s"$root/BENCH_r20_base2.json", s"$root/BENCH_r20_local_full.json")
    val names = checks.find(_.name.startsWith("registry names")).get
    assert(!names.ok, names.detail)
  }

  test("SealCheck's failure face fires on a doctored artifact") {
    // clone the seal with one query's cpu tripled in EVERY artifact's
    // after-position: a regression that holds against all baselines
    // must break BOTH the pairwise and the stability checks
    val seal = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/BENCH_r20_local_full.json")), "UTF-8")
    val node = graft.exprs.JsonSupport.parse(seal)
    val q = node.get("queries").properties().iterator().next().getKey
    def bump(text: String): String = {
      val n = graft.exprs.JsonSupport.parse(text)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val cpu = n.get("cpu")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      cpu.put(q, cpu.get(q).asDouble() * 3.0 + 1.0)
      val wall = n.get("queries")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      wall.put(q, wall.get(q).asDouble() * 3.0 + 1.0)
      n.toString
    }
    val dir = java.nio.file.Files.createTempDirectory("sealcheck")
    val doctored = dir.resolve("doctored.json")
    java.nio.file.Files.write(doctored, bump(seal).getBytes("UTF-8"))
    val checks = graft.tools.SealCheck.run(
      s"$root/BENCH_r19_local_full.json", s"$root/BENCH_r20_base1.json",
      s"$root/BENCH_r20_base2.json", doctored.toString)
    val byName = checks.map(c => c.name -> c).toMap
    assert(!byName("pairwise prior->seal: zero regressions").ok,
      byName("pairwise prior->seal: zero regressions").detail)
    assert(!byName("conviction-stability: zero STABLE convictions").ok,
      byName("conviction-stability: zero STABLE convictions").detail)
  }
}
