package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph computation beyond [[Dedup.connectedComponents]]'
  * label propagation: PageRank (Page et al. 1999) in exact integer
  * arithmetic — the web-graph authority signal crawl curation ranks
  * seed hosts by (the Common Crawl / RefinedWeb host-ranking shape).
  *
  * Determinism: ranks are micro-units (initial 10^6 per node); one
  * iteration sends each node's `rank DIV out_degree` along every edge
  * (truncating division — Spark `DIV` ≡ DuckDB `//`), sums inflow as
  * exact integers, and applies damping as
  * `150000 + (85 · inflow) DIV 100` — no float ever exists, so the fixed
  * iteration count unrolls verbatim in a DuckDB oracle. (Float PageRank
  * converges to the same ordering; the integer form trades the last ulp
  * of mass conservation for bit-exact reproducibility, the same trade
  * every quantized op in this package makes.)
  *
  * Scale shape: the rank vector and edge list stay distributed; one
  * iteration = one (src-keyed) join of ranks onto edges + one dst-keyed
  * combiner aggregate — the standard distributed PageRank plan, cost
  * linear in |E| per iteration with no driver-side state at all (the
  * iteration count is a fixed parameter, not a convergence collect).
  * Dangling nodes contribute nothing (their mass evaporates — the
  * simple variant; redistributing it is a 1-row aggregate broadcast a
  * caller can add).
  */
object Graphs {

  /** `iterations` rounds of integer PageRank over `edges` (src, dst)
    * starting every node of `nodes` (id) at 10^6 micro-units. Output:
    * (id, rank_q) for every node, after exactly `iterations` rounds. */
  def pageRank(nodes: DataFrame, edges: DataFrame,
      iterations: Int): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    val n = nodes.select(col("id")).localCheckpoint(eager = false)
    // snapshot the caller's edge plan ONCE (it feeds both the edge list
    // and the degree aggregate — the module self-join rule), then attach
    // degrees by a src-keyed join computed once; the degree table is
    // |V|-sized, so it shuffles rather than broadcasts — AQE may still
    // broadcast small graphs on its own
    val ed = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    val e = ed
      .join(ed.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      .localCheckpoint(eager = false) // consumed once per iteration
    var ranks = n.withColumn("rank_q", lit(1000000L))
    for (_ <- 1 to iterations) {
      val inflow = e.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("rank_q DIV deg").as("contrib"))
        .groupBy(col("id")).agg(sum(col("contrib")).as("inflow"))
      // snapshot each round's vector: without the cut, iteration i's plan
      // nests i copies of the join+aggregate and analysis cost compounds
      // with caller-chosen iteration counts (the iterate-then-checkpoint
      // discipline every loop in graft.ops follows)
      ranks = n.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) +
            expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) DIV 100"))
            .as("rank_q"))
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
