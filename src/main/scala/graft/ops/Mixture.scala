package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mixture assembly arithmetic — the step that turns "mix
  * sources at weights w_s" into concrete per-source token budgets
  * (the Pile / Llama-style pretraining mixtures are specified exactly
  * this way): with integer weight parts w_s and T_s tokens available in
  * source s, the largest NO-UPSAMPLING budget is u = min_s ⌊T_s / w_s⌋
  * whole mixture units, and source s contributes alloc_s = w_s · u
  * tokens of it. Everything stays integer arithmetic, so the result is
  * engine-reproducible; upsampling policies (multiple epochs over a
  * small high-weight source) are a caller-side relaxation of the same
  * numbers, not a different computation.
  *
  * Scale shape: ONE source-keyed aggregate over the corpus (partial
  * map-side combine, tiny result), then the global min over the handful
  * of per-source rows is an unpartitioned window OVER THAT AGGREGATE —
  * single-partition, but only the per-source rows ever enter it, so the
  * corpus is never reshuffled and never read twice. (A two-branch
  * aggregate-plus-crossJoin form reads the corpus TWICE: column pruning
  * specializes each branch's scan, so ReuseExchange never fires —
  * plan-pinned in PlanSpec.)
  */
object Mixture {

  /** `source`/`nTok`/`weight` are expressions over `df`'s columns;
    * `weight` must be functionally determined by `source` (it keys the
    * aggregate alongside it). Output per source:
    * (source, n_docs, n_tokens, weight, alloc_tokens). */
  def mixAllocation(df: DataFrame, source: Column, nTok: Column,
      weight: Column): DataFrame = {
    val per = df.select(source.as("source"), nTok.as("n_tok"), weight.as("weight"))
      .groupBy(col("source"), col("weight"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    // the no-upsampling unit count: global min over the per-source rows
    val u = min(expr("n_tokens DIV weight"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    per.select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
      (col("weight") * u).as("alloc_tokens"))
  }
}
