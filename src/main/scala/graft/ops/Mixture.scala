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
  * of per-source rows rides a broadcast — the corpus is never
  * reshuffled and never read twice.
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
    // the no-upsampling unit count: one tiny row, broadcast back
    val units = per.select(min(expr("n_tokens DIV weight")).as("u"))
    per.crossJoin(broadcast(units))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        (col("weight") * col("u")).as("alloc_tokens"))
  }
}
