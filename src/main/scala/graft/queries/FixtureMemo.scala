package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Per-process memo for DETERMINISTIC in-query training fixtures — the
  * r16-verdict "separate train cost from serve cost" knob.
  *
  * Several registry rows gate a SERVING read shape whose fixture is a
  * trained model (3-round k-means centroid tables, residual-trained PQ
  * codebooks). The training is part of the row's CORRECTNESS story — the
  * oracle replays it — but it is NOT the operator under measurement, and
  * because `Bench` re-invokes each query constructor per timed run, the
  * fixture retrained on every iteration and the serving rows' bench
  * numbers increasingly measured fixture k-means instead of probe/rank
  * cost (r16: `knn_serving_recall` spent ~80% of its wall in training).
  *
  * Every fixture here is a PURE function of its determinism key (scale
  * directory + sizing knobs): integer fixed-point k-means, truncating
  * division, hash-window seeding — no RNG, no timestamps. So a
  * process-wide memo is semantically invisible: the FIRST construction
  * per key still runs the full training (Verify and every spec therefore
  * still exercise it; `Bench`'s untimed warmup pass populates the memo),
  * and later constructions replay bit-identical values. CORRECTNESS
  * output is unchanged by construction; only repeat-construction cost
  * moves.
  *
  * Size is bounded: keys ∝ (distinct scale dirs in the process) ×
  * (fixture kinds, single digits), each value either a codebook
  * (m × 256 × subDim longs) or a centroid table (≤ ⌈√n⌉ rows) — driver
  * model artifacts, the same things `Ann.kmeansTrain` callers collect
  * anyway. The in-plan TRAINING gates (`pipe_kmeans_step/train`,
  * `pipe_bpe_train`, …) are deliberately NOT memoized — their output IS
  * the training.
  */
object FixtureMemo {
  private val cache = TrieMap.empty[String, AnyRef]

  /** Memoize a driver-side model artifact (PQ codebooks, collected
    * centroid arrays) by its determinism key. A concurrent first call
    * may evaluate `compute` twice (TrieMap's optimistic insert) — safe
    * because every memoized fixture is deterministic. */
  def model[T <: AnyRef](key: String)(compute: => T): T =
    cache.getOrElseUpdate(key, compute).asInstanceOf[T]

  /** Memoize a SMALL deterministic DataFrame (a trained centroid table)
    * as collected rows; replays rebuild a LocalRelation in the caller's
    * session — the kmeans unroll leaves the plan, the values do not.
    * Only fixture-sized relations belong here (the collect is the same
    * bounded model pull the serving tiers already do to broadcast
    * centroids). */
  def table(s: SparkSession, key: String)(compute: => DataFrame): DataFrame = {
    val (schema, rows) = cache.getOrElseUpdate(key, {
      val df = compute
      (df.schema, df.collect()): (StructType, Array[Row])
    }).asInstanceOf[(StructType, Array[Row])]
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Memoized-entry count — observability for specs. */
  def resident: Int = cache.size

  /** Drop every memoized fixture (test isolation). */
  def clear(): Unit = cache.clear()
}
