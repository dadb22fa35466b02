package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches with engine-portable
  * determinism — the sketch tier a 100 TB pipeline reports from when exact
  * `COUNT(DISTINCT)` / full frequency tables stop being affordable.
  *
  * Both sketches here are built from the repo's md5-derived 60-bit hash
  * ([[Hashing.h64]]) and pure integer arithmetic, so a DuckDB oracle
  * reproduces every register and counter bit-for-bit. That is deliberately
  * NOT how `approx_count_distinct` works: Spark's HLL++ register layout
  * (and DuckDB's) is engine-private, so the built-in sketch can never be
  * oracle-gated. The register CONSTRUCTION below is the textbook HLL of
  * Flajolet et al. 2007 with one portable twist — `rho` is computed as
  * `53 - length(bin(remainder))` (both engines print binary without
  * leading zeros), and the harmonic sum is kept in exact integers by
  * scaling each `2^-M[j]` term to `2^(53-M[j])`: with m=256 registers the
  * scaled sum is ≤ 2^61, inside BIGINT, so the only float op is the final
  * one-division estimate (identical operands in both engines).
  *
  * Scale shape: registers are a `groupBy(group, bucket).agg(max(rho))` —
  * partial-aggregated map-side, shuffling at most `groups × 256` rows no
  * matter the corpus; counters in the count-min sketch are
  * `groupBy(depth, col).agg(sum(cnt))` over a `depth × width` grid that is
  * constant-size regardless of input. Both merge by the same aggregates
  * (max for registers, sum for counters), which is what makes them
  * sketches: per-split partial sketches combine without revisiting data
  * (pinned in SketchSpec's merge tests).
  */
object Sketch {

  /** Register count m = 2^8. Standard error 1.04/√256 ≈ 6.5%. */
  val HllBuckets = 256

  /** h64 yields 60 bits; the top 8 select the bucket, the low 52 feed the
    * leading-zero count, so rho ∈ [1, 53]. */
  private val RemBits = 52
  private val RemMod = 1L << RemBits // 4503599627370496

  /** alpha_m · m² · 2^53 — the whole numerator of the raw HLL estimate as
    * one double constant, so the estimate is a single float division with
    * identical operands in both engines. */
  val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllBuckets) * HllBuckets.toDouble *
      HllBuckets.toDouble * 9007199254740992.0

  /** HLL register table `(group, bucket, m)` for the hashed key column:
    * bucket = top 8 hash bits, m = max over keys of (leading zeros of the
    * 52-bit remainder) + 1. Only observed buckets appear (missing bucket ≡
    * register 0); [[hllReport]] accounts for the absent ones exactly. */
  def hllRegisters(df: DataFrame, group: Column, key: Column): DataFrame =
    df.select(group.as("grp"), Hashing.h64(key).as("h"))
      .select(col("grp"),
        expr(s"CAST(h DIV $RemMod AS BIGINT)").as("bucket"),
        (col("h") % RemMod).as("r"))
      .select(col("grp"), col("bucket"),
        when(col("r") === 0, lit(53L))
          .otherwise(lit(53L) - length(bin(col("r")))).as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("m"))

  /** Raw HLL estimate per group from a register table: the scaled harmonic
    * sum S = (256 - observed)·2^53 + Σ 2^(53-M[j]) in exact BIGINTs, then
    * est = ⌊numerator / S⌋ — one double division. `v_empty` (the
    * linear-counting trigger in a full production estimator) is reported
    * rather than acted on here, keeping the raw estimate a pure
    * integer-plus-one-division value; [[hllEstimateCorrected]] applies
    * the small-range linear-counting correction in-engine (oracle-gated
    * since r11 — `sketch_hll_lc`). */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("observed"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))"))
          .cast("long").as("s_obs"))
      .select(col("grp"),
        (lit(HllBuckets.toLong) - col("observed")).as("v_empty"),
        floor(lit(HllNumerator) /
          ((lit(HllBuckets.toLong) - col("observed")) * lit(RemMod * 2) +
            col("s_obs")).cast("double")).cast("long").as("est_distinct"))

  /** Raw estimate at or below which the small-range regime applies
    * (Flajolet et al. 2007: E ≤ 5/2·m). */
  val HllSmallRangeMax: Long = (2.5 * HllBuckets).toLong

  /** [[hllEstimate]] with the small-range (linear counting) correction
    * applied IN-ENGINE: when the raw estimate is in the small-range
    * regime (≤ 5/2·m) and empty registers exist, the estimate becomes
    * `⌊m · ln(m / V)⌋` (Whang et al.'s linear counting over the m
    * registers as bitmap); otherwise the raw estimate stands. The `ln`
    * is evaluated ONCE on identical double operands in both engines and
    * floored — the module's quantize-once discipline, the same
    * last-ulp exposure as the `floor(-ln(p)·10⁶)` race keys already
    * gated elsewhere. Output adds `est_raw` and the chosen `regime`
    * ('lc' | 'raw') beside the corrected `est_distinct`, so gates pin
    * WHICH branch served each group. */
  def hllEstimateCorrected(regs: DataFrame): DataFrame =
    hllEstimate(regs)
      .withColumnRenamed("est_distinct", "est_raw")
      .withColumn("__lc",
        col("v_empty") > 0 && col("est_raw") <= lit(HllSmallRangeMax))
      .select(col("grp"), col("v_empty"), col("est_raw"),
        when(col("__lc"),
          floor(lit(HllBuckets.toDouble) *
            log(lit(HllBuckets.toDouble) / col("v_empty").cast("double")))
            .cast("long"))
          .otherwise(col("est_raw")).as("est_distinct"),
        when(col("__lc"), lit("lc")).otherwise(lit("raw")).as("regime"))

  /** Count-min sketch counters `(d, c, cell)` over a pre-aggregated
    * frequency table `(key, cnt)`: depth rows each hash the key with a
    * distinct salt, cells sum the counts that land on them. The grid is
    * `depth × width` rows total — constant in corpus size — and additive
    * under union, so per-split grids merge by `sum(cell)`. */
  def cmsCounters(freq: DataFrame, key: Column, cnt: Column,
      depth: Int, width: Int): DataFrame =
    freq.select(key.as("k"), cnt.as("cnt"))
      .select(col("k"), col("cnt"),
        explode(array((0 until depth).map(lit): _*)).as("d"))
      .select(col("d"),
        (Hashing.h64(concat_ws("_", col("d"), col("k"))) % width).as("c"),
        col("cnt"))
      .groupBy(col("d"), col("c"))
      .agg(sum(col("cnt")).cast("long").as("cell"))

  /** Census-derived CMS width — the sizing rule that turns the
    * Cormode–Muthukrishnan ε·N bound into a FIXED ABSOLUTE guarantee as
    * the corpus grows: the smallest power of two strictly greater than
    * totalMass/64 (floored at 256), so expected overcount stays
    * ≤ e·N/w ≈ e·64 ≈ 174 at any scale while the grid grows only as
    * N/64 cells (4×8192 rows at 266k mass — still trivially mergeable).
    * Fixed-width grids keep memory constant but let absolute overcount
    * grow with corpus mass (the r10 measurement: +140 → +1,145 across
    * sf0.01 → sf0.1 at w=256); this rule is the `epochShuffleAuto`
    * pattern applied to the sketch tier — ONE integer census scalar,
    * identical in both engines, drives the layout. */
  def cmsAutoWidth(totalMass: Long): Int = {
    val target = math.max(totalMass / 64L, 1L)
    // 2^bitlength(target): strictly greater than target, matching the
    // oracle's `1 << length(bin(target))`
    val w = 1L << (64 - java.lang.Long.numberOfLeadingZeros(target))
    math.max(w, 256L).toInt
  }

  /** Point-query the sketch for a set of probe keys: est(k) = min over
    * depths of the counter each salt hashes k into. Estimates never
    * undercount; collisions only inflate, and the min across independent
    * salts bounds the inflation (the Cormode–Muthukrishnan guarantee). */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame =
    probes.select(key.as("k"))
      .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("d"))
      .select(col("k"), col("d"),
        (Hashing.h64(concat_ws("_", col("d"), col("k"))) % width).as("c"))
      .join(counters, Seq("d", "c"))
      .groupBy(col("k"))
      .agg(min(col("cell")).as("est_cnt"))

  // ---- HDR-histogram quantiles ------------------------------------------

  /** Sub-buckets per power-of-two octave. Bucket width within octave e is
    * 2^e/16, so any quantile estimate (bucket midpoint) is within
    * 1/(2·16) ≈ 3.1% relative error of the true order statistic —
    * the HdrHistogram / DDSketch guarantee shape (relative, not
    * absolute, accuracy) with log₂ octaves instead of log_γ. */
  val HdrSub = 16

  /** HDR-histogram buckets `(grp, bucket, cnt)` for a non-negative long
    * value column — the quantile member of the sketch trio (HLL =
    * distinct, CMS = frequency, HDR = distribution). Bucket 0 holds
    * v ≤ 0; v ≥ 1 lands in octave e = ⌊log₂ v⌋ split into [[HdrSub]]
    * linear sub-buckets: `bucket = 1 + e·16 + ((v − 2^e)·16) DIV 2^e`.
    * Everything is integer arithmetic on `length(bin(v))` — the same
    * engine-portable bit-length idiom as the HLL rho — so a DuckDB
    * oracle reproduces every bucket id exactly (no float log whose last
    * ULP could flip a boundary).
    *
    * Supported value domain: [0, 2^58]. Values above [[HdrCap]] = 2^58
    * are clamped into the top bucket — the sub-bucket product
    * `(v − 2^e)·16` (and the midpoint reconstruction in
    * [[hdrQuantiles]]) would overflow int64 for v ≥ 2^62, silently
    * mis-bucketing extremes; the clamp keeps every intermediate well
    * inside int64 and turns the overflow into a documented saturation.
    *
    * Scale shape: one `groupBy(grp, bucket).count` — partial-aggregated
    * map-side, shuffling ≤ groups × (64·16+1) rows no matter the corpus;
    * grids merge by `sum(cnt)` (per-split / per-window partials combine
    * without revisiting data — pinned in SketchSpec). This is what a
    * datasheet pass runs for p50/p90/p99 length and latency columns when
    * an exact per-group sort of 100 TB is unaffordable. */
  /** Saturation cap for [[hdrBuckets]] values (2^58) — see the domain
    * note on hdrBuckets. */
  val HdrCap: Long = 1L << 58

  def hdrBuckets(df: DataFrame, group: Column, value: Column): DataFrame =
    // a NULL value is NOT an observation — drop it before the clamp
    // (both engines' `least` SKIPS nulls, so an unfiltered NULL would
    // saturate into the top 2^58 bucket and inflate high quantiles)
    df.where(value.isNotNull)
      .select(group.as("grp"),
        least(value.cast("long"), lit(HdrCap)).as("v"))
      .select(col("grp"),
        when(col("v") <= 0, lit(0L))
          .otherwise(expr(s"""1 + (length(bin(v)) - 1) * $HdrSub +
            CAST(((v - shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 1)) * $HdrSub)
              DIV shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 1) AS BIGINT)"""))
          .as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile extraction from a bucket table: for each group and each
    * percentile q, rank r = ⌈q·n/100⌉ and the answer is the MIDPOINT of
    * the first bucket whose cumulative count reaches r — integer lower
    * and upper bucket bounds reconstructed from the bucket id, so the
    * estimate is exact-integer in both engines. The cumulative window
    * rides per-group bucket tables of ≤ 1025 rows (never the corpus),
    * and the (grp, q) probe join is against that same bounded table. */
  def hdrQuantiles(buckets: DataFrame, qs: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = buckets.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("grp"))
        .orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranks = buckets.groupBy(col("grp"))
      .agg(sum(col("cnt")).cast("long").as("n"))
      .select(col("grp"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("r", expr("(q * n + 99) DIV 100"))
    ranks.join(cum, Seq("grp"))
      .where(col("cum") >= col("r"))
      .groupBy(col("grp"), col("q"), col("n"))
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est", expr(s"""CASE WHEN bucket = 0 THEN CAST(0 AS BIGINT) ELSE
        (shiftleft(CAST(1 AS BIGINT), CAST((bucket - 1) DIV $HdrSub AS INT)) +
           CAST((((bucket - 1) % $HdrSub) *
             shiftleft(CAST(1 AS BIGINT), CAST((bucket - 1) DIV $HdrSub AS INT)))
             DIV $HdrSub AS BIGINT) +
         shiftleft(CAST(1 AS BIGINT), CAST((bucket - 1) DIV $HdrSub AS INT)) +
           CAST(((((bucket - 1) % $HdrSub) + 1) *
             shiftleft(CAST(1 AS BIGINT), CAST((bucket - 1) DIV $HdrSub AS INT)))
             DIV $HdrSub AS BIGINT)) DIV 2 END"""))
      .select(col("grp"), col("q"), col("n"), col("bucket"), col("est"))
  }

  // ---- KMV (bottom-k / theta) set-operation sketches ---------------------

  /** h64's range is [0, 2^60), so the KMV stretch is nominally
    * `(k-1) · 2^60 / h_k` — but that numerator overflows int64 for any
    * useful k. Both engines therefore evaluate it at 2^30 precision:
    * `(k-1) · 2^30 DIV (h_k DIV 2^30)`, whose truncation error is
    * ≤ 2^30/h_k ≈ 4e-8 relative — far beneath the sketch's own
    * 1/√(k-2) statistical error — while every intermediate stays well
    * inside BIGINT in both engines. */
  val KmvHalfRange: Long = 1L << 30

  /** Bottom-k (KMV / theta) sketch `(grp, h)` — the SET-OPERATION member
    * of the sketch family (the single-group, single-estimate form lives
    * in `RelationalQueries.q_kmv_distinct`; this is the grouped,
    * mergeable, set-algebra generalization), covering the one question
    * HLL structurally cannot answer: the cardinality of an INTERSECTION (or any
    * composition of unions and intersections) across groups. HLL
    * registers destroy membership, so two HLL sketches only union; a
    * bottom-k sketch keeps the k smallest distinct key hashes — a
    * uniform random sample of the key space — and stays closed under
    * both set operations: union = bottom-k of the merged sets
    * ([[kmvMerge]]), intersection = scaled match fraction within the
    * union's bottom-k ([[kmvIntersect]], the theta-sketch trick).
    *
    * Deterministic by construction: the k smallest md5-derived values of
    * a key set is a pure function of the set — no RNG, no order
    * dependence — so the DuckDB oracle reproduces every retained hash
    * and therefore every estimate bit-for-bit.
    *
    * Scale shape: distinct-by-(grp, h) then a per-group bottom-k — the
    * shuffle carries distinct keys once (same price as the exact
    * distinct the sketch replaces must pay ANYWAY to count), but the
    * OUTPUT is ≤ groups × k rows: the sketch, not the corpus, is what
    * ships to the driver / the next stage / the datasheet store, and
    * sketches of a million-key group and a billion-key group are the
    * same size. Per-split partials merge by [[kmvMerge]] without
    * revisiting data. */
  def kmvSketch(df: DataFrame, group: Column, key: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(group.as("grp"), Hashing.h64(key).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .where(col("rn") <= k)
      .select(col("grp"), col("h"))
  }

  /** Union of bottom-k sketches: pool the retained hashes, dedupe, keep
    * the k smallest — exactly [[kmvSketch]] of the concatenated inputs
    * (closure under union; pinned in SketchSpec). `newGrp` names the
    * merged sketch's group. */
  def kmvMerge(sketches: DataFrame, newGrp: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sketches.select(lit(newGrp).as("grp"), col("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .where(col("rn") <= k)
      .select(col("grp"), col("h"))
  }

  /** Distinct-cardinality estimate per group: exact `n` when the group
    * retained fewer than k hashes (the sketch IS the key set), else the
    * classic KMV stretch `(k-1) · 2^60 / h_k` — one integer division
    * over the k-th smallest hash, evaluated at [[KmvHalfRange]]
    * precision to stay inside BIGINT. Relative standard error
    * ≈ 1/√(k-2). */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
      .select(col("grp"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"CAST(${k - 1} AS BIGINT) * $KmvHalfRange" +
            s" DIV greatest(h_k DIV $KmvHalfRange, CAST(1 AS BIGINT))"))
          .as("est_distinct"))

  /** Intersection estimate for two groups' sketches — the theta trick:
    * within the UNION's bottom-k (threshold θ = its k-th smallest hash,
    * a uniform sample of A ∪ B), count the hashes present in BOTH input
    * sketches; `est(A∩B) = matched · est(A∪B) DIV k'` where k' is the
    * union sketch's size. Exact when both groups kept everything.
    * Output: one row `(est_union, matched, est_inter)`. */
  def kmvIntersect(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = kmvMerge(a.unionByName(b), "__u__", k)
      .localCheckpoint(eager = false) // consumed by estimate + match count
    val uEst = kmvEstimate(u, k).select(col("est_distinct").as("est_union"))
    val kept = u.agg(count(lit(1)).cast("long").as("k_kept"))
    val matched = u.join(a.select(col("h")).distinct(), "h")
      .join(b.select(col("h")).distinct(), "h")
      .agg(count(lit(1)).cast("long").as("matched"))
    uEst.crossJoin(kept).crossJoin(matched)
      .select(col("est_union"), col("matched"),
        expr("CASE WHEN k_kept > 0 THEN (matched * est_union) DIV k_kept" +
          " ELSE CAST(0 AS BIGINT) END").as("est_inter"))
  }
}
