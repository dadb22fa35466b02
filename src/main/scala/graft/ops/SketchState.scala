package graft.ops

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generational HLL register state — the streaming datasheet counterpart
  * of [[IncrementalDedupState]]: a micro-batch's `(grp, bucket, m)`
  * registers ([[Sketch.hllRegisters]]) max-merge into the persisted
  * table, so the state after any prefix of the stream equals
  * [[Sketch.hllRegisters]] over that prefix run as ONE batch (the merge
  * law pinned in SketchSpec), and [[Sketch.hllEstimate]] /
  * [[Sketch.hllEstimateCorrected]] over [[registers]] serve the
  * datasheet at any point without revisiting data.
  *
  * Crash safety mirrors [[IncrementalDedupState]]: write `gen-<N+1>/`,
  * then flip the `LATEST` pointer — a reader never observes a torn
  * generation; single writer by contract (the stream owns its state).
  * State size is ≤ groups × 256 rows regardless of stream length. */
final class HllRegisterState(spark: SparkSession, stateDir: String) {
  private val hconf = spark.sparkContext.hadoopConfiguration
  private val root = new Path(stateDir)
  private def fs = root.getFileSystem(hconf)
  private def latestPath = new Path(root, "LATEST")
  private def genDir(g: Long) = new Path(root, s"gen-$g")

  /** 0 = empty state (no batch merged yet). */
  def generation: Long =
    if (!fs.exists(latestPath)) 0L
    else {
      val in = fs.open(latestPath)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim.toLong
      finally in.close()
    }

  /** The live register table `(grp, bucket, m)`; empty at generation 0. */
  def registers: DataFrame =
    if (generation == 0L)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "grp STRING, bucket BIGINT, m BIGINT"))
    else spark.read.parquet(new Path(genDir(generation), "regs").toString)

  /** Max-merge one batch's registers into the state and publish the next
    * generation. Merging the same batch twice is idempotent (max). */
  def merge(newRegs: DataFrame): Unit = {
    val g = generation
    val merged = (if (g == 0L) newRegs
      else spark.read.parquet(new Path(genDir(g), "regs").toString)
        .unionByName(newRegs))
      .groupBy(col("grp"), col("bucket")).agg(max(col("m")).as("m"))
    val next = g + 1
    merged.write.mode("overwrite")
      .parquet(new Path(genDir(next), "regs").toString)
    val out = fs.create(latestPath, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
  }
}

/** Generational HDR bucket state — the QUANTILE member of the streaming
  * datasheet, next to [[HllRegisterState]]'s distinct counts: a
  * micro-batch's `(grp, bucket, cnt)` grid ([[Sketch.hdrBuckets]])
  * sum-merges into the persisted table, so the state after any stream
  * prefix equals [[Sketch.hdrBuckets]] over that prefix as ONE batch and
  * [[Sketch.hdrQuantiles]] serves p50/p90/p99 at any point without
  * revisiting data. State size ≤ groups × 1025 rows regardless of
  * stream length.
  *
  * Unlike the HLL max-merge, a SUM-merge is NOT naturally idempotent —
  * a replayed batch would double-count — so merges carry the same
  * batch-tag guard as [[IncrementalDedupState.absorb]]: `LATEST` records
  * the tag that produced the generation, and a retried merge bearing
  * that tag no-ops (crash between state flip and split commit replays
  * to the identical grid; pinned in StatefulStreamingSpec). */
final class HdrBucketState(spark: SparkSession, stateDir: String) {
  private val hconf = spark.sparkContext.hadoopConfiguration
  private val root = new Path(stateDir)
  private def fs = root.getFileSystem(hconf)
  private def latestPath = new Path(root, "LATEST")
  private def genDir(g: Long) = new Path(root, s"gen-$g")

  /** `LATEST`: line 1 = generation, optional line 2 = producing batch tag. */
  private def latestLines: Array[String] =
    if (!fs.exists(latestPath)) Array.empty
    else {
      val in = fs.open(latestPath)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim.split("\n")
      finally in.close()
    }

  /** 0 = empty state (no batch merged yet). */
  def generation: Long = {
    val ls = latestLines
    if (ls.isEmpty) 0L else ls(0).trim.toLong
  }

  /** Tag of the batch whose merge produced the LATEST generation. */
  def latestBatchTag: Option[String] = {
    val ls = latestLines
    if (ls.length < 2 || ls(1).trim.isEmpty) None else Some(ls(1).trim)
  }

  /** The live bucket grid `(grp, bucket, cnt)`; empty at generation 0. */
  def buckets: DataFrame =
    if (generation == 0L)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "grp STRING, bucket BIGINT, cnt BIGINT"))
    else spark.read.parquet(new Path(genDir(generation), "buckets").toString)

  /** Sum-merge one batch's grid into the state and publish the next
    * generation. `batchTag`: replay guard — a merge whose tag already
    * produced LATEST is a retry of itself and no-ops. */
  def merge(newBuckets: DataFrame, batchTag: String = ""): Unit = {
    if (batchTag.nonEmpty && latestBatchTag.contains(batchTag)) return
    val g = generation
    val merged = (if (g == 0L) newBuckets
      else spark.read.parquet(new Path(genDir(g), "buckets").toString)
        .unionByName(newBuckets))
      .groupBy(col("grp"), col("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
    val next = g + 1
    merged.write.mode("overwrite")
      .parquet(new Path(genDir(next), "buckets").toString)
    val out = fs.create(latestPath, true)
    val body = if (batchTag.isEmpty) next.toString else s"$next\n$batchTag"
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }
}
