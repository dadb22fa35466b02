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
