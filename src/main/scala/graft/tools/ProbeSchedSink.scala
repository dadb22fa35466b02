package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.EpochShuffle

/** Measured cost of the STRIDE-ORDERED shard sink vs the hash sink
  * (r19 — the schedule-reaches-the-shards work; r20 adds the x100
  * tier): same [[ProbeKit]] permuted-replica methodology as
  * ProbeScale100, a 2-epoch tagged relation (every doc twice — the
  * multi-epoch sink's input shape) at x1 / x10 / x50 / x100 of
  * sf0.1's documents, shard count sized to a fixed per-shard char
  * mass so the per-task sort bound stays constant as the corpus
  * grows (the sink's scale contract).
  *
  * What the scheduled sink adds over the hash sink, by construction:
  * one per-source combiner aggregate + broadcast (the weight table),
  * and ONE extra partition-local sort (the rank window's (epoch,
  * shard, source, key) sort before the (epoch, shard, skey) position
  * sort) — no new shuffle (PlanSpec-pinned). This probe checks that
  * the measured overhead matches that construction and stays a
  * CONSTANT FACTOR as the input scales 100×.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *      runMain graft.tools.ProbeSchedSink
  *
  * Measured (median of 3 in-probe iterations, seconds, local[32],
  * writes under /tmp; x1–x50 rows are the r19 measurement — code
  * unchanged since — and the x100 row is the r20 addition, quoted as
  * the median across THREE whole-probe runs because single runs
  * there still spread 1.2–1.7×):
  *
  * | scale (rows) | shards/epoch | hash sink | scheduled | ratio |
  * |---|---|---|---|---|
  * | x1   (10k)   | 1            | 1.24      | 1.03      | noise |
  * | x10  (100k)  | 2            | 1.03      | 1.21      | noise |
  * | x50  (500k)  | 9            | 1.62      | 1.52      | inside flap (r20 re-runs: 1.06–1.73x, sign flips) |
  * | x100 (1M)    | 18           | 2.37      | 3.02      | ~1.4x, sign CONSISTENT in all 3 runs |
  *
  * Reading (r20): up to x50 the write path dominates and the two
  * sinks sit within run-to-run flap of each other — the ratio's SIGN
  * flips between runs. At x100 the second partition-local sort
  * finally registers: 1.73×/1.36×/1.22× across the three runs
  * (median ~1.4×, every run agrees on the sign), i.e. ~0.5–1 µs/row
  * of extra in-task sort. That is exactly the constructed cost: a
  * CONSTANT per-row factor with NO new exchange (the plan pin holds
  * at every tier), so the overhead stays bounded at any corpus size
  * instead of growing a shuffle. Mixture-faithful shard prefixes
  * therefore cost a bounded fraction of the write itself —
  * `schedule: true` remains the right default for weighted
  * pipelines, priced honestly rather than "free". */
object ProbeSchedSink {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$dir/documents.parquet")

    for (k <- Seq(1, 10, 50, 100)) {
      val rep = ProbeKit.permutedReplicas(base, k)
        .select(col("doc_id"), col("source"), col("text"))
      // the multi-epoch sink's input shape: every doc in two passes
      val tagged = rep.withColumn("epoch", lit(0L))
        .unionByName(rep.withColumn("epoch", lit(1L)))
        .localCheckpoint() // time the sinks, not the cipher
      val n = tagged.count()
      val chars = tagged.agg(sum(length(col("text")).cast("long")))
        .first().getLong(0)
      // fixed per-shard mass: the per-task sort bound the sink promises
      val shards = EpochShuffle.shardCount(chars / 2, 1L << 23)
      val w = pmod(substring(col("source"), 4, 10).cast("long"), lit(3)) + 1
      val out = java.nio.file.Files.createTempDirectory("probe-sched")
      ProbeKit.median3(s"x$k", s"hash sink ($n rows, $shards shards)") {
        EpochShuffle.writeEpochShards(tagged, col("doc_id"), col("epoch"),
          length(col("text")), "probe", shards, 2L, s"$out/hash")
      }
      ProbeKit.median3(s"x$k", "scheduled sink") {
        EpochShuffle.writeEpochShardsScheduled(tagged, col("doc_id"),
          col("epoch"), col("source"), w, length(col("text")), "probe",
          shards, 2L, s"$out/sched")
      }
      ProbeKit.deleteRecursively(out)
    }
    spark.stop()
  }
}
