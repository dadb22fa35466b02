package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared replication + timing harness for the probe tools — ONE place
  * for the methodology, because a silent methodology limit already bit
  * once: the Caesar-rotation cipher has only 26 distinct rotations, so
  * rot-based replication ([[ProbeLinear]]/[[Scratch]], valid there at
  * k ≤ 10) silently manufactures byte-identical cross-replica documents
  * past k = 26 — exactly what a dedup probe must not do.
  *
  * [[permutedReplicas]] uses a full per-replica alphabet PERMUTATION
  * (seeded shuffle: 26! keys, distinct for any practical k), preserving
  * the properties the probes rely on: within-replica duplicate
  * structure intact, cross-replica vocabularies disjoint, corpus-wide
  * gram/model tables growing ~linearly with k. */
object ProbeKit {

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** A deterministic per-replica alphabet permutation — replica 0 is the
    * identity so the base corpus rides unchanged. */
  private def perm(i: Int): String =
    if (i == 0) alpha
    else new scala.util.Random(0x1234abcdL + i).shuffle(alpha.toList).mkString

  /** `k` stacked copies of `base` with offset ids and per-replica
    * substitution-ciphered text. */
  def permutedReplicas(base: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      val p = perm(i)
      base
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", translate(col("text"),
          alpha + alpha.toUpperCase, p + p.toUpperCase))
    }.reduce(_.unionAll(_))

  /** Median-of-3 timing with a printed min/max spread — the Bench
    * protocol (one GC/eviction storm must not misreport a query). */
  def median3(tag: String, label: String)(f: => Unit): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[$tag] $label%-30s ${ts(1)}%.2f s (min ${ts.head}%.2f max ${ts.last}%.2f)")
  }

  /** Recursive delete of a probe's replicated temp corpus — don't leak
    * multi-hundred-MB parquet per run. */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(q => java.nio.file.Files.deleteIfExists(q))
  }
}
