package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.config.SchemaDerivation
import graft.engine.{Catalog, SplitInfo}

/** Streaming ingest — the reference's `index --stream` loop
  * (`/root/reference/src/commands/index.rs:106-124,175-186`) re-expressed
  * as Structured Streaming `foreachBatch`:
  *
  *  - the commit interval becomes `Trigger.ProcessingTime` — one split per
  *    non-empty micro-batch;
  *  - the reference's at-least-once checkpointing (offsets saved to
  *    Postgres only *after* upload+commit, `index.rs:220-232`) is strictly
  *    improved: Spark persists source offsets to the checkpoint only after
  *    `foreachBatch` returns, and the split id is a deterministic function
  *    of the batch id, so a replayed batch overwrites the same split and
  *    re-commits the same manifest entry — effective exactly-once;
  *  - the reference's rebalance→Restart semantics (`kafka_source.rs:78-152`)
  *    map to Spark's query restart from checkpoint: the in-flight batch is
  *    abandoned (its split never entered the manifest) and re-run.
  *
  * Sources: any streaming DataFrame with a string `value` column works —
  * file source for tests/CI, `spark.readStream.format("kafka")` in
  * production (same contract: Kafka's `value` is cast to string).
  */
/** Stateful sidecars a production streaming ingest maintains ALONGSIDE
  * split commits — the batch-gated ops run inside the same foreachBatch,
  * so after any stream prefix the state equals what the batch pipeline
  * would leave behind (pinned in StatefulStreamingSpec):
  *
  *  - `textField`: near-dedup each batch against the persisted
  *    generational corpus state ([[graft.ops.IncrementalDedupState]],
  *    3-gram shingles over the field, Jaccard ≥ `threshold`) and drop
  *    duplicates BEFORE they are indexed; keepers are absorbed. Exact
  *    within-batch duplicates (identical lines) also collapse.
  *  - `sketchField`: max-merge per-batch HLL registers of the field's
  *    values into [[graft.ops.HllRegisterState]] — the streaming
  *    datasheet (distinct-count) maintenance.
  *  - `quantileField`: sum-merge per-batch HDR bucket grids of the
  *    field's string LENGTH into [[graft.ops.HdrBucketState]] — the
  *    length-distribution (p50/p90/p99) side of the same datasheet,
  *    replay-guarded by batch tag because a sum-merge is not
  *    idempotent the way the HLL max is.
  *  - `annField`: AFTER each split commit, incrementally refresh the
  *    field's trained vector index ([[graft.engine.AnnIndex.refresh]])
  *    so the IVF serving tier stays continuously fresh under streaming
  *    ingest — streaming vector search. No-ops until a `train` has
  *    built the index; replay-safe because a replayed batch's split is
  *    already covered (refresh sees no new splits). The auto-compaction
  *    hook (`compactSmallDocs`) COMPOSES with it: its merges are pure
  *    compactions, so the manifest records their lineage
  *    ([[graft.engine.SplitInfo.parents]]) and the next refresh
  *    TRANSLATES its coverage through the merge instead of failing —
  *    a long-lived stream compacts and stays vector-served with no
  *    retrain (pinned in StatefulStreamingSpec). Only a doc-dropping
  *    merge (`--dedup`, run out-of-band) still breaks coverage; that
  *    failure is LOGGED, not fatal — the stream keeps committing and
  *    the operator retrains.
  *
  * The states live under `stateDir` (`dedup/`, `hll/`, `hdr/`). Batch replay: the
  * split commit is idempotent per batch id; the dedup state is made replay-
  * idempotent by tagging each absorbed generation with the (runTag, batchId)
  * that produced it — a replayed batch whose absorb already landed evaluates
  * `dedupBatch` against the PREVIOUS generation (so its own stored copies
  * cannot self-match it to death) and its retried absorb no-ops, meaning a
  * crash anywhere between state flip and split commit replays to exactly the
  * original keepers and the original split; the HLL merge is idempotent by
  * max. Pinned by StatefulStreamingSpec's replayed-batch case. */
final case class StreamStateConfig(
    stateDir: String,
    textField: String,
    threshold: Double = 0.5,
    sketchField: Option[String] = None,
    quantileField: Option[String] = None,
    annField: Option[String] = None,
    /** With `annField`: fold the trained tier's epoch directories once
      * the served span reaches this many epochs
      * ([[graft.engine.AnnIndex.compactEpochs]]) — per-batch refreshes
      * each append an epoch directory tree, and without a fold a
      * long-lived stream's directory count grows per batch. The fold
      * rewrites the stored rows (cost ∝ tier size, amortized over N
      * batches), so size N to taste; 0 disables (fold manually with
      * `train --compact`). */
    annCompactEvery: Int = 0,
    /** With `annField`: retrain the trained tier (staged — serving is
      * uninterrupted) when the centroid-drift reading
      * ([[graft.engine.AnnIndex.driftPpm]] — how far the latest refresh
      * batch's out-of-sample assignment fit fell below the
      * first-batch anchor, in ppm of mean nearest-centroid cosine)
      * crosses this threshold. 0 disables. The anchor resets at each
      * retrain, so a retrained stream re-baselines instead of
      * re-triggering forever. */
    annRetrainThreshold: Long = 0L,
    /** With `annField`: fold the trained tier
      * ([[graft.engine.AnnIndex.compactEpochs]]) once `--dedup`-merge
      * tombstones reach this FRACTION of the stored logical rows
      * (r16 verdict #5). Tombstones are serve-time BROADCAST state
      * (~16 MB per million deletes), so a long-running stream under
      * periodic out-of-band `--dedup` merges accretes serve cost until
      * someone folds; this makes the fold part of the policy instead of
      * an operator chore. 0 disables. A tomb-less META costs one
      * metadata read per batch; the share census
      * ([[graft.engine.AnnIndex.tombstoneShare]]) runs only while
      * tombstones exist. */
    annTombstoneThreshold: Double = 0.0)

final class StreamingIndexer(spark: SparkSession, catalog: Catalog) {

  /** Index one micro-batch idempotently: split id = f(runTag, batchId).
    *
    * The run tag scopes idempotent replay to one logical stream: it is a
    * stable hash of the checkpoint location, so a query restart from the
    * same checkpoint (same batch ids) overwrites its own split, while a
    * fresh run with a new checkpoint (batch ids restarting at 0) gets
    * distinct split ids instead of silently replacing an earlier run's data.
    */
  def indexBatch(indexName: String, batch: DataFrame, batchId: Long,
      runTag: String = ""): Option[SplitInfo] = {
    val cfg = catalog.load(indexName)
    val d = new SchemaDerivation(cfg)
    val typed = d.ingest(batch, col("value"))

    val prefix = if (runTag.isEmpty) "" else s"run-$runTag-"
    val id = f"${prefix}batch-$batchId%012d"
    val dir = catalog.splitDir(indexName, id)
    // Single-pass write + stats (observed metrics), same as batch ingest;
    // a foreachBatch body runs ordinary batch actions, so the metrics
    // surface the same way (with the read-back fallback if not).
    val split = graft.engine.Indexer.writeSplit(spark, d, typed, dir, id)
    if (split.numDocs == 0) {
      // The overwrite above already emptied the split dir; if an earlier
      // run of this batch HAD committed rows (replay after source
      // retention expired), the manifest entry must be retracted too or
      // it would advertise data that no longer exists. Ordinary empty
      // batches also clean their orphan dir this way.
      catalog.removeSplitIfPresent(indexName, id)
      catalog.deleteDirBestEffort(dir)
      None
    } else {
      // Known upgrade corner, deliberately NOT auto-healed: a stream from
      // a build without run tags that crashed before checkpointing its
      // LAST batch will duplicate that one batch when replayed on this
      // build (new id scheme). Auto-removing the legacy id here would be
      // worse — a fresh-checkpoint run (batch ids restarting at 0) would
      // silently delete legitimately committed legacy splits. The manual
      // fix is `merge --dedup`.
      catalog.commitSplitIdempotent(indexName, split)
      Some(split)
    }
  }

  /** Stream a directory of JSONL files into an index.
    *
    * `compactSmallDocs`: when set, each batch commit is followed by a
    * tiered merge of every live split under the threshold EXCEPT the
    * split just committed — the one a checkpoint replay could rewrite
    * (see [[graft.engine.Indexer.mergeSmallExcept]]). This is the
    * reference's background-commit loop re-expressed as inline
    * compaction: a long-lived stream of small batches converges to a few
    * large splits instead of thousands of tiny objects. */
  def startFileStream(indexName: String, sourceDir: String, checkpointDir: String,
      commitInterval: String = "30 seconds",
      availableNow: Boolean = false,
      compactSmallDocs: Option[Long] = None,
      stateful: Option[StreamStateConfig] = None): StreamingQuery = {
    val lines = spark.readStream.text(sourceDir)
    startStream(indexName, lines, checkpointDir, commitInterval, availableNow,
      compactSmallDocs, stateful)
  }

  /** Stream a Kafka topic (`kafka://host:port/topic` in the reference's URL
    * scheme, `kafka_source.rs:167-182`). Requires the Kafka connector on
    * the classpath; not exercised in local CI (no broker), same contract as
    * the file source.
    *
    * `availableNow = true` is the reference's BATCH Kafka mode (read
    * earliest → current end offsets, then exit — `kafka_source.rs`'s
    * non-stream path): `Trigger.AvailableNow` drains everything available
    * at start in micro-batches through the same checkpointed, idempotent
    * commit path, then terminates the query, so `awaitTermination()`
    * returns instead of serving forever. Combine with `earliest = true`
    * for whole-topic backfill (the CLI's non-`--stream` form). */
  def startKafkaStream(indexName: String, bootstrap: String, topic: String,
      checkpointDir: String, commitInterval: String = "30 seconds",
      earliest: Boolean = false, availableNow: Boolean = false): StreamingQuery = {
    val lines = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", if (earliest) "earliest" else "latest")
      .load()
      .select(StreamingIndexer.kafkaValueProjection)
    startStream(indexName, lines, checkpointDir, commitInterval, availableNow)
  }

  /** Stream ANY source DataFrame carrying a string `value` column — the
    * shared path behind [[startFileStream]] and [[startKafkaStream]].
    * Public so deployments can plug arbitrary sources (socket, rate,
    * a custom connector) and so the Kafka-shaped contract — a binary
    * `value` cast through [[StreamingIndexer.kafkaValueProjection]] — is
    * testable without a broker (StreamingSpec drives it with a
    * MemoryStream of raw bytes). */
  def startStream(indexName: String, lines: DataFrame, checkpointDir: String,
      commitInterval: String = "30 seconds", availableNow: Boolean = false,
      compactSmallDocs: Option[Long] = None,
      stateful: Option[StreamStateConfig] = None): StreamingQuery = {
    val runTag = StreamingIndexer.runTagFor(checkpointDir)
    val writer = lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val toIndex = stateful match {
          case None => batch.toDF()
          case Some(sc) => maintainState(batch.toDF(), sc, s"$runTag/$batchId")
        }
        val committed = indexBatch(indexName, toIndex, batchId, runTag)
        for (threshold <- compactSmallDocs; split <- committed)
          new graft.engine.Indexer(spark, catalog)
            .mergeSmallExcept(indexName, threshold, split.id): Unit
        // streaming vector search: extend the trained IVF tier to the
        // split just committed (cost proportional to the batch); skipped
        // until train has run, non-fatal if a compaction broke coverage
        for (f <- stateful.flatMap(_.annField); _ <- committed) {
          val ann = new graft.engine.AnnIndex(spark, catalog)
          if (ann.meta(indexName, f).isDefined)
            try {
              ann.refresh(indexName, f): Unit
              // per-batch refreshes each append an epoch directory; fold
              // them on the configured cadence so a long-lived stream's
              // directory count stays bounded (the fold is crash-atomic
              // the same way the refresh is — invisible until META)
              val every = stateful.map(_.annCompactEvery).getOrElse(0)
              if (every > 0) {
                val (b, e) = ann.epochSpan(indexName, f)
                if (e - b + 1 >= every) ann.compactEpochs(indexName, f): Unit
              }
              // tombstone policy (r16 verdict #5): out-of-band --dedup
              // merges accrete broadcast tombstones; once they reach the
              // configured share of stored logical rows, fold them
              // physical via the same compactEpochs path. Free while the
              // META is tomb-less (one metadata read).
              val tthr = stateful.map(_.annTombstoneThreshold).getOrElse(0.0)
              if (tthr > 0)
                for ((t, nRows) <- ann.tombstoneShare(indexName, f)
                     if t.toDouble >= tthr * nRows) {
                  System.err.println(s"[stream] ann tombstones $t of " +
                    s"$nRows stored row(s) >= $tthr for '$f' — folding")
                  ann.compactEpochs(indexName, f): Unit
                }
              // drift policy: when the latest batch's out-of-sample fit
              // fell >= threshold ppm below the post-train anchor, the
              // frozen quantizer no longer describes the stream — full
              // STAGED retrain with the tier's own knobs (serving reads
              // the old layout until the one atomic META flip)
              val thr = stateful.map(_.annRetrainThreshold).getOrElse(0L)
              if (thr > 0)
                for (d <- ann.driftPpm(indexName, f) if d >= thr) {
                  // replay the tier's FULL knob set — storage shape AND
                  // the operator's explicit sizing/iterations (r16
                  // advice: replaying only (spill, pq, sq8) silently
                  // reset an explicit --cells N to census sizing)
                  val (spill, pqK, sq8K, reqCells, iters) =
                    ann.tierKnobs(indexName, f)
                  System.err.println(s"[stream] ann drift $d ppm >= " +
                    s"$thr for '$f' — retraining")
                  ann.train(indexName, f, cells = reqCells,
                    iterations = iters, spill = spill, pq = pqK,
                    sq8 = sq8K): Unit
                }
            } catch { case e: Exception =>
              System.err.println(s"[stream] ann refresh for '$f' failed " +
                s"(full retrain needed): ${e.getMessage}")
            }
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime(commitInterval)))
      .start()
  }

  /** Run one micro-batch through the stateful sidecars (see
    * [[StreamStateConfig]]) and return the rows that should be INDEXED:
    * exact within-batch duplicates collapsed, near-duplicates of the
    * absorbed corpus dropped. Keepers are absorbed and (when configured)
    * their sketch registers merged, BEFORE the split commit — safe because
    * the absorb is tagged with `batchTag`: a crash between the state flip
    * and the split commit replays this batch with `dedupBatch` reading the
    * pre-absorb generation (identical decisions — without the tag the
    * replayed keepers would self-match their stored copies at Jaccard 1.0
    * and the batch's documents would silently vanish from the index) and
    * the absorb retry no-ops; the register merge is idempotent by max.
    * Package-visible so the replay property is testable without crashing
    * a live query mid-foreachBatch. */
  private[graft] def maintainState(batch: DataFrame,
      sc: StreamStateConfig, batchTag: String): DataFrame = {
    import graft.ops.{Dedup, Hashing, IncrementalDedupState, HllRegisterState, Sketch}
    // deterministic doc key = h64 of the raw line; exact dupes collapse
    // here (same key), so the key is unique within the batch — consumed
    // by the shingle pass, the keep filter, and the sketch → snapshot
    val df = batch.dropDuplicates("value")
      .withColumn("__did", Hashing.h64(col("value")))
      .localCheckpoint(eager = false)
    val sh = Dedup.shingles(
      df.withColumn("__tk", graft.functions.TextFunctions.tokenize(
        get_json_object(col("value"), s"$$.${sc.textField}"), "default")),
      col("__did"), col("__tk"), n = 3)
      .localCheckpoint(eager = false) // consumed by dedupBatch AND absorb
    val st = new IncrementalDedupState(spark, s"${sc.stateDir}/dedup",
      sc.threshold)
    val keepIds = st.dedupBatch(sh, batchTag).where(col("keep"))
      .select(col("doc_id").as("__did"))
      .localCheckpoint(eager = false) // consumed by absorb filter + index join
    val keptSh = sh.join(keepIds.withColumnRenamed("__did", "doc_id"), "doc_id")
    if (!keptSh.isEmpty) st.absorb(keptSh, batchTag)
    val kept = df.join(keepIds, "__did")
    // docs the shingler skips (field missing / < 3 tokens) have no sh row
    // but dedupBatch never saw them either — they pass through unfiltered
    val shortDocs = df.join(sh.select(col("doc_id").as("__did")), Seq("__did"),
      "left_anti")
    val out = kept.unionByName(shortDocs)
    for (f <- sc.sketchField) {
      val keyed = out.select(lit("stream").as("grp"),
        get_json_object(col("value"), s"$$.$f").as("k"))
        .where(col("k").isNotNull)
      if (!keyed.isEmpty)
        new HllRegisterState(spark, s"${sc.stateDir}/hll")
          .merge(Sketch.hllRegisters(keyed, col("grp"), col("k")))
    }
    for (f <- sc.quantileField) {
      val keyed = out.select(lit("stream").as("grp"),
        length(get_json_object(col("value"), s"$$.$f")).cast("long").as("v"))
        .where(col("v").isNotNull)
      if (!keyed.isEmpty)
        new graft.ops.HdrBucketState(spark, s"${sc.stateDir}/hdr")
          .merge(Sketch.hdrBuckets(keyed, col("grp"), col("v")), batchTag)
    }
    out.drop("__did")
  }
}

object StreamingIndexer {
  /** The projection every Kafka-shaped source goes through: the record's
    * binary `value` cast to a string JSON document (keys/offsets/headers
    * dropped — the reference reads only payloads,
    * `kafka_source.rs:314-321`). One definition shared by the real Kafka
    * source and the broker-less contract test. */
  def kafkaValueProjection: org.apache.spark.sql.Column =
    col("value").cast("string").as("value")

  /** Stable per-logical-stream tag: hash of the canonical checkpoint
    * location. Local paths normalize to absolute (a raw-string hash would
    * give the same location different tags across spellings — "ckpt" vs
    * "/abs/ckpt" — breaking replay idempotence after a restart with a
    * different cwd, and different locations the same tag for two streams
    * both passing "ckpt"). URI locations (hdfs://, s3a://, file://) are
    * already absolute and hash as-is — Paths.get would mangle them into
    * cwd-relative garbage and re-open the duplicate-replay hole. */
  def runTagFor(checkpointDir: String): String = {
    val isUri = checkpointDir.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")
    val canonical =
      if (isUri) checkpointDir
      else java.nio.file.Paths.get(checkpointDir).toAbsolutePath.normalize.toString
    graft.ops.Hashing.md5Hex(canonical, 6)
  }
}
