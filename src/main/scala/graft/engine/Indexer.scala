package graft.engine

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.SchemaDerivation

/** Batch ingest: JSONL → typed Parquet split + manifest commit, mirroring
  * the reference's `index` command (`/root/reference/src/commands/index.rs`
  * `:95-192`): parse each document against the declared schema, funnel
  * undeclared keys into `_dynamic`, skip (and count) documents with a
  * parse error on any declared field, and register the split atomically
  * only after all data files are written.
  *
  * Scale shape: the whole pipeline is narrow (read text → project → write
  * parquet) — zero shuffles; parallelism is the input's natural split
  * count. The reference's always-merge-to-one-segment step
  * (`index.rs:211-217`) is deliberately NOT reproduced as `coalesce(1)` —
  * a split here is a *directory* whose file count equals the write
  * parallelism, so a 1000-executor ingest writes 1000 objects for one
  * atomic commit instead of serializing through one writer.
  */
final class Indexer(spark: SparkSession, catalog: Catalog) {

  /** Time-ordered split id (UUIDv7-style: millis prefix + random). */
  private def newSplitId(): String =
    f"${System.currentTimeMillis()}%013x-${UUID.randomUUID().toString.take(18)}"

  /** Index one JSONL file (or directory of files). Returns the committed
    * split, or None when the batch held zero valid documents (the
    * reference skips the commit entirely then, `index.rs:164-170`). */
  def indexFile(indexName: String, inputPath: String): Option[SplitInfo] = {
    val lines = spark.read.text(inputPath)
    indexDataFrame(indexName, lines)
  }

  /** Index a DataFrame with a single string column `value` (one JSON doc
    * per row). Used by both batch and streaming paths. */
  def indexDataFrame(indexName: String, lines: DataFrame): Option[SplitInfo] = {
    val cfg = catalog.load(indexName)
    val d = new SchemaDerivation(cfg)
    val (cols, skip) = d.ingestProjection(col("value"))

    val typed = lines
      .where(col("value").isNotNull && length(trim(col("value"))) > 0)
      .where(!coalesce(skip, lit(true)))
      .select(cols: _*)

    val id = newSplitId()
    val dir = catalog.splitDir(indexName, id).toString
    typed.write.mode("overwrite").parquet(dir)

    // numDocs from the written files (cheap metadata-only count) — also the
    // commit gate for empty batches.
    val n = spark.read.schema(d.storageSchema).parquet(dir).count()
    if (n == 0) {
      // best-effort cleanup of the empty split dir
      try {
        import java.nio.file.{Files, Paths}
        Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p): Unit })
      } catch { case _: Exception => }
      None
    } else {
      val (minTs, maxTs) = Indexer.timeRange(spark, d, dir)
      val split = SplitInfo(id, n, minTs, maxTs)
      catalog.commitSplit(indexName, split)
      Some(split)
    }
  }

  /** Merge compaction (`/root/reference/src/commands/merge.rs:19-73`):
    * read all live splits, rewrite as one, swap the manifest atomically,
    * best-effort delete the old files. Requires >= 2 splits, like the
    * reference (`merge.rs:28-31`). */
  def merge(indexName: String): Option[SplitInfo] = {
    val cfg = catalog.load(indexName)
    val d = new SchemaDerivation(cfg)
    val splits = catalog.liveSplits(indexName)
    if (splits.length < 2) return None

    val id = newSplitId()
    val dir = catalog.splitDir(indexName, id).toString
    val df = spark.read.schema(d.storageSchema)
      .parquet(catalog.splitPaths(indexName): _*)
    // Compaction controls output file count via repartition: small indexes
    // collapse to one file; at scale this would target a fixed bytes/file.
    val n = df.count()
    val parts = math.max(1, (n / 4000000L).toInt)
    df.repartition(parts).write.mode("overwrite").parquet(dir)

    val (minTs, maxTs) = Indexer.timeRange(spark, d, dir)
    val split = SplitInfo(id, n, minTs, maxTs)
    catalog.swapSplits(indexName, splits.map(_.id), List(split))
    Some(split)
  }
}

object Indexer {

  /** Min/max of the configured time_field over a written split (epoch
    * micros), read from the split's own Parquet (footer-stat-cheap) —
    * powers manifest-level split pruning. (None, None) when no time_field
    * is configured or it is not a datetime leaf. */
  def timeRange(spark: SparkSession, d: SchemaDerivation,
      splitDir: String): (Option[Long], Option[Long]) = {
    val tsField = d.config.schema.timeField.flatMap(d.byFlatName.get).filter {
      _.fieldType.isInstanceOf[graft.config.DateTimeField]
    }
    tsField match {
      case None => (None, None)
      case Some(rf) =>
        val row = spark.read.schema(d.storageSchema).parquet(splitDir)
          .agg(min(rf.column).as("mn"), max(rf.column).as("mx"))
          .collect()(0)
        def micros(i: Int): Option[Long] =
          Option(row.get(i)).map {
            case t: java.sql.Timestamp =>
              t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
            case t: java.time.Instant =>
              t.getEpochSecond * 1000000L + t.getNano / 1000L
            case t: java.time.LocalDateTime =>
              t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
                t.getNano / 1000L
            case other => sys.error(s"unexpected timestamp type: ${other.getClass}")
          }
        (micros(0), micros(1))
    }
  }
}
