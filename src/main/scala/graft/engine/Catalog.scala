package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import graft.config.IndexConfig
import graft.exprs.JsonSupport

/** Filesystem catalog — the engine's metadata store, replacing the
  * reference's Postgres tables (`/root/reference/migrations/0001_base.up.sql`
  * `indexes` + `index_files`) with:
  *
  * {{{
  * <root>/catalog/<name>.yaml            # index config (create/drop)
  * <root>/indexes/<name>/splits/<id>/    # parquet files of one split
  * <root>/indexes/<name>/manifest.json   # list of live splits (commit point)
  * }}}
  *
  * Commit protocol matches the reference's crash-safety order
  * (`src/commands/merge.rs:50-70`): write new split files first, then
  * atomically swap the manifest, then best-effort delete dropped files
  * (leaked files are tolerated; they are invisible without a manifest
  * entry). The manifest swap is a POSIX atomic rename; on an object store
  * this single small file would become a conditional PUT or a commit log —
  * the one node that must be strongly consistent, everything else is
  * immutable data.
  *
  * Concurrency contract: manifest mutation takes an OS advisory file
  * lock around the read-modify-write, so concurrent writers — across
  * Catalog instances AND across processes on a shared filesystem —
  * serialize instead of losing commits, and a crashed writer's lock is
  * released by the kernel (no stale state; the reference gets the same
  * from Postgres transactions). On an object store the lock becomes a
  * conditional PUT (if-match on the manifest ETag) with the same retry
  * shape. Readers never take the lock: they see either the old or the
  * new manifest, never a partial one. Every manifest write bumps a
  * generation counter, the cheap change-detection handle for caches.
  */
/** One committed split. minTs/maxTs (epoch micros of the configured
  * time_field) enable manifest-level split pruning for time-ranged
  * queries; `numStats` holds per-field min/max zone maps for indexed
  * numeric fields and `dicts` small complete value dictionaries for
  * low-cardinality raw-tokenized text fields — both consulted by the
  * searcher to skip splits without opening a single data file. */
final case class SplitInfo(id: String, numDocs: Long,
    minTs: Option[Long] = None, maxTs: Option[Long] = None,
    numStats: Map[String, (Double, Double)] = Map.empty,
    dicts: Map[String, List[String]] = Map.empty,
    hexStats: Map[String, (String, String)] = Map.empty,
    format: Int = Catalog.SplitFormat)

object Catalog {
  /** Manifest lock acquisition timeout (commit fails loudly after this). */
  val LockTimeoutMs = 30000L

  /** Current split data-layout version. 1 = `_dynamic` stored as JSON
    * text; 2 = `_dynamic` stored as Spark `VariantType` (binary-encoded
    * path access, no per-query JSON re-parse). Manifest entries without a
    * `format` field are version 1. */
  val SplitFormat = 2

  /** Read a set of splits as one DataFrame, upgrading format-1 splits
    * (`_dynamic` as JSON text) to the current in-memory shape (variant)
    * so every consumer sees a single representation. Grouped by format so
    * each parquet read gets the schema its files were written with. */
  private[graft] def readSplits(spark: org.apache.spark.sql.SparkSession,
      d: graft.config.SchemaDerivation, splits: List[SplitInfo],
      dir: SplitInfo => String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, try_parse_json}
    val (cur, legacy) = splits.partition(_.format >= SplitFormat)
    val parts = List(
      Option.when(cur.nonEmpty)(
        spark.read.schema(d.storageSchema).parquet(cur.map(dir): _*)),
      Option.when(legacy.nonEmpty)(
        spark.read.schema(d.legacyStorageSchema).parquet(legacy.map(dir): _*)
          .withColumn(graft.config.SchemaDerivation.Dynamic,
            try_parse_json(col(graft.config.SchemaDerivation.Dynamic))))
    ).flatten
    parts.reduce(_.unionByName(_))
  }

  /** Best-effort recursive directory delete — the shared idiom for
    * removing split data (leaked files are tolerated everywhere: without
    * a manifest entry they are invisible). */
  private[graft] def deleteDirBestEffort(dir: Path): Unit =
    if (Files.exists(dir)) {
      try Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { try Files.deleteIfExists(p) catch { case _: Exception => } })
      catch { case _: Exception => }
    }
}

final class Catalog(rootDir: String) {
  private val root = Paths.get(rootDir)

  private def configPath(name: String) = root.resolve("catalog").resolve(s"$name.yaml")
  private def indexDir(name: String) = root.resolve("indexes").resolve(name)
  private def manifestPath(name: String) = indexDir(name).resolve("manifest.json")
  def splitDir(name: String, id: String): Path =
    indexDir(name).resolve("splits").resolve(id)

  // ---- create / drop ----------------------------------------------------

  def create(configYaml: String): IndexConfig = {
    val cfg = IndexConfig.fromYaml(configYaml) // validates
    require(!Files.exists(configPath(cfg.name)), s"index '${cfg.name}' already exists")
    Files.createDirectories(configPath(cfg.name).getParent)
    Files.write(configPath(cfg.name), configYaml.getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(indexDir(cfg.name).resolve("splits"))
    writeManifest(cfg.name, Nil, prevGen = 0L)
    cfg
  }

  def load(name: String): IndexConfig = {
    require(Files.exists(configPath(name)), s"index '$name' does not exist")
    IndexConfig.fromYaml(new String(Files.readAllBytes(configPath(name)),
      StandardCharsets.UTF_8))
  }

  def exists(name: String): Boolean = Files.exists(configPath(name))

  /** Metadata first, then best-effort file deletion (same order as the
    * reference's drop, `src/commands/drop.rs:11-48`). */
  def drop(name: String): Unit = {
    Files.deleteIfExists(configPath(name))
    Catalog.deleteDirBestEffort(indexDir(name))
  }

  // ---- manifest ---------------------------------------------------------

  /** The catalog root (part of cache identities: index names and split
    * ids are only unique within one root). Named distinctly from the
    * constructor parameter: a `rootDir` method would shadow it inside
    * the `root` initializer and NPE at construction. */
  def catalogRoot: String = root.toString

  def liveSplits(name: String): List[SplitInfo] = manifestState(name)._2

  /** (generation, live splits) from ONE manifest read — callers that need
    * both (e.g. the searcher's stats-cache identity) must not issue two
    * reads, or a concurrent commit can pair generation N+1 with a gen-N
    * split listing and poison a cache entry for that generation. */
  def manifestState(name: String): (Long, List[SplitInfo]) = {
    val p = manifestPath(name)
    if (!Files.exists(p)) return (0L, Nil)
    val node = JsonSupport.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    val gen = Option(node.get("gen")).filter(!_.isNull).map(_.asLong()).getOrElse(0L)
    val splits = node.get("splits").elements().asScala.map { s =>
      val numStats = Option(s.get("stats")).filter(_.isObject).map { st =>
        st.properties().asScala.map { e =>
          e.getKey -> (e.getValue.get("min").asDouble(), e.getValue.get("max").asDouble())
        }.toMap
      }.getOrElse(Map.empty[String, (Double, Double)])
      val dicts = Option(s.get("dicts")).filter(_.isObject).map { dc =>
        dc.properties().asScala.map { e =>
          e.getKey -> e.getValue.elements().asScala.map(_.asText()).toList
        }.toMap
      }.getOrElse(Map.empty[String, List[String]])
      val hexStats = Option(s.get("hexStats")).filter(_.isObject).map { st =>
        st.properties().asScala.map { e =>
          e.getKey -> (e.getValue.get("min").asText(), e.getValue.get("max").asText())
        }.toMap
      }.getOrElse(Map.empty[String, (String, String)])
      SplitInfo(s.get("id").asText(), s.get("numDocs").asLong(),
        Option(s.get("minTs")).filter(!_.isNull).map(_.asLong()),
        Option(s.get("maxTs")).filter(!_.isNull).map(_.asLong()),
        numStats, dicts, hexStats,
        // entries from before the field are format-1 splits
        Option(s.get("format")).filter(!_.isNull).map(_.asInt()).getOrElse(1))
    }.toList
    (gen, splits)
  }

  def splitPaths(name: String): List[String] =
    liveSplits(name).map(s => splitDir(name, s.id).toString)

  /** Monotonic manifest generation — bumped by every committed write; the
    * exact invalidation handle for anything cached per manifest state
    * (e.g. the searcher's BM25 corpus-stats memo). 0 = no manifest. */
  def manifestGen(name: String): Long = manifestState(name)._1

  /** `prevGen` is the generation the caller read in the same critical
    * section — passing it avoids a second full manifest parse while the
    * lock is held. */
  private def writeManifest(name: String, splits: List[SplitInfo],
      prevGen: Long): Unit = {
    val m = JsonSupport.mapper
    val rootNode = m.createObjectNode()
    rootNode.put("gen", prevGen + 1L)
    val arr = m.createArrayNode()
    splits.foreach { s =>
      val o = m.createObjectNode()
      o.put("id", s.id); o.put("numDocs", s.numDocs)
      o.put("format", s.format)
      s.minTs.foreach(o.put("minTs", _))
      s.maxTs.foreach(o.put("maxTs", _))
      if (s.numStats.nonEmpty) {
        val st = m.createObjectNode()
        s.numStats.toList.sortBy(_._1).foreach { case (f, (mn, mx)) =>
          val fo = m.createObjectNode()
          fo.put("min", mn); fo.put("max", mx)
          st.set[com.fasterxml.jackson.databind.JsonNode](f, fo)
        }
        o.set[com.fasterxml.jackson.databind.JsonNode]("stats", st)
      }
      if (s.hexStats.nonEmpty) {
        val st = m.createObjectNode()
        s.hexStats.toList.sortBy(_._1).foreach { case (f, (mn, mx)) =>
          val fo = m.createObjectNode()
          fo.put("min", mn); fo.put("max", mx)
          st.set[com.fasterxml.jackson.databind.JsonNode](f, fo)
        }
        o.set[com.fasterxml.jackson.databind.JsonNode]("hexStats", st)
      }
      if (s.dicts.nonEmpty) {
        val dc = m.createObjectNode()
        s.dicts.toList.sortBy(_._1).foreach { case (f, vs) =>
          val a = m.createArrayNode()
          vs.foreach(a.add)
          dc.set[com.fasterxml.jackson.databind.JsonNode](f, a)
        }
        o.set[com.fasterxml.jackson.databind.JsonNode]("dicts", dc)
      }
      arr.add(o)
    }
    rootNode.set[com.fasterxml.jackson.databind.JsonNode]("splits", arr)
    val tmp = manifestPath(name).resolveSibling(s"manifest.json.tmp-${System.nanoTime()}")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, m.writeValueAsString(rootNode).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Serialize a manifest read-modify-write against all writers (this
    * JVM, other Catalog instances, other processes) with an OS advisory
    * lock (`FileChannel.tryLock`) on a dedicated lock file. The kernel
    * releases the lock when the holder exits or crashes, so there is no
    * stale-lock state and no lock-breaking heuristics (whose
    * check-then-delete windows were themselves racy). The lock file is
    * never deleted — deleting would let a new writer lock a fresh inode
    * while an old holder still locks the unlinked one. Within one JVM,
    * `tryLock` on an already-held file throws OverlappingFileLockException,
    * which is treated as "busy, retry" like any other contention. */
  private def withManifestLock[T](name: String)(body: => T): T = {
    val lock = indexDir(name).resolve("manifest.lock")
    Files.createDirectories(lock.getParent)
    val deadline = System.nanoTime() + Catalog.LockTimeoutMs * 1000000L
    val ch = java.nio.channels.FileChannel.open(lock,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      var fl: java.nio.channels.FileLock = null
      while (fl == null) {
        fl = try ch.tryLock()
        catch { case _: java.nio.channels.OverlappingFileLockException => null }
        if (fl == null) {
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"timed out acquiring manifest lock for '$name'")
          Thread.sleep(5)
        }
      }
      try body finally fl.release()
    } finally ch.close()
  }

  /** Append one split (ingest commit). */
  def commitSplit(name: String, split: SplitInfo): Unit =
    withManifestLock(name) {
      val (gen, live) = manifestState(name)
      writeManifest(name, live :+ split, gen)
    }

  /** Append or replace by id — used by streaming ingest, where a replayed
    * micro-batch rewrites the same split id (effective exactly-once). */
  def commitSplitIdempotent(name: String, split: SplitInfo): Unit =
    withManifestLock(name) {
      val (gen, live) = manifestState(name)
      writeManifest(name, live.filterNot(_.id == split.id) :+ split, gen)
    }

  /** Remove one split's manifest entry if present (no-op otherwise) —
    * the replay-to-empty form of idempotent commit: a replayed batch that
    * now reads zero rows must retract the entry its earlier run
    * committed, since the overwrite already emptied the data files. */
  def removeSplitIfPresent(name: String, id: String): Unit =
    withManifestLock(name) {
      val (gen, live) = manifestState(name)
      if (live.exists(_.id == id))
        writeManifest(name, live.filterNot(_.id == id), gen)
    }

  /** Replace `removed` with `added` (merge commit), then best-effort delete
    * the removed splits' files (outside the lock — they are already
    * invisible). Returns false WITHOUT committing when any `removed` id is
    * no longer live: a concurrent merge already consumed those splits, and
    * committing `added` anyway would duplicate every document they held —
    * the compare-and-swap that makes concurrent compactions one-wins. */
  def swapSplits(name: String, removed: List[String], added: List[SplitInfo]): Boolean = {
    val committed = withManifestLock(name) {
      val (gen, live) = manifestState(name)
      val liveIds = live.map(_.id).toSet
      if (!removed.forall(liveIds.contains)) false
      else {
        writeManifest(name, live.filterNot(s => removed.contains(s.id)) ++ added, gen)
        true
      }
    }
    if (committed) removed.foreach(id =>
      Catalog.deleteDirBestEffort(splitDir(name, id)))
    committed
  }
}
