package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, Searcher}
import graft.streaming.StreamingIndexer

/** F7 — streaming semantics (`/root/reference/tests/kafka_indexing.rs`):
  * (a) a micro-batch with >0 docs produces a new split;
  * (b) an in-flight batch that never completed leaves no manifest entry;
  * (c) offsets checkpoint only after split commit and are reloaded on
  *     restart — a restarted query processes only new data, and a replayed
  *     batch id overwrites the same split (at-least-once upgraded to
  *     effective exactly-once).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val configYaml =
    """version: 1
      |name: stream_test
      |path: /tmp/unused
      |schema:
      |  fields:
      |    - name: n
      |      type: !number
      |        type: i64
      |""".stripMargin

  test("micro-batches produce splits; checkpoint restart resumes from offsets") {
    val root = Files.createTempDirectory("graft-stream").toString
    val srcDir = Files.createTempDirectory("stream-src").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val cat = new Catalog(root)
    cat.create(configYaml)
    val streamer = new StreamingIndexer(spark, cat)
    val search = new Searcher(spark, cat)

    // (a) two files -> AvailableNow drains them -> at least one split
    Files.write(Paths.get(srcDir, "a.json"), """{"n": 1}""".getBytes)
    Files.write(Paths.get(srcDir, "b.json"), """{"n": 2}""".getBytes)
    val q1 = streamer.startFileStream("stream_test", srcDir, ckpt, availableNow = true)
    q1.awaitTermination(60000)
    val splitsAfterFirst = cat.liveSplits("stream_test")
    assert(splitsAfterFirst.nonEmpty)
    assert(splitsAfterFirst.map(_.numDocs).sum == 2)
    assert(search.search("stream_test", "n:1", 1) == Seq("""{"n":1}"""))

    // (c) restart with the same checkpoint: only the new file is indexed
    Files.write(Paths.get(srcDir, "c.json"), """{"n": 3}""".getBytes)
    val q2 = streamer.startFileStream("stream_test", srcDir, ckpt, availableNow = true)
    q2.awaitTermination(60000)
    val splitsAfterSecond = cat.liveSplits("stream_test")
    assert(splitsAfterSecond.map(_.numDocs).sum == 3,
      s"expected exactly 3 docs total (no reprocessing), got $splitsAfterSecond")
    assert(search.search("stream_test", "n:3", 1) == Seq("""{"n":3}"""))

    // (b)+idempotence: replaying a batch id within the same run overwrites,
    // not duplicates
    val streamer2 = new StreamingIndexer(spark, cat)
    import spark.implicits._
    val replay = Seq("""{"n": 1}""", """{"n": 2}""").toDF("value")
    val firstId = splitsAfterFirst.head.id
    val runTag = StreamingIndexer.runTagFor(ckpt)
    assert(firstId.startsWith(s"run-$runTag-batch-"), s"split id $firstId carries run tag")
    val existingBatchId = firstId.substring(firstId.lastIndexOf('-') + 1).toLong
    streamer2.indexBatch("stream_test", replay, existingBatchId, runTag)
    assert(cat.liveSplits("stream_test").map(_.numDocs).sum == 3 ||
      cat.liveSplits("stream_test").count(_.id == firstId) == 1,
      "replayed batch must not duplicate a manifest entry")

    // a second logical run (fresh checkpoint, batch ids restart at 0) must
    // NOT clobber the first run's splits
    val ckpt2 = Files.createTempDirectory("stream-ckpt2").toString
    val docsBefore = cat.liveSplits("stream_test").map(_.numDocs).sum
    val q3 = streamer.startFileStream("stream_test", srcDir, ckpt2, availableNow = true)
    q3.awaitTermination(60000)
    val after = cat.liveSplits("stream_test")
    assert(after.map(_.numDocs).sum == docsBefore + 3,
      s"fresh run must append (distinct run tag), got $after")
  }

  test("tiered merge compacts a stream's small splits without stopping ingest") {
    // The intended production loop: streaming commits many small splits;
    // a periodic mergeSmall compacts them while the stream keeps writing
    // (compaction and ingest touch disjoint manifest entries; the swap is
    // atomic either way).
    val root = Files.createTempDirectory("graft-stream-merge").toString
    val srcDir = Files.createTempDirectory("sm-src").toString
    val ckpt = Files.createTempDirectory("sm-ckpt").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: sm_test
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: n
        |      type: !number
        |        type: i64
        |""".stripMargin)
    val streamer = new StreamingIndexer(spark, cat)
    val idx = new graft.engine.Indexer(spark, cat)
    val search = new Searcher(spark, cat)

    // five 1-doc files, one AvailableNow drain each -> >=2 small splits
    for (i <- 1 to 5) {
      Files.write(Paths.get(srcDir, s"f$i.json"), s"""{"n": $i}""".getBytes)
      val q = streamer.startFileStream("sm_test", srcDir, ckpt, availableNow = true)
      q.awaitTermination(60000)
    }
    val before = cat.liveSplits("sm_test")
    assert(before.length >= 2 && before.map(_.numDocs).sum == 5, s"got $before")

    // compact everything under 100 docs (all of them) into one split
    val merged = idx.mergeSmall("sm_test", smallDocs = 100)
    assert(merged.isDefined && merged.get.numDocs == 5)
    assert(cat.liveSplits("sm_test").length == 1)

    // ingest continues against the compacted manifest
    Files.write(Paths.get(srcDir, "f6.json"), """{"n": 6}""".getBytes)
    val q = streamer.startFileStream("sm_test", srcDir, ckpt, availableNow = true)
    q.awaitTermination(60000)
    assert(cat.liveSplits("sm_test").map(_.numDocs).sum == 6)
    assert(search.search("sm_test", "n:>=1", 10).length == 6)
    assert(search.search("sm_test", "n:6", 1) == Seq("""{"n":6}"""))
  }

  test("kafka-shaped source: binary value records commit splits and replay idempotently") {
    // The Kafka path minus the broker: a MemoryStream of raw byte payloads
    // goes through the exact projection startKafkaStream applies
    // (kafkaValueProjection — binary value cast to string) into the shared
    // startStream entry, so the whole code path below the connector is
    // exercised: cast, schema ingest, split commit, checkpointed offsets,
    // run-tagged idempotent replay.
    val root = Files.createTempDirectory("graft-kafka-shape").toString
    val ckpt = Files.createTempDirectory("kafka-ckpt").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: kb_test
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: n
        |      type: !number
        |        type: i64
        |""".stripMargin)
    val streamer = new StreamingIndexer(spark, cat)
    val search = new Searcher(spark, cat)

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    val lines = source.toDF().select(StreamingIndexer.kafkaValueProjection)

    source.addData("""{"n": 10}""".getBytes("UTF-8"), """{"n": 20}""".getBytes("UTF-8"))
    val q = streamer.startStream("kb_test", lines, ckpt)
    try {
      q.processAllAvailable()
      val splits = cat.liveSplits("kb_test")
      assert(splits.map(_.numDocs).sum == 2, s"got $splits")
      assert(search.search("kb_test", "n:20", 1) == Seq("""{"n":20}"""))

      // second payload batch appends
      source.addData("""{"n": 30}""".getBytes("UTF-8"))
      q.processAllAvailable()
      assert(cat.liveSplits("kb_test").map(_.numDocs).sum == 3)
    } finally q.stop()

    // replay of a committed batch id (the rebalance/restart shape,
    // kafka_indexing.rs:191-246): same run tag + batch id overwrites the
    // same split — no duplication
    val runTag = StreamingIndexer.runTagFor(ckpt)
    val first = cat.liveSplits("kb_test").minBy(_.id)
    assert(first.id.startsWith(s"run-$runTag-batch-"), s"id ${first.id}")
    val batchId = first.id.substring(first.id.lastIndexOf('-') + 1).toLong
    val replay = Seq("""{"n": 10}""", """{"n": 20}""").toDF("value")
    streamer.indexBatch("kb_test", replay, batchId, runTag)
    assert(cat.liveSplits("kb_test").map(_.numDocs).sum == 3,
      "replayed batch must overwrite its split, not duplicate it")
  }

  test("kafka-shaped batch mode: AvailableNow drains to EOF, then the query terminates") {
    // The reference's non-stream Kafka ingest reads earliest -> current end
    // offsets and exits (kafka_source.rs batch path). Same contract-test
    // shape as above: a MemoryStream of raw bytes through
    // kafkaValueProjection + startStream, but with availableNow = true —
    // the query must drain what exists, commit through the idempotent
    // path, and terminate on its own (no stop()).
    val root = Files.createTempDirectory("graft-kafka-batch").toString
    val ckpt = Files.createTempDirectory("kafka-batch-ckpt").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: kbatch_test
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: n
        |      type: !number
        |        type: i64
        |""".stripMargin)
    val streamer = new StreamingIndexer(spark, cat)

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    val lines = source.toDF().select(StreamingIndexer.kafkaValueProjection)
    source.addData("""{"n": 1}""".getBytes("UTF-8"), """{"n": 2}""".getBytes("UTF-8"))

    val q = streamer.startStream("kbatch_test", lines, ckpt, availableNow = true)
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate at EOF")
    assert(cat.liveSplits("kbatch_test").map(_.numDocs).sum == 2)

    // a later batch invocation from the same checkpoint picks up only NEW
    // data (offsets persisted), the incremental-backfill shape
    source.addData("""{"n": 3}""".getBytes("UTF-8"))
    val q2 = streamer.startStream("kbatch_test", lines, ckpt, availableNow = true)
    assert(q2.awaitTermination(60000))
    assert(cat.liveSplits("kbatch_test").map(_.numDocs).sum == 3)
    assert(new Searcher(spark, cat).search("kbatch_test", "n:3", 1) ==
      Seq("""{"n":3}"""))
  }

  test("streaming auto-compaction converges splits, sparing the newest") {
    val root = Files.createTempDirectory("graft-autocompact").toString
    val srcDir = Files.createTempDirectory("ac-src").toString
    val ckpt = Files.createTempDirectory("ac-ckpt").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: ac_test
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: n
        |      type: !number
        |        type: i64
        |""".stripMargin)
    val streamer = new StreamingIndexer(spark, cat)
    val search = new Searcher(spark, cat)

    // six 1-doc micro-batches with inline auto-compaction: every commit
    // merges all small splits except the one just written, so the live
    // count stays at <= 2 (merged + newest) instead of growing to 6
    for (i <- 1 to 6) {
      Files.write(Paths.get(srcDir, s"f$i.json"), s"""{"n": $i}""".getBytes)
      val q = streamer.startFileStream("ac_test", srcDir, ckpt,
        availableNow = true, compactSmallDocs = Some(100L))
      q.awaitTermination(60000)
      assert(cat.liveSplits("ac_test").length <= 2,
        s"batch $i left ${cat.liveSplits("ac_test")}")
    }
    assert(cat.liveSplits("ac_test").map(_.numDocs).sum == 6)
    assert(search.search("ac_test", "n:>=1", 10).length == 6)
    // the newest split must never have been merged away mid-run: its id
    // still carries the latest batch tag
    val runTag = StreamingIndexer.runTagFor(ckpt)
    assert(cat.liveSplits("ac_test").exists(_.id.startsWith(s"run-$runTag-batch-")),
      "just-committed split survives compaction for replay safety")
  }
}
