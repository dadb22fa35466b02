package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Custom streaming state via flatMapGroupsWithState: cross-micro-batch
  * exact dedup (emit a document key the first time it is ever seen, drop
  * replays in any later batch) — the stateful building block for running
  * the dedup operators over a stream instead of a batch corpus.
  */
class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flatMapGroupsWithState dedups across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val deduped = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1) // first sighting wins
          }
      }

    val ckpt = java.nio.file.Files.createTempDirectory("dedup-ckpt").toString
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"), (1L, "a-dup-same-batch"))
      q.processAllAvailable()
      input.addData((1L, "a-dup-later-batch"), (3L, "c"))
      q.processAllAvailable()

      val got = spark.sql("SELECT _1, _2 FROM dedup_out ORDER BY _1")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got.map(_._1) == Seq(1L, 2L, 3L), s"got $got")
      assert(got.head._2 == "a", "first occurrence of key 1 must win")
    } finally q.stop()
  }

  test("foreachBatch + IncrementalDedupState: streaming NEAR-dedup against persisted state") {
    // The production streaming ingest-dedup composition: each micro-batch
    // dedups against the persisted corpus state (df/prefix/sets parquet),
    // then absorbs its keepers — so a near-duplicate (not exact: the
    // watermark dedup above only catches identical keys) of a document
    // absorbed in ANY earlier batch is dropped, across restarts, with
    // per-batch cost proportional to the batch.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stateDir = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val st = new graft.ops.IncrementalDedupState(spark, stateDir, threshold = 0.5)
    val decisions = new java.util.concurrent.ConcurrentHashMap[Long, Long]()

    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("stream-dedup-ckpt").toString
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sh = graft.ops.Dedup.shingles(
          batch.withColumn("tk", split(col("text"), " ")),
          col("doc_id"), col("tk"), n = 3)
        val res = st.dedupBatch(sh).collect()
        res.foreach(r => decisions.put(r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1)))
        val keep = res.filter(_.getBoolean(2)).map(_.getLong(0)).toSeq
        // all-duplicate batches change nothing: skip the state rebuild
        if (keep.nonEmpty) st.absorb(sh.where(col("doc_id").isin(keep: _*)))
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six"))
      q.processAllAvailable()
      // near-dup of doc 1 (last word changed: jaccard 3/5 >= 0.5) + new doc
      input.addData(
        (10L, "alpha beta gamma delta epsilon eta"),
        (11L, "totally different content appears here now"))
      q.processAllAvailable()
      // near-dup of the BATCH-2 keeper: proves state grew across batches
      input.addData((20L, "totally different content appears here today"))
      q.processAllAvailable()

      import scala.jdk.CollectionConverters._
      val got = decisions.asScala.toMap
      assert(got == Map(1L -> -1L, 2L -> -1L, 10L -> 1L, 11L -> -1L, 20L -> 11L),
        s"got $got")
      assert(st.generation == 2L,
        s"one absorb per KEEPING batch (batch 3 was all-dup), got ${st.generation}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replays; state expires with time") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (doc_id, event-time seconds) — the built-in bounded-state streaming
    // dedup: unlike the flatMapGroupsWithState version above (state lives
    // forever), dedup state here is dropped once the watermark passes it,
    // which is what makes streaming ingest dedup viable at 100 TB: state
    // is O(events within the watermark window), not O(all keys ever).
    val input = MemoryStream[(Long, Long)]
    val deduped = input.toDS()
      .select(col("_1").as("doc_id"),
        timestamp_seconds(col("_2")).as("ts"))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("doc_id")

    val ckpt = java.nio.file.Files.createTempDirectory("ddww-ckpt").toString
    val q = deduped.writeStream
      .format("memory").queryName("ddww_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData((1L, 100L), (2L, 101L))
      q.processAllAvailable()
      // replay of doc 1 within the watermark window: dropped
      input.addData((1L, 105L), (3L, 106L))
      q.processAllAvailable()
      // advance event time far past the watermark, then replay doc 1:
      // its dedup state has expired, so it is (correctly) emitted again
      input.addData((4L, 1000L))
      q.processAllAvailable()
      input.addData((1L, 1001L))
      q.processAllAvailable()

      val got = spark.sql("SELECT doc_id FROM ddww_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 1L, 2L, 3L, 4L), s"got $got")
    } finally q.stop()
  }

  test("index --stream with StreamStateConfig: one stream drives split commits, " +
      "near-dedup state, and the HLL datasheet, batch-identically") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft-sstream").toString
    val cat = new graft.engine.Catalog(root)
    cat.create(
      """version: 1
        |name: sstream
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: body
        |      type: !text
        |    - name: tenant
        |      type: !text
        |        indexed:
        |          tokenizer: raw
        |""".stripMargin)
    val stateDir = s"$root/state/sstream"
    val sc = graft.streaming.StreamStateConfig(stateDir, textField = "body",
      threshold = 0.5, sketchField = Some("tenant"),
      quantileField = Some("body"))

    def doc(t: String, body: String) =
      s"""{"tenant": "$t", "body": "$body"}"""
    val b1 = Seq(
      doc("t1", "alpha beta gamma delta epsilon zeta"),
      doc("t1", "alpha beta gamma delta epsilon zeta"), // exact dup, same batch
      doc("t2", "one two three four five six"))
    val b2 = Seq(
      doc("t3", "alpha beta gamma delta epsilon eta"), // near-dup of batch-1 doc
      doc("t2", "totally different content appears here now"))
    val b3 = Seq(
      doc("t4", "totally different content appears here today")) // near-dup of b2 keeper

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("sstream-ckpt").toString
    val q = new graft.streaming.StreamingIndexer(spark, cat).startStream(
      "sstream", input.toDF(), ckpt, availableNow = false, stateful = Some(sc))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    // only the 3 keepers were ever indexed (the exact dup collapsed and
    // both near-dups dropped before any split write)
    assert(cat.liveSplits("sstream").map(_.numDocs).sum == 3,
      s"splits: ${cat.liveSplits("sstream")}")
    val s = new graft.engine.Searcher(spark, cat)
    assert(s.searchDf("sstream", "body:eta", 10).count() == 0,
      "the near-duplicate never reached the index")
    assert(s.searchDf("sstream", "body:alpha", 10).count() == 1)

    // batch-identical: drive the SAME batches through the batch-tier APIs
    // on fresh state — decisions, final corpus state, and registers must
    // all agree with what the stream left behind
    val refDir = java.nio.file.Files.createTempDirectory("sstream-ref").toString
    val st = new graft.ops.IncrementalDedupState(spark, s"$refDir/dedup", 0.5)
    val hll = new graft.ops.HllRegisterState(spark, s"$refDir/hll")
    val hdrRef = new graft.ops.HdrBucketState(spark, s"$refDir/hdr")
    Seq(b1, b2, b3).foreach { b =>
      val df = b.toDF("value").dropDuplicates("value")
        .withColumn("__did", graft.ops.Hashing.h64(col("value")))
      val sh = graft.ops.Dedup.shingles(
        df.withColumn("tk", graft.functions.TextFunctions.tokenize(
          get_json_object(col("value"), "$.body"), "default")),
        col("__did"), col("tk"), 3)
      val keep = st.dedupBatch(sh).where(col("keep"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      if (keep.nonEmpty)
        st.absorb(sh.where(col("doc_id").isin(keep.toSeq: _*)))
      val kept = df.where(col("__did").isin(keep.toSeq: _*))
        .select(lit("stream").as("grp"),
          get_json_object(col("value"), "$.tenant").as("k"))
      hll.merge(graft.ops.Sketch.hllRegisters(kept, col("grp"), col("k")))
      val lens = df.where(col("__did").isin(keep.toSeq: _*))
        .select(lit("stream").as("grp"),
          length(get_json_object(col("value"), "$.body")).cast("long").as("v"))
      hdrRef.merge(graft.ops.Sketch.hdrBuckets(lens, col("grp"), col("v")))
    }
    val streamed = new graft.ops.HllRegisterState(spark, s"$stateDir/hll")
    assert(streamed.registers.exceptAll(hll.registers).isEmpty &&
      hll.registers.exceptAll(streamed.registers).isEmpty,
      "streamed registers must equal the batch-replayed registers")
    // the quantile sidecar: streamed grid == batch-replayed grid, and its
    // quantiles ride the 3 keepers' body lengths
    val hdrStreamed = new graft.ops.HdrBucketState(spark, s"$stateDir/hdr")
    assert(hdrStreamed.buckets.exceptAll(hdrRef.buckets).isEmpty &&
      hdrRef.buckets.exceptAll(hdrStreamed.buckets).isEmpty,
      "streamed HDR grid must equal the batch-replayed grid")
    val qs = graft.ops.Sketch.hdrQuantiles(hdrStreamed.buckets, Seq(50))
      .collect().head
    assert(qs.getAs[Long]("n") == 3L, s"3 keepers in the grid: $qs")
    // the streamed HLL estimate serves the datasheet: keepers carry
    // tenants t1, t2, t2 -> 2 distinct, deep LC regime -> exact
    val est = graft.ops.Sketch.hllEstimateCorrected(streamed.registers)
      .collect().head
    assert(est.getAs[String]("regime") == "lc")
    assert(est.getAs[Long]("est_distinct") == 2L,
      s"tenants t1,t2 among keepers: $est")
    val streamedDedup =
      new graft.ops.IncrementalDedupState(spark, s"$stateDir/dedup", 0.5)
    assert(streamedDedup.generation == st.generation,
      "same number of absorbing generations")
    cat.drop("sstream")
  }

  test("crash-replay of a stateful batch: absorb landed but the split did not " +
      "— the replay still indexes every keeper (no self-match data loss)") {
    // The r11-advice scenario: doc ids are deterministic content hashes, so
    // after a crash between the dedup-state absorb and the split commit a
    // naive replay would find its own documents already in the state, mark
    // them dup-of-self at Jaccard 1.0, and commit an EMPTY split — the
    // batch's documents silently lost. The generation batch-tag makes the
    // replay read the pre-absorb state instead; this drives maintainState +
    // indexBatch directly to simulate the crash at the worst point.
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val cat = new graft.engine.Catalog(root)
    cat.create(
      """version: 1
        |name: replay
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: body
        |      type: !text
        |""".stripMargin)
    val stateDir = s"$root/state/replay"
    val sc = graft.streaming.StreamStateConfig(stateDir, textField = "body",
      threshold = 0.5, quantileField = Some("body"))
    val ix = new graft.streaming.StreamingIndexer(spark, cat)
    val st = new graft.ops.IncrementalDedupState(spark, s"$stateDir/dedup", 0.5)
    val hdr = new graft.ops.HdrBucketState(spark, s"$stateDir/hdr")

    val b1 = Seq(
      """{"body": "alpha beta gamma delta epsilon zeta"}""",
      """{"body": "one two three four five six"}""").toDF("value")
    val tag1 = "run/1"

    // batch 1, attempt 1: state mutates... and then we "crash" before
    // indexBatch — exactly the advice's data-loss window
    ix.maintainState(b1, sc, tag1).count(): Unit
    assert(st.generation == 1L && st.latestBatchTag.contains(tag1))
    assert(hdr.generation == 1L && hdr.latestBatchTag.contains(tag1))

    // batch 1, attempt 2 (replay): same decisions, absorb no-ops, and the
    // split commit carries BOTH documents
    val replayKept = ix.maintainState(b1, sc, tag1)
    val committed = ix.indexBatch("replay", replayKept, batchId = 1L, runTag = "rt")
    assert(committed.exists(_.numDocs == 2L),
      s"replayed batch must index both keepers, got $committed")
    assert(st.generation == 1L, "replayed absorb must not grow the state")
    // the sum-merge is tag-guarded: a double merge would double-count
    assert(hdr.generation == 1L, "replayed HDR merge must no-op")
    assert(graft.ops.Sketch.hdrQuantiles(hdr.buckets, Seq(50))
      .collect().head.getAs[Long]("n") == 2L,
      "grid counts batch 1's two keepers exactly once")

    // a LATER batch with a different tag still dedups against the full
    // state: a near-dup of batch 1 is dropped, the new doc survives
    val b2 = Seq(
      """{"body": "alpha beta gamma delta epsilon eta"}""",
      """{"body": "completely unrelated text lives in this line"}""")
      .toDF("value")
    val kept2 = ix.maintainState(b2, sc, "run/2")
    assert(kept2.count() == 1L, "near-dup of an absorbed doc still drops")
    assert(st.generation == 2L && st.latestBatchTag.contains("run/2"))

    // and an untagged batch-pipeline caller sees unchanged behavior
    val sh = graft.ops.Dedup.shingles(
      Seq((99L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
        .withColumn("tk", split(col("text"), " ")),
      col("doc_id"), col("tk"), 3)
    assert(st.dedupBatch(sh).where(col("keep")).isEmpty,
      "untagged dedupBatch reads the latest generation")
    cat.drop("replay")
  }

  test("streaming vector search: --ann-field keeps the trained IVF tier fresh per batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft-sann").toString
    val cat = new graft.engine.Catalog(root)
    cat.create(
      """version: 1
        |name: sann
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: body
        |      type: !text
        |    - name: emb
        |      type: !number
        |        type: f64
        |      array: true
        |""".stripMargin)
    val stateDir = s"$root/state/sann"
    val sc = graft.streaming.StreamStateConfig(stateDir, textField = "body",
      threshold = 0.5, annField = Some("emb"))
    def doc(t: String, v: Seq[Double]) =
      s"""{"body": "$t", "emb": [${v.mkString(", ")}]}"""

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("sann-ckpt").toString
    val ann = new graft.engine.AnnIndex(spark, cat)
    val q = new graft.streaming.StreamingIndexer(spark, cat).startStream(
      "sann", input.toDF(), ckpt, availableNow = false, stateful = Some(sc))
    try {
      // batch 1 lands BEFORE any training — the refresh hook must no-op
      input.addData(
        doc("first batch doc one", Seq(1.0, 0.0, 0.0, 0.0)),
        doc("first batch doc two", Seq(0.0, 0.0, 1.0, 0.0)))
      q.processAllAvailable()
      assert(ann.meta("sann", "emb").isEmpty, "no training happened yet")

      // operator trains once; subsequent batches auto-refresh
      ann.train("sann", "emb", cells = 2)
      input.addData(doc("second batch doc", Seq(0.9, 0.1, 0.0, 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    // the IVF tier serves the post-train doc with the generation current
    val (curGen, _) = cat.manifestState("sann")
    assert(ann.meta("sann", "emb").exists(_._2 == curGen),
      s"refresh must advance the covered generation to $curGen")
    val hits = ann.knn("sann", "emb", Array(0.9f, 0.1f, 0.0f, 0.0f), 1,
      nProbe = 1).collect()
    assert(hits.head.getString(1).contains("second batch doc"),
      s"streamed doc must be IVF-served: ${hits.mkString}")
    cat.drop("sann")
  }

  test("--ann-retrain-threshold: a drifted batch (out-of-sample fit far " +
      "below the first-batch anchor) triggers a staged retrain; a control " +
      "stream never does") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft-dann").toString
    val cat = new graft.engine.Catalog(root)
    cat.create(
      """version: 1
        |name: dann
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: body
        |      type: !text
        |    - name: emb
        |      type: !number
        |        type: f64
        |      array: true
        |""".stripMargin)
    val sc = graft.streaming.StreamStateConfig(s"$root/state/dann",
      textField = "body", threshold = 0.5, annField = Some("emb"),
      annRetrainThreshold = 300000L) // 0.3 mean-cosine drop
    def doc(t: String, v: Seq[Double]) =
      s"""{"body": "$t", "emb": [${v.mkString(", ")}]}"""
    def xdoc(t: String, i: Int) = doc(t, Seq(1.0, 0.01 * i, 0.0, 0.0))

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("dann-ckpt").toString
    val ann = new graft.engine.AnnIndex(spark, cat)
    val q = new graft.streaming.StreamingIndexer(spark, cat).startStream(
      "dann", input.toDF(), ckpt, availableNow = false, stateful = Some(sc))
    try {
      input.addData((1 to 4).map(i => xdoc(s"seed doc nr$i", i)): _*)
      q.processAllAvailable()
      ann.train("dann", "emb", cells = 2)
      val model0 = ann.modelOf("dann", "emb")
      // two SAME-cluster batches: the first anchors the fit, the second
      // matches it — no retrain (control stream never false-triggers)
      input.addData(xdoc("anchor batch doc nr5", 5))
      q.processAllAvailable()
      input.addData(xdoc("control batch doc nr6", 6))
      q.processAllAvailable()
      assert(ann.modelOf("dann", "emb") == model0,
        "a control stream must not trigger a retrain")
      val drift0 = ann.driftPpm("dann", "emb")
      assert(drift0.exists(d => math.abs(d) < 300000L),
        s"control drift reads near zero: $drift0")
      // a DRIFTED batch: orthogonal cluster — fit plunges vs the anchor
      input.addData(
        doc("drifted doc one", Seq(0.0, 0.0, 1.0, 0.02)),
        doc("drifted doc two", Seq(0.0, 0.0, 0.95, 0.0)))
      q.processAllAvailable()
      assert(ann.modelOf("dann", "emb") != model0,
        "the drift trigger must have retrained (fresh model dir)")
      // the retrain re-anchored: fit bookkeeping cleared
      assert(ann.driftPpm("dann", "emb").isEmpty,
        "retrain clears the drift anchor")
    } finally q.stop()
    // post-retrain serving covers every doc exactly once (probe all
    // cells: the retrained default sizing is ceil(sqrt(8)) = 3)
    val got = ann.knn("dann", "emb", Array(0.0f, 0.0f, 1.0f, 0.0f), 10,
      nProbe = 8).collect()
    assert(got.length == 8, s"all eight docs served: ${got.length}")
    assert(got.head.getString(1).contains("drifted"),
      s"drifted-cluster query serves drifted docs first: ${got.head}")
    cat.drop("dann")
  }

  test("--ann-retrain-threshold: the FIRST refresh batch being already " +
      "drifted fires the trigger — the train-time held-out anchor, not " +
      "the first batch, is the baseline (r16 verdict)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft-fann").toString
    val cat = new graft.engine.Catalog(root)
    cat.create(
      """version: 1
        |name: fann
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: body
        |      type: !text
        |    - name: emb
        |      type: !number
        |        type: f64
        |      array: true
        |""".stripMargin)
    val sc = graft.streaming.StreamStateConfig(s"$root/state/fann",
      textField = "body", threshold = 0.5, annField = Some("emb"),
      annRetrainThreshold = 300000L)
    def doc(t: String, v: Seq[Double]) =
      s"""{"body": "$t", "emb": [${v.mkString(", ")}]}"""

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("fann-ckpt").toString
    val ann = new graft.engine.AnnIndex(spark, cat)
    val q = new graft.streaming.StreamingIndexer(spark, cat).startStream(
      "fann", input.toDF(), ckpt, availableNow = false, stateful = Some(sc))
    try {
      // a training corpus LARGE enough for the held-out anchor (>= 66
      // rows: seeds + the 64-row holdout must fit disjointly), all in
      // one tight cluster around (1, eps, 0, 0)
      input.addData((1 to 80).map(i =>
        doc(s"corpus doc nr$i", Seq(1.0, 0.005 * i, 0.0, 0.0))): _*)
      q.processAllAvailable()
      ann.train("fann", "emb", cells = 2)
      val model0 = ann.modelOf("fann", "emb")
      // the classic deploy-then-world-changes case: the VERY FIRST
      // refresh batch is from an orthogonal cluster. Pre-r17 this batch
      // BECAME the anchor (drift read 0 forever, trigger disarmed);
      // with the train-time held-out anchor it reads ~1e6 ppm and fires.
      input.addData(
        doc("drifted doc one", Seq(0.0, 0.0, 1.0, 0.02)),
        doc("drifted doc two", Seq(0.0, 0.0, 0.95, 0.0)))
      q.processAllAvailable()
      assert(ann.modelOf("fann", "emb") != model0,
        "an already-drifted FIRST refresh batch must trigger the retrain")
    } finally q.stop()
    // the retrain absorbed both clusters: a drifted-cluster query now
    // serves drifted docs first
    val got = ann.knn("fann", "emb", Array(0.0f, 0.0f, 1.0f, 0.0f), 2,
      nProbe = 16).collect()
    assert(got.nonEmpty && got.head.getString(1).contains("drifted"),
      s"retrained tier serves the drifted cluster: ${got.headOption}")
    cat.drop("fann")
  }

  test("--ann-tombstone-threshold: a --dedup merge's tombstones cross the " +
      "share threshold and the NEXT batch folds them physical (r16 verdict #5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft-tfold").toString
    val cat = new graft.engine.Catalog(root)
    cat.create(
      """version: 1
        |name: tfold
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: body
        |      type: !text
        |    - name: emb
        |      type: !number
        |        type: f64
        |      array: true
        |""".stripMargin)
    val sc = graft.streaming.StreamStateConfig(s"$root/state/tfold",
      textField = "body", threshold = 0.5, annField = Some("emb"),
      annTombstoneThreshold = 0.1)
    def doc(t: String, v: Seq[Double]) =
      s"""{"body": "$t", "emb": [${v.mkString(", ")}]}"""
    // the duplicate's body is ONE token so the streaming near-dedup
    // shingler (>= 3 tokens) passes it through — the duplicate must
    // reach the index for the out-of-band --dedup merge to retire it
    val dup = doc("dup", Seq(1.0, 0.0, 0.0, 0.0))

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("tfold-ckpt").toString
    val ann = new graft.engine.AnnIndex(spark, cat)
    val q = new graft.streaming.StreamingIndexer(spark, cat).startStream(
      "tfold", input.toDF(), ckpt, availableNow = false, stateful = Some(sc))
    try {
      input.addData(dup,
        doc("first corpus document here", Seq(0.9, 0.1, 0.0, 0.0)),
        doc("second corpus document here", Seq(0.0, 1.0, 0.0, 0.0)))
      q.processAllAvailable()
      ann.train("tfold", "emb", cells = 2)
      // the SAME doc lands again in a later split (at-least-once ingest)
      input.addData(dup,
        doc("third corpus document here", Seq(0.0, 0.0, 1.0, 0.0)))
      q.processAllAvailable()
      assert(ann.tombOf("tfold", "emb").isEmpty, "no tombstones yet")
      // out-of-band --dedup merge retires the surplus copy via dedupSync
      graft.cli.Main.run(Array("merge", "tfold", "--dedup"), spark, cat, root)
      assert(ann.tombOf("tfold", "emb").isDefined,
        "the dedup merge must publish a tombstone set")
      val (t0, n0) = ann.tombstoneShare("tfold", "emb").get
      assert(t0 == 1L && t0.toDouble >= 0.1 * n0,
        s"fixture sanity — share $t0/$n0 crosses the 0.1 threshold")
      // the NEXT batch's policy check folds the tombstones physical
      input.addData(doc("fourth corpus document here", Seq(0.5, 0.5, 0.0, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    assert(ann.tombOf("tfold", "emb").isEmpty,
      "the threshold policy must fold tombstones away (tomb-less META)")
    val (fb, fe) = ann.epochSpan("tfold", "emb")
    assert(fb == fe, s"folded layout serves one epoch: ($fb, $fe)")
    val served = ann.knn("tfold", "emb", Array(1.0f, 0.0f, 0.0f, 0.0f), 10,
      nProbe = 2).collect().map(_.getString(1))
    assert(served.length == 5 && served.count(_.contains("\"dup\"")) == 1,
      s"five distinct docs, the duplicate exactly once: ${served.mkString("; ")}")
    cat.drop("tfold")
  }

  test("streaming --ann-field survives auto-compaction: coverage translates " +
      "through the lossless merge, no retrain, every doc served once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("graft-scann").toString
    val cat = new graft.engine.Catalog(root)
    cat.create(
      """version: 1
        |name: scann
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: body
        |      type: !text
        |    - name: emb
        |      type: !number
        |        type: f64
        |      array: true
        |""".stripMargin)
    val sc = graft.streaming.StreamStateConfig(s"$root/state/scann",
      textField = "body", threshold = 0.5, annField = Some("emb"),
      // fold epoch dirs as soon as two accumulate — the long-lived
      // stream's bounded-directory-count policy, exercised every batch
      annCompactEvery = 2)
    def doc(t: String, v: Seq[Double]) =
      s"""{"body": "$t", "emb": [${v.mkString(", ")}]}"""

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("scann-ckpt").toString
    val ann = new graft.engine.AnnIndex(spark, cat)
    // compactSmallDocs merges everything but the just-committed split —
    // the long-lived-stream compaction the r12 scaladoc said breaks the
    // vector tier; with merge lineage it must NOT anymore
    val q = new graft.streaming.StreamingIndexer(spark, cat).startStream(
      "scann", input.toDF(), ckpt, availableNow = false,
      compactSmallDocs = Some(100L), stateful = Some(sc))
    try {
      input.addData(
        doc("alpha doc", Seq(1.0, 0.0, 0.0, 0.0)),
        doc("beta doc", Seq(0.0, 0.0, 1.0, 0.0)))
      q.processAllAvailable()
      // sq8 tier: the per-batch refresh hook must encode appended rows
      // with the FROZEN train-time quantizer, and the auto-fold must
      // carry the code column — pinned below on the final layout
      ann.train("scann", "emb", cells = 2, sq8 = true)
      input.addData(doc("gamma doc", Seq(0.9, 0.1, 0.0, 0.0)))
      q.processAllAvailable()
      // this batch's commit triggers a compaction of the two COVERED
      // splits; the refresh hook then translates and appends
      input.addData(doc("delta doc", Seq(0.0, 0.1, 0.9, 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    // refresh kept up (it would have logged-and-skipped before r13,
    // leaving the covered generation behind the manifest's)
    val (curGen, live) = cat.manifestState("scann")
    assert(live.exists(_.parents.nonEmpty),
      s"the auto-compaction must record lineage: ${live.map(s => s.id -> s.parents)}")
    assert(ann.meta("scann", "emb").exists(_._2 == curGen),
      s"refresh must survive the compaction and advance to gen $curGen " +
        s"(meta: ${ann.meta("scann", "emb")})")
    val served = ann.knn("scann", "emb", Array(1.0f, 0.0f, 0.0f, 0.0f), 4,
      nProbe = 2).collect()
    assert(served.length == 4 &&
      served.map(_.getString(1)).distinct.length == 4,
      s"all 4 docs IVF-served exactly once:\n${served.mkString("\n")}")
    // the annCompactEvery=2 policy folded the per-batch epochs: the
    // served span stays bounded however many batches the stream ran
    val (eb, ee) = ann.epochSpan("scann", "emb")
    assert(ee - eb + 1 <= 2,
      s"epoch span must stay <= the compaction cadence, got ($eb, $ee)")
    // every stored row — trained, stream-refreshed, and epoch-folded —
    // carries the sq8 code column encoded under the frozen quantizer
    val sqData = spark.read.parquet(java.nio.file.Paths.get(
      root, "indexes", "scann", "ann", "emb", "data").toString)
    assert(sqData.columns.contains("__sq8"), sqData.columns.mkString(","))
    assert(sqData.where(col("__sq8").isNull).count() == 0,
      "streaming refresh + auto-fold must preserve the sq8 codes")
    cat.drop("scann")
  }
}
