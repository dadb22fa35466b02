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
}
