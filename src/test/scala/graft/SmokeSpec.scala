package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = Graft.session(cores = 4, appName = "graft-test")
}

class SmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has distinct registry entries and runs at sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("events loader normalizes both fixture encodings of ts identically") {
    // the fixture generator has alternated between int64 epoch-nanos and
    // native timestamp[us] for events.ts (it flipped mid-round-8, crashing
    // nine queries); synthesize the OTHER encoding from whatever the
    // current fixture uses and pin that Graft.events yields the same
    // normalized (ts, ts_us, ts_ns) views from either
    import org.apache.spark.sql.functions._
    val real = Graft.events(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("events-enc").toString
    val isTimestampFixture = spark.read.parquet(s"$sf/events.parquet")
      .schema("ts").dataType != org.apache.spark.sql.types.LongType
    val alt =
      if (isTimestampFixture)
        real.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      else
        real.select(col("event_id"),
          timestamp_micros(col("ts_us")).cast("timestamp_ntz").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    alt.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val reread = Graft.events(spark, tmp)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("ts_us"), col("ts_ns"),
          col("ts").cast("string").as("ts_s"))
        .orderBy(col("event_id")).collect().toSeq
    assert(canon(reread) == canon(real),
      "both physical encodings must normalize to identical views")
  }
}
