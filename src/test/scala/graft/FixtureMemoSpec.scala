package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{FixtureMemo, PipelineQueries}

/** Gates for the per-process trained-fixture memo (the r16-verdict
  * "separate train cost from serve cost" item): replays must be
  * bit-identical, must not recompute, and must rebuild as a
  * LocalRelation so repeat bench iterations time the serving
  * composition, not fixture training. */
class FixtureMemoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("table: second construction replays without recompute, values identical") {
    val calls = new AtomicInteger(0)
    def build() = FixtureMemo.table(spark, "spec:memo-table") {
      calls.incrementAndGet()
      spark.range(0, 8).select(col("id"),
        expr("transform(sequence(0, 3), i -> CAST(id * 10 + i AS FLOAT))").as("cv"))
    }
    val first = build().collect().map(_.toString).sorted
    val second = build().collect().map(_.toString).sorted
    assert(calls.get() == 1, "memoized table must compute exactly once")
    assert(first.sameElements(second), "replay must be value-identical")
    // the replay is a LocalRelation — no recompute lives in the plan
    val plan = build().queryExecution.executedPlan.toString()
    assert(plan.contains("LocalTableScan"),
      s"memo replay should plan as a local relation:\n$plan")
  }

  test("model: computes once per key, distinct keys stay isolated") {
    val calls = new AtomicInteger(0)
    def get(key: String) = FixtureMemo.model(s"spec:memo-model:$key") {
      calls.incrementAndGet()
      Seq(Seq(Seq(1L, 2L)), Seq(Seq(3L, 4L)))
    }
    val a1 = get("a"); val a2 = get("a"); val b = get("b")
    assert(calls.get() == 2, "one compute per distinct key")
    assert(a1 == a2 && a1 == b)
  }

  test("knn_serving_recall: memoized replay returns the identical result set") {
    // first call trains (populating the memo), second replays the
    // fixtures from the memo — the gate the whole design rests on:
    // training-in-memo is semantically invisible to the oracle rows
    val first = PipelineQueries.knn_serving_recall(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val second = PipelineQueries.knn_serving_recall(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(first.nonEmpty)
    assert(first == second,
      "memoized fixture replay changed a serving row's output")
  }
}
