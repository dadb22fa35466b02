package graft.exprs

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Size-capped distinct-set aggregate: collects up to `cap` distinct
  * non-null strings; once more than `cap` are seen the buffer saturates at
  * `cap + 1` elements, which the caller reads as "too many — no dictionary".
  *
  * This is the one-pass, bounded-memory alternative to
  * `approx_count_distinct` probe + second `collect_set` scan for building
  * split dictionaries: `collect_set` alone is unbounded (a high-cardinality
  * field would buffer every distinct value on the executors), while this
  * aggregator's state never exceeds cap+1 strings regardless of input.
  * Which elements survive past saturation is irrelevant — saturated results
  * are discarded — so the early-out keeps determinism where it matters.
  */
final class BoundedSetAgg(cap: Int)
    extends Aggregator[String, Seq[String], Seq[String]] {

  override def zero: Seq[String] = Vector.empty

  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null || b.length > cap || b.contains(a)) b else b :+ a

  override def merge(x: Seq[String], y: Seq[String]): Seq[String] = {
    var out = x
    val it = y.iterator
    while (it.hasNext && out.length <= cap) {
      val v = it.next()
      if (!out.contains(v)) out = out :+ v
    }
    out
  }

  override def finish(r: Seq[String]): Seq[String] =
    if (r.length > cap) r else r.sorted

  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object BoundedSetAgg {
  /** Column form: `bounded_set(col, cap)`. */
  def boundedSet(c: Column, cap: Int): Column =
    udaf(new BoundedSetAgg(cap)).apply(c)
}
