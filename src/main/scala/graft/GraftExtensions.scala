package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.exprs._

/** Library entry point for `spark.sql.extensions` — the idiomatic way a
  * Spark library installs itself cluster-wide without any driver-side
  * code:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Unlike [[graft.functions.GraftFunctions.register]] (temp functions on
  * one session), injected functions are part of the session builder, so
  * every session and `newSession()` fork sees them. The function list is
  * shared between both paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), builder))
    }
}

object GraftExtensions {
  /** (name, usage, builder) for every engine expression with a SQL face. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ip_canonical", "ip_canonical(str) - canonical 16-byte IP (v4 mapped into v6)",
      exprs => IpCanonicalize(exprs.head)),
    ("ip_display", "ip_display(bin) - display form of a canonical IP",
      exprs => IpDisplay(exprs.head)),
    ("porter_stem", "porter_stem(str) - Porter-stemmed token",
      exprs => PorterStem(exprs.head)),
    ("cosine_similarity", "cosine_similarity(a, b) - cosine of two float arrays",
      exprs => CosineSimilarity(exprs(0), exprs(1))),
    ("expand_dots_json", "expand_dots_json(str) - expand dotted keys to nested JSON",
      exprs => ExpandDotsJson(exprs.head))
  )
}
