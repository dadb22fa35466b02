package graft.functions

import org.apache.spark.sql.SparkSession

import graft.exprs._

/** SQL-surface registration: the engine's custom expressions as session
  * functions, so `spark.sql` users get the same capabilities as the
  * DataFrame API (the reference has no user-facing function surface at
  * all — SURVEY §2.5 — this is part of the north-star extension).
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT ip_display(ip_canonical('::ffff:10.0.0.1'))")
  * spark.sql("SELECT porter_stem('running'), cosine_similarity(a, b) FROM t")
  * }}}
  */
object GraftFunctions {
  /** Same function list as [[graft.GraftExtensions]]; this path registers
    * temp functions on one existing session, the extension injects at
    * session build. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
