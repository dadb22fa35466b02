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
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("ip_canonical",
      exprs => IpCanonicalize(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("ip_display",
      exprs => IpDisplay(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("porter_stem",
      exprs => PorterStem(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("expand_dots_json",
      exprs => ExpandDotsJson(exprs.head), "scala_udf")
  }
}
