package graft.tools

/** Dev scratchpad for pinning down Spark behaviors empirically.
  * Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(4, "scratch")
    graft.functions.GraftFunctions.register(spark)
    spark.sql(
      """SELECT ip_display(ip_canonical('::ffff:10.0.0.1')) AS ip,
        |       porter_stem('nationalization') AS stem,
        |       cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                         array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS cos,
        |       expand_dots_json('{"a.b": 1}') AS ed
        |""".stripMargin).show(false)
    spark.stop()
  }
}
