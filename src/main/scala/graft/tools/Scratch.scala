package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad for pinning down Spark behaviors empirically.
  * Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(4, "scratch")
    import spark.implicits._

    val js = Seq(
      """{"s":"INFO","n":58,"b":true,"o":{"x":"y"},"arr":[1,2],"f":-25.52,"bs":"FaLsE","q":"he said \"hi\""}"""
    ).toDF("value")

    val schema = "s string, n string, b string, o string, arr array<string>, f string, bs string, q string"
    println("== from_json with string leaves ==")
    js.select(from_json($"value", org.apache.spark.sql.types.StructType.fromDDL(schema)).as("r"))
      .select($"r.*").show(false)

    println("== variant ==")
    try {
      js.select(
        to_json(try_variant_get(parse_json($"value"), "$.s", "variant")).as("vs"),
        to_json(try_variant_get(parse_json($"value"), "$.o", "variant")).as("vo"),
        to_json(try_variant_get(parse_json($"value"), "$.n", "variant")).as("vn"),
        to_json(try_variant_get(parse_json($"value"), "$.missing", "variant")).as("vmiss"),
        schema_of_variant(try_variant_get(parse_json($"value"), "$.n", "variant")).as("sn")
      ).show(false)
    } catch { case e: Throwable => println("variant failed: " + e) }

    println("== cast string to long semantics ==")
    Seq(("-25.52"), ("100"), ("abc"), ("1e3")).toDF("x")
      .select($"x", $"x".cast("bigint").as("asLong"), $"x".cast("double").as("asDouble"))
      .show(false)

    println("== get_json_object on object ==")
    js.select(get_json_object($"value", "$.o").as("o"), get_json_object($"value", "$.s").as("s")).show(false)

    spark.stop()
  }
}
