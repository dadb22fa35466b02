package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad for pinning down Spark behaviors empirically.
  * Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(4, "scratch")

    println("== nanosAsLong runtime set ==")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.select(col("ts"),
        timestamp_micros((col("ts") / 1000L).cast("long")).cast("timestamp_ntz").as("tsu"),
        date_format(timestamp_micros((col("ts") / 1000L).cast("long")), "yyyy-MM-dd HH:mm:ss").as("s"))
        .show(3, false)
    } catch { case e: Throwable => println("FAIL: " + e.getMessage.take(300)) }

    spark.stop()
  }
}
