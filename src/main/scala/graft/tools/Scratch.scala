package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenizeDefault

/** Dev scratchpad for pinning down Spark behaviors empirically.
  * Not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(32, "scratch")
    val dir = "/root/testdata/sf0.1"

    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Graft.table(spark, dir, "documents")
    docs.count()

    val n = 5
    val sh = docs.withColumn("toks", tokenizeDefault(col("text")))
      .where(size(col("toks")) >= n)
      .withColumn("shingles", array_distinct(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ",
            (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))))

    timeIt("A: sum(size(shingles))")(sh.select(sum(size(col("shingles")))).collect())
    timeIt("B: explode alone, count")(
      sh.select(explode(col("shingles")).as("s")).count())
    timeIt("C: doc_id + explode, count")(
      sh.select(col("doc_id"), explode(col("shingles")).as("s")).count())
    timeIt("D: nsh-in-same-select + explode, count")(
      sh.select(col("doc_id"), size(col("shingles")).as("nsh"),
        explode(col("shingles")).as("s")).count())
    timeIt("E: nsh prior select + explode, count")(
      sh.select(col("doc_id"), size(col("shingles")).as("nsh"), col("shingles"))
        .select(col("doc_id"), col("nsh"), explode(col("shingles")).as("s")).count())

    val shP = sh.select(col("doc_id"), size(col("shingles")).as("nsh"), col("shingles"))
      .persist()
    timeIt("F: persist materialize")(shP.count())
    timeIt("G: explode from persisted")(
      shP.select(col("doc_id"), col("nsh"), explode(col("shingles")).as("s")).count())

    spark.stop()
  }
}
