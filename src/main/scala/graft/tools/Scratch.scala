package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Ad-hoc profiling/plan-inspection main — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def h64(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenizeDefault(col("text")).as("toks")).persist()
    toks.count()

    // warmup
    for (_ <- 1 to 2) {
      val th = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), h64(col("tok")).as("th")).agg(count(lit(1)).as("cnt"))
      time("th count")(th.count())
      val bitCols = (0 until 63).map { bit =>
        sum(when(col("th").bitwiseAND(lit(1L << bit)) =!= 0L, col("cnt")).otherwise(-col("cnt"))).as(s"b$bit")
      }
      val sigs = th.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"),
          (0 until 63).map(bit => when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
            .reduce(_.bitwiseOR(_)).as("simhash"))
      time("sigs count")(sigs.count())
      val sigsP = sigs.persist()
      sigsP.count()
      val chunked = sigsP.select(col("doc_id"), col("simhash"),
        explode(array((0 until 9).map { c =>
          struct(lit(c).as("chunk"),
            shiftright(col("simhash"), c * 7).bitwiseAND(lit(0x7fL)).as("val"))
        }: _*)).as("cv"))
        .select(col("doc_id"), col("simhash"), col("cv.chunk"), col("cv.val"))
      val a = chunked.select(col("chunk"), col("val"), col("doc_id").as("a"), col("simhash").as("ha"))
      val b = chunked.select(col("chunk"), col("val"), col("doc_id").as("b"), col("simhash").as("hb"))
      val pairs = a.join(b, Seq("chunk", "val")).where(col("a") < col("b"))
        .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
        .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .where(col("dist") <= 8)
      time("pairs count")(pairs.count())
      sigsP.unpersist()
    }
    spark.stop()
  }
}
