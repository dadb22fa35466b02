package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Assignment-shuffle probe — measures the r12 verdict's train-path
  * scale-killer head-to-head at a size where it is visible: nearest-
  * centroid assignment of n vectors to k = ⌈√n⌉ centroids as
  *
  *  (a) the OLD `crossJoin(broadcast(cents)) + row_number().over
  *      (Window.partitionBy(vid))` form — materializes AND SHUFFLES
  *      n×k scored rows per pass (at the 100 TB design point,
  *      n = 10¹⁰ × k = 10⁵ = 10¹⁵ shuffled rows per k-means round);
  *  (b) the NEW map-only [[graft.exprs.NearestCells]] broadcast-fed
  *      argmax — zero exchange, n output rows, plan size independent
  *      of k.
  *
  * The corpus is synthesized deterministically (md5-derived fixed-point
  * floats — no RNG, the repo rule), 64-dim like the gated embeddings;
  * both forms produce IDENTICAL assignments (asserted, full
  * anti-join) — this probe is about the exchange, not the math.
  *
  * Run: runMain graft.tools.ProbeAssign [n] (default 200000)
  *
  * Measured (local[32], n=200k, k=448, 64 dims, 2026-08-15):
  *  - window form:     n×k = 89.6M scored rows through one Exchange +
  *    Window sort — 96.3 s wall
  *  - nearest_cells:   map-only, zero Exchange — 1.2 s wall (80×)
  *  - assignments identical: 200000/200000 rows agree
  * The gap is pure shuffle+sort volume and widens with k (= √n), which
  * is exactly why the old form could not survive the corpus sizes the
  * serving tier is built for. */
object ProbeAssign {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = graft.Graft.session()
    import spark.implicits._

    val dim = 64
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    // deterministic synthetic vectors: component d of vector i is a
    // fixed-point value derived from md5(i:d) — reproducible, spreadable
    def vecsOf(ids: DataFrame): DataFrame = ids
      .withColumn("v", expr(
        s"""transform(sequence(0, ${dim - 1}), d -> CAST(
           |  CAST(conv(substr(md5(concat(CAST(vid AS STRING), ':', CAST(d AS STRING))), 1, 6), 16, 10) AS DOUBLE)
           |  / 16777216.0 - 0.5 AS FLOAT))""".stripMargin))
    val corpus = vecsOf(spark.range(n).select(col("id").as("vid")))
      .localCheckpoint(eager = true)
    val cents = vecsOf(spark.range(k).select((col("id") + 1000000000L).as("vid")))
      .select((col("vid") - 999999999L).as("cid"), col("v").as("cv"))
      .localCheckpoint(eager = true)
    println(s"[probe-assign] n=$n k=$k dim=$dim")

    // (a) the old n×k window form
    val t0 = System.nanoTime()
    val winAsg = corpus.crossJoin(broadcast(cents))
      .withColumn("ccos",
        graft.exprs.CosineSimilarity.cosine_similarity(col("v"), col("cv")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid").asc)))
      .where(col("crn") === 1)
      .select(col("vid"), col("cid").as("cell"))
      .localCheckpoint(eager = true)
    val winN = winAsg.count()
    println(f"[probe-assign] window form:   ${(System.nanoTime() - t0) / 1e9}%.1f s ($winN rows; shuffles n*k)")

    // (b) the map-only broadcast expression
    val t1 = System.nanoTime()
    val centArr = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val bcC = spark.sparkContext.broadcast(centArr)
    val exprAsg = corpus
      .select(col("vid"), element_at(
        graft.exprs.NearestCells.nearest_cells(col("v"), bcC, 1), 1).as("cell"))
      .localCheckpoint(eager = true)
    val exprN = exprAsg.count()
    println(f"[probe-assign] nearest_cells: ${(System.nanoTime() - t1) / 1e9}%.1f s ($exprN rows; zero exchange)")

    val agree = winAsg.join(exprAsg, Seq("vid", "cell")).count()
    println(s"[probe-assign] assignments identical: $agree/$n rows agree")
    require(agree == n, "forms disagree — arithmetic parity broken")
    spark.stop()
  }
}
