package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training — the fourth oracle-replayed
  * training loop next to [[Bpe.train]], [[Ann.kmeansTrain]] and
  * [[Unigram.train]], and the trainer behind fastText-style quality
  * classification (CCNet / LLaMA-data: label a corpus with a cheap weak
  * rule, fit a linear model to it, keep what the model scores as
  * target-like). Full-batch gradient descent over integer features:
  *
  *   z_i  = (w · x_i) / 10⁶            (w fixed-point 10⁻⁶ units — the
  *                                      dot product is EXACT integer
  *                                      arithmetic, /10⁶ one exact
  *                                      double op)
  *   p_i  = ⌊10⁶ / (1 + e^(−z_i))⌋     (the ONE float chain per row,
  *                                      quantized immediately — the
  *                                      [[LangModel]] discipline, so the
  *                                      gradient sum is an exact integer
  *                                      sum no matter the row order)
  *   g_j  = Σ_i (p_i − 10⁶·y_i) · x_ij (exact, summed as DECIMAL(38,0)
  *                                      so the 100 TB design point can't
  *                                      wrap Int64 — the Mixture fix)
  *   w_j ← w_j − g_j DIV (n · lrDen)   (truncating integer division,
  *                                      Spark DIV ≡ DuckDB //)
  *
  * Scale shape: each iteration is ONE corpus aggregate returning
  * (numFeatures + 1) scalars to the driver — the [[Ann.kmeansStep]]
  * shape; the weight vector is a model artifact riding the next
  * iteration's plan as literals. Callers checkpoint the feature table
  * once; iterations never re-derive features.
  */
object LogReg {

  /** Train on `feats` with columns x0..x{k-1} (integer features, x0
    * conventionally the bias 1) and y ∈ {0, 1}. Returns one row per
    * iteration: (iter, w0..w{k-1}) — the weights AFTER that iteration's
    * update, in 10⁻⁶ units. */
  def train(feats: DataFrame, numFeatures: Int, lrDen: Long,
      iterations: Int): DataFrame = {
    require(numFeatures >= 1, s"numFeatures must be >= 1, got $numFeatures")
    require(lrDen > 0, s"lrDen must be positive, got $lrDen")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sp = feats.sparkSession
    val xs = (0 until numFeatures).map(j => s"x$j")
    var w = Array.fill(numFeatures)(0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    for (r <- 1 to iterations) {
      val pq = probQ(w, xs.map(col))
      val aggs = xs.map(x =>
        sum(((col("__pq") - col("y") * 1000000L) * col(x))
          .cast("decimal(38,0)")).as(s"g_$x")) :+ count(lit(1)).as("n")
      val row = feats.withColumn("__pq", pq).agg(aggs.head, aggs.tail: _*)
        .collect()(0)
      val n = row.getAs[Long]("n")
      require(n > 0, "cannot train on an empty feature table")
      for (j <- 0 until numFeatures) {
        val g = row.getAs[java.math.BigDecimal](s"g_x$j").longValueExact()
        w(j) = w(j) - g / (n * lrDen) // Long./ truncates ≡ Spark DIV ≡ DuckDB //
      }
      out += (r.toLong +: w.toSeq)
    }
    sp.createDataFrame(
      sp.sparkContext.parallelize(out.toSeq.map(vs =>
        org.apache.spark.sql.Row.fromSeq(vs)), 1),
      org.apache.spark.sql.types.StructType(
        ("iter" +: xs.map("w_" + _)).map(nm =>
          org.apache.spark.sql.types.StructField(nm,
            org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The quantized sigmoid under fixed-point weights `w` over feature
    * columns `xs`: `⌊10⁶ / (1 + e^(−(w·x)/10⁶))⌋` — shared by training
    * iterations and [[score]] so the two cannot drift. */
  def probQ(w: Seq[Long], xs: Seq[Column]): Column = {
    val dot = w.zip(xs).map { case (wj, x) => lit(wj) * x }.reduce(_ + _)
    floor(lit(1000000.0) /
      (lit(1.0) + exp(-(dot.cast("double") / lit(1000000.0))))).cast("long")
  }

  /** Inference: (id carried through, p_q, keep = p_q >= 500000). */
  def score(feats: DataFrame, w: Seq[Long], numFeatures: Int): DataFrame = {
    val xs = (0 until numFeatures).map(j => col(s"x$j"))
    feats.withColumn("p_q", probQ(w, xs))
      .withColumn("keep", col("p_q") >= 500000L)
  }
}
