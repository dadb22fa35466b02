package graft.tools

import breeze.linalg.{svd, DenseMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Ann

/** OPQ rotation probe (r17 verdict #5): does a learned orthogonal
  * rotation of the residual space (Ge et al. 2013 — alternating PQ
  * retrain / Procrustes solve) lift the IVFADC serving recall enough
  * to ship into `train --pq`?
  *
  * Method: learn R driver-side on the residual sample (alternate:
  * rotate → train small PQ → reconstruct → R = V·Uᵀ from the SVD of
  * Σ xᵢ x̂ᵢᵀ), then measure through the UNCHANGED engine path by
  * rotating both the corpus and the trained centroids — cosine and L2
  * are rotation-invariant, so coarse assignment, truth, and probe sets
  * are identical and [[Ann.ivfPqServing]] on the rotated inputs IS
  * residual-OPQ serving. Grid: the registry row's probe budget
  * (3·⌈√nlist⌉) and one step up, at the engine's default shortlist
  * (rFetch=64 at k=5) and the roomy 256.
  *
  * Ship bar (the verdict's): ≥ 0.97 recall@5 at sf0.1 with flat serve
  * cost; note ProbeResidual already measured the row PROBE-bound at
  * its budget (shortlist at its exact ceiling), so the honest prior is
  * "OPQ buys nothing at the operating point — its headroom is the
  * code-side gap, which residual codes already closed to ≤ 0.01-0.02".
  *
  * Measured 2026-08-16 (sf0.1: n=2000, nlist=45, spill=2, m=4, k=5;
  * OPQ quantization MSE 0.382 → 0.370 over 4 alternations, ~3% lower):
  *   nprobe=21 rerank=64    residual 0.770   +OPQ 0.760
  *   nprobe=21 rerank=256   residual 0.960   +OPQ 0.900
  *   nprobe=28 rerank=64    residual 0.760   +OPQ 0.750
  *   nprobe=28 rerank=256   residual 0.980   +OPQ 0.930
  * Wall per variant within noise. Conclusion: NOT shipped — the
  * rotation LOWERS reconstruction error yet measurably HURTS served
  * recall at every grid point (−0.01 to −0.05): on these per-dim
  * structured synthetic embeddings the natural subspaces already align
  * with the signal, and mixing dims trades top-of-list ADC ordering
  * (what the shortlist cut keys on) for average-case MSE (what OPQ
  * optimizes). MSE is the wrong proxy here; do not revisit without a
  * corpus whose residual codes show a genuine code-side recall gap.
  * Secondary finding worth keeping: the rerank=64 column (the engine's
  * DEFAULT rFetch at k=5) sits 0.19-0.22 below rerank=256 on BOTH
  * variants at these nprobes — default-shortlist pressure, exactly the
  * loss the r18 served-recall calibration arm now exposes to
  * `--target-recall` (the gated serving row already runs rerank=256). */
object ProbeOpq {

  /** y = R·x for each row (driver-side — probe scale only). */
  private def rotate(rows: Array[(Long, Array[Double])],
      r: DenseMatrix[Double]): Array[(Long, Array[Float])] =
    rows.map { case (id, x) =>
      val d = x.length
      val y = new Array[Float](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += r(i, j) * x(j); j += 1 }
        y(i) = acc.toFloat
        i += 1
      }
      (id, y)
    }

  /** Tiny driver-side PQ trainer (m subspaces, Lloyd on doubles) used
    * only to LEARN the rotation; the measured codebooks retrain through
    * the engine's [[Ann.pqCodebooksTrained]] in the rotated space. */
  private def pqRecon(xs: Array[Array[Double]], m: Int, codewords: Int,
      iters: Int): Array[Array[Double]] = {
    val dim = xs.head.length
    val sub = dim / m
    val recon = Array.fill(xs.length)(new Array[Double](dim))
    for (s <- 0 until m) {
      val lo = s * sub
      val pts = xs.map(_.slice(lo, lo + sub))
      var cents = pts.distinct.take(codewords)
      var assign = new Array[Int](pts.length)
      for (_ <- 1 to iters) {
        var i = 0
        while (i < pts.length) {
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d2 = 0.0; var j = 0
            while (j < sub) {
              val t = pts(i)(j) - cents(c)(j); d2 += t * t; j += 1 }
            if (d2 < bd) { bd = d2; best = c }
            c += 1
          }
          assign(i) = best
          i += 1
        }
        cents = cents.indices.map { c =>
          val mine = pts.indices.filter(assign(_) == c)
          if (mine.isEmpty) cents(c)
          else {
            val acc = new Array[Double](sub)
            mine.foreach { i =>
              var j = 0; while (j < sub) { acc(j) += pts(i)(j); j += 1 } }
            acc.map(_ / mine.length)
          }
        }.toArray
      }
      var i = 0
      while (i < pts.length) {
        System.arraycopy(cents(assign(i)), 0, recon(i), lo, sub)
        i += 1
      }
    }
    recon
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> CAST(x AS FLOAT))").as("v"))
      .localCheckpoint()
    val n = e.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toLong
    println(s"[probe] n=$n nlist=$nlist")

    val init = e.where(col("vid") >= 20L && col("vid") < 20L + nlist)
      .select(col("vid").as("cid"), col("v").as("cv"))
    val rounds = Ann.kmeansTrain(e.select(col("vid"), col("v")), init, 3)
    val cents = rounds.where(col("iter") === 3)
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("d"), col("cq")))).as("ds"))
      .select(col("cell").as("cid"),
        expr("transform(ds, x -> CAST(CAST(x.cq AS DOUBLE) / 1000000.0 AS FLOAT))")
          .as("cv"))
      .localCheckpoint()

    // ---- learn R on the residual sample (driver-side, probe scale) ----
    val resRows = Ann.residuals(e, cents)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray))
    val xs = resRows.map(_._2)
    val dim = xs.head.length
    var rot = DenseMatrix.eye[Double](dim)
    for (it <- 1 to 4) {
      val ys = xs.map { x =>
        val y = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var acc = 0.0; var j = 0
          while (j < dim) { acc += rot(i, j) * x(j); j += 1 }
          y(i) = acc; i += 1
        }
        y
      }
      val recon = pqRecon(ys, m = 4, codewords = 256, iters = 3)
      // Procrustes: maximize tr(R · Σ x x̂ᵀ) → R = V·Uᵀ of its SVD
      val mAcc = DenseMatrix.zeros[Double](dim, dim)
      xs.indices.foreach { i =>
        var a = 0
        while (a < dim) {
          var b = 0
          while (b < dim) { mAcc(a, b) += xs(i)(a) * recon(i)(b); b += 1 }
          a += 1
        }
      }
      val s = svd(mAcc)
      rot = (s.U * s.Vt).t // = V·Uᵀ
      val err = xs.indices.map { i =>
        var d2 = 0.0; var j = 0
        val y = recon(i)
        while (j < dim) {
          var acc = 0.0; var k2 = 0
          while (k2 < dim) { acc += rot(j, k2) * xs(i)(k2); k2 += 1 }
          val t = acc - y(j); d2 += t * t; j += 1
        }
        d2
      }.sum
      println(f"[probe] opq iter $it quantization error ${err / xs.length}%.6f")
    }

    // ---- measure through the unchanged engine path ----
    val eRot = spark.sparkContext
      .parallelize(rotate(e.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)), rot)
        .toSeq)
      .toDF("vid", "v").localCheckpoint()
    val centsRot = spark.sparkContext
      .parallelize(rotate(cents.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)), rot)
        .toSeq)
      .toDF("cid", "cv").localCheckpoint()

    def truthOf(corpus: DataFrame): DataFrame = Ann.brute(
      corpus.where(col("vid") < 20)
        .select(col("vid").as("qid"), col("v").as("qv")),
      corpus, k = 5).select(col("qid"), col("neighbor")).localCheckpoint()
    val truthRaw = truthOf(e)
    val truthRot = truthOf(eRot)

    def run(label: String, truth: DataFrame)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val approx = f.select(col("qid"), col("neighbor"))
      val r = truth.join(approx, Seq("qid", "neighbor")).count()
        .toDouble / truth.count()
      println(f"[probe] $label%-44s recall=$r%.3f  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val rcb = Ann.pqCodebooksTrained(Ann.residuals(e, cents), 4,
      seedLo = 20L, codewords = 256, iterations = 2)
    val rcbRot = Ann.pqCodebooksTrained(Ann.residuals(eRot, centsRot), 4,
      seedLo = 20L, codewords = 256, iterations = 2)

    val rowNp = 3 * math.ceil(math.sqrt(nlist.toDouble)).toInt
    for (np <- Seq(rowNp, rowNp * 4 / 3); rr <- Seq(64, 256)) {
      run(s"residual     nprobe=$np rerank=$rr", truthRaw)(
        Ann.ivfPqServing(e, _ < 20, cents, np, 2, 4, rr, 5,
          Some(rcb), residual = true))
      run(s"residual+OPQ nprobe=$np rerank=$rr", truthRot)(
        Ann.ivfPqServing(eRot, _ < 20, centsRot, np, 2, 4, rr, 5,
          Some(rcbRot), residual = true))
    }
    spark.stop()
  }
}
