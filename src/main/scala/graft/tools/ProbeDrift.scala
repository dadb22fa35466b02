package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.ops.Ann

/** Centroid-drift probe — what a frozen quantizer costs when refreshed
  * data shifts distribution, measured two ways on three fixtures:
  *
  *  - RECALL of fresh-cohort queries, frozen vs retrained centroids
  *    (IVF, census sizing, √nlist probes);
  *  - FIT: mean nearest-centroid cosine in ppm (integer —
  *    sum(floor(cos·10⁶)) div n), the quantization-fit statistic the
  *    `--ann-retrain-threshold` streaming policy triggers on.
  *
  * Fixtures: (a) label-biased halves of the embeddings (train on
  * labels 0–4, refresh 5–9 — unseen clusters); (b) dimension-REVERSED
  * refresh cohort (cluster structure permuted); (c) no shift (control).
  *
  * Measured (sf0.01, 2026-08-15, query-disjoint seeds — the numbers
  * that shaped the r16 drift gate; an earlier cut seeded the retrained
  * arm WITH the query vectors and faked a 0.84 "recovery", the
  * ProbeKnnDiag contamination class):
  *  - recall at this size is INSENSITIVE to frozen centroids
  *    (shifted-cohort members keep assigning CONSISTENTLY — a whole
  *    unseen cluster lands in one legacy cell, so its queries still
  *    find it): label-shift frozen 0.51 vs retrained 0.55, reversed
  *    0.51 vs 0.50, control 0.52 vs 0.59 — all within the flap.
  *    Recall drift appears only once the cell cut bites
  *    (knn_refresh_drift at sf0.1: 0.42 frozen vs 0.53 retrained).
  *  - in-sample vs out-of-sample FIT dominates everything: the
  *    train-half fit reads ~190k ppm ABOVE any fresh cohort's — shift
  *    or no shift (label-shift 428k/235k, control 427k/239k) — so a
  *    trigger anchored on the TRAIN-time fit would false-fire on
  *    every stream. Out-of-sample batch fits are mutually stable
  *    (235k vs 239k), hence the policy anchors on the FIRST refresh
  *    batch. On this near-isotropic corpus neither fit nor cell-skew
  *    separates the shifted cohort from control at sf0.01; at sf0.1
  *    the reversed cohort reads a real 76k-ppm drop (pipe_ann_drift,
  *    oracle-gated), and on genuinely clustered data the signal is
  *    decisive (StatefulStreamingSpec's planted-cluster gate).
  *
  * Run: runMain graft.tools.ProbeDrift [sfDir]
  */
object ProbeDrift {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> CAST(x AS FLOAT))").as("v"),
        col("label"))

    def cents(corpusDf: DataFrame, seeds: DataFrame) =
      Ann.kmeansTrain(corpusDf.select(col("vid"), col("v")), seeds, 3)
        .where(col("iter") === 3)
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("d"), col("cq")))).as("ds"))
        .select(col("cell").as("cid"),
          expr("transform(ds, x -> CAST(CAST(x.cq AS DOUBLE) / 1000000.0 AS FLOAT))")
            .as("cv"))

    def fitPpm(rows: DataFrame, c: DataFrame): Long =
      Ann.assignFit(rows.select(col("vid"), col("v")), c)
        .select(col("fit_ppm")).head().getLong(0)

    def recall(qs: DataFrame, corpus: DataFrame, c: DataFrame,
        nProbe: Int): Double = {
      val approx = Ann.ivf(qs, corpus.select(col("vid"), col("v")), c,
        nProbe, 5).select(col("qid"), col("neighbor"))
      val exact = Ann.brute(qs, corpus.select(col("vid"), col("v")), 5)
        .select(col("qid"), col("neighbor"))
      exact.join(approx, Seq("qid", "neighbor")).count().toDouble /
        (qs.count().toDouble * 5.0)
    }

    val n = base.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toLong
    val nProbe = math.ceil(math.sqrt(nlist.toDouble)).toInt
    println(s"[probe-drift] n=$n nlist=$nlist nprobe=$nProbe")

    def arm(tag: String, trainHalf: DataFrame, refreshHalf: DataFrame): Unit = {
      val union = trainHalf.unionAll(refreshHalf)
      // queries FIRST, then seeds strictly disjoint from them (the
      // ProbeKnnDiag seed-contamination hygiene: a query vector seeding
      // a centroid centers a cell on itself and fakes recall)
      val qs = refreshHalf.orderBy(col("vid")).limit(20)
        .select(col("vid").as("qid"), col("v").as("qv"))
      val qids = qs.select(col("qid")).collect().map(_.getLong(0)).toSet
      def seedsOf(df: DataFrame) = df
        .where(!col("vid").isin(qids.toSeq: _*))
        .orderBy(col("vid")).limit(nlist.toInt)
        .select(col("vid").as("cid"), col("v").as("cv"))
      val frozen = cents(trainHalf, seedsOf(trainHalf))
      val retrained = cents(union, seedsOf(union))
      println(f"[probe-drift] $tag%-12s fit(train-half)=${fitPpm(trainHalf, frozen)}%d " +
        f"fit(refresh-half)=${fitPpm(refreshHalf, frozen)}%d " +
        f"fit(refresh-half, retrained)=${fitPpm(refreshHalf, retrained)}%d")
      def skewPpm(rows: DataFrame, c: DataFrame): (Long, Long) = {
        val r = Ann.assignSkew(rows.select(col("vid"), col("v")), c)
          .select(col("top_share_ppm"), col("occupied")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (st, ot) = skewPpm(trainHalf, frozen)
      val (sr, or_) = skewPpm(refreshHalf, frozen)
      println(f"[probe-drift] $tag%-12s skew(train-half)=$st%d ppm/$ot%d cells " +
        f"skew(refresh-half)=$sr%d ppm/${or_}%d cells")
      println(f"[probe-drift] $tag%-12s recall frozen=${recall(qs, union, frozen, nProbe)}%.2f " +
        f"retrained=${recall(qs, union, retrained, nProbe)}%.2f")
    }

    arm("label-shift", base.where(col("label") < 5), base.where(col("label") >= 5))
    arm("reversed", base,
      base.select((col("vid") + lit(100000L)).as("vid"),
        reverse(col("v")).as("v"), col("label")))
    val (lo, hi) = (base.where(col("vid") % 2 === 0), base.where(col("vid") % 2 === 1))
    arm("control", lo, hi)
  }
}
