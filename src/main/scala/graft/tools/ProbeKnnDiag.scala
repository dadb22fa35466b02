package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Ann, Hashing}

/** Seed-hygiene diagnostic: recall of Ann.ivf under different centroid
  * training recipes, isolating why the serving tier's recall lagged the
  * registry's knn_recall_scaled on identical data.
  *
  * Measured (sf0.1, nlist=45, nprobe=7, 2026-08-14 run):
  *  - A  (seed vid < 45 — CONTAINS the 20 evaluation queries): 0.94
  *  - A2 (seed vid in [100, 145) — query-disjoint):            0.55
  *  - B  (seed = 45 smallest content hashes, 4 iters):         0.54
  * The 0.94 the gate used to report was seed contamination: each
  * evaluation query's neighborhood got a dedicated centroid. Every
  * query-disjoint recipe — regardless of seed choice or iteration
  * count — lands at 0.55±0.01. knn_recall_scaled's seed is now
  * query-disjoint (vid ≥ 20) and reports 0.49/0.50 at sf0.01/sf0.1:
  * flat across the 10×, which is the √n-sizing claim that actually
  * survives; absolute recall is nProbe's knob (ProbeKnn: 0.82 at
  * 2·√nlist). Kept as the permanent record of the bias and its fix. */
object ProbeKnnDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("vid"),
        expr("transform(embedding, x -> CAST(x AS FLOAT))").as("v"))
      .localCheckpoint()
    val n = e.count()
    val nlist = math.ceil(math.sqrt(n.toDouble)).toInt
    val nProbe = math.ceil(math.sqrt(nlist.toDouble)).toInt
    val queries = e.where(col("vid") < 20)
      .select(col("vid").as("qid"), col("v").as("qv"))
    val exact = Ann.brute(queries, e.select(col("vid"), col("v")), k = 5)
      .select(col("qid"), col("neighbor")).localCheckpoint()

    def recall(cents: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val approx = Ann.ivf(queries, e.select(col("vid"), col("v")),
        cents, nProbe = nProbe, k = 5).select(col("qid"), col("neighbor"))
      val hits = exact.join(approx, Seq("qid", "neighbor")).count()
      println(f"[diag] $tag%-28s recall@5 = ${hits.toDouble / 100.0}%.2f")
    }

    // recipe A: registry — seed first nlist by vid, 3 iterations
    val seedA = e.where(col("vid") < nlist)
      .select(col("vid").as("cid"), col("v").as("cv"))
    val ca = Ann.kmeansTrain(e.select(col("vid"), col("v")), seedA, 3)
      .where(col("iter") === 3)
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("d"), col("cq")))).as("ds"))
      .select(col("cell").as("cid"),
        expr("transform(ds, x -> CAST(CAST(x.cq AS DOUBLE) / 1000000.0 AS FLOAT))").as("cv"))
    recall(ca, s"A: vid-seed, 3 iters")

    // recipe A2: vid-seed DISJOINT from the evaluation queries — does
    // A's number survive when the queries didn't seed the quantizer?
    val seedA2 = e.where(col("vid") >= 100 && col("vid") < 100 + nlist)
      .select(col("vid").as("cid"), col("v").as("cv"))
    val ca2 = Ann.kmeansTrain(e.select(col("vid"), col("v")), seedA2, 3)
      .where(col("iter") === 3)
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("d"), col("cq")))).as("ds"))
      .select(col("cell").as("cid"),
        expr("transform(ds, x -> CAST(CAST(x.cq AS DOUBLE) / 1000000.0 AS FLOAT))").as("cv"))
    recall(ca2, s"A2: vid 100+ seed, 3 iters")

    // recipe B: serving — seed nlist smallest content hashes, 4 iterations
    val vecsB = e.select(Hashing.h64(to_json(col("v"))).as("vid"), col("v"))
    val seedB = vecsB.dropDuplicates("vid").orderBy(col("vid")).limit(nlist)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("vid"))).cast("long").as("cid"), col("v").as("cv"))
    val cb = Ann.kmeansTrain(vecsB, seedB, 4)
      .where(col("iter") === 4)
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("d"), col("cq")))).as("ds"))
      .select(col("cell").as("cid"),
        expr("transform(ds, x -> CAST(CAST(x.cq AS DOUBLE) / 1000000.0 AS FLOAT))").as("cv"))
    recall(cb, s"B: hash-seed, 4 iters")
    spark.stop()
  }
}
