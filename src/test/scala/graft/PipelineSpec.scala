package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.queries.PipelineQueries

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("minhash LSH candidates achieve full recall over exact jaccard pairs") {
    val exact = PipelineQueries.dedup_ngram_jaccard(spark, sf)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = PipelineQueries.dedup_minhash_lsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val missed = exact -- lsh
    assert(missed.isEmpty,
      s"LSH must catch every jaccard>=0.5 pair at 4 bands x 4 rows; missed $missed")
  }

  test("exact dedup keeps one representative per content hash") {
    val kept = PipelineQueries.dedup_exact(spark, sf)
    val total = Graft.table(spark, sf, "documents").count()
    val uniqueTexts = Graft.table(spark, sf, "documents")
      .select(col("text")).distinct().count()
    assert(kept.count() == uniqueTexts)
    assert(kept.agg(sum(col("copies"))).collect()(0).getLong(0) == total)
  }

  test("cell ANN agrees with brute force when the true neighbor shares the cell") {
    val brute = PipelineQueries.knn_brute(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val cell = PipelineQueries.knn_cell(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(cell.nonEmpty)
    // every cell-ANN rank-1 neighbor must be in the brute-force top-5 OF THE
    // SAME CELL by construction; sanity: shapes agree
    assert(cell.groupBy(_._1).forall(_._2.length <= 5))
    assert(brute.groupBy(_._1).forall(_._2.size == 5))
  }

  test("multimodal: stubbed decode runs partition-parallel with stable output") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.withFeatures(media, "payload")
    assert(feats.schema.fieldNames.contains("features"))
    val row = feats.orderBy(col("media_id")).limit(1).collect()(0)
    val f = row.getAs[scala.collection.Seq[Float]]("features")
    assert(f.length == 8)
    assert(f.head > 0) // byte length
    // deterministic: second run identical
    val again = Multimodal.withFeatures(media, "payload")
      .orderBy(col("media_id")).limit(1).collect()(0).getAs[scala.collection.Seq[Float]]("features")
    assert(f == again)
  }

  test("multimodal: frame sampling slices at even offsets") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val frames = Multimodal.sampleFrames(payload, 4, 10)
    assert(frames.length == 4)
    assert(frames(0).toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).head == 25.toByte)
  }

  test("multimodal: resize downsamples the byte grid, pads short payloads") {
    // 4x4 grid 0..15 -> 2x2 nearest-neighbor picks rows/cols 0 and 2
    val grid = Array.tabulate[Byte](16)(_.toByte)
    assert(Multimodal.resizeStub(grid, 4, 4, 2, 2).toSeq ==
      Seq[Byte](0, 2, 8, 10))
    // payload shorter than claimed grid: out-of-range gathers read as 0
    val short = Array.tabulate[Byte](6)(i => (i + 1).toByte)
    assert(Multimodal.resizeStub(short, 4, 4, 2, 2).toSeq ==
      Seq[Byte](1, 3, 0, 0))
    // distributed path appends a binary thumb column
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val thumbs = Multimodal.withThumbnail(media, "payload", 8, 8)
    val t = thumbs.orderBy(col("media_id")).limit(1).collect()(0).getAs[Array[Byte]]("thumb")
    assert(t.length == 64)
  }
}
