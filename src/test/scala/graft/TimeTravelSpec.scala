package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, Indexer, SearchRequest, Searcher}

/** Manifest time travel: every committed generation leaves an advisory
  * archive behind the commit point, and `SearchRequest.asOfGen` serves
  * the index as of that generation — with vacuumed history failing
  * loudly instead of returning partial answers. */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshIndex(): (Catalog, Indexer, Searcher, String) = {
    val root = Files.createTempDirectory("graft-tt").toString
    val cat = new Catalog(root)
    cat.create(new String(Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/example_config.yaml")), "UTF-8"))
    (cat, new Indexer(spark, cat), new Searcher(spark, cat), root)
  }

  /** A second ingest batch in the hdfs-logs shape (the reference ships
    * only one fixture file): 10 docs, distinct tenants. */
  private def secondBatch(dir: String): String = {
    val rows = (0 until 10).map { i =>
      s"""{"timestamp":${1460530100 + i},"severity_text":"INFO","body":"batch two record $i","resource":{"service":"datanode/02"},"attributes":{"class":"c"},"tenant_id":${70 + i}}"""
    }
    val p = java.nio.file.Paths.get(dir, "batch2.json")
    Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("asOfGen serves each ingest generation's split set; unknown gens fail loudly") {
    val (cat, idx, s, root) = freshIndex()
    // gen 1 = the empty create; each batch bumps one generation
    idx.indexFile("test",
      "/root/reference/tests/test_files/hdfs-logs-multitenants-2.json")
    val gen2 = cat.manifestGen("test")
    idx.indexFile("test", secondBatch(root))
    val gen3 = cat.manifestGen("test")
    assert(gen3 == gen2 + 1)
    val now = s.searchDf("test", SearchRequest("*", limit = 1000)).count()
    val at2 = s.searchDf("test",
      SearchRequest("*", limit = 1000, asOfGen = Some(gen2))).count()
    val at1 = s.searchDf("test",
      SearchRequest("*", limit = 1000, asOfGen = Some(1L))).count()
    assert(now == 12, s"current sees both batches: $now")
    assert(at2 == 2, s"gen $gen2 sees only the first batch: $at2")
    assert(at1 == 0, "the create generation is an empty index")
    // identical request against the CURRENT generation = the live answer
    assert(s.searchDf("test",
      SearchRequest("*", limit = 1000, asOfGen = Some(gen3))).count() == now)
    val e = intercept[IllegalArgumentException](
      s.searchDf("test", SearchRequest("*", limit = 10, asOfGen = Some(99L))))
    assert(e.getMessage.contains("no archived manifest"), e.getMessage)
    cat.drop("test")
  }

  test("retain-inputs merge keeps history servable; vacuum expires it explicitly") {
    val (cat, idx, s, root) = freshIndex()
    idx.indexFile("test",
      "/root/reference/tests/test_files/hdfs-logs-multitenants-2.json")
    idx.indexFile("test", secondBatch(root))
    val preMerge = cat.manifestGen("test")
    val preMergeSplits = cat.liveSplits("test").map(_.id)
    assert(idx.merge("test", retainInputs = true).isDefined)
    // the merged split serves the present...
    assert(s.searchDf("test", SearchRequest("*", limit = 1000)).count() == 12)
    // ...AND the pre-merge generation still answers from retained files
    assert(s.searchDf("test",
      SearchRequest("*", limit = 1000, asOfGen = Some(preMerge))).count() == 12)
    assert(s.searchDf("test",
      SearchRequest("*", limit = 1000, asOfGen = Some(preMerge - 1))).count() == 2,
      "the first-batch-only generation answers too")
    preMergeSplits.foreach(id => assert(cat.splitDirExists("test", id),
      "retain-inputs must leave the compacted inputs' files on disk"))
    // vacuum strictly-before the merge generation: history gone LOUDLY,
    // the live manifest (and its merged split) untouched
    val postMerge = cat.manifestGen("test")
    val (archives, dirs) = cat.vacuum("test", postMerge)
    assert(archives >= 2 && dirs == preMergeSplits.size,
      s"expected the two ingest generations + their splits gone, " +
        s"got ($archives, $dirs)")
    preMergeSplits.foreach(id => assert(!cat.splitDirExists("test", id)))
    val e = intercept[IllegalArgumentException](
      s.searchDf("test",
        SearchRequest("*", limit = 10, asOfGen = Some(preMerge))).count())
    assert(e.getMessage.contains("no archived manifest"), e.getMessage)
    assert(s.searchDf("test", SearchRequest("*", limit = 1000)).count() == 12,
      "vacuum never touches the live manifest's splits")
    // the current generation remains snapshot-addressable (falls back to
    // the live manifest even though its archive was not vacuumed)
    assert(s.searchDf("test",
      SearchRequest("*", limit = 1000, asOfGen = Some(postMerge))).count() == 12)
    cat.drop("test")
  }

  test("history vacuumed by merge fails loudly; unaffected queries still answer") {
    val (cat, idx, s, root) = freshIndex()
    idx.indexFile("test",
      "/root/reference/tests/test_files/hdfs-logs-multitenants-2.json")
    idx.indexFile("test", secondBatch(root))
    val preMerge = cat.manifestGen("test")
    assert(idx.merge("test").isDefined)
    // the merged split serves the present
    assert(s.searchDf("test", SearchRequest("*", limit = 1000)).count() == 12)
    // the pre-merge generation's splits were compacted away: loud failure
    val e = intercept[IllegalStateException](
      s.searchDf("test",
        SearchRequest("*", limit = 10, asOfGen = Some(preMerge))).count())
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    cat.drop("test")
  }
}
