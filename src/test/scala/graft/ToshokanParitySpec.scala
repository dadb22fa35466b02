package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, Indexer, Searcher}

/** The reference's integration matrix (`/root/reference/tests/config.rs:34-131`
  * and `tests/merge.rs:26-100`) as exact-string golden tests: create →
  * index JSONL → search → identical JSON output (alphabetical keys) →
  * drop removes files.
  */
class ToshokanParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withEngine[T](f: (Catalog, Indexer, Searcher) => T): T = {
    val root = Files.createTempDirectory("graft-test").toString
    val cat = new Catalog(root)
    f(cat, new Indexer(spark, cat), new Searcher(spark, cat))
  }

  private def writeDocs(docs: String): String = {
    val p = Files.createTempFile("docs", ".json")
    Files.write(p, docs.trim.getBytes("UTF-8"))
    p.toString
  }

  private def refFile(rel: String): String =
    new String(Files.readAllBytes(Paths.get(s"/root/reference/$rel")), "UTF-8")

  test("F1: example hdfs-logs config, range+term query, re-nested output") {
    withEngine { (cat, idx, search) =>
      cat.create(refFile("example_config.yaml"))
      val split = idx.indexFile("test",
        writeDocs(refFile("tests/test_files/hdfs-logs-multitenants-2.json")))
      assert(split.exists(_.numDocs == 2))
      val out = search.search("test", "tenant_id:>50 AND severity_text:INFO", 1)
      assert(out == Seq(
        """{"attributes":{"class":"org.apache.hadoop.hdfs.server.datanode.DataNode"},"body":"PacketResponder: BP-108841162-10.10.34.11-1440074360971:blk_1074072698_331874, type=HAS_DOWNSTREAM_IN_PIPELINE terminating","resource":{"service":"datanode/01"},"severity_text":"INFO","tenant_id":58,"timestamp":"2016-04-13T06:46:53Z"}"""))
      cat.drop("test")
      assert(cat.splitPaths("test").isEmpty)
    }
  }

  test("F2: array of u64, match-all") {
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: array_test
          |path: /tmp/toshokan
          |schema:
          |  fields:
          |    - name: array
          |      array: true
          |      type: !number
          |        type: u64
          |""".stripMargin)
      idx.indexFile("array_test", writeDocs("""{"array":[1,2,3,4]}"""))
      assert(search.search("array_test", "*", 1) == Seq("""{"array":[1,2,3,4]}"""))
    }
  }

  test("F3: boolean term") {
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: boolean_test
          |path: /tmp/toshokan
          |schema:
          |  fields:
          |    - name: something
          |      type: !boolean
          |""".stripMargin)
      idx.indexFile("boolean_test", writeDocs(
        """{"something":true}
          |{"something":false}""".stripMargin))
      assert(search.search("boolean_test", "something:false", 1) ==
        Seq("""{"something":false}"""))
    }
  }

  test("F4: ip range across v4/v6") {
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: ip_test
          |path: /tmp/toshokan
          |schema:
          |  fields:
          |    - name: something
          |      type: !ip
          |""".stripMargin)
      idx.indexFile("ip_test", writeDocs(
        """{"something":"127.0.0.1"}
          |{"something":"2001:db8::ff00:42:8329"}
          |{"something":"192.168.0.1"}""".stripMargin))
      assert(search.search("ip_test", "something:[190.0.0.1 TO 195.200.10.1]", 1) ==
        Seq("""{"something":"192.168.0.1"}"""))
    }
  }

  test("F5: string coercion for i64/u64/f64/bool") {
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: parse_string_test
          |path: /tmp/toshokan
          |schema:
          |  fields:
          |    - name: negative
          |      type: !number
          |        type: i64
          |        parse_string: true
          |    - name: positive
          |      type: !number
          |        type: u64
          |        parse_string: true
          |    - name: float
          |      type: !number
          |        type: f64
          |        parse_string: true
          |    - name: boolean
          |      type: !boolean
          |        parse_string: true
          |""".stripMargin)
      idx.indexFile("parse_string_test", writeDocs(
        """{"negative": "-100", "positive": "100", "float": "25.52",  "boolean": "FaLsE"}
          |{"negative": "100",  "positive": "500", "float": "-25.52", "boolean": "trUe"}""".stripMargin))
      assert(search.search("parse_string_test", "negative:<0", 1) ==
        Seq("""{"boolean":false,"float":25.52,"negative":-100,"positive":100}"""))
    }
  }

  test("F6: merge compaction preserves queries, 2 splits -> 1") {
    withEngine { (cat, idx, search) =>
      cat.create(refFile("example_config.yaml"))
      val docs = refFile("tests/test_files/hdfs-logs-multitenants-2.json")
        .trim.split("\n")
      idx.indexFile("test", writeDocs(docs(0)))
      idx.indexFile("test", writeDocs(docs(1)))
      assert(cat.liveSplits("test").length == 2)

      val q1 = "tenant_id:>50 AND severity_text:INFO"
      val q2 = "body:Receiving"
      val before1 = search.search("test", q1, 1)
      val before2 = search.search("test", q2, 1)
      assert(before1.nonEmpty && before2.nonEmpty)

      idx.merge("test")
      assert(cat.liveSplits("test").length == 1)
      assert(search.search("test", q1, 1) == before1)
      assert(search.search("test", q2, 1) == before2)

      cat.drop("test")
      assert(cat.splitPaths("test").isEmpty)
    }
  }

  test("tiered merge compacts only the small tier; large split untouched") {
    withEngine { (cat, idx, search) =>
      cat.create(refFile("example_config.yaml"))
      val docs = refFile("tests/test_files/hdfs-logs-multitenants-2.json")
        .trim.split("\n")
      // two 1-doc splits (small tier) + one 2-doc split (large tier)
      idx.indexFile("test", writeDocs(docs(0)))
      idx.indexFile("test", writeDocs(docs(1)))
      idx.indexFile("test", writeDocs(docs.mkString("\n")))
      val before = cat.liveSplits("test")
      assert(before.length == 3)
      val bigId = before.find(_.numDocs == 2).get.id

      val q = "tenant_id:>50 AND severity_text:INFO"
      val beforeHit = search.search("test", q, 1)

      // only the two 1-doc splits are eligible
      val merged = idx.mergeSmall("test", smallDocs = 2)
      assert(merged.isDefined && merged.get.numDocs == 2)
      val after = cat.liveSplits("test")
      assert(after.length == 2)
      assert(after.exists(_.id == bigId), "large split must keep its id/files")
      assert(search.search("test", q, 1) == beforeHit)

      // the merged 2-doc split has graduated: nothing below the threshold
      assert(idx.mergeSmall("test", smallDocs = 2).isEmpty)
      cat.drop("test")
    }
  }

  test("merge --dedup drops exact duplicate documents during compaction") {
    withEngine { (cat, idx, search) =>
      cat.create(refFile("example_config.yaml"))
      val docs = refFile("tests/test_files/hdfs-logs-multitenants-2.json")
        .trim.split("\n")
      // the same 2 docs ingested twice = the at-least-once replay shape
      idx.indexFile("test", writeDocs(docs.mkString("\n")))
      idx.indexFile("test", writeDocs(docs.mkString("\n")))
      assert(cat.liveSplits("test").map(_.numDocs).sum == 4)

      val merged = idx.mergeDedup("test")
      assert(merged.isDefined && merged.get.numDocs == 2,
        s"4 docs with 2 distinct contents must compact to 2, got $merged")
      assert(cat.liveSplits("test").length == 1)
      // each doc present exactly once
      assert(search.search("test", "body:Receiving", 10).length == 1)
      cat.drop("test")
    }
  }

  test("array dynamic_object roundtrips as a JSON array of objects") {
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: dynarr_test
          |path: /tmp/x
          |schema:
          |  fields:
          |    - name: id
          |      type: !number
          |        type: i64
          |    - name: tags
          |      array: true
          |      type: !dynamic_object
          |""".stripMargin)
      // mixed element types: objects, quoted strings, numbers, booleans —
      // JSON value types must survive the roundtrip exactly (a naive
      // from_json string leaf would strip quotes and conflate "42" / 42)
      idx.indexFile("dynarr_test", writeDocs(
        """{"id": 1, "tags": [{"k": 1}, "str", 42, true]}"""))
      assert(search.search("dynarr_test", "*", 5) ==
        Seq("""{"id":1,"tags":[{"k":1},"str",42,true]}"""))
      cat.drop("dynarr_test")
    }
  }

  test("dynamic_object nested in a static_object splices as a real object") {
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: dynnest_test
          |path: /tmp/x
          |schema:
          |  fields:
          |    - name: meta
          |      type: !static_object
          |        fields:
          |          - name: host
          |            type: !text
          |          - name: attrs
          |            type: !dynamic_object
          |""".stripMargin)
      idx.indexFile("dynnest_test", writeDocs(
        """{"meta": {"host": "web1", "attrs": {"z": 1, "a": "x"}}}"""))
      // not a quoted string: a real nested object, keys sorted recursively
      assert(search.search("dynnest_test", "*", 5) ==
        Seq("""{"meta":{"attrs":{"a":"x","z":1},"host":"web1"}}"""))
      cat.drop("dynnest_test")
    }
  }

  test("gzip-compressed JSONL ingests transparently") {
    // log shippers emit .gz; Spark's text source decompresses by
    // extension, so the whole ingest path needs zero changes — pin it
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: gz_test
          |path: /tmp/x
          |schema:
          |  fields:
          |    - name: n
          |      type: !number
          |        type: i64
          |""".stripMargin)
      val gz = Files.createTempFile("docs", ".jsonl.gz")
      val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
      out.write("{\"n\": 1}\n{\"n\": 2}\n".getBytes("UTF-8"))
      out.close()
      val split = idx.indexFile("gz_test", gz.toString)
      assert(split.exists(_.numDocs == 2))
      assert(search.search("gz_test", "n:2", 1) == Seq("""{"n":2}"""))
    }
  }

  test("parse errors skip the document, not the batch") {
    withEngine { (cat, idx, search) =>
      cat.create(
        """version: 1
          |name: skip_test
          |path: /tmp/x
          |schema:
          |  fields:
          |    - name: n
          |      type: !number
          |        type: i64
          |""".stripMargin)
      val split = idx.indexFile("skip_test", writeDocs(
        """{"n": 1}
          |{"n": "not-a-number"}
          |not even json
          |{"n": 3}""".stripMargin))
      assert(split.exists(_.numDocs == 2))
      assert(search.search("skip_test", "n:3", 1) == Seq("""{"n":3}"""))
    }
  }
}
