package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, Searcher}

/** Drives the CLI verb dispatch in-process — in particular the stdin
  * ingest path (`index <name> -` / no input arg), the one §2 source that
  * no other gate exercised (reference: `src/args.rs:51-56`,
  * `sources/buf_source.rs:25-28`). */
class CliSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val configYaml =
    """version: 1
      |name: cli_test
      |path: /tmp/unused
      |schema:
      |  fields:
      |    - name: n
      |      type: !number
      |        type: i64
      |    - name: body
      |      type: !text
      |""".stripMargin

  test("index with `-` spools stdin into a committed split") {
    val root = Files.createTempDirectory("graft-cli").toString
    val cat = new Catalog(root)
    val yaml = Files.createTempFile("cli-config", ".yaml")
    Files.write(yaml, configYaml.getBytes("UTF-8"))
    cli.Main.run(Array("create", yaml.toString), spark, cat, root)
    assert(cat.exists("cli_test"))

    val docs = """{"n": 1, "body": "hello graft"}
                 |{"n": 2, "body": "second doc"}""".stripMargin
    val savedIn = System.in
    try {
      System.setIn(new ByteArrayInputStream(docs.getBytes("UTF-8")))
      cli.Main.run(Array("index", "cli_test", "-"), spark, cat, root)
    } finally System.setIn(savedIn)

    val splits = cat.liveSplits("cli_test")
    assert(splits.map(_.numDocs).sum == 2, s"got $splits")
    val search = new Searcher(spark, cat)
    assert(search.search("cli_test", "body:hello", 1) ==
      Seq("""{"body":"hello graft","n":1}"""))

    // the no-input-arg form reads stdin too (reference: omitted input)
    try {
      System.setIn(new ByteArrayInputStream("""{"n": 3, "body": "third"}""".getBytes("UTF-8")))
      cli.Main.run(Array("index", "cli_test"), spark, cat, root)
    } finally System.setIn(savedIn)
    assert(cat.liveSplits("cli_test").map(_.numDocs).sum == 3)
    assert(search.search("cli_test", "n:3", 1) == Seq("""{"body":"third","n":3}"""))
  }
}
