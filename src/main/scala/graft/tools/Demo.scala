package graft.tools

import java.nio.file.Files

import graft.Graft
import graft.engine.{Catalog, Indexer, Searcher}

/** End-to-end usage example of the search-engine surface:
  * create → index → search → merge → search → drop.
  *
  *   sbt "runMain graft.tools.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(8, "graft-demo")
    val root = Files.createTempDirectory("graft-demo").toString
    println(s"engine root: $root")

    val cat = new Catalog(root)
    val idx = new Indexer(spark, cat)
    val search = new Searcher(spark, cat)

    val configYaml = new String(Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/example_config.yaml")), "UTF-8")
    cat.create(configYaml)
    println("created index 'test'")

    val docs = new String(Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/test_files/hdfs-logs-multitenants-2.json")), "UTF-8")
    docs.trim.split("\n").zipWithIndex.foreach { case (line, i) =>
      val f = Files.createTempFile(s"doc$i", ".json")
      Files.write(f, line.getBytes("UTF-8"))
      val split = idx.indexFile("test", f.toString)
      println(s"indexed doc $i -> split ${split.map(_.id)}")
    }
    println(s"live splits: ${cat.liveSplits("test").map(_.id)}")

    for (q <- Seq("tenant_id:>50 AND severity_text:INFO", "body:Receiving",
        "severity_text:INFO", "*")) {
      println(s"\nquery: $q")
      search.search("test", q, 10).foreach(println)
    }

    println("\nmerging...")
    idx.merge("test")
    println(s"live splits after merge: ${cat.liveSplits("test").map(_.id)}")
    println("query after merge: tenant_id:>50 AND severity_text:INFO")
    search.search("test", "tenant_id:>50 AND severity_text:INFO", 1).foreach(println)

    cat.drop("test")
    println(s"\ndropped; splits now: ${cat.splitPaths("test")}")
    spark.stop()
  }
}
