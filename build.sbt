ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "toshokanspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The container locale is POSIX (JVM file.encoding = US-ASCII on JDK 17),
// so both scalac's source reading and the forked JVMs' default charset
// must be pinned to UTF-8 or non-ASCII literals/IO mangle silently.
ThisBuild / scalacOptions ++= Seq("-encoding", "UTF-8")
Test / fork := true
run / fork := true
// Pass forked-run output through verbatim: sbt's default LoggedOutput
// prefixes every stdout line with "[info] ", which breaks any consumer
// that json-parses the bench's final summary line (r21, verdict #1 — the
// driver has recorded `parsed: null` for five rounds).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Forward the sbt process's stdin to the forked run JVM so
// `cat docs.jsonl | sbt "runMain graft.cli.Main index <name> -"` works
// (the CLI's stdin ingest path, matching the reference).
run / connectInput := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] on the 128 GiB bench machine: 8g thrashed G1 once the
  // query surface passed ~90 (bench run-to-run swung 42..57s); 32g holds
  // shuffle + checkpoint blocks comfortably and stabilizes timings.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
