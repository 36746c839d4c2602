ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sql4pandasspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver greps the run log's bounded tail for Bench's ONE-line JSON
// summary. Under sbt's default LoggedOutput every forked-process line is
// re-emitted as "[info] <line>", so no line ever STARTS with '{' and the
// driver recorded parsed:null five rounds running even when the complete
// JSON sat inside the tail (BENCH_r05.json). StdoutOutput passes the
// forked JVM's stdout through verbatim — the JSON line reaches the log
// undecorated — and showSuccess drops the trailing "[success] Total
// time: ..." epilogue so that line is also the LAST line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g on the 128 GiB bench box: at 32 concurrent tasks the 8g
  // default ran GC-bound on checkpoint-heavy iterative queries
  // (pagerank rep spread 8-19 s on an idle machine); headroom
  // flattens that without touching any per-query plan.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
