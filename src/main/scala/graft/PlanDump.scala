package graft
import org.apache.spark.sql.SparkSession

/** Dev harness for the optimization rounds: write
  * `.explain("formatted")` of declared queries to files.
  *
  * `runMain graft.PlanDump <sfDir> <outDir> <suffix> <query>...`
  * writes `<outDir>/<query>_<suffix>.txt` per query — the judge
  * checks plan claims (Exchange counts, join strategies,
  * PushedFilters) against these committed files. Same session config
  * as [[Bench]] so the plans match what the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      // "formatted" initial plan: shows scan pushdown/ReadSchema and
      // every Exchange/join op before AQE re-optimization — the shape
      // the optimization guide's checklist reads.
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt " +
        s"(${txt.count(_ == '\n')} lines)")
    }
    spark.stop()
  }
}
