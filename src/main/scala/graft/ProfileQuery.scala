package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev micro-profiler: [[BenchOne]] + per-rep slowest-stage table and
  * the rep-2 final (AQE) plan — the tool that closed the r13
  * q_link_pred watch item (it exposed the cache-path edge-table
  * broadcast that per-query wall times alone couldn't).
  *
  * `runMain graft.ProfileQuery <sfDir> <query> [reps]`; set
  * SPARK_GRAFT_GRAPH_CACHE to profile the cached-graph path.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = if (args.length > 1) args(1) else "q_link_pred"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.add((si.stageId, ms, si.name.take(60)))
      }
    })
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    for (rep <- 1 to reps) {
      stages.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep $rep: $secs%.2f s ($n rows)")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (id, ms, nm) =>
        println(f"[profile]   stage $id%4d ${ms / 1000.0}%7.2f s  $nm")
      }
      if (rep == 2) println("[plan]\n" +
        df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
