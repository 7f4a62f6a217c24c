package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Measurement tool (optimization rounds, guide §1.2/§7.2): writes
  * `.explain("formatted")` for each headline bench query to
  * `<outDir>/<query>_<tag>.txt` so plan-shape claims (Exchange count, join
  * strategy, PushedFilters) are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> [onlyCsv]
  *
  * Queries whose construction EXECUTES work eagerly (the iterative
  * graph/path ops, streaming completions) still dump the plan of the frame
  * they return — the file then shows the final stage, and the iteration
  * structure is documented in OPTIMIZATION notes instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = if (args.length > 2) args(2) else "before"
    val only = if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet)
               else None
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = only.fold(SparkEntry.benchQueries)(
      f => SparkEntry.benchQueries.filter(f))
    names.foreach { name =>
      try {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(FormattedMode)
        val sec = (System.nanoTime() - t0) / 1e9
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$tag.txt"), plan)
        System.err.println(f"[plandump] $name ok in $sec%.1fs")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
