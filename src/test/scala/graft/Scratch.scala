package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/tmp/sf1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    time("gx_pathsearch_pattern 1")(println(
      SparkEntry.queries("gx_pathsearch_pattern")(spark, sf).count()))
    time("gx_pathsearch_pattern 2")(println(
      SparkEntry.queries("gx_pathsearch_pattern")(spark, sf).count()))
    time("gx_pathsearch_pattern 3")(println(
      SparkEntry.queries("gx_pathsearch_pattern")(spark, sf).count()))
    spark.stop()
  }
}
