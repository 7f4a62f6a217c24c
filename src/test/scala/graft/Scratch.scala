package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    println("warehouse=" + wh)
    new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("graft_resedges"))
      .foreach(f => println("  " + f.getName))
    val cat = graft.sources.GraphCatalog.testdata(spark, sf)
    time("ensureEdgeIndex")(cat.ensureEdgeIndex())
    new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("graft_resedges"))
      .foreach(f => println("  post: " + f.getName))
    val e = cat.resourceEdgeSet
    println("edge plan: " + e.queryExecution.logical.toString.take(300))
    time("resourceEdgeSet count")(println(e.count()))
    val (src, dst) = {
      // replicate pathSearchEndpoints deterministically via the harness
      val df = SparkEntry.queries("gx_pathdist")(spark, sf)
      df.count() // warms endpoint cache via the shared private helper
      ("", "")
    }
    time("allPaths via engine construct")(
      SparkEntry.queries("gx_pathsearch")(spark, sf))
    time("allPaths via engine construct 2")(
      SparkEntry.queries("gx_pathsearch")(spark, sf))
    spark.stop()
  }
}
