package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs the headline query subset on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","failed":[…],"queries":{…},"sf":…}`.
  *
  * The line is ALSO written (incrementally, after every query) to
  * SPARK_GRAFT_BENCH_OUT (default `BENCH_LOCAL.json` in the cwd) so a run
  * that stalls, is killed, or has its stdout polluted by sbt/log noise still
  * leaves a parseable artifact with per-query timings up to that point.
  *
  * A query that THROWS is recorded as `-1.0` in `queries` AND listed in
  * `failed` — never as a normal elapsed time. A swallowed failure would make
  * the total LOOK faster (elapsed-to-crash < honest runtime), letting a
  * broken run pass a total-time gate; `failed` must be `[]` for a run to
  * count.
  */
object Bench {
  type Q = (SparkSession, String) => DataFrame

  /** Run `queries` in order; returns the final JSON line. */
  def run(spark: SparkSession, sfDir: String, queries: Seq[(String, Q)],
      outPath: Option[java.nio.file.Path]): String = {
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    def json(): String = {
      val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","failed":$fj,"queries":$qs,"sf":"$sfDir"}"""
    }
    queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        results += name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failed += name
          results += name -> -1.0
      }
      outPath.foreach(p => java.nio.file.Files.writeString(p, json() + "\n"))
    }
    json()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // A GC pause under memory pressure must not kill the run: the default
      // 10 s heartbeat ask / 120 s network timeout turned one slow round into
      // Netty RPC timeouts and an unscored bench (round-1 postmortem).
      .config("spark.network.timeout", "600s")
      .config("spark.rpc.askTimeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.benchQueries.map(n => n -> SparkEntry.queries(n))
    println(run(spark, sfDir, qs, Some(outPath)))
    spark.stop()
  }
}
