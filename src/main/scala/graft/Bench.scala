package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs the headline query subset on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","failed":[…],"queries":{…},
  *   "min":{…},"cold":{…},"reps":{…},"sf":…}` — `reps` carries per-rep
  * wall seconds + finish instant + 1-min loadavg (r17: the artifact is
  * self-evidencing; a contaminated-box run is visible from the JSON).
  *
  * Each query runs `reps` times (default 5 since r15 — the r14 judge
  * measured a 27% same-code spread between two median-of-3 runs, larger
  * than every per-query round-over-round delta, so medians-of-3 were not
  * separating plan changes from box load): `queries` carries the MEDIAN
  * (and `value` their sum), `min` the per-query MINIMUM (the
  * load-independent floor — compare `min` across rounds to see plan
  * changes, `queries` to see expected wall), and `cold` keeps run 1
  * separately (the first-touch number including page-cache/codegen
  * warmup).
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

  /** 1-minute system load average (Linux `/proc/loadavg` field 1; falls
    * back to the JMX OS bean). −1.0 when unavailable — never throws: load
    * sampling must not be able to fail a bench run.
    */
  private def load1(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch {
      case _: Throwable =>
        try java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        catch { case _: Throwable => -1.0 }
    }

  /** Run `queries` in order, `reps` times each; returns the final JSON. */
  def run(spark: SparkSession, sfDir: String, queries: Seq[(String, Q)],
      outPath: Option[java.nio.file.Path], reps: Int = 5): String = {
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val medians = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val colds = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val mins = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // per-rep evidence (r16 verdict item 1): the JSON itself must carry
    // enough to PROVE a quiet run — per-rep wall seconds, the ISO instant
    // each rep finished, and the 1-min loadavg sampled right after. A
    // future reader separates plan regressions from box contention from
    // the artifact alone, without the stderr log.
    val repLog = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[(Double, String, Double)])]
    def obj(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
    def repsJson(): String =
      repLog.map { case (q, rs) =>
        "\"" + q + "\":" + rs.map { case (sec, at, l1) =>
          f"""{"sec":$sec%.3f,"at":"$at","load1":$l1%.2f}"""
        }.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    def json(): String = {
      val total = medians.collect { case (_, v) if v >= 0 => v }.sum
      val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      f"""{"metric":"total_headline_sec","value":$total%.3f,"unit":"sec","failed":$fj,"queries":${obj(medians.toSeq)},"min":${obj(mins.toSeq)},"cold":${obj(colds.toSeq)},"reps":${repsJson()},"sf":"$sfDir"}"""
    }
    queries.foreach { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      val repEvidence =
        scala.collection.mutable.ArrayBuffer.empty[(Double, String, Double)]
      var ok = true
      (0 until reps).foreach { i =>
        if (ok) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            times += sec
            val at = java.time.Instant.now().toString
            val l1 = load1()
            repEvidence += ((sec, at, l1))
            // rep-level attribution line (r15 verdict item 8) — stderr
            // mirror of the JSON `reps` entry for live watching
            System.err.println(
              f"[bench-rep] $name rep$i $sec%.3f at $at load1=$l1%.2f")
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: $e")
              repEvidence +=
                ((-1.0, java.time.Instant.now().toString, load1()))
              ok = false
          }
        }
      }
      if (ok) {
        colds += name -> times.head
        medians += name -> times.sorted.apply(times.size / 2)
        mins += name -> times.min
      } else {
        failed += name
        colds += name -> -1.0
        medians += name -> -1.0
        mins += name -> -1.0
      }
      repLog += name -> repEvidence.toSeq
      outPath.foreach(p => java.nio.file.Files.writeString(p, json() + "\n"))
    }
    json()
  }

  /** The stdout headline: the full JSON minus the `reps` evidence blob.
    * r17's driver artifact came back `"parsed": null` because the per-rep
    * evidence made the line so long that the driver's fixed-size stdout
    * tail ended INSIDE the reps blob, dropping every per-query number from
    * the official artifact. The last stdout line must stay compact
    * (metric/value/failed/queries/min/cold/sf); the full self-evidencing
    * JSON still lands in SPARK_GRAFT_BENCH_OUT. Field order in `json()` is
    * fixed (`…,"reps":{…},"sf":…`), so slicing between the two markers is
    * exact, and any unexpected shape falls back to the unmodified line
    * rather than emitting torn JSON.
    */
  def compact(json: String): String = {
    val i = json.indexOf(",\"reps\":")
    val j = json.lastIndexOf(",\"sf\":")
    if (i < 0 || j <= i) json else json.substring(0, i) + json.substring(j)
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
      .config("spark.ui.enabled", "false")
      // A GC pause under memory pressure must not kill the run: the default
      // 10 s heartbeat ask / 120 s network timeout turned one slow round into
      // Netty RPC timeouts and an unscored bench (round-1 postmortem).
      .config("spark.network.timeout", "600s")
      .config("spark.rpc.askTimeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    // Optional name filter (comma-separated) for iterating on one query
    // locally; the driver never sets it, so the contract is unchanged.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = only.fold(SparkEntry.benchQueries)(
      f => SparkEntry.benchQueries.filter(f))
    val qs = names.map(n => n -> SparkEntry.queries(n))
    val out = run(spark, sfDir, qs, Some(outPath), reps)
    // Print the metric line LAST, after spark.stop(): streaming-shutdown
    // and executor log noise otherwise interleaves with it under sbt's
    // line-based logger and the driver's JSON sniffer reads a torn line
    // (r11 VERDICT "What's wrong #3"). The incremental file artifact above
    // is unaffected either way.
    spark.stop()
    System.out.flush(); System.err.flush()
    println(compact(out))
    System.out.flush()
  }
}
