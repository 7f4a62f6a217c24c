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
    val sf = args.headOption.getOrElse("/tmp/sf1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    time("SimHash kernel only")(println(
      docs.select(graft.functions.SimHash(col("text"), 60, md5Hash = true)
        .as("sh")).agg(avg(col("sh") / 1e18)).collect()(0)))
    time("batch simhashPairs")(println(
      graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text",
        nbits = 60, bands = 4, maxHamming = 3).count()))
    time("stream_simhash_pairs")(println(
      SparkEntry.queries("stream_simhash_pairs")(spark, sf).count()))
    time("stream_simhash_pairs warm")(println(
      SparkEntry.queries("stream_simhash_pairs")(spark, sf).count()))
    spark.stop()
  }
}
