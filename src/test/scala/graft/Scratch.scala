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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    emb.count()
    time("warm count")(emb.count())
    time("cosineNearDupPairs (kernel)")(
      println(graft.pipeline.Dedup.cosineNearDupPairs(emb, "vec_id", "embedding", 0.42).count()))
    time("cosineNearDupPairs again")(
      println(graft.pipeline.Dedup.cosineNearDupPairs(emb, "vec_id", "embedding", 0.42).count()))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.count()
    import graft.pipeline.Dedup
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 32)
    time("sigs count")(println(sigs.count()))
    val banded = sigs.select(col("doc"), explode(Dedup.lshBands(col("sig"), 8, 4)).as("b"))
      .select(col("doc"), col("b.band"), col("b.bh"))
    time("banded count")(println(banded.count()))
    val capped = banded.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .filter(col("bucket_n") <= 200).select(col("doc"), col("band"), col("bh"))
    time("capped count")(println(capped.count()))
    time("minhash pairs full")(
      println(Dedup.minhashPairs(docs, "doc_id", "text", 32, 8, 0.2).count()))
    time("jaccard verify full")(
      println(Dedup.jaccardVerify(docs,
        Dedup.minhashPairs(docs, "doc_id", "text", 32, 8, 0.2).select("a", "b"),
        "doc_id", "text").filter(col("jaccard") >= 0.5).count()))
    spark.stop()
  }
}
