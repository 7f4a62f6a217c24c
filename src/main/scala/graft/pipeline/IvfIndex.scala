package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Persisted IVF (inverted-file) ANN index — "index once, query many" for
  * similarity search, the same artifact posture as [[FullTextIndex]] (and
  * the shape every production vector store uses: train the coarse
  * quantizer once, write posting lists, serve probes).
  *
  * [[IvfIndex.build]] trains the deterministic Lloyd's quantizer
  * ([[Similarity.ivfTrain]]) and writes two warehouse tables:
  *   - `<name>_postings`  (cid, neighbor_id, _vc, _nc)  bucketed + sorted
  *     by cid — a probe reads ONLY the nprobe hit buckets
  *     (`SelectedBucketsCount`), so at 100 TB a query touches
  *     ≈ nprobe/nlist of the corpus bytes and the training job is paid
  *     once, not per query;
  *   - `<name>_centroids` (cid, _cv) — nlist tiny rows, pinned to the
  *     driver at OPEN time (the only driver-side read, same bound as the
  *     ad-hoc path's per-query pin).
  *
  * Queries then probe through the same scoring path as the ad-hoc
  * [[Similarity.ivfTopK]] (bit-identical results by construction:
  * identical training determinism, identical probe arithmetic), so the
  * two paths share one oracle.
  */
final class IvfIndex private (spark: SparkSession, name: String,
    centroids: DataFrame) {

  def postings: DataFrame = Bucketing.table(spark, s"${name}_postings")

  /** Top-k cosine neighbors for each query vector through the persisted
    * posting lists — no training job, and the hit cids become a LITERAL
    * `IN` filter on the bucket column so the scan prunes to the probed
    * BUCKETS (`SelectedBucketsCount`, plan-asserted) instead of reading
    * every list. The cid collect is bounded by |queries| × nprobe over the
    * broadcast-sized query set (local centroid arithmetic, no corpus job).
    */
  def topK(queries: DataFrame, id: String, vec: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    val probed = Similarity.ivfProbed(centroids, queries, id, vec, nprobe)
    val cids = probed.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    Similarity.ivfScore(
      postings.filter(col("cid").isin(cids: _*)), probed, k)
  }
}

object IvfIndex {

  /** Train the quantizer and persist posting lists + centroids. */
  def build(corpus: DataFrame, id: String, vec: String, name: String,
      nlist: Int = 16, iters: Int = 3, buckets: Int = 8): IvfIndex = {
    val spark = corpus.sparkSession
    val c = Similarity.prepared(corpus, id, vec, "neighbor_id", "_vc", "_nc")
      .withColumn("_vi", Similarity.ivfQuant(col("_vc")))
    val cents = Similarity.ivfTrain(c, "neighbor_id", nlist, iters)
    Bucketing.writeBucketed(
      Similarity.ivfNearest(c, cents, "_vi", 1)
        .select(col("cid"), col("neighbor_id"), col("_vc"), col("_nc")),
      s"${name}_postings", "cid", buckets, sortKeys = Seq("cid"))
    Bucketing.dropTable(spark, s"${name}_centroids")
    cents.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${name}_centroids")
    load(spark, name)
  }

  /** Open an already-built index (pins the nlist centroid rows once). */
  def load(spark: SparkSession, name: String): IvfIndex = {
    import spark.implicits._
    val cents = spark.table(s"${name}_centroids")
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
      .toDF("cid", "_cv")
    new IvfIndex(spark, name, cents)
  }
}
