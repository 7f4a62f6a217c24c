package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketch (brief: "a novel sketch" slot).
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every value
  * uniformly into (0, 2^60), keep the k smallest DISTINCT hashes; if the
  * kth smallest is at fraction f of the hash space, ~k/f distinct values
  * exist — estimate (k-1)/f. Standard error ≈ 1/√(k-2) (~6% at k=256).
  *
  * Two properties make this the sketch of choice here over HyperLogLog:
  *   - exact determinism: the md5-derived hash and integer kth-min are
  *     bit-identical in any engine/partitioning, so the DuckDB oracle
  *     replays the ESTIMATE itself (an HLL estimate differs per
  *     implementation and would leave the operator unverifiable);
  *   - mergeability: the k smallest of a union is the k smallest of the
  *     per-partition k smallest — Spark's TakeOrdered does exactly that,
  *     so the shuffle carries ≤ k rows per partition.
  */
object Sketches {

  /** 60-bit md5 hash — same value DuckDB computes as
    * `('0x'||substr(md5(v),1,15))::BIGINT` (the repo's oracle trick).
    */
  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** KMV distinct-count estimate of `df.col(colName)`, one row
    * `(est: BIGINT, kth: BIGINT)`. Exact when the true cardinality is
    * below k (the sketch degenerates to a distinct count).
    */
  def kmvDistinct(df: DataFrame, colName: String, k: Int = 256): DataFrame = {
    val kth = df.select(hash60(col(colName)).as("h"))
      .where(col("h").isNotNull).distinct()
      .orderBy(col("h").asc).limit(k) // TakeOrdered: ≤ k rows shuffle
    // (k-1) * 2^60 is an exact double (255 * 2^60 < 2^68, 8 significant
    // bits) — both engines compute the identical quotient.
    val scale = (k - 1).toDouble * math.pow(2.0, 60)
    kth.agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(
        when(col("n") < k, col("n"))
          .otherwise(floor(lit(scale) / col("kth"))).cast("bigint").as("est"),
        col("kth").cast("bigint").as("kth"))
  }
}
