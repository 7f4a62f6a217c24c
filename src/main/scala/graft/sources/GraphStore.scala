package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Predicate-partitioned Parquet quad store (SURVEY §1.5: the Spark analog of
  * the reference's predicate lists, `init-graphdb.sh:61-65`, and context
  * index, `:56-60`).
  *
  * Layout: `path/graph=<g>/p=<pred>/part-*.parquet` — a constant-graph or
  * constant-predicate pattern prunes to its partition directories at PLANNING
  * time (Catalyst PartitionFilters, no file listing outside the match), which
  * is the property that keeps pinpoint BGP patterns O(matching-partition) at
  * 100 TB. Predicate cardinality is schema-bounded (SURVEY §1.4), so the
  * directory fan-out stays manageable; RDF's predicate-frequency skew lands
  * in partition SIZES, which AQE handles at read/join time.
  */
object GraphStore {

  /** Write quads partitioned by (graph, p). Special characters in IRIs are
    * percent-escaped by Spark's partition-path encoding automatically.
    */
  def write(quads: DataFrame, path: String): Unit =
    quads.write.partitionBy("graph", "p").mode("overwrite").parquet(path)

  /** Read back in canonical column order. Partition columns return as
    * strings, matching the quad schema.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("graph"), col("s"), col("p"), col("o"))

  /** Snapshot DIFF — the change feed between two immutable update epochs
    * (`op` '+' for additions in `after`, '-' for removals): two anti-joins
    * on the full quad key, nothing else. The audit/replication primitive a
    * versioned store gives for free: every `GraphUpdate` epoch is a
    * snapshot, so `diff(prev, next)` is exactly what the update did.
    */
  def diff(before: DataFrame, after: DataFrame): DataFrame = {
    val key = Seq("graph", "s", "p", "o")
    val added = after.join(before, key, "left_anti")
      .select(lit("+").as("op"), col("graph"), col("s"), col("p"), col("o"))
    val removed = before.join(after, key, "left_anti")
      .select(lit("-").as("op"), col("graph"), col("s"), col("p"), col("o"))
    added.unionAll(removed)
  }
}
