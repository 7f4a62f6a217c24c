package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY §4.2 / brief: "co-locate joins via
  * bucketing or pre-partitioning").
  *
  * Writing both sides of a recurring equi-join bucketed by the join key lets
  * Catalyst plan a SortMergeJoin with NO Exchange on either side — at 100 TB
  * the shuffle is usually the dominant cost of a fact-fact join, and bucketing
  * amortizes it into the (once-per-ingest) write. Bucket counts must match
  * (or divide) across the tables being co-joined.
  */
object Bucketing {

  /** Save a DataFrame as a bucketed managed table (warehouse-backed parquet).
    * Idempotent: drops any prior table AND clears a stale warehouse location
    * left by a previous session (the in-memory catalog forgets tables across
    * JVMs but their files remain → LOCATION_ALREADY_EXISTS otherwise).
    */
  /** Drop a managed table AND its possibly-stale warehouse directory (the
    * in-memory catalog forgets tables across JVMs but their files remain →
    * LOCATION_ALREADY_EXISTS on the next saveAsTable otherwise).
    */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = new java.io.File(wh, table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32, sortKeys: Seq[String] = Nil): Unit = {
    dropTable(df.sparkSession, table)
    val w0 = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    val w = if (sortKeys.nonEmpty) w0.sortBy(sortKeys.head, sortKeys.tail: _*) else w0
    w.saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
