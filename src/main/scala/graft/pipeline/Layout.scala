package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering for
  * multi-column range pruning (SURVEY §4 scale mechanics).
  *
  * Partitioning or sorting by ONE column gives parquet min/max skipping on
  * that column only; a 100 TB fact table queried by (user, time) or
  * (lat, lon) ranges needs BOTH dimensions tight per file. Z-ordering maps
  * each row to a point on a space-filling curve — normalize every dimension
  * to a fixed-width integer rank, interleave the bits — then range-partitions
  * and sorts by that single derived value, so each output file covers a
  * small hyper-rectangle and a 2-D range predicate prunes most files by
  * their footer stats alone (same mechanism Delta's OPTIMIZE ZORDER BY and
  * Hudi's space-curve clustering use).
  *
  * Everything is one pass: a 2·n-value min/max stats job (bounded, like the
  * IVF centroid pins), a pure-column interleave expression (codegen'd — no
  * UDF), `repartitionByRange` (sampled range boundaries, skew-robust) and a
  * within-partition sort that parquet turns into tight per-row-group stats.
  */
object Layout {

  /** Bit-interleave pre-normalized integer ranks (each in [0, 2^bits)).
    * Bit b of rank i lands at position b·n+i, so top bits alternate across
    * dimensions — the Morton curve. Requires bits·n ≤ 62 (long, no sign).
    */
  def interleaveBits(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.size
    require(n >= 1 && bits * n <= 62,
      s"z-order: $n dims × $bits bits exceeds a long")
    val terms = for {
      b <- 0 until bits
      (r, i) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Normalize a numeric/timestamp column to an integer rank in
    * [0, 2^bits) given its min/max (timestamps rank by epoch micros).
    */
  private def rank(c: Column, dt: org.apache.spark.sql.types.DataType,
      lo: Double, hi: Double, bits: Int): Column = {
    val d = dt match {
      case TimestampType | TimestampNTZType =>
        unix_micros(c.cast(TimestampType)).cast("double")
      case _ => c.cast("double")
    }
    val maxRank = (1L << bits) - 1
    val span = hi - lo
    if (span <= 0) lit(0L)
    else least(lit(maxRank),
      greatest(lit(0L), floor((d - lo) / span * maxRank).cast("long")))
  }

  /** The z-value column for `dims` of `df` — runs ONE stats job for the
    * per-dimension min/max (2·n scalars collected, bounded by definition).
    */
  def zValue(df: DataFrame, dims: Seq[String], bits: Int = 16): Column = {
    val types = dims.map(d => df.schema(d).dataType)
    val aggs = dims.flatMap { d =>
      val c = types(dims.indexOf(d)) match {
        case TimestampType | TimestampNTZType =>
          unix_micros(col(d).cast(TimestampType)).cast("double")
        case _ => col(d).cast("double")
      }
      Seq(min(c), max(c))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val ranks = dims.zipWithIndex.map { case (d, i) =>
      rank(col(d), types(i), row.getDouble(2 * i), row.getDouble(2 * i + 1), bits)
    }
    interleaveBits(ranks, bits)
  }

  /** Write `df` z-ordered by `dims`: range-partition on the z-value (sampled
    * boundaries — skew-robust), sort within partitions, drop the transient
    * z column at the writer. Output files then carry TIGHT min/max footer
    * stats on EVERY clustered dimension.
    */
  def zOrderWrite(df: DataFrame, path: String, dims: Seq[String],
      bits: Int = 16, partitions: Int = 8): Unit = {
    val zc = "__z"
    df.withColumn(zc, zValue(df, dims, bits))
      .repartitionByRange(partitions, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file span of `dim` (max−min per output file) — the clustering
    * quality metric: z-ordered layouts show a small mean span on every
    * clustered dimension, which is exactly what footer-stats pruning keys on.
    */
  def fileSpans(spark: SparkSession, path: String, dim: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg((max(col(dim).cast("double")) - min(col(dim).cast("double")))
        .as("span"))
}
