package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Dataset profiling for pipeline QA — the "what am I about to train on"
  * pass over a corpus table.
  *
  * Quantiles are EXACT and rank-based (`row_number` selection over a sort),
  * not interpolated: `percentile_approx` sketches differ per
  * implementation, and continuous-percentile interpolation formulas differ
  * between engines — rank selection is the form every engine computes
  * identically, and one total sort of the profiled column is the honest
  * cost of an exact quantile at any scale (sample first if that's too
  * much; see [[Sampling]]).
  */
object Profiling {

  /** Exact quantiles of a numeric expression: one row per requested
    * quantile `(q, value)` — value is the element at rank
    * `ceil(q * n)` (rank-based, no interpolation).
    *
    * Scale shape: a DISTRIBUTED sort (range partitioning) +
    * `zipWithIndex` (one count job + narrow index assignment per
    * partition). NOT `row_number() over (ORDER BY v)` — an unpartitioned
    * window funnels the whole dataset into one task, the classic exact-
    * quantile scale killer. Only the |qs| selected rows reach the driver
    * (the same sketch-sized pin as IVF's centroids).
    */
  def quantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles: every q must be in (0, 1] (rank ceil(q*n) starts at 1); " +
        s"got [${qs.mkString(", ")}]")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull).orderBy(col("v").asc)
      .rdd.map(_.getDouble(0))
    // Persist so the sort shuffle is paid ONCE for the two passes below
    // (partition sizes, then rank pick) — zipWithIndex would also run two
    // jobs but recompute the sort for the second.
    sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = sorted
        .mapPartitionsWithIndex { case (pi, it) => Iterator((pi, it.size.toLong)) }
        .collect().sortBy(_._1).map(_._2)
      val n = sizes.sum
      if (n == 0L) {
        // Empty / all-null column: no ranks exist — empty result, same schema.
        Seq.empty[(Double, Double)].toDF("q", "value")
      } else {
        val offsets = sizes.scanLeft(0L)(_ + _)
        val rankOf = qs.map(q => q -> math.ceil(q * n).toLong).toMap
        val wanted = rankOf.values.toSet
        val picked = sorted.mapPartitionsWithIndex { case (pi, it) =>
          var rank = offsets(pi)
          it.flatMap { v =>
            rank += 1
            if (wanted.contains(rank)) Iterator((rank, v)) else Iterator.empty
          }
        }.collect().toMap
        qs.map(q => (q, picked(rankOf(q)))).toDF("q", "value")
      }
    } finally sorted.unpersist(blocking = false)
  }

  /** Per-column profile of a table: nulls, distincts, min/max lexical —
    * one row per column. Runs as ONE pass (a single aggregate over
    * conditional expressions), not one job per column.
    */
  def columnStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields.filter(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType)
    if (cols.isEmpty) {
      // No profileable (numeric/string) columns: empty result, same schema.
      return Seq.empty[(String, Long, Long, String, String)]
        .toDF("column", "nulls", "n_distinct", "min_val", "max_val")
    }
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(count(lit(1)).as(s"_n_${f.name}"),
        count(c).as(s"_nn_${f.name}"),
        countDistinct(c).as(s"_d_${f.name}"),
        min(c).cast("string").as(s"_min_${f.name}"),
        max(c).cast("string").as(s"_max_${f.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { f =>
      one.select(lit(f.name).as("column"),
        (col(s"_n_${f.name}") - col(s"_nn_${f.name}")).cast("bigint").as("nulls"),
        col(s"_d_${f.name}").cast("bigint").as("n_distinct"),
        col(s"_min_${f.name}").as("min_val"),
        col(s"_max_${f.name}").as("max_val"))
    }
    rows.reduce(_.unionAll(_))
  }
}
