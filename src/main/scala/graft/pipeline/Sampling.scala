package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs/partitionings and
  * unverifiable; hashing the ROW KEY against a threshold gives a Bernoulli
  * sample that is (a) stable under re-partitioning and re-runs, (b) the
  * same rows on a 1000-executor cluster as on local[1], (c) replayable by
  * the DuckDB oracle, and (d) consistent across tables — sampling two
  * tables by the same key keeps them join-compatible (the classic
  * "sample users, keep all their events" trick).
  */
object Sampling {

  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")

  private val Space = math.pow(2.0, 60)

  /** Keep rows whose key hashes below `fraction` of the space. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // threshold is a LONG literal — the comparison is integer-exact
    df.filter(hash60(col(keyCol)) < lit((fraction * Space).toLong))
  }

  /** Per-stratum fractions (e.g. downsample dominant classes): rows whose
    * stratum is absent from `fractions` are DROPPED (explicit is safer
    * than silently keeping a class the caller forgot to list).
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val thr = fractions.foldLeft(lit(-1L)) { case (acc, (s, f)) =>
      when(col(stratumCol) === s, lit((f * Space).toLong)).otherwise(acc)
    }
    df.filter(hash60(col(keyCol)) < thr)
  }
}
