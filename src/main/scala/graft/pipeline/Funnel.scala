package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel analysis — ordered event-sequence matching per user (the product
  * analytics staple: who progressed view → click → purchase, and when).
  *
  * Greedy-earliest semantics: stage 1 anchors at the user's FIRST stage-1
  * event; each later stage at its first occurrence AT OR AFTER the previous
  * stage's anchor. Deterministic, and each stage is one filtered aggregate
  * joined to the previous anchors — no window over the whole event stream,
  * no per-user collect; at 100 TB this is k small hash aggregates + k
  * broadcast-able joins for a k-stage funnel.
  */
object Funnel {

  /** @return one row per user reaching stage 1, with the anchor time of
    *         every stage (`t1..tk`, null once the funnel broke).
    */
  def funnel(events: DataFrame, user: String, typeCol: String,
      timeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(user))
      .agg(min(col(timeCol)).as("t1"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val next = events.filter(col(typeCol) === stage)
        .select(col(user).as("_u"), col(timeCol).as("_t"))
      acc.join(next, acc(user) === col("_u") && col("_t") >= col(prev), "left")
        .groupBy(acc.columns.map(acc(_)): _*)
        .agg(min(col("_t")).as(cur))
    }
  }

  /** Cohort RETENTION (the other product-analytics staple): users cohorted
    * by the period of their anchor event, counted per later activity
    * period — the retention-matrix feed `(cohort, period_offset,
    * n_users)`. One anchor aggregate, one distinct-activity aggregate, one
    * join: every stage is partial+final aggregated before the join, so the
    * join input is |users| and |user-periods|, never |events|.
    *
    * Periods are day-granular buckets of `periodDays` from the epoch —
    * deterministic and replayable in any engine (no calendar-week
    * ambiguity).
    */
  def retention(events: DataFrame, user: String, typeCol: String,
      timeCol: String, anchorType: String, periodDays: Int = 7): DataFrame = {
    // exact integer division: subtract the remainder first so the double
    // quotient is an exact integer (micros < 2^53), matching DuckDB's `//`
    val m = unix_micros(col(timeCol).cast("timestamp"))
    val n = lit(periodDays * 86400L * 1000000L)
    val period = ((m - pmod(m, n)) / n).cast("bigint")
    val anchors = events.filter(col(typeCol) === anchorType)
      .select(col(user).as("_u"), period.as("cohort"))
      .groupBy(col("_u")).agg(min(col("cohort")).as("cohort"))
    val active = events.select(col(user).as("_u"), period.as("p")).distinct()
    anchors.join(active, Seq("_u"))
      .filter(col("p") >= col("cohort"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).cast("bigint").as("n_users"))
  }

  /** Stage-reach counts: how many users made it to each stage. */
  def funnelCounts(events: DataFrame, user: String, typeCol: String,
      timeCol: String, stages: Seq[String]): DataFrame = {
    val f = funnel(events, user, typeCol, timeCol, stages)
    val counts = stages.indices.map(i =>
      sum(when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
        .cast("bigint").as(s"n_stage${i + 1}"))
    f.agg(counts.head, counts.tail: _*)
  }
}
