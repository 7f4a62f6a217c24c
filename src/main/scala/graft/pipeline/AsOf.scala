package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for every left row, the single LATEST right row with
  * `rightTime <= leftTime` on an equality key (the point-in-time lookup of
  * time-series and feature-store pipelines; DuckDB/kdb ship it as `ASOF
  * JOIN`, which is exactly what the oracle replays).
  *
  * Spark-first shape: NOT a range join — an inequality-banded join explodes
  * to |left|·|right-per-key| pairs before picking one winner. Instead both
  * sides are tagged and UNIONED, then ONE window per key ordered by
  * (time, side) carries the most recent right payload forward
  * (`last(_, ignoreNulls = true)` over unbounded-preceding..current): right
  * rows sort BEFORE left rows at equal times, so `<=` semantics fall out of
  * the sort key. Cost: one shuffle on the key + one sort — no join operator
  * at all, and the window state is one row per payload column.
  *
  * `toleranceMicros` (optional) nulls a match older than the bound — the
  * "don't join stale quotes" guard — applied AFTER the carry-forward, so it
  * is a pure column projection.
  *
  * Ties on (key, rightTime) must be resolved BEFORE the join (one right row
  * per (key, time)) — enforced here by keeping the row with the greatest
  * tie-break column value, deterministically.
  */
object AsOf {

  /** @param left        probe side
    * @param right       build side (the "quotes")
    * @param key         equality key column name (same name both sides)
    * @param leftTime    left event-time column (castable to timestamp)
    * @param rightTime   right event-time column
    * @param payload     right columns to carry onto each left row
    * @param tieBreak    right column deciding ties at equal (key, time) —
    *                    greatest wins
    * @param toleranceMicros max age of a match; older → payload nulls
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      tieBreak: String, toleranceMicros: Option[Long] = None): DataFrame = {
    val t = "_asof_t"
    val side = "_asof_side"
    val rt = "_asof_rt"
    val m = "_asof_m"

    // one right row per (key, time): greatest tie-break value wins
    val w0 = Window.partitionBy(col(key), col(rightTime))
      .orderBy(col(tieBreak).desc)
    val r1 = right.withColumn("_rn", row_number().over(w0))
      .filter(col("_rn") === 1).drop("_rn")

    val leftCols = left.columns.toSeq
    // The matched right row travels as ONE struct(rt, payload...) under a
    // single last(ignoreNulls = true): carrying payload columns with
    // independent last() calls would let a NULL in one payload column pull
    // that column's value from an OLDER right row than the one rt tracks —
    // the emitted payload must be the matched row verbatim, nulls included.
    val rTagged = r1.select(
      Seq(col(key), unix_micros(col(rightTime).cast("timestamp")).as(t),
        lit(0).as(side),
        struct(unix_micros(col(rightTime).cast("timestamp")).as(rt) +:
          payload.map(col): _*).as(m)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)): _*)
    val mType = rTagged.schema(m).dataType
    val lTagged = left.select(
      Seq(col(key), unix_micros(col(leftTime).cast("timestamp")).as(t),
        lit(1).as(side), lit(null).cast(mType).as(m)) ++
        leftCols.filterNot(_ == key).map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn(m, last(col(m), ignoreNulls = true).over(w))
    val fresh: Column = toleranceMicros match {
      case Some(tol) => col(m).isNotNull && col(t) - col(m)(rt) <= tol
      case None => col(m).isNotNull
    }
    val out = carried.filter(col(side) === 1)
    payload.foldLeft(out) { (d, c) =>
      d.withColumn(c, when(fresh, col(m)(c)))
    }.select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** STREAM-safe as-of: a STREAMING probe side against a STATIC build side
    * — the online feature-store lookup (features computed in batch, events
    * arriving on a stream). The static side interval-izes once: each right
    * row gains `validTo` = the key's next right time (a window `lead`,
    * legal because that side is static), turning the lookup into a plain
    * STREAM-STATIC equi+range LEFT join where every left row matches
    * EXACTLY ONE interval — no aggregation, no state store, no watermark;
    * the output is append-safe. Same tie-break and tolerance semantics as
    * [[asofJoin]] (bit-identical on identical inputs, unit-asserted).
    *
    * 100 TB posture: the static side shuffles once per micro-batch plan on
    * the key for the lead window and then broadcasts when dimension-sized;
    * the stream side never shuffles for the join when the static side
    * broadcasts. At billions of right rows, persist the interval-ized form
    * and hand it in directly.
    */
  def asofStream(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      tieBreak: String, toleranceMicros: Option[Long] = None): DataFrame = {
    val rt = "_asof_rt"
    val vTo = "_asof_vto"
    val lt = "_asof_lt"
    val k2 = "_asof_k"

    val w0 = Window.partitionBy(col(key), col(rightTime))
      .orderBy(col(tieBreak).desc)
    val r1 = right.withColumn("_rn", row_number().over(w0))
      .filter(col("_rn") === 1).drop("_rn")
    val wLead = Window.partitionBy(col(key)).orderBy(col(rightTime).asc)
    val intervals = r1
      .withColumn(rt, unix_micros(col(rightTime).cast("timestamp")))
      .withColumn(vTo, lead(col(rt), 1).over(wLead))
      .select(Seq(col(key).as(k2), col(rt), col(vTo)) ++
        payload.map(c => col(c).as(s"_asof_p_$c")): _*)

    val leftCols = left.columns.toSeq
    val probe = left.withColumn(lt,
      unix_micros(col(leftTime).cast("timestamp")))
    val joined = probe.join(intervals,
      probe(key) === intervals(k2) && col(lt) >= col(rt) &&
        (col(vTo).isNull || col(lt) < col(vTo)), "left_outer")
    val fresh: Column = toleranceMicros match {
      case Some(tol) => col(rt).isNotNull && col(lt) - col(rt) <= tol
      case None => col(rt).isNotNull
    }
    payload.foldLeft(joined) { (d, c) =>
      d.withColumn(c, when(fresh, col(s"_asof_p_$c")))
    }.select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
