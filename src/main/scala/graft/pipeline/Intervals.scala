package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed INTERVAL join — point-in-interval matching as an EQUI-join
  * (the temporal sibling of the spatial grid join, and the third member of
  * the never-a-cross-join family next to [[AsOf]] and `GeoSpatial`).
  *
  * A naive point×interval theta-join is a BroadcastNestedLoop/cartesian at
  * scale. Instead both sides map to fixed-width time BUCKETS: a point lands
  * in exactly ONE bucket; an interval explodes to the buckets it covers
  * (≤ ⌈len/width⌉ + 1 — choose `bucketMicros` ≥ the typical interval length
  * so that is ≤ 2). The join is then a plain shuffled equi-join on
  * (key, bucket) with the exact containment predicate inside it, and since
  * each point occupies a single bucket every qualifying pair is emitted
  * exactly once — NO post-join distinct.
  */
object Intervals {

  /** @param points     (key, time) rows — `ptime` castable to timestamp
    * @param intervals  (key, start) rows; the interval is the HALF-OPEN
    *                   `[start, start + lenMicros)` window
    * @param bucketMicros bucket width; ≥ lenMicros keeps the explode ≤ 2
    * @return all point/interval pairs with the point inside the window:
    *         every column of both inputs (interval columns suffixed `_i`)
    */
  def pointInInterval(points: DataFrame, key: String, ptime: String,
      intervals: DataFrame, ikey: String, start: String,
      lenMicros: Long, bucketMicros: Long): DataFrame = {
    require(lenMicros > 0 && bucketMicros > 0)
    val nBuckets = (lenMicros + bucketMicros - 1) / bucketMicros + 1
    def bucketOf(c: Column): Column = {
      val m = unix_micros(c.cast("timestamp"))
      ((m - pmod(m, lit(bucketMicros))) / lit(bucketMicros)).cast("long")
    }
    val p = points.withColumn("_pb", bucketOf(col(ptime)))
      .withColumn("_pm", unix_micros(col(ptime).cast("timestamp")))
    // The join key gets an INTERNAL suffixed name ("_ik"), never the bare
    // ikey: Spark's name-based drop removes every column with that name, so
    // dropping a bare ikey when key == ikey (the common case) would also
    // drop the point side's key column.
    val i0 = intervals.select(intervals.columns.map(c =>
      col(c).as(if (c == ikey) s"${c}_ik" else s"${c}_i")): _*)
    val i = i0
      .withColumn("_sm", unix_micros(col(s"${start}_i").cast("timestamp")))
      .withColumn("_ib", explode(sequence(lit(0L), lit(nBuckets - 1))))
      .withColumn("_ibk", bucketOf(col(s"${start}_i")) + col("_ib"))
    p.join(i, p(key) === i(s"${ikey}_ik") && col("_pb") === col("_ibk") &&
        col("_pm") >= col("_sm") && col("_pm") < col("_sm") + lenMicros)
      .drop("_pb", "_pm", "_sm", "_ib", "_ibk", s"${ikey}_ik")
  }
}
