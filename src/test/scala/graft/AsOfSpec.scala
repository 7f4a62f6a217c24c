package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.AsOf

class AsOfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left time; " +
      "no match before the first right row") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 02:00:00"), 11L),
      (2L, ts("2024-01-01 01:00:00"), 20L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts("2024-01-01 01:00:00"), 100L),
      (1L, ts("2024-01-01 01:30:00"), 101L))
      .toDF("user_id", "ts", "click_id")
    val got = AsOf.asofJoin(left, right, "user_id", "ts", "ts",
      Seq("click_id"), tieBreak = "click_id")
      .select("event_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got == Set((10L, None), (11L, Some(101L)), (20L, None)))
  }

  test("equal timestamps match (<= semantics); right ties resolve to the " +
      "greatest tie-break; tolerance nulls stale matches") {
    val left = Seq((1L, ts("2024-01-01 01:00:00"), 10L),
      (1L, ts("2024-01-01 09:00:00"), 11L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts("2024-01-01 01:00:00"), 100L),
      (1L, ts("2024-01-01 01:00:00"), 102L)) // tie: 102 wins
      .toDF("user_id", "ts", "click_id")
    val got = AsOf.asofJoin(left, right, "user_id", "ts", "ts",
      Seq("click_id"), tieBreak = "click_id",
      toleranceMicros = Some(2L * 3600 * 1000000))
      .select("event_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    // 01:00 event matches the equal-time click (tie → 102); the 09:00
    // event's only candidate is 8h old → nulled by the 2h tolerance
    assert(got == Set((10L, Some(102L)), (11L, None)))
  }

  test("payload travels as the matched row VERBATIM: a NULL payload column " +
      "on the latest right row stays NULL, never back-filled from an " +
      "older right row") {
    val left = Seq((1L, ts("2024-01-01 03:00:00"), 10L))
      .toDF("user_id", "ts", "event_id")
    // older row has q=5; the LATEST qualifying row has q=NULL — the match
    // must carry (q=NULL, src="new"), not mix q=5 from the older row
    val right = Seq(
      (1L, ts("2024-01-01 01:00:00"), Some(5L), "old"),
      (1L, ts("2024-01-01 02:00:00"), None, "new"))
      .toDF("user_id", "ts", "q", "src")
    val got = AsOf.asofJoin(left, right, "user_id", "ts", "ts",
      Seq("q", "src"), tieBreak = "src").select("q", "src").collect()
    assert(got.length == 1 && got(0).isNullAt(0) &&
      got(0).getString(1) == "new")
  }

  test("asofStream (interval-ized stream-static form) is bit-identical to " +
      "asofJoin on the same inputs, ties and tolerance included") {
    val ev = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val batch = AsOf.asofJoin(purchases, clicks, "user_id", "ts", "ts",
      Seq("click_id"), tieBreak = "click_id",
      toleranceMicros = Some(2L * 3600 * 1000000))
    val streamShaped = AsOf.asofStream(purchases, clicks, "user_id", "ts",
      "ts", Seq("click_id"), tieBreak = "click_id",
      toleranceMicros = Some(2L * 3600 * 1000000))
    assert(rows(batch) == rows(streamShaped) && batch.count() > 0)
  }

  test("interval join with identical key names on both sides keeps the " +
      "point-side key column (name-based drop must not remove it)") {
    val pts = Seq((1L, ts("2024-01-01 00:00:30"), 10L))
      .toDF("cust", "ts", "pid")
    val ivs = Seq((1L, ts("2024-01-01 00:00:00"), 20L))
      .toDF("cust", "start", "iid")
    val out = graft.pipeline.Intervals.pointInInterval(pts, "cust", "ts",
      ivs, "cust", "start", lenMicros = 60000000L, bucketMicros = 60000000L)
    assert(out.columns.count(_ == "cust") == 1)
    val r = out.select("cust", "pid", "iid_i").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 10L, 20L)))
  }
}
