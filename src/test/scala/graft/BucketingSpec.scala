package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketing

/** Bucketed co-located join: both sides bucketed by the join key ⇒ the join
  * plans with NO shuffle Exchange (the write amortizes the shuffle).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", buckets = 8)
    // disable broadcast so the plan shows the fact-fact (sort-merge) shape —
    // at real scale neither side of this join fits a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined = try {
      val j = Bucketing.table(spark, "b_lineitem")
        .join(Bucketing.table(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      j.collect(); j
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    val plan = joined.queryExecution.executedPlan.toString
    // the JOIN itself must not re-shuffle its bucketed inputs; the only
    // exchange allowed is the final small aggregation by status
    val joinSection = plan.split("HashAggregate").last // below the agg
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
      plan)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    // correctness: equals the unbucketed join
    val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expect(k)) < 1e-6) }
  }
}
