package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Layout

class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("interleaveBits is the Morton curve: bit b of dim i at position b·n+i") {
    // x=0b11, y=0b01, 2 bits → positions: x0→0, y0→1, x1→2, y1→3 = 0b0111
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(z == 7L)
    // degenerate single dim = identity on the rank
    val one = Seq(Tuple1(5L)).toDF("x")
      .select(Layout.interleaveBits(Seq(col("x")), 3).as("z")).as[Long].head()
    assert(one == 5L)
  }

  test("zOrderWrite is lossless and 2-D range queries match the source") {
    val df = spark.range(5000).select(col("id"),
      pmod(hash(col("id")), lit(1000)).cast("double").as("x"),
      pmod(hash(col("id"), lit(7)), lit(1000)).cast("double").as("y"))
    val path = "/tmp/graft_layout_spec_rt"
    Layout.zOrderWrite(df, path, Seq("x", "y"), bits = 12, partitions = 8)
    val back = spark.read.parquet(path)
    assert(back.count() == 5000)
    def q(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("x").between(100, 300) && col("y").between(400, 700))
        .select("id").as[Long].collect().toSet
    assert(q(back) == q(df) && q(df).nonEmpty)
  }

  test("z-ordered files carry tight per-file spans on BOTH dimensions " +
      "(the footer-stats pruning precondition)") {
    val df = spark.range(20000).select(col("id"),
      pmod(hash(col("id")), lit(10000)).cast("double").as("x"),
      pmod(hash(col("id"), lit(13)), lit(10000)).cast("double").as("y"))
    val zPath = "/tmp/graft_layout_spec_z"
    val uPath = "/tmp/graft_layout_spec_u"
    Layout.zOrderWrite(df, zPath, Seq("x", "y"), bits = 14, partitions = 8)
    df.repartition(8).write.mode("overwrite").parquet(uPath)
    def meanSpan(path: String, dim: String): Double =
      Layout.fileSpans(spark, path, dim).agg(avg("span")).as[Double].head()
    // random layout: every file spans ~the full range; z-order: each file a
    // small hyper-rectangle on every clustered dim
    Seq("x", "y").foreach { d =>
      val z = meanSpan(zPath, d); val u = meanSpan(uPath, d)
      assert(z < 0.7 * u, s"dim $d: z-span $z not tighter than random $u")
    }
  }
}
