package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact must make failures VISIBLE: a query that throws is
  * recorded as -1.0 and listed in `failed`, never as a (smaller-looking)
  * elapsed-to-crash timing that could sneak a broken run past the time gate.
  */
class BenchSpec extends AnyFunSuite {
  import TestSpark.spark

  test("bench records an induced failure explicitly, not as a fake timing") {
    val qs: Seq[(String, Bench.Q)] = Seq(
      "ok" -> ((s: SparkSession, _: String) => s.range(3).toDF()),
      "boom" -> ((_: SparkSession, _: String) =>
        throw new RuntimeException("induced failure")))
    val json = Bench.run(spark, "/nonexistent", qs, None)
    assert(json.contains(""""failed":["boom"]"""))
    assert(json.contains(""""boom":-1.000"""))
    assert(json.contains(""""ok":"""))
    assert(!json.contains(""""failed":[]"""))
  }

  test("bench reports {cold, median}: median of 3 reps, cold = run 1") {
    var calls = 0
    val qs: Seq[(String, Bench.Q)] = Seq(
      "counted" -> ((s: SparkSession, _: String) => { calls += 1; s.range(2).toDF() }))
    val json = Bench.run(spark, "/nonexistent", qs, None, reps = 3)
    assert(calls == 3, s"expected 3 reps, got $calls")
    assert(json.contains(""""queries":{"counted":"""))
    assert(json.contains(""""cold":{"counted":"""))
    // the median and cold keys parse as numbers >= 0
    val num = """"counted":(-?\d+\.\d+)""".r
    val vals = num.findAllMatchIn(json).map(_.group(1).toDouble).toSeq
    assert(vals.size == 2 && vals.forall(_ >= 0.0), json)
  }
}
