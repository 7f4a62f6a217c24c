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

  test("bench reports {cold, median, min}: reps honored (default 5 since " +
      "r15), cold = run 1, min <= median") {
    var calls = 0
    val qs: Seq[(String, Bench.Q)] = Seq(
      "counted" -> ((s: SparkSession, _: String) => { calls += 1; s.range(2).toDF() }))
    val json = Bench.run(spark, "/nonexistent", qs, None, reps = 5)
    assert(calls == 5, s"expected 5 reps, got $calls")
    assert(json.contains(""""queries":{"counted":"""))
    assert(json.contains(""""min":{"counted":"""))
    assert(json.contains(""""cold":{"counted":"""))
    // median, min, cold parse as numbers >= 0 and min <= median
    val num = """"counted":(-?\d+\.\d+)""".r
    val vals = num.findAllMatchIn(json).map(_.group(1).toDouble).toSeq
    assert(vals.size == 3 && vals.forall(_ >= 0.0), json)
    val (median, mn) = (vals(0), vals(1))
    assert(mn <= median, json)
  }

  test("bench JSON is self-evidencing (r17): per-rep seconds + ISO " +
      "instant + 1-min loadavg land in `reps`, including failed reps") {
    val qs: Seq[(String, Bench.Q)] = Seq(
      "ok" -> ((s: SparkSession, _: String) => s.range(3).toDF()),
      "boom" -> ((_: SparkSession, _: String) =>
        throw new RuntimeException("induced failure")))
    val json = Bench.run(spark, "/nonexistent", qs, None, reps = 3)
    // shape: "reps":{"ok":[{"sec":...,"at":"...","load1":...},x3],"boom":[x1]}
    val entry = """\{"sec":(-?\d+\.\d+),"at":"([^"]+)","load1":(-?\d+\.\d+)\}""".r
    val repsBlock = json.substring(json.indexOf("\"reps\":"))
    val entries = entry.findAllMatchIn(repsBlock).toSeq
    assert(entries.size == 4, json) // 3 ok reps + 1 failed rep
    // instants parse as ISO-8601; loadavg is a sane number on this box
    entries.foreach { m =>
      java.time.Instant.parse(m.group(2))
      assert(m.group(3).toDouble >= 0.0, json)
    }
    // the failed rep is recorded with sec = -1.0 inside reps too
    assert(repsBlock.contains(""""boom":[{"sec":-1.000"""), json)
    // per-rep seconds are consistent with the aggregate min
    val okSecs = entry.findAllMatchIn(
      repsBlock.substring(repsBlock.indexOf("\"ok\":")))
      .map(_.group(1).toDouble).toSeq.take(3)
    val minRe = """"min":\{"ok":(-?\d+\.\d+)""".r
    minRe.findFirstMatchIn(json).foreach { m =>
      assert(math.abs(okSecs.min - m.group(1).toDouble) < 0.002, json)
    }
  }

  test("compact headline drops only the reps blob (r18: the stdout tail " +
      "must end with a parseable line carrying the queries map)") {
    val qs: Seq[(String, Bench.Q)] = Seq(
      "ok" -> ((s: SparkSession, _: String) => s.range(3).toDF()))
    val full = Bench.run(spark, "/nonexistent", qs, None, reps = 2)
    val compact = Bench.compact(full)
    assert(!compact.contains("\"reps\""), compact)
    for (f <- Seq("\"metric\"", "\"value\"", "\"failed\"", "\"queries\"",
        "\"min\"", "\"cold\"", "\"sf\""))
      assert(compact.contains(f), s"missing $f in $compact")
    // still one well-formed JSON object: balanced braces, ends cleanly
    assert(compact.count(_ == '{') == compact.count(_ == '}'), compact)
    assert(compact.startsWith("{") && compact.endsWith("}"), compact)
    // a malformed line passes through unchanged rather than being torn
    assert(Bench.compact("not json") == "not json")
  }
}
