package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.algebra._
import graft.model.Rdf
import graft.sources.{DirectMapper, GraphCatalog}

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
  lazy val catalog: GraphCatalog = GraphCatalog.testdata(spark, sf)
  lazy val compiler: Compiler = new Compiler(catalog)
}

class CompilerSpec extends AnyFunSuite {
  import TestSpark._
  def pred(t: String, c: String): I = I(DirectMapper.predIri(t, c))
  def cls(t: String): I = I(DirectMapper.classIri(t))

  test("single pattern scan binds object var (S2)") {
    val sol = compiler.compile(Bgp(Seq(
      TriplePattern(V("r"), pred("region", "r_name"), V("name")))))
    val names = sol.df.select(sol.df("name").getField("value")).collect().map(_.getString(0)).sorted
    assert(names.length == 5)
    assert(names.contains("EUROPE"))
  }

  test("star BGP collapses to one scan and joins across tables (J1/J2)") {
    val op = Bgp(Seq(
      TriplePattern(V("n"), I(Rdf.RdfType), cls("nation")),
      TriplePattern(V("n"), pred("nation", "n_name"), V("nname")),
      TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r")),
      TriplePattern(V("r"), pred("region", "r_name"), V("rname"))))
    val sol = compiler.compile(op)
    assert(sol.cert == Set("n", "nname", "r", "rname"))
    val rows = sol.df.select(sol.df("nname").getField("value"), sol.df("rname").getField("value"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows.size == 25)
    assert(rows("NATION_7") == "ASIA")
  }

  test("filter on numeric shadow (P4)") {
    val op = FilterOp(E.gt(E.v("bal"), E.lift(E.termLit(graft.model.RdfTerm.dbl(9000.0)))),
      Bgp(Seq(TriplePattern(V("c"), pred("customer", "c_acctbal"), V("bal")))))
    val sol = compiler.compile(op)
    val n = sol.df.count()
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .filter("c_acctbal > 9000.0").count()
    assert(n == expect)
  }

  test("OPTIONAL keeps left rows; condition inside join (J3)") {
    val left = Bgp(Seq(TriplePattern(V("n"), pred("nation", "n_name"), V("nname"))))
    val right = Bgp(Seq(
      TriplePattern(V("s"), pred("supplier", "s_nationkey"), V("n")),
      TriplePattern(V("s"), pred("supplier", "s_name"), V("sname"))))
    val sol = compiler.compile(LeftJoin(left, right, None))
    val df = sol.df
    assert(sol.cert == Set("n", "nname"))
    assert(sol.maybe == Set("s", "sname"))
    val total = df.count()
    val nations = df.select(df("nname").getField("value")).distinct().count()
    assert(nations == 25) // every nation kept even without suppliers
    val suppliers = spark.read.parquet(s"$sf/supplier.parquet").count()
    val nationsWithSupp = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_nationkey").distinct().count()
    assert(total == suppliers + (25 - nationsWithSupp))
  }

  test("UNION pads missing vars with NULL (U1)") {
    val l = Bgp(Seq(TriplePattern(V("c"), pred("customer", "c_name"), V("name"))))
    val r = Bgp(Seq(TriplePattern(V("s"), pred("supplier", "s_name"), V("name")),
      TriplePattern(V("s"), pred("supplier", "s_acctbal"), V("bal"))))
    val sol = compiler.compile(UnionOp(l, r))
    assert(sol.cert == Set("name"))
    val cnt = sol.df.count()
    val c = spark.read.parquet(s"$sf/customer.parquet").count()
    val s2 = spark.read.parquet(s"$sf/supplier.parquet").count()
    assert(cnt == c + s2)
    assert(sol.df.filter(sol.df("bal").isNull).count() == c)
  }

  test("MINUS removes compatible, keeps disjoint-domain (J4)") {
    val l = Bgp(Seq(TriplePattern(V("n"), pred("nation", "n_name"), V("nname"))))
    val r = Bgp(Seq(TriplePattern(V("s"), pred("supplier", "s_nationkey"), V("n"))))
    val sol = compiler.compile(MinusOp(l, r))
    val nWith = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_nationkey").distinct().count()
    assert(sol.df.count() == 25 - nWith)
    // disjoint domains → no-op
    val r2 = Bgp(Seq(TriplePattern(V("x"), pred("supplier", "s_name"), V("sn"))))
    assert(compiler.compile(MinusOp(l, r2)).df.count() == 25)
  }

  test("NOT EXISTS vs EXISTS (P6/P7)") {
    val l = Bgp(Seq(TriplePattern(V("n"), pred("nation", "n_name"), V("nname"))))
    val r = Bgp(Seq(TriplePattern(V("s"), pred("supplier", "s_nationkey"), V("n"))))
    val nWith = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_nationkey").distinct().count()
    assert(compiler.compile(ExistsOp(l, r, positive = true)).df.count() == nWith)
    assert(compiler.compile(ExistsOp(l, r, positive = false)).df.count() == 25 - nWith)
  }

  test("group/aggregate (A2) matches direct groupBy") {
    val op = Group(Seq("status"), Seq("n" -> Aggs.countStar),
      Bgp(Seq(TriplePattern(V("o"), pred("orders", "o_orderstatus"), V("status")))))
    val sol = compiler.compile(op)
    val got = sol.df.select(sol.df("status").getField("value"),
      sol.df("n").getField("num").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("order by + slice = top-k (O1-O4)") {
    val op = Slice(0, Some(3), OrderBy(Seq((E.v("bal"), false), (E.v("c"), true)),
      Bgp(Seq(TriplePattern(V("c"), pred("customer", "c_acctbal"), V("bal"))))))
    val sol = compiler.compile(op)
    val got = sol.df.select(sol.df("bal").getField("num")).collect().map(_.getDouble(0))
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .orderBy(org.apache.spark.sql.functions.col("c_acctbal").desc)
      .limit(3).collect().map(_.getAs[Double]("c_acctbal"))
    assert(got.sameElements(expect))
  }

  test("VALUES join constrains (J5)") {
    val vals = ValuesOp(Seq("seg"),
      Seq(Seq(Some(graft.model.RdfTerm.str("BUILDING"))),
        Seq(Some(graft.model.RdfTerm.str("AUTOMOBILE")))))
    val pat = Bgp(Seq(TriplePattern(V("c"), pred("customer", "c_mktsegment"), V("seg"))))
    val sol = compiler.compile(JoinOp(pat, vals))
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .filter("c_mktsegment IN ('BUILDING','AUTOMOBILE')").count()
    assert(sol.df.count() == expect)
  }

  test("BGP reorder: a bridging pattern listed LAST still joins on shared " +
      "vars — no Cartesian product in the plan; results match syntactic " +
      "order") {
    // syntactic order: (n_name) x (r_name) share NOTHING -> old reduce
    // cross-joined them before the bridging (n_regionkey) pattern arrived.
    val op = Bgp(Seq(
      TriplePattern(V("n"), pred("nation", "n_name"), V("nname")),
      TriplePattern(V("r"), pred("region", "r_name"), V("rname")),
      TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r"))))
    val sol = compiler.compile(op)
    assert(sol.df.count() == 25) // every nation, its region's name
    val plan = sol.df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bridge must prevent a cross join")
    // same rows as a hand-ordered compile
    val ordered = compiler.compile(Bgp(Seq(
      TriplePattern(V("n"), pred("nation", "n_name"), V("nname")),
      TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r")),
      TriplePattern(V("r"), pred("region", "r_name"), V("rname")))))
    val a = sol.df.select(sol.df("nname").getField("value"),
      sol.df("rname").getField("value")).collect().map(r => (r.getString(0), r.getString(1))).sorted
    val b = ordered.df.select(ordered.df("nname").getField("value"),
      ordered.df("rname").getField("value")).collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(a.sameElements(b))
  }

  test("catalog statistics drive the estimate: computeStatistics counts " +
      "per-predicate triples and the selective pattern leads the join") {
    val cat = GraphCatalog.testdata(spark, sf).computeStatistics()
    val stats = cat.statistics.get
    val liRows = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(stats(DirectMapper.predIri("lineitem", "l_quantity")) == liRows)
    assert(stats(DirectMapper.predIri("region", "r_name")) == 5L)
    // with stats, a region-side pattern (5 rows) is estimated far below a
    // lineitem-side one; the greedy order is observable through the join
    // tree: the first join input should be the region scan. We assert the
    // ESTIMATE ordering (public surface: statistics) rather than plan
    // internals.
    assert(stats(DirectMapper.predIri("region", "r_name")) <
      stats(DirectMapper.predIri("lineitem", "l_quantity")))
  }

  test("stats v2: distinct-object counts refine bound-object selectivity " +
      "— the key-like probe leads the join where variable counting ties") {
    import spark.implicits._
    import graft.model.{Quad, RdfTerm}
    val quads = (0 until 300).flatMap { i =>
      Seq(
        Quad(Rdf.DefaultGraph, s"urn:s/$i", "urn:p/id", RdfTerm.str(s"id$i")),
        Quad(Rdf.DefaultGraph, s"urn:s/$i", "urn:p/cat",
          RdfTerm.str(s"c${i % 3}")))
    }
    val cat = new GraphCatalog(spark)
    cat.addQuads(quads.toDS().toDF())
    cat.computeStatistics()
    val os = cat.objectStatistics.get
    assert(math.abs(os("urn:p/id") - 300L) <= 15) // approx_count_distinct
    assert(os("urn:p/cat") == 3L)
    // both patterns have equal predicate counts and one bound endpoint —
    // the variable-counting heuristic TIES (and syntactic order would
    // start from the flag). With distinct-object counts the id probe
    // estimates 300/300 = 1 row vs 300/3 = 100 and must lead the greedy
    // join; the leftmost (first-joined) leaf prints first in the plan.
    val comp = new Compiler(cat)
    val sol = comp.compile(Bgp(Seq(
      TriplePattern(V("s"), I("urn:p/cat"), L(RdfTerm.str("c1"))),
      TriplePattern(V("s"), I("urn:p/id"), L(RdfTerm.str("id43"))))))
    val plan = sol.df.queryExecution.analyzed.toString
    assert(plan.contains("urn:p/id") && plan.contains("urn:p/cat"))
    assert(plan.indexOf("urn:p/id") < plan.indexOf("urn:p/cat"),
      s"id probe must lead:\n$plan")
    assert(sol.df.count() == 1) // i=43: 43%3=1 → c1, so the join hits
  }
}
