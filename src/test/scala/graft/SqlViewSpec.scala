package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL access (the reference's "SQL access over JDBC" repository feature):
  * SPARQL-backed SQL views registered through [[Engine.createSqlView]] and
  * queried with plain spark.sql — type mapping, NULL posture, and the
  * cross-boundary optimization (a SQL filter over the view reaching the
  * SPARQL side's parquet scan).
  */
class SqlViewSpec extends AnyFunSuite {
  import TestSpark._
  lazy val engine = new Engine(catalog)

  test("type mapping: string / bigint / double / timestamp / boolean " +
      "columns from one view; IRIs surface as strings") {
    engine.createSqlView("tm_orders",
      """SELECT ?o ?cust ?tot ?odate WHERE {
        |  ?o <urn:graft/orders#o_custkey> ?cust .
        |  ?o <urn:graft/orders#o_totalprice> ?tot .
        |  ?o <urn:graft/orders#o_orderdate> ?odate .
        |}""".stripMargin,
      Seq("o" -> "string", "cust" -> "string", "tot" -> "double",
        "odate" -> "timestamp"))
    val df = spark.sql(
      "SELECT o, cust, tot, odate FROM tm_orders ORDER BY o LIMIT 3")
    val sch = df.schema
    assert(sch("o").dataType.typeName == "string")
    assert(sch("tot").dataType.typeName == "double")
    assert(sch("odate").dataType.typeName == "timestamp")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).startsWith("urn:graft/orders/")))
    assert(rows.forall(_.getString(1).startsWith("urn:graft/customer/")))
    assert(rows.forall(!_.isNullAt(3)))
    // the timestamp is rebuilt from the epoch shadow — cross-check one
    // value against the raw parquet
    val raw = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("min(cast(o_orderdate as timestamp))").collect()(0)
      .getTimestamp(0)
    val viaView = spark.sql("SELECT min(odate) FROM tm_orders")
      .collect()(0).getTimestamp(0)
    assert(raw == viaView)
  }

  test("numeric columns guard on the numeric shadow: a STRING-valued " +
      "term under a declared numeric type is NULL, not an ANSI cast error") {
    engine.createSqlView("tm_badnum",
      "SELECT ?n WHERE { ?r <urn:graft/region#r_name> ?n }",
      Seq("n" -> "bigint"))
    val vals = spark.sql("SELECT n FROM tm_badnum").collect()
    assert(vals.nonEmpty && vals.forall(_.isNullAt(0)))
  }

  test("unbound solutions surface as SQL NULLs (OPTIONAL var)") {
    engine.createSqlView("tm_opt",
      """SELECT ?rname ?comment WHERE {
        |  ?r <urn:graft/region#r_name> ?rname .
        |  OPTIONAL { ?r <urn:graft/region#no_such_column> ?comment }
        |}""".stripMargin,
      Seq("rname" -> "string", "comment" -> "string"))
    val rows = spark.sql("SELECT rname, comment FROM tm_opt").collect()
    assert(rows.length == 5 && rows.forall(_.isNullAt(1)))
  }

  test("undeclared variable in the column list is a loud error") {
    val e = intercept[IllegalArgumentException] {
      engine.createSqlView("tm_bad",
        "SELECT ?n WHERE { ?r <urn:graft/region#r_name> ?n }",
        Seq("nope" -> "string"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("cross-boundary optimization: a spark.sql filter over the view " +
      "pushes into the SPARQL side's parquet scan") {
    engine.createSqlView("tm_push",
      """SELECT ?c ?bal WHERE {
        |  ?c <urn:graft/customer#c_acctbal> ?bal .
        |}""".stripMargin,
      Seq("c" -> "string", "bal" -> "double"))
    val df = spark.sql("SELECT c FROM tm_push WHERE bal > 9000.0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(c_acctbal,9000.0"), plan)
    // and it still answers correctly
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .filter("c_acctbal > 9000.0").count()
    assert(df.count() == expect)
  }

  test("views join each other through plain SQL with exact aggregates") {
    engine.createSqlView("tm_cust",
      """SELECT ?nat ?bal WHERE {
        |  ?c <urn:graft/customer#c_acctbal> ?bal .
        |  ?c <urn:graft/customer#c_nationkey> ?nat . }""".stripMargin,
      Seq("nat" -> "string", "bal" -> "double"))
    engine.createSqlView("tm_nat",
      "SELECT ?n ?nname WHERE { ?n <urn:graft/nation#n_name> ?nname }",
      Seq("n" -> "string", "nname" -> "string"))
    val got = spark.sql(
      """SELECT nname, count(*) AS cnt FROM tm_cust
        |JOIN tm_nat ON tm_cust.nat = tm_nat.n
        |GROUP BY nname ORDER BY nname""".stripMargin).collect()
    val exp = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .groupBy("n_name").count()
      .orderBy("n_name").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exp.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
