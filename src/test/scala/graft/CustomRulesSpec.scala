package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.inference.CustomRules
import graft.inference.CustomRules.{Iri, Var}
import graft.model.{Quad, Rdf, RdfTerm}

/** Custom rulesets ([[graft.inference.CustomRules]]) — the user-defined
  * `.pie` ruleset analog: parser shape, semi-naive fixpoint depth,
  * chained rules, transitive recursion, literal-subject guards, and the
  * loud error posture.
  */
class CustomRulesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def quads(ts: (String, String, String)*): org.apache.spark.sql.DataFrame =
    ts.map { case (s, p, o) =>
      Quad(Rdf.DefaultGraph, s, p, RdfTerm.iri(o)) }.toDS().toDF()

  private def facts(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(1), r.getString(2),
      r.getStruct(3).getString(1))).toSet

  test("parser: prefix resolution, variables vs constants, premises/" +
      "conclusions split, comments; errors are loud") {
    val rules = CustomRules.parse(
      """// a two-rule set
        |Prefices { x : <urn:x:> }
        |Rules {
        |  Id: compose
        |    a <urn:p> b   // premise comment
        |    b x:q c
        |    ----------------
        |    a x:r c
        |  Id: mirror
        |    a x:r b
        |    -----
        |    b x:rInv a
        |}""".stripMargin)
    assert(rules.map(_.name) == Seq("compose", "mirror"))
    assert(rules.head.premises == Seq(
      CustomRules.RuleAtom(Var("a"), Iri("urn:p"), Var("b")),
      CustomRules.RuleAtom(Var("b"), Iri("urn:x:q"), Var("c"))))
    assert(rules.head.conclusions ==
      Seq(CustomRules.RuleAtom(Var("a"), Iri("urn:x:r"), Var("c"))))
    // unbound conclusion variable is rejected at parse
    val e = intercept[IllegalArgumentException](CustomRules.parse(
      "Rules { Id: bad\n a <urn:p> b\n ---\n a <urn:q> zz }"))
    assert(e.getMessage.contains("zz"))
    // undeclared prefix is rejected
    assert(intercept[IllegalArgumentException](CustomRules.parse(
      "Rules { Id: b2\n a nope:q b\n ---\n b nope:q a }"))
      .getMessage.contains("nope"))
  }

  test("chained rules need the semi-naive fixpoint: rule 2 consumes " +
      "rule 1's derivations") {
    val in = quads(
      ("urn:li1", "urn:suppOf", "urn:s1"),
      ("urn:s1", "urn:natOf", "urn:n1"),
      ("urn:n1", "urn:regOf", "urn:r1"))
    val rules = CustomRules.parse(
      """Prefices { x : <urn:x:> }
        |Rules {
        |  Id: supp_nation
        |    li <urn:suppOf> s
        |    s <urn:natOf> n
        |    ---
        |    li x:nation n
        |  Id: supp_region
        |    li x:nation n
        |    n <urn:regOf> r
        |    ---
        |    li x:region r
        |}""".stripMargin)
    val out = facts(CustomRules.materialize(spark, in, rules))
    assert(out.contains(("urn:li1", "urn:x:nation", "urn:n1")))
    assert(out.contains(("urn:li1", "urn:x:region", "urn:r1")))
    assert(out.size == 5)
  }

  test("transitive recursion converges at the closure (chain of 6 — " +
      "depth needs log-ish semi-naive rounds, not one pass)") {
    val chain = (1 to 6).map(i => (s"urn:v$i", "urn:next", s"urn:v${i + 1}"))
    val rules = CustomRules.parse(
      """Rules {
        |  Id: trans
        |    a <urn:next> b
        |    b <urn:next> c
        |    ---
        |    a <urn:next> c
        |}""".stripMargin)
    val out = facts(CustomRules.materialize(spark, quads(chain: _*), rules))
    // closure of a 7-node chain: all i<j pairs = 21 edges
    assert(out.count(_._2 == "urn:next") == 21, out.size)
  }

  test("a literal binding never becomes a subject; a non-IRI binding " +
      "never becomes a predicate (guarded drop, not a crash)") {
    val in = Seq(
      Quad(Rdf.DefaultGraph, "urn:a", "urn:val", RdfTerm.str("five")),
      Quad(Rdf.DefaultGraph, "urn:a", "urn:val", RdfTerm.iri("urn:b")))
      .toDS().toDF()
    val rules = CustomRules.parse(
      """Rules {
        |  Id: flip
        |    a <urn:val> v
        |    ---
        |    v <urn:of> a
        |}""".stripMargin)
    val out = facts(CustomRules.materialize(spark, in, rules))
    assert(out.contains(("urn:b", "urn:of", "urn:a")))
    assert(!out.exists(t => t._1 == "five"))
  }

  test("stratification: a non-recursive chain topo-orders (rule 2 after " +
      "rule 1 even when written first); transitive/recursive and " +
      "variable-predicate rulesets decline") {
    val chain = CustomRules.parse(
      """Prefices { x : <urn:x:> }
        |Rules {
        |  Id: second
        |    li x:nation n
        |    n <urn:regOf> r
        |    ---
        |    li x:region r
        |  Id: first
        |    li <urn:suppOf> s
        |    s <urn:natOf> n
        |    ---
        |    li x:nation n
        |}""".stripMargin)
    val order = CustomRules.stratify(chain)
    assert(order.map(_.map(_.name)).contains(Seq("first", "second")))
    val trans = CustomRules.parse(
      """Rules { Id: t
        |  a <urn:next> b
        |  b <urn:next> c
        |  ---
        |  a <urn:next> c }""".stripMargin)
    assert(CustomRules.stratify(trans).isEmpty)
    // the stratified path must still produce the chained closure
    val in = quads(
      ("urn:li1", "urn:suppOf", "urn:s1"),
      ("urn:s1", "urn:natOf", "urn:n1"),
      ("urn:n1", "urn:regOf", "urn:r1"))
    val out = facts(CustomRules.materialize(spark, in, chain))
    assert(out.contains(("urn:li1", "urn:x:region", "urn:r1")))
    assert(out.size == 5)
  }

  test("repository knob: create(rulesetPie), INSERT DATA maintains the " +
      "custom closure incrementally, conflicting rulesets refuse") {
    val repos = new graft.sources.Repositories(spark)
    repos.create("crules", graft.sources.RepoConfig(rulesetPie = Some(
      """Rules {
        |  Id: trans
        |    a <urn:next> b
        |    b <urn:next> c
        |    ---
        |    a <urn:next> c
        |}""".stripMargin)))
    repos.update("crules",
      "INSERT DATA { <urn:v1> <urn:next> <urn:v2> . " +
        "<urn:v2> <urn:next> <urn:v3> }")
    // closure after the first insert: 1->2, 2->3, 1->3
    assert(repos.size("crules") == 3)
    // an ADDITIVE update extends the chain; incremental re-close derives
    // the new closure edges without recomputing the old ones
    repos.update("crules",
      "INSERT DATA { <urn:v3> <urn:next> <urn:v4> }")
    // 4-node chain closure: 6 pairs
    assert(repos.size("crules") == 6)
    // a DELETE re-materializes from asserted: derived facts that lose
    // support disappear
    repos.update("crules",
      "DELETE DATA { <urn:v2> <urn:next> <urn:v3> }")
    // asserted: 1->2, 3->4 — nothing derivable
    assert(repos.size("crules") == 2)
    // one ruleset per repository, like the binary
    assertThrows[IllegalArgumentException](repos.create("both",
      graft.sources.RepoConfig(inference = true,
        rulesetPie = Some("Rules { Id: t\n a <urn:p> b\n ---\n b <urn:p> a }"))))
  }

  test("no fixpoint within maxIters is a loud error (a rule that mints " +
      "fresh IRIs would never converge — the subset cannot, so use a " +
      "tiny iteration cap on a deep chain instead)") {
    val chain = (1 to 30).map(i => (s"urn:w$i", "urn:next", s"urn:w${i + 1}"))
    val rules = CustomRules.parse(
      """Rules {
        |  Id: trans
        |    a <urn:next> b
        |    b <urn:next> c
        |    ---
        |    a <urn:next> c
        |}""".stripMargin)
    assertThrows[IllegalStateException](
      CustomRules.materialize(spark, quads(chain: _*), rules, maxIters = 2))
  }

  test("r15 parser: http:// IRIs are not comments — inline, in Prefices, " +
      "and next to real // comments") {
    val rules = CustomRules.parse(
      """Prefices { x : <http://example.org/ns#> } // real comment
        |Rules {
        |  Id: t1 // trailing comment
        |    a <http://example.org/p> b
        |    ---
        |    a x:q b
        |}""".stripMargin)
    assert(rules.head.premises ==
      Seq(CustomRules.RuleAtom(Var("a"), Iri("http://example.org/p"), Var("b"))))
    assert(rules.head.conclusions ==
      Seq(CustomRules.RuleAtom(Var("a"), Iri("http://example.org/ns#q"), Var("b"))))
  }

  test("r15 parser: brace balancing — trailing junk after the Rules block " +
      "is rejected, Prefices AFTER Rules still resolves") {
    val e = intercept[IllegalArgumentException](CustomRules.parse(
      "Rules { Id: t\n a <urn:p> b\n ---\n b <urn:p> a }\nstray }"))
    assert(e.getMessage.contains("unexpected content"))
    // block order is free: Prefices below Rules
    val rules = CustomRules.parse(
      "Rules { Id: t\n a x:p b\n ---\n b x:p a }\nPrefices { x : <urn:x:> }")
    assert(rules.head.premises.head.p == Iri("urn:x:p"))
  }

  test("r15 parser: literal constants — plain/lang/typed/escaped strings " +
      "and bare numerics, object position only") {
    import CustomRules.Lit
    val rules = CustomRules.parse(
      """Prefices { xsd : <http://www.w3.org/2001/XMLSchema#> }
        |Rules {
        |  Id: lits
        |    a <urn:name> "Dublin City"
        |    a <urn:label> "BAC"@ga
        |    a <urn:pop> 5
        |    a <urn:rate> 2.5
        |    a <urn:big> 1e3
        |    a <urn:t> "x\ty"^^xsd:string
        |    ---
        |    a <urn:ok> "yes"
        |}""".stripMargin)
    val prem = rules.head.premises.map(_.o)
    assert(prem(0) == Lit(RdfTerm.str("Dublin City"))) // space inside token
    assert(prem(1) == Lit(RdfTerm.lang("BAC", "ga")))
    assert(prem(2) == Lit(RdfTerm.typed("5", Rdf.XsdInteger)))
    assert(prem(3) == Lit(RdfTerm.typed("2.5", Rdf.XsdDecimal)))
    assert(prem(4) == Lit(RdfTerm.typed("1e3", Rdf.XsdDouble)))
    assert(prem(5) == Lit(RdfTerm.typed("x\ty",
      "http://www.w3.org/2001/XMLSchema#string")))
    assert(rules.head.conclusions.head.o == Lit(RdfTerm.str("yes")))
    // literal in subject or predicate position is a loud parse error
    assertThrows[IllegalArgumentException](CustomRules.parse(
      "Rules { Id: bad\n \"x\" <urn:p> b\n ---\n b <urn:p> b }"))
    assertThrows[IllegalArgumentException](CustomRules.parse(
      "Rules { Id: bad\n a \"p\" b\n ---\n b <urn:q> b }"))
  }

  test("r15 evaluation: literal guards match sameTerm (typed integer from " +
      "the store matches a bare-numeric atom; lang tags distinguish)") {
    import spark.implicits._
    val in = Seq(
      Quad(Rdf.DefaultGraph, "urn:n1", "urn:key", RdfTerm.int(0)),
      Quad(Rdf.DefaultGraph, "urn:n2", "urn:key", RdfTerm.int(7)),
      Quad(Rdf.DefaultGraph, "urn:n1", "urn:lbl", RdfTerm.lang("x", "en")),
      Quad(Rdf.DefaultGraph, "urn:n2", "urn:lbl", RdfTerm.lang("x", "fr"))
    ).toDS().toDF()
    val rules = CustomRules.parse(
      """Rules {
        |  Id: zero
        |    n <urn:key> 0
        |    ---
        |    n <urn:isZero> "yes"
        |  Id: english
        |    n <urn:lbl> "x"@en
        |    ---
        |    n <urn:isEn> "yes"
        |}""".stripMargin)
    val out = facts(CustomRules.materialize(spark, in, rules))
    assert(out.contains(("urn:n1", "urn:isZero", "yes")))
    assert(!out.contains(("urn:n2", "urn:isZero", "yes")))
    assert(out.contains(("urn:n1", "urn:isEn", "yes")))
    assert(!out.contains(("urn:n2", "urn:isEn", "yes")))
  }

  test("r15 Axioms block: ground facts insert at materialize and feed " +
      "rule premises; non-ground axioms refuse") {
    val rs = CustomRules.parseRuleset(
      """Prefices { x : <urn:x:> }
        |Axioms {
        |  <urn:cfg> x:flag "on"
        |  <urn:cfg> x:kind <urn:k1>
        |}
        |Rules {
        |  Id: gated
        |    c x:flag "on"
        |    n <urn:edge> m
        |    ---
        |    n x:audited m
        |}""".stripMargin)
    assert(rs.axioms.size == 2)
    assert(rs.axioms.head.o == RdfTerm.str("on"))
    val in = quads(("urn:a", "urn:edge", "urn:b"))
    val out = facts(CustomRules.materializeRuleset(spark, in, rs))
    assert(out.contains(("urn:a", "urn:x:audited", "urn:b")))
    assert(out.contains(("urn:cfg", "urn:x:flag", "on")))
    assert(out.contains(("urn:cfg", "urn:x:kind", "urn:k1")))
    assertThrows[IllegalArgumentException](CustomRules.parseRuleset(
      "Axioms { a <urn:p> <urn:o> }\n" +
        "Rules { Id: t\n a <urn:p> b\n ---\n b <urn:p> a }"))
  }

  test("r15 Consistency sections: no-conclusion rules forbid their " +
      "premises; conclusion rules demand entailment; repository updates " +
      "gate transactionally") {
    import CustomRules.Consistency
    val rs = CustomRules.parseRuleset(
      """Prefices { x : <urn:x:> }
        |Rules {
        |  Id: sym
        |    a x:knows b
        |    ---
        |    b x:knows a
        |  Consistency: no_self_knows // premises must never match
        |    a x:knows a
        |  Consistency: knower_named // every knower must have a name
        |    a x:knows b
        |    ---
        |    a x:name n
        |}""".stripMargin)
    assert(rs.consistencies.map(_.name) == Seq("no_self_knows", "knower_named"))
    assert(rs.consistencies.head.conclusions.isEmpty)
    // violations: direct evaluation over a closed store
    val good = CustomRules.materializeRuleset(spark, quads(
      ("urn:a", "urn:x:knows", "urn:b"),
      ("urn:a", "urn:x:name", "urn:n1"),
      ("urn:b", "urn:x:name", "urn:n2")), rs)
    rs.consistencies.foreach { c =>
      assert(CustomRules.violations(good, c).isEmpty, c.name)
    }
    val selfLoop = CustomRules.materializeRuleset(spark, quads(
      ("urn:c", "urn:x:knows", "urn:c"),
      ("urn:c", "urn:x:name", "urn:n3")), rs)
    assert(!CustomRules.violations(selfLoop, rs.consistencies.head).isEmpty)
    // the DERIVED symmetric edge needs b to be named too: b unnamed →
    // knower_named violated on the closure even though the asserted
    // store looks fine
    val unnamed = CustomRules.materializeRuleset(spark, quads(
      ("urn:a", "urn:x:knows", "urn:b"),
      ("urn:a", "urn:x:name", "urn:n1")), rs)
    val v = CustomRules.violations(unnamed, rs.consistencies(1))
    assert(v.collect().map(_.getStruct(0).getString(1)).toSet == Set("urn:b"))
    // repository gate: a violating update throws and leaves the store
    val repos = new graft.sources.Repositories(spark)
    repos.create("ccons", graft.sources.RepoConfig(rulesetPie = Some(
      """Prefices { x : <urn:x:> }
        |Rules {
        |  Id: sym
        |    a x:knows b
        |    ---
        |    b x:knows a
        |  Consistency: no_self_knows
        |    a x:knows a
        |}""".stripMargin)))
    repos.update("ccons",
      "INSERT DATA { <urn:a> <urn:x:knows> <urn:b> }")
    assert(repos.size("ccons") == 2) // + the symmetric derivation
    val e = intercept[IllegalStateException](repos.update("ccons",
      "INSERT DATA { <urn:z> <urn:x:knows> <urn:z> }"))
    assert(e.getMessage.contains("no_self_knows"))
    assert(repos.size("ccons") == 2) // transaction aborted, store unchanged
  }

  test("r15 repository knob: axioms participate in the repo closure " +
      "across updates") {
    val repos = new graft.sources.Repositories(spark)
    repos.create("crules15", graft.sources.RepoConfig(rulesetPie = Some(
      """Prefices { x : <urn:x:> }
        |Axioms { <urn:root> x:level 0 }
        |Rules {
        |  Id: mark
        |    r x:level 0
        |    n <urn:under> r
        |    ---
        |    n x:topLevel "yes"
        |}""".stripMargin)))
    repos.update("crules15",
      "INSERT DATA { <urn:v1> <urn:under> <urn:root> }")
    val got = facts(repos.quads("crules15"))
    assert(got.contains(("urn:v1", "urn:x:topLevel", "yes")))
    assert(got.contains(("urn:root", "urn:x:level", "0")))
  }
}
