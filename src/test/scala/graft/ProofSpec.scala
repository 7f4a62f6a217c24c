package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Proof plugin (r15): SPARQL `proof:explain` surface over an inference
  * repository — rule names, antecedent accessors, solution grouping,
  * explicit self-explanations, VALUES-driven targets.
  */
class ProofSpec extends AnyFunSuite {
  import TestSpark.spark

  private val prologue = "PREFIX proof: <http://www.ontotext.com/proof/>\n" +
    "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"

  private lazy val engine: Engine = {
    val ttl = java.nio.file.Files.createTempFile("graft_proof", ".ttl")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |t:name rdfs:domain t:Nation .
        |t:Nation rdfs:subClassOf t:Place .
        |t:Place rdfs:subClassOf t:Thing .
        |<urn:n0> t:name "zero" .""".stripMargin)
    val repos = new graft.sources.Repositories(spark)
    repos.create("proofs", graft.sources.RepoConfig(inference = true))
    repos.load("proofs", ttl.toString)
    repos.engine("proofs")
  }

  private def rows(q: String): Seq[Seq[String]] = {
    val df = engine.select(prologue + q)
    df.collect().toSeq.map(r => df.columns.indices.map { i =>
      val t = r.getStruct(i)
      if (t == null) null else t.getString(1)
    })
  }

  test("a domain-derived type explains as one rule_domain application " +
    "with the schema and data antecedents sharing a solution id") {
    val got = rows(
      """SELECT ?sol ?rule ?as ?ap WHERE {
        |  ?sol proof:explain (<urn:n0> rdf:type <urn:t#Nation>) .
        |  ?sol proof:rule ?rule . ?sol proof:subject ?as .
        |  ?sol proof:predicate ?ap .
        |}""".stripMargin)
    assert(got.size == 2, got)
    assert(got.map(_(1)).toSet == Set("rule_domain"))
    assert(got.map(_.head).toSet.size == 1) // one application, one sol id
    assert(got.map(r => (r(2), r(3))).toSet == Set(
      ("urn:t#name", "http://www.w3.org/2000/01/rdf-schema#domain"),
      ("urn:n0", "urn:t#name")))
  }

  test("a subclass chain explains step-by-step against the closed store") {
    // n0 a t:Thing ← [n0 a t:Place] + [Place sco Thing]; the intermediate
    // type is itself a store fact, so the single step is complete
    val got = rows(
      """SELECT ?rule ?as WHERE {
        |  ?sol proof:explain (<urn:n0> rdf:type <urn:t#Thing>) .
        |  ?sol proof:rule ?rule . ?sol proof:subject ?as .
        |}""".stripMargin)
    assert(got.map(_.head).toSet == Set("rule_subclass"))
    assert(got.map(_(1)).toSet == Set("urn:t#Place", "urn:n0"))
  }

  test("an asserted statement explains as `explicit` (itself the single " +
    "antecedent); an underivable statement has no explanation") {
    val got = rows(
      """SELECT ?rule ?as ?ao WHERE {
        |  ?sol proof:explain (<urn:n0> <urn:t#name> "zero") .
        |  ?sol proof:rule ?rule . ?sol proof:subject ?as .
        |  ?sol proof:object ?ao .
        |}""".stripMargin)
    assert(got == Seq(Seq("explicit", "urn:n0", "zero")), got)
    assert(rows(
      """SELECT ?rule WHERE {
        |  ?sol proof:explain (<urn:n0> rdf:type <urn:t#Missing>) .
        |  ?sol proof:rule ?rule .
        |}""".stripMargin).isEmpty)
  }

  test("VALUES-driven targets bind the explain collection variables " +
    "(the GraphDB usage verbatim)") {
    val got = rows(
      """SELECT ?o ?rule WHERE {
        |  VALUES (?s ?p ?o) {
        |    (<urn:n0> rdf:type <urn:t#Nation>)
        |    (<urn:n0> rdf:type <urn:t#Place>)
        |  }
        |  ?sol proof:explain (?s ?p ?o) .
        |  ?sol proof:rule ?rule .
        |}""".stripMargin)
    // 2 antecedent rows per application: domain for Nation, subclass for
    // Place
    assert(got.count(_ == Seq("urn:t#Nation", "rule_domain")) == 2, got)
    assert(got.count(_ == Seq("urn:t#Place", "rule_subclass")) == 2, got)
    assert(got.size == 4, got)
  }

  test("a custom-ruleset repository explains derivations under its own " +
    "PIE rules — rule name, premise quads as antecedents") {
    val ttl = java.nio.file.Files.createTempFile("graft_cproof", ".ttl")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> .
        |<urn:a> t:leads <urn:b> .
        |<urn:b> t:leads <urn:c> .""".stripMargin)
    val repos = new graft.sources.Repositories(spark)
    repos.create("cpf", graft.sources.RepoConfig(rulesetPie = Some(
      """Prefices { t : <urn:t#> }
        |Rules {
        |  Id: leads2
        |    x t:leads y
        |    y t:leads z
        |    ---
        |    x t:reaches z
        |}""".stripMargin)))
    repos.load("cpf", ttl.toString)
    val df = repos.engine("cpf").select(prologue +
      """SELECT ?sol ?rule ?as ?ao ?idx WHERE {
        |  ?sol proof:explain (<urn:a> <urn:t#reaches> <urn:c>) .
        |  ?sol proof:rule ?rule . ?sol proof:subject ?as .
        |  ?sol proof:object ?ao .
        |}""".stripMargin)
    val got = df.collect().toSeq.map(r =>
      (r.getStruct(1).getString(1), r.getStruct(2).getString(1),
        r.getStruct(3).getString(1), r.getStruct(0).getString(1)))
    assert(got.size == 2, got)
    assert(got.map(_._1).toSet == Set("leads2"))
    assert(got.map(g => (g._2, g._3)).toSet == Set(
      ("urn:a", "urn:b"), ("urn:b", "urn:c")))
    assert(got.map(_._4).toSet.size == 1) // both antecedents share the sol
  }

  test("proof:context binds the antecedent's graph") {
    val got = rows(
      """SELECT DISTINCT ?g WHERE {
        |  ?sol proof:explain (<urn:n0> rdf:type <urn:t#Nation>) .
        |  ?sol proof:context ?g .
        |}""".stripMargin)
    assert(got == Seq(Seq(graft.model.Rdf.DefaultGraph)))
  }
}
