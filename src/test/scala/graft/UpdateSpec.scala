package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Quad, RdfTerm}
import graft.parser.SparqlParser
import graft.parser.SparqlParser.{DeleteDataU, InsertDataU, ModifyU}
import graft.sources.{GraphCatalog, GraphUpdate}

/** SPARQL Update text grammar (S6) + DESCRIBE text forms (G7): the reference
  * accepts update strings on `/repositories/{id}/statements` and full SPARQL
  * 1.1 query forms on the query endpoint (`Dockerfile:2`,
  * `init-graphdb.sh:90`).
  */
class UpdateSpec extends AnyFunSuite {
  import TestSpark.spark

  private val P = "urn:t#p"
  private def store(quads: Quad*) = {
    import spark.implicits._
    quads.toDS().toDF()
  }
  private def q(s: String, o: String) =
    Quad(graft.model.Rdf.DefaultGraph, s, P, RdfTerm.str(o))

  test("parse: INSERT DATA with GRAPH block and prefixed names") {
    val forms = SparqlParser.parseUpdate(
      """PREFIX t: <urn:t#>
        |INSERT DATA {
        |  <urn:a> t:p "x" .
        |  GRAPH <urn:g1> { <urn:b> t:p 4 ; a t:C . }
        |}""".stripMargin)
    assert(forms.size == 1)
    val InsertDataU(quads) = forms.head: @unchecked
    assert(quads.size == 3)
    assert(quads.head == Quad(graft.model.Rdf.DefaultGraph, "urn:a", P, RdfTerm.str("x")))
    assert(quads(1).graph == "urn:g1" && quads(1).o.num.contains(4.0))
    assert(quads(2).p == graft.model.Rdf.RdfType)
  }

  test("parse: variables in a DATA block are rejected") {
    intercept[IllegalArgumentException] {
      SparqlParser.parseUpdate("""DELETE DATA { ?s <urn:t#p> "x" }""")
    }
  }

  test("parse: ; separates operations; DELETE WHERE template = pattern") {
    val forms = SparqlParser.parseUpdate(
      """INSERT DATA { <urn:a> <urn:t#p> "x" } ;
        |DELETE WHERE { ?s <urn:t#p> ?o } ;
        |DELETE { ?s <urn:t#p> ?o } INSERT { ?s <urn:t#q> ?o } WHERE { ?s <urn:t#p> ?o }""".stripMargin)
    assert(forms.size == 3)
    assert(forms(1).isInstanceOf[ModifyU])
    val m = forms(1).asInstanceOf[ModifyU]
    assert(m.del.size == 1 && m.ins.isEmpty)
    val m2 = forms(2).asInstanceOf[ModifyU]
    assert(m2.del.size == 1 && m2.ins.size == 1)
  }

  test("apply: INSERT DATA is set-semantics; DELETE DATA removes exactly") {
    val s0 = store(q("urn:a", "x"))
    val s1 = GraphUpdate.update(s0,
      """INSERT DATA { <urn:a> <urn:t#p> "x" . <urn:b> <urn:t#p> "y" } ;
        |DELETE DATA { <urn:a> <urn:t#p> "x" }""".stripMargin)
    val vals = s1.select(col("s")).collect().map(_.getString(0)).toSet
    assert(vals == Set("urn:b"))
  }

  test("apply: DELETE..INSERT..WHERE instantiates both from one solution set") {
    val s0 = store(q("urn:a", "old"), q("urn:b", "old"), q("urn:c", "keep"))
    val s1 = GraphUpdate.update(s0,
      """DELETE { ?s <urn:t#p> "old" }
        |INSERT { ?s <urn:t#p> "new" }
        |WHERE { ?s <urn:t#p> "old" }""".stripMargin)
    val m = s1.select(col("s"), col("o.value")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("urn:a" -> "new", "urn:b" -> "new", "urn:c" -> "keep"))
  }

  test("apply: chained ops see the previous op's snapshot (WHERE over store)") {
    val s0 = store(q("urn:a", "x"))
    val s1 = GraphUpdate.update(s0,
      """INSERT DATA { <urn:b> <urn:t#p> "x" } ;
        |DELETE WHERE { ?s <urn:t#p> "x" }""".stripMargin)
    assert(s1.count() == 0)
  }

  test("DESCRIBE <iri> and DESCRIBE ?x WHERE {…} through the Engine") {
    val cat = new GraphCatalog(spark)
    cat.addQuads(store(
      q("urn:a", "x"),
      Quad(graft.model.Rdf.DefaultGraph, "urn:a", "urn:t#ref", RdfTerm.iri("urn:b")),
      Quad(graft.model.Rdf.DefaultGraph, "urn:b", P, RdfTerm.str("y")),
      Quad(graft.model.Rdf.DefaultGraph, "urn:c", P, RdfTerm.str("z"))))
    val e = new Engine(cat)
    // CBD of urn:b = its outbound statement + the inbound ref from urn:a
    assert(e.describeQuery("DESCRIBE <urn:b>").count() == 2)
    // var form: resources bound by WHERE; urn:a's CBD = 2 outbound statements
    val d = e.describeQuery(
      """DESCRIBE ?x WHERE { ?x <urn:t#ref> <urn:b> }""")
    assert(d.count() == 2)
    assert(d.select(col("s")).distinct().collect().map(_.getString(0)).toSet == Set("urn:a"))
  }
}
