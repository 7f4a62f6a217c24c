package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Quad, Rdf, RdfTerm}
import graft.sources.GraphCatalog

class LucenePluginSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val P = "urn:t#label"
  private val P2 = "urn:t#comment"

  private def catalog() = {
    val quads = Seq(
      Quad(Rdf.DefaultGraph, "urn:d1", P, RdfTerm.str("Green anodized steel")),
      Quad(Rdf.DefaultGraph, "urn:d1", P2, RdfTerm.str("promptly running deposits")),
      Quad(Rdf.DefaultGraph, "urn:d2", P, RdfTerm.str("green polished brass")),
      Quad(Rdf.DefaultGraph, "urn:d3", P, RdfTerm.str("anodized GREEN copper")),
      Quad(Rdf.DefaultGraph, "_:b1", P, RdfTerm.str("green blanket")),
      Quad(Rdf.DefaultGraph, "urn:d4", P, RdfTerm.iri("urn:not-a-literal")),
      Quad("urn:g9", "urn:d5", P, RdfTerm.str("green anodized but named-graph")))
      .toDS().toDF()
    new GraphCatalog(spark).addQuads(quads)
  }

  test("luc:<index> matches conjunctively across the subject's literals; " +
      "default-graph literal values only; bnode subjects bind as bnodes") {
    val cat = catalog()
    cat.createFtsIndex("mat", Seq(P))
    val df = new Engine(cat).select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?s WHERE { ?s luc:mat "GREEN anodized" . }""".stripMargin)
    val got = df.collect().map(_.getStruct(0)).map(s => (s.getByte(0), s.getString(1))).toSet
    assert(got == Set((Rdf.KindIri, "urn:d1"), (Rdf.KindIri, "urn:d3")))
    // single term: all four green things (incl. the bnode), not d5 (named
    // graph) and not d4 (IRI object — no literal tokens)
    val one = new Engine(cat).select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?s WHERE { ?s luc:mat "green" . }""".stripMargin)
    assert(one.collect().map(_.getStruct(0).getString(1)).toSet ==
      Set("urn:d1", "urn:d2", "urn:d3", "_:b1"))
    assert(one.collect().exists(_.getStruct(0).getByte(0) == Rdf.KindBlank))
  }

  test("trailing-* prefix terms; multi-predicate molecule; IRI subject " +
      "acts as an ASK-shaped guard; joins with ordinary BGP members") {
    val cat = catalog()
    cat.createFtsIndex("all", Seq(P, P2))
    val e = new Engine(cat)
    val pre = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?s WHERE { ?s luc:all "anodi* deposits" . }""".stripMargin)
    assert(pre.collect().map(_.getStruct(0).getString(1)).toSeq == Seq("urn:d1"))
    // constant subject: solution is unit (1 row) when it matches, empty when not
    assert(e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT (1 AS ?one) WHERE { <urn:d2> luc:all "polished" . }""".stripMargin)
      .count() == 1)
    assert(e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT (1 AS ?one) WHERE { <urn:d2> luc:all "anodized" . }""".stripMargin)
      .count() == 0)
    // composition: the plugin member's subject joins a regular pattern
    val j = e.select(
      s"""PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
         |SELECT ?s ?c WHERE {
         |  ?s luc:all "running" ; <$P2> ?c . }""".stripMargin)
    assert(j.collect().map(r => (r.getStruct(0).getString(1),
      r.getStruct(1).getString(1))).toSeq ==
      Seq(("urn:d1", "promptly running deposits")))
  }

  test("analyzed index stems both sides and drops stopwords") {
    val cat = catalog()
    cat.createFtsIndex("an", Seq(P2), analyzed = true)
    val e = new Engine(cat)
    // "runs" stems to the same term as the indexed "running"; "the" is a
    // stopword on the query side and drops out of the conjunction
    val df = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?s WHERE { ?s luc:an "the runs deposit" . }""".stripMargin)
    assert(df.collect().map(_.getStruct(0).getString(1)).toSeq == Seq("urn:d1"))
  }

  test("luc:score binds the integer tf·idf of the match as xsd:integer " +
      "and composes with ORDER BY; per-clause contributions sum") {
    val cat = catalog()
    cat.createFtsIndex("mat", Seq(P))
    val e = new Engine(cat)
    // index docs: d1 "green anodized steel", d2 "green polished brass",
    // d3 "anodized green copper", _:b1 "green blanket" → N=4 docs;
    // query "green anodi*": green df=4, anodized df=2 (prefix clause).
    // idf(green) = 4e6 div 4 = 1e6; idf(anodized) = 4e6 div 2 = 2e6.
    // d1/d3 score 1e6 + 2e6 = 3e6; d2/_:b1 fail the conjunction.
    val df = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?s ?score WHERE {
        |  ?s luc:mat "green anodi*" ; luc:score ?score .
        |} ORDER BY DESC(?score) ?s""".stripMargin)
    val rows = df.collect().map(r => (r.getStruct(0).getString(1),
      r.getStruct(1).getString(1), r.getStruct(1).getString(2)))
    assert(rows.toSeq == Seq(("urn:d1", "3000000", Rdf.XsdInteger),
      ("urn:d3", "3000000", Rdf.XsdInteger)), rows.toSeq)
    // FILTER over the score composes too (it is an ordinary binding)
    assert(e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?s WHERE {
        |  ?s luc:mat "green" ; luc:score ?score .
        |  FILTER(?score > 999999) }""".stripMargin).count() == 4)
    // a constant subject binds just the score
    val one = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?score WHERE {
        |  <urn:d2> luc:mat "polished" ; luc:score ?score . }""".stripMargin)
    assert(one.collect().map(_.getStruct(0).getString(1)).toSeq ==
      Seq("4000000"))
    // orphan / ambiguous score patterns are loud
    assert(intercept[IllegalArgumentException](e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT ?sc WHERE { ?s luc:score ?sc . }""".stripMargin).collect())
      .getMessage.contains("exactly one"))
  }

  test("luc:score under DISTINCT and inside subqueries (r15 tranche 34): " +
      "DISTINCT over the projection dedups; score stays per-match; an " +
      "inner SELECT's score survives the outer join and aggregate") {
    val cat = catalog()
    cat.createFtsIndex("mat", Seq(P))
    val e = new Engine(cat)
    // DISTINCT on the subject alone collapses the 4 green matches to 4
    // distinct subjects (no duplicates to start) — then a UNION that
    // duplicates each match row dedups back under DISTINCT, while the
    // score-projected variant keeps one row per (s, score)
    val dup = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT DISTINCT ?s WHERE {
        |  { ?s luc:mat "green" } UNION { ?s luc:mat "green" }
        |}""".stripMargin)
    assert(dup.count() == 4, dup.collect().toSeq)
    val dupScored = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT DISTINCT ?s ?score WHERE {
        |  { ?s luc:mat "green" ; luc:score ?score }
        |  UNION { ?s luc:mat "green" ; luc:score ?score }
        |}""".stripMargin)
    assert(dupScored.count() == 4, dupScored.collect().toSeq)
    // DISTINCT over scores only: every "green" match scores the same
    // idf, so one distinct score value survives
    val justScores = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT DISTINCT ?score WHERE {
        |  ?s luc:mat "green" ; luc:score ?score . }""".stripMargin)
    assert(justScores.count() == 1)
    // subquery: the inner SELECT binds (s, score); the outer pattern
    // joins the subject's other literal and aggregates over the score
    val sub = e.select(
      s"""PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
         |SELECT ?s ?score ?c WHERE {
         |  { SELECT ?s ?score WHERE {
         |      ?s luc:mat "anodi*" ; luc:score ?score . } }
         |  OPTIONAL { ?s <$P2> ?c }
         |} ORDER BY ?s""".stripMargin)
    val rows = sub.collect().map(r => (r.getStruct(0).getString(1),
      r.getStruct(1).getString(1),
      if (r.isNullAt(2)) null else r.getStruct(2).getString(1)))
    assert(rows.toSeq == Seq(
      ("urn:d1", "2000000", "promptly running deposits"),
      ("urn:d3", "2000000", null)), rows.toSeq)
    // aggregate over a subquery-bound score (sum of the two matches)
    val agg = e.select(
      """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
        |SELECT (SUM(?score) AS ?total) (COUNT(*) AS ?n) WHERE {
        |  { SELECT ?s ?score WHERE {
        |      ?s luc:mat "anodi*" ; luc:score ?score . } }
        |}""".stripMargin)
    val a = agg.collect().head
    assert(a.getStruct(0).getString(1) == "4000000", a)
    assert(a.getStruct(1).getString(1) == "2", a)
  }

  test("configuration errors are loud") {
    val cat = catalog()
    cat.createFtsIndex("mat", Seq(P))
    val e = new Engine(cat)
    def bad(q: String): String =
      intercept[IllegalArgumentException](e.select(
        s"""PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
           |SELECT * WHERE { $q }""".stripMargin).collect()).getMessage
    assert(bad("?s luc:nope \"green\" .").contains("no such FTS index"))
    assert(bad("?s luc:mat ?q .").contains("constant string query"))
    assert(bad("?s luc:mat \"\" .").contains("empty query"))
    assert(bad("?s luc:mat \"a&&b\" .").contains("unsupported query term"))
    assert(intercept[IllegalArgumentException](
      cat.createFtsIndex("x", Nil)).getMessage.contains("at least one"))
  }
}
