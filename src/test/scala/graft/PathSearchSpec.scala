package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PathSearch
import graft.model.{Quad, Rdf, RdfTerm}
import graft.sources.GraphCatalog

class PathSearchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // a --p1--> b --p1--> d --p1--> e        (a→e in 3 hops)
  // a --p2--> c --p1--> d                  (second 3-hop route)
  // b --p3--> c                            (a 4-hop route via b,c,d)
  // d --p9--> b                            (cycle bait: b→d→b)
  // e --p1--> a                            (cycle bait through the dest)
  private def edges() = Seq(
    ("a", "p1", "b"), ("b", "p1", "d"), ("a", "p2", "c"), ("c", "p1", "d"),
    ("d", "p1", "e"), ("b", "p3", "c"), ("d", "p9", "b"), ("e", "p1", "a"))
    .toDF("src", "p", "dst")

  private def paths(df: org.apache.spark.sql.DataFrame): Seq[Seq[(String, String, String)]] =
    df.orderBy("path_idx", "edge_idx").collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map(_._2.toSeq.map(r => (r.getString(3), r.getString(4), r.getString(5))))

  test("allPaths enumerates every simple path in deterministic " +
      "(length, path) order; cycles never repeat a node") {
    val got = paths(PathSearch.allPaths(edges(), "a", "e", maxLen = 4))
    assert(got == Seq(
      Seq(("a", "p1", "b"), ("b", "p1", "d"), ("d", "p1", "e")),
      Seq(("a", "p2", "c"), ("c", "p1", "d"), ("d", "p1", "e")),
      Seq(("a", "p1", "b"), ("b", "p3", "c"), ("c", "p1", "d"), ("d", "p1", "e"))))
  }

  test("allPaths respects maxLen; duplicate edge rows emit one path") {
    val got = paths(PathSearch.allPaths(
      edges().unionAll(edges()), "a", "e", maxLen = 3))
    assert(got.size == 2 && got.forall(_.size == 3))
  }

  test("shortestPath returns exactly the (length, path)-minimal path") {
    val got = paths(PathSearch.shortestPath(edges(), "a", "e", maxLen = 8))
    assert(got == Seq(
      Seq(("a", "p1", "b"), ("b", "p1", "d"), ("d", "p1", "e"))))
  }

  test("unreachable / same-node searches are empty; distance handles both") {
    assert(PathSearch.allPaths(edges(), "e", "c", maxLen = 1).isEmpty)
    assert(PathSearch.shortestPath(edges(), "a", "a", maxLen = 4).isEmpty)
    assert(PathSearch.shortestDistance(edges(), "a", "a", maxLen = 4)
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    assert(PathSearch.shortestDistance(edges(), "e", "c", maxLen = 1).isEmpty)
    assert(PathSearch.shortestDistance(edges(), "a", "e", maxLen = 8)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("bidirectional search walks edges both ways") {
    val one = Seq(("c", "p2", "a"), ("c", "p1", "e")).toDF("src", "p", "dst")
    assert(PathSearch.allPaths(one, "a", "e", maxLen = 3).isEmpty)
    val got = paths(PathSearch.allPaths(one, "a", "e", maxLen = 3,
      bidirectional = true))
    assert(got == Seq(Seq(("a", "p2", "c"), ("c", "p1", "e"))))
  }

  // ---- the SPARQL SERVICE surface --------------------------------------

  private def engine() = {
    val quads = Seq(
      Quad(Rdf.DefaultGraph, "urn:a", "urn:p", RdfTerm.iri("urn:b")),
      Quad(Rdf.DefaultGraph, "urn:b", "urn:q", RdfTerm.iri("urn:c")),
      Quad(Rdf.DefaultGraph, "urn:a", "urn:r", RdfTerm.iri("urn:c")),
      Quad(Rdf.DefaultGraph, "urn:c", "urn:lit", RdfTerm.str("not an edge")))
      .toDS().toDF()
    new Engine(new GraphCatalog(spark).addQuads(quads))
  }

  test("SERVICE path:search — allPaths exports pathIndex/edgeIndex/" +
      "start/property/end bindings, joined with the outer query") {
    val df = engine().select(
      """PREFIX path: <http://www.ontotext.com/path#>
        |SELECT ?pi ?ei ?s ?p ?o WHERE {
        |  SERVICE path:search {
        |    [] path:findPath path:allPaths ;
        |       path:sourceNode <urn:a> ;
        |       path:destinationNode <urn:c> ;
        |       path:maxPathLength 4 ;
        |       path:pathIndex ?pi ;
        |       path:resultBindingIndex ?ei ;
        |       path:startNode ?s ;
        |       path:propertyBinding ?p ;
        |       path:endNode ?o . } }""".stripMargin)
    val rows = df.orderBy(df("pi.num"), df("ei.num")).collect().map(r => (
      r.getStruct(0).getString(1).toLong, r.getStruct(1).getString(1).toLong,
      r.getStruct(2).getString(1), r.getStruct(3).getString(1),
      r.getStruct(4).getString(1))).toSeq
    // path 0: the 1-hop a→c; path 1: the 2-hop via b (length order)
    assert(rows == Seq((0L, 0L, "urn:a", "urn:r", "urn:c"),
      (1L, 0L, "urn:a", "urn:p", "urn:b"),
      (1L, 1L, "urn:b", "urn:q", "urn:c")))
  }

  test("SERVICE path:search — shortest path and distance modes; FILTER " +
      "composes with the exported integers") {
    val e = engine()
    val short = e.select(
      """PREFIX path: <http://www.ontotext.com/path#>
        |SELECT ?s ?o WHERE {
        |  SERVICE path:search {
        |    [] path:findPath path:shortestPath ;
        |       path:sourceNode <urn:a> ;
        |       path:destinationNode <urn:c> ;
        |       path:startNode ?s ; path:endNode ?o . } }""".stripMargin)
      .collect().map(r => (r.getStruct(0).getString(1),
        r.getStruct(1).getString(1))).toSeq
    assert(short == Seq(("urn:a", "urn:c")))
    val dist = e.select(
      """PREFIX path: <http://www.ontotext.com/path#>
        |SELECT ?d WHERE {
        |  SERVICE path:search {
        |    [] path:findPath path:distance ;
        |       path:sourceNode <urn:a> ;
        |       path:destinationNode <urn:c> ;
        |       path:distanceBinding ?d .
        |  } FILTER(?d >= 1) }""".stripMargin)
      .collect().map(_.getStruct(0).getString(1)).toSeq
    assert(dist == Seq("1"))
  }

  test("SERVICE path:search — configuration errors are loud") {
    val e = engine()
    def bad(q: String): String =
      intercept[IllegalArgumentException](e.select(
        s"""PREFIX path: <http://www.ontotext.com/path#>
           |SELECT * WHERE { SERVICE path:search { $q } }""".stripMargin)
        .collect()).getMessage
    assert(bad("[] path:findPath path:allPaths ; path:sourceNode <urn:a> ; " +
      "path:destinationNode <urn:c> ; path:frobnicate ?x .")
      .contains("unknown configuration property"))
    assert(bad("[] path:findPath path:allPaths ; " +
      "path:destinationNode <urn:c> ; path:pathIndex ?pi .")
      .contains("path:sourceNode is required"))
    assert(bad("[] path:findPath path:walkies ; path:sourceNode <urn:a> ; " +
      "path:destinationNode <urn:c> ; path:pathIndex ?pi .")
      .contains("unknown path:findPath mode"))
    assert(bad("[] path:findPath path:allPaths ; path:sourceNode ?v ; " +
      "path:destinationNode <urn:c> ; path:pathIndex ?pi .")
      .contains("needs a constant IRI"))
    assert(bad("[] path:findPath path:allPaths ; path:sourceNode <urn:a> ; " +
      "path:destinationNode <urn:c> .")
      .contains("at least one export variable"))
    assert(bad("[] path:findPath path:distance ; path:sourceNode <urn:a> ; " +
      "path:destinationNode <urn:c> ; path:pathIndex ?pi ; " +
      "path:distanceBinding ?d .")
      .contains("does not apply"))
  }

  test("SERVICE path:search — a nested SERVICE <urn:path.search:wildcard> " +
      "pattern RESTRICTS the edge set; results walk only pattern edges") {
    val e = engine()
    // restrict to urn:p / urn:q edges: the 1-hop a→c route (urn:r) is
    // gone, only the 2-hop via b survives
    val df = e.select(
      """PREFIX path: <http://www.ontotext.com/path#>
        |SELECT ?pi ?ei ?s ?p ?o WHERE {
        |  SERVICE path:search {
        |    [] path:findPath path:allPaths ;
        |       path:sourceNode <urn:a> ;
        |       path:destinationNode <urn:c> ;
        |       path:maxPathLength 4 ;
        |       path:pathIndex ?pi ;
        |       path:resultBindingIndex ?ei ;
        |       path:startNode ?s ;
        |       path:propertyBinding ?p ;
        |       path:endNode ?o .
        |    SERVICE <urn:path.search:wildcard> {
        |      ?s ?p ?o . FILTER(?p IN (<urn:p>, <urn:q>))
        |    }
        |  } }""".stripMargin)
    val rows = df.orderBy(df("pi.num"), df("ei.num")).collect().map(r => (
      r.getStruct(0).getString(1).toLong, r.getStruct(1).getString(1).toLong,
      r.getStruct(2).getString(1), r.getStruct(3).getString(1),
      r.getStruct(4).getString(1))).toSeq
    assert(rows == Seq((0L, 0L, "urn:a", "urn:p", "urn:b"),
      (0L, 1L, "urn:b", "urn:q", "urn:c")))
    // each pattern SOLUTION is one edge: a join pattern defines COMPOSITE
    // edges (s →(p·q) o counts as ONE hop); no property variable needed;
    // distance mode accepts the pattern vars as edge definition
    val dist = e.select(
      """PREFIX path: <http://www.ontotext.com/path#>
        |SELECT ?d WHERE {
        |  SERVICE path:search {
        |    [] path:findPath path:distance ;
        |       path:sourceNode <urn:a> ;
        |       path:destinationNode <urn:c> ;
        |       path:startNode ?s ; path:endNode ?o ;
        |       path:distanceBinding ?d .
        |    SERVICE <urn:path.search:wildcard> {
        |      ?s <urn:p> ?b . ?b <urn:q> ?o .
        |    }
        |  } }""".stripMargin)
      .collect().map(_.getStruct(0).getString(1)).toSeq
    assert(dist == Seq("1"))
    // loud errors: a pattern needs the startNode/endNode declarations,
    // and the pattern must bind them
    def bad(q: String): String =
      intercept[IllegalArgumentException](e.select(
        s"""PREFIX path: <http://www.ontotext.com/path#>
           |SELECT * WHERE { SERVICE path:search { $q } }""".stripMargin)
        .collect()).getMessage
    assert(bad("""[] path:findPath path:allPaths ; path:sourceNode <urn:a> ;
      |path:destinationNode <urn:c> ; path:pathIndex ?pi .
      |SERVICE <urn:path.search:wildcard> { ?s ?p ?o . }""".stripMargin)
      .contains("needs path:startNode"))
    assert(bad("""[] path:findPath path:allPaths ; path:sourceNode <urn:a> ;
      |path:destinationNode <urn:c> ; path:startNode ?s ; path:endNode ?o ;
      |path:pathIndex ?pi .
      |SERVICE <urn:path.search:wildcard> { ?x ?p ?y . }""".stripMargin)
      .contains("must bind"))
  }
}
