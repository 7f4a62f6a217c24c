package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Quad, Rdf, RdfTerm}
import graft.sources.{GraphUpdate, NTriplesReader, RdfXmlReader, TurtleReader}

/** N-Triples round-trip (S5), SPARQL Update snapshots (S6), GraphX analytics
  * bridge, and streaming quad ingestion.
  */
class SourcesGraphSpec extends AnyFunSuite {
  import TestSpark._

  test("N-Triples: parse/serialize round-trip preserves quads (S5)") {
    val lines = Seq(
      "<urn:a> <urn:p> <urn:b> .",
      "_:x <urn:p> \"plain\" .",
      "<urn:a> <urn:q> \"hello\\nworld\"@en .",
      "<urn:a> <urn:r> \"3.14\"^^<http://www.w3.org/2001/XMLSchema#decimal> .",
      "# comment", "")
    val quads = lines.flatMap(NTriplesReader.parseLine(_))
    assert(quads.size == 4)
    assert(quads(2).o.lang.contains("en") && quads(2).o.value == "hello\nworld")
    assert(quads(3).o.num.contains(3.14))
    val round = quads.map(NTriplesReader.toLine).flatMap(NTriplesReader.parseLine(_))
    assert(round == quads)
    // parity with the Turtle parser on equivalent content
    val t = TurtleReader.parse("""<urn:a> <urn:p> <urn:b> .""")
    assert(t.head == quads.head)
  }

  test("RDF/XML: core syntax parses to the same quads as equivalent Turtle (S1)") {
    val quads = RdfXmlReader.parse(
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://e/" xmlns:schema="http://schema.org/">
        |  <ex:Facility rdf:about="http://e/f1" ex:code="A1">
        |    <schema:name xml:lang="en">Main Park</schema:name>
        |    <ex:area rdf:resource="http://e/a1"/>
        |    <ex:rating rdf:datatype="http://www.w3.org/2001/XMLSchema#decimal">4.5</ex:rating>
        |    <ex:manager>
        |      <rdf:Description rdf:about="http://e/m1">
        |        <schema:name>Pat</schema:name>
        |      </rdf:Description>
        |    </ex:manager>
        |    <ex:loc rdf:parseType="Resource">
        |      <ex:lat rdf:datatype="http://www.w3.org/2001/XMLSchema#decimal">53.3</ex:lat>
        |    </ex:loc>
        |  </ex:Facility>
        |  <rdf:Description rdf:nodeID="b1"><ex:tag>x</ex:tag></rdf:Description>
        |</rdf:RDF>""".stripMargin)
    val set = quads.map(q => (q.s, q.p, q.o.value)).toSet
    assert(set.contains(("http://e/f1", Rdf.RdfType, "http://e/Facility")))
    assert(set.contains(("http://e/f1", "http://e/code", "A1"))) // property attr
    assert(quads.exists(q => q.p == "http://schema.org/name" &&
      q.o.lang.contains("en") && q.o.value == "Main Park"))
    assert(set.contains(("http://e/f1", "http://e/area", "http://e/a1")))
    assert(quads.exists(q => q.p == "http://e/rating" && q.o.num.contains(4.5)))
    assert(set.contains(("http://e/f1", "http://e/manager", "http://e/m1")))
    assert(set.contains(("http://e/m1", "http://schema.org/name", "Pat")))
    // parseType=Resource: anonymous node carrying the lat triple
    val loc = quads.find(_.p == "http://e/loc").get.o
    assert(loc.kind == Rdf.KindBlank)
    assert(quads.exists(q => q.s == loc.value && q.p == "http://e/lat" &&
      q.o.num.contains(53.3)))
    assert(set.contains(("_:b1", "http://e/tag", "x")))
    // parity with the Turtle parser on equivalent content
    val t = TurtleReader.parse(
      """@prefix ex: <http://e/> . @prefix schema: <http://schema.org/> .
        |<http://e/f1> a ex:Facility ; ex:code "A1" ;
        |  schema:name "Main Park"@en ; ex:area <http://e/a1> ;
        |  ex:rating "4.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
        |""".stripMargin).map(q => (q.s, q.p, q.o)).toSet
    assert(t.subsetOf(quads.map(q => (q.s, q.p, q.o)).toSet))
  }

  test("SPARQL Update: insert/delete produce correct immutable snapshots (S6)") {
    import spark.implicits._
    def q(s: String, o: String) = Quad(Rdf.DefaultGraph, s, "urn:p", RdfTerm.iri(o))
    val store = Seq(q("urn:a", "urn:b"), q("urn:b", "urn:c")).toDS().toDF()
    val add = Seq(q("urn:c", "urn:d"), q("urn:a", "urn:b")).toDS().toDF()
    val afterInsert = GraphUpdate.insertData(store, add)
    assert(afterInsert.count() == 3) // set semantics, duplicate dropped
    val afterDelete = GraphUpdate.deleteData(afterInsert,
      Seq(q("urn:a", "urn:b")).toDS().toDF())
    assert(afterDelete.count() == 2)
    assert(store.count() == 2) // original snapshot untouched
  }

  test("GraphX components/degrees agree with the relational ground truth") {
    val preds = Seq(graft.sources.DirectMapper.predIri("customer", "c_nationkey"),
      graft.sources.DirectMapper.predIri("nation", "n_regionkey"))
    val quads = catalog.forPredicate(preds(0)).unionAll(catalog.forPredicate(preds(1)))
    val cc = graft.graph.GraphAnalytics.connectedComponents(quads, preds)
    // 5 regions → 5 components; every member of a component shares its region
    assert(cc.select("component").distinct().count() == 5)
    val nations = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_regionkey")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val compOf = cc.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    nations.foreach { case (nk, rk) =>
      assert(compOf(s"urn:graft/nation/$nk") == compOf(s"urn:graft/region/$rk"))
    }
    val deg = graft.graph.GraphAnalytics.degrees(quads, preds)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val custCount = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(deg.count(_._1.startsWith("urn:graft/customer/")) == custCount)
    assert(deg("urn:graft/nation/0")._1 == 1) // one outgoing edge to its region
  }

  test("coOccurrenceEdges: pairs within groups, oversized groups excluded") {
    import spark.implicits._
    val df = (Seq.tabulate(3)(i => (1L, i.toLong)) ++ // group 1: 3 items
      Seq.tabulate(5)(i => (2L, (10 + i).toLong)) ++ // group 2: 5 items (over cap)
      Seq((3L, 20L))) // singleton: no pairs
      .toDF("grp", "item")
    val edges = graft.graph.GraphAnalytics.coOccurrenceEdges(df, "grp", "item",
      maxGroup = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((0L, 1L), (0L, 2L), (1L, 2L))) // C(3,2), group 2 dropped
  }

  test("GraphX triangle counts match hand-counted graph; dedup + canonicalize") {
    import spark.implicits._
    // square 1-2-3-4 with diagonal 1-3: triangles (1,2,3) and (1,3,4);
    // duplicate/reversed/self edges must not change the counts
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (3L, 1L), (2L, 1L), (2L, 2L)).toDF("src", "dst")
    val got = graft.graph.GraphAnalytics.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("RDF-star: Turtle-star annotations queryable via SPARQL-star patterns") {
    import spark.implicits._
    val doc =
      """@prefix ex: <http://e/> .
        |ex:f1 ex:name "Park" .
        |<< ex:f1 ex:name "Park" >> ex:certainty 0.9 ;
        |                            ex:source ex:sensorA .
        |<< ex:f2 ex:name "Pool" >> ex:certainty 0.4 .
        |ex:obs1 ex:states << ex:f2 ex:name "Pool" >> .""".stripMargin
    val quads = TurtleReader.parse(doc)
    // same quoted triple annotated twice → ONE decomposition (3 quads), two
    // annotation quads hang off the same id
    val qtIds = quads.filter(_.p == Rdf.QtSubj).map(_.s)
    assert(qtIds.length == 2 && qtIds.distinct.length == 2)
    val cat = new graft.sources.GraphCatalog(spark)
    cat.addQuads(quads.toDS().toDF())
    val eng = new Engine(cat)
    // SPARQL-star: find annotated statements and their certainty
    val got = eng.select(
      """PREFIX ex: <http://e/>
        |SELECT ?s ?c WHERE { << ?s ex:name ?n >> ex:certainty ?c }""".stripMargin)
      .collect().map(r => r.getStruct(0).getString(1) ->
        r.getStruct(1).getDouble(4)).toMap
    assert(got == Map("http://e/f1" -> 0.9, "http://e/f2" -> 0.4))
    // SPARQL-star annotation syntax: same result, requires the base
    // triple to ALSO be asserted (f1 is; f2's "Pool" name is only quoted)
    val got2 = eng.select(
      """PREFIX ex: <http://e/>
        |SELECT ?s ?c WHERE { ?s ex:name ?n {| ex:certainty ?c |} }""".stripMargin)
      .collect().map(r => r.getStruct(0).getString(1) ->
        r.getStruct(1).getDouble(4)).toMap
    assert(got2 == Map("http://e/f1" -> 0.9))
    // quoted triple in OBJECT position joins on the same id
    val obs = eng.select(
      """PREFIX ex: <http://e/>
        |SELECT ?o WHERE { ex:obs1 ex:states << ex:f2 ex:name "Pool" >> .
        |  BIND(1 AS ?o) }""".stripMargin)
    assert(obs.count() == 1)
    // constant quoted triple that was never asserted matches nothing
    val none = eng.select(
      """PREFIX ex: <http://e/>
        |SELECT ?c WHERE { << ex:f9 ex:name "X" >> ex:certainty ?c }""".stripMargin)
    assert(none.count() == 0)
    // annotation shorthand {| … |} lands on the SAME node as << … >>
    val annotated = TurtleReader.parse(
      """@prefix ex: <http://e/> .
        |ex:f1 ex:name "Park" {| ex:certainty 0.9 ; ex:src ex:a |} .
        |""".stripMargin)
    val explicit = TurtleReader.parse(
      """@prefix ex: <http://e/> .
        |ex:f1 ex:name "Park" .
        |<< ex:f1 ex:name "Park" >> ex:certainty 0.9 .
        |<< ex:f1 ex:name "Park" >> ex:src ex:a .
        |""".stripMargin)
    assert(annotated.toSet == explicit.toSet)
    // INSERT DATA with a ground quoted triple computes the SAME id as the
    // loaded Turtle-star, so the new annotation lands on the existing node
    val updated = graft.sources.GraphUpdate.update(quads.toDS().toDF(),
      """INSERT DATA {
        |  << <http://e/f1> <http://e/name> "Park" >> <http://e/reviewer> <http://e/bob> .
        |}""".stripMargin)
    val cat2 = new graft.sources.GraphCatalog(spark)
    cat2.addQuads(updated)
    val both = new Engine(cat2).select(
      """PREFIX ex: <http://e/>
        |SELECT ?c ?r WHERE {
        |  << ?s ex:name "Park" >> ex:certainty ?c .
        |  << ?s ex:name "Park" >> ex:reviewer ?r .
        |}""".stripMargin).collect()
    assert(both.length == 1)
    assert(both(0).getStruct(0).getDouble(4) == 0.9)
    assert(both(0).getStruct(1).getString(1) == "http://e/bob")
  }

  test("SPARQL-star builtins: SUBJECT/PREDICATE/OBJECT read components, " +
    "isTRIPLE/TRIPLE are scalar, non-quoted terms yield unbound/false") {
    import spark.implicits._
    val quads = TurtleReader.parse(
      """@prefix ex: <http://e/> .
        |ex:f1 ex:name "Park" .
        |<< ex:f1 ex:name "Park" >> ex:certainty "high" .""".stripMargin)
    val cat = new graft.sources.GraphCatalog(spark)
    cat.addQuads(quads.toDS().toDF())
    val eng = new Engine(cat)
    // accessors in SELECT-expression position (PREDICATE) and BIND position
    // (SUBJECT/OBJECT); TRIPLE() recomputes the loader's id so the equality
    // holds. A BIND may reference earlier-BOUND accessors (?s, ?o) but not
    // SELECT-expression ones, which join after the group.
    val row = eng.select(
      """PREFIX ex: <http://e/>
        |SELECT (PREDICATE(?qt) AS ?p) ?s ?o ?isq ?same WHERE {
        |  ?qt ex:certainty ?c .
        |  BIND(SUBJECT(?qt) AS ?s)
        |  BIND(OBJECT(?qt) AS ?o)
        |  BIND(isTRIPLE(?qt) AS ?isq)
        |  BIND((TRIPLE(?s, ex:name, ?o) = ?qt) AS ?same)
        |}""".stripMargin).collect()
    assert(row.length == 1)
    val r = row(0)
    def v(i: Int) = r.getStruct(i).getString(1)
    assert(v(r.fieldIndex("s")) == "http://e/f1")
    assert(v(r.fieldIndex("p")) == "http://e/name")
    assert(v(r.fieldIndex("o")) == "Park")
    assert(v(r.fieldIndex("isq")) == "true")
    assert(v(r.fieldIndex("same")) == "true")
    // a non-quoted term: accessor → unbound, isTRIPLE → false
    val un = eng.select(
      """PREFIX ex: <http://e/>
        |SELECT ?s2 ?f WHERE {
        |  ex:f1 ex:name ?n .
        |  BIND(SUBJECT(?n) AS ?s2)
        |  BIND(isTRIPLE(?n) AS ?f)
        |}""".stripMargin).collect()
    assert(un.length == 1)
    assert(un(0).isNullAt(un(0).fieldIndex("s2")))
    assert(un(0).getStruct(un(0).fieldIndex("f")).getString(1) == "false")
  }

  test("TriG-star: a quoted triple annotated in two graphs carries " +
    "decomposition quads in EACH graph (GRAPH-scoped patterns join)") {
    import graft.sources.TrigReader
    val quads = TrigReader.parse(
      """@prefix ex: <http://e/> .
        |GRAPH <urn:g1> { << ex:f1 ex:name "Park" >> ex:certainty "high" . }
        |GRAPH <urn:g2> { << ex:f1 ex:name "Park" >> ex:certainty "low" . }""".stripMargin)
    assert(quads.count(q => q.graph == "urn:g1" && q.p == Rdf.QtSubj) == 1)
    assert(quads.count(q => q.graph == "urn:g2" && q.p == Rdf.QtSubj) == 1)
    import spark.implicits._
    val cat = new graft.sources.GraphCatalog(spark)
    cat.addQuads(quads.toDS().toDF())
    val eng = new Engine(cat)
    def certaintyIn(g: String): Seq[String] = eng.select(
      s"""PREFIX ex: <http://e/>
         |SELECT ?c WHERE { GRAPH <$g> { << ?s ex:name ?n >> ex:certainty ?c } }"""
        .stripMargin).collect().map(_.getStruct(0).getString(1)).toSeq
    assert(certaintyIn("urn:g1") == Seq("high"))
    assert(certaintyIn("urn:g2") == Seq("low")) // failed before the (graph,id) key
  }

  test("bfsDepths: min hop counts, undirected, bounded depth, early exit") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus shortcut 1-4: dist(4)=1, dist(5)=2, dist(6)=3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 4L))
      .toDF("src", "dst")
    val got = graft.graph.GraphAnalytics.bfsDepths(edges, 1L, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L, 6L -> 3L))
    // depth bound truncates; unreachable vertices never appear
    val before = spark.sparkContext.getPersistentRDDs.size
    val capped = graft.graph.GraphAnalytics.bfsDepths(edges, 6L, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(6L -> 0L, 5L -> 1L, 4L -> 2L))
    // cache hygiene: superseded generations released, only the returned
    // snapshot may remain cached
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  test("quad store: predicate-partitioned write prunes partitions on read") {
    val quads = graft.sources.DirectMapper.quads(
      spark.read.parquet(s"$sf/nation.parquet"),
      graft.sources.DirectMapper.testdataSpecs("nation"))
    val path = java.nio.file.Files.createTempDirectory("graft_store").toString
    graft.sources.GraphStore.write(quads, path)
    val back = graft.sources.GraphStore.read(spark, path)
    assert(back.count() == quads.count())
    // round-trip content equality
    val a = quads.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // constant-predicate pattern → partition pruning in the plan
    val pred = graft.sources.DirectMapper.predIri("nation", "n_name")
    val q = back.filter(org.apache.spark.sql.functions.col("p") === pred)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("n_name"), plan)
    assert(q.count() == 25)
    // CONTEXT INDEX (the reference config's enableContextIndex,
    // init-graphdb.sh:56-60): graph is the store's FIRST partition
    // column, so a constant-GRAPH scope prunes directories before
    // predicate routing ever runs — GRAPH <g> { … } never touches other
    // contexts' files at any scale
    val g = back.filter(org.apache.spark.sql.functions.col("graph") ===
      graft.model.Rdf.DefaultGraph)
    val gPlan = g.queryExecution.executedPlan.toString
    assert(gPlan.contains("PartitionFilters") && gPlan.contains("graph"),
      gPlan)
  }

  test("stats count rewrite equals the lifted count (A1 optimization)") {
    val lifted = catalog.allQuads.count()
    val stats = catalog.statsCountAll.collect()(0).getLong(0)
    assert(stats == lifted)
    // and the compiler applies it: plan must contain NO Generate (explode)
    val sol = compiler.compile(graft.algebra.Group(Nil,
      Seq("n" -> graft.algebra.Aggs.countStar),
      graft.algebra.Bgp(Seq(graft.algebra.TriplePattern(
        graft.algebra.V("s"), graft.algebra.V("p"), graft.algebra.V("o"))))))
    val plan = sol.df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan)
    assert(sol.df.collect()(0).getStruct(0).getDouble(4).toLong == lifted)
  }

  test("streaming quad ingestion matches the batch lift") {
    val stream = graft.streaming.StreamIngest.quadStream(spark, sf)
    val name = s"t_quads_${System.nanoTime()}"
    val q = stream.groupBy(col("p")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.sources.DirectMapper.quads(
      spark.read.parquet(s"$sf/events.parquet"),
      graft.sources.DirectMapper.testdataSpecs("events"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch)
    assert(got(Rdf.RdfType) == 1000) // sf0.001 events row count
  }

  test("RDF/XML: containers (rdf:li → rdf:_n) and parseType=Collection (S5)") {
    val quads = RdfXmlReader.parse(
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:t="urn:t#">
        |  <rdf:Bag rdf:about="urn:bag">
        |    <rdf:li>one</rdf:li>
        |    <rdf:li>two</rdf:li>
        |  </rdf:Bag>
        |  <rdf:Description rdf:about="urn:a">
        |    <t:members rdf:parseType="Collection">
        |      <rdf:Description rdf:about="urn:m1"/>
        |      <rdf:Description rdf:about="urn:m2"/>
        |    </t:members>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin)
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    // container: positional predicates + the Bag type triple
    assert(quads.exists(q => q.s == "urn:bag" && q.p == s"${rdfNs}_1" && q.o.value == "one"))
    assert(quads.exists(q => q.s == "urn:bag" && q.p == s"${rdfNs}_2" && q.o.value == "two"))
    assert(quads.exists(q => q.s == "urn:bag" && q.p == Rdf.RdfType && q.o.value == s"${rdfNs}Bag"))
    // collection: urn:a t:members (urn:m1 urn:m2)
    val head = quads.find(q => q.s == "urn:a" && q.p == "urn:t#members").get.o
    assert(head.value.startsWith("_:"))
    val f1 = quads.find(q => q.s == head.value && q.p == Rdf.RdfFirst).get.o
    val r1 = quads.find(q => q.s == head.value && q.p == Rdf.RdfRest).get.o
    assert(f1.value == "urn:m1")
    val f2 = quads.find(q => q.s == r1.value && q.p == Rdf.RdfFirst).get.o
    val r2 = quads.find(q => q.s == r1.value && q.p == Rdf.RdfRest).get.o
    assert(f2.value == "urn:m2" && r2.value == Rdf.RdfNil)
  }

  test("Turtle: collection in SUBJECT position (S1)") {
    val quads = TurtleReader.parse(
      """@prefix t: <urn:t#> .
        |( t:x t:y ) t:label "pair" .""".stripMargin)
    val labeled = quads.find(_.p == "urn:t#label").get
    assert(labeled.s.startsWith("_:") && labeled.o.value == "pair")
    // the labeled subject IS the chain head
    assert(quads.exists(q => q.s == labeled.s && q.p == Rdf.RdfFirst &&
      q.o.value == "urn:t#x"))
  }

  test("N-Quads: 4th term routes to named graphs; round-trip preserves (S5)") {
    import graft.sources.NQuadsReader
    val lines = Seq(
      "<urn:a> <urn:p> <urn:b> <urn:g1> .",
      "<urn:a> <urn:p> \"plain\" .", // no graph label → default
      "_:x <urn:p> \"v\"@en _:gb .", // bnode graph label
      "# comment")
    val quads = lines.flatMap(NQuadsReader.parseLine(_))
    assert(quads.map(_.graph) == Seq("urn:g1", Rdf.DefaultGraph, "_:gb"))
    val round = quads.map(NQuadsReader.toLine).flatMap(NQuadsReader.parseLine(_))
    assert(round == quads)
    // an N-Quads line without a label is a valid N-Triples line and vice versa
    assert(NQuadsReader.parseLine("<urn:a> <urn:p> <urn:b> .") ==
      NTriplesReader.parseLine("<urn:a> <urn:p> <urn:b> ."))
  }

  test("TriG: graph blocks route quads; Turtle grammar intact inside blocks (S5)") {
    import graft.sources.TrigReader
    val quads = TrigReader.parse(
      """@prefix t: <urn:t#> .
        |t:a t:p "outside" .
        |GRAPH <urn:g1> {
        |  t:b t:p "in-g1" ; t:q 4 .
        |  t:c a t:C
        |}
        |<urn:g2> { t:d t:p "in-g2" . }
        |{ t:e t:p "anon-default" . }
        |_:gb { t:f t:p "in-bnode-graph" . }
        |t:z t:p "outside2" .""".stripMargin)
    val byGraph = quads.groupBy(_.graph).view.mapValues(_.size).toMap
    assert(byGraph == Map(Rdf.DefaultGraph -> 3, "urn:g1" -> 3,
      "urn:g2" -> 1, "_:gb" -> 1))
    // the ; continuation and `a` sugar survived inside the block
    assert(quads.exists(q => q.graph == "urn:g1" && q.o.num.contains(4.0)))
    assert(quads.exists(q => q.graph == "urn:g1" && q.p == Rdf.RdfType))
    // plain Turtle parsing is unaffected (no trig mode)
    assert(TurtleReader.parse("<urn:a> <urn:p> <urn:b> .").size == 1)
  }

  test("JSON-LD: context expansion, typed values, nesting, @graph (S5)") {
    import graft.sources.JsonLdReader
    val quads = JsonLdReader.parse(
      """{
        |  "@context": {"t": "urn:t#", "name": "urn:t#name",
        |               "ref": {"@id": "urn:t#ref"}, "@vocab": "urn:v#"},
        |  "@id": "urn:a", "@type": "t:C",
        |  "name": ["Alice", {"@value": "Alicia", "@language": "es"}],
        |  "age": {"@value": "41", "@type": "t:years"},
        |  "score": 3.5, "active": true,
        |  "ref": {"@id": "urn:b"},
        |  "child": {"name": "Nested"}
        |}""".stripMargin)
    def one(p: String): Seq[RdfTerm] =
      quads.filter(q => q.s == "urn:a" && q.p == p).map(_.o)
    assert(quads.exists(q => q.p == graft.model.Rdf.RdfType && q.o.value == "urn:t#C"))
    assert(one("urn:t#name").map(_.value).toSet == Set("Alice", "Alicia"))
    assert(one("urn:t#name").exists(_.lang.contains("es")))
    assert(one("urn:v#age").head.dtype.contains("urn:t#years"))
    assert(one("urn:v#score").head.num.contains(3.5))
    assert(one("urn:v#active").head.dtype.exists(_.endsWith("boolean")))
    assert(one("urn:t#ref").head == RdfTerm.iri("urn:b"))
    // nested node: bnode link + its own name triple
    val childRef = one("urn:v#child").head
    assert(childRef.value.startsWith("_:"))
    assert(quads.exists(q => q.s == childRef.value && q.o.value == "Nested"))
    // @list → rdf:first/rest chain, order preserved
    val lst = JsonLdReader.parse(
      """{"@id": "urn:l", "urn:t#items": {"@list": ["a", "b"]}}""")
    val head = lst.find(q => q.s == "urn:l").get.o
    assert(head.value.startsWith("_:"))
    val first1 = lst.find(q => q.s == head.value && q.p == Rdf.RdfFirst).get.o
    val rest1 = lst.find(q => q.s == head.value && q.p == Rdf.RdfRest).get.o
    assert(first1.value == "a")
    val first2 = lst.find(q => q.s == rest1.value && q.p == Rdf.RdfFirst).get.o
    val rest2 = lst.find(q => q.s == rest1.value && q.p == Rdf.RdfRest).get.o
    assert(first2.value == "b" && rest2.value == Rdf.RdfNil)
    // empty list is rdf:nil directly
    assert(JsonLdReader.parse("""{"@id": "urn:l2", "urn:t#items": {"@list": []}}""")
      .head.o.value == Rdf.RdfNil)
    // named graph via @id + @graph
    val g = JsonLdReader.parse(
      """[{"@id": "urn:g1", "@graph": [
        |   {"@id": "urn:x", "urn:t#p": "in-graph"}]},
        | {"@id": "urn:y", "urn:t#p": "top-level"}]""".stripMargin)
    assert(g.map(q => q.graph -> q.o.value).toSet ==
      Set("urn:g1" -> "in-graph", Rdf.DefaultGraph -> "top-level"))
  }

  test("JSON-LD r10 widening: @reverse (node-level and context), @set, " +
    "@base-relative @id resolution") {
    import graft.sources.JsonLdReader
    // node-level @reverse: (child, parentOf, this)
    val rev = JsonLdReader.parse(
      """{"@id": "urn:dad",
        |  "@reverse": {"urn:t#childOf": [{"@id": "urn:kid"},
        |                                 {"urn:t#name": "anon"}]}}""".stripMargin)
    assert(rev.exists(q => q.s == "urn:kid" && q.p == "urn:t#childOf" &&
      q.o.value == "urn:dad"))
    val anon = rev.find(q => q.o.value == "anon").get.s
    assert(rev.exists(q => q.s == anon && q.p == "urn:t#childOf" &&
      q.o.value == "urn:dad"))
    // context @reverse term definition inverts the property
    val rev2 = JsonLdReader.parse(
      """{"@context": {"children": {"@reverse": "urn:t#parent"}},
        |  "@id": "urn:mom", "children": {"@id": "urn:kid2"}}""".stripMargin)
    assert(rev2 == Seq(graft.model.Quad(Rdf.DefaultGraph, "urn:kid2",
      "urn:t#parent", RdfTerm.iri("urn:mom"))))
    // @set value objects are plain multi-values
    val st = JsonLdReader.parse(
      """{"@id": "urn:s", "urn:t#tag": {"@set": ["a", "b"]}}""")
    assert(st.map(_.o.value).toSet == Set("a", "b"))
    // @base resolves relative @id / reference values
    val based = JsonLdReader.parse(
      """{"@context": {"@base": "http://ex.org/dir/"},
        |  "@id": "doc1", "urn:t#ref": {"@id": "../up"}}""".stripMargin)
    assert(based == Seq(graft.model.Quad(Rdf.DefaultGraph,
      "http://ex.org/dir/doc1", "urn:t#ref",
      RdfTerm.iri("http://ex.org/up"))))
  }

  test("JSON-LD r11 widening: default/term @language, language maps, " +
    "@index containers, array contexts, remote-context error") {
    import graft.sources.JsonLdReader
    // context default language tags plain strings of un-coerced terms
    val dl = JsonLdReader.parse(
      """{"@context": {"@language": "en", "name": "urn:t#name",
        |              "key": {"@id": "urn:t#key",
        |                "@type": "http://www.w3.org/2001/XMLSchema#string"}},
        |  "@id": "urn:a", "name": "hello", "key": "k1"}""".stripMargin)
    val byP = dl.map(q => q.p -> q.o).toMap
    assert(byP("urn:t#name").lang.contains("en"))
    assert(byP("urn:t#key").lang.isEmpty) // coerced term: no default lang
    // term-level @language overrides the default
    val tl = JsonLdReader.parse(
      """{"@context": {"@language": "en",
        |              "title": {"@id": "urn:t#title", "@language": "fr"}},
        |  "@id": "urn:b", "title": "bonjour"}""".stripMargin)
    assert(tl.head.o.lang.contains("fr"))
    // @container: @language maps key the tag
    val lm = JsonLdReader.parse(
      """{"@context": {"label": {"@id": "urn:t#label",
        |                        "@container": "@language"}},
        |  "@id": "urn:c", "label": {"en": "cat", "de": ["Katze", "Mieze"]}}"""
        .stripMargin)
    assert(lm.map(q => (q.o.lang.get, q.o.value)).toSet ==
      Set(("en", "cat"), ("de", "Katze"), ("de", "Mieze")))
    // @container: @index drops the index keys, keeps every value
    val ix = JsonLdReader.parse(
      """{"@context": {"post": {"@id": "urn:t#post", "@container": "@index"}},
        |  "@id": "urn:d", "post": {"2024": "old", "2025": ["new", "newer"]}}"""
        .stripMargin)
    assert(ix.map(_.o.value).toSet == Set("old", "new", "newer"))
    // array @context merges in order (later wins)
    val ac = JsonLdReader.parse(
      """{"@context": [{"p": "urn:t#p1"}, {"p": "urn:t#p2"}],
        |  "@id": "urn:e", "p": "v"}""".stripMargin)
    assert(ac.head.p == "urn:t#p2")
    // a remote @context IRI errors instead of silently dropping terms
    intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": "http://remote.example/ctx.jsonld",
        |  "@id": "urn:f", "p": "v"}""".stripMargin))
    // `"@context": null` RESETS the active context (6.1): the inner node
    // no longer compacts `p`, so the non-IRI key contributes nothing
    val reset = JsonLdReader.parse(
      """{"@context": {"p": "urn:t#p"},
        |  "@id": "urn:outer", "p": "kept",
        |  "urn:t#child": {"@context": null, "@id": "urn:inner", "p": "dropped"}}""".stripMargin)
    assert(reset.exists(q => q.s == "urn:outer" && q.o.value == "kept"))
    assert(!reset.exists(q => q.o.value == "dropped"))
    ()
  }

  test("JSON-LD 1.1 r12 cont.: @json literals (value-object and coerced " +
    "forms, canonical sorted-key lexical, arrays do not spread) and " +
    "@included siblings") {
    import graft.sources.JsonLdReader
    val RdfJson = "http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON"
    // value-object form: nested keys sort, compact, deterministic
    val vo = JsonLdReader.parse(
      """{"@id": "urn:a", "urn:t#cfg":
        |  {"@value": {"z": 1, "a": {"y": true, "b": null}}, "@type": "@json"}}"""
        .stripMargin)
    assert(vo.head.o.dtype.contains(RdfJson))
    assert(vo.head.o.value == """{"a":{"b":null,"y":true},"z":1}""")
    // context-coerced form: an ARRAY value is ONE literal, not multi-value
    val co = JsonLdReader.parse(
      """{"@context": {"tags": {"@id": "urn:t#tags", "@type": "@json"}},
        |  "@id": "urn:b", "tags": ["x", 2, false]}""".stripMargin)
    assert(co.size == 1 && co.head.o.value == """["x",2,false]""" &&
      co.head.o.dtype.contains(RdfJson))
    // scalar under the coerced term is still a JSON literal
    val sc = JsonLdReader.parse(
      """{"@context": {"n": {"@id": "urn:t#n", "@type": "@json"}},
        |  "@id": "urn:c", "n": 7}""".stripMargin)
    assert(sc.head.o.value == "7" && sc.head.o.dtype.contains(RdfJson))
    // @included: free-standing siblings share context and graph; the
    // containing node gains NO edge to them
    val inc = JsonLdReader.parse(
      """{"@context": {"name": "urn:t#name"},
        |  "@id": "urn:outer", "name": "o",
        |  "@included": [{"@id": "urn:in1", "name": "i1"},
        |                {"@id": "urn:in2", "name": "i2"}]}""".stripMargin)
    assert(inc.map(q => (q.s, q.o.value)).toSet ==
      Set(("urn:outer", "o"), ("urn:in1", "i1"), ("urn:in2", "i2")))
    ()
  }

  test("JSON-LD 1.1 r12 cont.: @protected redefinition errors, @propagate " +
    "false scopes a context to one node, @direction validates then drops") {
    import graft.sources.JsonLdReader
    // @protected term: identical redefinition fine, different errors,
    // @context null cannot clear it
    val okSame = JsonLdReader.parse(
      """{"@context": {"name": {"@id": "urn:t#name", "@protected": true}},
        |  "@id": "urn:a", "name": "x",
        |  "urn:t#child": {"@context": {"name": {"@id": "urn:t#name", "@protected": true}},
        |                  "@id": "urn:b", "name": "y"}}""".stripMargin)
    assert(okSame.count(_.p == "urn:t#name") == 2)
    val eRedef = intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": {"name": {"@id": "urn:t#name", "@protected": true}},
        |  "@id": "urn:a",
        |  "urn:t#child": {"@context": {"name": "urn:t#other"},
        |                  "@id": "urn:b", "name": "y"}}""".stripMargin))
    assert(eRedef.getMessage.contains("protected"))
    val eNull = intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": {"@protected": true, "name": "urn:t#name"},
        |  "@id": "urn:a",
        |  "urn:t#child": {"@context": null, "@id": "urn:b"}}""".stripMargin))
    assert(eNull.getMessage.contains("protected"))
    // @propagate false: the term maps on THIS node only; the nested node
    // object falls back to the surrounding context (here: no mapping, so
    // the bare term is dropped per ignore-unmapped rules)
    val prop = JsonLdReader.parse(
      """{"@context": [{"@propagate": false, "name": "urn:t#name"}],
        |  "@id": "urn:a", "name": "outer",
        |  "urn:t#child": {"@id": "urn:b", "name": "inner"}}""".stripMargin)
    assert(prop.exists(q => q.s == "urn:a" && q.p == "urn:t#name" &&
      q.o.value == "outer"))
    assert(!prop.exists(q => q.s == "urn:b" && q.p == "urn:t#name"))
    // @direction: accepted and dropped per the default toRdf transform —
    // language survives, direction does not; invalid direction errors
    val dir = JsonLdReader.parse(
      """{"@id": "urn:a", "urn:t#title":
        |  {"@value": "hello", "@language": "en", "@direction": "ltr"}}"""
        .stripMargin)
    assert(dir.head.o.lang.contains("en") && dir.head.o.value == "hello")
    val plainDir = JsonLdReader.parse(
      """{"@id": "urn:a", "urn:t#title":
        |  {"@value": "shalom", "@direction": "rtl"}}""".stripMargin)
    assert(plainDir.head.o.lang.isEmpty && plainDir.head.o.value == "shalom")
    val eDir = intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@id": "urn:a", "urn:t#t": {"@value": "x", "@direction": "up"}}"""))
    assert(eDir.getMessage.contains("@direction"))
    // context-level @direction validates too
    val eCtxDir = intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": {"@direction": "sideways"}, "@id": "urn:a"}"""))
    assert(eCtxDir.getMessage.contains("@direction"))
    ()
  }

  test("JSON-LD rdfDirection (r15): i18n-datatype types the literal, " +
      "compound-literal emits the bnode triple group, context default " +
      "direction applies to plain strings, null clears") {
    import graft.sources.JsonLdReader
    val doc =
      """{"@id": "urn:a", "urn:t#title":
        |  {"@value": "hello", "@language": "EN", "@direction": "ltr"}}"""
        .stripMargin
    // i18n-datatype: lang lowercased into the datatype, no lang tag
    val i18n = JsonLdReader.parse(doc, rdfDirection = Some("i18n-datatype"))
    assert(i18n.head.o.dtype.contains("https://www.w3.org/ns/i18n#en_ltr"),
      i18n)
    assert(i18n.head.o.lang.isEmpty && i18n.head.o.value == "hello")
    // no language → empty lang slot in the datatype
    val noLang = JsonLdReader.parse(
      """{"@id": "urn:a", "urn:t#t": {"@value": "x", "@direction": "rtl"}}""",
      rdfDirection = Some("i18n-datatype"))
    assert(noLang.head.o.dtype.contains("https://www.w3.org/ns/i18n#_rtl"))
    // compound-literal: fresh bnode with rdf:value/language/direction
    val comp = JsonLdReader.parse(doc, rdfDirection = Some("compound-literal"))
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val bn = comp.find(_.p == "urn:t#title").get.o
    assert(bn.kind == graft.model.Rdf.KindBlank, comp)
    val group = comp.filter(_.s == bn.value).map(q => q.p -> q.o.value).toMap
    assert(group == Map(rdfNs + "value" -> "hello",
      rdfNs + "language" -> "en", rdfNs + "direction" -> "ltr"), comp)
    // context DEFAULT direction + default language catch plain strings;
    // an explicit value object does NOT inherit the default; a nested
    // null clears it
    val ctxDir = JsonLdReader.parse(
      """{"@context": {"@language": "ar", "@direction": "rtl"},
        |  "@id": "urn:a", "urn:t#t": "x",
        |  "urn:t#u": {"@value": "y", "@language": "ar"},
        |  "urn:t#v": {"@context": {"@direction": null},
        |              "@id": "urn:b", "urn:t#w": "z"}}""".stripMargin,
      rdfDirection = Some("i18n-datatype"))
    def term(p: String) = ctxDir.find(_.p == p).get.o
    assert(term("urn:t#t").dtype.contains("https://www.w3.org/ns/i18n#ar_rtl"))
    assert(term("urn:t#u").lang.contains("ar") && term("urn:t#u").dtype.isEmpty)
    assert(term("urn:t#w").lang.contains("ar") && term("urn:t#w").dtype.isEmpty)
    // default transform unchanged: direction still drops
    assert(JsonLdReader.parse(doc).head.o.lang.contains("en"))
    // unknown mode is loud
    assert(intercept[IllegalArgumentException](
      JsonLdReader.parse(doc, rdfDirection = Some("nope")))
      .getMessage.contains("rdfDirection"))
  }

  test("Repositories: DDL with config knobs — inference, persistence, drop (S4)") {
    import graft.sources.{RepoConfig, Repositories}
    val loc = java.nio.file.Files.createTempDirectory("graft_repos")
    val ttl = java.nio.file.Files.createTempFile("graft_s4", ".ttl")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |t:p rdfs:domain t:C .
        |<urn:a> t:p "x" .""".stripMargin)
    val repos = new Repositories(spark)
    repos.create("r1", RepoConfig(inference = true, location = Some(loc.toString)))
    repos.load("r1", ttl.toString)
    // the configured ruleset derived the domain type
    assert(repos.engine("r1").select("SELECT ?x WHERE { ?x a <urn:t#C> }").count() == 1)
    // the snapshot persisted predicate-partitioned under the location, in
    // the r16 epoch-numbered layout (e1 = the load's commit) so history
    // views never get clobbered by later commits
    val dirs = new java.io.File(s"$loc/r1/e1").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("graph=")))
    // updates flow through the same snapshot chain (and re-persist); on an
    // inference repo the closure is maintained, so the inserted triple also
    // derives its rdfs:domain type (+2, not +1)
    val before = repos.quads("r1").count()
    repos.update("r1", """INSERT DATA { <urn:b> <urn:t#p> "y" }""")
    assert(repos.quads("r1").count() == before + 2)
    assert(repos.engine("r1").select("SELECT ?x WHERE { ?x a <urn:t#C> }").count() == 2)
    // r16 data history: epoch pseudo-graphs are point-in-time views —
    // epoch 1 (the load) predates <urn:b>, the current view has it; the
    // change feed between the epochs is exactly the update's additions
    // (insert + its maintained inference), nothing removed
    assert(repos.epochCount("r1") == 2)
    assert(repos.engine("r1").select(
      """SELECT ?x FROM <urn:graft:hist:1>
        |WHERE { ?x <urn:t#p> ?v }""".stripMargin).count() == 1)
    val feed = repos.changeFeed("r1", 1, 2)
    assert(feed.filter(col("op") === "+").count() == 2)
    assert(feed.filter(col("op") === "-").count() == 0)
    // pre-history: changeFeed from epoch 0 replays the initial load
    assert(repos.changeFeed("r1", 0, 1).filter(col("op") === "-")
      .count() == 0)
    // DDL bookkeeping
    assert(repos.list == Seq("r1") && repos.exists("r1"))
    repos.drop("r1")
    assert(!repos.exists("r1"))
    intercept[IllegalArgumentException](repos.load("r1", ttl.toString))
    // create without inference: no derived types
    repos.create("r2", RepoConfig(inference = false))
    repos.load("r2", ttl.toString)
    assert(repos.engine("r2").select("SELECT ?x WHERE { ?x a <urn:t#C> }").count() == 0)
  }

  test("Repositories r17: SPARQL-visible change feed " +
      "(urn:graft:changes:<from>:<to>:added|removed) and the history " +
      "retention cap (stable epoch numbers, dropped epochs refuse)") {
    import graft.sources.{RepoConfig, Repositories}
    val ttl = java.nio.file.Files.createTempFile("graft_cf", ".ttl")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> . <urn:a> t:p "x" . <urn:b> t:p "y" .""")
    val repos = new Repositories(spark)
    repos.create("cf")
    repos.load("cf", ttl.toString)
    repos.update("cf", """DELETE DATA { <urn:a> <urn:t#p> "x" } ;
      |INSERT DATA { <urn:c> <urn:t#p> "z" }""".stripMargin)
    val e = repos.engine("cf")
    // the feed reads through SPARQL like any graph: additions of 1->2
    def vals(q: String): Set[String] =
      e.select(q).collect().map(_.getStruct(0).getString(1)).toSet
    assert(vals("""SELECT ?v FROM <urn:graft:changes:1:2:added>
      |WHERE { ?x <urn:t#p> ?v }""".stripMargin) == Set("z"))
    assert(vals("""SELECT ?v FROM <urn:graft:changes:1:2:removed>
      |WHERE { ?x <urn:t#p> ?v }""".stripMargin) == Set("x"))
    // epoch 0 = the empty pre-history store: 0:1 added is the whole load
    assert(vals("""SELECT ?v FROM <urn:graft:changes:0:1:added>
      |WHERE { ?x <urn:t#p> ?v }""".stripMargin) == Set("x", "y"))
    // GRAPH position works too (the family is a normal pseudo-graph)
    assert(vals("""SELECT ?v WHERE {
      |GRAPH <urn:graft:changes:1:2:removed> { ?x <urn:t#p> ?v } }"""
      .stripMargin) == Set("x"))
    // malformed / out-of-range IRIs are plain absent graphs — empty
    for (bad <- Seq("urn:graft:changes:2:1:added",
        "urn:graft:changes:1:9:added", "urn:graft:changes:1:2:bogus",
        "urn:graft:changes:x:2:added"))
      assert(e.select(
        s"SELECT ?v WHERE { GRAPH <$bad> { ?x ?p ?v } }").count() == 0)
    // --- retention cap: keep the last 2 epochs, numbering stays stable
    repos.create("rc", RepoConfig(historyRetention = Some(2)))
    repos.load("rc", ttl.toString)
    repos.update("rc", """INSERT DATA { <urn:d> <urn:t#p> "2" }""")
    repos.update("rc", """INSERT DATA { <urn:e> <urn:t#p> "3" }""")
    assert(repos.epochCount("rc") == 3)
    assert(repos.firstRetainedEpoch("rc") == 2)
    val re = repos.engine("rc")
    // surviving epochs keep their ORIGINAL numbers
    assert(re.select("""SELECT ?x FROM <urn:graft:hist:3>
      |WHERE { ?x <urn:t#p> ?v }""".stripMargin).count() == 4)
    assert(re.select("""SELECT ?x FROM <urn:graft:hist:2>
      |WHERE { ?x <urn:t#p> ?v }""".stripMargin).count() == 3)
    // the dropped epoch's view no longer resolves (plain empty graph),
    // and its feed ranges refuse at the API
    assert(re.select("""SELECT ?x FROM <urn:graft:hist:1>
      |WHERE { ?x <urn:t#p> ?v }""".stripMargin).count() == 0)
    intercept[IllegalArgumentException](repos.changeFeed("rc", 1, 3))
    intercept[IllegalArgumentException](repos.changeFeed("rc", 0, 2))
    // retained range still answers (2 -> 3: one addition)
    assert(repos.changeFeed("rc", 2, 3).count() == 1)
    assert(re.select("""SELECT ?v FROM <urn:graft:changes:2:3:added>
      |WHERE { ?x <urn:t#p> ?v }""".stripMargin).count() == 1)
    // a dropped-range changes IRI is an absent graph through SPARQL
    assert(re.select("""SELECT ?v WHERE {
      |GRAPH <urn:graft:changes:1:3:added> { ?x ?p ?v } }"""
      .stripMargin).count() == 0)
    intercept[IllegalArgumentException](
      repos.create("bad", RepoConfig(historyRetention = Some(0))))
  }

  test("Repositories: pseudo-graphs — onto:explicit / onto:implicit / " +
    "onto:disable-sameAs views, GRAPH ?g never enumerates them (r15)") {
    import graft.sources.{RepoConfig, Repositories}
    val ttl = java.nio.file.Files.createTempFile("graft_pg", ".ttl")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |t:p rdfs:domain t:C .
        |t:sub rdfs:subPropertyOf t:sup .
        |<urn:a> t:p "x" .
        |<urn:a> t:sub <urn:b> .
        |<urn:alias> owl:sameAs <urn:a> .
        |<urn:alias> t:tag "al" .""".stripMargin)
    val repos = new Repositories(spark)
    repos.create("pg", RepoConfig(inference = true))
    repos.load("pg", ttl.toString)
    val e = repos.engine("pg")
    def n(q: String): Long = e.select(q).count()
    // explicit: only asserted statements — no derived type, no sub→sup copy
    assert(n("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/explicit> { ?x a <urn:t#C> } }""") == 0)
    assert(n("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/explicit> { ?x <urn:t#sup> ?o } }""") == 0)
    assert(n("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/explicit> { ?x <urn:t#p> ?o } }""") == 1)
    // implicit: only inferred — domain types for a (and alias, which gains
    // the copied t:p via sameAs), the sub→sup copies, never asserted rows
    assert(n("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/implicit> { ?x a <urn:t#C> } }""") == 2)
    assert(n("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/implicit> { ?x <urn:t#sub> ?o } }""") == 1)
    // FROM rescopes the default graph onto the view (8.2 machinery):
    // exactly the six asserted statements
    assert(n("""SELECT ?x FROM <http://www.ontotext.com/explicit>
      WHERE { ?x ?p ?o }""") == 6)
    // disable-sameAs: the closure WITHOUT substitution — alias keeps its
    // tag but urn:a does not gain it; domain types still derive
    assert(n("SELECT ?x WHERE { ?x <urn:t#tag> ?o }") == 2)
    assert(n("""SELECT ?x FROM <http://www.ontotext.com/disable-sameAs>
      WHERE { ?x <urn:t#tag> ?o }""") == 1)
    assert(n("""SELECT ?x FROM <http://www.ontotext.com/disable-sameAs>
      WHERE { ?x a <urn:t#C> } """) == 1)
    // a property path evaluates INSIDE the view (step routing)
    assert(n("""SELECT ?x FROM <http://www.ontotext.com/explicit>
      WHERE { ?x <urn:t#sub>+ <urn:b> }""") == 1)
    // GRAPH ?g never enumerates pseudo-graphs (views, not contexts)
    assert(n("SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }") == 0)
    // the views follow updates (snapshot-scoped, incl. the memoized
    // disable-sameAs view)
    repos.update("pg", """INSERT DATA { <urn:c> <urn:t#p> "y" }""")
    val e2 = repos.engine("pg")
    assert(e2.select("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/implicit> { ?x a <urn:t#C> } }""")
      .count() == 3)
    assert(e2.select("""SELECT ?x FROM <http://www.ontotext.com/disable-sameAs>
      WHERE { ?x a <urn:t#C> }""").count() == 2)
    // skip-redundant-implicit: set-semantics store → the query view
    // itself (registered for drop-in GraphDB query compatibility)
    assert(e2.select("""SELECT ?x FROM <http://www.ontotext.com/skip-redundant-implicit>
      WHERE { ?x a <urn:t#C> }""").count() == 3)
    // statements(infer = false) reads the same asserted view (7 after
    // the insert); infer = true the closure
    assert(repos.statements("pg", infer = false).count() == 7)
    assert(repos.statements("pg", pred = Some("urn:t#tag"),
      infer = false).count() == 1)
    assert(repos.statements("pg", pred = Some("urn:t#tag")).count() == 2)
    // non-inference repository: explicit == store, implicit empty,
    // disable-sameAs == store
    repos.create("pg2", RepoConfig())
    repos.load("pg2", ttl.toString)
    val p2 = repos.engine("pg2")
    assert(p2.select("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/explicit> { ?x ?p ?o } }""").count() == 6)
    assert(p2.select("""SELECT ?x WHERE {
      GRAPH <http://www.ontotext.com/implicit> { ?x ?p ?o } }""").count() == 0)
    assert(p2.select("""SELECT ?x FROM <http://www.ontotext.com/disable-sameAs>
      WHERE { ?x ?p ?o }""").count() == 6)
  }

  test("Repositories: RDF4J-protocol conveniences — size, contexts, " +
    "namespaces CRUD, and namespace-aware querying (r12 cont.)") {
    import graft.sources.{RepoConfig, Repositories}
    val ttl = java.nio.file.Files.createTempFile("graft_ns", ".trig")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> .
        |<urn:g1> { <urn:a> t:p "x" . <urn:b> t:p "y" . }
        |<urn:g2> { <urn:c> t:q "z" . }""".stripMargin)
    val repos = new Repositories(spark)
    repos.create("ns", RepoConfig())
    repos.load("ns", ttl.toString)
    assert(repos.size("ns") == 3)
    assert(repos.contexts("ns") == Seq("urn:g1", "urn:g2"))
    // namespaces: PUT / GET / list / DELETE
    repos.setNamespace("ns", "t", "urn:t#")
    assert(repos.namespace("ns", "t").contains("urn:t#"))
    assert(repos.namespaces("ns") == Seq("t" -> "urn:t#"))
    // a stored prefix resolves in query text without a PREFIX line
    val n = repos.queryWithNamespaces("ns",
      "SELECT ?s WHERE { GRAPH <urn:g1> { ?s t:p ?v } }").count()
    assert(n == 2)
    // an in-text declaration WINS over the stored one (no double PREFIX)
    val m = repos.queryWithNamespaces("ns",
      """PREFIX t: <urn:other#>
        |SELECT ?s WHERE { GRAPH <urn:g1> { ?s t:p ?v } }""".stripMargin).count()
    assert(m == 0)
    repos.deleteNamespace("ns", "t")
    assert(repos.namespace("ns", "t").isEmpty)
    intercept[IllegalArgumentException](repos.size("missing"))
    // filtered statements (RDF4J GET /statements params): each param is
    // one predicate on the snapshot scan
    assert(repos.statements("ns", subj = Some("urn:a")).count() == 1)
    assert(repos.statements("ns", pred = Some("urn:t#p")).count() == 2)
    assert(repos.statements("ns", context = Some("urn:g2")).count() == 1)
    assert(repos.statements("ns",
      obj = Some(graft.model.RdfTerm.str("z"))).count() == 1)
    assert(repos.statements("ns", subj = Some("urn:a"),
      context = Some("urn:g2")).count() == 0)
  }

  test("Repositories: content-negotiated statement EXPORT round-trips in " +
    "every format (r12 cont.)") {
    import graft.sources.{RepoConfig, Repositories}
    val ttl = java.nio.file.Files.createTempFile("graft_exp", ".trig")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> .
        |<urn:a> t:p "x" ; t:n 7 .
        |<urn:g1> { <urn:b> t:p "y"@en . }""".stripMargin)
    val repos = new Repositories(spark)
    repos.create("exp", RepoConfig())
    repos.load("exp", ttl.toString)
    val want = repos.quads("exp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getStruct(3).getString(1))).toSet
    def parsed(fmt: String): Set[(String, String, String, String)] = {
      val doc = repos.export("exp", fmt)
      val back: Seq[graft.model.Quad] = fmt match {
        case "nquads" => doc.linesIterator
          .flatMap(graft.sources.NQuadsReader.parseLine(_)).toSeq
        case "trig" => graft.sources.TrigReader.parse(doc)
        case "jsonld" => graft.sources.JsonLdReader.parse(doc)
        case "rdfxml" => graft.sources.RdfXmlReader.parse(doc)
        case "turtle" => graft.sources.TurtleReader.parse(doc)
        case _ => doc.linesIterator
          .flatMap(graft.sources.NTriplesReader.parseLine(_)).toSeq
      }
      back.map(q => (q.graph, q.s, q.p, q.o.value)).toSet
    }
    // graph-aware formats keep the named context
    assert(parsed("nquads") == want)
    assert(parsed("trig") == want)
    assert(parsed("jsonld") == want)
    // triple formats drop it (everything lands in the default graph)
    val flat = want.map { case (_, s, p, v) => (Rdf.DefaultGraph, s, p, v) }
    assert(parsed("ntriples") == flat)
    assert(parsed("turtle") == flat)
    assert(parsed("rdfxml") == flat)
    intercept[IllegalArgumentException](repos.export("exp", "n3"))
  }

  test("Repositories: SPARQL Update maintains the inference closure — " +
    "insert derives, delete retracts unsupported entailments (S4 x S6)") {
    import graft.sources.{RepoConfig, Repositories}
    val ttl = java.nio.file.Files.createTempFile("graft_s4u", ".ttl")
    java.nio.file.Files.writeString(ttl,
      """@prefix t: <urn:t#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |t:hasType rdfs:domain t:Facility .""".stripMargin)
    val repos = new Repositories(spark)
    repos.create("upd", RepoConfig(inference = true))
    repos.load("upd", ttl.toString)
    def facilities() = repos.engine("upd")
      .select("SELECT ?x WHERE { ?x a <urn:t#Facility> }").count()
    assert(facilities() == 0)
    // insert-side: the delta is closed incrementally
    repos.update("upd", """INSERT DATA { <urn:f1> <urn:t#hasType> <urn:t#Park> }""")
    assert(facilities() == 1)
    // WHERE sees entailments: match on the INFERRED type, delete explicit
    repos.update("upd",
      """DELETE { ?f <urn:t#hasType> ?t }
        |WHERE { ?f a <urn:t#Facility> ; <urn:t#hasType> ?t }""".stripMargin)
    // the support is gone, so the entailment must be retracted too
    assert(facilities() == 0)
    // and the schema triple survives (only the instance data was deleted)
    assert(repos.quads("upd").count() == 1)
    // plain DELETE DATA of the asserted triple also retracts its entailment
    repos.update("upd", """INSERT DATA { <urn:f2> <urn:t#hasType> <urn:t#Pool> }""")
    assert(facilities() == 1)
    repos.update("upd", """DELETE DATA { <urn:f2> <urn:t#hasType> <urn:t#Pool> }""")
    assert(facilities() == 0)
  }

  test("query timeout: a slow action is cancelled at the configured bound; " +
    "a fast one under the same bound isn't (S4 queryTimeout knob)") {
    import graft.sources.{RepoConfig, Repositories}
    // deliberately slow: 32 tasks that each sleep 60 s — the 2 s watchdog
    // must cancel the job group (interrupting running tasks) long before
    val slow = udf(() => { Thread.sleep(60000L); 1 })
    val start = System.nanoTime()
    val ex = intercept[QueryTimeoutException] {
      QueryTimeout.run(spark, Some(2)) {
        spark.range(64).repartition(32).select(slow().as("v")).collect()
      }
    }
    val elapsedSec = (System.nanoTime() - start) / 1e9
    assert(ex.seconds == 2)
    assert(elapsedSec < 30, s"cancellation took ${elapsedSec}s — watchdog dead?")
    // a fast action under the same mechanism completes untouched
    assert(QueryTimeout.run(spark, Some(30))(spark.range(10).count()) == 10L)
    // the repository knob flows through to its engine, which still answers
    val repos = new Repositories(spark)
    repos.create("rt", RepoConfig(queryTimeoutSec = Some(30)))
    val eng = repos.engine("rt")
    assert(eng.queryTimeoutSec.contains(30))
    assert(!eng.ask("ASK { ?s ?p ?o }")) // guarded eager path, empty repo
  }

  test("pageRankFixed leaves no cached RDDs; ranks sum near vertex count") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val quads = catalog.forPredicate(
      graft.sources.DirectMapper.predIri("nation", "n_regionkey"))
    val ranks = graft.graph.GraphAnalytics.pageRankFixed(quads, Nil, iters = 3)
      .collect()
    assert(ranks.nonEmpty)
    // every vertex keeps the 0.15 base; total never exceeds |V| (mass leaks
    // at dangling sinks — regions have no outlinks — and integer flooring
    // only loses mass)
    assert(ranks.forall(_.getDouble(1) >= 0.15 - 1e-9))
    val total = ranks.map(_.getDouble(1)).sum
    assert(total <= ranks.length + 1e-6 && total > ranks.length * 0.14)
    assert(sc.getPersistentRDDs.keySet == before,
      "pageRankFixed left cached RDDs behind")
  }

  test("JSON-LD referenced @context IRIs (r14): resolve from the " +
      "caller-supplied registry (document-loader analog), recursively; " +
      "unregistered IRIs and cycles error loudly") {
    import graft.sources.JsonLdReader
    val base = """{"@context": {"name": "urn:t#name"}}"""
    // a context document may itself reference another registered IRI
    val derived =
      """{"@context": ["urn:ctx:base", {"age": {"@id": "urn:t#age",
        |  "@type": "http://www.w3.org/2001/XMLSchema#integer"}}]}"""
        .stripMargin
    val reg = Map("urn:ctx:base" -> base, "urn:ctx:derived" -> derived)
    val quads = JsonLdReader.parse(
      """{"@context": "urn:ctx:derived",
        |  "@id": "urn:p1", "name": "Ada", "age": "36"}""".stripMargin,
      contexts = reg)
    assert(quads.map(q => (q.p, q.o.value)).toSet ==
      Set("urn:t#name" -> "Ada", "urn:t#age" -> "36"))
    assert(quads.find(_.p == "urn:t#age").get.o.dtype
      .contains("http://www.w3.org/2001/XMLSchema#integer"))
    // an array mixing a referenced and an inline context applies in order
    val mixed = JsonLdReader.parse(
      """{"@context": ["urn:ctx:base", {"name": "urn:OVERRIDE#name"}],
        |  "@id": "urn:p2", "name": "Bo"}""".stripMargin, contexts = reg)
    assert(mixed.map(_.p) == Seq("urn:OVERRIDE#name"))
    // unregistered IRI: loud error naming the IRI
    val e1 = intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": "urn:ctx:missing", "@id": "urn:x"}""",
      contexts = reg))
    assert(e1.getMessage.contains("urn:ctx:missing") &&
      e1.getMessage.contains("not registered"))
    // with NO registry at all the old behavior stands
    assert(intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": "http://remote/ctx", "@id": "urn:x"}"""))
      .getMessage.contains("not registered"))
    // cyclic reference: error, not a loop
    val cyc = Map(
      "urn:ctx:a" -> """{"@context": "urn:ctx:b"}""",
      "urn:ctx:b" -> """{"@context": "urn:ctx:a"}""")
    assert(intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": "urn:ctx:a", "@id": "urn:x"}""", contexts = cyc))
      .getMessage.contains("cyclic"))
    // a registered document without a top-level @context errors
    assert(intercept[IllegalArgumentException](JsonLdReader.parse(
      """{"@context": "urn:ctx:bad", "@id": "urn:x"}""",
      contexts = Map("urn:ctx:bad" -> """{"nope": 1}""")))
      .getMessage.contains("no top-level @context"))
  }
}
