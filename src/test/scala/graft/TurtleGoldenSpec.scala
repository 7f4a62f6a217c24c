package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra._
import graft.inference.Inference
import graft.model.Rdf
import graft.sources.{GraphCatalog, TurtleReader}

/** Golden tests: parse the reference's own Turtle files
  * (`/root/reference/data/...`, read-only) with our TurtleReader and answer
  * the reference's documented queries (FIXTURES.md §B) over them.
  */
object SyntheticFacilities {
  val EX = "http://example.org/dcc/facilities#"
  val SCHEMA = "http://schema.org/" // as declared in facilities.ttl:4

  val types = Seq("Park", "Library", "SportsFacility", "CommunityCentre")
  val areas = Seq("NorthCentral", "NorthWest", "Central", "SouthCentral", "SouthEast")
  def typeOf(i: Int): String = types(i % types.length)
  // Parks only ever land in the first three areas, so "areas with no parks"
  // (reference Q2) has a non-trivial answer: SouthCentral + SouthEast.
  def areaOf(i: Int): String =
    if (typeOf(i) == "Park") areas(i % 3) else areas(i % 5)
  def latOf(i: Int): Double = 53.30 + (i % 10) * 0.01
  def lonOf(i: Int): Double = -6.30 + (i % 7) * 0.01

  // Synthetic stand-in for the stripped facilities_data.ttl — entity shape
  // fixed by the ontology (FIXTURES.md §A3; reference facilities.ttl:108-184).
  val facilitiesDoc: String = {
    val sb = new StringBuilder
    sb.append(s"@prefix ex: <$EX> .\n@prefix schema: <$SCHEMA> .\n")
    sb.append("@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n")
    for (i <- 0 until 40) {
      // NOTE: no `a ex:Facility` triple — inference must derive it.
      sb.append(
        s"""ex:fac_$i ex:facilityId "id-$i" ;
           |    schema:name "Facility $i" ;
           |    ex:hasFacilityType ex:${typeOf(i)} ;
           |    ex:inCommitteeArea ex:${areaOf(i)} ;
           |    ex:latitude "${latOf(i)}"^^xsd:decimal ;
           |    ex:longitude "${lonOf(i)}"^^xsd:decimal .
           |""".stripMargin)
    }
    sb.toString
  }
}

class TurtleGoldenSpec extends AnyFunSuite {
  import TestSpark.spark
  import SyntheticFacilities.{EX, SCHEMA, facilitiesDoc}

  test("turtle: blank-node property lists + collections (S1)") {
    val quads = TurtleReader.parse(
      """@prefix ex: <http://e/> .
        |ex:s ex:knows [ ex:name "Anna" ; ex:age 5 ] .
        |ex:s ex:list ( ex:a ex:b ) .
        |[ ex:tag "root" ] .
        |""".stripMargin)
    // bnode property list in object position
    val knows = quads.find(_.p == "http://e/knows").get.o
    assert(knows.kind == Rdf.KindBlank)
    assert(quads.exists(q => q.s == knows.value && q.p == "http://e/name" && q.o.value == "Anna"))
    assert(quads.exists(q => q.s == knows.value && q.p == "http://e/age" && q.o.num.contains(5.0)))
    // collection: rdf:first/rest chain, terminated by rdf:nil
    val head = quads.find(_.p == "http://e/list").get.o
    assert(head.kind == Rdf.KindBlank)
    assert(quads.filter(_.p == Rdf.RdfFirst).map(_.o.value).toSet ==
      Set("http://e/a", "http://e/b"))
    assert(quads.count(_.p == Rdf.RdfRest) == 2)
    assert(quads.exists(q => q.p == Rdf.RdfRest && q.o.value == Rdf.RdfNil))
    // standalone `[ … ] .` statement
    assert(quads.exists(q => q.s.startsWith("_:") && q.p == "http://e/tag" && q.o.value == "root"))
  }

  lazy val quads: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val onto = TurtleReader.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/root/reference/data/ontology/facilities.ttl")))
    val areas = TurtleReader.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/root/reference/data/graph_data/areas.ttl")))
    val facs = TurtleReader.parse(facilitiesDoc)
    (onto ++ areas ++ facs).toDS().toDF()
  }
  lazy val inferred: org.apache.spark.sql.DataFrame = Inference.materialize(spark, quads)
  lazy val compiler: Compiler = {
    val cat = new GraphCatalog(spark)
    cat.addQuads(inferred)
    new Compiler(cat)
  }

  test("parses the reference ontology + areas files (S1)") {
    val onto = TurtleReader.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/data/ontology/facilities.ttl")))
    assert(onto.size > 90) // ~107 triples (SURVEY §6)
    val areas = TurtleReader.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/data/graph_data/areas.ttl")))
    assert(areas.size == 15) // 5 areas × 3 triples (FIXTURES §A1)
    // language-tagged literal (areas.ttl:13)
    assert(areas.exists(q => q.o.lang.contains("en") &&
      q.o.value == "North Central Area Committee"))
    // typed literal declared range xsd:decimal present in ontology
    assert(onto.exists(_.p == Rdf.RdfsRange))
  }

  test("g6: global COUNT(*) over ?s ?p ?o (init-graphdb.sh:133)") {
    val sol = compiler.compile(Group(Nil, Seq("n" -> Aggs.countStar),
      Bgp(Seq(TriplePattern(V("s"), V("p"), V("o"))))))
    val n = sol.df.collect()(0).getStruct(0).getDouble(4).toLong
    assert(n > 120 + 40 * 6) // ontology + areas + facilities + inferred
  }

  test("g1/flagship: star BGP over facilities needs INFERRED types (README.md:70-78)") {
    val op = Slice(0, Some(10), Bgp(Seq(
      TriplePattern(V("f"), I(Rdf.RdfType), I(EX + "Facility")),
      TriplePattern(V("f"), I(SCHEMA + "name"), V("name")),
      TriplePattern(V("f"), I(EX + "hasFacilityType"), V("type")))))
    val rows = compiler.compile(op).df.collect()
    assert(rows.length == 10) // no asserted types: rdfs:domain rule fired
  }

  test("g2: facilities per type group-count (facilities.ttl:190-193)") {
    val op = Group(Seq("t"), Seq("n" -> Aggs.countStar), Bgp(Seq(
      TriplePattern(V("f"), I(EX + "hasFacilityType"), V("t")))))
    val sol = compiler.compile(op)
    val m = sol.df.collect().map(r => (r.getStruct(0).getString(1),
      r.getStruct(1).getDouble(4).toLong)).toMap
    assert(m(EX + "Park") == 10)
    assert(m.values.sum == 40)
  }

  test("g3: areas with no facilities via NOT EXISTS (facilities.ttl:195-202)") {
    // facilities 0..19 only cover 4 of 5 areas... 20..39 cover all 5; restrict
    // to Park facilities: parks are i%4==0 → areas NorthCentral/SouthEast only.
    val op = ExistsOp(
      Bgp(Seq(TriplePattern(V("a"), I(Rdf.RdfType), I(EX + "CommitteeArea")))),
      Bgp(Seq(
        TriplePattern(V("f"), I(EX + "hasFacilityType"), I(EX + "Park")),
        TriplePattern(V("f"), I(EX + "inCommitteeArea"), V("a")))),
      positive = false)
    val sol = compiler.compile(op)
    val noParks = sol.df.collect().map(_.getStruct(0).getString(1)).toSet
    val parkAreas = (0 until 40).filter(i => SyntheticFacilities.typeOf(i) == "Park")
      .map(i => EX + SyntheticFacilities.areaOf(i)).toSet
    assert(noParks == SyntheticFacilities.areas.map(EX + _).toSet -- parkAreas)
    assert(noParks.nonEmpty)
  }

  test("g5: numeric range filter on decimals (facilities.ttl:211-218)") {
    val op = FilterOp(
      E.and(
        E.gt(E.v("lat"), E.lift(E.termLit(graft.model.RdfTerm.dbl(53.33)))),
        E.lt(E.v("lon"), E.lift(E.termLit(graft.model.RdfTerm.dbl(-6.27))))),
      Bgp(Seq(
        TriplePattern(V("f"), I(EX + "latitude"), V("lat")),
        TriplePattern(V("f"), I(EX + "longitude"), V("lon")))))
    val got = compiler.compile(op).df.count()
    val expect = (0 until 40).count(i =>
      53.30 + (i % 10) * 0.01 > 53.33 && -6.30 + (i % 7) * 0.01 < -6.27)
    assert(got == expect)
  }

  test("inference derives range types too (SURVEY §2.11)") {
    val sol = compiler.compile(Bgp(Seq(
      TriplePattern(V("t"), I(Rdf.RdfType), I(EX + "FacilityType")))))
    val types = sol.df.collect().map(_.getStruct(0).getString(1)).toSet
    // 12 enumerated in the ontology (facilities.ttl:43-77); all asserted there
    assert(types.size >= 12)
    assert(types.contains(EX + "Park"))
  }
}
