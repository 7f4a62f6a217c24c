package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Quad, Rdf, RdfTerm}
import graft.sources.{GraphCatalog, NQuadsReader, NTriplesReader, RdfWriter, TurtleReader}
import graft.inference.Inference

/** RDF export writers (the reverse of the S1/S5 loaders — the reference's
  * content-negotiated statements EXPORT surface) + the SPARQL-XML results
  * sink. The core law for each format: parse(serialize(q)) == q.
  */
class RdfWriterSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // every term kind, plus escaping hazards in the literal
  private val quads = Seq(
    Quad(Rdf.DefaultGraph, "urn:a", "urn:p", RdfTerm.iri("urn:b")),
    Quad(Rdf.DefaultGraph, "_:x", "urn:p", RdfTerm.str("plain")),
    Quad(Rdf.DefaultGraph, "urn:a", "urn:q",
      RdfTerm.lang("bonjour \"le\"\nmonde\t\\", "fr")),
    Quad(Rdf.DefaultGraph, "urn:a", "urn:r",
      RdfTerm.typed("3.14", Rdf.XsdDecimal)),
    Quad(Rdf.DefaultGraph, "urn:a", "urn:s", RdfTerm.blank("_:y")),
    Quad("urn:g1", "urn:c", "urn:p", RdfTerm.str("in named graph")))

  private def df = quads.toDS().toDF()

  test("N-Triples writer round-trips through NTriplesReader") {
    val lines = RdfWriter.ntriplesLines(df).as[String].collect().toSeq
    assert(lines.size == quads.size)
    assert(lines.forall(_.endsWith(" .")))
    // escaping: the lang literal serializes with \" \n \t \\ escapes
    val langLine = lines.find(_.contains("@fr")).get
    assert(langLine.contains("""bonjour \"le\"\nmonde\t\\"""))
    val round = lines.flatMap(NTriplesReader.parseLine(_)).toSet
    // graph identity is lost by design (N-Triples is a triple format)
    assert(round == quads.map(_.copy(graph = Rdf.DefaultGraph)).toSet)
  }

  test("N-Quads writer round-trips, default graph term omitted") {
    val lines = RdfWriter.nquadsLines(df).as[String].collect().toSeq
    val named = lines.filter(_.contains("<urn:g1>"))
    assert(named.size == 1)
    // default-graph quads never write a graph term
    assert(lines.forall(!_.contains(Rdf.DefaultGraph)))
    val round = lines.flatMap(NQuadsReader.parseLine(_)).toSet
    assert(round == quads.toSet)
  }

  test("Turtle writer: prefixed, subject-grouped, round-trips via TurtleReader") {
    val tq = Seq(
      Quad(Rdf.DefaultGraph, "http://e/f1", Rdf.RdfType, RdfTerm.iri("http://e/Facility")),
      Quad(Rdf.DefaultGraph, "http://e/f1", "http://schema.org/name", RdfTerm.str("Main Park")),
      Quad(Rdf.DefaultGraph, "http://e/f1", "http://www.w3.org/2000/01/rdf-schema#label",
        RdfTerm.lang("park", "en")),
      Quad(Rdf.DefaultGraph, "http://e/f2", "http://e/rating",
        RdfTerm.typed("4.5", Rdf.XsdDecimal)))
    val doc = RdfWriter.document(RdfWriter.turtleLines(tq.toDS().toDF(),
      Map("rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
        "xsd" -> "http://www.w3.org/2001/XMLSchema#",
        "e" -> "http://e/")))
    assert(doc.contains("@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> ."))
    assert(doc.contains("rdfs:label")) // predicate compaction
    assert(doc.contains("e:rating"))
    assert(doc.contains(" ;\n")) // subject grouping produced a predicate list
    val round = TurtleReader.parse(doc).toSet
    assert(round == tq.toSet)
  }

  test("Turtle writer leaves unsafe local names absolute") {
    val tq = Seq(Quad(Rdf.DefaultGraph, "http://e/a b", "http://e/p/q",
      RdfTerm.iri("http://e/ok")))
    val doc = RdfWriter.document(RdfWriter.turtleLines(tq.toDS().toDF(),
      Map("e" -> "http://e/")))
    // subject has a space, predicate local part has '/': both stay bracketed
    assert(doc.contains("<http://e/a b>"))
    assert(doc.contains("<http://e/p/q>"))
    assert(doc.contains("e:ok"))
  }

  test("SPARQL-XML results sink serializes uri/literal/lang bindings") {
    val cat = new GraphCatalog(spark)
    cat.addQuads(Inference.materialize(spark, Seq(
      Quad(Rdf.DefaultGraph, "http://e/f1", "http://schema.org/name",
        RdfTerm.lang("P<re>", "en")),
      Quad(Rdf.DefaultGraph, "http://e/f1", "http://e/area",
        RdfTerm.iri("http://e/a1"))).toDS().toDF()))
    val xml = new Engine(cat).selectXml(
      """SELECT ?s ?n WHERE { ?s <http://schema.org/name> ?n }""")
    assert(xml.startsWith("<?xml"))
    assert(xml.contains("""<variable name="s"/><variable name="n"/>"""))
    assert(xml.contains("""<uri>http://e/f1</uri>"""))
    assert(xml.contains("""<literal xml:lang="en">P&lt;re&gt;</literal>"""))
  }

  test("RDF/XML export round-trips through RdfXmlReader: IRIs, bnodes, " +
      "lang/typed literals, XML-special characters") {
    import spark.implicits._
    val quads = Seq(
      Quad(Rdf.DefaultGraph, "http://e/s1", "http://e/v#ref",
        RdfTerm.iri("http://e/o1?a=1&b=<2>")),
      Quad(Rdf.DefaultGraph, "http://e/s1", "http://e/v#txt",
        RdfTerm.str("""a & <b> "c"""")),
      Quad(Rdf.DefaultGraph, "http://e/s1", "http://e/v#tag",
        RdfTerm.lang("faoi", "ga")),
      Quad(Rdf.DefaultGraph, "http://e/s1", "http://e/v#n",
        RdfTerm.int(42)),
      Quad(Rdf.DefaultGraph, "http://e/s1", "http://e/v#addr",
        RdfTerm.blank("_:b7")),
      Quad(Rdf.DefaultGraph, "_:b7", "http://e/v#city",
        RdfTerm.str("Dublin")))
    val doc = RdfWriter.document(
      RdfWriter.rdfXmlLines(quads.toDS().toDF()))
    assert(doc.startsWith("<?xml"))
    val back = graft.sources.RdfXmlReader.parse(doc)
    assert(back.toSet == quads.toSet, doc)
  }

  test("TriG export round-trips through TrigReader: bare default graph, " +
      "named-graph blocks") {
    val doc = RdfWriter.document(RdfWriter.trigLines(df))
    assert(doc.contains("<urn:g1> {"), doc)
    val back = graft.sources.TrigReader.parse(doc)
    assert(back.toSet == quads.toSet, doc)
  }

  test("JSON-LD export round-trips through JsonLdReader: every term kind, " +
      "JSON escaping hazards, named graphs via @graph wrappers") {
    val doc = RdfWriter.document(RdfWriter.jsonLdLines(df))
    assert(doc.startsWith("[") && doc.trim.endsWith("]"), doc)
    val back = graft.sources.JsonLdReader.parse(doc)
    assert(back.toSet == quads.toSet, doc)
    // multi-valued predicates collect into ONE array entry (valid JSON —
    // no duplicate keys)
    val multi = Seq(
      Quad(Rdf.DefaultGraph, "urn:m", "urn:p", RdfTerm.str("x")),
      Quad(Rdf.DefaultGraph, "urn:m", "urn:p", RdfTerm.str("y")),
      Quad(Rdf.DefaultGraph, "urn:m", "urn:p", RdfTerm.int(5)))
    val mdoc = RdfWriter.document(RdfWriter.jsonLdLines(multi.toDS().toDF()))
    assert("\"urn:p\"".r.findAllIn(mdoc).size == 1, mdoc)
    assert(graft.sources.JsonLdReader.parse(mdoc).toSet == multi.toSet, mdoc)
  }

  test("JSON-LD export escapes EVERY control char U+0000-U+001F as \\u00XX " +
      "(RFC 8259) and still round-trips term-exactly") {
    val ctl = Seq(
      Quad(Rdf.DefaultGraph, "urn:c", "urn:p",
        RdfTerm.str("a\u0001b\fc\bd\u001fe")),
      Quad(Rdf.DefaultGraph, "urn:c", "urn:q",
        RdfTerm.lang("x\u000by", "en")))
    val doc = RdfWriter.document(RdfWriter.jsonLdLines(ctl.toDS().toDF()))
    // no raw control char may survive in the document body
    assert(!doc.exists(ch => ch < 0x20 && ch != '\n'), doc)
    assert(doc.contains("\\u0001") && doc.contains("\\u000c") &&
      doc.contains("\\u0008") && doc.contains("\\u001f") &&
      doc.contains("\\u000b"), doc)
    assert(graft.sources.JsonLdReader.parse(doc).toSet == ctl.toSet, doc)
  }
}
