package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{Quad, Rdf, RdfTerm}

/** RDF/XML parser + distributed loader (SURVEY §2.1 — format breadth beyond
  * the reference's Turtle-only loads, `init-graphdb.sh:91`).
  *
  * Same parallelism model as [[TurtleReader]]: RDF/XML is document-scoped
  * (namespaces, xml:base), so the unit of parallelism is the FILE —
  * `wholetext` read + a pure per-document parser inside `mapPartitions`.
  *
  * Grammar subset (the RDF/XML core): `rdf:RDF` roots, `rdf:Description` and
  * typed node elements, `rdf:about`/`rdf:ID`/`rdf:nodeID` subjects, property
  * elements with `rdf:resource`/`rdf:nodeID`/nested node elements/
  * `rdf:datatype`/`xml:lang` literals, `rdf:parseType="Resource"`,
  * `rdf:parseType="Collection"` (rdf:first/rest chains), containers with
  * `rdf:li` (positional `rdf:_n` numbering per node element), and
  * abbreviated property ATTRIBUTES. Not in scope (v1):
  * `parseType="Literal"`, reification, xml:base resolution beyond simple
  * concatenation.
  */
object RdfXmlReader {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"

  def load(spark: SparkSession, path: String, graph: String = Rdf.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path).as[String]
      .mapPartitions(_.flatMap(doc => parse(doc, graph)))
  }

  def loadDF(spark: SparkSession, path: String, graph: String = Rdf.DefaultGraph): DataFrame =
    load(spark, path, graph).toDF()

  /** Hardened SAX parser: RDF/XML inputs are untrusted data files — DOCTYPE
    * declarations (XXE / billion-laughs entity expansion) could read executor-
    * local files or blow heap during a distributed load, so they are rejected
    * outright and external entity resolution is disabled.
    */
  private def secureParser(): javax.xml.parsers.SAXParser = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setNamespaceAware(true)
    f.setXIncludeAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.newSAXParser()
  }

  /** Pure, driver-independent parser (also used directly in tests). */
  def parse(doc: String, graph: String = Rdf.DefaultGraph): Seq[Quad] = {
    import scala.xml.{Attribute, Elem, Node, XML}
    val root = XML.withSAXParser(secureParser()).loadString(doc)
    val out = collection.mutable.ArrayBuffer[Quad]()
    var bn = 0
    def fresh(): String = { bn += 1; s"_:rx$bn" }
    val base = root.attribute(XmlNs, "base").map(_.text).getOrElse("")
    def resolve(iri: String): String = graft.model.IriResolver.resolve(base, iri)
    def uriOf(e: Elem): String = Option(e.namespace).getOrElse("") + e.label
    def childElems(n: Node): Seq[Elem] = n.child.collect { case e: Elem => e }.toSeq
    def rdfAttr(e: Elem, local: String): Option[String] =
      e.attribute(RdfNs, local).map(_.text)

    def termOfSubject(s: String): RdfTerm =
      if (s.startsWith("_:")) RdfTerm.blank(s) else RdfTerm.iri(s)

    /** Emit the triples of one property element for subject `s`.
      * `pOverride` carries the positional `rdf:_n` predicate for `rdf:li`
      * container members.
      */
    def emitProperty(s: String, pe: Elem, pOverride: Option[String] = None): Unit = {
      val p = pOverride.getOrElse(uriOf(pe))
      val o: RdfTerm = rdfAttr(pe, "resource").map(r => RdfTerm.iri(resolve(r)))
        .orElse(rdfAttr(pe, "nodeID").map(id => RdfTerm.blank("_:" + id)))
        .getOrElse {
          if (rdfAttr(pe, "parseType").contains("Resource")) {
            val b = fresh() // anonymous node whose children ARE property elems
            childElems(pe).foreach(emitProperty(b, _))
            RdfTerm.blank(b)
          } else if (rdfAttr(pe, "parseType").contains("Collection")) {
            // child node elements become an rdf:first/rest chain
            val members = childElems(pe).map(c => termOfSubject(parseNodeElem(c)))
            if (members.isEmpty) RdfTerm.iri(Rdf.RdfNil)
            else {
              val nodes = members.map(_ => fresh())
              nodes.lazyZip(members).lazyZip(
                nodes.drop(1).map(RdfTerm.blank) :+ RdfTerm.iri(Rdf.RdfNil))
                .foreach { (b, item, rest) =>
                  out += Quad(graph, b, Rdf.RdfFirst, item)
                  out += Quad(graph, b, Rdf.RdfRest, rest)
                }
              RdfTerm.blank(nodes.head)
            }
          } else childElems(pe) match {
            case inner +: _ => termOfSubject(parseNodeElem(inner))
            case _ =>
              val lex = pe.text
              rdfAttr(pe, "datatype").map(dt => RdfTerm.typed(lex, dt))
                .orElse(pe.attribute(XmlNs, "lang").map(l => RdfTerm.lang(lex, l.text)))
                .getOrElse(RdfTerm.str(lex))
          }
        }
      out += Quad(graph, s, p, o)
    }

    /** Parse one node element; returns its subject (IRI or `_:` label). */
    def parseNodeElem(e: Elem): String = {
      val s = rdfAttr(e, "about").map(resolve)
        .orElse(rdfAttr(e, "ID").map(v => resolve("#" + v)))
        .orElse(rdfAttr(e, "nodeID").map("_:" + _))
        .getOrElse(fresh())
      if (uriOf(e) != RdfNs + "Description")
        out += Quad(graph, s, Rdf.RdfType, RdfTerm.iri(uriOf(e)))
      // abbreviated property attributes (non-rdf, non-xml namespaces)
      e.attributes.foreach {
        case a: Attribute =>
          val ns = Option(a.getNamespace(e)).getOrElse("")
          if (ns.nonEmpty && ns != RdfNs && ns != XmlNs)
            out += Quad(graph, s, ns + a.key, RdfTerm.str(a.value.text))
        case _ => ()
      }
      // containers (rdf:Bag/Seq/Alt or any node): rdf:li members number
      // positionally as rdf:_1, rdf:_2, … per node element
      var li = 0
      childElems(e).foreach { pe =>
        val ovr =
          if (uriOf(pe) == RdfNs + "li") { li += 1; Some(RdfNs + "_" + li) }
          else None
        emitProperty(s, pe, ovr)
      }
      s
    }

    val tops =
      if (uriOf(root) == RdfNs + "RDF") childElems(root) else Seq(root)
    tops.foreach(parseNodeElem)
    out.distinct.toSeq // a document denotes a SET of triples (r17)
  }
}
