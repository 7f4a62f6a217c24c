package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.model.RdfTerm

/** HTTP-shaped SPARQL endpoint boundary for SERVICE (SPARQL 1.1 Federated
  * Query — the reference engine federates to arbitrary HTTP endpoints,
  * `/root/reference/Dockerfile:2`). The compiler ships the sub-query as
  * TEXT and reads back an `application/sparql-results+json` document —
  * exactly a remote endpoint's wire contract minus the socket, so a real
  * HTTP client drops in by implementing this one method. Failures surface
  * as exceptions; SERVICE SILENT maps any failure to the unit solution
  * (spec §5 "SILENT is used to indicate that errors ... should be
  * ignored").
  */
trait SparqlEndpoint {
  /** Run `sparql` against the endpoint, returning the SPARQL 1.1 Query
    * Results JSON document. Throw on any failure (unreachable, parse
    * error, execution error) — the caller decides SILENT handling.
    */
  def query(sparql: String): String

  /** Run `sparql` returning (body, Content-Type). Endpoints that ignore
    * the Accept header and answer results-XML or results-TSV are
    * conformant-enough realities (r15) — the caller dispatches the parser
    * on the ACTUAL content type. Default: the JSON contract above.
    */
  def queryTyped(sparql: String): (String, String) =
    (query(sparql), "application/sparql-results+json")
}

/** Loopback client: the engine's own results serializer answers the
  * request, so the boundary exercises the full text → parse → execute →
  * serialize → parse-results cycle without a network (none is available in
  * this environment; the reference's own tests run against localhost,
  * `init-graphdb.sh`).
  */
final class LoopbackEndpoint(cat: GraphCatalog) extends SparqlEndpoint {
  def query(sparql: String): String = new graft.Engine(cat).selectJson(sparql)
}

/** Real-network client for the same boundary: POST the query text
  * (`application/sparql-query`) to a SPARQL Protocol endpoint URL and
  * return the `application/sparql-results+json` body — the standard
  * federation wire exchange (SPARQL 1.1 Protocol §2.1.3). Non-2xx and
  * transport failures throw, so SILENT semantics apply unchanged. The
  * JDK `java.net.http` client keeps the engine dependency-free; tests
  * drive it against a localhost socket (this container has no external
  * network).
  */
final class HttpEndpoint(url: String,
    timeout: java.time.Duration = java.time.Duration.ofSeconds(30))
    extends SparqlEndpoint {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(timeout).build()
  def query(sparql: String): String = queryTyped(sparql)._1

  override def queryTyped(sparql: String): (String, String) = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(timeout)
      .header("Content-Type", "application/sparql-query")
      .header("Accept", "application/sparql-results+json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(sparql))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2) {
      // SPARQL Protocol error responses carry a textual explanation —
      // surface a bounded slice of it (r12): "HTTP 500" alone sends the
      // user to the remote's logs for what the body already said
      val detail = Option(resp.body()).map(_.trim).filter(_.nonEmpty)
        .map(b => s": ${b.take(200)}").getOrElse("")
      throw new java.io.IOException(
        s"SPARQL endpoint $url returned HTTP ${resp.statusCode()}$detail")
    }
    // a remote that ignores Accept still labels what it sent — dispatch
    // on it (missing header: assume the requested JSON)
    val ctype = resp.headers().firstValue("Content-Type")
      .orElse("application/sparql-results+json")
    (resp.body(), ctype)
  }
}

/** Parser for SPARQL 1.1 Query Results JSON (the inverse of
  * [[graft.Engine.selectJson]] — and of any conformant remote endpoint's
  * response).
  */
object SparqlResultsJson {

  /** (head vars, bindings rows) — a row cell is None when the variable is
    * unbound in that solution.
    */
  def parse(doc: String): (Seq[String], Seq[Seq[Option[RdfTerm]]]) = {
    val root = new ObjectMapper().readTree(doc)
    val vars = root.path("head").path("vars").elements().asScala
      .map(_.asText).toSeq
    val rows = root.path("results").path("bindings").elements().asScala
      .map { b =>
        vars.map { v =>
          Option(b.get(v)).map { t =>
            val value = t.path("value").asText
            t.path("type").asText match {
              case "uri" => RdfTerm.iri(value)
              case "bnode" =>
                // the wire label carries no "_:" (results-JSON §3.2.2);
                // internal bnode values do — tolerate both
                RdfTerm.blank(
                  if (value.startsWith("_:")) value else "_:" + value)
              case _ => // "literal" (incl. the legacy "typed-literal")
                val dt = Option(t.get("datatype")).map(_.asText)
                val lang = Option(t.get("xml:lang")).map(_.asText)
                (dt, lang) match {
                  case (Some(d), _) => RdfTerm.typed(value, d)
                  case (_, Some(l)) => RdfTerm.lang(value, l)
                  case _ => RdfTerm.str(value)
                }
            }
          }
        }.toSeq
      }.toSeq
    (vars, rows)
  }
}

/** Parser for the SPARQL Query Results XML Format (the second wire format
  * a real federated endpoint answers — the engine has written it since
  * the snk_* sinks; r15 adds the READ side). Namespace-aware JDK DOM;
  * local names only, so both prefixed and default-namespace documents
  * parse.
  */
object SparqlResultsXml {

  def parse(doc: String): (Seq[String], Seq[Seq[Option[RdfTerm]]]) = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // results documents are self-contained — refuse external entities
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val dom = dbf.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(
        doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    def children(n: org.w3c.dom.Node, local: String): Seq[org.w3c.dom.Element] = {
      val out = scala.collection.mutable.ListBuffer.empty[org.w3c.dom.Element]
      val cs = n.getChildNodes
      (0 until cs.getLength).foreach { i =>
        cs.item(i) match {
          case e: org.w3c.dom.Element if e.getLocalName == local => out += e
          case _ =>
        }
      }
      out.toList
    }
    val root = dom.getDocumentElement
    require(root.getLocalName == "sparql", s"results-XML: root is <${root.getTagName}>")
    val head = children(root, "head").headOption.getOrElse(
      throw new IllegalArgumentException("results-XML: no <head>"))
    val vars = children(head, "variable").map(_.getAttribute("name"))
    val results = children(root, "results").headOption.getOrElse(
      throw new IllegalArgumentException("results-XML: no <results>"))
    def term(e: org.w3c.dom.Element): RdfTerm = e.getLocalName match {
      case "uri" => RdfTerm.iri(e.getTextContent)
      case "bnode" =>
        val l = e.getTextContent
        RdfTerm.blank(if (l.startsWith("_:")) l else "_:" + l)
      case "literal" =>
        val value = e.getTextContent
        val dt = Option(e.getAttribute("datatype")).filter(_.nonEmpty)
        val lang = Option(e.getAttributeNS(
          "http://www.w3.org/XML/1998/namespace", "lang")).filter(_.nonEmpty)
        (dt, lang) match {
          case (Some(d), _) => RdfTerm.typed(value, d)
          case (_, Some(l)) => RdfTerm.lang(value, l)
          case _ => RdfTerm.str(value)
        }
      case other => throw new IllegalArgumentException(
        s"results-XML: unknown term element <$other>")
    }
    val rows = children(results, "result").map { r =>
      val bound = children(r, "binding").map { b =>
        val t = {
          val cs = b.getChildNodes
          (0 until cs.getLength).map(cs.item)
            .collectFirst { case e: org.w3c.dom.Element => e }
            .getOrElse(throw new IllegalArgumentException(
              "results-XML: empty <binding>"))
        }
        b.getAttribute("name") -> term(t)
      }.toMap
      vars.map(bound.get)
    }
    (vars, rows)
  }
}

/** Parser for SPARQL 1.1 Query Results TSV (`text/tab-separated-values`):
  * header `?x⟨tab⟩?y`, one row per solution, cells in N-Triples term
  * encoding — `<iri>`, `_:label`, `"lex"[@lang|^^<dt>]` with N-Triples
  * string escapes — plus the TSV shorthand forms the spec admits (bare
  * numbers and true/false). Empty cell = unbound.
  */
object SparqlResultsTsv {

  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' =>
            sb.appendAll(Character.toChars(
              Integer.parseInt(s.substring(i + 2, i + 10), 16)))
            i += 10
          case d => sb.append(d); i += 2 // \" \' \\
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private[graft] def cell(tok: String): Option[RdfTerm] = tok match {
    case "" => None
    case t if t.startsWith("<") && t.endsWith(">") =>
      Some(RdfTerm.iri(t.substring(1, t.length - 1)))
    case t if t.startsWith("_:") => Some(RdfTerm.blank(t))
    case t if t.startsWith("\"") =>
      var close = -1
      var i = 1
      while (i < t.length && close < 0) {
        if (t.charAt(i) == '\\') i += 2
        else { if (t.charAt(i) == '"') close = i; i += 1 }
      }
      require(close > 0, s"results-TSV: unterminated literal $t")
      val lex = unescape(t.substring(1, close))
      val suffix = t.substring(close + 1)
      if (suffix.isEmpty) Some(RdfTerm.str(lex))
      else if (suffix.startsWith("@")) Some(RdfTerm.lang(lex, suffix.substring(1)))
      else if (suffix.startsWith("^^<") && suffix.endsWith(">"))
        Some(RdfTerm.typed(lex, suffix.substring(3, suffix.length - 1)))
      else throw new IllegalArgumentException(
        s"results-TSV: bad literal suffix in $t")
    case "true" | "false" =>
      Some(RdfTerm.typed(tok, "http://www.w3.org/2001/XMLSchema#boolean"))
    case t if t.matches("[+-]?[0-9]+") =>
      Some(RdfTerm.typed(t, "http://www.w3.org/2001/XMLSchema#integer"))
    case t if t.matches("""[+-]?[0-9]*\.?[0-9]+[eE][+-]?[0-9]+""") =>
      Some(RdfTerm.typed(t, "http://www.w3.org/2001/XMLSchema#double"))
    case t if t.matches("""[+-]?[0-9]*\.[0-9]+""") =>
      Some(RdfTerm.typed(t, "http://www.w3.org/2001/XMLSchema#decimal"))
    case t => throw new IllegalArgumentException(s"results-TSV: bad term $t")
  }

  def parse(doc: String): (Seq[String], Seq[Seq[Option[RdfTerm]]]) = {
    // rows split on newline: N-Triples encoding escapes embedded \n, so a
    // raw newline is always a row boundary (trailing \r from CRLF dropped)
    val lines = doc.split("\n", -1).toSeq.map(_.stripSuffix("\r"))
    require(lines.nonEmpty && lines.head.nonEmpty, "results-TSV: no header")
    val vars = lines.head.split("\t", -1).toSeq.map { h =>
      val t = h.trim
      require(t.startsWith("?"), s"results-TSV: header cell '$h' is not ?var")
      t.substring(1)
    }
    val rows = lines.tail.filter(_.nonEmpty).map { l =>
      val cells = l.split("\t", -1).toSeq
      require(cells.length == vars.length,
        s"results-TSV: row has ${cells.length} cells, header ${vars.length}")
      cells.map(c => cell(c.trim))
    }
    (vars, rows)
  }
}

/** Content-type dispatch over the three readable wire formats (CSV is
  * refused loudly: results-CSV erases term kind and datatype — parsing it
  * would fabricate plain literals out of IRIs).
  */
object SparqlResults {

  def parse(body: String, contentType: String):
      (Seq[String], Seq[Seq[Option[RdfTerm]]]) = {
    val ct = contentType.split(";")(0).trim.toLowerCase
    if (ct.contains("json")) SparqlResultsJson.parse(body)
    else if (ct.contains("xml")) SparqlResultsXml.parse(body)
    else if (ct.contains("tab-separated") || ct.endsWith("/tsv"))
      SparqlResultsTsv.parse(body)
    else if (ct.contains("csv")) throw new IllegalArgumentException(
      "SERVICE response is results-CSV — a lossy format (term kinds and " +
        "datatypes erased); configure the endpoint for JSON, XML, or TSV")
    else SparqlResultsJson.parse(body) // unlabeled: assume requested JSON
  }
}
