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
  def query(sparql: String): String = {
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
    resp.body()
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
