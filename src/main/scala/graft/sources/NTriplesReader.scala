package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Quad, Rdf, RdfTerm}

/** N-Triples reader (SURVEY §2.1 S5 — "N-Triples trivial via spark.read.text
  * + split").
  *
  * Unlike Turtle (document-scoped prefixes force per-file parsing), N-Triples
  * is LINE-delimited with absolute IRIs — the ideal 100 TB bulk format: a
  * plain `spark.read.text` splits at any byte boundary and every line parses
  * independently (narrow map, no shuffle, arbitrarily parallel).
  */
object NTriplesReader {

  def load(spark: SparkSession, path: String, graph: String = Rdf.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    spark.read.text(path).as[String]
      .flatMap(line => parseLine(line, graph))
  }

  /** Parse one N-Triples line; None for blank/comment lines. */
  def parseLine(line0: String, graph: String = Rdf.DefaultGraph): Option[Quad] =
    parseLineG(line0, graph, allowGraph = false)

  /** Shared N-Triples/N-Quads line parser: with `allowGraph` an optional
    * 4th term (IRI or bnode label) before the final `.` becomes the quad's
    * graph ([[NQuadsReader]]); without, lines are plain triples.
    */
  private[sources] def parseLineG(line0: String, graph: String,
      allowGraph: Boolean): Option[Quad] = {
    val line = line0.trim
    if (line.isEmpty || line.startsWith("#")) return None
    var pos = 0
    def ws(): Unit = while (pos < line.length && line.charAt(pos).isWhitespace) pos += 1
    def iriRef(): String = {
      val e = line.indexOf('>', pos)
      // UCHAR escapes are the only escapes legal inside an IRIREF
      val iri = graft.parser.SparqlParser.unescapeCodepoints(
        line.substring(pos + 1, e))
      pos = e + 1; iri
    }
    def bnode(): String = {
      pos += 2; val s = pos
      while (pos < line.length && !line.charAt(pos).isWhitespace) pos += 1
      "_:" + line.substring(s, pos)
    }
    ws()
    val s = if (line.charAt(pos) == '<') iriRef() else bnode()
    ws()
    val p = iriRef()
    ws()
    val o: RdfTerm = line.charAt(pos) match {
      case '<' => RdfTerm.iri(iriRef())
      case '_' => RdfTerm.blank(bnode())
      case '"' =>
        val sb = new StringBuilder
        pos += 1
        while (line.charAt(pos) != '"') {
          if (line.charAt(pos) == '\\') {
            pos += 1
            line.charAt(pos) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r')
              case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
              case 'u' =>
                val h = line.substring(pos + 1, pos + 5); pos += 4
                sb.append(Integer.parseInt(h, 16).toChar)
              case 'U' => // astral UCHAR → UTF-16 pair
                val h = line.substring(pos + 1, pos + 9); pos += 8
                sb.appendAll(Character.toChars(Integer.parseInt(h, 16)))
              case c => sb.append(c)
            }
          } else sb.append(line.charAt(pos))
          pos += 1
        }
        pos += 1
        val lex = sb.toString
        if (pos < line.length && line.charAt(pos) == '@') {
          pos += 1; val ls = pos
          while (pos < line.length && (line.charAt(pos).isLetterOrDigit || line.charAt(pos) == '-')) pos += 1
          RdfTerm.lang(lex, line.substring(ls, pos))
        } else if (pos + 1 < line.length && line.startsWith("^^", pos)) {
          pos += 2; RdfTerm.typed(lex, iriRef())
        } else RdfTerm.str(lex)
      case other => throw new IllegalArgumentException(s"bad N-Triples object at '$line'")
    }
    val g =
      if (allowGraph) {
        ws()
        if (pos < line.length && line.charAt(pos) == '<') iriRef()
        else if (pos < line.length && line.charAt(pos) == '_') bnode()
        else graph
      } else graph
    Some(Quad(g, s, p, o))
  }

  /** Canonical N-Triples token of one term (also the canonical form the
    * RDF-star quoted-triple ids hash over, [[TurtleReader]]).
    */
  def termToken(t: RdfTerm): String = t.kind match {
    case Rdf.KindIri => s"<${t.value}>"
    case Rdf.KindBlank => t.value
    case _ =>
      val esc = t.value.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
      "\"" + esc + "\"" +
        t.lang.map("@" + _).orElse(t.dtype.map(d => s"^^<$d>")).getOrElse("")
  }

  /** Serialize quads back to N-Triples lines (the matching sink). */
  def toLine(q: Quad): String = {
    val subj = if (q.s.startsWith("_:")) q.s else s"<${q.s}>"
    s"$subj <${q.p}> ${termToken(q.o)} ."
  }
}
