package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{Quad, Rdf, RdfTerm}

/** Turtle document parser + distributed loader (SURVEY §2.1 S1).
  *
  * The reference ingests Turtle over HTTP (`init-graphdb.sh:88-125`,
  * `Content-Type: text/turtle` at `:91-92`); this loader reads Turtle files
  * into a `Dataset[Quad]`. Turtle is only line-splittable after statement
  * splitting and prefixes are document-scoped (`facilities.ttl:1-8`), so the
  * unit of parallelism is the FILE: `wholetext` read + a per-document pure
  * parser inside `mapPartitions`. At 100 TB one would pre-shard into many
  * documents; per-document parsing then scales linearly with no shuffle.
  *
  * Grammar subset: everything the reference's data exercises —
  * `@prefix`/`@base`, IRIs, prefixed names, `a` sugar, `;`/`,` continuations
  * (`areas.ttl:12-30`), string literals with escapes, long strings, `@lang`
  * tags (`areas.ttl:13`), `^^` typed literals (`facilities.ttl:178`), numeric
  * and boolean shorthand, `_:` blank nodes, comments — plus blank-node
  * property lists `[ … ]` (subject and object position) and RDF collections
  * `( … )` (object position, expanded to rdf:first/rest chains).
  */
object TurtleReader {

  def load(spark: SparkSession, path: String, graph: String = Rdf.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path).as[String]
      .mapPartitions(_.flatMap(doc => parse(doc, graph)))
  }

  def loadDF(spark: SparkSession, path: String, graph: String = Rdf.DefaultGraph): DataFrame =
    load(spark, path, graph).toDF()

  /** Pure, driver-independent Turtle parser (also used in unit tests).
    * Returns a SET (r17 probe-found): an RDF document denotes a graph,
    * which is a set of triples — a document asserting the same triple
    * twice (e.g. plain + star-annotated) must not double BGP solution
    * multiplicity. Document-local, so the distributed wholetext path
    * dedups per document with no shuffle.
    */
  def parse(doc: String, graph: String = Rdf.DefaultGraph): Seq[Quad] = {
    val p = new Parser(doc, graph)
    p.parseDocument().distinct
  }

  private[sources] final class Parser(input: String, graph: String,
      trig: Boolean = false) {
    private var pos = 0
    // TriG: the active graph — graph blocks push/pop it
    private var curGraph = graph
    private val n = input.length
    private val prefixes = collection.mutable.Map[String, String]()
    private var base = ""
    private val out = collection.mutable.ArrayBuffer[Quad]()

    def parseDocument(): Seq[Quad] = {
      skipWs()
      while (pos < n) {
        if (peekWord("@prefix") || peekWord("PREFIX")) parsePrefix()
        else if (peekWord("@base") || peekWord("BASE")) parseBase()
        else if (trig && graphBlockAhead()) parseGraphBlock()
        else parseStatement()
        skipWs()
      }
      out.toSeq
    }

    /** TriG: `GRAPH <g> {…}`, `<g> {…}`, `_:b {…}` or an anonymous `{…}`
      * block starts here. Detected by bounded lookahead (label then `{`) so
      * plain `s p o .` statements still route to [[parseStatement]].
      */
    private def graphBlockAhead(): Boolean = {
      if (peekWord("GRAPH")) return true
      skipWs()
      if (pos < n && input.charAt(pos) == '{') return true
      val save = pos
      try {
        if (pos < n && (input.charAt(pos) == '<' || input.startsWith("_:", pos) ||
            isPnChar(input.charAt(pos)) || input.charAt(pos) == ':')) {
          parseSubject()
          skipWs()
          pos < n && input.charAt(pos) == '{'
        } else false
      } catch { case _: Exception => false } finally pos = save
    }

    private def parseGraphBlock(): Unit = {
      skipWs()
      if (peekWord("GRAPH")) { pos += 5; skipWs() }
      val g = if (input.charAt(pos) == '{') Rdf.DefaultGraph else parseSubject()
      expect('{')
      val prev = curGraph
      curGraph = g
      skipWs()
      while (pos < n && input.charAt(pos) != '}') { parseStatement(); skipWs() }
      expect('}')
      curGraph = prev
      skipWs()
      if (pos < n && input.charAt(pos) == '.') pos += 1
    }

    private def err(msg: String) =
      throw new IllegalArgumentException(s"turtle parse error at $pos: $msg (near '${input.slice(pos, pos + 30)}')")

    private def skipWs(): Unit = {
      var go = true
      while (go && pos < n) {
        val c = input.charAt(pos)
        if (c == '#') { while (pos < n && input.charAt(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else go = false
      }
    }

    private def peekWord(w: String): Boolean =
      input.regionMatches(pos, w, 0, w.length) &&
        (pos + w.length >= n || !isPnChar(input.charAt(pos + w.length)))

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= n || input.charAt(pos) != c) err(s"expected '$c'")
      pos += 1
    }

    private def parsePrefix(): Unit = {
      pos += (if (input.charAt(pos) == '@') 7 else 6)
      skipWs()
      val colon = input.indexOf(':', pos)
      val name = input.substring(pos, colon).trim
      pos = colon + 1
      skipWs()
      prefixes(name) = parseIriRef()
      skipWs()
      if (pos < n && input.charAt(pos) == '.') pos += 1
    }

    private def parseBase(): Unit = {
      pos += (if (input.charAt(pos) == '@') 5 else 4)
      skipWs()
      base = parseIriRef()
      skipWs()
      if (pos < n && input.charAt(pos) == '.') pos += 1
    }

    private def parseIriRef(): String = {
      skipWs()
      if (input.charAt(pos) != '<') err("expected IRIREF")
      val end = input.indexOf('>', pos)
      // UCHAR escapes (\uXXXX/\UXXXXXXXX) are the ONLY escapes legal in
      // an IRIREF (Turtle §6.4) — decode before resolution
      val iri = graft.parser.SparqlParser.unescapeCodepoints(
        input.substring(pos + 1, end))
      pos = end + 1
      graft.model.IriResolver.resolve(base, iri) // RFC 3986 §5.2 (@base)
    }

    private def isPnChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.' || c == '%'

    // PN_LOCAL_ESC (Turtle §6.5, same table as SPARQL §19.8): '\' keeps
    // the escaped character as name content
    private val pnLocalEsc = "_~.-!$&'()*+,;=/?#@%"

    private def parsePrefixedOrKeyword(): Either[String, String] = {
      // Left(iri) for term, Right(keyword) for 'a'/'true'/'false'
      val sb = new StringBuilder
      val escaped = collection.mutable.ArrayBuffer[Boolean]()
      var go = true
      while (pos < n && go) {
        val c = input.charAt(pos)
        if (isPnChar(c) || c == ':') { sb.append(c); escaped += false; pos += 1 }
        else if (c == '\\' && pos + 1 < n &&
            pnLocalEsc.indexOf(input.charAt(pos + 1)) >= 0) {
          sb.append(input.charAt(pos + 1)); escaped += true; pos += 2
        } else go = false
      }
      var tok = sb.toString
      // a trailing UNESCAPED '.' is the statement terminator, not part of
      // the name (an escaped one is legal content)
      while (tok.endsWith(".") && !escaped.last) {
        tok = tok.dropRight(1); escaped.remove(escaped.length - 1); pos -= 1
      }
      tok match {
        case "a" => Right("a")
        case "true" | "false" => Right(tok)
        case _ =>
          val i = tok.indexOf(':')
          if (i < 0) err(s"bare word '$tok'")
          val pre = tok.substring(0, i); val local = tok.substring(i + 1)
          Left(prefixes.getOrElse(pre, err(s"unknown prefix '$pre'")) + local)
      }
    }

    // Keyed on (graph, id), not id alone: in TriG the same quoted triple
    // annotated in two graphs needs decomposition quads in BOTH graphs, or
    // GRAPH-scoped SPARQL-star patterns in the second graph fail to join.
    private val emittedQt = collection.mutable.Set[(String, String)]()

    /** Turtle-star `<< s p o >>` (RDF-star ships with the reference engine,
      * GraphDB 10.x): the quoted triple becomes a deterministic id IRI
      * `urn:graft:qt:<md5 of its canonical N-Triples tokens>` plus three
      * decomposition quads (emitted once per document), so annotations on
      * the same triple land on the same node and SPARQL-star patterns
      * compile to plain BGP joins. Nests in both positions.
      */
    private def parseQuotedTriple(): String = {
      pos += 2 // '<<'
      val s = parseSubject()
      val p = parsePredicate()
      val o = parseObject()
      skipWs()
      if (!input.startsWith(">>", pos)) err("expected '>>'")
      pos += 2
      qtId(s, p, o)
    }

    /** Deterministic quoted-triple id + its decomposition quads (emitted
      * once per document) — shared by `<< … >>` and the `{| … |}`
      * annotation shorthand, so both syntaxes land on the same node.
      */
    private def qtId(s: String, p: String, o: RdfTerm): String = {
      val sTerm = if (s.startsWith("_:")) RdfTerm.blank(s) else RdfTerm.iri(s)
      val key = NTriplesReader.termToken(sTerm) + " <" + p + "> " +
        NTriplesReader.termToken(o)
      val id = Rdf.QtPrefix + java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (emittedQt.add((curGraph, id))) {
        out += Quad(curGraph, id, Rdf.QtSubj, sTerm)
        out += Quad(curGraph, id, Rdf.QtPred, RdfTerm.iri(p))
        out += Quad(curGraph, id, Rdf.QtObj, o)
      }
      id
    }

    private def parseSubject(): String = {
      skipWs()
      if (input.startsWith("<<", pos)) return parseQuotedTriple()
      input.charAt(pos) match {
        case '<' => parseIriRef()
        case '_' if input.startsWith("_:", pos) =>
          pos += 2; val s = pos
          while (pos < n && isPnChar(input.charAt(pos))) pos += 1
          "_:" + input.substring(s, pos)
        case _ => parsePrefixedOrKeyword() match {
          case Left(iri) => iri
          case Right(k) => err(s"keyword '$k' as subject")
        }
      }
    }

    private def parsePredicate(): String = {
      skipWs()
      if (input.charAt(pos) == '<') parseIriRef()
      else parsePrefixedOrKeyword() match {
        case Left(iri) => iri
        case Right("a") => Rdf.RdfType
        case Right(k) => err(s"keyword '$k' as predicate")
      }
    }

    private def parseString(): String = {
      val sb = new StringBuilder
      val long3 = input.startsWith("\"\"\"", pos) || input.startsWith("'''", pos)
      val q = input.charAt(pos)
      val delim = if (long3) input.substring(pos, pos + 3) else q.toString
      pos += delim.length
      // A long string closes at a quote-RUN's final three quotes: `x""""`
      // is content `x"` + the closing delimiter, so a delimiter match
      // followed by ANOTHER quote consumes one quote as content instead.
      def atEnd: Boolean = input.startsWith(delim, pos) &&
        !(long3 && pos + 3 < n && input.charAt(pos + 3) == q)
      while (pos < n && !atEnd) {
        val c = input.charAt(pos)
        if (c == '\\' && pos + 1 < n) {
          pos += 1
          input.charAt(pos) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
            case 'u' =>
              val h = input.substring(pos + 1, pos + 5); pos += 4
              sb.append(Integer.parseInt(h, 16).toChar)
            case 'U' => // astral UCHAR: 8 hex digits → UTF-16 pair
              val h = input.substring(pos + 1, pos + 9); pos += 8
              sb.appendAll(Character.toChars(Integer.parseInt(h, 16)))
            case other => sb.append(other)
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      pos += delim.length
      sb.toString
    }

    private var bnodeCount = 0
    private def freshBnode(): String = { bnodeCount += 1; s"_:gen$bnodeCount" }

    /** `[ p o ; … ]` — allocate a blank node, emit its statements, return it. */
    private def parseBnodePropertyList(): String = {
      pos += 1 // consume '['
      val label = freshBnode()
      skipWs()
      if (input.charAt(pos) != ']') parsePredicateObjectList(label)
      expect(']')
      label
    }

    /** `( o1 o2 … )` — rdf:first/rest chain; `()` is rdf:nil. */
    private def parseCollection(): RdfTerm = {
      pos += 1 // consume '('
      val items = collection.mutable.ArrayBuffer[RdfTerm]()
      skipWs()
      while (input.charAt(pos) != ')') { items += parseObject(); skipWs() }
      pos += 1
      if (items.isEmpty) RdfTerm.iri(Rdf.RdfNil)
      else {
        val nodes = items.map(_ => freshBnode())
        nodes.zip(items).zipWithIndex.foreach { case ((b, item), i) =>
          out += Quad(curGraph, b, Rdf.RdfFirst, item)
          val rest = if (i == nodes.length - 1) RdfTerm.iri(Rdf.RdfNil)
          else RdfTerm.blank(nodes(i + 1))
          out += Quad(curGraph, b, Rdf.RdfRest, rest)
        }
        RdfTerm.blank(nodes.head)
      }
    }

    private def parseObject(): RdfTerm = {
      skipWs()
      if (input.startsWith("<<", pos)) return RdfTerm.iri(parseQuotedTriple())
      val c = input.charAt(pos)
      if (c == '[') RdfTerm.blank(parseBnodePropertyList())
      else if (c == '(') parseCollection()
      else if (c == '<') RdfTerm.iri(parseIriRef())
      else if (c == '"' || c == '\'') {
        val lex = parseString()
        if (pos < n && input.charAt(pos) == '@') {
          pos += 1; val s = pos
          while (pos < n && (input.charAt(pos).isLetterOrDigit || input.charAt(pos) == '-')) pos += 1
          RdfTerm.lang(lex, input.substring(s, pos))
        } else if (input.startsWith("^^", pos)) {
          pos += 2
          val dt = if (input.charAt(pos) == '<') parseIriRef()
          else parsePrefixedOrKeyword() match {
            case Left(iri) => iri
            case Right(k) => err(s"keyword '$k' as datatype")
          }
          RdfTerm.typed(lex, dt)
        } else RdfTerm.str(lex)
      } else if (input.startsWith("_:", pos)) {
        pos += 2; val s = pos
        while (pos < n && isPnChar(input.charAt(pos))) pos += 1
        RdfTerm.blank("_:" + input.substring(s, pos))
      } else if (c == '+' || c == '-' || c.isDigit ||
          (c == '.' && pos + 1 < n && input.charAt(pos + 1).isDigit)) {
        val s = pos
        pos += 1
        while (pos < n && (input.charAt(pos).isDigit || "+-eE.".contains(input.charAt(pos)))) {
          // '.' followed by whitespace terminates the statement, not the number
          if (input.charAt(pos) == '.' &&
            (pos + 1 >= n || !input.charAt(pos + 1).isDigit)) {
            pos = pos // stop
            return numericTerm(input.substring(s, pos))
          }
          pos += 1
        }
        numericTerm(input.substring(s, pos))
      } else parsePrefixedOrKeyword() match {
        case Left(iri) => RdfTerm.iri(iri)
        case Right("true") => RdfTerm(Rdf.KindLiteral, "true", Some(Rdf.XsdBoolean), None, None)
        case Right("false") => RdfTerm(Rdf.KindLiteral, "false", Some(Rdf.XsdBoolean), None, None)
        case Right(k) => err(s"keyword '$k' as object")
      }
    }

    private def numericTerm(lex: String): RdfTerm = {
      val dt =
        if (lex.contains('e') || lex.contains('E')) Rdf.XsdDouble
        else if (lex.contains('.')) Rdf.XsdDecimal
        else Rdf.XsdInteger
      RdfTerm.typed(lex, dt)
    }

    /** predicateObjectList for subject `s`; stops before '.', ']' or EOF. */
    private def parsePredicateObjectList(s: String): Unit = {
      var morePreds = true
      while (morePreds) {
        val p = parsePredicate()
        var moreObjs = true
        while (moreObjs) {
          val o = parseObject()
          out += Quad(curGraph, s, p, o)
          skipWs()
          // Turtle-star annotation `{| q v ; … |}`: asserts the base triple
          // (already emitted above) AND annotates its quoted-triple node —
          // same id as the explicit `<< s p o >>` form.
          if (input.startsWith("{|", pos)) {
            pos += 2
            parsePredicateObjectList(qtId(s, p, o))
            skipWs()
            if (!input.startsWith("|}", pos)) err("expected '|}'")
            pos += 2
            skipWs()
          }
          if (pos < n && input.charAt(pos) == ',') { pos += 1 } else moreObjs = false
        }
        skipWs()
        if (pos < n && input.charAt(pos) == ';') {
          pos += 1; skipWs()
          // dangling ';' before the terminator is legal
          if (pos >= n || input.charAt(pos) == '.' || input.charAt(pos) == ']')
            morePreds = false
        } else morePreds = false
      }
    }

    private def parseStatement(): Unit = {
      skipWs()
      if (input.charAt(pos) == '[') {
        // `[ … ] .` or `[ … ] p o .` — the bnode is the subject either way
        val s = parseBnodePropertyList()
        skipWs()
        if (pos < n && input.charAt(pos) != '.') parsePredicateObjectList(s)
        endStatement()
      } else if (input.charAt(pos) == '(') {
        // collection in SUBJECT position: `( … ) p o .` — the list head
        // bnode (or rdf:nil for `()`) is the subject
        val s = parseCollection().value
        parsePredicateObjectList(s)
        endStatement()
      } else {
        val s = parseSubject()
        parsePredicateObjectList(s)
        endStatement()
      }
    }

    /** `.` terminator; in TriG mode the LAST triple of a graph block may
      * omit it before `}`.
      */
    private def endStatement(): Unit = {
      skipWs()
      if (trig && pos < n && input.charAt(pos) == '}') ()
      else expect('.')
    }
  }
}
