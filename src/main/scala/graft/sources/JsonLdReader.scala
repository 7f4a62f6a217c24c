package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{Quad, Rdf, RdfTerm}

/** JSON-LD reader (SURVEY §2.1 S5) — the last of the engine's
  * content-negotiated RDF formats (reference `Dockerfile:2`).
  *
  * Implements the pragmatic subset real JSON-LD data uses (documented — NOT
  * a full JSON-LD 1.1 processor):
  *   - `@context`: term → IRI maps — string or expanded `{"@id": …}`
  *     definitions, `{"@type": "@id"}` IRI-reference coercion,
  *     `{"@type": <dt>}` datatype coercion, `{"@container": "@list"}` list
  *     coercion (r10) — compact-IRI `prefix:suffix` expansion, `@vocab`
  *     for bare terms; contexts nest (inner overrides outer).
  *   - node objects: `@id` (bnode assigned when absent), `@type` (string or
  *     array), nested node objects (emitted recursively, linked by
  *     reference), arrays of values.
  *   - values: JSON strings/numbers/booleans as xsd-typed literals,
  *     `{"@value": …, "@language"|"@type": …}` forms, `{"@id": …}`
  *     references.
  *   - `@graph`: a node with `@id` + `@graph` names a graph for its
  *     children; a bare top-level `@graph` is the default graph.
  *
  *   - `@list`: ordered collections expand to rdf:first/rest chains (the
  *     Turtle `(…)` encoding); `@set` values/containers are plain
  *     multi-values (r10).
  *   - `@reverse` (r10): node-level `{"@reverse": {p: nodes}}` and context
  *     term definitions `{"@reverse": iri}` emit the inverted triple
  *     (value-node, p, this-node).
  *   - `@base` (r10): relative `@id`/`@type` references resolve per
  *     RFC 3986 through the same [[graft.model.IriResolver]] as the
  *     Turtle/SPARQL parsers.
  *
  *   - `@language` (r11): context DEFAULT language for plain strings,
  *     term-level `{"@language": …}` overrides, and
  *     `{"@container": "@language"}` language maps (1.0 §6.9).
  *   - `@index` (r11): `{"@container": "@index"}` maps emit every map
  *     value with the index keys dropped (1.0 §6.16 — they are data
  *     organization, not content).
  *
  * JSON-LD 1.0 keyword audit (r11): `@context @id @value @language @type
  * @container @list @set @reverse @graph @base @vocab @index` all handled
  * above.
  *
  * JSON-LD 1.1 minimal (r12 — the 1.1 features common in the wild):
  *   - `"@version": 1.1` is accepted in contexts (any other value errors)
  *     and switches compact-IRI expansion to 1.1 prefix rules: an
  *     EXPANDED term definition is usable as a prefix only with
  *     `"@prefix": true`; simple string definitions stay prefixes.
  *   - node-level `@nest`: the nested object's properties read as the
  *     node's own (transparent grouping), recursively.
  *   - `@included` (1.1 §4.7): free-standing sibling node objects emitted
  *     with the containing node's context and graph.
  *   - `@json` literals (1.1 §4.2.2): `{"@value": …, "@type": "@json"}`
  *     value objects and `{"@type": "@json"}`-coerced terms produce ONE
  *     `rdf:JSON` literal whose lexical form is the deterministic
  *     sorted-key compact serialization ([[canonicalJson]]); coerced
  *     arrays do not spread.
  *   - `@protected` (1.1 §4.1.11, r12 cont.): term-level and context-level
  *     protection — a protected term may only be redefined identically,
  *     and `"@context": null` cannot clear protected definitions.
  *   - `@propagate` (1.1 §4.1.10, r12 cont.): `false` scopes a context
  *     part to the node object it appears on; nested node objects inherit
  *     the surrounding context instead.
  *   - `@direction` (1.1 §4.2.4): validated (`ltr|rtl|null`, string
  *     `@value` only). Under the DEFAULT toRdf transform it is DROPPED;
  *     the `rdfDirection` processing option (r15) encodes it —
  *     `"i18n-datatype"` types the literal
  *     `https://www.w3.org/ns/i18n#<lang>_<dir>` (language lowercased,
  *     possibly empty), `"compound-literal"` emits a fresh blank node
  *     with `rdf:value` / `rdf:language` / `rdf:direction` triples.
  *     Context-level `@direction` is the default for PLAIN STRINGS
  *     (combining with the default `@language`); explicit value objects
  *     use only their own `@direction`/`@language`, and a JSON `null`
  *     clears the default — the 1.1 expansion scoping.
  * Referenced `@context` IRIs (r14): resolved against the CALLER-SUPPLIED
  * `contexts` registry (IRI → the context DOCUMENT's JSON text, whose
  * top-level `@context` entry applies — the JSON-LD document-loader
  * abstraction with a no-network cache, GraphDB's cached-context analog).
  * Registered documents may reference further registered IRIs; cycles
  * error. The registry travels IN the parse call (a plain Map in the
  * task closure), so executors on a real cluster see it — never
  * JVM-global mutable state. An UNREGISTERED IRI still errors loudly
  * (no network; register or inline the context), and framing lives in
  * [[JsonLdFramer]] (a separate API, not part of the parsing data
  * path). The 1.1 keyword set is fully handled.
  * Parsing is per-document (`wholetext`), the same 100 TB unit of
  * parallelism as Turtle/TriG.
  */
object JsonLdReader {

  /** Deterministic serialization for `rdf:JSON` literal lexical forms:
    * object keys sorted lexicographically (by code unit, per JCS), no
    * insignificant whitespace; scalars keep Jackson's compact form. One
    * canonical string per JSON value, so the literal is term-comparable.
    */
  private def canonicalJson(n: JsonNode): String =
    if (n.isObject)
      n.properties().iterator().asScala.toSeq.sortBy(_.getKey)
        .map(e =>
          com.fasterxml.jackson.databind.node.TextNode.valueOf(e.getKey)
            .toString + ":" + canonicalJson(e.getValue))
        .mkString("{", ",", "}")
    else if (n.isArray)
      n.elements().asScala.map(canonicalJson).mkString("[", ",", "]")
    else n.toString

  /** In-document `@context` term definition: target IRI, optional type
    * coercion (`"@id"` = IRI reference, anything else a datatype IRI),
    * `@container: @list` list coercion, and `@reverse` inversion.
    */
  private final case class TermDef(iri: String, coerce: Option[String] = None,
      list: Boolean = false, reverse: Boolean = false,
      index: Boolean = false, langMap: Boolean = false,
      lang: Option[String] = None, prefixable: Boolean = true,
      prot: Boolean = false)

  def load(spark: SparkSession, path: String,
      graph: String = Rdf.DefaultGraph,
      contexts: Map[String, String] = Map.empty,
      rdfDirection: Option[String] = None): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path).as[String]
      .mapPartitions(_.flatMap(doc =>
        parse(doc, graph, contexts, rdfDirection)))
  }

  def loadDF(spark: SparkSession, path: String,
      graph: String = Rdf.DefaultGraph,
      contexts: Map[String, String] = Map.empty,
      rdfDirection: Option[String] = None): DataFrame =
    load(spark, path, graph, contexts, rdfDirection).toDF()

  /** Pure parser: top-level object or array of node objects. `contexts`
    * is the document-loader registry for referenced `@context` IRIs.
    */
  def parse(doc: String, defaultGraph: String = Rdf.DefaultGraph,
      contexts: Map[String, String] = Map.empty,
      rdfDirection: Option[String] = None): Seq[Quad] = {
    require(rdfDirection.forall(
      Set("i18n-datatype", "compound-literal")),
      s"jsonld: unsupported rdfDirection $rdfDirection " +
        "(i18n-datatype|compound-literal)")
    val root = new ObjectMapper().readTree(doc)
    val out = collection.mutable.ArrayBuffer[Quad]()
    var bn = 0
    def freshBnode(): String = { bn += 1; s"_:jld$bn" }

    /** Directed-string literal under an rdfDirection processing option
      * (JSON-LD 1.1 toRdf §rdfDirection; lang may be empty).
      */
    def directedTerm(lex: String, lang: String, dir: String,
        graph: String): RdfTerm = rdfDirection.get match {
      case "i18n-datatype" =>
        RdfTerm.typed(lex,
          s"https://www.w3.org/ns/i18n#${lang.toLowerCase}_$dir")
      case _ => // compound-literal
        val b = freshBnode()
        val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        out += Quad(graph, b, rdfNs + "value", RdfTerm.str(lex))
        if (lang.nonEmpty)
          out += Quad(graph, b, rdfNs + "language", RdfTerm.str(lang.toLowerCase))
        out += Quad(graph, b, rdfNs + "direction", RdfTerm.str(dir))
        RdfTerm.blank(b)
    }

    /** Apply a node's `@context` over `outer`. Returns the context for the
      * node's OWN properties and the one nested node objects inherit —
      * they differ only when a context part carries `"@propagate": false`
      * (1.1 §4.1.10: that part scopes to this node object alone).
      */
    def contextsOf(node: JsonNode, outer: Map[String, TermDef])
        : (Map[String, TermDef], Map[String, TermDef]) =
      if (!node.has("@context")) (outer, outer)
      else {
        val c0 = node.get("@context")
        // `@context` may be an array of contexts applied in order; a
        // STRING entry references a context DOCUMENT — resolved from the
        // caller-supplied registry (r14), recursively (registered
        // documents may reference further IRIs; cycles error), else a
        // loud error — never silently lose its term definitions
        def resolveParts(cn: JsonNode, visited: Set[String]): Seq[JsonNode] = {
          val ps = if (cn.isArray) cn.elements().asScala.toSeq else Seq(cn)
          ps.flatMap { c =>
            if (!c.isTextual) Seq(c)
            else {
              val iri = c.asText
              if (visited(iri)) throw new IllegalArgumentException(
                s"jsonld: cyclic @context reference <$iri>")
              contexts.get(iri) match {
                case None => throw new IllegalArgumentException(
                  s"jsonld: referenced @context <$iri> is not registered " +
                    "(no network available; register or inline the context)")
                case Some(txt) =>
                  val r = new ObjectMapper().readTree(txt)
                  if (r == null || !r.isObject || !r.has("@context"))
                    throw new IllegalArgumentException(
                      s"jsonld: registered context document <$iri> has " +
                        "no top-level @context entry")
                  resolveParts(r.get("@context"), visited + iri)
              }
            }
          }
        }
        val parts = resolveParts(c0, Set.empty)
        parts.foldLeft((outer, outer)) { case ((acc, accChild), c) =>
          // `"@context": null` RESETS the active context (JSON-LD 1.0
          // §6.1) rather than inheriting the outer term definitions —
          // unless a PROTECTED term is in scope (1.1 §4.1.11: invalid
          // context nullification)
          if (c.isNull) {
            acc.find(_._2.prot).foreach { case (k, _) =>
              throw new IllegalArgumentException(
                s"jsonld: \"@context\": null cannot clear the protected " +
                  s"term definition of '$k'")
            }
            (Map.empty[String, TermDef], Map.empty[String, TermDef])
          } else {
            // `"@version": 1.1` (r12): accepted, recorded as a pseudo-entry
            // so 1.1 prefix rules apply; any other value errors
            Option(c.get("@version")).foreach { v =>
              if (v.asText != "1.1") throw new IllegalArgumentException(
                s"jsonld: unsupported @version ${v.asText} (only 1.1)")
            }
            // context-level `@direction` (1.1 §4.2.4): validated; kept
            // as the default base direction for plain strings (consumed
            // only under an rdfDirection processing option; `null`
            // clears an outer default)
            val dirEntry = Option(c.get("@direction")).map { v =>
              if (!v.isNull && v.asText != "ltr" && v.asText != "rtl")
                throw new IllegalArgumentException(
                  s"jsonld: invalid @direction ${v.asText} (ltr|rtl|null)")
              if (v.isNull) None else Some(v.asText)
            }
            // `@propagate` (1.1 §4.1.10): false scopes THIS context part to
            // the current node object — children inherit the surroundings
            val propagates = Option(c.get("@propagate")).forall { v =>
              if (!v.isBoolean) throw new IllegalArgumentException(
                "jsonld: @propagate must be a boolean")
              v.asBoolean
            }
            // context-level `@protected` (1.1 §4.1.11) marks every term
            // DEFINED IN THIS CONTEXT OBJECT as protected
            val ctxProt = Option(c.get("@protected")).exists(_.asBoolean)
            val acc0 = if (c.has("@version"))
              acc + ("@version" -> TermDef("1.1")) else acc
            val acc1 = dirEntry.fold(acc0) {
              case Some(d) => acc0 + ("@direction" -> TermDef(d))
              case None => acc0 - "@direction"
            }
            val v11 = acc1.contains("@version")
            val keywordsHere =
              Set("@version", "@propagate", "@protected", "@direction")
            val newDefs = c.properties().iterator().asScala
              .filterNot(e => keywordsHere(e.getKey)).map { e =>
            val defn = e.getValue
            def container(kind: String): Boolean = defn.has("@container") &&
              defn.get("@container").asText == kind
            def termProt: Boolean = ctxProt ||
              Option(defn.get("@protected")).exists(_.asBoolean)
            e.getKey -> (if (defn.isTextual) TermDef(defn.asText, prot = ctxProt)
            else if (defn.has("@id")) TermDef(defn.get("@id").asText,
              coerce = Option(defn.get("@type")).map(_.asText),
              list = container("@list"),
              index = container("@index"),
              langMap = container("@language"),
              lang = Option(defn.get("@language")).filter(_.isTextual)
                .map(_.asText),
              // 1.1 prefix rule: an expanded definition is a prefix only
              // with `"@prefix": true`; under 1.0 every term is (§6.3)
              prefixable = !v11 ||
                Option(defn.get("@prefix")).exists(_.asBoolean),
              prot = termProt)
            else if (defn.has("@reverse"))
              TermDef(defn.get("@reverse").asText, reverse = true,
                prot = termProt)
            else throw new IllegalArgumentException(
              s"jsonld: unsupported @context entry for '${e.getKey}'"))
            }.toMap
            // a PROTECTED term may only be redefined IDENTICALLY
            // (1.1 §4.1.11 — protected term redefinition error otherwise)
            newDefs.foreach { case (k, d) =>
              acc1.get(k).filter(_.prot).foreach { old =>
                if (old.copy(prot = true) != d.copy(prot = true))
                  throw new IllegalArgumentException(
                    s"jsonld: protected term '$k' cannot be redefined")
              }
            }
            // a non-propagating part must not leak into the child context
            // even when a LATER part of the same array propagates, so the
            // child fold tracks its own accumulator
            val accChild0 = if (c.has("@version"))
              accChild + ("@version" -> TermDef("1.1")) else accChild
            val accChild1 = dirEntry.fold(accChild0) {
              case Some(d) => accChild0 + ("@direction" -> TermDef(d))
              case None => accChild0 - "@direction"
            }
            (acc1 ++ newDefs,
              if (propagates) accChild1 ++ newDefs else accChild)
          }
        }
      }

    /** Expand a term/compact IRI/absolute IRI; None = not mappable (dropped,
      * per JSON-LD's ignore-unmapped-terms rule when no `@vocab`). */
    def expand(term: String, ctx: Map[String, TermDef]): Option[String] =
      if (ctx.contains(term)) Some(ctx(term).iri)
      else if (term.contains(":")) {
        val i = term.indexOf(':')
        val pre = term.substring(0, i)
        ctx.get(pre).filter(_.prefixable)
          .map(_.iri + term.substring(i + 1)).orElse(Some(term))
      } else ctx.get("@vocab").map(_.iri + term)

    def expandId(v: String, ctx: Map[String, TermDef]): String =
      if (v.startsWith("_:")) v
      else {
        val e = expand(v, ctx).getOrElse(v)
        // `@base` resolution for relative references (RFC 3986, the same
        // resolver as the Turtle/SPARQL IRIREF path)
        ctx.get("@base") match {
          case Some(b) if !graft.model.IriResolver.isAbsolute(e) =>
            graft.model.IriResolver.resolve(b.iri, e)
          case _ => e
        }
      }

    def literalOf(v: JsonNode): RdfTerm =
      if (v.isTextual) RdfTerm.str(v.asText)
      else if (v.isBoolean) RdfTerm.typed(v.asText,
        "http://www.w3.org/2001/XMLSchema#boolean")
      else if (v.isIntegralNumber) RdfTerm.typed(v.asText, Rdf.XsdInteger)
      else RdfTerm.typed(v.asText, Rdf.XsdDouble)

    def isNodeObject(v: JsonNode): Boolean =
      v.isObject && !v.has("@value")

    /** Emit a node object's quads; returns its subject (IRI or bnode). */
    def walk(node: JsonNode, outerCtx: Map[String, TermDef], graph: String): String = {
      // childCtx differs from ctx only under `"@propagate": false` — the
      // non-propagating context part scopes to THIS node object alone
      val (ctx, childCtx) = contextsOf(node, outerCtx)
      // `@included` (1.1 §4.7): free-standing sibling node objects emitted
      // with the containing node's context and graph — no relation to the
      // containing node itself
      if (node.has("@included")) {
        val inc = node.get("@included")
        val vs = if (inc.isArray) inc.elements().asScala.toSeq else Seq(inc)
        vs.foreach { v =>
          if (!isNodeObject(v)) throw new IllegalArgumentException(
            s"jsonld: @included entries must be node objects, got $v")
          walk(v, childCtx, graph)
        }
      }
      val id =
        if (node.has("@id")) expandId(node.get("@id").asText, ctx)
        else freshBnode()
      if (node.has("@type")) {
        val t = node.get("@type")
        val types = if (t.isArray) t.elements().asScala.toSeq else Seq(t)
        types.foreach(tn => expand(tn.asText, ctx).foreach(iri =>
          out += Quad(graph, id, Rdf.RdfType, RdfTerm.iri(iri))))
      }
      if (node.has("@graph")) {
        // `{"@id": g, "@graph": […]}` names the graph; a bare `@graph`
        // keeps the current one
        val g = if (node.has("@id")) id else graph
        node.get("@graph").elements().asScala.foreach(walk(_, childCtx, g))
      }
      def idTerm(s: String): RdfTerm =
        if (s.startsWith("_:")) RdfTerm.blank(s) else RdfTerm.iri(s)
      /** Emit `(value-node, p, this-node)` — the `@reverse` inversion. */
      def emitReversed(p: String, v: JsonNode): Unit = {
        val vs = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
        vs.foreach { vv =>
          val subj =
            if (vv.isObject && vv.has("@id") && vv.size() == 1)
              expandId(vv.get("@id").asText, ctx)
            else if (vv.isTextual) expandId(vv.asText, ctx)
            else walk(vv, childCtx, graph)
          out += Quad(graph, subj, p, idTerm(id))
        }
      }
      if (node.has("@reverse"))
        node.get("@reverse").properties().iterator().asScala.foreach { e =>
          expand(e.getKey, ctx).foreach(emitReversed(_, e.getValue))
        }
      // `@nest` (1.1, r12): the nested object's properties are the node's
      // own — transparent grouping, flattened recursively
      def withNests(n: JsonNode): Seq[JsonNode] =
        n +: (if (!n.has("@nest")) Nil
              else {
                val raw = n.get("@nest")
                val vs = if (raw.isArray) raw.elements().asScala.toSeq
                         else Seq(raw)
                vs.flatMap(withNests)
              })
      withNests(node).iterator.flatMap(_.properties().iterator().asScala)
        .filterNot(_.getKey.startsWith("@")).foreach { e =>
          val td = ctx.get(e.getKey)
          expand(e.getKey, ctx).foreach { p =>
            def termOfValue(v: JsonNode): RdfTerm =
              // `@json` (1.1 §4.2.2): the whole @value subtree serializes
              // as ONE rdf:JSON literal — sorted-key compact form (the
              // JCS shape for the JSON types JSON-LD documents carry).
              // A term definition coerced `{"@type": "@json"}` makes the
              // RAW value (object, array or scalar) the literal.
              if (td.exists(_.coerce.contains("@json"))) {
                RdfTerm.typed(canonicalJson(v), Rdf.RdfJsonDt)
              } else if (v.isObject && v.has("@value") && v.has("@type") &&
                  v.get("@type").asText == "@json") {
                RdfTerm.typed(canonicalJson(v.get("@value")), Rdf.RdfJsonDt)
              } else if (v.isObject && v.has("@value")) {
                // `@direction` (1.1 §4.2.4): validated; DROPPED under the
                // default toRdf transform, ENCODED under an rdfDirection
                // processing option (r15). A value object uses only its
                // OWN @direction (no context default — expansion scoping);
                // JSON null clears.
                val ownDir = Option(v.get("@direction")).flatMap { d =>
                  if (!d.isNull && d.asText != "ltr" && d.asText != "rtl")
                    throw new IllegalArgumentException(
                      s"jsonld: invalid @direction ${d.asText} (ltr|rtl|null)")
                  if (!v.get("@value").isTextual)
                    throw new IllegalArgumentException(
                      "jsonld: @direction requires a string @value")
                  if (d.isNull) None else Some(d.asText)
                }
                val lex = v.get("@value").asText
                if (ownDir.isDefined && rdfDirection.isDefined)
                  directedTerm(lex,
                    if (v.has("@language")) v.get("@language").asText else "",
                    ownDir.get, graph)
                else if (v.has("@language")) RdfTerm.lang(lex, v.get("@language").asText)
                else if (v.has("@type"))
                  RdfTerm.typed(lex, expandId(v.get("@type").asText, ctx))
                else literalOf(v.get("@value"))
              } else if (v.isObject && v.has("@list")) {
                listTerm(v.get("@list").elements().asScala.toSeq)
              } else if (v.isObject && v.has("@id") && v.size() == 1) {
                // a blank-node reference `{"@id": "_:y"}` is a BLANK term,
                // not an IRI (r12 cont. — surfaced by the writer round-trip)
                idTerm(expandId(v.get("@id").asText, ctx))
              } else if (isNodeObject(v)) {
                val child = walk(v, childCtx, graph)
                if (child.startsWith("_:")) RdfTerm.blank(child) else RdfTerm.iri(child)
              } else if (v.isTextual && td.exists(_.coerce.contains("@id"))) {
                // `{"@type": "@id"}` coercion: string values are IRI refs
                RdfTerm.iri(expandId(v.asText, ctx))
              } else if (v.isValueNode &&
                  td.exists(_.coerce.exists(_ != "@id"))) {
                // datatype coercion: the term definition types the literal
                RdfTerm.typed(v.asText, expandId(td.get.coerce.get, ctx))
              } else if (v.isTextual && rdfDirection.isDefined &&
                  ctx.contains("@direction") && td.forall(_.coerce.isEmpty)) {
                // context DEFAULT direction applies to plain strings of
                // un-coerced terms (combining with the default/term
                // language) — only under an rdfDirection option
                directedTerm(v.asText,
                  td.flatMap(_.lang)
                    .orElse(ctx.get("@language").map(_.iri)).getOrElse(""),
                  ctx("@direction").iri, graph)
              } else if (v.isTextual && td.exists(_.lang.isDefined)) {
                // term-level `@language` in the context definition
                RdfTerm.lang(v.asText, td.get.lang.get)
              } else if (v.isTextual && ctx.contains("@language") &&
                  td.forall(_.coerce.isEmpty)) {
                // context DEFAULT language applies to plain strings of
                // un-coerced terms (JSON-LD 1.0 §6.9)
                RdfTerm.lang(v.asText, ctx("@language").iri)
              } else literalOf(v)
            // ordered collection → rdf:first/rest chain (Turtle `(…)`);
            // shared by explicit `@list` values and `@container: @list`
            // coerced arrays
            def listTerm(items: Seq[JsonNode]): RdfTerm =
              if (items.isEmpty) RdfTerm.iri(Rdf.RdfNil)
              else {
                val nodes = items.map(_ => freshBnode())
                nodes.lazyZip(items).lazyZip(
                  nodes.drop(1).map(RdfTerm.blank) :+ RdfTerm.iri(Rdf.RdfNil))
                  .foreach { (b, item, rest) =>
                    out += Quad(graph, b, Rdf.RdfFirst, termOfValue(item))
                    out += Quad(graph, b, Rdf.RdfRest, rest)
                  }
                RdfTerm.blank(nodes.head)
              }
            if (td.exists(_.reverse)) emitReversed(p, e.getValue)
            else if (td.exists(_.list) && e.getValue.isArray)
              out += Quad(graph, id, p,
                listTerm(e.getValue.elements().asScala.toSeq))
            else if (td.exists(_.index) && e.getValue.isObject &&
                !e.getValue.has("@value") && !e.getValue.has("@id") &&
                !e.getValue.has("@list")) {
              // `@container: @index` map: index keys are data organization
              // only — emit every map value, keys dropped (1.0 §6.16)
              e.getValue.properties().iterator().asScala.foreach { idx =>
                val raw = idx.getValue
                val vs = if (raw.isArray) raw.elements().asScala.toSeq
                else Seq(raw)
                vs.foreach(v => out += Quad(graph, id, p, termOfValue(v)))
              }
            } else if (td.exists(_.langMap) && e.getValue.isObject &&
                !e.getValue.has("@value") && !e.getValue.has("@id")) {
              // `@container: @language` map: key = language tag (1.0 §6.9)
              e.getValue.properties().iterator().asScala.foreach { lm =>
                val raw = lm.getValue
                val vs = if (raw.isArray) raw.elements().asScala.toSeq
                else Seq(raw)
                vs.foreach(v =>
                  out += Quad(graph, id, p, RdfTerm.lang(v.asText, lm.getKey)))
              }
            } else if (td.exists(_.coerce.contains("@json"))) {
              // `@json` coercion: the value — object, ARRAY or scalar —
              // is ONE JSON literal verbatim; arrays do not spread
              out += Quad(graph, id, p, termOfValue(e.getValue))
            } else {
              // `{"@set": […]}` is a plain multi-value (order-free)
              val raw = if (e.getValue.isObject && e.getValue.has("@set"))
                e.getValue.get("@set") else e.getValue
              val vs = if (raw.isArray) raw.elements().asScala.toSeq
              else Seq(raw)
              vs.foreach(v => out += Quad(graph, id, p, termOfValue(v)))
            }
          }
        }
      id
    }

    // walk derives each node's own context itself — the outer context of a
    // top-level node is empty (an array root carries no @context of its own)
    val nodes = if (root.isArray) root.elements().asScala.toSeq else Seq(root)
    nodes.foreach(walk(_, Map.empty, defaultGraph))
    out.distinct.toSeq // a document denotes a SET of triples (r17)
  }
}
