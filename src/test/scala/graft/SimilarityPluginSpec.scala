package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Quad, Rdf, RdfTerm}
import graft.sources.GraphCatalog

/** The GraphDB text-similarity plugin query surface (r13): explicit
  * tf-vector index (`GraphCatalog.createSimilarityIndex`) queried through
  * the `similarity:` pseudo-property group —
  * `?search a inst:<idx> ; :searchTerm|:searchDocumentID … ;
  *  :documentResult ?r . ?r :value ?doc ; :score ?score .`
  */
class SimilarityPluginSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val P = "urn:t#text"
  private val Pfx =
    """PREFIX similarity: <http://www.ontotext.com/graphdb/similarity/>
      |PREFIX inst: <http://www.ontotext.com/graphdb/similarity/instance/>
      |""".stripMargin

  private def catalog() = {
    val quads = Seq(
      Quad(Rdf.DefaultGraph, "urn:d1", P, RdfTerm.str("red apple red fruit")),
      Quad(Rdf.DefaultGraph, "urn:d2", P, RdfTerm.str("red apple pie")),
      Quad(Rdf.DefaultGraph, "urn:d3", P, RdfTerm.str("green pear tart")),
      Quad(Rdf.DefaultGraph, "_:b1", P, RdfTerm.str("red red red")),
      Quad("urn:g9", "urn:d9", P, RdfTerm.str("red apple named graph")))
      .toDS().toDF()
    val cat = new GraphCatalog(spark).addQuads(quads)
    cat.createSimilarityIndex("docs", Seq(P))
    cat
  }

  test("term search: cosine(tf_doc, tf_query) round-4, top-k order " +
      "(score desc, doc asc); named-graph literals excluded; bnode doc " +
      "ids bind as bnodes") {
    val cat = catalog()
    val df = new Engine(cat).select(Pfx +
      """SELECT ?doc ?score WHERE {
        |  ?search a inst:docs ;
        |    similarity:searchTerm "red apple" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc ; similarity:score ?score . }"""
        .stripMargin)
    val got = df.collect().map(r => (r.getStruct(0).getString(1),
      r.getStruct(1).getDouble(4))).toMap
    // d2 "red apple pie": dot = 1+1 = 2, |d| = sqrt(3), |q| = sqrt(2)
    assert(got("urn:d2") ==
      math.floor(2.0 / (math.sqrt(3.0) * math.sqrt(2.0)) * 1e4 + 0.5) / 1e4)
    // d1 "red apple red fruit": dot = 2+1 = 3, |d| = sqrt(4+1+1)
    assert(got("urn:d1") ==
      math.floor(3.0 / (math.sqrt(6.0) * math.sqrt(2.0)) * 1e4 + 0.5) / 1e4)
    // the all-red bnode doc scores 3/(sqrt(9)*sqrt(2)) and binds as a bnode
    assert(got.contains("_:b1"))
    // d3 shares no term -> absent (sparse semantics); d9 is named-graph
    assert(!got.contains("urn:d3") && !got.contains("urn:d9"))
  }

  test("searchParameters -numsearchresults caps the result list; " +
      "searchDocumentID excludes the query doc itself") {
    val cat = catalog()
    val top1 = new Engine(cat).select(Pfx +
      """SELECT ?doc WHERE {
        |  ?search a inst:docs ;
        |    similarity:searchTerm "red" ;
        |    similarity:searchParameters "-numsearchresults 1" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc . }""".stripMargin)
    // the all-red doc is the unique cosine-1 match
    assert(top1.collect().map(_.getStruct(0).getString(1)).toSeq ==
      Seq("_:b1"))
    val mlt = new Engine(cat).select(Pfx +
      """SELECT ?doc WHERE {
        |  ?search a inst:docs ;
        |    similarity:searchDocumentID <urn:d2> ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc . }""".stripMargin)
    val docs = mlt.collect().map(_.getStruct(0).getString(1)).toSet
    assert(!docs.contains("urn:d2") && docs.contains("urn:d1"))
  }

  test("config errors: missing index, missing anchor, both/neither query " +
      "modes, unknown property, non-variable documentResult") {
    val cat = catalog()
    val e = new Engine(cat)
    def bad(q: String, frag: String): Unit = {
      val ex = intercept[IllegalArgumentException](e.select(Pfx + q).collect())
      assert(ex.getMessage.contains(frag), ex.getMessage)
    }
    bad("""SELECT ?d WHERE { ?s a inst:nosuch ;
          |  similarity:searchTerm "x" ; similarity:documentResult ?r .
          |  ?r similarity:value ?d . }""".stripMargin, "no such index")
    bad("""SELECT ?d WHERE { ?s similarity:searchTerm "x" ;
          |  similarity:documentResult ?r . ?r similarity:value ?d . }"""
        .stripMargin, "anchor")
    bad("""SELECT ?d WHERE { ?s a inst:docs ;
          |  similarity:searchTerm "x" ;
          |  similarity:searchDocumentID <urn:d1> ;
          |  similarity:documentResult ?r . ?r similarity:value ?d . }"""
        .stripMargin, "exactly one")
    bad("""SELECT ?d WHERE { ?s a inst:docs ;
          |  similarity:documentResult ?r . ?r similarity:value ?d . }"""
        .stripMargin, "exactly one")
    bad("""SELECT ?d WHERE { ?s a inst:docs ;
          |  similarity:searchTerm "x" ; similarity:bogus 1 ;
          |  similarity:documentResult ?r . ?r similarity:value ?d . }"""
        .stripMargin, "unknown search property")
    bad("""SELECT ?d WHERE { ?s a inst:docs ;
          |  similarity:searchTerm "x" ;
          |  similarity:documentResult <urn:r> . }""".stripMargin,
      "documentResult ?var is required")
  }

  test("?doc joins ordinary BGP members through the greedy order (the " +
      "result set composes like any solution)") {
    val cat = catalog()
    val df = new Engine(cat).select(Pfx +
      """SELECT ?doc ?t WHERE {
        |  ?search a inst:docs ;
        |    similarity:searchTerm "pear" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc .
        |  ?doc <urn:t#text> ?t . }""".stripMargin)
    val got = df.collect().map(r =>
      (r.getStruct(0).getString(1), r.getStruct(1).getString(1))).toSet
    assert(got == Set(("urn:d3", "green pear tart")), got)
  }

  test("score composes with FILTER / ORDER BY like any numeric binding; " +
      "analyzed index stems query terms") {
    val cat = catalog()
    val e = new Engine(cat)
    val filtered = e.select(Pfx +
      """SELECT ?doc WHERE {
        |  ?search a inst:docs ;
        |    similarity:searchTerm "red" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc ; similarity:score ?score .
        |  FILTER(?score >= 0.99) } ORDER BY ?doc""".stripMargin)
    assert(filtered.collect().map(_.getStruct(0).getString(1)).toSeq ==
      Seq("_:b1"))
    // analyzed: "apples" stems to "apple", matching the analyzed postings
    cat.createSimilarityIndex("docsA", Seq(P), analyzed = true)
    val stemmed = e.select(Pfx +
      """SELECT ?doc WHERE {
        |  ?search a inst:docsA ;
        |    similarity:searchTerm "apples" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc . }""".stripMargin)
    val docs = stemmed.collect().map(_.getStruct(0).getString(1)).toSet
    assert(docs.contains("urn:d1") && docs.contains("urn:d2"), docs)
  }

  test("similarity:score under DISTINCT and subqueries (r15 tranche 34): " +
      "a duplicating UNION dedups under DISTINCT with and without the " +
      "score; a subquery-bound score joins and aggregates outside") {
    val cat = catalog()
    val e = new Engine(cat)
    val inner =
      """{ ?search a inst:docs ;
        |    similarity:searchTerm "red apple" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc ; similarity:score ?score . }"""
        .stripMargin
    val dup = e.select(Pfx +
      s"""SELECT DISTINCT ?doc WHERE { $inner UNION $inner }""")
    val base = e.select(Pfx + s"SELECT ?doc WHERE { $inner }")
    assert(dup.count() == base.count(), dup.collect().toSeq)
    val dupScored = e.select(Pfx +
      s"""SELECT DISTINCT ?doc ?score WHERE { $inner UNION $inner }""")
    assert(dupScored.count() == base.count())
    // subquery: inner SELECT carries (doc, score); the outer pattern
    // joins the doc text and an aggregate sums the rounded scores
    val sub = e.select(Pfx +
      s"""SELECT ?doc ?t WHERE {
         |  { SELECT ?doc ?score WHERE { $inner } }
         |  ?doc <urn:t#text> ?t .
         |  FILTER(?score >= 0.5)
         |} ORDER BY DESC(?score) ?doc""".stripMargin)
    val docs = sub.collect().map(_.getStruct(0).getString(1)).toSeq
    assert(docs.nonEmpty && docs.toSet.subsetOf(
      Set("urn:d1", "urn:d2", "urn:d3", "_:b1")), docs)
    val agg = e.select(Pfx +
      s"""SELECT (COUNT(*) AS ?n) (MAX(?score) AS ?m) WHERE {
         |  { SELECT ?doc ?score WHERE { $inner } }
         |}""".stripMargin)
    val a = agg.collect().head
    assert(a.getStruct(0).getString(1).toLong == base.count(), a)
    assert(a.getStruct(1).getString(1).toDouble > 0.0, a)
  }

  test("embedding mode (r14): similarity:searchVector probes the " +
      "persisted IVF index — scan pruned to the probed buckets " +
      "(SelectedBucketsCount), scores compose, config errors loud") {
    val cat = catalog()
    // 8 tiny 2-d vectors in two obvious clusters around (1,0) and (0,1)
    val emb = (0L until 8L).map(i =>
      (i, if (i % 2 == 0) Seq(1.0 + i * 0.01, 0.02 * i)
          else Seq(0.02 * i, 1.0 + i * 0.01)))
      .toDF("vec_id", "embedding")
    cat.createEmbeddingIndex("vecs", emb, "vec_id", "embedding",
      "urn:e/", nlist = 2, iters = 2)
    val e = new Engine(cat)
    val q = Pfx +
      """SELECT ?doc ?score WHERE {
        |  ?search a inst:vecs ;
        |    similarity:searchVector "1.0, 0.0" ;
        |    similarity:searchParameters "-numsearchresults 3 -nprobe 1" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc ; similarity:score ?score .
        |} ORDER BY DESC(?score) ?doc""".stripMargin
    val df = e.select(q)
    val rows = df.collect().map(r => (r.getStruct(0).getString(1),
      r.getStruct(1).getString(1).toDouble))
    // top-3 from the (1,0) cluster only (nprobe 1 → one bucket)
    assert(rows.length == 3, rows.toSeq)
    assert(rows.forall { case (d, _) =>
      d.stripPrefix("urn:e/").toLong % 2 == 0 }, rows.toSeq)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.reverse.toSeq)
    // the probe prunes the persisted posting scan to the hit buckets
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"), plan)
    // FILTER over the score composes
    assert(e.select(Pfx +
      """SELECT ?doc WHERE {
        |  ?search a inst:vecs ;
        |    similarity:searchVector "1.0, 0.0" ;
        |    similarity:documentResult ?r .
        |  ?r similarity:value ?doc ; similarity:score ?score .
        |  FILTER(?score >= 0.999) }""".stripMargin).count() >= 1)
    // config errors
    def bad(body: String): String =
      intercept[IllegalArgumentException](
        e.select(Pfx + s"SELECT * WHERE { $body }").collect()).getMessage
    assert(bad("""?s a inst:vecs ; similarity:searchTerm "x" ;
      |similarity:documentResult ?r . ?r similarity:value ?doc ."""
      .stripMargin).contains("unknown search property"))
    assert(bad("""?s a inst:vecs ; similarity:documentResult ?r .
      |?r similarity:value ?doc .""".stripMargin)
      .contains("needs similarity:searchVector"))
    assert(bad("""?s a inst:vecs ; similarity:searchVector "1.0,oops" ;
      |similarity:documentResult ?r . ?r similarity:value ?doc ."""
      .stripMargin).contains("not a number"))
    assert(bad("""?s a inst:docs ; similarity:searchTerm "red" ;
      |similarity:searchParameters "-nprobe 2" ;
      |similarity:documentResult ?r . ?r similarity:value ?doc ."""
      .stripMargin).contains("-nprobe applies only"))
  }

  test("predication mode (r14): psi:searchEntity scores entities by " +
      "shared (predicate, object) statements; results flow through " +
      "similarity:entityResult; config errors loud") {
    val PsiPfx = Pfx +
      "PREFIX psi: <http://www.ontotext.com/graphdb/similarity/psi/>\n"
    val likes = "urn:t#likes"; val in = "urn:t#in"
    val quads = Seq(
      Quad(Rdf.DefaultGraph, "urn:e1", likes, RdfTerm.iri("urn:x")),
      Quad(Rdf.DefaultGraph, "urn:e1", likes, RdfTerm.iri("urn:y")),
      Quad(Rdf.DefaultGraph, "urn:e1", in, RdfTerm.str("g1")),
      Quad(Rdf.DefaultGraph, "urn:e2", likes, RdfTerm.iri("urn:x")),
      Quad(Rdf.DefaultGraph, "urn:e2", likes, RdfTerm.iri("urn:y")),
      Quad(Rdf.DefaultGraph, "urn:e2", in, RdfTerm.str("g1")),
      Quad(Rdf.DefaultGraph, "urn:e3", likes, RdfTerm.iri("urn:x")),
      Quad(Rdf.DefaultGraph, "urn:e3", in, RdfTerm.str("g2")),
      Quad(Rdf.DefaultGraph, "urn:e4", "urn:t#other", RdfTerm.iri("urn:z")))
      .toDS().toDF()
    val cat = new GraphCatalog(spark).addQuads(quads)
    cat.createSimilarityIndex("docs", Seq(P)) // coexists with psi index
    cat.createPredicationIndex("ents", Seq(likes, in, "urn:t#other"))
    val e = new Engine(cat)
    val df = e.select(PsiPfx +
      """SELECT ?ent ?score WHERE {
        |  ?search a inst:ents ;
        |    psi:searchEntity <urn:e1> ;
        |    similarity:entityResult ?r .
        |  ?r similarity:value ?ent ; similarity:score ?score . }"""
        .stripMargin)
    val got = df.collect().map(r => (r.getStruct(0).getString(1),
      r.getStruct(1).getDouble(4))).toMap
    // e2 says exactly what e1 says -> cosine 1; e3 shares only likes->x:
    // dot 1, norms sqrt(3)*sqrt(2); e4 shares nothing -> absent; the
    // query entity itself is excluded
    assert(got == Map(
      "urn:e2" -> 1.0,
      "urn:e3" ->
        (math.floor(1.0 / (math.sqrt(3.0) * math.sqrt(2.0)) * 1e4 + 0.5) / 1e4)),
      got)
    // score composes with ORDER BY / LIMIT like any numeric binding
    val top = e.select(PsiPfx +
      """SELECT ?ent WHERE {
        |  ?search a inst:ents ;
        |    psi:searchEntity <urn:e1> ;
        |    similarity:entityResult ?r .
        |  ?r similarity:value ?ent ; similarity:score ?score .
        |} ORDER BY DESC(?score) ?ent LIMIT 1""".stripMargin).collect()
    assert(top.map(_.getStruct(0).getString(1)).toSeq == Seq("urn:e2"))
    def bad(body: String): String =
      intercept[IllegalArgumentException](
        e.select(PsiPfx + s"SELECT * WHERE { $body }").collect()).getMessage
    // text-mode properties are rejected on a predication index...
    assert(bad("""?s a inst:ents ; similarity:searchTerm "x" ;
      |similarity:entityResult ?r . ?r similarity:value ?v ."""
      .stripMargin).contains("predication-index search"))
    // ...documentResult too (psi results ride entityResult)
    assert(bad("""?s a inst:ents ; psi:searchEntity <urn:e1> ;
      |similarity:documentResult ?r . ?r similarity:value ?v ."""
      .stripMargin).contains("unknown search property"))
    // missing searchEntity
    assert(bad("""?s a inst:ents ; similarity:entityResult ?r .
      |?r similarity:value ?v .""".stripMargin)
      .contains("needs psi:searchEntity"))
    // searchEntity needs a constant IRI
    assert(bad("""?s a inst:ents ; psi:searchEntity "urn:e1" ;
      |similarity:entityResult ?r . ?r similarity:value ?v ."""
      .stripMargin).contains("constant IRI"))
    // and a TEXT index rejects the psi property
    assert(bad("""?s a inst:docs ; psi:searchEntity <urn:e1> ;
      |similarity:documentResult ?r . ?r similarity:value ?v ."""
      .stripMargin).contains("unknown search property"))
  }
}
