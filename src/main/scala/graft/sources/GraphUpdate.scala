package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.algebra.{Compiler, Op, PTerm, Sol, TriplePattern, V, I, L, E}
import graft.model.{Quad, Rdf}
import graft.parser.SparqlParser.{DeleteDataU, InsertDataU, ModifyU, UpdateForm}

/** SPARQL Update semantics (SURVEY §2.1 S6).
  *
  * The reference accepts updates on `/repositories/{id}/statements`
  * (`Dockerfile:2`; the repo itself only bulk-POSTs Turtle,
  * `init-graphdb.sh:90`). In Spark there is no in-place mutation: each update
  * produces a NEW immutable quad snapshot (`union` for INSERT, `left_anti`
  * for DELETE) — the natural shape for versioned Parquet storage where each
  * update epoch is a new partition/commit.
  */
object GraphUpdate {

  /** INSERT DATA: add ground quads (deduplicated, set semantics). */
  def insertData(store: DataFrame, quads: DataFrame): DataFrame =
    store.unionByName(quads).distinct()

  /** DELETE DATA: remove exactly the given ground quads. */
  def deleteData(store: DataFrame, quads: DataFrame): DataFrame =
    store.join(quads, Seq("graph", "s", "p", "o"), "left_anti")

  /** Instantiate a quad template with a pattern's solutions (the shared core
    * of DELETE/INSERT … WHERE, SPARQL 19.6). Solutions leaving any template
    * position unbound are skipped for that template quad, per spec.
    */
  def instantiate(sol: Sol, template: Seq[TriplePattern]): DataFrame =
    template.map { tp =>
      def sOf(t: PTerm) = t match {
        case V(n) if sol.visible(n) => sol.df(n).getField("value")
        case V(_) => lit(null).cast("string")
        case I(iri) => lit(iri)
        case L(l) => lit(l.value)
      }
      def oOf(t: PTerm) = t match {
        case V(n) if sol.visible(n) => sol.df(n)
        case V(_) => E.nullTerm
        case I(iri) => E.termLit(graft.model.RdfTerm.iri(iri))
        case L(l) => E.termLit(l)
      }
      sol.df.select(sOf(tp.graph).as("graph"), sOf(tp.s).as("s"),
          sOf(tp.p).as("p"), oOf(tp.o).as("o"))
        .filter(col("graph").isNotNull && col("s").isNotNull &&
          col("p").isNotNull && col("o").isNotNull)
    }.reduce(_.unionAll(_)).distinct()

  /** DELETE WHERE: remove all quads matching a template instantiated by the
    * pattern's own solutions (the common `DELETE WHERE { ?s ?p ?o … }` form).
    */
  def deleteWhere(compiler: Compiler, store: DataFrame, pattern: Op,
      template: Seq[TriplePattern]): DataFrame =
    deleteData(store, instantiate(compiler.compile(pattern), template))

  /** Ground quads → DataFrame in store shape. */
  def quadsDf(spark: org.apache.spark.sql.SparkSession, quads: Seq[Quad]): DataFrame = {
    import spark.implicits._
    spark.createDataset(quads).toDF()
  }

  /** Apply one parsed update operation to a quad snapshot → new snapshot.
    * WHERE patterns are evaluated against the snapshot itself (a transient
    * catalog over `store`), so chained operations in one request see each
    * other's effects — SPARQL 1.1 Update §3's sequential semantics.
    */
  def applyUpdate(store: DataFrame, form: UpdateForm): DataFrame = form match {
    case InsertDataU(quads) => insertData(store, quadsDf(store.sparkSession, quads))
    case DeleteDataU(quads) => deleteData(store, quadsDf(store.sparkSession, quads))
    case ModifyU(del, ins, where) =>
      val cat = new GraphCatalog(store.sparkSession).addQuads(store)
      val sol = new Compiler(cat).compile(where)
      // Spec order: both templates instantiate from the SAME solution set;
      // deletes apply before inserts (SPARQL 1.1 Update 3.1.3).
      val afterDel =
        if (del.nonEmpty) deleteData(store, instantiate(sol, del)) else store
      if (ins.nonEmpty) insertData(afterDel, instantiate(sol, ins)) else afterDel
  }

  /** Apply a full SPARQL Update request (text) to a quad snapshot. */
  def update(store: DataFrame, text: String): DataFrame =
    graft.parser.SparqlParser.parseUpdate(text).foldLeft(store)(applyUpdate)
}
