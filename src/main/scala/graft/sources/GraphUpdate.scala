package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.algebra.{Compiler, Op, PTerm, TriplePattern, V, I, L, E}
import graft.model.Rdf

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

  /** DELETE WHERE: remove all quads matching a template instantiated by the
    * pattern's own solutions (the common `DELETE WHERE { ?s ?p ?o … }` form).
    */
  def deleteWhere(compiler: Compiler, store: DataFrame, pattern: Op,
      template: Seq[TriplePattern]): DataFrame = {
    val sol = compiler.compile(pattern)
    val doomed = template.map { tp =>
      def sOf(t: PTerm) = t match {
        case V(n) => sol.df(n).getField("value")
        case I(iri) => lit(iri)
        case L(l) => lit(l.value)
      }
      def oOf(t: PTerm) = t match {
        case V(n) => sol.df(n)
        case I(iri) => E.termLit(graft.model.RdfTerm.iri(iri))
        case L(l) => E.termLit(l)
      }
      sol.df.select(lit(Rdf.DefaultGraph).as("graph"), sOf(tp.s).as("s"),
        sOf(tp.p).as("p"), oOf(tp.o).as("o"))
    }.reduce(_.unionAll(_)).distinct()
    deleteData(store, doomed)
  }
}
