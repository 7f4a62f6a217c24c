package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{Quad, Rdf}

/** TriG reader (SURVEY §2.1 S5) — Turtle plus named-graph blocks
  * (`GRAPH <g> {…}`, `<g> {…}`, anonymous `{…}`), the quad counterpart of
  * the engine's content-negotiated Turtle load (reference `Dockerfile:2`).
  *
  * Reuses the whole [[TurtleReader]] grammar (prefixes, `;`/`,`
  * continuations, bnode property lists, collections, typed/lang literals)
  * with the parser's TriG mode switched on; same wholetext-per-document
  * parallelism and 100 TB posture as Turtle.
  */
object TrigReader {

  def load(spark: SparkSession, path: String,
      graph: String = Rdf.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path).as[String]
      .mapPartitions(_.flatMap(doc => parse(doc, graph)))
  }

  def loadDF(spark: SparkSession, path: String,
      graph: String = Rdf.DefaultGraph): DataFrame =
    load(spark, path, graph).toDF()

  /** Pure TriG parser: triples outside any block land in `graph`.
    * Returns a SET per document, like [[TurtleReader.parse]] (r17).
    */
  def parse(doc: String, graph: String = Rdf.DefaultGraph): Seq[Quad] =
    new TurtleReader.Parser(doc, graph, trig = true).parseDocument().distinct
}
