package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Quad, Rdf, RdfTerm}

/** N-Quads reader (SURVEY §2.1 S5) — the line-delimited QUAD bulk format:
  * N-Triples plus an optional 4th term naming the quad's graph (engine
  * content-negotiated load surface, reference `Dockerfile:2`).
  *
  * Same 100 TB posture as [[NTriplesReader]]: `spark.read.text` splits at any
  * byte boundary, every line parses independently (narrow map, no shuffle),
  * and the graph term lands directly in the store's `graph` column — the
  * only bulk format that exercises the full quad model through a source.
  */
object NQuadsReader {

  /** Lines without a graph label land in `defaultGraph`. */
  def load(spark: SparkSession, path: String,
      defaultGraph: String = Rdf.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    spark.read.text(path).as[String]
      .flatMap(line => parseLine(line, defaultGraph))
  }

  /** Parse one N-Quads line; None for blank/comment lines. */
  def parseLine(line: String, defaultGraph: String = Rdf.DefaultGraph): Option[Quad] =
    NTriplesReader.parseLineG(line, defaultGraph, allowGraph = true)

  /** Serialize a quad back to an N-Quads line (the matching sink). */
  def toLine(q: Quad): String = {
    val triple = NTriplesReader.toLine(q).stripSuffix(" .")
    if (q.graph == Rdf.DefaultGraph) s"$triple ."
    else {
      val g = if (q.graph.startsWith("_:")) q.graph else s"<${q.graph}>"
      s"$triple $g ."
    }
  }
}
