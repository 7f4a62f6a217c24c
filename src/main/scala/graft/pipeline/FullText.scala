package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text keyword search — the Spark analog of the reference engine's
  * bundled Lucene FTS connector (GraphDB ships it, reference `Dockerfile:2`):
  * "find facilities by name keyword" is the first query a portal user
  * writes.
  *
  * Design: a tokenized INVERTED POSTINGS table `(term, doc, tf)` — the
  * datastructure Lucene builds — expressed relationally. At 100 TB the
  * postings are written once to Parquet bucketed by `term` (the analog of
  * the index commit); a query is then a `term IN (…)` scan — pushed to the
  * files — plus one aggregate. Never a full-corpus regex scan per query.
  * Scoring is a deterministic integer tf sum (conjunctive match), so the
  * oracle replays it hash-exactly — no analyzer/BM25 FP drift.
  */
object FullText {

  /** Inverted postings: one row per (term, doc) with its term frequency.
    * Tokenization matches [[TextAnalysis]]: lowercase, split on non-word
    * runs, empties dropped.
    */
  def postings(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("doc"),
        explode(filter(split(lower(trim(col(text))), "\\W+"),
          t => length(t) > 0)).as("term"))
      .groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive keyword search: documents containing EVERY query term,
    * scored by the total tf of the query terms in the document (ties break
    * on doc id downstream — the score is deterministic). The `term IN`
    * filter sits below the aggregate, so against a term-bucketed postings
    * table it prunes to the query terms' buckets.
    */
  def search(df: DataFrame, id: String, text: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    val qs = terms.map(_.toLowerCase).distinct
    postings(df, id, text)
      .filter(col("term").isin(qs: _*))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("nt"), sum(col("tf")).cast("bigint").as("score"))
      .filter(col("nt") === qs.size)
      .select(col("doc"), col("score"))
  }
}
