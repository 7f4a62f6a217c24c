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

  /** Raw token stream (doc, term): lowercase, split on non-word runs,
    * empties dropped — the tokenizer every index path shares (matches
    * [[TextAnalysis]]).
    */
  private[pipeline] def tokens(df: DataFrame, id: String,
      text: String): DataFrame =
    df.select(col(id).as("doc"),
      explode(filter(split(lower(trim(col(text))), "\\W+"),
        t => length(t) > 0)).as("term"))

  /** Inverted postings: one row per (term, doc) with its term frequency. */
  def postings(df: DataFrame, id: String, text: String): DataFrame =
    tokens(df, id, text)
      .groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("tf"))

  /** ANALYZED postings: the same inverted table after the [[Analyzer]]
    * chain (stopword filter + stemmer) — "running" and "run" land on one
    * term row. Same shape, so every term-keyed query core works unchanged.
    */
  def analyzedPostings(df: DataFrame, id: String, text: String): DataFrame =
    Analyzer.analyzeTerms(tokens(df, id, text))
      .groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("tf"))

  /** ANALYZED positional postings: positions are 0-based over the SURVIVING
    * (post-stopword) token sequence — Lucene's position semantics after a
    * stop filter, so analyzed phrase queries align. One window per doc at
    * build time (the persisted-index path pays it once).
    */
  def analyzedPositionalPostings(df: DataFrame, id: String,
      text: String): DataFrame = {
    val raw = df.select(col(id).as("doc"),
      posexplode(filter(split(lower(trim(col(text))), "\\W+"),
        t => length(t) > 0)).as(Seq("pos", "term")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc"))
      .orderBy(col("pos").asc)
    Analyzer.analyzeTerms(raw)
      .withColumn("pos", (row_number().over(w) - 1).cast("int"))
  }

  /** Conjunctive search through the analyzer: both the corpus and the
    * query terms run the same chain, so inflected forms match.
    */
  def analyzedSearch(df: DataFrame, id: String, text: String,
      terms: Seq[String]): DataFrame =
    searchOver(analyzedPostings(df, id, text),
      Analyzer.analyzeQuery(df.sparkSession, terms))

  /** Positional postings `(doc, pos, term)` — the phrase-query index
    * (Lucene's positions file, relationally). Positions are 0-based over
    * the FILTERED token sequence, so they match the tokenizer of
    * [[postings]].
    */
  def positionalPostings(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("doc"),
      posexplode(filter(split(lower(trim(col(text))), "\\W+"),
        t => length(t) > 0)).as(Seq("pos", "term")))

  /** Highlighting: the match OFFSETS of each query term per document —
    * what a search UI needs to render snippets (Lucene's highlighter reads
    * the same positions file). One term-IN scan over the positional
    * postings; with the persisted index this prunes to the terms' buckets
    * like every other term-keyed query.
    */
  def highlight(df: DataFrame, id: String, text: String,
      terms: Seq[String]): DataFrame =
    highlightOver(positionalPostings(df, id, text), terms)

  private[pipeline] def highlightOver(pp: DataFrame,
      terms: Seq[String]): DataFrame =
    pp.filter(col("term").isin(terms: _*))
      .select(col("doc"), col("term"), col("pos"))

  /** Phrase search over an existing positional-postings table — the query
    * core shared by the corpus path ([[phraseSearch]]) and the persisted
    * index ([[FullTextIndex.phraseSearch]]).
    */
  private[pipeline] def phraseOver(pp: DataFrame,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phraseSearch needs at least two words")
    val first = pp.filter(col("term") === phrase.head.toLowerCase)
      .select(col("doc"), col("pos"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      val next = pp.filter(col("term") === w.toLowerCase)
        .select(col("doc"), (col("pos") - i).as("pos"))
      acc.join(next, Seq("doc", "pos"))
    }
    aligned.groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("n_matches"))
  }

  /** Exact phrase search: an m-word phrase is an m-way positional
    * EQUI-join — each side pre-filtered to ONE term (selective scans of a
    * term-bucketed postings table at scale), aligned by `pos - i`, joined
    * on (doc, pos). Output: (doc, n_matches) for documents containing the
    * phrase, with the occurrence count.
    */
  def phraseSearch(df: DataFrame, id: String, text: String,
      phrase: Seq[String]): DataFrame =
    phraseOver(positionalPostings(df, id, text), phrase)

  /** Proximity core (Lucene `"a b"~slop`-shaped, unordered): qualifying
    * occurrence pairs of the two terms within `slop` positions in one
    * document. Each side is ONE selective term scan; the pairing is a doc
    * equi-join with the distance predicate INSIDE the join (never a
    * cross join), then a per-doc count.
    */
  private[pipeline] def nearOver(pp: DataFrame, a: String, b: String,
      slop: Int): DataFrame = {
    require(slop >= 1, "nearSearch needs slop >= 1")
    val pa = pp.filter(col("term") === a.toLowerCase)
      .select(col("doc"), col("pos").as("_pa"))
    val pb = pp.filter(col("term") === b.toLowerCase)
      .select(col("doc").as("_docb"), col("pos").as("_pb"))
    pa.join(pb, col("doc") === col("_docb") &&
        abs(col("_pa") - col("_pb")) <= slop)
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("n_matches"))
  }

  /** Proximity search over the corpus (see [[nearOver]]). */
  def nearSearch(df: DataFrame, id: String, text: String, a: String,
      b: String, slop: Int): DataFrame =
    nearOver(positionalPostings(df, id, text), a, b, slop)

  /** Disjunctive RANKED retrieval with a deterministic INTEGER idf
    * weighting: a term's contribution to a document is
    * `tf(t,d) * ((N * 10^6) div df(t))` — rarer terms weigh more, like
    * tf-idf, but with integer division instead of a logarithm so the score
    * is bit-exact in any engine (no libm drift) and the sum is
    * order-independent. Top-k by (score desc, doc asc) — a
    * TakeOrderedAndProject, never a full sort at scale.
    */
  def rankedSearch(df: DataFrame, id: String, text: String,
      terms: Seq[String], k: Int = 10): DataFrame =
    rankedOver(postings(df, id, text), df.count(), terms, k)

  /** Ranked retrieval over an existing postings table with a STORED corpus
    * size — no per-query `count()` job (the [[FullTextIndex]] path; the
    * corpus path above pays the count exactly once per call, not per term).
    */
  private[pipeline] def rankedOver(p: DataFrame, n: Long,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "rankedSearch needs at least one term")
    val qs = terms.map(_.toLowerCase).distinct
    val hits = p.filter(col("term").isin(qs: _*))
    val dft = hits.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    hits.join(broadcast(dft), Seq("term"))
      .withColumn("contrib", expr(s"tf * (${n * 1000000L}L div df_t)"))
      .groupBy(col("doc"))
      .agg(sum(col("contrib")).cast("bigint").as("score"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }

  /** KEYWORD extraction: each document's top-k terms by the same integer
    * tf·idf as [[rankedOver]] (ties term-ascending) — the tag/metadata
    * generation pass of a corpus pipeline. One postings aggregate + one
    * doc-frequency aggregate + a per-doc top-k window.
    */
  def keyTerms(df: DataFrame, id: String, text: String,
      k: Int = 5): DataFrame = {
    val p = postings(df, id, text)
    val n = df.count()
    val dft = p.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc"))
      .orderBy(col("w").desc, col("term").asc)
    p.join(dft, Seq("term"))
      .withColumn("w", expr(s"tf * (${n * 1000000L}L div df_t)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc"), col("term"), col("w").cast("bigint").as("w"),
        col("rank").cast("bigint").as("rank"))
  }

  /** MoreLikeThis (Lucene MLT, relationally): take the SEED document's m
    * most interesting terms — highest `tf · idf` with the same integer idf
    * as [[rankedOver]] (ties break term-ascending, deterministic) — then
    * rank every other document by the idf-sum of the interesting terms it
    * shares. Two term-keyed scans + one broadcast of the m seed terms:
    * candidate work ∝ the interesting terms' postings, never the corpus
    * cross product.
    */
  def moreLikeThis(df: DataFrame, id: String, text: String, seed: Long,
      m: Int = 8, k: Int = 10): DataFrame =
    moreLikeThisOver(postings(df, id, text), df.count(), seed, m, k)

  private[pipeline] def moreLikeThisOver(p: DataFrame, n: Long, seed: Long,
      m: Int, k: Int): DataFrame = {
    val dft = p.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val interesting = p.filter(col("doc") === seed)
      .join(dft, Seq("term"))
      .withColumn("w", expr(s"tf * (${n * 1000000L}L div df_t)"))
      .orderBy(col("w").desc, col("term").asc)
      .limit(m)
      .select(col("term"), expr(s"${n * 1000000L}L div df_t").as("idf"))
    p.join(broadcast(interesting), Seq("term"))
      .filter(col("doc") =!= seed)
      .groupBy(col("doc"))
      .agg(sum(col("idf")).cast("bigint").as("score"),
        count(lit(1)).cast("bigint").as("n_shared"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }

  /** Document lengths (total token count per doc) from a postings table —
    * BM25's `|d|`. Persisted once by [[FullTextIndex.build]]; the corpus
    * path recomputes it per call.
    */
  private[pipeline] def docLengths(p: DataFrame): DataFrame =
    p.groupBy(col("doc")).agg(sum(col("tf")).cast("bigint").as("dl"))

  /** BM25-shaped ranked retrieval (k1 = 1.2, b = 0.75) — the scoring family
    * of the reference's Lucene FTS connector — made DETERMINISTIC:
    *   - the idf factor is the same integer idf as [[rankedOver]]
    *     (`(N * 10^6) div df_t`; a logarithm would drag libm drift in);
    *   - the length normalization `tf*(k1+1) / (tf + k1*(1-b+b*|d|/avgdl))`
    *     is pure rational IEEE arithmetic in one FIXED association —
    *     cast/·/÷/+ are all correctly rounded, so any engine evaluating the
    *     identical tree gets identical bits;
    *   - each term's contribution is floored to an INTEGER (×10^6) before
    *     the per-document sum, so the aggregate is order-independent.
    * `avgdl` enters as `|d|·N / totalTokens` (one multiply + one divide —
    * no pre-divided constant whose decimal printing could lose bits).
    * Top-k by (score desc, doc asc): TakeOrderedAndProject, never a full
    * sort. The doc-length join pairs the SMALL hits side against the
    * doc-bucketed lengths table — broadcastable at scale.
    */
  private[graft] def bm25Over(p: DataFrame, dls: DataFrame, n: Long,
      totalTokens: Long, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one term")
    require(totalTokens > 0, "empty corpus")
    val qs = terms.map(_.toLowerCase).distinct
    val hits = p.filter(col("term").isin(qs: _*))
    val dft = hits.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val tfD = col("tf").cast("double")
    val norm = lit(0.75) * col("dl").cast("double") * lit(n.toDouble) /
      lit(totalTokens.toDouble)
    val denom = tfD + lit(1.2) * (lit(0.25) + norm)
    val contrib = col("idf_i").cast("double") * (tfD * lit(2.2)) / denom
    hits.join(broadcast(dft), Seq("term"))
      .withColumn("idf_i", expr(s"${n * 1000000L}L div df_t"))
      .join(dls, Seq("doc"))
      .withColumn("c_i", floor(contrib * lit(1000000.0)).cast("long"))
      .groupBy(col("doc"))
      .agg(sum(col("c_i")).cast("bigint").as("score"))
      .orderBy(col("score").desc, col("doc").asc)
      .limit(k)
  }

  /** BM25 off the corpus: tokenizes once for postings, derives doc lengths
    * and the two corpus stats (one count + one sum job — the
    * [[FullTextIndex]] path reads them from the stored stats row instead).
    */
  def bm25Search(df: DataFrame, id: String, text: String,
      terms: Seq[String], k: Int = 10): DataFrame = {
    val p = postings(df, id, text)
    val dls = docLengths(p)
    val total = dls.agg(sum(col("dl"))).head().getLong(0)
    bm25Over(p, dls, df.count(), total, terms, k)
  }

  /** Conjunctive search over an existing postings table — the query core
    * shared with [[FullTextIndex.search]].
    */
  private[pipeline] def searchOver(p: DataFrame,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    val qs = terms.map(_.toLowerCase).distinct
    p.filter(col("term").isin(qs: _*))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("nt"), sum(col("tf")).cast("bigint").as("score"))
      .filter(col("nt") === qs.size)
      .select(col("doc"), col("score"))
  }

  /** Conjunctive keyword search: documents containing EVERY query term,
    * scored by the total tf of the query terms in the document (ties break
    * on doc id downstream — the score is deterministic). The `term IN`
    * filter sits below the aggregate, so against a term-bucketed postings
    * table it prunes to the query terms' buckets.
    */
  def search(df: DataFrame, id: String, text: String,
      terms: Seq[String]): DataFrame =
    searchOver(postings(df, id, text), terms)

  /** FACETED search (Lucene facets, relationally): the conjunctive match
    * set joined back to a metadata column, counted per facet value — one
    * broadcast-able join on the matched docs (result-sized, not
    * corpus-sized) plus one aggregate.
    */
  def facetCounts(df: DataFrame, id: String, text: String,
      terms: Seq[String], facet: String): DataFrame =
    search(df, id, text, terms)
      .join(df.select(col(id).as("doc"), col(facet)), Seq("doc"))
      .groupBy(col(facet))
      .agg(count(lit(1)).cast("bigint").as("n"))

  /** Smallest string strictly greater than every string with `prefix` —
    * the exclusive upper bound of the prefix range (last char + 1; trailing
    * U+FFFF chars are dropped first — they cannot occur in our \W+-split
    * lowercase tokens anyway).
    */
  private[pipeline] def prefixUpperBound(prefix: String): String = {
    val p = prefix.reverse.dropWhile(_ == '\uffff').reverse
    require(p.nonEmpty, "prefix has no upper bound")
    p.init + (p.last + 1).toChar
  }

  /** Prefix ("dubl*") search over an existing postings table: a SARGABLE
    * term RANGE — `term >= prefix AND term < next(prefix)` — so against
    * term-SORTED postings parquet the range reaches the scan as
    * `PushedFilters: GreaterThanOrEqual(term,…), LessThan(term,…)` and
    * row groups outside the range never leave storage (plan-asserted in
    * PlanSpec). Matches documents containing ANY term with the prefix;
    * score = total tf of matching terms, n_terms = distinct matches.
    */
  private[pipeline] def prefixOver(p: DataFrame, prefix: String): DataFrame = {
    val lo = prefix.toLowerCase
    p.filter(col("term") >= lo && col("term") < prefixUpperBound(lo))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("n_terms"),
        sum(col("tf")).cast("bigint").as("score"))
  }

  /** Prefix search straight off the corpus (one tokenize pass); see
    * [[prefixOver]] for the range semantics and [[FullTextIndex]] for the
    * index-backed variant a portal would serve queries from.
    */
  def prefixSearch(df: DataFrame, id: String, text: String,
      prefix: String): DataFrame =
    prefixOver(postings(df, id, text), prefix)

  /** AUTOCOMPLETE over entity LABELS — the GraphDB Autocomplete plugin's
    * workbench suggestion feature (reference `Dockerfile:2`): the top `k`
    * `(entity, label)` pairs whose label starts with `prefix`, in
    * deterministic (label, entity) order. Scale shape: one predicate
    * filter (partition-prunable when the store is written partitioned by
    * `p`) plus a SARGABLE range on the raw label value — both reach the
    * parquet scan as PushedFilters — and the top-k plans as
    * TakeOrderedAndProject, never a full sort. Case-sensitive by design
    * (the plugin's index stores case-folded labels; fold upstream if
    * case-insensitive suggestions are wanted).
    */
  def autocomplete(data: DataFrame, labelPred: String, prefix: String,
      k: Int): DataFrame = {
    require(prefix.nonEmpty, "autocomplete needs a non-empty prefix")
    data.filter(col("p") === labelPred &&
        col("o.kind") === graft.model.Rdf.KindLiteral)
      .select(col("s").as("entity"), col("o.value").as("label"))
      .filter(col("label") >= prefix &&
        col("label") < prefixUpperBound(prefix))
      .orderBy(col("label"), col("entity"))
      .limit(k)
  }

  /** FUZZY search over an existing postings table: documents containing any
    * term within Levenshtein distance `maxDist` of the query term (Lucene's
    * fuzzy query, relationally). The distance runs over the DISTINCT
    * vocabulary, not the postings — cost ∝ |vocab| — with a cheap length
    * band (`abs(len - len(q)) <= maxDist`) ahead of the edit-distance
    * kernel; matched terms then select their postings via the same
    * bucket-prunable term filter as [[searchOver]] (broadcast-sized: at
    * most the vocabulary within the band). A production analog of Lucene's
    * Levenshtein automaton would intersect a term-prefix trie instead;
    * the vocabulary scan is the honest relational baseline and is already
    * ∝ distinct terms, not corpus bytes. `levenshtein` is bit-identical
    * across engines (standard DP edit distance), so oracles replay it.
    */
  private[pipeline] def fuzzyOver(p: DataFrame, term: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val q = term.toLowerCase
    val vocab = p.select(col("term")).distinct()
      .filter(abs(length(col("term")) - lit(q.length)) <= maxDist)
      .filter(levenshtein(col("term"), lit(q)) <= maxDist)
    p.join(broadcast(vocab), Seq("term"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("n_terms"),
        sum(col("tf")).cast("bigint").as("score"))
  }

  /** Fuzzy search off the corpus; see [[fuzzyOver]]. */
  def fuzzySearch(df: DataFrame, id: String, text: String, term: String,
      maxDist: Int = 1): DataFrame =
    fuzzyOver(postings(df, id, text), term, maxDist)

  /** Disjunctive (OR) keyword search over an existing postings table:
    * documents containing ANY query term (Lucene SHOULD clauses). Same
    * bucket-prunable `term IN` scan as [[searchOver]], no HAVING gate;
    * output carries how many distinct query terms matched and the total tf.
    */
  private[pipeline] def orOver(p: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "orSearch needs at least one term")
    val qs = terms.map(_.toLowerCase).distinct
    p.filter(col("term").isin(qs: _*))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("n_terms"),
        sum(col("tf")).cast("bigint").as("score"))
  }

  /** OR search off the corpus; see [[orOver]]. */
  def orSearch(df: DataFrame, id: String, text: String,
      terms: Seq[String]): DataFrame =
    orOver(postings(df, id, text), terms)

  /** Boolean search (Lucene MUST + MUST_NOT): documents containing EVERY
    * `must` term and NONE of the `mustNot` terms. The exclusion is a
    * LEFT ANTI join against the mustNot postings — both sides are selective
    * term-IN scans of the bucketed postings, never a corpus rescan.
    * Score = total tf of the `must` terms (deterministic integer).
    */
  private[pipeline] def booleanOver(p: DataFrame, must: Seq[String],
      mustNot: Seq[String]): DataFrame = {
    val base = searchOver(p, must)
    if (mustNot.isEmpty) base
    else {
      val ex = mustNot.map(_.toLowerCase).distinct
      val excluded = p.filter(col("term").isin(ex: _*))
        .select(col("doc")).distinct()
      base.join(excluded, Seq("doc"), "left_anti")
    }
  }

  /** Boolean search off the corpus; see [[booleanOver]]. */
  def booleanSearch(df: DataFrame, id: String, text: String,
      must: Seq[String], mustNot: Seq[String]): DataFrame =
    booleanOver(postings(df, id, text), must, mustNot)

  /** Translate a Lucene-style wildcard pattern (`*` = any run, `?` = one
    * char) to a SQL LIKE pattern, escaping literal `%`/`_`/`\` with a
    * backslash (tokens may contain `_` — it is a word char).
    */
  private[graft] def wildcardToLike(pattern: String): String =
    pattern.flatMap {
      case '*'  => "%"
      case '?'  => "_"
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  /** Wildcard ("w*ow", "s?an") search over an existing postings table.
    * The literal prefix ahead of the first wildcard becomes the same
    * SARGABLE term range as [[prefixOver]] (reaches a term-sorted scan as
    * PushedFilters); the full LIKE then verifies only the rows inside the
    * range — the relational analog of Lucene seeking the terms dict to the
    * prefix and checking the automaton from there. A leading-wildcard
    * pattern degrades to a full vocabulary scan, as it does in Lucene.
    */
  private[pipeline] def wildcardOver(p: DataFrame,
      pattern: String): DataFrame = {
    val pat = pattern.toLowerCase
    require(pat.exists(c => c == '*' || c == '?'),
      s"not a wildcard pattern: $pattern (use prefixSearch/search)")
    val literalPrefix = pat.takeWhile(c => c != '*' && c != '?')
    val ranged =
      if (literalPrefix.nonEmpty)
        p.filter(col("term") >= literalPrefix &&
          col("term") < prefixUpperBound(literalPrefix))
      else p
    ranged.filter(col("term").like(wildcardToLike(pat)))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("n_terms"),
        sum(col("tf")).cast("bigint").as("score"))
  }

  /** Wildcard search off the corpus; see [[wildcardOver]]. */
  def wildcardSearch(df: DataFrame, id: String, text: String,
      pattern: String): DataFrame =
    wildcardOver(postings(df, id, text), pattern)
}
