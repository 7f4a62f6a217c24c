package graft

/** DuckDB oracle SQL, one per `SparkEntry.queries` entry where the operator
  * is SQL-expressible (driver contract). EVERY query is oracle-checked,
  * including the hash-based / iterative operators: dd_minhash_sig, dd_simhash
  * and sim_knn_lsh use md5-derived hashes/weights whose constants are
  * interpolated below from the SAME Scala definitions; gx_pagerank runs in
  * scaled-integer arithmetic both engines replay bit-for-bit; sim_knn_ivf's
  * coarse quantizer runs on scalar-quantized (integer-valued) vectors so the
  * unrolled Lloyd's iterations below replay it exactly; mm_decode's stub
  * codec derives dims from md5(payload) and features from an exact byte
  * histogram.
  *
  * Parity rules (see SparkEntry header): identical aliases, pinned types,
  * `ORDER BY … NULLS FIRST` matching Spark's asc_nulls_first, identical FP
  * expression association, decimal-exact aggregates, and regexp_replace with
  * the 'g' flag (DuckDB replaces first match by default; Spark replaces all).
  */
object OracleSql {

  /** Exact all-pairs jaccard ≥ 0.5 over 3-gram shingles (the LSH path's
    * ground truth) — shared by the pairs oracle and the clusters oracle.
    */
  private val jaccardPairsCore =
    """sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\W+') AS toks
      |        FROM documents)),
      |jp AS (
      |  SELECT a, b, jaccard FROM (
      |    SELECT a.doc_id AS a, b.doc_id AS b,
      |      round(len(list_intersect(a.s, b.s))::DOUBLE /
      |        greatest(len(list_distinct(a.s || b.s)), 1)::DOUBLE, 4) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |  WHERE jaccard >= 0.5)""".stripMargin

  private val jaccardPairs =
    s"""WITH $jaccardPairsCore
      |SELECT a, b, jaccard FROM jp
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  /** Connected components of the near-dup pair graph by min-label
    * propagation (recursive transitive closure — the pair graph is tiny
    * relative to the corpus, exactly why the Spark side can afford GraphX).
    */
  private val dupClustersSql =
    s"""WITH RECURSIVE $jaccardPairsCore,
      |e AS (SELECT a AS x, b AS y FROM jp UNION SELECT b, a FROM jp),
      |v AS (SELECT DISTINCT x AS doc FROM e),
      |reach(doc, r) AS (
      |  SELECT doc, doc FROM v
      |  UNION
      |  SELECT e.x, reach.r FROM e JOIN reach ON reach.doc = e.y)
      |SELECT doc::BIGINT AS doc, min(r)::BIGINT AS cluster
      |FROM reach GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  private val embDouble =
    "SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings"

  /** MinHash signatures replayed in SQL: the SAME md5-60-bit shingle hash and
    * the SAME (a,b) permutation constants as [[graft.pipeline.Dedup]]
    * (interpolated at build time so the two can never drift apart).
    */
  private val minhashSig: String = {
    val prime = graft.pipeline.Dedup.Prime
    val perms = (0 until 32).map { i =>
      val (a, b) = graft.pipeline.Dedup.perm(i); s"($i, ${a}::BIGINT, ${b}::BIGINT)"
    }.mkString(", ")
    val emptySig = Seq.fill(32)(prime.toString).mkString(",")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\W+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id AS doc, shingle FROM (
       |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
       |    FROM toks)
       |  WHERE length(shingle) > 0
       |), h AS (
       |  SELECT doc, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $prime AS h FROM sh
       |), perms(i, a, b) AS (VALUES $perms),
       |mins AS (
       |  SELECT doc, i, coalesce(min((h * a + b) % $prime), $prime) AS m
       |  FROM h CROSS JOIN perms GROUP BY doc, i
       |), sigs AS (
       |  SELECT doc, string_agg(m, ',' ORDER BY i) AS sig FROM mins GROUP BY doc
       |)
       |SELECT d.doc_id::BIGINT AS doc_id, coalesce(s.sig, '$emptySig') AS sig
       |FROM documents d LEFT JOIN sigs s ON s.doc = d.doc_id
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
  }

  /** SimHash replayed in SQL: same md5-60-bit token hash, same majority
    * vote, bit sums generated for the same 60 bit positions.
    */
  /** Per-doc 60-bit md5 SimHash — shared by the signature dump and the
    * hamming-0 pairs oracle (no ORDER BY so it composes as a CTE).
    */
  private val simhashCore: String = {
    val bitSums = (0 until 60).map(i => s"SUM((h >> $i) & 1) AS b$i").mkString(", ")
    val shExpr = (0 until 60).map(i =>
      s"CASE WHEN b$i * 2 > ntok THEN (1::BIGINT << $i) ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\\W+'),
       |      x -> length(x) > 0)) AS tok
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
       |), bits AS (
       |  SELECT doc_id, COUNT(h) AS ntok, $bitSums FROM h GROUP BY doc_id
       |)
       |SELECT d.doc_id::BIGINT AS doc_id, coalesce(($shExpr), 0)::BIGINT AS sh
       |FROM documents d LEFT JOIN bits USING (doc_id)""".stripMargin
  }

  private val simhashSql: String =
    simhashCore + "\nORDER BY 1 NULLS FIRST, 2 NULLS FIRST"

  // ---- text-quality cores (no ORDER BY — composable as CTEs; the
  // txt_gate keep-list query joins all three) ----

  private val qualityCore: String =
    """SELECT doc_id, round(
      |    alpha * 0.5 + least(stop * 2.0, 1.0) * 0.3 + (1.0 - uppr) * 0.1
      |      + (1.0 - least(dig * 4.0, 1.0)) * 0.1, 4) AS quality
      |FROM (
      |  SELECT doc_id,
      |    CASE WHEN length(text) > 0
      |      THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)::DOUBLE
      |      ELSE 0.0 END AS alpha,
      |    CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
      |               ELSE len(string_split_regex(trim(text), '\s+')) END) > 0
      |      THEN len(regexp_extract_all(text,
      |          '(?i)\b(the|and|of|to|in|is|that|it|for|was|with|his|her|this|have|not|are|but)\b'))::DOUBLE
      |        / (CASE WHEN length(trim(text)) = 0 THEN 0
      |           ELSE len(string_split_regex(trim(text), '\s+')) END)::DOUBLE
      |      ELSE 0.0 END AS stop,
      |    CASE WHEN length(text) > 0
      |      THEN length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE / length(text)::DOUBLE
      |      ELSE 0.0 END AS uppr,
      |    CASE WHEN length(text) > 0
      |      THEN length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE
      |      ELSE 0.0 END AS dig
      |  FROM documents)""".stripMargin

  private val langidCore: String =
    """SELECT doc_id, CASE
      |    WHEN best > 0 AND c_en = best THEN 'en'
      |    WHEN best > 0 AND c_de = best THEN 'de'
      |    WHEN best > 0 AND c_fr = best THEN 'fr'
      |    WHEN best > 0 AND c_es = best THEN 'es'
      |    ELSE 'und' END AS lang_pred
      |FROM (
      |  SELECT doc_id, c_en, c_de, c_fr, c_es,
      |    greatest(c_en, c_de, c_fr, c_es) AS best
      |  FROM (
      |    SELECT doc_id,
      |      len(regexp_extract_all(lower(text), '\b(the|and|of|to|with|that|this|for)\b')) AS c_en,
      |      len(regexp_extract_all(lower(text), '\b(der|die|das|und|nicht|ist|ein|mit)\b')) AS c_de,
      |      len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|dans|pour)\b')) AS c_fr,
      |      len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|para|como|pero)\b')) AS c_es
      |    FROM documents))""".stripMargin

  private val repCore: String =
    """WITH rtoks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\W+'),
      |      x -> length(x) > 0) AS toks
      |  FROM documents
      |), rtg AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS n_tg,
      |    CASE WHEN len(toks) >= 3 THEN len(list_distinct(list_transform(
      |      range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) ELSE 0 END AS d_tg
      |  FROM rtoks
      |), rln AS (
      |  SELECT doc_id, list_filter(list_transform(string_split(text, chr(10)),
      |      l -> trim(l)), l -> length(l) > 0) AS ls
      |  FROM documents
      |)
      |SELECT t.doc_id,
      |  CASE WHEN n_tg > 0 THEN 1.0 - d_tg::DOUBLE / n_tg::DOUBLE ELSE 0.0 END
      |    AS dup_trigram_frac,
      |  CASE WHEN len(ls) > 0
      |    THEN 1.0 - len(list_distinct(ls))::DOUBLE / len(ls)::DOUBLE
      |    ELSE 0.0 END AS dup_line_frac
      |FROM rtg t JOIN rln USING (doc_id)""".stripMargin

  /** Multi-probe SimHash pairs replayed in SQL: the same 4×15-bit banding
    * (any pair within hamming ≤ 3 collides on ≥ 1 band) and the same exact
    * popcount verify. DuckDB's `xor()` (its `^` is power!) + `bit_count`.
    */
  private val simhashPairsSql: String =
    s"""WITH sig AS ($simhashCore),
       |banded AS (
       |  SELECT doc_id, sh, t.band, (sh >> (15 * t.band)) & 32767 AS bk
       |  FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) t(band)
       |),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sh AS sha, r.sh AS shb
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.bk = r.bk AND l.doc_id < r.doc_id
       |)
       |SELECT a, b, bit_count(xor(sha, shb))::BIGINT AS hamming
       |FROM cand WHERE bit_count(xor(sha, shb)) <= 3
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  /** Fixed-iteration PageRank unrolled in scaled-integer arithmetic — every
    * contribution uses integer division, so the result is bit-identical to
    * [[graft.graph.GraphAnalytics.pageRankFixed]] regardless of summation
    * order (no FP until the final constant division).
    */
  private val pagerankCte: String = {
    val S = 100000000L
    val base = 15L * S / 100
    val iters = (1 to 3).map { t =>
      val prev = s"r${t - 1}"
      s"""r$t AS (
         |  SELECT v.v AS v, ${base}::BIGINT + (85 * coalesce(c.csum, 0)) // 100 AS r
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst, SUM(p.r // dg.d) AS csum
         |    FROM edges e JOIN $prev p ON p.v = e.src JOIN deg dg ON dg.src = e.src
         |    GROUP BY e.dst) c ON c.dst = v.v)"""
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT 'urn:graft/customer/' || c_custkey AS src,
       |         'urn:graft/nation/' || c_nationkey AS dst FROM customer
       |  UNION ALL
       |  SELECT 'urn:graft/nation/' || n_nationkey,
       |         'urn:graft/region/' || n_regionkey FROM nation),
       |verts AS (SELECT DISTINCT v FROM
       |  (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
       |deg AS (SELECT src, COUNT(*)::BIGINT AS d FROM edges GROUP BY 1),
       |r0 AS (SELECT v, ${S}::BIGINT AS r FROM verts),
       |$iters""".stripMargin
  }

  private val pagerankSql: String =
    s"""$pagerankCte
       |SELECT v AS iri, r::DOUBLE / 1e8 AS rank FROM r3
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** FTS plugin (`luc:` pseudo-property): tokenized molecule of part
    * p_name + p_type per subject IRI, conjunctive membership via
    * INTERSECT — the engine's per-term doc-set intersection.
    */
  private val lucToksCte: String =
    """WITH toks AS (
      |  SELECT 'urn:graft/part/' || p_partkey AS s, unnest(list_filter(
      |    string_split_regex(lower(trim(p_name)), '\W+'),
      |    x -> length(x) > 0)) AS term
      |  FROM part
      |  UNION
      |  SELECT 'urn:graft/part/' || p_partkey, unnest(list_filter(
      |    string_split_regex(lower(trim(p_type)), '\W+'),
      |    x -> length(x) > 0))
      |  FROM part
      |)""".stripMargin

  /** Similarity plugin (r13): the tf-vector CTE chain over documents.text
    * — same tokenization as the engine's createSimilarityIndex, tf per
    * (doc, term), squared norm per doc.
    */
  private val simTfCte: String =
    """WITH toks AS (
      |  SELECT 'urn:graft/documents/' || doc_id AS doc, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\W+'),
      |    x -> length(x) > 0)) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
      |), nn AS (
      |  SELECT doc, sum(tf * tf)::DOUBLE AS nn FROM tf GROUP BY 1
      |)""".stripMargin

  /** Term search: query "spark window query window" → qtf vector, cosine
    * against every doc vector, round-4, top-12 by (score desc, doc asc).
    */
  private val simSearchSql: String =
    s"""$simTfCte, q AS (
       |  SELECT * FROM (VALUES ('spark', 1), ('window', 2), ('query', 1))
       |    v(term, qtf)
       |), num AS (
       |  SELECT tf.doc, sum(tf.tf * q.qtf)::DOUBLE AS num
       |  FROM tf JOIN q ON tf.term = q.term GROUP BY 1
       |)
       |SELECT doc, score FROM (
       |  SELECT num.doc AS doc,
       |    round(num / (sqrt(nn.nn) * sqrt(6.0)), 4) AS score
       |  FROM num JOIN nn ON num.doc = nn.doc
       |  ORDER BY 2 DESC, 1 ASC LIMIT 12)
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** Doc-to-doc: document 0's stored tf vector queries the rest; the
    * SPARQL FILTER(?score >= 0.5) applies AFTER the plugin's top-k.
    */
  private val simMltSql: String =
    s"""$simTfCte, q AS (
       |  SELECT term, tf AS qtf FROM tf WHERE doc = 'urn:graft/documents/0'
       |), qn AS (
       |  SELECT sqrt(nn) AS qn FROM nn WHERE doc = 'urn:graft/documents/0'
       |), num AS (
       |  SELECT tf.doc, sum(tf.tf * q.qtf)::DOUBLE AS num
       |  FROM tf JOIN q ON tf.term = q.term
       |  WHERE tf.doc <> 'urn:graft/documents/0' GROUP BY 1
       |)
       |SELECT doc, score FROM (
       |  SELECT num.doc AS doc,
       |    round(num / (sqrt(nn.nn) * (SELECT qn FROM qn)), 4) AS score
       |  FROM num JOIN nn ON num.doc = nn.doc
       |  ORDER BY 2 DESC, 1 ASC LIMIT 10)
       |WHERE score >= 0.72
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  private val lucSql: String =
    s"""$lucToksCte, sel AS (
       |  SELECT s FROM toks WHERE term = 'red'
       |  INTERSECT
       |  SELECT s FROM toks WHERE term = 'economy'
       |)
       |SELECT sel.s AS s, p_name AS nm FROM sel
       |JOIN part ON sel.s = 'urn:graft/part/' || p_partkey
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  private val lucWildSql: String =
    s"""$lucToksCte, sel AS (
       |  SELECT DISTINCT s FROM toks WHERE term LIKE 'gi%'
       |  INTERSECT
       |  SELECT s FROM toks WHERE term = 'small'
       |)
       |SELECT s FROM sel ORDER BY 1 NULLS FIRST""".stripMargin

  /** luc:score (r14): tf postings over the part p_name+p_type molecule
    * (UNION ALL — frequencies, not the set CTE), per-clause integer
    * tf·idf contributions (tf * (N*1e6 // df_t); df_t = the matched
    * term's doc frequency), summed per doc over the conjunctive "gi*
    * small" match set — the engine's rankedSearch kernel replayed.
    */
  private val lucScoreSql: String =
    """WITH toks AS (
      |  SELECT 'urn:graft/part/' || p_partkey AS s, unnest(list_filter(
      |    string_split_regex(lower(trim(p_name)), '\W+'),
      |    x -> length(x) > 0)) AS term
      |  FROM part
      |  UNION ALL
      |  SELECT 'urn:graft/part/' || p_partkey, unnest(list_filter(
      |    string_split_regex(lower(trim(p_type)), '\W+'),
      |    x -> length(x) > 0))
      |  FROM part
      |), tf AS (
      |  SELECT s, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
      |), nd AS (SELECT count(DISTINCT s) AS n FROM tf),
      |sel AS (
      |  SELECT DISTINCT s FROM tf WHERE term LIKE 'gi%'
      |  INTERSECT
      |  SELECT s FROM tf WHERE term = 'small'
      |),
      |c1 AS (
      |  SELECT s, tf * (((SELECT n FROM nd) * 1000000) // df_t) AS c
      |  FROM (SELECT s, tf, count(*) OVER (PARTITION BY term) AS df_t
      |        FROM tf WHERE term LIKE 'gi%')
      |),
      |c2 AS (
      |  SELECT s, tf * (((SELECT n FROM nd) * 1000000) // df_t) AS c
      |  FROM (SELECT s, tf, count(*) OVER (PARTITION BY term) AS df_t
      |        FROM tf WHERE term = 'small')
      |),
      |contrib AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
      |SELECT contrib.s AS s, sum(c)::BIGINT AS score
      |FROM contrib JOIN sel ON contrib.s = sel.s
      |GROUP BY 1
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** Analyzed `luc:` index over documents.text: the Analyzer CTE chain on
    * BOTH the corpus tokens and the query terms (fts_stem's pattern), with
    * subject-IRI docs and set-shaped conjunctive membership.
    */
  private val lucStemSql: String =
    s"""WITH toks AS (
       |  SELECT 'urn:graft/documents/' || doc_id AS doc, unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\W+'),
       |    x -> length(x) > 0)) AS term
       |  FROM documents),
       |${graft.pipeline.Analyzer.duckCtes("toks", "st")},
       |qraw AS (SELECT 0 AS doc, lower(term) AS term FROM (VALUES
       |  ('the'), ('scanning'), ('merges')) v(term)),
       |${graft.pipeline.Analyzer.duckCtes("qraw", "qs")},
       |m AS (
       |  SELECT DISTINCT doc, term FROM st5
       |  WHERE term IN (SELECT term FROM qs5))
       |SELECT doc AS s FROM m GROUP BY doc
       |HAVING count(*) = (SELECT count(DISTINCT term) FROM qs5)
       |ORDER BY 1 NULLS FIRST""".stripMargin

  /** Graph Path Search (SERVICE path:search): the recursive walk over the
    * SAME FK edge view the engine's wildcard resource-edge search explores
    * (only lineitem-reachable, region-leading edges need modeling — part /
    * rdf:type branches are sinks that can never reach the destination, and
    * this sub-graph is a DAG so the engine's simple-path guard is vacuous).
    * The shared CTE ends at `hits` = (hop count, path list); each mode
    * finishes it differently. Paths order by (d, path) — DuckDB compares
    * lists element-wise, exactly the engine's deterministic order.
    */
  private val fkEdgeUnions: Map[String, String] = Map(
    "l_orderkey" ->
      """SELECT 'urn:graft/lineitem/' || l_orderkey || '/' || l_linenumber AS src,
        |         'urn:graft/lineitem#l_orderkey' AS p,
        |         'urn:graft/orders/' || l_orderkey AS dst FROM lineitem""".stripMargin,
    "l_suppkey" ->
      """SELECT 'urn:graft/lineitem/' || l_orderkey || '/' || l_linenumber AS src,
        |         'urn:graft/lineitem#l_suppkey' AS p,
        |         'urn:graft/supplier/' || l_suppkey AS dst FROM lineitem""".stripMargin,
    "o_custkey" ->
      """SELECT 'urn:graft/orders/' || o_orderkey AS src,
        |         'urn:graft/orders#o_custkey' AS p,
        |         'urn:graft/customer/' || o_custkey AS dst FROM orders""".stripMargin,
    "c_nationkey" ->
      """SELECT 'urn:graft/customer/' || c_custkey AS src,
        |         'urn:graft/customer#c_nationkey' AS p,
        |         'urn:graft/nation/' || c_nationkey AS dst FROM customer""".stripMargin,
    "s_nationkey" ->
      """SELECT 'urn:graft/supplier/' || s_suppkey AS src,
        |         'urn:graft/supplier#s_nationkey' AS p,
        |         'urn:graft/nation/' || s_nationkey AS dst FROM supplier""".stripMargin,
    "n_regionkey" ->
      """SELECT 'urn:graft/nation/' || n_nationkey AS src,
        |         'urn:graft/nation#n_regionkey' AS p,
        |         'urn:graft/region/' || n_regionkey AS dst FROM nation""".stripMargin)

  /** The walk CTE, parameterized by the edge RELATIONS it may traverse —
    * the full FK set for the wildcard searches, a subset for the
    * pattern-restricted one (r14: the restriction shrinks the edge
    * definition itself, exactly like the engine's compiled wildcard
    * pattern).
    */
  private def pathWalkCteWith(edgeKeys: Seq[String]): String =
    s"""WITH RECURSIVE sel AS (
       |  SELECT l.l_orderkey AS ok, l.l_linenumber AS ln, rn.n_regionkey AS rk
       |  FROM lineitem l
       |  JOIN orders o ON o.o_orderkey = l.l_orderkey
       |  JOIN customer c ON c.c_custkey = o.o_custkey
       |  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
       |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |  JOIN nation rn ON rn.n_nationkey = s.s_nationkey
       |  WHERE cn.n_regionkey = rn.n_regionkey
       |  ORDER BY 1, 2, l.l_suppkey, 3 LIMIT 1
       |), ep AS (
       |  SELECT 'urn:graft/lineitem/' || ok || '/' || ln AS si,
       |         'urn:graft/region/' || rk AS di FROM sel
       |), e AS (
       |  ${edgeKeys.map(fkEdgeUnions).mkString("\n  UNION\n  ")}
       |), walk(node, d, path) AS (
       |  SELECT si, 0, [si] FROM ep
       |  UNION ALL
       |  SELECT e.dst, w.d + 1, list_append(list_append(w.path, e.p), e.dst)
       |  FROM walk w JOIN e ON e.src = w.node
       |  WHERE w.d < 4 AND w.node <> (SELECT di FROM ep)
       |), hits AS (
       |  SELECT d, path FROM walk WHERE node = (SELECT di FROM ep)
       |)""".stripMargin

  private val pathWalkCte: String = pathWalkCteWith(Seq("l_orderkey",
    "l_suppkey", "o_custkey", "c_nationkey", "s_nationkey", "n_regionkey"))

  private val pathSearchAllSql: String =
    s"""$pathWalkCte, numbered AS (
       |  SELECT d, path, row_number() OVER (ORDER BY d, path) - 1 AS pi
       |  FROM hits
       |), ex AS (
       |  SELECT pi, unnest(generate_series(0, d - 1)) AS i, path FROM numbered
       |)
       |SELECT pi::BIGINT AS pi, i::BIGINT AS ei, path[2*i + 1] AS es,
       |  path[2*i + 2] AS ep, path[2*i + 3] AS eo
       |FROM ex
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
       |  5 NULLS FIRST""".stripMargin

  /** Pattern-restricted path search (r14): the same walk over ONLY the
    * supplier-route FK edges (l_suppkey / s_nationkey / n_regionkey) —
    * the engine side restricts via a wildcard graph pattern, the oracle
    * by shrinking the recursive CTE's edge relation. Only the 3-hop
    * supplier route survives; the 4-hop customer route's edges are gone.
    */
  private val pathSearchPatternSql: String =
    s"""${pathWalkCteWith(Seq("l_suppkey", "s_nationkey", "n_regionkey"))},
       |numbered AS (
       |  SELECT d, path, row_number() OVER (ORDER BY d, path) - 1 AS pi
       |  FROM hits
       |), ex AS (
       |  SELECT pi, unnest(generate_series(0, d - 1)) AS i, path FROM numbered
       |)
       |SELECT pi::BIGINT AS pi, i::BIGINT AS ei, path[2*i + 1] AS es,
       |  path[2*i + 2] AS ep, path[2*i + 3] AS eo
       |FROM ex
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
       |  5 NULLS FIRST""".stripMargin

  private val pathShortestSql: String =
    s"""$pathWalkCte, best AS (
       |  SELECT d, path FROM hits ORDER BY d, path LIMIT 1
       |), ex AS (
       |  SELECT unnest(generate_series(0, d - 1)) AS i, path FROM best
       |)
       |SELECT i::BIGINT AS ei, path[2*i + 1] AS es, path[2*i + 2] AS ep,
       |  path[2*i + 3] AS eo
       |FROM ex
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  private val pathDistSql: String =
    s"""$pathWalkCte
       |SELECT min(d)::BIGINT AS dist FROM hits""".stripMargin

  /** RDF Rank pseudo-property: the SAME unrolled PageRank joined back to
    * the nation names — what the `rank:hasRDFRank` rewrite reads.
    */
  private val rdfRankSql: String =
    s"""$pagerankCte
       |SELECT n_name AS nm, r.r::DOUBLE / 1e8 AS rnk
       |FROM nation JOIN r3 r
       |  ON r.v = 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR)
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** LSH ANN replayed in SQL: the plane weights are interpolated from the
    * SAME [[graft.pipeline.Similarity.planeWeight]] md5 derivation, so
    * bucketing, probing and ranking replay exactly.
    */
  private val knnLshSql: String = {
    val (planes, probes, dim, k) = (8, 4, 64, 5)
    val planeLists = (0 until planes).map { p =>
      val ws = (0 until dim).map(j =>
        graft.pipeline.Similarity.planeWeight(p, j)).mkString("[", ",", "]")
      s"($p, $ws)"
    }.mkString(", ")
    val probeVals = (0L +: (0 until probes).map(b => 1L << b))
      .distinct.map(f => s"(${f}::BIGINT)").mkString(", ")
    s"""WITH e AS ($embDouble),
       |planes(p, w) AS (VALUES $planeLists),
       |keys AS (
       |  SELECT e.vec_id, SUM(CASE WHEN list_dot_product(e.v, p.w) >= 0
       |      THEN (1::BIGINT << p.p) ELSE 0 END)::BIGINT AS bucket
       |  FROM e CROSS JOIN planes p GROUP BY e.vec_id),
       |probes(f) AS (VALUES $probeVals),
       |qb AS (
       |  SELECT DISTINCT k.vec_id AS query_id, xor(k.bucket, pr.f) AS bucket
       |  FROM keys k CROSS JOIN probes pr WHERE k.vec_id < 10),
       |cand AS (
       |  SELECT DISTINCT qb.query_id, ck.vec_id AS neighbor_id
       |  FROM qb JOIN keys ck ON ck.bucket = qb.bucket
       |  WHERE ck.vec_id <> qb.query_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_cosine_similarity(q.v, c.v) AS cos0
       |  FROM cand JOIN e q ON q.vec_id = cand.query_id
       |    JOIN e c ON c.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos0,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos0 DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cos0, 4) AS cos, rank::INT AS rank
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id NULLS FIRST, neighbor_id NULLS FIRST,
       |  cos NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  /** Sign-LSH banded near-dup pairs replayed in SQL: same md5-derived
    * hyperplanes ([[graft.pipeline.Similarity.planeWeight]]), same 4×4-bit
    * banding, same exact-cosine verify at round-4.
    */
  private val cosineLshSql: String = {
    val (planes, bands, dim) = (16, 4, 64)
    val w = planes / bands
    val mask = (1L << w) - 1L
    val planeLists = (0 until planes).map { p =>
      val ws = (0 until dim).map(j =>
        graft.pipeline.Similarity.planeWeight(p, j)).mkString("[", ",", "]")
      s"($p, $ws)"
    }.mkString(", ")
    val bandVals = (0 until bands).map(b => s"($b)").mkString(", ")
    s"""WITH e AS ($embDouble),
       |planes(p, w) AS (VALUES $planeLists),
       |keys AS (
       |  SELECT e.vec_id, SUM(CASE WHEN list_dot_product(e.v, p.w) >= 0
       |      THEN (1::BIGINT << p.p) ELSE 0 END)::BIGINT AS key
       |  FROM e CROSS JOIN planes p GROUP BY e.vec_id),
       |banded AS (
       |  SELECT vec_id, t.band, (key >> ($w * t.band)) & $mask AS bk
       |  FROM keys CROSS JOIN (VALUES $bandVals) t(band)),
       |cand AS (
       |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.bk = r.bk AND l.vec_id < r.vec_id),
       |scored AS (
       |  SELECT a, b, list_cosine_similarity(ea.v, eb.v) AS cos0
       |  FROM cand JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b)
       |SELECT a, b, round(cos0, 4) AS cos FROM scored
       |WHERE round(cos0, 4) >= 0.42
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
  }

  /** IVF ANN replayed in SQL: the Lloyd's iterations run on scalar-quantized
    * vectors (`floor(x * ivfQuantScale)` — the SAME scale constant as
    * [[graft.pipeline.Similarity.ivfTopK]]), so every sum is exact and the
    * learned quantizer is bit-identical in both engines; candidate scoring
    * then uses the original full-precision vectors, as in [[knnLshSql]].
    */
  /** One k-means assignment step in SQL — shared by the IVF kNN oracle and
    * the SemDeDup oracle (same quantized-space argmin as `ivfNearest`).
    */
  private def ivfAssignSql(prev: String, filter: String, n: Int,
      en: String = "en"): String =
    s"""  SELECT vec_id, cid FROM (
       |    SELECT en.vec_id, c.cid, row_number() OVER (PARTITION BY en.vec_id
       |      ORDER BY CASE WHEN en.ni * c.cn > 0
       |        THEN list_dot_product(en.vi, c.cv) / (en.ni * c.cn)
       |        ELSE 0.0 END DESC, c.cid ASC) AS r
       |    FROM $en en CROSS JOIN
       |      (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM $prev) c
       |    $filter)
       |  WHERE r <= $n""".stripMargin

  /** The Lloyd's-training CTE chain through the final assignment `af` —
    * deterministic seeding (nlist smallest ids) and integer centroid means,
    * replaying [[graft.pipeline.Similarity.ivfTrain]] exactly.
    */
  private def ivfTrainCtes(nlist: Int, iters: Int, dim: Int): String = {
    val s = graft.pipeline.Similarity.ivfQuantScale
    val iterCtes = (1 to iters).map { t =>
      s"""a$t AS (
         |${ivfAssignSql(s"c${t - 1}", "", 1)}),
         |c$t AS (
         |  SELECT cid, list(m ORDER BY j) AS cv FROM (
         |    SELECT a.cid, t.j, floor(sum(en.vi[t.j]) / count(*)) AS m
         |    FROM a$t a JOIN en ON en.vec_id = a.vec_id
         |      CROSS JOIN UNNEST(range(1, ${dim + 1})) AS t(j)
         |    GROUP BY a.cid, t.j)
         |  GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($embDouble),
       |en AS (
       |  SELECT vec_id, vi, sqrt(list_dot_product(vi, vi)) AS ni FROM
       |    (SELECT vec_id, list_transform(v, x -> floor(x * ${s})) AS vi FROM e)),
       |c0 AS (
       |  SELECT (row_number() OVER (ORDER BY vec_id ASC) - 1)::BIGINT AS cid,
       |    vi AS cv
       |  FROM (SELECT vec_id, vi FROM en ORDER BY vec_id ASC LIMIT $nlist)),
       |$iterCtes,
       |af AS (
       |${ivfAssignSql(s"c$iters", "", 1)})""".stripMargin
  }

  /** Product-quantization ANN replayed in SQL: per-subspace deterministic
    * Lloyd's (the [[ivfTrainCtes]] chain on sliced subvectors), argmax
    * encoding, and ADC cosine against the codeword reconstruction — the
    * same integer-valued arithmetic as [[graft.pipeline.Similarity.pqTopK]],
    * so training, codes and scores are bit-identical.
    */
  /** The per-subspace PQ training + encoding CTE chains over a source CTE
    * `$en(vec_id, vi, …)` of full quantized vectors: `se{mi}` subvector
    * frames, `cb{mi}_{t}` codebook iterations, `code{mi}` final codes.
    */
  private def pqChainsSql(en: String, m: Int, ksub: Int, iters: Int,
      sub: Int): String =
    (0 until m).map { mi =>
      val (lo, hi) = (mi * sub + 1, (mi + 1) * sub)
      val iterCtes = (1 to iters).map { t =>
        s"""sa${mi}_$t AS (
           |${ivfAssignSql(s"cb${mi}_${t - 1}", "", 1, s"se$mi")}),
           |cb${mi}_$t AS (
           |  SELECT cid, list(mm ORDER BY j) AS cv FROM (
           |    SELECT a.cid, t.j, floor(sum(en.vi[t.j]) / count(*)) AS mm
           |    FROM sa${mi}_$t a JOIN se$mi en ON en.vec_id = a.vec_id
           |      CROSS JOIN UNNEST(range(1, ${sub + 1})) AS t(j)
           |    GROUP BY a.cid, t.j)
           |  GROUP BY cid)""".stripMargin
      }.mkString(",\n")
      s"""se$mi AS (
         |  SELECT vec_id, vi[$lo:$hi] AS vi,
         |    sqrt(list_dot_product(vi[$lo:$hi], vi[$lo:$hi])) AS ni FROM $en),
         |cb${mi}_0 AS (
         |  SELECT (row_number() OVER (ORDER BY vec_id ASC) - 1)::BIGINT AS cid,
         |    vi AS cv
         |  FROM (SELECT vec_id, vi FROM se$mi ORDER BY vec_id ASC LIMIT $ksub)),
         |$iterCtes,
         |code$mi AS (
         |${ivfAssignSql(s"cb${mi}_$iters", "", 1, s"se$mi")})""".stripMargin
    }.mkString(",\n")

  private def pqScoreParts(m: Int, iters: Int, sub: Int):
      (String, String, String, String) = {
    val codeCols = (0 until m).map(mi => s"code$mi.cid AS c$mi").mkString(", ")
    val bookJoins = (0 until m).map(mi =>
      s"JOIN cb${mi}_$iters b$mi ON b$mi.cid = cd.c$mi").mkString("\n  ")
    val rnSum = (0 until m).map(mi =>
      s"list_dot_product(b$mi.cv, b$mi.cv)").mkString(" + ")
    val adcSum = (0 until m).map { mi =>
      val (lo, hi) = (mi * sub + 1, (mi + 1) * sub)
      s"list_dot_product(q.vi[$lo:$hi], b$mi.cv)"
    }.mkString(" + ")
    (codeCols, bookJoins, rnSum, adcSum)
  }

  private val knnPqSql: String = {
    val (m, ksub, iters, k, dim) = (4, 8, 2, 5, 64)
    val sub = dim / m
    val qs = graft.pipeline.Similarity.ivfQuantScale
    val codeJoins = (0 until m).map(mi =>
      s"JOIN code$mi ON code$mi.vec_id = en0.vec_id").mkString(" ")
    val (codeCols, bookJoins, rnSum, adcSum) = pqScoreParts(m, iters, sub)
    s"""WITH e AS ($embDouble),
       |en0 AS (
       |  SELECT vec_id, list_transform(v, x -> floor(x * $qs)) AS vi FROM e),
       |${pqChainsSql("en0", m, ksub, iters, sub)},
       |codes AS (
       |  SELECT en0.vec_id, $codeCols FROM en0 $codeJoins),
       |qn AS (
       |  SELECT vec_id, vi, sqrt(list_dot_product(vi, vi)) AS ni
       |  FROM en0 WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id,
       |    CASE WHEN q.ni * sqrt($rnSum) > 0 THEN
       |      ($adcSum) / (q.ni * sqrt($rnSum)) ELSE 0.0 END AS cos0
       |  FROM qn q CROSS JOIN codes cd
       |  $bookJoins
       |  WHERE q.vec_id <> cd.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos0,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos0 DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cos0, 4) AS cos, rank
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id NULLS FIRST, neighbor_id NULLS FIRST,
       |  cos NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  /** PQ encoding of EVERY vector replayed in SQL — the streaming-encode
    * oracle: same chains as [[knnPqSql]], output = (vec_id, code0..3).
    */
  private val pqEncodeAllSql: String = {
    val (m, ksub, iters, dim) = (4, 8, 2, 64)
    val sub = dim / m
    val qs = graft.pipeline.Similarity.ivfQuantScale
    val codeJoins = (0 until m).map(mi =>
      s"JOIN code$mi ON code$mi.vec_id = en0.vec_id").mkString(" ")
    val codeCols = (0 until m).map(mi =>
      s"code$mi.cid::BIGINT AS code$mi").mkString(", ")
    s"""WITH e AS ($embDouble),
       |en0 AS (
       |  SELECT vec_id, list_transform(v, x -> floor(x * $qs)) AS vi FROM e),
       |${pqChainsSql("en0", m, ksub, iters, sub)}
       |SELECT en0.vec_id::BIGINT AS vec_id, $codeCols
       |FROM en0 $codeJoins
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
       |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin
  }

  /** IVF-PQ replayed in SQL: the coarse [[ivfTrainCtes]] chain (e, en,
    * c0..cN, af) + nprobe probing, the PQ chains over the same `en`, and
    * ADC scoring restricted to candidates whose coarse list one of the
    * query's probes hit — mirroring
    * [[graft.pipeline.Similarity.ivfPqTopK]] exactly.
    */
  private val knnIvfPqSql: String = {
    val (nlist, nprobe, coarseIters) = (8, 3, 3)
    val (m, ksub, pqIters, k, dim) = (4, 8, 2, 5, 64)
    val sub = dim / m
    val codeJoins = (0 until m).map(mi =>
      s"JOIN code$mi ON code$mi.vec_id = en.vec_id").mkString(" ")
    val (codeCols, bookJoins, rnSum, adcSum) = pqScoreParts(m, pqIters, sub)
    s"""${ivfTrainCtes(nlist, coarseIters, dim)},
       |pr AS (
       |${ivfAssignSql(s"c$coarseIters", "WHERE en.vec_id < 10", nprobe)}),
       |${pqChainsSql("en", m, ksub, pqIters, sub)},
       |codes AS (
       |  SELECT en.vec_id, af.cid AS ccid, $codeCols
       |  FROM en JOIN af ON af.vec_id = en.vec_id $codeJoins),
       |qn AS (
       |  SELECT vec_id, vi, ni FROM en WHERE vec_id < 10),
       |scored AS (
       |  SELECT pr.vec_id AS query_id, cd.vec_id AS neighbor_id,
       |    CASE WHEN q.ni * sqrt($rnSum) > 0 THEN
       |      ($adcSum) / (q.ni * sqrt($rnSum)) ELSE 0.0 END AS cos0
       |  FROM pr
       |  JOIN codes cd ON cd.ccid = pr.cid
       |  JOIN qn q ON q.vec_id = pr.vec_id
       |  $bookJoins
       |  WHERE pr.vec_id <> cd.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos0,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos0 DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cos0, 4) AS cos, rank
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id NULLS FIRST, neighbor_id NULLS FIRST,
       |  cos NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  private val knnIvfSql: String = {
    val (nlist, nprobe, iters, k, dim) = (8, 3, 3, 5, 64)
    s"""${ivfTrainCtes(nlist, iters, dim)},
       |pr AS (
       |${ivfAssignSql(s"c$iters", "WHERE en.vec_id < 10", nprobe)}),
       |cand AS (
       |  SELECT DISTINCT pr.vec_id AS query_id, af.vec_id AS neighbor_id
       |  FROM pr JOIN af USING (cid) WHERE af.vec_id <> pr.vec_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_cosine_similarity(q.v, c.v) AS cos0
       |  FROM cand JOIN e q ON q.vec_id = cand.query_id
       |    JOIN e c ON c.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos0,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos0 DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cos0, 4) AS cos, rank::INT AS rank
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id NULLS FIRST, neighbor_id NULLS FIRST,
       |  cos NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  /** Similarity-plugin embedding mode (r14): the IVF probe with vec 0's
    * float-widened vector as the query — quantized probe picks nprobe
    * lists (the engine's pruned buckets), full-precision cosine over the
    * candidates, round-4, top-8 by (score desc, doc asc). The engine's
    * SPARQL literal renders the same widened doubles shortest-roundtrip,
    * so both sides score identical vectors.
    */
  private val simVecSql: String = {
    val (nlist, nprobe, iters, k, dim) = (8, 3, 3, 8, 64)
    val s = graft.pipeline.Similarity.ivfQuantScale
    s"""${ivfTrainCtes(nlist, iters, dim)},
       |qe AS (SELECT -1::BIGINT AS vec_id, v FROM e WHERE e.vec_id = 0),
       |qen AS (
       |  SELECT vec_id, vi, sqrt(list_dot_product(vi, vi)) AS ni FROM
       |    (SELECT vec_id, list_transform(v, x -> floor(x * $s)) AS vi
       |     FROM qe)),
       |pr AS (
       |${ivfAssignSql(s"c$iters", "", nprobe, en = "qen")}),
       |cand AS (
       |  SELECT DISTINCT af.vec_id AS neighbor_id FROM pr JOIN af USING (cid)),
       |scored AS (
       |  SELECT cand.neighbor_id,
       |    list_cosine_similarity((SELECT v FROM qe), c.v) AS cos0
       |  FROM cand JOIN e c ON c.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT neighbor_id, cos0, row_number() OVER (
       |    ORDER BY cos0 DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT 'urn:graft/embeddings/' || neighbor_id AS doc,
       |  round(cos0, 4) AS score
       |FROM ranked WHERE rank <= $k
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
  }

  /** k-core replayed in SQL: a FIXED 12-round peel unroll — idempotent
    * after convergence, and the Spark side asserts convergence within it.
    */
  private val kcoreSql: String = {
    val k = 80; val rounds = 12
    val chain = (1 to rounds).map { i =>
      s"""e$i AS MATERIALIZED (
         |  SELECT e${i - 1}.s, e${i - 1}.t FROM e${i - 1}
         |  JOIN r${i - 1} a ON a.s = e${i - 1}.s
         |  JOIN r${i - 1} b ON b.s = e${i - 1}.t),
         |d$i AS MATERIALIZED (SELECT s, count(*) AS c FROM e$i GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT s FROM d$i WHERE c >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH ok AS (
       |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) <= 1000
       |), co AS (
       |  SELECT DISTINCT a.l_partkey::BIGINT AS u, b.l_partkey::BIGINT AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  JOIN ok ON ok.l_orderkey = a.l_orderkey
       |), e0 AS MATERIALIZED (
       |  SELECT u AS s, v AS t FROM co UNION ALL SELECT v, u FROM co),
       |d0 AS MATERIALIZED (SELECT s, count(*) AS c FROM e0 GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT s FROM d0 WHERE c >= $k),
       |$chain
       |SELECT s AS part_id, c::BIGINT AS deg FROM d$rounds WHERE c >= $k
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
  }

  /** Streaming IVF assignment = the batch final assignment (af). */
  private val ivfAssignAllSql: String =
    s"""${ivfTrainCtes(8, 3, 64)}
       |SELECT vec_id::BIGINT AS vec_id, cid::BIGINT AS cid FROM af
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** Cluster-balanced sampling: the same Lloyd's assignment (af), then at
    * most 30 per cluster by the md5 hash rank domainCap uses.
    */
  private val clusterCapSql: String =
    s"""${ivfTrainCtes(8, 3, 64)},
       |rk AS (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY cid
       |    ORDER BY ('0x'||substr(md5(vec_id::VARCHAR),1,15))::BIGINT,
       |      vec_id) AS r
       |  FROM af
       |)
       |SELECT vec_id::BIGINT AS vec_id, cid::BIGINT AS cid FROM rk
       |WHERE r <= 30
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  /** SemDeDup replayed in SQL: the same Lloyd's training + final
    * assignment, then exact within-cluster pairwise cosine at tau.
    */
  private val semanticSql: String = {
    val (nlist, iters, dim, tau) = (8, 3, 64, 0.42)
    s"""${ivfTrainCtes(nlist, iters, dim)},
       |pairs AS (
       |  SELECT la.vec_id AS a, lb.vec_id AS b,
       |    list_cosine_similarity(ea.v, eb.v) AS cos0
       |  FROM af la JOIN af lb ON la.cid = lb.cid AND la.vec_id < lb.vec_id
       |    JOIN e ea ON ea.vec_id = la.vec_id
       |    JOIN e eb ON eb.vec_id = lb.vec_id)
       |SELECT a::BIGINT AS a, b::BIGINT AS b, round(cos0, 4) AS cos
       |FROM pairs WHERE cos0 >= $tau
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
  }

  /** mm_decode replayed in SQL: payload = UTF-8 bytes of `text`, so
    * `md5(text)` in DuckDB equals the codec's md5 over payload bytes, and —
    * the documents corpus being ASCII — `ord(text[i]) % 16` equals the
    * codec's per-byte histogram bucket. The f0 component goes through a REAL
    * cast to replay the codec's Float truncation before rounding.
    */
  private val mmDecodeSql: String =
    """WITH ch AS (
      |  SELECT doc_id, ord(text[i]) % 16 AS b
      |  FROM documents CROSS JOIN UNNEST(range(1, len(text) + 1)) AS t(i)),
      |h AS (SELECT doc_id, b, count(*)::DOUBLE AS c FROM ch GROUP BY doc_id, b),
      |n AS (
      |  SELECT doc_id, greatest(sqrt(sum(c * c)), 1e-9) AS nrm,
      |    coalesce(sum(CASE WHEN b = 0 THEN c END), 0.0) AS c0
      |  FROM h GROUP BY doc_id),
      |m AS (
      |  SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hh
      |  FROM documents)
      |SELECT d.doc_id::BIGINT AS media_id,
      |  (m.hh % 1920 + 32)::INT AS width,
      |  ((m.hh // 1920) % 1080 + 32)::INT AS height,
      |  round(coalesce((n.c0 / n.nrm)::REAL::DOUBLE, 0.0), 4) AS f0
      |FROM documents d JOIN m ON m.doc_id = d.doc_id
      |  LEFT JOIN n ON n.doc_id = d.doc_id
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin

  val all: Map[String, String] = Map(
    "dd_simhash" -> simhashSql,
    "dd_simhash_pairs" -> simhashPairsSql,
    // streaming LSH near-dup emits exactly the batch band join's pairs
    "stream_simhash_pairs" -> simhashPairsSql,
    // conjunctive FTS: same tokenizer, same integer tf-sum score.
    "fts_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  WHERE term IN ('window', 'merge', 'scan') GROUP BY 1, 2)
        |SELECT doc_id::BIGINT AS doc, sum(tf)::BIGINT AS score
        |FROM p GROUP BY 1 HAVING count(*) = 3
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // ANALYZED FTS: the analyzer stages come from Analyzer.duckCtes — the
    // SAME generated SQL text Spark executes, over both the corpus tokens
    // (st*) and the query terms (qs*); conjunctive match on the stems.
    "fts_stem" -> {
      s"""WITH toks AS (
         |  SELECT doc_id AS doc, unnest(list_filter(
         |    string_split_regex(lower(trim(text)), '\\W+'),
         |    x -> length(x) > 0)) AS term
         |  FROM documents),
         |${graft.pipeline.Analyzer.duckCtes("toks", "st")},
         |qraw AS (SELECT 0 AS doc, lower(term) AS term FROM (VALUES
         |  ('scanning'), ('merges'), ('sorted')) v(term)),
         |${graft.pipeline.Analyzer.duckCtes("qraw", "qs")},
         |p AS (
         |  SELECT doc, term, count(*)::BIGINT AS tf FROM st5
         |  WHERE term IN (SELECT term FROM qs5) GROUP BY 1, 2)
         |SELECT doc::BIGINT AS doc, sum(tf)::BIGINT AS score
         |FROM p GROUP BY 1
         |HAVING count(*) = (SELECT count(DISTINCT term) FROM qs5)
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
    },
    // ranked FTS: same integer idf weighting (// is DuckDB integer div);
    // N interpolated as a subquery over documents.
    "fts_rank" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  WHERE term IN ('window', 'merge', 'scan') GROUP BY 1, 2),
        |d AS (SELECT term, count(*)::BIGINT AS df_t FROM p GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM documents)
        |SELECT doc_id::BIGINT AS doc,
        |  sum(tf * ((nn.n * 1000000) // df_t))::BIGINT AS score
        |FROM p JOIN d USING (term) CROSS JOIN nn
        |GROUP BY 1
        |ORDER BY 2 DESC, 1 ASC
        |LIMIT 10""".stripMargin,
    // BM25 FTS: integer idf (// integer division) times the rational
    // length normalization in the IDENTICAL association as the Spark
    // expression — cast//×/÷/+ and floor are all exact or correctly
    // rounded IEEE, so the per-term integer contributions match
    // bit-for-bit and the integer sum is order-free.
    "fts_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |ap AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |dls AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM ap GROUP BY 1),
        |st AS (SELECT (SELECT count(*)::BIGINT FROM documents) AS n,
        |              (SELECT sum(dl)::BIGINT FROM dls) AS total),
        |hits AS (SELECT * FROM ap WHERE term IN ('window', 'merge', 'scan')),
        |dft AS (SELECT term, count(*)::BIGINT AS df_t FROM hits GROUP BY 1),
        |sc AS (
        |  SELECT h.doc_id,
        |    CAST(floor(
        |      CAST((st.n * 1000000) // d.df_t AS DOUBLE)
        |        * (CAST(h.tf AS DOUBLE) * (2.2)::DOUBLE)
        |        / (CAST(h.tf AS DOUBLE) + (1.2)::DOUBLE * ((0.25)::DOUBLE
        |            + (0.75)::DOUBLE * CAST(l.dl AS DOUBLE)
        |              * CAST(st.n AS DOUBLE) / CAST(st.total AS DOUBLE)))
        |        * (1000000.0)::DOUBLE) AS BIGINT) AS c_i
        |  FROM hits h JOIN dft d USING (term) JOIN dls l USING (doc_id)
        |  CROSS JOIN st)
        |SELECT doc_id::BIGINT AS doc, sum(c_i)::BIGINT AS score
        |FROM sc GROUP BY 1
        |ORDER BY 2 DESC, 1 ASC
        |LIMIT 10""".stripMargin,
    // Hybrid retrieval: the fts_bm25 leg (k=20, ranked score DESC / doc
    // ASC) fused with the brute-cosine leg for query vector 0 (k=20) by
    // reciprocal-rank fusion — 1/(60+rank) per leg in the SAME fold
    // order as the Spark expression, absent legs contributing 0.
    "ret_hybrid_rrf" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |ap AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |dls AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM ap GROUP BY 1),
        |st AS (SELECT (SELECT count(*)::BIGINT FROM documents) AS n,
        |              (SELECT sum(dl)::BIGINT FROM dls) AS total),
        |hits AS (SELECT * FROM ap WHERE term IN ('window', 'merge', 'scan')),
        |dft AS (SELECT term, count(*)::BIGINT AS df_t FROM hits GROUP BY 1),
        |sc AS (
        |  SELECT h.doc_id,
        |    CAST(floor(
        |      CAST((st.n * 1000000) // d.df_t AS DOUBLE)
        |        * (CAST(h.tf AS DOUBLE) * (2.2)::DOUBLE)
        |        / (CAST(h.tf AS DOUBLE) + (1.2)::DOUBLE * ((0.25)::DOUBLE
        |            + (0.75)::DOUBLE * CAST(l.dl AS DOUBLE)
        |              * CAST(st.n AS DOUBLE) / CAST(st.total AS DOUBLE)))
        |        * (1000000.0)::DOUBLE) AS BIGINT) AS c_i
        |  FROM hits h JOIN dft d USING (term) JOIN dls l USING (doc_id)
        |  CROSS JOIN st),
        |bm AS (
        |  SELECT doc_id::BIGINT AS doc, sum(c_i)::BIGINT AS score
        |  FROM sc GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 20),
        |tleg AS (
        |  SELECT doc, row_number() OVER (ORDER BY score DESC, doc ASC)::INT
        |    AS rank_text FROM bm),
        |e AS ($embDouble),
        |vs AS (
        |  SELECT c.vec_id AS doc,
        |    row_number() OVER (ORDER BY
        |      list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC)::INT
        |      AS rank_vec
        |  FROM (SELECT v FROM e WHERE vec_id = 0) q
        |  JOIN e c ON c.vec_id <> 0),
        |vleg AS (SELECT doc, rank_vec FROM vs WHERE rank_vec <= 20),
        |fused AS (
        |  SELECT COALESCE(t.doc, v.doc) AS doc, t.rank_text, v.rank_vec,
        |    COALESCE(1.0::DOUBLE / (60.0::DOUBLE + t.rank_text::DOUBLE),
        |      0.0::DOUBLE)
        |    + COALESCE(1.0::DOUBLE / (60.0::DOUBLE + v.rank_vec::DOUBLE),
        |      0.0::DOUBLE) AS rrf0
        |  FROM tleg t FULL OUTER JOIN vleg v ON t.doc = v.doc)
        |SELECT doc, rank_text, rank_vec, round(rrf0, 6) AS rrf
        |FROM (SELECT * FROM fused ORDER BY rrf0 DESC, doc ASC LIMIT 10) z
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    // prefix FTS: LIKE replays the sargable term range (lowercase tokens,
    // so 's%' ≡ term >= 's' AND term < 't').
    "fts_prefix" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  WHERE term LIKE 's%' GROUP BY 1, 2)
        |SELECT doc_id::BIGINT AS doc, count(*)::BIGINT AS n_terms,
        |  sum(tf)::BIGINT AS score
        |FROM p GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // fuzzy FTS: DuckDB's levenshtein is the same standard edit distance;
    // the length band is implied by the distance bound.
    "fts_fuzzy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  WHERE levenshtein(term, 'sow') <= 1 GROUP BY 1, 2)
        |SELECT doc_id::BIGINT AS doc, count(*)::BIGINT AS n_terms,
        |  sum(tf)::BIGINT AS score
        |FROM p GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // OR FTS: same tokenizer, IN without a HAVING gate.
    "fts_or" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  WHERE term IN ('window', 'merge') GROUP BY 1, 2)
        |SELECT doc_id::BIGINT AS doc, count(*)::BIGINT AS n_terms,
        |  sum(tf)::BIGINT AS score
        |FROM p GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // boolean FTS: conjunctive must (HAVING count = 2) minus docs holding
    // the excluded term (anti-join as NOT IN over a deduped doc set).
    "fts_boolean" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  WHERE term IN ('merge', 'scan') GROUP BY 1, 2),
        |ex AS (
        |  SELECT DISTINCT doc_id FROM toks WHERE term = 'window')
        |SELECT doc_id::BIGINT AS doc, sum(tf)::BIGINT AS score
        |FROM p WHERE doc_id NOT IN (SELECT doc_id FROM ex)
        |GROUP BY 1 HAVING count(*) = 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // wildcard FTS: LIKE 'w%ow' replays the prefix-range + LIKE verify.
    "fts_wildcard" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
        |  WHERE term LIKE 'w%ow' GROUP BY 1, 2)
        |SELECT doc_id::BIGINT AS doc, count(*)::BIGINT AS n_terms,
        |  sum(tf)::BIGINT AS score
        |FROM p GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // phrase search: positional self-join, 1-based DuckDB positions align
    // with Spark's 0-based ones through the same RELATIVE offset.
    // Proximity: both terms' position lists pair within |Δpos| <= 3.
    "fts_near" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0) AS toks
        |  FROM documents),
        |pp AS (
        |  SELECT doc_id, i AS pos, toks[i] AS term
        |  FROM t CROSS JOIN UNNEST(range(1, len(toks) + 1)) r(i)),
        |m AS (
        |  SELECT a.doc_id FROM pp a
        |  JOIN pp b ON b.doc_id = a.doc_id AND abs(a.pos - b.pos) <= 3
        |  WHERE a.term = 'window' AND b.term = 'scan')
        |SELECT doc_id::BIGINT AS doc, count(*)::BIGINT AS n_matches
        |FROM m GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // add-one bigram LM replayed in SQL: integer-rational contributions
    // (floor(1e6·(c2+1)/(c1+V))) make the per-doc sum order-free
    "txt_lm" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0) AS toks
        |  FROM documents),
        |pp AS (
        |  SELECT doc_id, i AS pos, toks[i] AS term
        |  FROM t CROSS JOIN UNNEST(range(1, len(toks) + 1)) r(i)),
        |bi AS (
        |  SELECT a.doc_id AS doc, a.term AS w1, b.term AS w2
        |  FROM pp a JOIN pp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT term AS w1, count(*)::BIGINT AS c1 FROM pp GROUP BY 1),
        |vv AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM pp),
        |sc AS (
        |  SELECT bi.doc,
        |    floor((c2.c2 + 1) * 1000000.0 / (c1.c1 + vv.v))::BIGINT AS s
        |  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv)
        |SELECT doc::BIGINT AS doc, count(*)::BIGINT AS n_bigrams,
        |  sum(s)::BIGINT AS total,
        |  round(sum(s)::DOUBLE / count(*), 4) AS fluency
        |FROM sc GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "txt_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id AS doc, term, count(*)::BIGINT AS tf
        |  FROM toks GROUP BY 1, 2),
        |dft AS (SELECT term, count(*)::BIGINT AS df_t FROM p GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        |ranked AS (
        |  SELECT p.doc, p.term, p.tf * (nn.n * 1000000 // dft.df_t) AS w,
        |    row_number() OVER (PARTITION BY p.doc
        |      ORDER BY p.tf * (nn.n * 1000000 // dft.df_t) DESC,
        |        p.term ASC) AS rank
        |  FROM p JOIN dft USING (term) CROSS JOIN nn)
        |SELECT doc::BIGINT AS doc, term, w::BIGINT AS w, rank::BIGINT AS rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    "fts_autocomplete" ->
      """SELECT entity, label FROM (
        |  SELECT 'urn:graft/part/' || CAST(p_partkey AS VARCHAR) AS entity,
        |         p_name AS label
        |  FROM part
        |  WHERE p_name >= 'sm' AND p_name < 'sn'
        |) t ORDER BY label, entity LIMIT 25""".stripMargin,
    "fts_mlt" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id AS doc, term, count(*)::BIGINT AS tf
        |  FROM toks GROUP BY 1, 2),
        |dft AS (SELECT term, count(*)::BIGINT AS df_t FROM p GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        |intr AS (
        |  SELECT p.term, (nn.n * 1000000 // dft.df_t)::BIGINT AS idf
        |  FROM p JOIN dft USING (term) CROSS JOIN nn
        |  WHERE p.doc = 0
        |  ORDER BY p.tf * (nn.n * 1000000 // dft.df_t) DESC, p.term ASC
        |  LIMIT 8),
        |ranked AS (
        |  SELECT p.doc::BIGINT AS doc, sum(intr.idf)::BIGINT AS score,
        |    count(*)::BIGINT AS n_shared
        |  FROM p JOIN intr USING (term) WHERE p.doc <> 0
        |  GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 10)
        |SELECT doc, score, n_shared FROM ranked
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "fts_facets" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS term
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, term FROM toks
        |  WHERE term IN ('window', 'merge') GROUP BY 1, 2),
        |m AS (SELECT doc_id FROM p GROUP BY 1 HAVING count(*) = 2)
        |SELECT d.source, count(*)::BIGINT AS n
        |FROM m JOIN documents d ON d.doc_id = m.doc_id
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "fts_highlight" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0) AS toks
        |  FROM documents),
        |pp AS (
        |  SELECT doc_id, i - 1 AS pos, toks[i] AS term
        |  FROM t CROSS JOIN UNNEST(range(1, len(toks) + 1)) r(i))
        |SELECT doc_id::BIGINT AS doc, term, pos::BIGINT AS pos
        |FROM pp WHERE term IN ('window', 'merge')
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "fts_phrase" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0) AS toks
        |  FROM documents),
        |pp AS (
        |  SELECT doc_id, i AS pos, toks[i] AS term
        |  FROM t CROSS JOIN UNNEST(range(1, len(toks) + 1)) r(i)),
        |m AS (
        |  SELECT a.doc_id FROM pp a
        |  JOIN pp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  WHERE a.term = 'window' AND b.term = 'join')
        |SELECT doc_id::BIGINT AS doc, count(*)::BIGINT AS n_matches
        |FROM m GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "prof_quantiles" ->
      """WITH v AS (
        |  SELECT length(text)::DOUBLE AS v FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT v, row_number() OVER (ORDER BY v ASC) AS r, count(*) OVER () AS n
        |  FROM v
        |)
        |SELECT t.q::DOUBLE AS q, r.v AS value
        |FROM r JOIN (VALUES (0.5), (0.9), (0.99)) t(q)
        |  ON r.r = ceil(t.q::DOUBLE * r.n)::INT
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "prof_column_stats" ->
      """SELECT * FROM (
        |  SELECT 'n_nationkey' AS "column", (count(*) - count(n_nationkey))::BIGINT AS nulls,
        |    count(DISTINCT n_nationkey)::BIGINT AS n_distinct,
        |    min(n_nationkey)::VARCHAR AS min_val, max(n_nationkey)::VARCHAR AS max_val
        |  FROM nation
        |  UNION ALL
        |  SELECT 'n_name', (count(*) - count(n_name))::BIGINT,
        |    count(DISTINCT n_name)::BIGINT, min(n_name), max(n_name) FROM nation
        |  UNION ALL
        |  SELECT 'n_regionkey', (count(*) - count(n_regionkey))::BIGINT,
        |    count(DISTINCT n_regionkey)::BIGINT,
        |    min(n_regionkey)::VARCHAR, max(n_regionkey)::VARCHAR FROM nation
        |)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    // streaming dedup: the replayed slice is dropped → original counts.
    "stream_dedup" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  count(DISTINCT event_id)::BIGINT AS n_ids
        |FROM events GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "smp_split" -> {
      val bs = graft.pipeline.Sampling.splitBounds(
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val cases = bs.map { case (name, hi) =>
        s"WHEN h < ${hi}::BIGINT THEN '$name'"
      }.mkString(" ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS h
         |  FROM documents)
         |SELECT CASE $cases END AS split,
         |  count(*)::BIGINT AS n, min(doc_id)::BIGINT AS first_id
         |FROM h GROUP BY 1
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin
    },
    "dd_decontam" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\W+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-2),
        |    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]))) AS gram
        |  FROM t WHERE len(toks) >= 4
        |), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        |SELECT g.doc_id::BIGINT AS doc_id, count(*)::BIGINT AS hit_grams
        |FROM g JOIN bench USING (gram) WHERE g.doc_id % 50 <> 0
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "dd_substring" ->
      """WITH t AS (
        |  SELECT doc_id::BIGINT AS doc, list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0) AS tk
        |  FROM documents
        |), wins AS (
        |  SELECT doc, i::BIGINT AS s, array_to_string(tk[i+1 : i+8], ' ') AS gram
        |  FROM t, unnest(range(len(tk) - 7)) AS u(i)
        |  WHERE len(tk) >= 8
        |), dup AS (
        |  SELECT gram FROM wins GROUP BY gram HAVING count(DISTINCT doc) >= 2
        |), hits AS (
        |  SELECT w.doc, w.s, w.s + 8 AS e FROM wins w JOIN dup USING (gram)
        |), marked AS (
        |  SELECT doc, s, e, max(e) OVER (PARTITION BY doc ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM hits
        |), grp AS (
        |  SELECT doc, s, e, sum(CASE WHEN pmax IS NULL OR s > pmax
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY doc ORDER BY s, e) AS g
        |  FROM marked
        |)
        |SELECT doc AS doc_id, min(s)::BIGINT AS span_start,
        |  max(e)::BIGINT AS span_end
        |FROM grp GROUP BY doc, g
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // within-doc repeated-span trim: the gram's FIRST in-doc occurrence
    // survives, later occurrences mark [s, s+3); marks merge per doc;
    // kept = the token stream minus merged spans, n_trimmed their length.
    "dd_trim_spans" ->
      """WITH t AS (
        |  SELECT doc_id::BIGINT AS doc, list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0) AS tk
        |  FROM documents
        |), wins AS (
        |  SELECT doc, i::BIGINT AS s, array_to_string(tk[i+1 : i+3], ' ') AS gram
        |  FROM t, unnest(range(len(tk) - 2)) AS u(i)
        |  WHERE len(tk) >= 3
        |), dups AS (
        |  SELECT doc, s, s + 3 AS e FROM (
        |    SELECT doc, s, min(s) OVER (PARTITION BY doc, gram) AS f0
        |    FROM wins) w WHERE s > f0
        |), marked AS (
        |  SELECT doc, s, e, max(e) OVER (PARTITION BY doc ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM dups
        |), grp AS (
        |  SELECT doc, s, e, sum(CASE WHEN pmax IS NULL OR s > pmax
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY doc ORDER BY s, e) AS g
        |  FROM marked
        |), spans AS (
        |  SELECT doc, min(s) AS ss, max(e) AS se FROM grp GROUP BY doc, g
        |), toks AS (
        |  SELECT doc, i::BIGINT AS i, tk[i+1] AS tok
        |  FROM t, unnest(range(len(tk))) AS u(i)
        |), kept AS (
        |  SELECT p.doc, coalesce(string_agg(p.tok, ' ' ORDER BY p.i), '') AS kept
        |  FROM toks p
        |  WHERE NOT EXISTS (SELECT 1 FROM spans m
        |    WHERE m.doc = p.doc AND p.i >= m.ss AND p.i < m.se)
        |  GROUP BY p.doc
        |), trimmed AS (
        |  SELECT doc, sum(se - ss)::BIGINT AS n_trimmed FROM spans GROUP BY doc
        |)
        |SELECT t.doc AS doc_id, coalesce(k.kept, '') AS kept,
        |  coalesce(tr.n_trimmed, 0)::BIGINT AS n_trimmed
        |FROM t LEFT JOIN kept k ON k.doc = t.doc
        |LEFT JOIN trimmed tr ON tr.doc = t.doc
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "smp_importance" ->
      """WITH tk AS (
        |  SELECT doc_id::BIGINT AS doc, lang,
        |    ('0x'||substr(md5(u.tok),1,15))::BIGINT % 64 AS b
        |  FROM documents, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS u(tok)
        |), rc AS (SELECT b, count(*)::BIGINT AS rc FROM tk GROUP BY 1),
        |tc AS (SELECT b, count(*)::BIGINT AS tc FROM tk
        |       WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT sum(rc) FROM rc) AS rn,
        |               (SELECT sum(tc) FROM tc) AS tn),
        |wt AS (
        |  SELECT g.b,
        |    ((coalesce(tc, 0) + 1)::HUGEINT * (rn + 64)::HUGEINT * 1000000)
        |      // ((tn + 64)::HUGEINT * (coalesce(rc, 0) + 1)::HUGEINT) AS w
        |  FROM range(64) g(b)
        |  LEFT JOIN rc ON rc.b = g.b
        |  LEFT JOIN tc ON tc.b = g.b, tot
        |)
        |SELECT tk.doc AS doc_id, (sum(w) // count(*))::BIGINT AS score
        |FROM tk JOIN wt ON tk.b = wt.b
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "stream_decontam" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\W+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-2),
        |    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]))) AS gram
        |  FROM t WHERE len(toks) >= 4
        |), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        |SELECT g.doc_id::BIGINT AS doc_id, count(*)::BIGINT AS hit_grams
        |FROM g JOIN bench USING (gram) WHERE g.doc_id % 50 <> 0
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "smp_domain_cap" ->
      """WITH r AS (
        |  SELECT source, doc_id, row_number() OVER (PARTITION BY source
        |    ORDER BY ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT, doc_id) AS rk
        |  FROM documents)
        |SELECT source, doc_id::BIGINT AS doc_id FROM r WHERE rk <= 10
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Temperature quotas: isqrt weights, HUGEINT integer division, the
    // shared md5 hash rank — every step engine-portable.
    "smp_temperature" ->
      """WITH c AS (
        |  SELECT source, floor(sqrt(count(*)::DOUBLE))::BIGINT AS w
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(w)::HUGEINT AS ws FROM c),
        |q AS (SELECT source, (60::HUGEINT * w) // ws AS quota FROM c, t),
        |r AS (
        |  SELECT source, doc_id, row_number() OVER (PARTITION BY source
        |    ORDER BY ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT r.source, doc_id::BIGINT AS doc_id
        |FROM r JOIN q ON r.source = q.source
        |WHERE rk <= quota
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "txt_vocab" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\W+'),
        |    x -> length(x) > 0)) AS token
        |  FROM documents
        |), c AS (
        |  SELECT token, count(*)::BIGINT AS n FROM t GROUP BY 1
        |  ORDER BY 2 DESC, 1 LIMIT 50)
        |SELECT token, n FROM c
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "txt_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT AS tok
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, source, coalesce(sum(tok) OVER (PARTITION BY source
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0)::BIGINT AS tok_start
        |  FROM t)
        |SELECT doc_id::BIGINT AS doc_id, source, tok_start,
        |  floor(tok_start / 512.0)::BIGINT AS seq
        |FROM s
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "smp_stratified" ->
      """WITH s AS (
        |  SELECT event_type, event_id
        |  FROM events
        |  WHERE ('0x'||substr(md5(event_id::VARCHAR),1,15))::BIGINT <
        |    -- floor = Scala's Double.toLong truncation (args positive)
        |    CASE event_type
        |      WHEN 'click' THEN floor(0.1 * 1152921504606846976.0)::BIGINT
        |      WHEN 'view' THEN floor(0.05 * 1152921504606846976.0)::BIGINT
        |      WHEN 'purchase' THEN floor(1.0 * 1152921504606846976.0)::BIGINT
        |      ELSE -1 END
        |)
        |SELECT event_type, count(*)::BIGINT AS n, min(event_id)::BIGINT AS first_id
        |FROM s GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "sk_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT ('0x'||substr(md5(o_custkey::VARCHAR),1,15))::BIGINT AS h
        |  FROM orders WHERE o_custkey IS NOT NULL
        |), k AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |s AS (SELECT count(*) AS n, max(h) AS kth FROM k)
        |SELECT (CASE WHEN n < 256 THEN n
        |         ELSE floor(255.0 * 1152921504606846976.0 / kth) END)::BIGINT AS est,
        |  kth::BIGINT AS kth
        |FROM s""".stripMargin,
    // streaming row-level SHACL = the same per-quad predicates in SQL
    "stream_shacl" ->
      """SELECT s, p, value, component FROM (
        |  SELECT 'urn:graft/events/' || CAST(event_id AS VARCHAR) AS s,
        |    'urn:graft/events#value' AS p, CAST(value AS VARCHAR) AS value,
        |    'sh:MaxInclusiveConstraintComponent' AS component
        |  FROM events WHERE NOT (value <= 100.0)
        |  UNION ALL
        |  SELECT 'urn:graft/events/' || CAST(event_id AS VARCHAR),
        |    'urn:graft/events#event_type', event_type,
        |    'sh:InConstraintComponent'
        |  FROM events
        |  WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    // epoch-day-bucket cohorts: period = floor(epoch_micros / 7 days)
    "evt_retention" ->
      """WITH pe AS (
        |  SELECT user_id, event_type,
        |    (epoch_us(ts) // (7::BIGINT * 86400 * 1000000))::BIGINT AS p
        |  FROM events),
        |a AS (
        |  SELECT user_id, min(p) AS cohort FROM pe
        |  WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, p FROM pe)
        |SELECT a.cohort, (act.p - a.cohort)::BIGINT AS "offset",
        |  count(*)::BIGINT AS n_users
        |FROM a JOIN act USING (user_id)
        |WHERE act.p >= a.cohort
        |GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // greedy-earliest funnel anchors replayed stage by stage
    "evt_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT s1.user_id, s1.t1, min(e.ts) AS t2
        |  FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id
        |    AND e.event_type = 'click' AND e.ts >= s1.t1
        |  GROUP BY 1, 2),
        |s3 AS (
        |  SELECT s2.user_id, s2.t1, s2.t2, min(e.ts) AS t3
        |  FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
        |    AND e.event_type = 'purchase' AND e.ts >= s2.t2
        |  GROUP BY 1, 2, 3)
        |SELECT user_id::BIGINT AS user_id, t1, t2, t3 FROM s3
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    // half-open 14-day containment replayed as a plain theta join
    "j9_interval_join" ->
      """SELECT a.o_orderkey::BIGINT AS a_id, b.o_orderkey::BIGINT AS b_id
        |FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderdate >= b.o_orderdate
        |  AND a.o_orderdate < b.o_orderdate + INTERVAL 14 DAY
        |  AND a.o_orderkey <> b.o_orderkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // as-of semantics replayed with DuckDB's native ASOF LEFT JOIN; the
    // 2-hour tolerance nulls stale matches after the pick
    "j8_asof_join" ->
      """WITH r AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |l AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT l.event_id::BIGINT AS event_id, l.user_id::BIGINT AS user_id,
        |  (CASE WHEN l.ts - r.ts <= INTERVAL 2 HOUR THEN r.click_id
        |   END)::BIGINT AS click_id
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // the streaming as-of equals the batch as-of — same ASOF oracle
    "stream_asof" ->
      """WITH r AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |l AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT l.event_id::BIGINT AS event_id, l.user_id::BIGINT AS user_id,
        |  (CASE WHEN l.ts - r.ts <= INTERVAL 2 HOUR THEN r.click_id
        |   END)::BIGINT AS click_id
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // z-order round-trip is lossless → the range query re-derives from the
    // source table directly
    "lay_zorder" ->
      """SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
        |  value::DOUBLE AS value
        |FROM events
        |WHERE user_id BETWEEN 100 AND 300 AND value BETWEEN 10.0 AND 50.0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "sk_salted_agg" ->
      """SELECT l_returnflag, SUM(l_quantity) AS l_quantity_sum,
        |  COUNT(l_quantity)::BIGINT AS l_quantity_count,
        |  MAX(l_extendedprice) AS l_extendedprice_max
        |FROM lineitem GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "gx_pagerank" -> pagerankSql,
    "gx_rdfrank" -> rdfRankSql,
    "sim_doc_search" -> simSearchSql,
    "sim_vec_search" -> simVecSql,
    "sim_doc_mlt" -> simMltSql,
    // psi predication search: nation vectors are {region edge, name
    // literal}; region-mates of nation 0 score round(1/2, 4), everyone
    // else shares no predication and never enters the candidate set.
    "sim_pred_search" ->
      """SELECT 'urn:graft/nation/'||n2.n_nationkey AS ent,
        |  0.5::DOUBLE AS score
        |FROM nation n1 JOIN nation n2
        |  ON n2.n_regionkey = n1.n_regionkey
        | AND n2.n_nationkey <> n1.n_nationkey
        |WHERE n1.n_nationkey = 0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "fts_luc" -> lucSql,
    "fts_luc_wild" -> lucWildSql,
    "fts_luc_score" -> lucScoreSql,
    "fts_luc_stem" -> lucStemSql,
    "gx_pathsearch" -> pathSearchAllSql,
    "gx_pathsearch_pattern" -> pathSearchPatternSql,
    "gx_shortestpath" -> pathShortestSql,
    "gx_pathdist" -> pathDistSql,
    "sim_knn_lsh" -> knnLshSql,
    "sim_knn_ivf" -> knnIvfSql,
    "sim_knn_pq" -> knnPqSql,
    "sim_knn_ivfpq" -> knnIvfPqSql,
    "stream_pq_code" -> pqEncodeAllSql,
    "dd_semantic" -> semanticSql,
    "gx_kcore" -> kcoreSql,
    "stream_ivf_assign" -> ivfAssignAllSql,
    "smp_cluster_cap" -> clusterCapSql,
    // the persisted-index probe is bit-identical to the ad-hoc IVF path
    // (same deterministic training, same probe arithmetic) — one oracle
    "sim_knn_ivf_idx" -> knnIvfSql,
    "mm_decode" -> mmDecodeSql,
    // the text is ASCII (length == octet_length asserted by construction),
    // so ord(char) == the UTF-8 payload byte and the sparse histogram join
    // reproduces the dense integer dot product exactly
    "mm_knn" ->
      """WITH b AS (
        |  SELECT doc_id, ord(substr(text, CAST(i AS INT) + 1, 1)) % 16 AS bucket
        |  FROM documents, unnest(range(length(text))) AS t(i)
        |), h AS (
        |  SELECT doc_id, bucket, count(*)::BIGINT AS c FROM b GROUP BY 1, 2
        |), p AS (
        |  SELECT q.doc_id AS qid, d.doc_id AS doc,
        |         SUM(q.c * d.c)::BIGINT AS score
        |  FROM h q JOIN h d ON q.bucket = d.bucket
        |  WHERE q.doc_id < 3 AND d.doc_id <> q.doc_id
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT qid, doc, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc)
        |      AS rank
        |  FROM p)
        |SELECT qid, doc, score, rank::BIGINT AS rank FROM r WHERE rank <= 5
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    "s2_scan" -> "SELECT c_name FROM customer ORDER BY 1 NULLS FIRST",
    "p1_projection" ->
      "SELECT c_name, c_mktsegment FROM customer ORDER BY 1 NULLS FIRST, 2 NULLS FIRST",
    "p3_extend" ->
      """SELECT l_orderkey::BIGINT AS l_orderkey, l_linenumber::INT AS l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "p4_filter_range" ->
      """SELECT c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 1000.0 AND c_acctbal < 5000.0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "p6_exists" ->
      """SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "p7_not_exists" ->
      """SELECT n_name FROM nation
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM supplier JOIN region ON nation.n_regionkey = r_regionkey
        |  WHERE s_nationkey = nation.n_nationkey AND r_name = 'EUROPE')
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "j1_star_bgp" ->
      "SELECT p_name, p_brand, p_type FROM part ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST",
    "j2_chain_join" ->
      """SELECT c_name, n_name, r_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "j3_optional" ->
      """SELECT c_name, o_orderkey::BIGINT AS o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders
        |  ON o_custkey = c_custkey AND o_totalprice > 450000.0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "j4_minus" ->
      """SELECT n_name FROM nation
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM supplier JOIN region ON nation.n_regionkey = r_regionkey
        |  WHERE s_nationkey = nation.n_nationkey AND r_name = 'ASIA')
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "j5_values" ->
      """SELECT c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "j6_theta_join" ->
      """SELECT s_name, c_name, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "a1_count_all" ->
      """SELECT (
        |  (SELECT COUNT(r_regionkey)+COUNT(r_name)+COUNT(*) FROM region) +
        |  (SELECT COUNT(n_nationkey)+COUNT(n_name)+COUNT(n_regionkey)+COUNT(*) FROM nation) +
        |  (SELECT COUNT(c_custkey)+COUNT(c_name)+COUNT(c_nationkey)+COUNT(c_acctbal)+COUNT(c_mktsegment)+COUNT(*) FROM customer) +
        |  (SELECT COUNT(s_suppkey)+COUNT(s_name)+COUNT(s_nationkey)+COUNT(s_acctbal)+COUNT(*) FROM supplier) +
        |  (SELECT COUNT(p_partkey)+COUNT(p_name)+COUNT(p_brand)+COUNT(p_type)+COUNT(p_size)+COUNT(p_retailprice)+COUNT(*) FROM part) +
        |  (SELECT COUNT(o_orderkey)+COUNT(o_custkey)+COUNT(o_orderstatus)+COUNT(o_totalprice)+COUNT(o_orderdate)+COUNT(o_orderpriority)+COUNT(*) FROM orders) +
        |  (SELECT COUNT(l_orderkey)+COUNT(l_partkey)+COUNT(l_suppkey)+COUNT(l_linenumber)+COUNT(l_quantity)+COUNT(l_extendedprice)+COUNT(l_discount)+COUNT(l_tax)+COUNT(l_returnflag)+COUNT(l_linestatus)+COUNT(l_shipdate)+COUNT(*) FROM lineitem) +
        |  (SELECT COUNT(event_id)+COUNT(ts)+COUNT(user_id)+COUNT(event_type)+COUNT(value)+COUNT(props)+COUNT(*) FROM events) +
        |  (SELECT COUNT(doc_id)+COUNT(text)+COUNT(lang)+COUNT(source)+COUNT(n_chars)+COUNT(*) FROM documents) +
        |  (SELECT COUNT(vec_id)+COUNT(label)+COUNT(*) FROM embeddings)
        |)::BIGINT AS n""".stripMargin,
    "a2_group_count" ->
      """SELECT o_orderstatus, COUNT(*)::BIGINT AS n FROM orders
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "a3_stats" ->
      """SELECT l_returnflag, SUM(l_quantity) AS sum_qty, AVG(l_quantity) AS avg_qty,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "a4_count_distinct" ->
      "SELECT COUNT(DISTINCT c_mktsegment)::BIGINT AS n FROM customer",
    "a5_group_concat" ->
      """SELECT n_regionkey::INT AS n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "a6_sample" ->
      """SELECT n_regionkey::INT AS n_regionkey, MIN(n_name) AS sample_name
        |FROM nation GROUP BY n_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "a7_having" ->
      """SELECT o_orderpriority, COUNT(*)::BIGINT AS n FROM orders
        |GROUP BY 1 HAVING COUNT(*) > 500
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "o1_order_limit" ->
      """SELECT o_orderkey::BIGINT AS o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "o3_offset" ->
      """SELECT o_orderkey::BIGINT AS o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10""".stripMargin,
    "o5_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1 NULLS FIRST",
    "u1_union" ->
      """SELECT name FROM (
        |  SELECT c_name AS name FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL SELECT s_name FROM supplier)
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "g1_type_counts" ->
      """SELECT cls, n FROM (
        |  SELECT 'urn:graft/class/customer' AS cls, COUNT(*)::BIGINT AS n FROM customer
        |  UNION ALL SELECT 'urn:graft/class/documents', COUNT(*)::BIGINT FROM documents
        |  UNION ALL SELECT 'urn:graft/class/embeddings', COUNT(*)::BIGINT FROM embeddings
        |  UNION ALL SELECT 'urn:graft/class/events', COUNT(*)::BIGINT FROM events
        |  UNION ALL SELECT 'urn:graft/class/lineitem', COUNT(*)::BIGINT FROM lineitem
        |  UNION ALL SELECT 'urn:graft/class/nation', COUNT(*)::BIGINT FROM nation
        |  UNION ALL SELECT 'urn:graft/class/orders', COUNT(*)::BIGINT FROM orders
        |  UNION ALL SELECT 'urn:graft/class/part', COUNT(*)::BIGINT FROM part
        |  UNION ALL SELECT 'urn:graft/class/region', COUNT(*)::BIGINT FROM region
        |  UNION ALL SELECT 'urn:graft/class/supplier', COUNT(*)::BIGINT FROM supplier)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "g2_graph_count" ->
      """SELECT (COUNT(c_custkey)+COUNT(c_name)+COUNT(c_nationkey)+COUNT(c_acctbal)
        |  +COUNT(c_mktsegment)+COUNT(*))::BIGINT AS n FROM customer""".stripMargin,
    "g3_path_seq" ->
      """SELECT c_custkey::BIGINT AS c_custkey, r_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "g4_path_alt_inv" ->
      """SELECT name FROM (
        |  SELECT c_name AS name FROM customer WHERE c_nationkey = 7
        |  UNION ALL SELECT s_name FROM supplier WHERE s_nationkey = 7)
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "g4_path_zero_or_one" ->
      """WITH hop AS (
        |  SELECT 'urn:graft/customer/' || c_custkey AS src,
        |         'urn:graft/nation/' || c_nationkey AS dst FROM customer
        |  UNION
        |  SELECT 'urn:graft/nation/' || n_nationkey,
        |         'urn:graft/region/' || n_regionkey FROM nation
        |), nodes AS (SELECT src AS n FROM hop UNION SELECT dst FROM hop)
        |SELECT src, dst FROM (
        |  SELECT src, dst FROM hop UNION SELECT n, n FROM nodes)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "g5_path_closure" ->
      """WITH RECURSIVE edge AS (
        |  SELECT 'urn:graft/customer/' || c_custkey AS src,
        |         'urn:graft/nation/' || c_nationkey AS dst FROM customer
        |  UNION
        |  SELECT 'urn:graft/nation/' || n_nationkey,
        |         'urn:graft/region/' || n_regionkey FROM nation
        |), cl AS (
        |  SELECT src, dst FROM edge
        |  UNION
        |  SELECT cl.src, edge.dst FROM cl JOIN edge ON cl.dst = edge.src
        |) SELECT src, dst FROM cl ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "g6_negated_set" ->
      """SELECT s, p, o FROM (
        |  SELECT 'urn:graft/nation/' || n_nationkey AS s,
        |    'urn:graft/nation#n_nationkey' AS p, n_nationkey::VARCHAR AS o FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || n_nationkey,
        |    'urn:graft/nation#n_regionkey', 'urn:graft/region/' || n_regionkey FROM nation)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "g7_ask" ->
      "SELECT EXISTS (SELECT 1 FROM customer WHERE c_acctbal > 9000.0) AS result",
    "sp_select_text" ->
      "SELECT c_name, c_mktsegment FROM customer ORDER BY 1 NULLS FIRST, 2 NULLS FIRST",
    "sp_agg_text" ->
      """SELECT o_orderstatus, COUNT(*)::BIGINT AS n FROM orders
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_filter_text" ->
      """SELECT c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 1000.0 AND c_acctbal < 5000.0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_optional_filter_text" ->
      """SELECT c_name AS cn, o_orderkey::BIGINT AS ok
        |FROM customer LEFT JOIN orders
        |  ON o_custkey = c_custkey AND o_totalprice > c_acctbal * 50.0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_subquery" ->
      """SELECT r_name AS rn, n FROM region JOIN (
        |  SELECT n_regionkey, COUNT(*)::BIGINT AS n FROM nation GROUP BY 1) sub
        |ON r_regionkey = sub.n_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "a3_minmax_str" ->
      """SELECT c_mktsegment AS seg, MIN(c_name) AS mn, MAX(c_name) AS mx
        |FROM customer GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "a4_count_distinct_star" ->
      "SELECT COUNT(DISTINCT c_mktsegment)::BIGINT AS n FROM customer",
    "src_rdfxml" ->
      """SELECT p, n FROM (
        |  SELECT 'urn:graft/nation#n_name' AS p, COUNT(n_name)::BIGINT AS n FROM nation
        |  UNION ALL SELECT 'urn:graft/nation#n_regionkey',
        |    COUNT(n_regionkey)::BIGINT FROM nation)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_agg_expr_text" ->
      """SELECT l_returnflag AS rf, SUM(l_quantity) / COUNT(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_having_agg_text" ->
      """SELECT o_orderstatus AS st, COUNT(*)::BIGINT AS n FROM orders
        |GROUP BY 1 HAVING COUNT(*) > 500
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_bnode_text" ->
      """SELECT c_name, o_totalprice
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE o_totalprice > 400000.0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_from_text" ->
      "SELECT c_name AS v FROM customer ORDER BY 1 NULLS FIRST",
    "sp_from_named_text" ->
      """SELECT g, n FROM (
        |  SELECT 'urn:graft:g:nation' AS g,
        |    (SELECT COUNT(n_nationkey)+COUNT(n_name)+COUNT(n_regionkey)+COUNT(*)
        |     FROM nation)::BIGINT AS n
        |  UNION ALL SELECT 'urn:graft:g:region',
        |    (SELECT COUNT(r_regionkey)+COUNT(r_name)+COUNT(*) FROM region)::BIGINT)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_graph_dataset_empty" -> "SELECT 0::BIGINT AS n",
    "sp_union_subquery" ->
      """SELECT v FROM (
        |  SELECT r_name AS v FROM region
        |  UNION ALL SELECT n_name FROM nation)
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "g4_path_literal_kind" ->
      """SELECT s, o FROM (
        |  SELECT 'urn:graft/nation/' || n_nationkey AS s, n_name AS o FROM nation
        |  UNION SELECT n_name, n_name FROM nation)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "f_exists_expr" ->
      """SELECT n_name AS nn,
        |  CASE WHEN r_name = 'ASIA' THEN 'asian' ELSE 'other' END AS cls
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' OR r_name = 'ASIA'
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "f_exists_having" ->
      """SELECT 'urn:graft/nation/'||c_nationkey AS n, COUNT(*)::BIGINT AS c
        |FROM customer
        |GROUP BY c_nationkey
        |HAVING c_nationkey IN (
        |  SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "f_exists_agg" ->
      """SELECT r_name AS rn,
        |  SUM(CASE WHEN EXISTS (SELECT 1 FROM customer c
        |        WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9900)
        |      THEN 1 ELSE 0 END)::BIGINT AS rich,
        |  COUNT(*)::BIGINT AS total
        |FROM nation n JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "sp_optional_exists_text" ->
      """SELECT n_name AS nn, s_name AS sn
        |FROM nation LEFT JOIN (
        |  SELECT s_nationkey, s_name FROM supplier
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA') s
        |ON s.s_nationkey = n_nationkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_term_equality" ->
      """SELECT x FROM (VALUES ('05'), ('a'), ('urn:graft/region/1')) AS t(x)
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "inf_sameas" ->
      """SELECT p, n FROM (
        |  SELECT 'http://www.w3.org/2002/07/owl#sameAs' AS p, 2::BIGINT AS n
        |  UNION ALL SELECT 'urn:graft/customer#c_nationkey',
        |    (SELECT COUNT(*) FROM customer WHERE c_nationkey = 1)::BIGINT
        |  UNION ALL SELECT 'urn:graft/test#natAlias', 1::BIGINT)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "inf_domain_range" ->
      """SELECT cls, n FROM (
        |  SELECT 'urn:graft/class/agent' AS cls, (SELECT COUNT(*) FROM customer)::BIGINT AS n
        |  UNION ALL SELECT 'urn:graft/class/customer', (SELECT COUNT(*) FROM customer)::BIGINT
        |  UNION ALL SELECT 'urn:graft/class/nation', (SELECT COUNT(*) FROM nation)::BIGINT
        |  UNION ALL SELECT 'urn:graft/class/place',
        |    ((SELECT COUNT(*) FROM nation) + (SELECT COUNT(DISTINCT n_regionkey) FROM nation))::BIGINT
        |  UNION ALL SELECT 'urn:graft/class/region', (SELECT COUNT(DISTINCT n_regionkey) FROM nation)::BIGINT)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "f_strings" ->
      """SELECT p_partkey::BIGINT AS p_partkey, upper(p_name) AS uname,
        |  substring(p_name, 1, 8) AS pfx, length(p_brand)::INT AS blen,
        |  contains(p_name, 'a') AS has_a, starts_with(p_type, 'S') AS starts_s,
        |  regexp_replace(p_type, ' ', '_', 'g') AS repl,
        |  p_brand || '-' || p_type AS cat
        |FROM part ORDER BY 1 NULLS FIRST""".stripMargin,
    "f_numeric" ->
      """SELECT c_custkey::BIGINT AS c_custkey, abs(c_acctbal) AS abs_bal,
        |  round(c_acctbal, 4) AS r4, ceil(c_acctbal)::DOUBLE AS cl,
        |  floor(c_acctbal)::DOUBLE AS fl
        |FROM customer ORDER BY 1 NULLS FIRST""".stripMargin,
    // XPath math: — sqrt correctly rounded IEEE in both engines, pi the
    // shared closest double, pow exact on small integer bases/exponents.
    "f_math" ->
      """SELECT n_nationkey::DOUBLE AS k, sqrt(n_nationkey::DOUBLE) AS sq,
        |  pow(n_nationkey::DOUBLE, 2) AS pw, pi() AS pi
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    // Epoch shuffle: md5 is identical in both engines, so the first
    // shard of the deterministic permutation replays exactly.
    "smp_shuffle" ->
      """SELECT doc_id::BIGINT AS doc_id,
        |  md5('epoch1:'||doc_id) AS k
        |FROM documents
        |ORDER BY 2 NULLS FIRST, 1 NULLS FIRST LIMIT 100""".stripMargin,
    // Custom-ruleset chain: the two-rule derivation composes to the
    // 3-way FK join (distinct — derived facts are a set).
    "inf_custom_rules" ->
      """SELECT DISTINCT
        |  'urn:graft/lineitem/'||l_orderkey||'/'||l_linenumber AS li,
        |  'urn:graft/region/'||n_regionkey AS region
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // JSON-LD i18n literals: datatype = i18n#en_<dir by key parity>.
    "src_jsonld_i18n" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s, n_name AS title,
        |  'https://www.w3.org/ns/i18n#en_'||
        |    (CASE WHEN n_nationkey % 2 = 0 THEN 'ltr' ELSE 'rtl' END) AS dt
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // r15 consistency sections: all_audited violations = FK edges of
    // nations outside region 0 (the audit rule covers region 0 on the
    // closure); no_zero_key = the key-0 nation.
    "inf_consistency" ->
      """SELECT rule, node, other FROM (
        |  SELECT 'all_audited' AS rule,
        |    'urn:graft/nation/'||n_nationkey AS node,
        |    'urn:graft/region/'||n_regionkey AS other
        |  FROM nation WHERE n_regionkey <> 0
        |  UNION ALL
        |  SELECT 'no_zero_key', 'urn:graft/nation/'||n_nationkey, NULL
        |  FROM nation WHERE n_nationkey = 0
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // r15 ruleset grammar: literal-guarded rules + the ground axiom fact
    // (which also gates rule `audited` over every nation FK edge).
    "inf_custom_rules2" ->
      """SELECT s, p, o FROM (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    'http://graft.example/x#isSeven' AS p, 'yes' AS o
        |  FROM nation WHERE n_name = 'NATION_7'
        |  UNION ALL
        |  SELECT 'urn:graft/nation/'||n_nationkey,
        |    'http://graft.example/x#keyZero', 'zero'
        |  FROM nation WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT 'urn:graft/nation/'||n_nationkey,
        |    'http://graft.example/x#audited', 'urn:graft/region/'||n_regionkey
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/cfg', 'http://graft.example/x#flag', 'on'
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // SQL-access views: the SPARQL views expose (nation IRI, balance) and
    // (nation IRI, name); the spark.sql join on the IRI is 1:1 with the
    // raw-key join.
    "sql_view_join" ->
      """SELECT n_name AS nation, count(*)::BIGINT AS cnt,
        |  (SUM(CAST(c_acctbal AS DECIMAL(18,2))))::DOUBLE AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 1000.0
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "f_hash" ->
      """SELECT doc_id::BIGINT AS doc_id, md5(text) AS h_md5, sha256(text) AS h_sha
        |FROM documents ORDER BY 1 NULLS FIRST""".stripMargin,
    "f_datetime" ->
      """SELECT o_orderkey::BIGINT AS o_orderkey, year(o_orderdate)::INT AS y,
        |  month(o_orderdate)::INT AS m, day(o_orderdate)::INT AS d
        |FROM orders ORDER BY 1 NULLS FIRST""".stripMargin,
    // XPath constructor casts: the integer/double lexical parses replay as
    // VARCHAR casts of the same values; boolean is castable only from
    // "0" (k=0) — every other value is an error → NULL; string-of-IRI is
    // the IRI text.
    "f_casts" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  (n_nationkey * 10)::VARCHAR AS i,
        |  ((n_nationkey || '.25')::DOUBLE)::VARCHAR AS d,
        |  CASE WHEN n_nationkey = 0 THEN 'false' END AS b,
        |  'urn:graft/nation/'||n_nationkey AS t,
        |-- r17 xsd:dateTime constructor: the lexical passes through and
        |-- the epoch shadow drives SECONDS
        |  '2024-03-0'||(n_nationkey % 7 + 1)||'T10:30:0'
        |    ||(n_nationkey % 10)||'Z' AS dtv,
        |  (n_nationkey % 10)::BIGINT AS dts
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    // xsd:yearMonthDuration (r18): INTERVAL month arithmetic clamps
    // day-of-month exactly like the engine's XPath month-add; canonical
    // Y/M lexicals recompose from the month count.
    "f_ymduration" ->
      """WITH t AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    n_nationkey::BIGINT AS m
        |  FROM nation)
        |SELECT s,
        |  strftime(TIMESTAMP '2024-01-31 10:00:00' + to_months(m::INT),
        |    '%Y-%m-%dT%H:%M:%S')||'Z' AS adv,
        |  CASE WHEN m = 0 THEN 'P0M' ELSE 'P' ||
        |    CASE WHEN (2*m)//12 > 0
        |      THEN ((2*m)//12)::VARCHAR||'Y' ELSE '' END ||
        |    CASE WHEN (2*m)%12 > 0
        |      THEN ((2*m)%12)::VARCHAR||'M' ELSE '' END
        |  END AS scaled,
        |  m AS ratio,
        |  CASE WHEN m = 0 THEN 'P0M' ELSE '-P' ||
        |    CASE WHEN m//12 > 0 THEN (m//12)::VARCHAR||'Y' ELSE '' END ||
        |    CASE WHEN m%12 > 0 THEN (m%12)::VARCHAR||'M' ELSE '' END
        |  END AS neg,
        |  CASE WHEN m > 12 THEN 'true' ELSE 'false' END AS cmp
        |FROM t ORDER BY 1 NULLS FIRST""".stripMargin,
    // xsd:float promotion (r18): DuckDB REAL is IEEE single precision, so
    // the float-vs-double ordering (rounding direction of k.1) and the
    // float-add lexical (shortest-roundtrip print in both engines) replay
    // exactly.
    "f_float" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  'http://www.w3.org/2001/XMLSchema#float' AS pf,
        |  'http://www.w3.org/2001/XMLSchema#double' AS pd,
        |  n_nationkey::VARCHAR AS ti,
        |  CASE WHEN (n_nationkey||'.1')::REAL::DOUBLE >
        |            (n_nationkey||'.1')::DOUBLE
        |    THEN 'true' ELSE 'false' END AS gt,
        |  ((n_nationkey||'.1')::REAL + 2::REAL)::REAL::VARCHAR AS fl
        |FROM nation ORDER BY 1 NULLS FIRST""".stripMargin,
    // XPath temporal arithmetic (r18): the end instant sits tot seconds
    // past 2024-03-01T00:00:00Z (whole minutes by construction), so every
    // duration column replays as canonical-lexical composition from tot:
    // dateTime−dateTime, its negation, duration add-back, 2× scaling
    // (component carry falls out of recomposing from 2·tot), ÷PT1M as an
    // integer minute count, and a duration comparison.
    "f_duration" ->
      """WITH t AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    n_nationkey::BIGINT * 86400 + ((n_nationkey*7)%24)*3600
        |      + ((n_nationkey*13)%60)*60 AS tot
        |  FROM nation),
        |lex AS (
        |  SELECT s, tot,
        |    CASE WHEN tot = 0 THEN 'PT0S' ELSE 'P' ||
        |      CASE WHEN tot//86400 > 0
        |        THEN (tot//86400)::VARCHAR||'D' ELSE '' END ||
        |      CASE WHEN (tot%86400) > 0 THEN 'T' ||
        |        CASE WHEN (tot%86400)//3600 > 0
        |          THEN ((tot%86400)//3600)::VARCHAR||'H' ELSE '' END ||
        |        CASE WHEN (tot%3600)//60 > 0
        |          THEN ((tot%3600)//60)::VARCHAR||'M' ELSE '' END
        |      ELSE '' END
        |    END AS dl1,
        |    CASE WHEN tot = 0 THEN 'PT0S' ELSE 'P' ||
        |      CASE WHEN (2*tot)//86400 > 0
        |        THEN ((2*tot)//86400)::VARCHAR||'D' ELSE '' END ||
        |      CASE WHEN ((2*tot)%86400) > 0 THEN 'T' ||
        |        CASE WHEN ((2*tot)%86400)//3600 > 0
        |          THEN (((2*tot)%86400)//3600)::VARCHAR||'H' ELSE '' END ||
        |        CASE WHEN ((2*tot)%3600)//60 > 0
        |          THEN (((2*tot)%3600)//60)::VARCHAR||'M' ELSE '' END
        |      ELSE '' END
        |    END AS dl2
        |  FROM t)
        |SELECT s, dl1 AS dl,
        |  CASE WHEN tot = 0 THEN 'PT0S' ELSE '-'||dl1 END AS dneg,
        |  strftime(TIMESTAMP '2024-03-01 00:00:00' + to_seconds(tot),
        |    '%Y-%m-%dT%H:%M:%S')||'Z' AS adv,
        |  dl2 AS scaled,
        |  tot//60 AS ratio,
        |  CASE WHEN tot > 172800 THEN 'true' ELSE 'false' END AS cmp
        |FROM lex
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "f_tz" ->
      """SELECT k, tz, dur FROM (VALUES
        |  ('utc', 'Z', 'PT0S'), ('ist', '+05:30', 'PT5H30M'),
        |  ('pst', '-08:00', '-PT8H'), ('none', '', NULL),
        |  ('zz', '+00:00', 'PT0S'), ('str', NULL, NULL)) AS t(k, tz, dur)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // xsd:time (r18): the constructed lexical passes through STR; the
    // components are the same modular arithmetic that built the lexical;
    // TZ of a tz-less literal is ''; the am/pm comparison replays the
    // UTC normalization (+05:30 subtracts 19800 s before the noon test).
    "f_time" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  lpad((n_nationkey % 24)::VARCHAR, 2, '0')||':'
        |    ||lpad(((n_nationkey*7) % 60)::VARCHAR, 2, '0')||':'
        |    ||lpad(((n_nationkey*13) % 60)::VARCHAR, 2, '0')
        |    ||(CASE n_nationkey % 3 WHEN 0 THEN 'Z' WHEN 1 THEN '+05:30'
        |        ELSE '' END) AS tv,
        |  (n_nationkey % 24)::BIGINT AS h,
        |  ((n_nationkey*7) % 60)::BIGINT AS m,
        |  ((n_nationkey*13) % 60)::BIGINT AS sec,
        |  CASE n_nationkey % 3 WHEN 0 THEN 'Z' WHEN 1 THEN '+05:30'
        |    ELSE '' END AS tz,
        |  CASE WHEN (n_nationkey % 24)*3600 + ((n_nationkey*7) % 60)*60
        |      + ((n_nationkey*13) % 60)
        |      - CASE WHEN n_nationkey % 3 = 1 THEN 19800 ELSE 0 END < 43200
        |    THEN 'am' ELSE 'pm' END AS early
        |FROM nation ORDER BY 1 NULLS FIRST""".stripMargin,
    // Multi-FROM path closure: a→c exists only in the merged dataset.
    "sp_path_multifrom" ->
      """SELECT s, o FROM (VALUES
        |  ('urn:a', 'urn:b'), ('urn:b', 'urn:c'), ('urn:a', 'urn:c'))
        |  AS t(s, o)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // SERVICE: nation⋈region chain where the region hop runs in the
    // registered sub-engine — results equal the plain join.
    "sp_service_text" ->
      """SELECT n_name AS n, r_name AS r
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // SERVICE SILENT: the failing (unregistered) endpoint contributes the
    // unit solution, so the result is exactly the working federation join.
    "sp_service_silent" ->
      """SELECT n_name AS n, r_name AS r
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // SERVICE ?var: only the regions endpoint answers the region-name
    // pattern (the supplier endpoint's sub-solution is empty), so every
    // row carries its IRI.
    "sp_service_var" ->
      """SELECT 'urn:graft:svc:regions' AS ep, n_name AS n, r_name AS r
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // Spec-exact zero-length domain: every n_name literal (non-incident to
    // the n_regionkey path) binds to itself.
    "g5_zero_domain_all" ->
      """SELECT n_name AS x, n_name AS o FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Streamed event quads are visible to SPARQL after the merge.
    "stream_merge_select" ->
      """SELECT event_type AS t, count(*)::BIGINT AS n FROM events GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // rdfs:domain over the streamed delta types each event exactly once
    // (merge SET semantics dedup any re-derivation across batches).
    "stream_merge_infer" ->
      "SELECT count(*)::BIGINT AS n FROM events WHERE event_type IS NOT NULL",
    // streaming custom ruleset: streamed event quads join the STORED
    // customer->nation edges; derived facts are a set, one per event.
    "stream_custom_infer" ->
      """SELECT 'urn:graft/nation/'||c_nationkey AS nation,
        |  count(*)::BIGINT AS n
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // INSERT DATA into two named graphs, ADD DEFAULT (the nation n_name
    // slice) into urn:g2, CLEAR urn:g1: default keeps its quads, urn:g2 has
    // its own 1 + the copied default, urn:g1 is gone.
    "upd_clear_graph" ->
      """WITH nc AS (SELECT count(*)::BIGINT AS c FROM nation)
        |SELECT graph, n FROM (
        |  SELECT 'urn:graft:default' AS graph, c AS n FROM nc
        |  UNION ALL SELECT 'urn:g2', c + 1 FROM nc)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // WITH/USING modify: copy urn:src's objects into urn:dst under <urn:q>,
    // then a WITH-scoped delete removes the "two" row from urn:dst only.
    "upd_with_using" ->
      """SELECT graph, s, v FROM (VALUES
        |  ('urn:src', 'urn:s1', 'one'), ('urn:src', 'urn:s2', 'two'),
        |  ('urn:dst', 'urn:s1', 'one')) AS t(graph, s, v)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // Repo with inference on: every nation subject acquires t:Nation via
    // the rdfs:domain rule → count == |nation|.
    "s4_repo_infer" ->
      """SELECT count(*)::BIGINT AS n FROM nation ORDER BY 1 NULLS FIRST""",
    // Proof plugin: the inferred type of nation/0 explains as rule_domain
    // (2 antecedents: the schema triple + the name triple); the asserted
    // name explains as `explicit` (itself).
    "inf_explain" ->
      """WITH n0 AS (SELECT n_name FROM nation WHERE n_nationkey = 0)
        |SELECT target_o, rule, asub, apred, aobj FROM (
        |  SELECT 'urn:t#Nation' AS target_o, 'rule_domain' AS rule,
        |    'urn:t#name' AS asub,
        |    'http://www.w3.org/2000/01/rdf-schema#domain' AS apred,
        |    'urn:t#Nation' AS aobj
        |  UNION ALL
        |  SELECT 'urn:t#Nation', 'rule_domain', 'urn:graft/nation/0',
        |    'urn:t#name', (SELECT n_name FROM n0)
        |  UNION ALL
        |  SELECT (SELECT n_name FROM n0), 'explicit', 'urn:graft/nation/0',
        |    'urn:t#name', (SELECT n_name FROM n0)
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    // Pseudo-graphs on an inference repo: types are all inferred (explicit
    // 0, implicit N+1 — the sameAs alias node gains the copied name and
    // with it the domain type); names are all asserted (explicit N); the
    // sameAs copy doubles the alias holders (2, 1 without expansion) and
    // adds one name (N+1, N without).
    "s4_pseudo_graphs" ->
      """SELECT view, n FROM (
        |  SELECT 'alias_default' AS view, 2::BIGINT AS n
        |  UNION ALL SELECT 'alias_nosameas', 1
        |  UNION ALL SELECT 'explicit_names', (SELECT count(*) FROM nation)
        |  UNION ALL SELECT 'explicit_types', 0
        |  UNION ALL SELECT 'implicit_types', (SELECT count(*) FROM nation) + 1
        |  UNION ALL SELECT 'names_default', (SELECT count(*) FROM nation) + 1
        |  UNION ALL SELECT 'names_nosameas', (SELECT count(*) FROM nation)
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Update-maintained closure: after DELETE DATA removes the name triples
    // of nations < 10, only the surviving supports keep their entailed type.
    // rejected transactions leave the store unchanged → final state is
    // exactly the one compliant insert (one name per nation)
    "s4_repo_shacl" ->
      """SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS x,
        |  n_name AS n
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // snapshot diff: a '+' REDACTED row and a '-' original row per
    // renamed nation
    "upd_diff" ->
      """SELECT op, s, v FROM (
        |  SELECT '+' AS op,
        |    'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
        |    'REDACTED' AS v
        |  FROM nation WHERE n_name LIKE 'NATION!_1%' ESCAPE '!'
        |  UNION ALL
        |  SELECT '-', 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    n_name
        |  FROM nation WHERE n_name LIKE 'NATION!_1%' ESCAPE '!'
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // GRAPH ?g delete under USING NAMED: only even-graph NATION_1x rows vanish
    // upd_history: epochs replayed relationally — epoch 1 = all names,
    // epoch 2 = names not starting NATION_1 (the DELETE), epoch 3 = +1
    // (the INSERT); feeds are the deleted names ('-') and the one added
    // value ('+').
    "upd_history" ->
      """WITH names AS (SELECT n_name AS v FROM nation)
        |SELECT 'epoch' AS kind, 1 AS k, NULL::VARCHAR AS op,
        |  NULL::VARCHAR AS v, count(*)::BIGINT AS n FROM names
        |UNION ALL
        |SELECT 'epoch', 2, NULL, NULL,
        |  (SELECT count(*) FROM names WHERE NOT starts_with(v, 'NATION_1'))
        |FROM (VALUES (1))
        |UNION ALL
        |SELECT 'epoch', 3, NULL, NULL,
        |  (SELECT count(*) FROM names WHERE NOT starts_with(v, 'NATION_1')) + 1
        |FROM (VALUES (1))
        |UNION ALL
        |SELECT 'feed12', 2, '-', v, NULL::BIGINT FROM names
        |  WHERE starts_with(v, 'NATION_1')
        |UNION ALL
        |SELECT 'feed23', 3, '+', 'EXTRA', NULL::BIGINT FROM (VALUES (1))
        |UNION ALL
        |SELECT 'sfeed12', 2, '-', v, NULL::BIGINT FROM names
        |  WHERE starts_with(v, 'NATION_1')
        |UNION ALL
        |SELECT 'sfeed23', 3, '+', 'EXTRA', NULL::BIGINT FROM (VALUES (1))
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "upd_graph_var" ->
      """SELECT CASE WHEN n_nationkey % 2 = 0 THEN 'urn:g/even'
        |       ELSE 'urn:g/odd' END AS graph,
        |  'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
        |  n_name AS n
        |FROM nation
        |WHERE NOT (n_nationkey % 2 = 0 AND n_name LIKE 'NATION!_1%' ESCAPE '!')
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // Req.22 rewrite: point-in-rectangle membership re-derived from the
    // modular coordinate construction
    "geo_rewrite" ->
      """SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s
        |FROM nation
        |WHERE (n_nationkey % 10) BETWEEN 4 AND 9
        |  AND (n_nationkey % 7) BETWEEN 0 AND 4
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    // RDF/XML round-trip: the triple set re-derived from the source table
    "snk_trig" ->
      """SELECT CASE WHEN n_nationkey % 2 = 1 THEN 'urn:g/odd'
        |            ELSE 'urn:graft:default' END AS graph,
        |       s, p, v FROM (
        |  SELECT n_nationkey,
        |    'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
        |    'urn:graft/nation#n_nationkey' AS p,
        |    CAST(n_nationkey AS VARCHAR) AS v
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_name', n_name
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_regionkey',
        |    'urn:graft/region/' || CAST(n_regionkey AS VARCHAR)
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
        |    'urn:graft/class/nation'
        |  FROM nation
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    // JSON-LD round-trips term-exactly — same relational expectation as
    // the RDF/XML sink
    "snk_jsonld" ->
      """SELECT s, p, v, dt FROM (
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
        |    'urn:graft/nation#n_nationkey' AS p,
        |    CAST(n_nationkey AS VARCHAR) AS v,
        |    'http://www.w3.org/2001/XMLSchema#integer' AS dt
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_name', n_name, NULL
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_regionkey',
        |    'urn:graft/region/' || CAST(n_regionkey AS VARCHAR), NULL
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
        |    'urn:graft/class/nation', NULL
        |  FROM nation
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    "snk_rdfxml" ->
      """SELECT s, p, v, dt FROM (
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
        |    'urn:graft/nation#n_nationkey' AS p,
        |    CAST(n_nationkey AS VARCHAR) AS v,
        |    'http://www.w3.org/2001/XMLSchema#integer' AS dt
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_name', n_name, NULL
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_regionkey',
        |    'urn:graft/region/' || CAST(n_regionkey AS VARCHAR), NULL
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
        |    'urn:graft/class/nation', NULL
        |  FROM nation
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    "s4_repo_update_infer" ->
      """SELECT 'urn:graft/nation/' || n_nationkey AS x FROM nation
        |WHERE n_nationkey >= 10 ORDER BY 1 NULLS FIRST""".stripMargin,
    // Streaming twin of the same discipline: the tombstone batch retracts
    // the asserted names of nations < 10 and their entailments with them.
    "stream_retract_infer" ->
      """SELECT 'urn:graft/nation/' || n_nationkey AS x FROM nation
        |WHERE n_nationkey >= 10 ORDER BY 1 NULLS FIRST""".stripMargin,
    // Dedup keep-list: drop every doc whose component representative (min
    // reachable id over the symmetric ≥0.5-Jaccard dup graph) is smaller.
    "dd_dedup_keep" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\W+') AS toks
        |        FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
        |    greatest(len(list_distinct(a.s || b.s)), 1)::DOUBLE, 4) >= 0.5),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
        |drops AS (
        |  SELECT src FROM (SELECT src, min(dst) AS rep FROM reach GROUP BY src)
        |  WHERE rep < src)
        |SELECT doc_id::BIGINT AS doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT src FROM drops)
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    // JSON-LD: named-graph names + default-graph region links (the second
    // top-level node's region value is {"@id": …} only — one quad per row).
    "src_jsonld" ->
      """WITH nc AS (SELECT count(*)::BIGINT AS c FROM nation)
        |SELECT graph, n FROM (
        |  SELECT 'urn:graft/g/names' AS graph, c AS n FROM nc
        |  UNION ALL SELECT 'urn:graft:default', c FROM nc)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // @list chain walk + @type coercions: first/second are the two list
    // elements, reg is the IRI-coerced region string, key the typed int.
    // JSON-LD @graph routing: parity decides the named graph; the context
    // default language tags every name "en".
    "src_jsonld_v11" ->
      """SELECT s, p, v FROM (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |         'urn:graft/nation#n_name' AS p, n_name AS v FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/'||n_nationkey,
        |         'urn:graft/nation#n_regionkey',
        |         'urn:graft/region/'||n_regionkey FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/probe',
        |         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'noexp:X'
        |  UNION ALL
        |  SELECT 'urn:graft/inc/'||n_nationkey, 'urn:graft/nation#stats',
        |         '{"a":"'||n_name||'","b":'||n_nationkey||'}' FROM nation
        |) t
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "src_jsonld_graph" ->
      """SELECT CASE WHEN n_nationkey % 2 = 0 THEN 'urn:graft/g/even'
        |    ELSE 'urn:graft/g/odd' END AS g,
        |  n_name AS n, 'en' AS l
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "src_jsonld_list" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  n_name AS first, 'k'||n_nationkey AS second,
        |  'urn:graft/region/'||n_regionkey AS reg,
        |  n_nationkey::VARCHAR AS key
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    // JSON-LD framing round-trip: the framed-then-reparsed triple set is
    // exactly the input set (nation type/name/key/region + region
    // type/rname), rebuilt here straight from the nation table.
    "src_jsonld_frame" ->
      """SELECT s, p, v FROM (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
        |    'urn:graft/Nation' AS v FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/'||n_nationkey, 'urn:graft/name',
        |    n_name FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/'||n_nationkey, 'urn:graft/key',
        |    n_nationkey::VARCHAR FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/'||n_nationkey, 'urn:graft/region',
        |    'urn:graft/region/'||n_regionkey FROM nation
        |  UNION ALL
        |  SELECT DISTINCT 'urn:graft/region/'||n_regionkey,
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
        |    'urn:graft/Region' FROM nation
        |  UNION ALL
        |  SELECT DISTINCT 'urn:graft/region/'||n_regionkey,
        |    'urn:graft/rname', 'R'||n_regionkey FROM nation
        |) t
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "geo_distance" ->
      """WITH pts AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey % 10))::DOUBLE AS lon,
        |    ('53.'||(n_nationkey % 7))::DOUBLE AS lat
        |  FROM nation
        |), c AS (SELECT ('-6.2603')::DOUBLE AS lon2, ('53.3498')::DOUBLE AS lat2)
        |SELECT s, round(
        |  (2.0 * 6371008.8) * asin(sqrt(
        |    sin((lat2*(pi()/180.0) - lat*(pi()/180.0)) / 2.0)
        |      * sin((lat2*(pi()/180.0) - lat*(pi()/180.0)) / 2.0)
        |    + cos(lat*(pi()/180.0)) * cos(lat2*(pi()/180.0))
        |      * (sin((lon2*(pi()/180.0) - lon*(pi()/180.0)) / 2.0)
        |         * sin((lon2*(pi()/180.0) - lon*(pi()/180.0)) / 2.0)))), 3) AS d
        |FROM pts, c
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // sfWithin is now the exact ray-cast for POINT-in-POLYGON; for this
    // axis-aligned rectangle the half-open crossing rule reduces to a
    // half-open box: minx <= lon < maxx, miny <= lat < maxy.
    "geo_within" ->
      """SELECT s FROM (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey % 10))::DOUBLE AS lon,
        |    ('53.'||(n_nationkey % 7))::DOUBLE AS lat
        |  FROM nation)
        |WHERE lon >= (-6.5)::DOUBLE AND lon < (-6.0)::DOUBLE
        |  AND lat >= (53.0)::DOUBLE AND lat < (53.4)::DOUBLE
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    // sfIntersects/sfDisjoint: a point intersects the band iff its lon is
    // inside the clip (lat always inside 52..54 here); disjoint = NOT.
    "geo_intersects" ->
      """SELECT s,
        |  CASE WHEN lon >= (-6.4)::DOUBLE AND lon <= (-6.2)::DOUBLE
        |    THEN 'true' ELSE 'false' END AS hit,
        |  CASE WHEN lon >= (-6.4)::DOUBLE AND lon <= (-6.2)::DOUBLE
        |    THEN 'false' ELSE 'true' END AS miss
        |FROM (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey % 10))::DOUBLE AS lon
        |  FROM nation)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // Point-in-polygon: DuckDB replays the IDENTICAL IEEE crossing count
    // over the polygon's edge list — (bx-ax)*(lat-ay)/(by-ay)+ax with the
    // same association as SparqlFunctions.pointInRing, so the parity is
    // bit-exact, shape-agnostic, and needs no per-shape case analysis.
    // holed polygon = axis-aligned rectangle minus rectangle: membership
    // replays as two BETWEEN tests (no crossing formula needed; every
    // point is off both boundaries by construction)
    "geo_holes_within" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s FROM nation
        |WHERE ('-6.'||(n_nationkey % 10))::DOUBLE BETWEEN -6.85 AND -6.05
        |  AND ('53.'||(n_nationkey % 7))::DOUBLE BETWEEN 52.95 AND 53.65
        |  AND NOT (
        |    ('-6.'||(n_nationkey % 10))::DOUBLE BETWEEN -6.65 AND -6.25
        |    AND ('53.'||(n_nationkey % 7))::DOUBLE BETWEEN 53.15 AND 53.45)
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "geo_holes_sjoin" ->
      """SELECT 0::BIGINT AS aid, c_custkey::BIGINT AS pid
        |FROM customer
        |WHERE ('-6.'||(c_custkey % 10))::DOUBLE BETWEEN -6.85 AND -6.05
        |  AND ('53.'||(c_custkey % 7))::DOUBLE BETWEEN 52.95 AND 53.65
        |  AND NOT (
        |    ('-6.'||(c_custkey % 10))::DOUBLE BETWEEN -6.65 AND -6.25
        |    AND ('53.'||(c_custkey % 7))::DOUBLE BETWEEN 53.15 AND 53.45)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "geo_polygon" ->
      """WITH pts AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey % 10))::DOUBLE AS lon,
        |    ('53.'||(n_nationkey % 7))::DOUBLE AS lat
        |  FROM nation),
        |edges(ax, ay, bx, byy) AS (VALUES
        |  ((-6.55)::DOUBLE, (52.95)::DOUBLE, (-6.15)::DOUBLE, (52.95)::DOUBLE),
        |  ((-6.15)::DOUBLE, (52.95)::DOUBLE, (-6.15)::DOUBLE, (53.25)::DOUBLE),
        |  ((-6.15)::DOUBLE, (53.25)::DOUBLE, (-6.35)::DOUBLE, (53.25)::DOUBLE),
        |  ((-6.35)::DOUBLE, (53.25)::DOUBLE, (-6.35)::DOUBLE, (53.55)::DOUBLE),
        |  ((-6.35)::DOUBLE, (53.55)::DOUBLE, (-6.55)::DOUBLE, (53.55)::DOUBLE),
        |  ((-6.55)::DOUBLE, (53.55)::DOUBLE, (-6.55)::DOUBLE, (52.95)::DOUBLE)),
        |cr AS (
        |  SELECT p.s, sum(CASE WHEN (e.ay > p.lat) != (e.byy > p.lat)
        |      AND p.lon < (e.bx - e.ax) * (p.lat - e.ay) / (e.byy - e.ay) + e.ax
        |    THEN 1 ELSE 0 END) AS c
        |  FROM pts p CROSS JOIN edges e GROUP BY p.s)
        |SELECT s FROM cr WHERE c % 2 = 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // Polygon join: same crossing-count replay per (region polygon, customer
    // point) pair; the grid cells are internal to the Spark plan.
    "geo_polygon_sjoin" ->
      """WITH pts AS (
        |  SELECT c_custkey::BIGINT AS pid,
        |    ('-6.'||(c_custkey % 10))::DOUBLE AS lon,
        |    ('53.'||(c_custkey % 7))::DOUBLE AS lat
        |  FROM customer),
        |poly AS (
        |  SELECT r_regionkey::BIGINT AS aid,
        |    ('-6.'||r_regionkey||'5')::DOUBLE AS xr,
        |    ('-6.'||(r_regionkey + 2)||'5')::DOUBLE AS xm,
        |    ('-6.'||(r_regionkey + 4)||'5')::DOUBLE AS xl
        |  FROM region),
        |edges AS (
        |  SELECT aid, xl AS ax, (52.95)::DOUBLE AS ay, xr AS bx, (52.95)::DOUBLE AS byy FROM poly
        |  UNION ALL SELECT aid, xr, (52.95)::DOUBLE, xr, (53.25)::DOUBLE FROM poly
        |  UNION ALL SELECT aid, xr, (53.25)::DOUBLE, xm, (53.25)::DOUBLE FROM poly
        |  UNION ALL SELECT aid, xm, (53.25)::DOUBLE, xm, (53.55)::DOUBLE FROM poly
        |  UNION ALL SELECT aid, xm, (53.55)::DOUBLE, xl, (53.55)::DOUBLE FROM poly
        |  UNION ALL SELECT aid, xl, (53.55)::DOUBLE, xl, (52.95)::DOUBLE FROM poly),
        |cr AS (
        |  SELECT e.aid, p.pid, sum(CASE WHEN (e.ay > p.lat) != (e.byy > p.lat)
        |      AND p.lon < (e.bx - e.ax) * (p.lat - e.ay) / (e.byy - e.ay) + e.ax
        |    THEN 1 ELSE 0 END) AS c
        |  FROM pts p CROSS JOIN edges e GROUP BY e.aid, p.pid)
        |SELECT aid, pid FROM cr WHERE c % 2 = 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Polygon-in-polygon: the squares sit at .d2/.d8 offsets and the L at
    // .x5, so no boundary contact exists and the exact vertex+crossing test
    // reduces to interval logic over the L's two rectangles (lower arm
    // x<=-6.15 for y<=53.25; left arm x<=-6.35 above) — a semantic replay,
    // like geo_intersects' band membership.
    "geo_poly_within" ->
      """SELECT s FROM (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey%10)||'8')::DOUBLE AS x1,
        |    ('-6.'||(n_nationkey%10)||'2')::DOUBLE AS x2,
        |    ('53.'||(n_nationkey%7)||'2')::DOUBLE AS y1,
        |    ('53.'||(n_nationkey%7)||'8')::DOUBLE AS y2
        |  FROM nation)
        |WHERE x1 >= (-6.55)::DOUBLE AND y1 >= (52.95)::DOUBLE
        |  AND y2 <= (53.55)::DOUBLE
        |  AND CASE WHEN y2 <= (53.25)::DOUBLE THEN x2 <= (-6.15)::DOUBLE
        |      ELSE x2 <= (-6.35)::DOUBLE END
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    // DE-9IM subset: inter/over replay as open-interval overlap with the
    // L's two rectangles (no boundary contact by construction); over =
    // inter minus the within cases (containment of L in a square is
    // impossible); eq/tch replay as the parameter conditions that define
    // the rotated-equal square (d=3,e=6) and the shared-edge rectangle
    // (d=4,e=0); crosses is identically false for point/area families.
    "geo_poly_relate" ->
      """WITH q AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    n_nationkey % 10 AS d, n_nationkey % 7 AS e,
        |    ('-6.'||(n_nationkey%10)||'8')::DOUBLE AS x1,
        |    ('-6.'||(n_nationkey%10)||'2')::DOUBLE AS x2,
        |    ('53.'||(n_nationkey%7)||'2')::DOUBLE AS y1,
        |    ('53.'||(n_nationkey%7)||'8')::DOUBLE AS y2
        |  FROM nation),
        |f AS (
        |  SELECT s, d, e,
        |    ((x1 < (-6.15)::DOUBLE AND (-6.55)::DOUBLE < x2
        |        AND y1 < (53.25)::DOUBLE AND (52.95)::DOUBLE < y2)
        |     OR (x1 < (-6.35)::DOUBLE AND (-6.55)::DOUBLE < x2
        |        AND y1 < (53.55)::DOUBLE AND (53.25)::DOUBLE < y2)) AS it,
        |    (x1 >= (-6.55)::DOUBLE AND y1 >= (52.95)::DOUBLE
        |      AND y2 <= (53.55)::DOUBLE
        |      AND CASE WHEN y2 <= (53.25)::DOUBLE THEN x2 <= (-6.15)::DOUBLE
        |          ELSE x2 <= (-6.35)::DOUBLE END) AS win
        |  FROM q)
        |SELECT s,
        |  CASE WHEN it THEN 'true' ELSE 'false' END AS inter,
        |  CASE WHEN it AND NOT win THEN 'true' ELSE 'false' END AS over,
        |  CASE WHEN d = 3 AND e = 6 THEN 'true' ELSE 'false' END AS eq,
        |  CASE WHEN d = 4 AND e = 0 THEN 'true' ELSE 'false' END AS tch,
        |  'false' AS crs
        |FROM f
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    // Negated set with an inverse member: forward not-tag = the `in`
    // edges, reverse not-in = inverted tag edges; union of both.
    "g6_negated_inverse" ->
      """SELECT x, y FROM (
        |  SELECT 'urn:g/n'||n_nationkey AS x, 'urn:g/r'||n_regionkey AS y
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:g/t'||(n_nationkey%3), 'urn:g/n'||n_nationkey
        |  FROM nation)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // RCC8/Egenhofer classification: tpp/ntpp/ec/cov/cont hold exactly for
    // the d=3 squares (strip shares the x edges, the big box strictly
    // contains, the adjacent strip shares x=-6.32), po for d=2 (proper
    // crossings into the adjacent strip), dc for every other digit.
    "geo_rcc8" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  CASE WHEN n_nationkey%10=3 THEN 'true' ELSE 'false' END AS tpp,
        |  CASE WHEN n_nationkey%10=3 THEN 'true' ELSE 'false' END AS ntpp,
        |  CASE WHEN n_nationkey%10=3 THEN 'true' ELSE 'false' END AS ec,
        |  CASE WHEN n_nationkey%10=2 THEN 'true' ELSE 'false' END AS po,
        |  CASE WHEN n_nationkey%10 IN (2,3) THEN 'false' ELSE 'true' END AS dc,
        |  CASE WHEN n_nationkey%10=3 THEN 'true' ELSE 'false' END AS cov,
        |  CASE WHEN n_nationkey%10=3 THEN 'true' ELSE 'false' END AS cont
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST""".stripMargin,
    // Distance-unit conversion replays the haversine then the same
    // fixed-association division; getSRID is the embedded-CRS accessor
    // with the CRS84 default.
    "geo_units" ->
      """WITH pts AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey % 10))::DOUBLE AS lon,
        |    ('53.'||(n_nationkey % 7))::DOUBLE AS lat
        |  FROM nation
        |), c AS (SELECT ('-6.2603')::DOUBLE AS lon2, ('53.3498')::DOUBLE AS lat2),
        |d AS (
        |  SELECT s,
        |    (2.0 * 6371008.8) * asin(sqrt(
        |      sin((lat2*(pi()/180.0) - lat*(pi()/180.0)) / 2.0)
        |        * sin((lat2*(pi()/180.0) - lat*(pi()/180.0)) / 2.0)
        |      + cos(lat*(pi()/180.0)) * cos(lat2*(pi()/180.0))
        |        * (sin((lon2*(pi()/180.0) - lon*(pi()/180.0)) / 2.0)
        |           * sin((lon2*(pi()/180.0) - lon*(pi()/180.0)) / 2.0)))) AS m
        |  FROM pts, c)
        |SELECT s, round(m / 1000.0, 6) AS km, round(m / 1609.344, 6) AS mi,
        |  'http://www.opengis.net/def/crs/OGC/1.3/CRS84' AS srid,
        |  'http://www.opengis.net/def/crs/EPSG/0/4326' AS srid2
        |FROM d
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST""".stripMargin,
    // convexHull returns each square in canonical SW-start CCW form (the
    // interior centroid in the MULTIPOINT variant is dropped), so the hull
    // and the disjoint MULTIPOLYGON union are pure string algebra.
    "geo_hull" ->
      """WITH b AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    '-6.'||(n_nationkey%10)||'8' AS x1, '-6.'||(n_nationkey%10)||'2' AS x2,
        |    '53.'||(n_nationkey%7)||'2' AS y1, '53.'||(n_nationkey%7)||'8' AS y2
        |  FROM nation),
        |r AS (SELECT s,
        |  x1||' '||y1||', '||x2||' '||y1||', '||x2||' '||y2||', '||x1||' '||y2||', '||x1||' '||y1 AS ring
        |  FROM b)
        |SELECT s,
        |  'POLYGON (('||ring||'))' AS h,
        |  'POLYGON (('||ring||'))' AS hm,
        |  'MULTIPOLYGON ((('||ring||')), ((-5.5 50.0, -5.4 50.0, -5.4 50.1, -5.5 50.1, -5.5 50.0)))' AS u
        |FROM r
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    // Sutherland–Hodgman clip vs the fixed strip: a proper rectangle for
    // d=3 (rounded envelope — corner coords can be 1 ulp off), EMPTY else.
    "geo_clip" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  CASE WHEN n_nationkey%10=3 THEN 'false' ELSE 'true' END AS empty,
        |  CASE WHEN n_nationkey%10=3 THEN (-6.35)::DOUBLE END AS minx,
        |  CASE WHEN n_nationkey%10=3
        |    THEN ('53.'||(n_nationkey%7)||'2')::DOUBLE END AS miny,
        |  CASE WHEN n_nationkey%10=3 THEN (-6.32)::DOUBLE END AS maxx,
        |  CASE WHEN n_nationkey%10=3
        |    THEN ('53.'||(n_nationkey%7)||'8')::DOUBLE END AS maxy
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    // Polygon overlay difference: the strip [-6.35,-6.31] clips only the
    // d=3 square (its maxx becomes -6.35); every other square is disjoint
    // and survives verbatim. symDifference with the far square is always
    // a 2-component MULTIPOLYGON ("((" appears twice).
    // dshared (r12): difference against the square sharing the full top
    // edge — interiors disjoint, so the answer is A verbatim, rebuilt here
    // by string algebra from the same digit scheme.
    // GeoSPARQL 1.1 measures: outer 4x3 minus centered 1x1 hole -> area
    // 11, perimeter 14+4, centroid = exact center; 3-4-5 line -> 5.
    "geo_measures" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  11.0::DOUBLE AS area, 18.0::DOUBLE AS perim, 18.0::DOUBLE AS plen,
        |  'POINT ('||((n_nationkey%10)+2)::DOUBLE||' '
        |    ||((n_nationkey%7)+1.5)::DOUBLE||')' AS cw,
        |  5.0::DOUBLE AS llen
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    // Non-point geof:distance: the nearest point of the square to the
    // due-east probe is the right edge at the probe's latitude — the
    // point-pair haversine replays it (round 3 absorbs the planar-foot
    // ulps); self distance is 0.
    "geo_mindist" ->
      """WITH g AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey%10)||'2')::DOUBLE AS x2,
        |    ('53.'||(n_nationkey%7)||'5')::DOUBLE AS ym
        |  FROM nation)
        |SELECT s, round(
        |  (2.0 * 6371008.8) * asin(sqrt(
        |    sin((ym*(pi()/180.0) - ym*(pi()/180.0)) / 2.0)
        |      * sin((ym*(pi()/180.0) - ym*(pi()/180.0)) / 2.0)
        |    + cos(ym*(pi()/180.0)) * cos(ym*(pi()/180.0))
        |      * (sin(((-5.5)*(pi()/180.0) - x2*(pi()/180.0)) / 2.0)
        |         * sin(((-5.5)*(pi()/180.0) - x2*(pi()/180.0)) / 2.0)))), 3)
        |  AS d, 0.0::DOUBLE AS z
        |FROM g
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // Geodesic measures: per-edge haversine + spherical-excess terms over
    // the 4-edge quadrilateral, summed per nation (two of the four area
    // terms are exactly +0.0 — vertical edges — so aggregate order cannot
    // move the rounded result); the LINESTRING is edges 1-2.
    // geof:transform: expected strings from the same key arithmetic —
    // x = (k%10).5, y = (k%7).25; EPSG:4326 carries the <iri> prefix and
    // swaps to lat-lon, the CRS84 round trip restores the bare body.
    "geo_transform" ->
      """WITH n AS (
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
        |    CAST(n_nationkey % 10 AS VARCHAR) || '.5' AS x,
        |    CAST(n_nationkey % 7 AS VARCHAR) || '.25' AS y,
        |    ('-6.2'||(n_nationkey%10))::DOUBLE AS dx,
        |    ('53.3'||(n_nationkey%7))::DOUBLE AS dy
        |  FROM nation),
        |-- EPSG:2157 forward Kruger series, composed TERM-FOR-TERM as the
        |-- engine kernel (TransverseMercator.forward): atanh/sinh/cosh are
        |-- spelled via ln/exp on both sides; constants are the kernel's
        |-- doubles printed at shortest round-trip digits.
        |c1 AS (SELECT s, x, y, dx, dy,
        |  dy*(pi()/180.0) AS phi,
        |  dx*(pi()/180.0) - (-8.0)*(pi()/180.0) AS lam,
        |  dx*(pi()/180.0) - (-9.0)*(pi()/180.0) AS lamu FROM n),
        |c2 AS (SELECT *,
        |  0.5*ln((1.0+sin(phi))/(1.0-sin(phi)))
        |    - 0.08181919104281579*(0.5*ln((1.0+0.08181919104281579*sin(phi))
        |        /(1.0-0.08181919104281579*sin(phi)))) AS u FROM c1),
        |c3 AS (SELECT *, (exp(u)-exp(-u))/2.0 AS t FROM c2),
        |c4 AS (SELECT *, atan2(t, cos(lam)) AS xip,
        |  sin(lam)/sqrt(1.0 + t*t) AS w,
        |  atan2(t, cos(lamu)) AS uxip,
        |  sin(lamu)/sqrt(1.0 + t*t) AS uw FROM c3),
        |c5 AS (SELECT *, 0.5*ln((1.0+w)/(1.0-w)) AS etap,
        |  0.5*ln((1.0+uw)/(1.0-uw)) AS uetap FROM c4),
        |c6 AS (SELECT *,
        |  xip + 8.377318247344344e-4*sin(2.0*xip)*((exp(2.0*etap)+exp(-2.0*etap))/2.0)
        |      + 7.608527788826164e-7*sin(4.0*xip)*((exp(4.0*etap)+exp(-4.0*etap))/2.0)
        |      + 1.1976380191731537e-9*sin(6.0*xip)*((exp(6.0*etap)+exp(-6.0*etap))/2.0)
        |      + 2.443376242510368e-12*sin(8.0*xip)*((exp(8.0*etap)+exp(-8.0*etap))/2.0) AS xi,
        |  etap + 8.377318247344344e-4*cos(2.0*xip)*((exp(2.0*etap)-exp(-2.0*etap))/2.0)
        |       + 7.608527788826164e-7*cos(4.0*xip)*((exp(4.0*etap)-exp(-4.0*etap))/2.0)
        |       + 1.1976380191731537e-9*cos(6.0*xip)*((exp(6.0*etap)-exp(-6.0*etap))/2.0)
        |       + 2.443376242510368e-12*cos(8.0*xip)*((exp(8.0*etap)-exp(-8.0*etap))/2.0) AS eta,
        |  uxip + 8.377318247344344e-4*sin(2.0*uxip)*((exp(2.0*uetap)+exp(-2.0*uetap))/2.0)
        |       + 7.608527788826164e-7*sin(4.0*uxip)*((exp(4.0*uetap)+exp(-4.0*uetap))/2.0)
        |       + 1.1976380191731537e-9*sin(6.0*uxip)*((exp(6.0*uetap)+exp(-6.0*uetap))/2.0)
        |       + 2.443376242510368e-12*sin(8.0*uxip)*((exp(8.0*uetap)+exp(-8.0*uetap))/2.0) AS uxi,
        |  uetap + 8.377318247344344e-4*cos(2.0*uxip)*((exp(2.0*uetap)-exp(-2.0*uetap))/2.0)
        |        + 7.608527788826164e-7*cos(4.0*uxip)*((exp(4.0*uetap)-exp(-4.0*uetap))/2.0)
        |        + 1.1976380191731537e-9*cos(6.0*uxip)*((exp(6.0*uetap)-exp(-6.0*uetap))/2.0)
        |        + 2.443376242510368e-12*cos(8.0*uxip)*((exp(8.0*uetap)-exp(-8.0*uetap))/2.0) AS ueta
        |  FROM c5),
        |-- r17 EPSG:29902 TM65/Irish Grid: GRS80 geodetic->geocentric at
        |-- h=0, the OSi Helmert-7 reversed small-angle (Tm65Datum
        |-- constants, position vector), Bowring one-shot to Airy Modified
        |-- geodetic, then the SAME Krueger series with the Airy Modified
        |-- constants — every step composed term-for-term as the engine.
        |d1 AS (SELECT s, x, y, xi, eta, uxi, ueta, dx, dy, phi, lam,
        |  6378137.0/sqrt(1.0 - 0.006694380022900787*sin(phi)*sin(phi)) AS nug,
        |  dx*(pi()/180.0) AS lamg FROM c6),
        |d2 AS (SELECT *,
        |  nug*cos(phi)*cos(lamg) AS gx,
        |  nug*cos(phi)*sin(lamg) AS gy,
        |  nug*(1.0-0.006694380022900787)*sin(phi) AS gz FROM d1),
        |d3 AS (SELECT *,
        |  -482.530 + (1.0-8.150e-6)*(gx + ((-0.631)*(pi()/648000.0))*gy
        |    - ((-0.214)*(pi()/648000.0))*gz) AS hx,
        |  130.596 + (1.0-8.150e-6)*(-((-0.631)*(pi()/648000.0))*gx + gy
        |    + ((-1.042)*(pi()/648000.0))*gz) AS hy,
        |  -564.557 + (1.0-8.150e-6)*(((-0.214)*(pi()/648000.0))*gx
        |    - ((-1.042)*(pi()/648000.0))*gy + gz) AS hz FROM d2),
        |d4 AS (SELECT *, sqrt(hx*hx + hy*hy) AS pr,
        |  atan2(hz*6377340.189, sqrt(hx*hx + hy*hy)*6356034.447938534) AS th
        |  FROM d3),
        |d5 AS (SELECT *,
        |  atan2(hz + 0.006715334910116594*6356034.447938534
        |          *sin(th)*sin(th)*sin(th),
        |        pr - 0.006670539999985363*6377340.189
        |          *cos(th)*cos(th)*cos(th)) AS phia,
        |  atan2(hy, hx) - (-8.0)*(pi()/180.0) AS lama FROM d4),
        |d6 AS (SELECT *,
        |  0.5*ln((1.0+sin(phia))/(1.0-sin(phia)))
        |    - 0.08167337387414189*(0.5*ln((1.0+0.08167337387414189*sin(phia))
        |        /(1.0-0.08167337387414189*sin(phia)))) AS ua FROM d5),
        |d7 AS (SELECT *, (exp(ua)-exp(-ua))/2.0 AS ta FROM d6),
        |d8 AS (SELECT *, atan2(ta, cos(lama)) AS xipa,
        |  sin(lama)/sqrt(1.0 + ta*ta) AS wa FROM d7),
        |d9 AS (SELECT *, 0.5*ln((1.0+wa)/(1.0-wa)) AS etapa FROM d8),
        |d10 AS (SELECT *,
        |  xipa + 0.0008347451767017189*sin(2.0*xipa)*((exp(2.0*etapa)+exp(-2.0*etapa))/2.0)
        |       + 7.554352878453585e-07*sin(4.0*xipa)*((exp(4.0*etapa)+exp(-4.0*etapa))/2.0)
        |       + 1.184866541509621e-09*sin(6.0*xipa)*((exp(6.0*etapa)+exp(-6.0*etapa))/2.0)
        |       + 2.4086408980891613e-12*sin(8.0*xipa)*((exp(8.0*etapa)+exp(-8.0*etapa))/2.0) AS xia,
        |  etapa + 0.0008347451767017189*cos(2.0*xipa)*((exp(2.0*etapa)-exp(-2.0*etapa))/2.0)
        |        + 7.554352878453585e-07*cos(4.0*xipa)*((exp(4.0*etapa)-exp(-4.0*etapa))/2.0)
        |        + 1.184866541509621e-09*cos(6.0*xipa)*((exp(6.0*etapa)-exp(-6.0*etapa))/2.0)
        |        + 2.4086408980891613e-12*cos(8.0*xipa)*((exp(8.0*etapa)-exp(-8.0*etapa))/2.0) AS etaa
        |  FROM d9),
        |-- r18 EPSG:29903 TM75/Irish Grid: the published TM75 Helmert
        |-- shares the TM65 rotations and scale exactly, so the TM75
        |-- geocentric is the TM65 geocentric plus the constant translation
        |-- delta (the transform is affine in T): (+0.030, +0.004, -0.043).
        |-- The rest of the chain (Bowring + Krueger on Airy Modified)
        |-- replays term-for-term with the shifted coordinates.
        |e3 AS (SELECT *, hx + 0.030 AS kx, hy + 0.004 AS ky,
        |  hz - 0.043 AS kz FROM d10),
        |e4 AS (SELECT *, sqrt(kx*kx + ky*ky) AS pr75,
        |  atan2(kz*6377340.189, sqrt(kx*kx + ky*ky)*6356034.447938534) AS th75
        |  FROM e3),
        |e5 AS (SELECT *,
        |  atan2(kz + 0.006715334910116594*6356034.447938534
        |          *sin(th75)*sin(th75)*sin(th75),
        |        pr75 - 0.006670539999985363*6377340.189
        |          *cos(th75)*cos(th75)*cos(th75)) AS phib,
        |  atan2(ky, kx) - (-8.0)*(pi()/180.0) AS lamb FROM e4),
        |e6 AS (SELECT *,
        |  0.5*ln((1.0+sin(phib))/(1.0-sin(phib)))
        |    - 0.08167337387414189*(0.5*ln((1.0+0.08167337387414189*sin(phib))
        |        /(1.0-0.08167337387414189*sin(phib)))) AS ub FROM e5),
        |e7 AS (SELECT *, (exp(ub)-exp(-ub))/2.0 AS tb FROM e6),
        |e8 AS (SELECT *, atan2(tb, cos(lamb)) AS xipb,
        |  sin(lamb)/sqrt(1.0 + tb*tb) AS wb FROM e7),
        |e9 AS (SELECT *, 0.5*ln((1.0+wb)/(1.0-wb)) AS etapb FROM e8),
        |e10 AS (SELECT *,
        |  xipb + 0.0008347451767017189*sin(2.0*xipb)*((exp(2.0*etapb)+exp(-2.0*etapb))/2.0)
        |       + 7.554352878453585e-07*sin(4.0*xipb)*((exp(4.0*etapb)+exp(-4.0*etapb))/2.0)
        |       + 1.184866541509621e-09*sin(6.0*xipb)*((exp(6.0*etapb)+exp(-6.0*etapb))/2.0)
        |       + 2.4086408980891613e-12*sin(8.0*xipb)*((exp(8.0*etapb)+exp(-8.0*etapb))/2.0) AS xib,
        |  etapb + 0.0008347451767017189*cos(2.0*xipb)*((exp(2.0*etapb)-exp(-2.0*etapb))/2.0)
        |        + 7.554352878453585e-07*cos(4.0*xipb)*((exp(4.0*etapb)-exp(-4.0*etapb))/2.0)
        |        + 1.184866541509621e-09*cos(6.0*xipb)*((exp(6.0*etapb)-exp(-6.0*etapb))/2.0)
        |        + 2.4086408980891613e-12*cos(8.0*xipb)*((exp(8.0*etapb)-exp(-8.0*etapb))/2.0) AS etab
        |  FROM e9)
        |SELECT s,
        |  '<http://www.opengis.net/def/crs/EPSG/0/4326> POINT (' || y ||
        |    ' ' || x || ')' AS to4326,
        |  'POINT (' || x || ' ' || y || ')' AS rt,
        |  'POINT (' || x || ' ' || y || ')' AS same,
        |  round(600000.0 + 6366303.00492481*eta, 3) AS itm_e,
        |  round(750000.0 + 6366303.00492481*(xi - 0.9313409066174532), 3) AS itm_n,
        |  round(dx, 7) AS rt2x,
        |  round(dy, 7) AS rt2y,
        |  round(500000.0 + 6364902.16611274*ueta, 3) AS utm_e,
        |  round(0.0 + 6364902.16611274*(uxi - 0.0), 3) AS utm_n,
        |  round(6378137.0*(dx*(pi()/180.0)), 3) AS wm_x,
        |  round(6378137.0*(0.5*ln((1.0+sin(dy*(pi()/180.0)))
        |    /(1.0-sin(dy*(pi()/180.0))))), 3) AS wm_y,
        |  round(6378137.0*(dx*(pi()/180.0)), 3) AS cr_x,
        |  round(6378137.0*(0.5*ln((1.0+sin(dy*(pi()/180.0)))
        |    /(1.0-sin(dy*(pi()/180.0))))), 3) AS cr_y,
        |  round(200000.0 + 6366914.608831994*etaa, 3) AS ig_e,
        |  round(250000.0 + 6366914.608831994
        |    *(xia - 0.9313495239757993), 3) AS ig_n,
        |  round(dx, 7) AS rt3x,
        |  round(dy, 7) AS rt3y,
        |  round(200000.0 + 6366914.608831994*etaa, 3) AS ci_e,
        |  round(250000.0 + 6366914.608831994
        |    *(xia - 0.9313495239757993), 3) AS ci_n,
        |  round(200000.0 + 6366914.608831994*etab, 3) AS i75_e,
        |  round(250000.0 + 6366914.608831994
        |    *(xib - 0.9313495239757993), 3) AS i75_n,
        |  round(200000.0 + 6366914.608831994*etab, 3) AS c75_e,
        |  round(250000.0 + 6366914.608831994
        |    *(xib - 0.9313495239757993), 3) AS c75_n,
        |  NULL::VARCHAR AS bad
        |FROM e10
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    "geo_geodesic" ->
      """WITH n0 AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.2'||(n_nationkey%10))::DOUBLE AS x1,
        |    ('-6.1'||(n_nationkey%10))::DOUBLE AS x2,
        |    ('53.3'||(n_nationkey%7))::DOUBLE AS y1,
        |    ('53.4'||(n_nationkey%7))::DOUBLE AS y2
        |  FROM nation),
        |edges AS (
        |  SELECT s, i,
        |    CASE i WHEN 1 THEN x1 WHEN 2 THEN x2 WHEN 3 THEN x2 ELSE x1 END AS ax,
        |    CASE i WHEN 1 THEN y1 WHEN 2 THEN y1 WHEN 3 THEN y2 ELSE y2 END AS ay,
        |    CASE i WHEN 1 THEN x2 WHEN 2 THEN x2 WHEN 3 THEN x1 ELSE x1 END AS bx,
        |    CASE i WHEN 1 THEN y1 WHEN 2 THEN y2 WHEN 3 THEN y2 ELSE y1 END AS by
        |  FROM n0, (VALUES (1),(2),(3),(4)) AS e(i)),
        |seg AS (
        |  SELECT s, i,
        |    (2.0*6371008.8)*asin(sqrt(
        |      sin((by*(pi()/180.0) - ay*(pi()/180.0))/2.0)
        |        * sin((by*(pi()/180.0) - ay*(pi()/180.0))/2.0)
        |      + cos(ay*(pi()/180.0))*cos(by*(pi()/180.0))
        |        * (sin((bx*(pi()/180.0) - ax*(pi()/180.0))/2.0)
        |           * sin((bx*(pi()/180.0) - ax*(pi()/180.0))/2.0)))) AS m,
        |    (bx*(pi()/180.0) - ax*(pi()/180.0))
        |      * (2.0 + sin(ay*(pi()/180.0)) + sin(by*(pi()/180.0))) AS at
        |  FROM edges),
        |agg AS (
        |  SELECT s, sum(m) AS perim,
        |    abs(sum(at)) * ((6371008.8*6371008.8)/2.0) AS am2
        |  FROM seg GROUP BY s),
        |line AS (SELECT s, sum(m) AS lm FROM seg WHERE i IN (1,2) GROUP BY s),
        |-- r16 spherical centroid: per-edge vector n*theta (Stokes fold,
        |-- GeoGeodesicCentroid), summed then normalized to lon/lat
        |uv AS (
        |  SELECT s, i,
        |    cos(ay*(pi()/180.0))*cos(ax*(pi()/180.0)) AS ux,
        |    cos(ay*(pi()/180.0))*sin(ax*(pi()/180.0)) AS uy,
        |    sin(ay*(pi()/180.0)) AS uz,
        |    cos(by*(pi()/180.0))*cos(bx*(pi()/180.0)) AS wx,
        |    cos(by*(pi()/180.0))*sin(bx*(pi()/180.0)) AS wy,
        |    sin(by*(pi()/180.0)) AS wz
        |  FROM edges),
        |cr AS (
        |  SELECT s, uy*wz - uz*wy AS cx, uz*wx - ux*wz AS cy,
        |    ux*wy - uy*wx AS cz, ux*wx + uy*wy + uz*wz AS dt
        |  FROM uv),
        |cv AS (
        |  SELECT s, cx, cy, cz,
        |    sqrt(cx*cx + cy*cy + cz*cz) AS cn, dt FROM cr),
        |gv AS (
        |  SELECT s,
        |    sum(cx*(atan2(cn, dt)/cn)) AS vx,
        |    sum(cy*(atan2(cn, dt)/cn)) AS vy,
        |    sum(cz*(atan2(cn, dt)/cn)) AS vz
        |  FROM cv WHERE cn <> 0.0 GROUP BY s)
        |SELECT agg.s AS s, round(am2, 3) AS am2,
        |  round(am2 / (1000.0*1000.0), 6) AS akm2,
        |  round(perim, 3) AS pm, round(lm, 3) AS lm,
        |  round(atan2(vy, vx)/(pi()/180.0), 9) AS gcx,
        |  round(atan2(vz, sqrt(vx*vx + vy*vy))/(pi()/180.0), 9) AS gcy
        |FROM agg JOIN line ON agg.s = line.s JOIN gv ON agg.s = gv.s
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    // makeValid bowtie: triangles (a b, a+1 b+1, a b+2) and
    // (a+1 b+1, a+2 b, a+2 b+2), canonical CCW from the min vertex,
    // members in lexical order (LEAST/GREATEST replays the sort — a=9
    // makes "10.0..." sort before "9.0...").
    "geo_makevalid" ->
      """WITH g AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    (n_nationkey%10)::INT AS a, (n_nationkey%7)::INT AS b
        |  FROM nation),
        |bodies AS (
        |  SELECT s,
        |    '(('||(a)::DOUBLE||' '||(b)::DOUBLE||', '
        |        ||(a+1)::DOUBLE||' '||(b+1)::DOUBLE||', '
        |        ||(a)::DOUBLE||' '||(b+2)::DOUBLE||', '
        |        ||(a)::DOUBLE||' '||(b)::DOUBLE||'))' AS b1,
        |    '(('||(a+1)::DOUBLE||' '||(b+1)::DOUBLE||', '
        |        ||(a+2)::DOUBLE||' '||(b)::DOUBLE||', '
        |        ||(a+2)::DOUBLE||' '||(b+2)::DOUBLE||', '
        |        ||(a+1)::DOUBLE||' '||(b+1)::DOUBLE||'))' AS b2
        |  FROM g)
        |SELECT s, 'MULTIPOLYGON ('||LEAST(b1,b2)||', '||GREATEST(b1,b2)||')'
        |  AS fixed,
        |-- r17: the fully-cancelling spike answers the empty set
        |  'POLYGON EMPTY' AS empt
        |FROM bodies ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "geo_diff" ->
      """WITH bow AS (
        |  SELECT n_nationkey,
        |    '(('||(n_nationkey%10)::DOUBLE||' '||(n_nationkey%7)::DOUBLE||', '
        |      ||(n_nationkey%10+1)::DOUBLE||' '||(n_nationkey%7+1)::DOUBLE||', '
        |      ||(n_nationkey%10+1)::DOUBLE||' '||(n_nationkey%7+3)::DOUBLE||', '
        |      ||(n_nationkey%10)::DOUBLE||' '||(n_nationkey%7+4)::DOUBLE||', '
        |      ||(n_nationkey%10)::DOUBLE||' '||(n_nationkey%7)::DOUBLE||'))'
        |      AS m1,
        |    '(('||(n_nationkey%10+3)::DOUBLE||' '||(n_nationkey%7+1)::DOUBLE||', '
        |      ||(n_nationkey%10+4)::DOUBLE||' '||(n_nationkey%7)::DOUBLE||', '
        |      ||(n_nationkey%10+4)::DOUBLE||' '||(n_nationkey%7+4)::DOUBLE||', '
        |      ||(n_nationkey%10+3)::DOUBLE||' '||(n_nationkey%7+3)::DOUBLE||', '
        |      ||(n_nationkey%10+3)::DOUBLE||' '||(n_nationkey%7+1)::DOUBLE||'))'
        |      AS m2
        |  FROM nation)
        |SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  'POLYGON ((' ||
        |    '-6.'||(n_nationkey%10)||'8 53.'||(n_nationkey%7)||'2, ' ||
        |    '-6.'||(n_nationkey%10)||'2 53.'||(n_nationkey%7)||'2, ' ||
        |    '-6.'||(n_nationkey%10)||'2 53.'||(n_nationkey%7)||'8, ' ||
        |    '-6.'||(n_nationkey%10)||'8 53.'||(n_nationkey%7)||'8, ' ||
        |    '-6.'||(n_nationkey%10)||'8 53.'||(n_nationkey%7)||'2))'
        |    AS dshared,
        |  'POLYGON (('
        |    ||(n_nationkey%10)::DOUBLE||' '||(n_nationkey%7)::DOUBLE||', '
        |    ||(n_nationkey%10+4)::DOUBLE||' '||(n_nationkey%7)::DOUBLE||', '
        |    ||(n_nationkey%10+4)::DOUBLE||' '||(n_nationkey%7+2)::DOUBLE||', '
        |    ||(n_nationkey%10+3)::DOUBLE||' '||(n_nationkey%7+4)::DOUBLE||', '
        |    ||(n_nationkey%10)::DOUBLE||' '||(n_nationkey%7+4)::DOUBLE||', '
        |    ||(n_nationkey%10)::DOUBLE||' '||(n_nationkey%7)::DOUBLE||'))'
        |    AS dxing,
        |-- r18 repair-then-overlay: the self-intersecting bowtie repairs
        |-- to its two even-odd triangles; minus the center square each
        |-- lobe keeps its outer wedge. Each member starts at its numeric
        |-- min vertex (CCW), but the MEMBERS sort as LEXICAL strings
        |-- (serializeMulti's canonical order) — least/greatest replays it.
        |  'MULTIPOLYGON ('||least(bow.m1, bow.m2)||', '
        |    ||greatest(bow.m1, bow.m2)||')' AS dbow,
        |  round(('-6.'||(n_nationkey%10)||'8')::DOUBLE, 6) AS minx,
        |  round(('53.'||(n_nationkey%7)||'2')::DOUBLE, 6) AS miny,
        |  CASE WHEN n_nationkey%10=3 THEN (-6.35)::DOUBLE
        |    ELSE round(('-6.'||(n_nationkey%10)||'2')::DOUBLE, 6) END AS maxx,
        |  round(('53.'||(n_nationkey%7)||'8')::DOUBLE, 6) AS maxy,
        |  2::INT AS ncomp
        |FROM nation JOIN bow USING (n_nationkey)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST, 8 NULLS FIRST""".stripMargin,
    // Polygon×polygon join: band r covers exactly the squares whose x digit
    // is 2r (y always open-overlaps); the grid cells and canonical-cell
    // dedup are internal to the Spark plan.
    "geo_poly_sjoin" ->
      """SELECT n_nationkey::BIGINT AS aid, r_regionkey::BIGINT AS bid
        |FROM nation, region
        |WHERE n_nationkey % 10 = 2 * r_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Multi-geometry predicates: each MULTIPOINT component replays the
    // geo_polygon crossing count against the L's six edges; within = both
    // components odd (forall), intersects = either odd (exists). The
    // envelope POLYGON text rebuilds from least/greatest of the two
    // one-decimal coordinate pairs (double->string rendering agrees for
    // one-decimal values in both engines).
    "geo_multi" ->
      """WITH pts AS (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |    ('-6.'||(n_nationkey % 10))::DOUBLE AS x1,
        |    ('53.'||(n_nationkey % 7))::DOUBLE AS y1,
        |    ('-6.'||((n_nationkey + 5) % 10))::DOUBLE AS x2,
        |    ('53.'||((n_nationkey + 3) % 7))::DOUBLE AS y2
        |  FROM nation),
        |edges(ax, ay, bx, byy) AS (VALUES
        |  ((-6.55)::DOUBLE, (52.95)::DOUBLE, (-6.15)::DOUBLE, (52.95)::DOUBLE),
        |  ((-6.15)::DOUBLE, (52.95)::DOUBLE, (-6.15)::DOUBLE, (53.25)::DOUBLE),
        |  ((-6.15)::DOUBLE, (53.25)::DOUBLE, (-6.35)::DOUBLE, (53.25)::DOUBLE),
        |  ((-6.35)::DOUBLE, (53.25)::DOUBLE, (-6.35)::DOUBLE, (53.55)::DOUBLE),
        |  ((-6.35)::DOUBLE, (53.55)::DOUBLE, (-6.55)::DOUBLE, (53.55)::DOUBLE),
        |  ((-6.55)::DOUBLE, (53.55)::DOUBLE, (-6.55)::DOUBLE, (52.95)::DOUBLE)),
        |cr AS (
        |  SELECT p.s,
        |    sum(CASE WHEN (e.ay > p.y1) != (e.byy > p.y1)
        |        AND p.x1 < (e.bx - e.ax) * (p.y1 - e.ay) / (e.byy - e.ay) + e.ax
        |      THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN (e.ay > p.y2) != (e.byy > p.y2)
        |        AND p.x2 < (e.bx - e.ax) * (p.y2 - e.ay) / (e.byy - e.ay) + e.ax
        |      THEN 1 ELSE 0 END) AS c2
        |  FROM pts p CROSS JOIN edges e GROUP BY p.s)
        |SELECT p.s,
        |  CASE WHEN c1 % 2 = 1 AND c2 % 2 = 1 THEN 'true' ELSE 'false' END AS win,
        |  CASE WHEN c1 % 2 = 1 OR c2 % 2 = 1 THEN 'true' ELSE 'false' END AS inter,
        |  'POLYGON (('
        |    || least(p.x1, p.x2)::VARCHAR || ' ' || least(p.y1, p.y2)::VARCHAR || ', '
        |    || greatest(p.x1, p.x2)::VARCHAR || ' ' || least(p.y1, p.y2)::VARCHAR || ', '
        |    || greatest(p.x1, p.x2)::VARCHAR || ' ' || greatest(p.y1, p.y2)::VARCHAR || ', '
        |    || least(p.x1, p.x2)::VARCHAR || ' ' || greatest(p.y1, p.y2)::VARCHAR || ', '
        |    || least(p.x1, p.x2)::VARCHAR || ' ' || least(p.y1, p.y2)::VARCHAR
        |    || '))' AS env
        |FROM pts p JOIN cr ON p.s = cr.s
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    // Convex buffer: envelope = square grown by exactly 0.01 per side;
    // 36 distinct vertices + the closing point = 37 coordinate pairs.
    // r15 pocket fixtures: the sealed C buffers to ONE ring spanning the
    // grown envelope (the slot fills — nonzero winding); the lipped
    // flask buffers to TWO rings (the unreachable chamber is a hole).
    "geo_pbuffer" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  round(('-6.'||(n_nationkey%10)||'8')::DOUBLE - 0.01, 6) AS minx,
        |  round(('53.'||(n_nationkey%7)||'2')::DOUBLE - 0.01, 6) AS miny,
        |  round(('-6.'||(n_nationkey%10)||'2')::DOUBLE + 0.01, 6) AS maxx,
        |  round(('53.'||(n_nationkey%7)||'8')::DOUBLE + 0.01, 6) AS maxy,
        |  37::INT AS nvert,
        |  round((n_nationkey%10)::DOUBLE - 1.2, 6) AS cminx,
        |  round((n_nationkey%7)::DOUBLE - 1.2, 6) AS cminy,
        |  round((n_nationkey%10)::DOUBLE + 7.2, 6) AS cmaxx,
        |  round((n_nationkey%7)::DOUBLE + 7.2, 6) AS cmaxy,
        |  1::INT AS cnring,
        |  round((n_nationkey%10)::DOUBLE - 0.8, 6) AS fminx,
        |  round((n_nationkey%7)::DOUBLE - 0.8, 6) AS fminy,
        |  round((n_nationkey%10)::DOUBLE + 8.8, 6) AS fmaxx,
        |  round((n_nationkey%7)::DOUBLE + 8.8, 6) AS fmaxy,
        |  2::INT AS fnring,
        |-- r18 swallowed corner (radius 2.5 > the reflex corner's 2-long
        |-- adjacent edges): one ring, envelope grown by exactly r on every
        |-- side (axis-aligned arc endpoints are exact)
        |  round((n_nationkey%10)::DOUBLE - 2.5, 6) AS lminx,
        |  round((n_nationkey%7)::DOUBLE - 2.5, 6) AS lminy,
        |  round((n_nationkey%10)::DOUBLE + 6.5, 6) AS lmaxx,
        |  round((n_nationkey%7)::DOUBLE + 6.5, 6) AS lmaxy,
        |  1::INT AS lnring
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST""".stripMargin,
    // DE-9IM relate patterns: touches iff edge-adjacent (d in 3,4),
    // overlaps iff strict x-overlap (d=3), within iff the square sits
    // right of -6.5 (d <= 4).
    "geo_relate_pat" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  CASE WHEN n_nationkey%10 IN (3,4) THEN 'true' ELSE 'false' END AS t,
        |  CASE WHEN n_nationkey%10 = 3 THEN 'true' ELSE 'false' END AS o,
        |  CASE WHEN n_nationkey%10 <= 4 THEN 'true' ELSE 'false' END AS w
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    // Multi relate: digits d, (d+3)%10. Strip1 [-6.42,-6.38] is
    // edge-adjacent to squares at digits 3 and 4 (touches iff a component
    // digit is 3 or 4 -> d in {0,1,3,4}); strip2 [-6.35,-6.31] strictly
    // overlaps digit 3 only (d in {0,3}); the full-height line at x=-6.35
    // pierces digit-3 squares (d in {0,3}).
    "geo_multi_relate" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  CASE WHEN n_nationkey%10 IN (0,1,3,4) THEN 'true' ELSE 'false' END AS t,
        |  CASE WHEN n_nationkey%10 IN (0,3) THEN 'true' ELSE 'false' END AS o,
        |  CASE WHEN n_nationkey%10 IN (0,3) THEN 'true' ELSE 'false' END AS c
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    // Multi-polygon join: a nation's two squares sit at digits d and
    // (d+3)%10; region band r covers digit 2r only (x-disjoint otherwise,
    // y always overlaps). "Some component intersects" = either digit hits.
    "geo_multi_sjoin" ->
      """SELECT n_nationkey::BIGINT AS aid, r_regionkey::BIGINT AS bid
        |FROM nation, region
        |WHERE n_nationkey % 10 = 2 * r_regionkey
        |   OR (n_nationkey + 3) % 10 = 2 * r_regionkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // LINESTRING relations: the vertical line at x = -6.d3 meets the L
    // exactly for d in 2..5 (through the right arm for 2-3, into the left
    // arm for 4-5); it always pokes out below, so line-within is false
    // everywhere, while the short inside segment is within for the same
    // digits — interval logic, no boundary contact by construction.
    "geo_linestring" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s,
        |  CASE WHEN n_nationkey % 10 IN (2,3,4,5) THEN 'true' ELSE 'false'
        |    END AS crs,
        |  CASE WHEN n_nationkey % 10 IN (2,3,4,5) THEN 'true' ELSE 'false'
        |    END AS inter,
        |  'false' AS win,
        |  CASE WHEN n_nationkey % 10 IN (2,3,4,5) THEN 'true' ELSE 'false'
        |    END AS win2
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    // spatial range join: the grid is internal — the RESULT is the plain
    // bbox join, which DuckDB replays directly.
    "geo_sjoin" ->
      """WITH pts AS (
        |  SELECT n_nationkey::BIGINT AS pid,
        |    ('-6.'||(n_nationkey % 10))::DOUBLE AS lon,
        |    ('53.'||(n_nationkey % 7))::DOUBLE AS lat
        |  FROM nation),
        |areas AS (
        |  SELECT r_regionkey::BIGINT AS aid,
        |    ('-6.'||(r_regionkey * 2 + 1))::DOUBLE AS minx,
        |    (53.0)::DOUBLE AS miny,
        |    ('-6.'||(r_regionkey * 2))::DOUBLE AS maxx,
        |    ('53.'||(r_regionkey + 1))::DOUBLE AS maxy
        |  FROM region)
        |SELECT aid, pid FROM pts JOIN areas
        |  ON lon >= minx AND lon <= maxx AND lat >= miny AND lat <= maxy
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "src_turtlestar" ->
      """SELECT 'urn:graft/nation/'||n_nationkey AS s, n_name AS nm,
        |  ('0.'||(5 + n_nationkey % 5))::DOUBLE AS c
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // SPARQL-star accessors: qt replays the loader's deterministic id
    // (md5 over the canonical N-Triples key — TPC-H names need no escaping);
    // the accessor/constructor columns replay as the original components.
    "f_star_accessors" ->
      """SELECT
        |  'urn:graft:qt:' || md5('<urn:graft/nation/'||n_nationkey
        |    ||'> <urn:x:name> "'||n_name||'"') AS qt,
        |  'urn:graft/nation/'||n_nationkey AS s,
        |  'urn:x:name' AS p,
        |  n_name AS nm,
        |  ('0.'||(5 + n_nationkey % 5))::DOUBLE AS c,
        |  'true' AS isq,
        |  'true' AS same
        |FROM nation
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST,
        |  5 NULLS FIRST, 6 NULLS FIRST, 7 NULLS FIRST""".stripMargin,
    // TriG: the names block routes to its graph, region links to default.
    "src_trig" ->
      """WITH nc AS (SELECT count(*)::BIGINT AS c FROM nation)
        |SELECT graph, n FROM (
        |  SELECT 'urn:graft/g/names' AS graph, c AS n FROM nc
        |  UNION ALL SELECT 'urn:graft:default', c FROM nc)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // N-Quads: one graph-labeled and one default-graph line per nation row.
    "src_nquads" ->
      """WITH nc AS (SELECT count(*)::BIGINT AS c FROM nation)
        |SELECT graph, n FROM (
        |  SELECT 'urn:graft/g/names' AS graph, c AS n FROM nc
        |  UNION ALL SELECT 'urn:graft:default', c FROM nc)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "snk_ntriples" ->
      """SELECT line FROM (
        |  SELECT '<urn:graft/nation/'||n_nationkey||'> <urn:graft/nation#n_nationkey> "'
        |    ||n_nationkey||'"^^<http://www.w3.org/2001/XMLSchema#integer> .' AS line FROM nation
        |  UNION ALL
        |  SELECT '<urn:graft/nation/'||n_nationkey||'> <urn:graft/nation#n_name> "'
        |    ||replace(replace(replace(replace(replace(n_name,
        |        '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
        |    ||'" .' FROM nation
        |  UNION ALL
        |  SELECT '<urn:graft/nation/'||n_nationkey||'> <urn:graft/nation#n_regionkey> <urn:graft/region/'
        |    ||n_regionkey||'> .' FROM nation
        |  UNION ALL
        |  SELECT '<urn:graft/nation/'||n_nationkey
        |    ||'> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:graft/class/nation> .' FROM nation
        |) ORDER BY 1 NULLS FIRST""".stripMargin,
    // registered custom function (r17): the affine kernel 2k + 7
    "f_registered" ->
      """SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
        |  (n_nationkey * 2 + 7)::BIGINT AS v
        |FROM nation ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "f_conditional" ->
      """SELECT c_custkey::BIGINT AS c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS bucket,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
        |  c_mktsegment IN ('MACHINERY', 'FURNITURE') AS in_set
        |FROM customer ORDER BY 1 NULLS FIRST""".stripMargin,
    "dd_exact" ->
      """SELECT md5(text) AS h, MIN(doc_id)::BIGINT AS keep_id, COUNT(*)::BIGINT AS n
        |FROM documents GROUP BY md5(text)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "dd_fingerprint" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |    '\s+', ' ', 'g'))) AS fp,
        |  MIN(doc_id)::BIGINT AS keep_id, COUNT(*)::BIGINT AS n
        |FROM documents GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "dd_ngram_pairs" -> jaccardPairs,
    "dd_clusters" -> dupClustersSql,
    // Incremental dedup is EXACT after the bloom verify: equals the plain
    // anti-join on trimmed text against the seen subset.
    "dd_incremental" ->
      """SELECT d.doc_id::BIGINT AS doc_id FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents s
        |  WHERE s.doc_id % 3 = 0 AND trim(s.text) = trim(d.text))
        |ORDER BY 1 NULLS FIRST""".stripMargin,
    "dd_minhash_sig" -> minhashSig,
    "dd_cosine_pairs" ->
      s"""WITH e AS ($embDouble)
         |SELECT a, b, cos FROM (
         |  SELECT a.vec_id AS a, b.vec_id AS b,
         |    round(list_cosine_similarity(a.v, b.v), 4) AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cos >= 0.42
         |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "dd_cosine_lsh" -> cosineLshSql,
    "sim_centroids" ->
      """WITH u AS (
        |  SELECT label, i - 1 AS pos,
        |    (embedding[i]::DOUBLE)::DECIMAL(20,10) AS v
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        |)
        |SELECT label, pos::INT AS pos,
        |  round(sum(v)::DOUBLE / count(*), 4) AS c
        |FROM u GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "sim_knn_brute" ->
      s"""WITH e AS ($embDouble),
         |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
         |s AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_cosine_similarity(q.v, c.v) AS cos0,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank
         |  FROM q JOIN e c ON c.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, round(cos0, 4) AS cos, rank::INT AS rank
         |FROM s WHERE rank <= 5
         |ORDER BY query_id NULLS FIRST, neighbor_id NULLS FIRST, cos NULLS FIRST, rank NULLS FIRST""".stripMargin,
    "sim_knn_quant" ->
      s"""WITH e AS ($embDouble),
         |q8 AS (
         |  SELECT vec_id,
         |    list_transform(v, x -> floor(x * (CASE WHEN ma > 0
         |      THEN 127.0 / ma ELSE 0.0 END) + 0.5)) AS qv
         |  FROM (SELECT vec_id, v,
         |          list_aggregate(list_transform(v, x -> abs(x)), 'max') AS ma
         |        FROM e)),
         |n AS (SELECT vec_id, qv, sqrt(list_inner_product(qv, qv)) AS nrm FROM q8),
         |q AS (SELECT * FROM n WHERE vec_id < 10),
         |s AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CASE WHEN q.nrm * c.nrm > 0
         |      THEN list_inner_product(q.qv, c.qv) / (q.nrm * c.nrm)
         |      ELSE 0.0 END AS cos0
         |  FROM q JOIN n c ON c.vec_id <> q.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos0,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos0 DESC, neighbor_id ASC) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, round(cos0, 4) AS cos, rank::INT AS rank
         |FROM r WHERE rank <= 5
         |ORDER BY query_id NULLS FIRST, neighbor_id NULLS FIRST, cos NULLS FIRST, rank NULLS FIRST""".stripMargin,
    "txt_stats" ->
      """SELECT doc_id,
        |  (CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS n_subwords,
        |  round(CASE WHEN length(text) > 0
        |    THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)::DOUBLE
        |    ELSE 0.0 END, 4) AS alpha_ratio,
        |  round(CASE WHEN length(text) > 0
        |    THEN (length(text) - length(regexp_replace(text, '\s', '', 'g')))::DOUBLE / length(text)::DOUBLE
        |    ELSE 0.0 END, 4) AS ws_ratio
        |FROM documents ORDER BY 1 NULLS FIRST""".stripMargin,
    "txt_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> length(x) > 0) AS toks
        |  FROM documents
        |), st AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
        |  FROM t WHERE len(toks) > 0
        |)
        |SELECT doc_id, start::INT AS start,
        |  len(list_slice(toks, start + 1, start + 64))::INT AS n_tok,
        |  md5(array_to_string(list_slice(toks, start + 1, start + 64), ' ')) AS chunk_md5
        |FROM st
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "txt_redact" ->
      """SELECT doc_id, md5(
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9][0-9 ()+-]{6,}[0-9]\b', '<NUM>', 'g')) AS r
        |FROM documents
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "txt_rep" ->
      (repCore + "\nORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST"),
    "txt_winnow" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents
        |), u AS (
        |  SELECT doc_id, norm, unnest(generate_series(1, length(norm) - 7)) AS i
        |  FROM t WHERE length(norm) >= 11
        |), g AS (
        |  SELECT doc_id, i,
        |    ('0x'||substr(md5(substr(norm, i::INT, 8)), 1, 15))::BIGINT AS h
        |  FROM u
        |), w AS (
        |  SELECT doc_id, i,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM g
        |)
        |SELECT DISTINCT doc_id, fp FROM w WHERE i <= n - 3
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "txt_langid" ->
      (langidCore + "\nORDER BY 1 NULLS FIRST"),
    "txt_quality" ->
      (qualityCore + "\nORDER BY 1 NULLS FIRST"),
    // end-to-end keep-list: language, quality and repetition thresholds
    "txt_gate" ->
      s"""WITH q AS ($qualityCore), l AS ($langidCore), r AS ($repCore)
         |SELECT q.doc_id FROM q
         |JOIN l USING (doc_id) JOIN r USING (doc_id)
         |WHERE l.lang_pred = 'en' AND q.quality >= 0.62
         |  AND r.dup_trigram_frac < 0.05
         |ORDER BY 1 NULLS FIRST""".stripMargin,
    // Streamed postings equal a batch build: tokenize + per-doc tf.
    "stream_fts_ingest" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\W+'),
        |      x -> length(x) > 0)) AS term
        |  FROM documents)
        |SELECT doc_id::BIGINT AS doc_id, term, count(*)::BIGINT AS tf
        |FROM t GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "stream_gate" ->
      s"""WITH q AS ($qualityCore), l AS ($langidCore), r AS ($repCore)
         |SELECT q.doc_id FROM q
         |JOIN l USING (doc_id) JOIN r USING (doc_id)
         |WHERE l.lang_pred = 'en' AND q.quality >= 0.62
         |  AND r.dup_trigram_frac < 0.05
         |ORDER BY 1 NULLS FIRST""".stripMargin,
    "gx_triangles" ->
      """WITH ok AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) <= 1000
        |), e AS (
        |  SELECT DISTINCT a.l_partkey::BIGINT AS u, b.l_partkey::BIGINT AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  JOIN ok ON ok.l_orderkey = a.l_orderkey
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |       JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |), verts AS (
        |  SELECT u AS pid FROM e UNION SELECT v FROM e
        |), cnt AS (
        |  SELECT pid, count(*)::BIGINT AS n
        |  FROM (SELECT unnest([a, b, c]) AS pid FROM tri) GROUP BY 1
        |)
        |SELECT verts.pid AS part_id, coalesce(cnt.n, 0)::BIGINT AS n_tri
        |FROM verts LEFT JOIN cnt USING (pid)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "gx_wsssp" ->
      """WITH RECURSIVE ok AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) <= 1000
        |), co AS (
        |  SELECT a.l_partkey::BIGINT AS u, b.l_partkey::BIGINT AS v,
        |    count(*)::BIGINT AS n
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  JOIN ok ON ok.l_orderkey = a.l_orderkey
        |  GROUP BY 1, 2
        |), e AS (
        |  SELECT u, v, greatest(6 - n, 1)::BIGINT AS w FROM co
        |), und AS (
        |  SELECT u AS s, v AS t, w FROM e
        |  UNION ALL SELECT v, u, w FROM e
        |), walk(v, d) AS (
        |  SELECT (SELECT min(u) FROM e), 0::BIGINT
        |  UNION
        |  SELECT und.t, walk.d + und.w FROM walk JOIN und ON und.s = walk.v
        |  WHERE walk.d + und.w <= 8
        |)
        |SELECT v AS part_id, min(d)::BIGINT AS dist FROM walk GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "gx_bfs" ->
      """WITH RECURSIVE ok AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) <= 1000
        |), e AS (
        |  SELECT DISTINCT a.l_partkey::BIGINT AS u, b.l_partkey::BIGINT AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  JOIN ok ON ok.l_orderkey = a.l_orderkey
        |), und AS (
        |  SELECT u AS s, v AS t FROM e UNION ALL SELECT v, u FROM e
        |), bfs(v, d) AS (
        |  SELECT (SELECT min(u) FROM e), 0
        |  UNION
        |  SELECT und.t, bfs.d + 1 FROM bfs JOIN und ON und.s = bfs.v
        |  WHERE bfs.d < 4
        |)
        |SELECT v AS part_id, min(d)::BIGINT AS dist FROM bfs GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "gx_components" ->
      """WITH m AS (
        |  SELECT 'urn:graft/customer/' || c_custkey AS iri, n_regionkey AS rk
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL SELECT 'urn:graft/nation/' || n_nationkey, n_regionkey FROM nation
        |  UNION ALL SELECT DISTINCT 'urn:graft/region/' || n_regionkey, n_regionkey FROM nation
        |), lbl AS (SELECT rk, MIN(iri) AS component FROM m GROUP BY rk)
        |SELECT m.iri, lbl.component FROM m JOIN lbl USING (rk)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "gx_degrees" ->
      """SELECT iri, out_deg, in_deg FROM (
        |  SELECT 'urn:graft/customer/' || c_custkey AS iri, 1::BIGINT AS out_deg,
        |    0::BIGINT AS in_deg FROM customer
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || n_nationkey, 1::BIGINT,
        |    (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)::BIGINT
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/region/' || n_regionkey, 0::BIGINT, COUNT(*)::BIGINT
        |  FROM nation GROUP BY n_regionkey)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "upd_delete_where" ->
      "SELECT COUNT(*) FILTER (WHERE c_mktsegment <> 'BUILDING')::BIGINT AS n FROM customer",
    "upd_insert_data" ->
      """SELECT seg, n::BIGINT AS n FROM (
        |  SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY 1
        |  UNION ALL SELECT 'SPACE', 2)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "upd_data_roundtrip" ->
      """SELECT seg, n::BIGINT AS n FROM (
        |  SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY 1
        |  UNION ALL SELECT 'SPACE', 1)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "upd_modify" ->
      """SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'REBUILT'
        |            ELSE c_mktsegment END AS seg,
        |  COUNT(*)::BIGINT AS n
        |FROM customer GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "sp_describe_text" ->
      """WITH ns AS (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |SELECT p, n::BIGINT AS n FROM (
        |  SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
        |    COUNT(*) AS n FROM ns
        |  UNION ALL SELECT 'urn:graft/nation#n_nationkey', COUNT(*) FROM ns
        |  UNION ALL SELECT 'urn:graft/nation#n_name', COUNT(*) FROM ns
        |  UNION ALL SELECT 'urn:graft/nation#n_regionkey', COUNT(*) FROM ns
        |  UNION ALL SELECT 'urn:graft/customer#c_nationkey', COUNT(*)
        |    FROM customer WHERE c_nationkey IN (SELECT n_nationkey FROM ns)
        |  UNION ALL SELECT 'urn:graft/supplier#s_nationkey', COUNT(*)
        |    FROM supplier WHERE s_nationkey IN (SELECT n_nationkey FROM ns))
        |WHERE n > 0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Recursive CBD: per nation — the addr triple, the addr bnode's two
    // outbound statements, the geo bnode's one (depth 2), and the inbound
    // ref; the '_:other' distractor bnode never appears.
    "sp_describe_cbd" ->
      """SELECT s, p, v FROM (
        |  SELECT 'urn:graft/nation/'||n_nationkey AS s, 'urn:x:addr' AS p,
        |    '_:addr'||n_nationkey AS v FROM nation
        |  UNION ALL SELECT '_:addr'||n_nationkey, 'urn:x:city',
        |    'city-'||n_nationkey FROM nation
        |  UNION ALL SELECT '_:addr'||n_nationkey, 'urn:x:geo',
        |    '_:geo'||n_nationkey FROM nation
        |  UNION ALL SELECT '_:geo'||n_nationkey, 'urn:x:lat',
        |    '53.'||(n_nationkey % 7) FROM nation
        |  UNION ALL SELECT 'urn:graft/ref/'||n_nationkey, 'urn:x:ref',
        |    'urn:graft/nation/'||n_nationkey FROM nation)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "stream_quad_counts" ->
      """SELECT p, n FROM (
        |  SELECT 'urn:graft/events#event_id' AS p, COUNT(event_id)::BIGINT AS n FROM events
        |  UNION ALL SELECT 'urn:graft/events#ts', COUNT(ts)::BIGINT FROM events
        |  UNION ALL SELECT 'urn:graft/events#user_id', COUNT(user_id)::BIGINT FROM events
        |  UNION ALL SELECT 'urn:graft/events#event_type', COUNT(event_type)::BIGINT FROM events
        |  UNION ALL SELECT 'urn:graft/events#value', COUNT(value)::BIGINT FROM events
        |  UNION ALL SELECT 'urn:graft/events#props', COUNT(props)::BIGINT FROM events
        |  UNION ALL SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
        |    COUNT(*)::BIGINT FROM events)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id::BIGINT AS media_id, 'image' AS kind,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  'application/x-stub-image' AS mime
        |FROM documents ORDER BY 1 NULLS FIRST""".stripMargin,
    // Bucketed join result == plain join (bucketing changes the PLAN only);
    // decimal-exact money sum (the q1 pattern).
    "j7_bucketed_join" ->
      """SELECT o_orderkey::BIGINT AS o_orderkey,
        |  (SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Frame offsets: every 1024th byte offset of the payload, first 8.
    "mm_frames" ->
      """SELECT doc_id::BIGINT AS media_id,
        |  unnest(list_slice(range(0, greatest(strlen(text) - 1, 0) + 1, 1024),
        |    1, 8)) AS frame_offset
        |FROM documents
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // Sessionize per user at a 2h gap (lag + cumulative break-sum), then
    // drop each user's LAST session (the operator's still-open state).
    "stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts)::BIGINT AS t FROM events),
        |w AS (SELECT user_id, t,
        |        lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
        |m AS (SELECT user_id, t,
        |        CASE WHEN pt IS NULL OR t - pt > 7200000000 THEN 1 ELSE 0
        |        END AS brk FROM w),
        |s AS (SELECT user_id, t, SUM(brk) OVER (PARTITION BY user_id
        |        ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |g AS (SELECT user_id, sid, min(t)::BIGINT AS session_start,
        |        count(*)::BIGINT AS n_events FROM s GROUP BY 1, 2),
        |last AS (SELECT user_id, max(sid) AS msid FROM g GROUP BY 1)
        |SELECT g.user_id::BIGINT AS user_id, g.session_start, g.n_events
        |FROM g JOIN last l ON l.user_id = g.user_id AND g.sid < l.msid
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // Stream-stream join: plain batch self-join replication — the
    // watermark/state mechanics are internal to the streaming plan.
    "stream_pair_join" ->
      """SELECT a.user_id::BIGINT AS user_id, a.event_id::BIGINT AS a_id,
        |  b.event_id::BIGINT AS b_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts >= a.ts
        |  AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |  AND a.event_id < b.event_id
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "stream_window_counts" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type,
        |  COUNT(*)::BIGINT AS n, round(SUM(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    // SHACL validation report: each constraint's violation set re-derived
    // relationally from the source tables.
    "shacl_report" ->
      """SELECT focus, result_path, component FROM (
        |  SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR) AS focus,
        |         'urn:graft/customer#c_acctbal' AS result_path,
        |         'sh:MaxInclusiveConstraintComponent' AS component
        |  FROM customer WHERE NOT (c_acctbal <= 8000.0)
        |  UNION ALL
        |  SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR),
        |         'urn:graft/customer#c_acctbal', 'sh:OrConstraintComponent'
        |  FROM customer
        |  WHERE NOT (c_acctbal <= 5000.0 OR c_acctbal >= 7000.0)
        |  UNION ALL
        |  SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR),
        |         'urn:graft/customer#c_mktsegment', 'sh:InConstraintComponent'
        |  FROM customer
        |  WHERE c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |         'urn:graft/nation#n_name', 'sh:MinCountConstraintComponent'
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR),
        |         'urn:graft/customer#c_nationkey', 'sh:NodeConstraintComponent'
        |  FROM customer WHERE NOT (c_nationkey <= 9.0)
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    // xone = exactly one branch passes ⇔ branch1 XOR branch2; violation is
    // the negation. The node-level shape's focus set is the DISTINCT
    // segment literals.
    "shacl_xone" ->
      """SELECT focus, component FROM (
        |  SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR) AS focus,
        |         'sh:XoneConstraintComponent' AS component
        |  FROM customer
        |  WHERE NOT ((c_acctbal <= 3000.0) <> (c_acctbal >= 1000.0))
        |  UNION ALL
        |  SELECT DISTINCT c_mktsegment, 'sh:XoneConstraintComponent'
        |  FROM customer
        |  WHERE NOT ((c_mktsegment LIKE 'B%') <>
        |             (c_mktsegment IN ('BUILDING', 'MACHINERY')))
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "shacl_sparql" ->
      """SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR) AS focus,
        |       'sh:SPARQLConstraintComponent' AS component,
        |       n_name AS value,
        |       'negative balance' AS message
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_acctbal < 0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin,
    "shacl_paths" ->
      """SELECT focus, result_path, component, value FROM (
        |  SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR) AS focus,
        |    'urn:graft/customer#c_name|urn:graft/customer#c_mktsegment'
        |      AS result_path,
        |    'sh:PatternConstraintComponent' AS component,
        |    c_mktsegment AS value
        |  FROM customer WHERE NOT regexp_matches(c_mktsegment, '^Customer')
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_regionkey?', 'sh:DatatypeConstraintComponent',
        |    'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR)
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |    'urn:graft/nation#n_regionkey?', 'sh:DatatypeConstraintComponent',
        |    'urn:graft/region/' || CAST(n_regionkey AS VARCHAR)
        |  FROM nation
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    "shacl_component" ->
      """SELECT 'urn:graft/customer/' || CAST(c_custkey AS VARCHAR) AS focus,
        |       'urn:graft/customer#c_acctbal' AS result_path,
        |       'urn:comp/MinBal' AS component,
        |       'balance below floor' AS message
        |FROM customer WHERE NOT (c_acctbal >= 0.0)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""".stripMargin,
    // property pairs: equals = symmetric difference (single-valued columns
    // → a violation from EACH side when unequal), disjoint = shared value,
    // lessThan(OrEquals) = per-pair comparison with the violation carrying
    // the path side's value node
    "shacl_pairs" ->
      """SELECT focus, result_path, component FROM (
        |  SELECT 'urn:graft/part/' || CAST(p_partkey AS VARCHAR) AS focus,
        |         'urn:graft/part#p_size' AS result_path,
        |         'sh:EqualsConstraintComponent' AS component
        |  FROM part WHERE p_size <> p_partkey
        |  UNION ALL
        |  SELECT 'urn:graft/part/' || CAST(p_partkey AS VARCHAR),
        |         'urn:graft/part#p_size', 'sh:EqualsConstraintComponent'
        |  FROM part WHERE p_size <> p_partkey
        |  UNION ALL
        |  SELECT 'urn:graft/part/' || CAST(p_partkey AS VARCHAR),
        |         'urn:graft/part#p_size', 'sh:DisjointConstraintComponent'
        |  FROM part WHERE p_size = p_partkey
        |  UNION ALL
        |  -- the composite (orderkey, linenumber) key is NOT unique in the
        |  -- synthetic data, so one focus can carry several discounts/taxes:
        |  -- sh:lessThan* compares EVERY (path value, other value) pair —
        |  -- replayed as the per-focus self-join
        |  SELECT 'urn:graft/lineitem/' || CAST(a.l_orderkey AS VARCHAR) ||
        |           '/' || CAST(a.l_linenumber AS VARCHAR),
        |         'urn:graft/lineitem#l_discount',
        |         'sh:LessThanOrEqualsConstraintComponent'
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
        |  WHERE NOT (a.l_discount <= b.l_tax)
        |  UNION ALL
        |  SELECT 'urn:graft/lineitem/' || CAST(a.l_orderkey AS VARCHAR) ||
        |           '/' || CAST(a.l_linenumber AS VARCHAR),
        |         'urn:graft/lineitem#l_quantity',
        |         'sh:LessThanConstraintComponent'
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
        |  WHERE NOT (a.l_quantity < b.l_extendedprice)
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "shacl_qualified" ->
      """SELECT focus, component FROM (
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR) AS focus,
        |         'sh:QualifiedMinCountConstraintComponent' AS component
        |  FROM nation n
        |  WHERE (SELECT count(*) FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |           AND regexp_matches('urn:graft/customer/' ||
        |             CAST(c.c_custkey AS VARCHAR), '[02468]$')) < 30
        |  UNION ALL
        |  SELECT 'urn:graft/nation/' || CAST(n_nationkey AS VARCHAR),
        |         'sh:QualifiedMaxCountConstraintComponent'
        |  FROM nation n
        |  WHERE (SELECT count(*) FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey) > 60
        |) t ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "shacl_psparql" ->
      """SELECT 'urn:graft/supplier/' || CAST(s_suppkey AS VARCHAR) AS focus,
        |       'urn:graft/supplier#s_acctbal' AS result_path,
        |       'sh:SPARQLConstraintComponent' AS component,
        |       CAST(s_acctbal AS VARCHAR) AS value,
        |       'negative supplier balance' AS message
        |FROM supplier WHERE s_acctbal < 0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST""".stripMargin,
    "shacl_counts" ->
      """SELECT component, result_path, n FROM (
        |  SELECT 'sh:ClosedConstraintComponent' AS component,
        |         'urn:graft/nation#n_nationkey' AS result_path,
        |         count(*)::BIGINT AS n
        |  FROM nation
        |  UNION ALL
        |  SELECT 'sh:PatternConstraintComponent', 'urn:graft/nation#n_name',
        |         count(*)::BIGINT
        |  FROM nation WHERE NOT regexp_matches(n_name, '^[A-J]')
        |  UNION ALL
        |  SELECT 'sh:MinCountConstraintComponent',
        |         'urn:graft/customer#c_nationkey', count(*)::BIGINT
        |  FROM nation
        |  WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer)
        |) t WHERE n > 0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q5_region_volume" ->
      """SELECT n_name AS nname, sum(l_quantity)::DOUBLE AS sum_qty,
        |  count(*)::BIGINT AS n
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE r_name = 'ASIA' AND s_nationkey = n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1994-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  (SUM(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS sum_base,
        |  (SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))))::DOUBLE AS sum_disc_price,
        |  SUM(l_quantity) / COUNT(*) AS avg_qty,
        |  COUNT(*)::BIGINT AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
  )
}
