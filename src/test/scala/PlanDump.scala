import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans of representative queries
  * with the scale rationale inline. Run:
  * `sbt "Test/runMain PlanDump"` from the repo root.
  */
object PlanDump {
  val notes: Seq[(String, String)] = Seq(
    "q1_pricing" ->
      """Flagship aggregation. ONE parquet scan (the star BGP collapses to a
        |property-table read — no self-joins), partial+final HashAggregate,
        |everything inside WholeStageCodegen. The scan shows ReadSchema with
        |only the touched columns.""".stripMargin,
    "j1_star_bgp" ->
      """4-pattern star over one subject: compiles to a SINGLE scan, zero
        |Join operators (SURVEY §4.3 star collapse).""".stripMargin,
    "j2_chain_join" ->
      """Chain across tables: the small sides (nation/region) arrive via
        |BroadcastHashJoin — no shuffle of the big side.""".stripMargin,
    "p4_filter_range" ->
      """Numeric range FILTER: the predicate reaches the scan as
        |PushedFilters (GreaterThan/LessThan) — rows never leave parquet.""".stripMargin,
    "snk_ntriples" ->
      """RDF export: one narrow Project over one scan. No Exchange — every
        |partition serializes independently at 100 TB.""".stripMargin,
    "txt_winnow" ->
      """Winnowing fingerprints: codegen'd explode+hash, ONE Exchange for
        |the per-doc window, one for the final distinct. The interpreted
        |higher-order alternative measured 18x slower.""".stripMargin,
    "sk_salted_agg" ->
      """Salted two-stage aggregation: two HashAggregate pairs — the first
        |keyed (key, salt) spreads a hot key over 16 reducers, the second
        |combines 16 tiny partials per key.""".stripMargin,
    "sim_knn_quant" ->
      """int8-quantized kNN: queries broadcast (BroadcastNestedLoopJoin),
        |corpus streams once; per-pair dot is the codegen'd graft_dot
        |kernel over 4x-smaller vectors.""".stripMargin,
    "fts_search" ->
      """Full-text conjunctive search: the term-IN filter sits BELOW the
        |postings aggregate (pruned buckets against a term-bucketed
        |postings table); one partial+final HashAggregate pair per stage,
        |no join at all.""".stripMargin,
    "fts_stem" ->
      """Analyzed FTS (r12): the stopword+stemmer chain ran ONCE at index
        |build (generated SQL stages — pure scalar projections); the query
        |side is the same bucket-prunable term-IN scan + one aggregate pair
        |as fts_search, with the stemmed query terms computed on a
        |query-sized local relation — the analyzer adds ZERO exchanges to
        |the serving path.""".stripMargin,
    "geo_sjoin" ->
      """Spatial range join: grid cells make it a plain shuffled EQUI-join
        |(SortMergeJoin/ShuffledHashJoin on cx, cy — or broadcast when an
        |area side is small) with the exact bbox predicate inside the join;
        |NEVER a cartesian product.""".stripMargin,
    "dd_simhash_pairs" ->
      """SimHash multi-probe pairs: explode to 4 banded sub-keys, self
        |equi-join per band, dedup candidates, then the exact popcount
        |verify — candidate generation is bucket-bounded, never
        |all-pairs.""".stripMargin,
    "geo_poly_sjoin" ->
      """Polygon×polygon intersect join: BOTH envelopes explode to grid
        |cells, plain equi-join on (cx, cy); the canonical-cell filter
        |makes each pair survive exactly once with NO post-join distinct
        |(zero extra Exchange); the exact ring verify is ONE native
        |graft_ring_intersects node (r10) as a post-join filter, cost
        |proportional to bbox survivors.""".stripMargin,
    "dd_minhash_sig" ->
      """MinHash signatures (r10 shingle kernel): the (doc, shingle) rows
        |are Generate(explode(graft_shingles_3)) over ONE narrow scan — the
        |former lead-window + global-distinct path put two wide Exchanges
        |and a per-doc sort ahead of this point. The only Exchange left is
        |the signature aggregate's own hash partition (k min-aggs,
        |partial+final).""".stripMargin,
    "geo_rcc8" ->
      """RCC8/Egenhofer classification: every predicate is ONE
        |graft_ring_* native expression inside a codegen'd Project — the
        |prior Column-combinator encoding expanded each predicate to ~10^4
        |interpreted nodes and Catalyst analysis alone took ~a minute for
        |this 7-BIND query (now: plan in milliseconds, same IEEE
        |results).""".stripMargin,
    "geo_diff" ->
      """Polygon overlay (r11): difference and symDifference are each ONE
        |graft_overlay_* native node per BIND — the Greiner–Hormann trace
        |(and the r15 arrangement fallback for shared-edge-plus-crossing
        |contact) runs as a primitive JVM loop per row, so the plan stays
        |O(plan) like geo_rcc8 (a Column encoding of clipping would be
        |unplannable) and the envelope/ncomp projections stay codegen'd
        |around it.""".stripMargin,
    "shacl_report" ->
      """SHACL validation (r11): every constraint is a predicate-filtered
        |scan (the sh:path equality reaches the quad scan) joined against
        |the broadcast focus set; cardinality is one partial+final
        |HashAggregate LEFT-joined so absent properties count 0; the report
        |is a union of narrow violation projections — no driver loop over
        |data rows, shapes parsed driver-side (schema-sized).""".stripMargin,
    "lay_zorder" ->
      """Z-order layout (r11): the read-back scan carries BOTH range
        |predicates in PushedFilters against files whose footer min/max are
        |tight on every clustered dimension (LayoutSpec asserts the span
        |tightening) — multi-dimensional file pruning from one sort
        |key.""".stripMargin,
    "dd_semantic" ->
      """SemDeDup (r11): centroid assignment broadcasts the nlist-row
        |centroid frame; the dup-pair stage is a plain cid EQUI-join with
        |the codegen'd graft_dot kernel inside the join filter — pairwise
        |work is bounded per cluster, never a corpus cross join.""".stripMargin,
    "dd_substring" ->
      """Exact substring-dedup spans (r13): one narrow window projection,
        |a gram-keyed aggregate for the cross-doc duplicate filter, an
        |equi-join back ∝ DUPLICATED windows only, and a per-doc
        |(partitionBy doc) running-max window for the merge — no global
        |sort, no cross join; at 100 TB the gram key hashes.""".stripMargin,
    "smp_importance" ->
      """DSIR importance weighting (r13): the B-row weight table arrives
        |via BroadcastHashJoin (built from two B-sized count aggregates);
        |the corpus side is one token projection + a map-side join + a
        |doc-keyed partial/final aggregate — the only corpus-sized
        |Exchange is the per-doc sum.""".stripMargin,
    "smp_cluster_cap" ->
      """Cluster-balanced sampling (r14 shape fix): the per-cluster quota's
        |row_number()<=cap filter plans as WindowGroupLimit pairs — the
        |PARTIAL group-limit runs BELOW the per-cid Exchange, so each map
        |task forwards at most cap rows per cluster and the shuffle carries
        |<= cap * numPartitions rows per cid. Without it, nlist(=8) reducer
        |tasks would each sort corpus/nlist rows at 100 TB. PlanSpec pins
        |the Partial-below-Exchange ordering.""".stripMargin,
    "sim_doc_search" ->
      """Similarity-plugin term search (r13): the query tf vector (query-
        |sized) broadcasts into the tf postings, one partial+final
        |aggregate per candidate doc, cosine against PRECOMPUTED norms,
        |then TakeOrdered for the plugin top-k — work ∝ postings of the
        |query's terms, never corpus².""".stripMargin,
    "gx_pathsearch" ->
      """Graph path search (r13; r14 index-lookup hops): walks the
        |PERSISTED resource-edge index (FK columns + rdf:type only —
        |literal columns never scanned; src-sorted parquet built in ONE
        |shuffle at store-open, fingerprint-keyed like the FTS index).
        |Each frontier round pre-filters src IN (frontier nodes) — the In
        |predicate pushes to the sorted file's row-group stats, so a hop
        |reads ~one row group off disk (a point lookup, never an edge-set
        |scan; deliberately NOT session-cached — measured equal warm wall
        |and 10 s less first-touch at sf1) — then BroadcastHashJoins the
        |tiny frontier (size-aware hint from the cut's row count), state
        |∝ qualifying walks. Frontiers past the 8k-node lookup bound fall
        |back to the scan join.""".stripMargin,
    "j8_asof_join" ->
      """As-of join (r11): NO Join operator at all — a union of the tagged
        |sides and ONE Window (last ignoreNulls, unbounded-preceding) per
        |key does the point-in-time pick: one Exchange on the key + sort,
        |where a range join would explode to |left|x|right-per-key| pairs
        |before keeping one winner.""".stripMargin,
    "shacl_sparql" ->
      """SHACL-SPARQL constraint (r12): the sh:select text compiles through
        |the ordinary SPARQL compiler (selectivity-ordered BGP, broadcast
        |dims), runs ONCE over the data, and the $this pre-binding is one
        |BroadcastHashJoin against the focus set on full term equality —
        |a million focus nodes cost one query + one broadcast join, never
        |a per-focus loop.""".stripMargin,
    "geo_holes_sjoin" ->
      """Holed-polygon spatial join (r12): the grid explode reads only the
        |EXTERIOR ring's envelope, the join stays the plain (cx, cy)
        |EQUI-join, and the all-rings even-odd parity verify (ONE native
        |graft_union_within node) runs as a post-join filter proportional
        |to bbox survivors — holes change the verify, not the join
        |shape.""".stripMargin,
    "j9_interval_join" ->
      """Bucketed interval join (r11): the point-in-interval theta becomes
        |a plain (key, bucket) EQUI-join — a point occupies one bucket, an
        |interval explodes to at most two — with the half-open containment
        |predicate inside the join and exactly-once pairs (no
        |BroadcastNestedLoopJoin, no post-join distinct; PlanSpec pins
        |both).""".stripMargin,
    "shacl_pairs" ->
      """SHACL property-pair constraints (late r12): the other property
        |arrives from ONE more predicate-filtered scan of the same quad
        |view; sh:equals/sh:disjoint are anti/semi joins on the full term
        |struct per focus, sh:lessThan* a focus-keyed equi-join with the
        |numeric-shadow comparison INSIDE the join — never per-focus
        |loops. The focus set follows the broadcastFocus hint (default on:
        |target scans are usually dimension-sized; fact-sized targets pass
        |false and AQE sizes the shuffle).""".stripMargin,
    "shacl_paths" ->
      """SHACL path extensions (late r12): sh:alternativePath is ONE scan
        |with a predicate IN-list (no per-alternative union of jobs);
        |sh:zeroOrOnePath unions the focus nodes themselves (a projection
        |of the already-resolved target set) with the one-hop values —
        |closures ride the engine's distributed property-path
        |machinery.""".stripMargin,
    "smp_temperature" ->
      """Temperature-scaled domain quotas (r14): the quota table is a
        |domains-sized aggregate + 1-row weight sum, BROADCAST back onto
        |the corpus; the per-domain rank keeps the two-stage
        |WindowGroupLimit (the constant maxQuota conjunct is what the
        |optimizer pushes below the Exchange as a Partial group limit —
        |PlanSpec pins the ordering), so no reducer sorts more than
        |maxQuota rows per (domain, input partition).""".stripMargin,
    "sql_view_join" ->
      """SQL access (r14): SPARQL-backed SQL views register LAZILY (the
        |view's plan IS the compiled SPARQL plan), so Catalyst optimizes
        |ACROSS the boundary — the spark.sql WHERE over the view lands in
        |the parquet scan's PushedFilters, the nation view broadcasts,
        |and the aggregate is partial+final. No materialization wall: a
        |JDBC-bridge design would run the SPARQL side to completion
        |before SQL ever saw a row.""".stripMargin,
    "sim_pred_search" ->
      """Predication-similarity search (r14): the query entity's stored
        |vector is a broadcast-sized postings slice; candidates come from
        |the term equi-join (posting intersection IS the pruning — work
        |proportional to shared predications, never entities squared), one
        |partial+final aggregate per candidate, top-k over the
        |candidates.""".stripMargin)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of representative queries\n\n")
    sb.append("Generated by `sbt \"Test/runMain PlanDump\"` at sf0.001 ")
    sb.append("(plan SHAPE is scale-independent; AQE re-plans sizes at runtime).\n")
    notes.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      sb.append(s"\n## $name\n\n${note.linesIterator.map(_.trim).mkString(" ")}\n\n")
      sb.append("```\n").append(plan.trim).append("\n```\n")
    }
    scaleSection().foreach(sb.append)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${notes.size} plans)")
    spark.stop()
  }

  /** Scale-proof table from the committed bench artifacts: BENCH_LOCAL.json
    * (sf0.1) vs BENCH_SF1.json (the 10× /tmp/sf1 replica — facts replicated
    * 10× with shifted primary keys, dims fixed, document copies
    * suffix-perturbed, same parquet physical types). Ratios ≤ 2× of linear
    * (≤ 20×) are the pass bar; output-proportional queries (near-dup pair
    * generation over a corpus where every doc gains 9 close replicas) sit
    * above 10× legitimately.
    */
  private def scaleSection(): Option[String] = {
    def parse(p: String): Option[Map[String, Double]] = {
      val f = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(f)) return None
      val txt = java.nio.file.Files.readString(f)
      val m = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1))
      m.map(_.split(",").flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) => Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.toDouble)
          case _ => None
        }
      }.toMap)
    }
    for {
      local <- parse("BENCH_LOCAL.json")
      sf1 <- parse("BENCH_SF1.json")
    } yield {
      val rows = sf1.keys.toSeq.filter(local.contains).sortBy(k => -sf1(k))
      val t1 = rows.map(sf1).sum
      val t0 = rows.map(local).sum
      // joined with "\n|" so stripMargin's pipe-eating leaves each row's
      // real leading "|" intact
      val tbl = rows.map { k =>
        f"| $k | ${local(k)}%.3f | ${sf1(k)}%.3f | ${sf1(k) / local(k)}%.1fx |"
      }.mkString("\n|")
      f"""
         |## Scale proof: sf1 (10x the bench scale)
         |
         |Median-of-5 seconds per query (r15 protocol; the JSON also
         |carries per-query min — compare MIN across rounds for plan
         |changes, medians for expected wall), sf0.1 (BENCH_LOCAL.json)
         |vs the 10x
         |/tmp/sf1 replica (BENCH_SF1.json) — facts replicated 10x with
         |shifted primary keys, dims fixed, document copies suffix-perturbed,
         |identical parquet physical types. Pass bar: every query within 2x
         |of linear (<= 20x). Near-dup pair generators exceed 10x
         |legitimately: their OUTPUT grows superlinearly (each doc/vector
         |gains 9 close replicas), so wall ~ output stays the honest
         |measure.
         |
         |Flagship pushdown proof: `q5_region_volume` — the six-way SPARQL
         |join whose dateTime range reaches the orders scan as a
         |PushedFilter via the custom SargableTimestamps rule (PlanSpec
         |pins it). Without the rule a date-bounded query scans the whole
         |fact table at 100 TB; its sf1 ratio below shows the range prune
         |riding the 10x scale-up.
         |
         |`stream_simhash_pairs` sf1 numbers come from TWO harnesses —
         |label them (the r14 text mixed them): the FULL STREAMING profile
         |(cold MemoryStream ingest, every micro-batch to completion,
         |signature computation included) walled 24.9 s median at r14 HEAD
         |(< the 30 s bar); the BENCH number in the table below is the
         |same code on the same corpus measured like every other row —
         |warm session, query wall only. Both are true; the table is the
         |apples-to-apples ratio, the profile the end-to-end ceiling.
         |Per-band bucket histograms at sf1 show the four bands BALANCED
         |(capped pair work 1.45M/1.80M/1.58M/1.71M comparisons, no
         |dominant band key; >cap hot buckets — max raw 2664 — dropped
         |atomically by the bounded-state guard): the cost is the 4-band
         |shuffle + capped per-bucket compares, not skew.
         |
         || query | sf0.1 | sf1 (10x) | ratio |
         ||---|---|---|---|
         |$tbl
         || **total** | **$t0%.3f** | **$t1%.3f** | **${t1 / t0}%.1fx** |
         |""".stripMargin
    }
  }
}
