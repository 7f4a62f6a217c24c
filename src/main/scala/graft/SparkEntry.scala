package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algebra._
import graft.inference.Inference
import graft.model.{Quad, Rdf, RdfTerm}
import graft.paths._
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.{DirectMapper, GraphCatalog}

/** Driver contract: one named query per operator in SURVEY.md §2, each with a
  * DuckDB-equivalent oracle in [[SparkEntry.oracleSql]] where SQL-expressible.
  *
  * Conventions for oracle parity (the driver hash-compares values after
  * sorting columns by name):
  *   - every output column is aliased identically in Spark and SQL;
  *   - output types are pinned (BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN/TIMESTAMP);
  *   - results are deterministically ordered in BOTH engines (ASC NULLS FIRST
  *     to match Spark's default);
  *   - double-typed AGGREGATES are decimal-exact or integer-valued (a plain
  *     double sum is partition-order-dependent and would flake the hash);
  *   - FP scalar math is written with identical association so both engines
  *     compute bit-identical doubles.
  */
object SparkEntry {

  // ------------------------------------------------------------ plumbing

  private val ctxCache = scala.collection.concurrent.TrieMap.empty[String, (GraphCatalog, Compiler)]
  private def ctx(spark: SparkSession, sfDir: String): (GraphCatalog, Compiler) =
    ctxCache.getOrElseUpdate(sfDir + "@" + spark.hashCode, {
      val cat = GraphCatalog.testdata(spark, sfDir)
      (cat, new Compiler(cat))
    })

  private def pred(t: String, c: String): I = I(DirectMapper.predIri(t, c))
  private def cls(t: String): I = I(DirectMapper.classIri(t))

  /** Scan-parallelism floor (r18 optimization, guide §2.5 "input skew: one
    * huge unsplittable file — repartition immediately after the read"): the
    * testdata tables are single-file, SINGLE-ROW-GROUP parquet, so the scan
    * is one task no matter what `maxPartitionBytes`/`minPartitionNum` say —
    * row groups are the split floor — and every narrow compute-heavy stage
    * above it (tokenize+md5, vector folds, k-means assignment) inherited
    * 1-way parallelism (profiled: dd_semantic spent 6+ s in 1-task stages
    * on a 32-core box). Scale-ADAPTIVE: when the planned scan already has
    * >= defaultParallelism partitions (any real multi-row-group/multi-file
    * table, so every production layout), this is the identity — the
    * round-robin exchange exists only for inputs too small to split, where
    * it costs one shuffle of the (tiny) raw bytes. The partition count is
    * memoized per file path: it is a physical property of the file.
    */
  private def widen(spark: SparkSession, key: String, df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    // planning-only probe, recomputed per call (r19, ADVICE: the r18 memo
    // keyed on path + spark.hashCode — identity hashes can collide across
    // sessions and a regenerated file silently kept the stale count)
    val n = df.rdd.getNumPartitions
    // r19: hash on the table's declared key, not round-robin — a keyless
    // repartition(p) pays a LOCAL SORT of every full-text row first
    // (sortBeforeRepartition, for retry determinism; guide §2.5), profiled
    // as the single biggest stage of dd_decontam's widen. The key is the
    // table's unique primary key, so the spread is uniform by construction.
    if (n < p) df.repartition(p, col(key)) else df
  }
  private def tbl(spark: SparkSession, sfDir: String, t: String): DataFrame = {
    spark.read.parquet(s"$sfDir/$t.parquet")
  }

  /** Widened table read — for queries whose next stage is a compute-heavy
    * per-row kernel (tokenize+md5, shingling, vector folds): there the
    * exchange of the tiny raw bytes buys 32× parallelism. Cheap-per-row
    * scans (plain aggregates/joins over lineitem) measured SLOWER widened
    * (the 600k-row round-robin exchange costs more than the 1-task map-side
    * aggregation saves), so widening is per CALL SITE, not in [[tbl]].
    */
  private def tblW(spark: SparkSession, sfDir: String, t: String): DataFrame =
    widen(spark, DirectMapper.testdataSpecs(t).pks.head, tbl(spark, sfDir, t))

  /** Unwrap a term-struct var to a plain typed column. */
  private def sv(df: DataFrame, v: String, as: String): Column =
    df(v).getField("value").as(as)
  private def nv(df: DataFrame, v: String, as: String): Column =
    df(v).getField("num").as(as)
  private def iv(df: DataFrame, v: String, as: String): Column =
    df(v).getField("value").cast("int").as(as)
  private def lv(df: DataFrame, v: String, as: String): Column =
    df(v).getField("value").cast("bigint").as(as)
  private def cnt(df: DataFrame, v: String, as: String): Column =
    df(v).getField("num").cast("bigint").as(as)

  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first).toSeq: _*)

  /** Deterministic path-search endpoints: the FIRST (l_orderkey,
    * l_linenumber, l_suppkey, region) lineitem whose supplier and customer
    * nations share a region, and that shared region — so
    * source→destination has exactly two simple paths (3 hops via supplier,
    * 4 via orders→customer). The 1-row collect mirrors the oracle's
    * `ORDER BY .. LIMIT 1` selector; the sort includes l_suppkey and the
    * region key because (l_orderkey, l_linenumber) alone is NOT unique in
    * the synthetic data — a tie with different suppliers could otherwise
    * let Spark and DuckDB pick different endpoints (r12 ADVICE). Memoized
    * per dir: all three path modes (and every bench rep) share one pick.
    */
  private val pathEndpointCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def pathSearchEndpoints(s: SparkSession, dir: String): (String, String) =
    pathEndpointCache.getOrElseUpdate(dir + "@" + s.hashCode, {
      val li = tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey")
      val cand = li
        .join(tbl(s, dir, "orders").select("o_orderkey", "o_custkey"),
          li("l_orderkey") === col("o_orderkey"))
        .join(tbl(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(tbl(s, dir, "nation").select(col("n_nationkey").as("cnk"),
          col("n_regionkey").as("crk")), col("c_nationkey") === col("cnk"))
        .join(tbl(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          li("l_suppkey") === col("s_suppkey"))
        .join(tbl(s, dir, "nation").select(col("n_nationkey").as("snk"),
          col("n_regionkey").as("srk")), col("s_nationkey") === col("snk"))
        .filter(col("crk") === col("srk"))
        .select(li("l_orderkey"), li("l_linenumber"), li("l_suppkey"), col("srk"))
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "srk")
        .limit(1).collect()(0)
      (s"urn:graft/lineitem/${cand.get(0)}/${cand.get(1)}",
        s"urn:graft/region/${cand.get(3)}")
    })

  /** Memoized full-text index per (sf dir, index name): the FIRST call
    * builds the persisted term-bucketed tables, repeat calls return the
    * already-built index. Bench reps 2..n (and hence the reported MEDIAN)
    * therefore time the indexed QUERY path only, while rep 1 (`cold`)
    * carries the one-time build — "index once, query many" measured the
    * way it runs in production (r10 VERDICT "What's wrong #1"). The table
    * name is salted with the dir hash so indexes from different scale
    * factors in one JVM never collide.
    */
  private val ftsIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      graft.pipeline.FullTextIndex]()
  private def ftsIndex(s: SparkSession, dir: String,
      name: String): graft.pipeline.FullTextIndex =
    ftsIndexCache.computeIfAbsent((dir, name), { _ =>
      graft.pipeline.FullTextIndex.build(tbl(s, dir, "documents"),
        "doc_id", "text",
        s"${name}_${java.lang.Integer.toHexString(dir.hashCode)}")
    })

  /** Persisted resource-edge index (r14): ensured once per sf dir — the
    * store-open batch op. First-ever run writes the artifact; every later
    * session (and every later call here) opens parquet instead of paying
    * the full-store scan + distinct on the path-search cold rep.
    */
  private val edgeIdxEnsured =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def ensureEdgeIndex(cat: graft.sources.GraphCatalog,
      dir: String): Unit = {
    edgeIdxEnsured.computeIfAbsent(dir, { _ => cat.ensureEdgeIndex(); true })
    ()
  }

  /** ANALYZED (stopword + stemmer) persisted index — same memoization. */
  private def ftsIndexAnalyzed(s: SparkSession, dir: String,
      name: String): graft.pipeline.FullTextIndex =
    ftsIndexCache.computeIfAbsent((dir, name), { _ =>
      graft.pipeline.FullTextIndex.build(tbl(s, dir, "documents"),
        "doc_id", "text",
        s"${name}_${java.lang.Integer.toHexString(dir.hashCode)}",
        analyzed = true)
    })

  /** Memoized persisted IVF index per (sf dir, name) — same "build once,
    * probe many" bench semantics as [[ftsIndex]].
    */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      graft.pipeline.IvfIndex]()
  private def ivfIndex(s: SparkSession, dir: String, name: String,
      nlist: Int): graft.pipeline.IvfIndex =
    ivfIndexCache.computeIfAbsent((dir, name), { _ =>
      graft.pipeline.IvfIndex.build(tbl(s, dir, "embeddings"),
        "vec_id", "embedding",
        s"${name}_${java.lang.Integer.toHexString(dir.hashCode)}",
        nlist = nlist)
    })

  // ------------------------------------------------------------ flagship

  /** Flagship: the reference README's star query shape (`README.md:70-78`) —
    * `?f a Facility; name ?n; hasType ?t` ⇒ customer star + chain to nation,
    * ordered, LIMIT 10.
    */
  def entry(spark: SparkSession): DataFrame = {
    val (_, compiler) = ctx(spark, "/root/testdata/sf0.001")
    val op = Slice(0, Some(10), OrderBy(Seq((E.v("name"), true)),
      Bgp(Seq(
        TriplePattern(V("c"), I(Rdf.RdfType), cls("customer")),
        TriplePattern(V("c"), pred("customer", "c_name"), V("name")),
        TriplePattern(V("c"), pred("customer", "c_mktsegment"), V("seg")),
        TriplePattern(V("c"), pred("customer", "c_nationkey"), V("n")),
        TriplePattern(V("n"), pred("nation", "n_name"), V("nation"))))))
    val sol = compiler.compile(op)
    sol.df.select(sv(sol.df, "name", "c_name"), sv(sol.df, "seg", "c_mktsegment"),
      sv(sol.df, "nation", "n_name"))
  }

  // ------------------------------------------------------------ queries

  type Q = (SparkSession, String) => DataFrame

  private def algebraQueries: Map[String, Q] = Map(
    // S2: single triple-pattern scan, routed to a 2-column parquet scan.
    "s2_scan" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Bgp(Seq(TriplePattern(V("c"), pred("customer", "c_name"), V("name")))))
      ordered(sol.df.select(sv(sol.df, "name", "c_name")))
    }),
    // P1: projection of a subset of variables.
    "p1_projection" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Project(Seq("name", "seg"), Bgp(Seq(
        TriplePattern(V("c"), pred("customer", "c_name"), V("name")),
        TriplePattern(V("c"), pred("customer", "c_mktsegment"), V("seg")),
        TriplePattern(V("c"), pred("customer", "c_acctbal"), V("bal"))))))
      ordered(sol.df.select(sv(sol.df, "name", "c_name"), sv(sol.df, "seg", "c_mktsegment")))
    }),
    // P3: computed projection (BIND) — revenue = price * (1 - discount).
    "p3_extend" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val op = Extend("rev",
        r => E.numTerm(r("price").getField("num") * (lit(1.0) - r("disc").getField("num"))),
        Bgp(Seq(
          TriplePattern(V("l"), pred("lineitem", "l_orderkey"), V("ok")),
          TriplePattern(V("l"), pred("lineitem", "l_linenumber"), V("ln")),
          TriplePattern(V("l"), pred("lineitem", "l_extendedprice"), V("price")),
          TriplePattern(V("l"), pred("lineitem", "l_discount"), V("disc")))))
      val sol = c.compile(op)
      // `l_orderkey` is an FK (object = IRI) — recover the key from the IRI.
      ordered(sol.df.select(
        regexp_extract(sol.df("ok").getField("value"), "(\\d+)$", 1).cast("bigint").as("l_orderkey"),
        iv(sol.df, "ln", "l_linenumber"), nv(sol.df, "rev", "revenue")))
    }),
    // P4: numeric range FILTER (the reference's spatial query shape,
    // facilities.ttl:211-218).
    "p4_filter_range" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val op = FilterOp(
        E.and(E.gt(E.v("bal"), E.lift(E.termLit(RdfTerm.dbl(1000.0)))),
          E.lt(E.v("bal"), E.lift(E.termLit(RdfTerm.dbl(5000.0))))),
        Bgp(Seq(
          TriplePattern(V("c"), pred("customer", "c_name"), V("name")),
          TriplePattern(V("c"), pred("customer", "c_acctbal"), V("bal")))))
      val sol = c.compile(op)
      ordered(sol.df.select(sv(sol.df, "name", "c_name"), nv(sol.df, "bal", "c_acctbal")))
    }),
    // P6: FILTER EXISTS (left-semi).
    "p6_exists" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(ExistsOp(
        Bgp(Seq(TriplePattern(V("n"), pred("nation", "n_name"), V("name")))),
        Bgp(Seq(TriplePattern(V("sup"), pred("supplier", "s_nationkey"), V("n")))),
        positive = true))
      ordered(sol.df.select(sv(sol.df, "name", "n_name")))
    }),
    // P7: FILTER NOT EXISTS (left-anti) — reference Q2 shape
    // (facilities.ttl:195-202, "areas with no parks"). Subtracted side is
    // restricted to EUROPE's suppliers so the answer is NON-EMPTY (≈20 of 25
    // nations) and scale-stable — the r9 unrestricted version matched on
    // 0 rows both sides and proved nothing (r9 VERDICT).
    "p7_not_exists" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(ExistsOp(
        Bgp(Seq(TriplePattern(V("n"), pred("nation", "n_name"), V("name")))),
        Bgp(Seq(
          TriplePattern(V("sup"), pred("supplier", "s_nationkey"), V("n")),
          TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r")),
          TriplePattern(V("r"), pred("region", "r_name"), L.str("EUROPE")))),
        positive = false))
      ordered(sol.df.select(sv(sol.df, "name", "n_name")))
    }),
    // J1: star BGP — collapses to ONE part scan (no self-joins).
    "j1_star_bgp" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Bgp(Seq(
        TriplePattern(V("p"), I(Rdf.RdfType), cls("part")),
        TriplePattern(V("p"), pred("part", "p_name"), V("name")),
        TriplePattern(V("p"), pred("part", "p_brand"), V("brand")),
        TriplePattern(V("p"), pred("part", "p_type"), V("typ")))))
      ordered(sol.df.select(sv(sol.df, "name", "p_name"),
        sv(sol.df, "brand", "p_brand"), sv(sol.df, "typ", "p_type")))
    }),
    // J2: chain join — 2-hop graph traversal customer→nation→region.
    "j2_chain_join" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Bgp(Seq(
        TriplePattern(V("c"), pred("customer", "c_name"), V("cn")),
        TriplePattern(V("c"), pred("customer", "c_nationkey"), V("n")),
        TriplePattern(V("n"), pred("nation", "n_name"), V("nn")),
        TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r")),
        TriplePattern(V("r"), pred("region", "r_name"), V("rn")))))
      ordered(sol.df.select(sv(sol.df, "cn", "c_name"), sv(sol.df, "nn", "n_name"),
        sv(sol.df, "rn", "r_name")))
    }),
    // J3: OPTIONAL with filter INSIDE the join condition (SURVEY §7.4 #2).
    "j3_optional" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(LeftJoin(
        Bgp(Seq(TriplePattern(V("cust"), pred("customer", "c_name"), V("cn")))),
        Bgp(Seq(
          TriplePattern(V("o"), pred("orders", "o_custkey"), V("cust")),
          TriplePattern(V("o"), pred("orders", "o_orderkey"), V("ok")),
          TriplePattern(V("o"), pred("orders", "o_totalprice"), V("tp")))),
        cond = Some(r => r("tp").getField("num") > 450000.0)))
      val df = sol.df
      ordered(df.select(sv(df, "cn", "c_name"), lv(df, "ok", "o_orderkey"),
        nv(df, "tp", "o_totalprice")))
    }),
    // J4: MINUS (compatible-solution removal). Subtracted side restricted to
    // ASIA's suppliers so the answer is non-empty and discriminating at
    // every scale (r9 VERDICT "vacuous oracle" fix); shared var = ?n.
    "j4_minus" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(MinusOp(
        Bgp(Seq(TriplePattern(V("n"), pred("nation", "n_name"), V("name")))),
        Bgp(Seq(
          TriplePattern(V("sup"), pred("supplier", "s_nationkey"), V("n")),
          TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r")),
          TriplePattern(V("r"), pred("region", "r_name"), L.str("ASIA"))))))
      ordered(sol.df.select(sv(sol.df, "name", "n_name")))
    }),
    // J5: VALUES inline-data join (broadcast).
    "j5_values" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(JoinOp(
        Bgp(Seq(
          TriplePattern(V("cust"), pred("customer", "c_name"), V("name")),
          TriplePattern(V("cust"), pred("customer", "c_mktsegment"), V("seg")))),
        ValuesOp(Seq("seg"), Seq(Seq(Some(RdfTerm.str("BUILDING"))),
          Seq(Some(RdfTerm.str("AUTOMOBILE")))))))
      ordered(sol.df.select(sv(sol.df, "name", "c_name"), sv(sol.df, "seg", "c_mktsegment")))
    }),
    // J6: theta join — equi on nation + inequality on balances.
    "j6_theta_join" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val op = FilterOp(E.gt(E.v("sb"), E.v("cb")), Bgp(Seq(
        TriplePattern(V("sup"), pred("supplier", "s_nationkey"), V("n")),
        TriplePattern(V("sup"), pred("supplier", "s_name"), V("sn")),
        TriplePattern(V("sup"), pred("supplier", "s_acctbal"), V("sb")),
        TriplePattern(V("cust"), pred("customer", "c_nationkey"), V("n")),
        TriplePattern(V("cust"), pred("customer", "c_name"), V("cn")),
        TriplePattern(V("cust"), pred("customer", "c_acctbal"), V("cb")))))
      val sol = c.compile(op)
      ordered(sol.df.select(sv(sol.df, "sn", "s_name"), sv(sol.df, "cn", "c_name"),
        nv(sol.df, "sb", "s_acctbal"), nv(sol.df, "cb", "c_acctbal")))
    }),
    // A1: global COUNT(*) over ?s ?p ?o — the reference's verification query
    // (init-graphdb.sh:133).
    "a1_count_all" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Group(Nil, Seq("n" -> Aggs.countStar),
        Bgp(Seq(TriplePattern(V("s"), V("p"), V("o"))))))
      sol.df.select(cnt(sol.df, "n", "n"))
    }),
    // A2: GROUP BY + COUNT — reference Q1 shape (facilities.ttl:190-193).
    "a2_group_count" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Group(Seq("st"), Seq("n" -> Aggs.countStar),
        Bgp(Seq(TriplePattern(V("o"), pred("orders", "o_orderstatus"), V("st"))))))
      ordered(sol.df.select(sv(sol.df, "st", "o_orderstatus"), cnt(sol.df, "n", "n")))
    }),
    // A3: SUM/AVG/MIN/MAX with numeric promotion (sums integer-valued ⇒
    // order-independent in double).
    "a3_stats" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Group(Seq("rf"), Seq(
        "sum_qty" -> Aggs.sumNum("q"), "avg_qty" -> Aggs.avgNum("q"),
        "min_price" -> Aggs.minNum("p"), "max_price" -> Aggs.maxNum("p")),
        Bgp(Seq(
          TriplePattern(V("l"), pred("lineitem", "l_returnflag"), V("rf")),
          TriplePattern(V("l"), pred("lineitem", "l_quantity"), V("q")),
          TriplePattern(V("l"), pred("lineitem", "l_extendedprice"), V("p"))))))
      val df = sol.df
      ordered(df.select(sv(df, "rf", "l_returnflag"), nv(df, "sum_qty", "sum_qty"),
        nv(df, "avg_qty", "avg_qty"), nv(df, "min_price", "min_price"),
        nv(df, "max_price", "max_price")))
    }),
    // A4: COUNT(DISTINCT ?v).
    "a4_count_distinct" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Group(Nil, Seq("n" -> Aggs.countDistinctVar("seg")),
        Bgp(Seq(TriplePattern(V("c"), pred("customer", "c_mktsegment"), V("seg"))))))
      sol.df.select(cnt(sol.df, "n", "n"))
    }),
    // A5: GROUP_CONCAT (sorted — a legal refinement of SPARQL's unspecified
    // order, and the only oracle-comparable one).
    "a5_group_concat" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Group(Seq("r"), Seq("nations" -> Aggs.groupConcat("nm", ",")),
        Bgp(Seq(
          TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r")),
          TriplePattern(V("n"), pred("nation", "n_name"), V("nm"))))))
      val df = sol.df
      ordered(df.select(
        regexp_extract(df("r").getField("value"), "(\\d+)$", 1).cast("int").as("n_regionkey"),
        sv(df, "nations", "nations")))
    }),
    // A6: SAMPLE — min is a deterministic legal sample.
    "a6_sample" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Group(Seq("r"), Seq("sample_name" -> Aggs.sample("nm")),
        Bgp(Seq(
          TriplePattern(V("n"), pred("nation", "n_regionkey"), V("r")),
          TriplePattern(V("n"), pred("nation", "n_name"), V("nm"))))))
      val df = sol.df
      ordered(df.select(
        regexp_extract(df("r").getField("value"), "(\\d+)$", 1).cast("int").as("n_regionkey"),
        sv(df, "sample_name", "sample_name")))
    }),
    // A7: HAVING (post-aggregation filter).
    "a7_having" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(FilterOp(r => r("n").getField("num") > 500.0,
        Group(Seq("pri"), Seq("n" -> Aggs.countStar),
          Bgp(Seq(TriplePattern(V("o"), pred("orders", "o_orderpriority"), V("pri")))))))
      ordered(sol.df.select(sv(sol.df, "pri", "o_orderpriority"), cnt(sol.df, "n", "n")))
    }),
    // O1+O2+O4: ORDER BY DESC + LIMIT — plans TakeOrderedAndProject.
    "o1_order_limit" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Slice(0, Some(10),
        OrderBy(Seq((E.v("tp"), false), (E.v("ok"), true)),
          Bgp(Seq(
            TriplePattern(V("o"), pred("orders", "o_orderkey"), V("ok")),
            TriplePattern(V("o"), pred("orders", "o_totalprice"), V("tp")))))))
      sol.df.select(lv(sol.df, "ok", "o_orderkey"), nv(sol.df, "tp", "o_totalprice"))
    }),
    // O3: OFFSET.
    "o3_offset" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Slice(10, Some(10),
        OrderBy(Seq((E.v("tp"), false), (E.v("ok"), true)),
          Bgp(Seq(
            TriplePattern(V("o"), pred("orders", "o_orderkey"), V("ok")),
            TriplePattern(V("o"), pred("orders", "o_totalprice"), V("tp")))))))
      sol.df.select(lv(sol.df, "ok", "o_orderkey"), nv(sol.df, "tp", "o_totalprice"))
    }),
    // O5: DISTINCT.
    "o5_distinct" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(DistinctOp(Project(Seq("seg"),
        Bgp(Seq(TriplePattern(V("c"), pred("customer", "c_mktsegment"), V("seg")))))))
      ordered(sol.df.select(sv(sol.df, "seg", "c_mktsegment")))
    }),
    // U1: UNION (bag semantics = UNION ALL).
    "u1_union" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(UnionOp(
        Bgp(Seq(
          TriplePattern(V("cust"), pred("customer", "c_mktsegment"), L.str("BUILDING")),
          TriplePattern(V("cust"), pred("customer", "c_name"), V("name")))),
        Bgp(Seq(TriplePattern(V("sup"), pred("supplier", "s_name"), V("name"))))))
      ordered(sol.df.select(sv(sol.df, "name", "name")))
    }),
    // G1: rdf:type membership over every mapped class (+A2 group-count).
    "g1_type_counts" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Group(Seq("cls"), Seq("n" -> Aggs.countStar),
        Bgp(Seq(TriplePattern(V("x"), I(Rdf.RdfType), V("cls"))))))
      ordered(sol.df.select(sv(sol.df, "cls", "cls"), cnt(sol.df, "n", "n")))
    }),
    // G2: GRAPH-scoped count (context index analog) — per-table named graphs.
    "g2_graph_count" -> ((s, dir) => {
      val cat2 = new GraphCatalog(s)
      DirectMapper.testdataSpecs.toSeq.sortBy(_._1).foreach { case (t, spec0) =>
        val spec = spec0.copy(graph = s"urn:graft:g:$t")
        scala.util.Try(tbl(s, dir, t)).foreach(df => cat2.register(spec, df))
      }
      val c2 = new Compiler(cat2)
      val sol = c2.compile(Group(Nil, Seq("n" -> Aggs.countStar),
        Bgp(Seq(TriplePattern(V("s"), V("p"), V("o"), I("urn:graft:g:customer"))))))
      sol.df.select(cnt(sol.df, "n", "n"))
    }),
    // G3: sequence property path — customer (c_nationkey/n_regionkey) region.
    "g3_path_seq" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val op = JoinOp(
        JoinOp(
          PropertyPaths.toOp(V("cust"),
            PSeq(Pred(DirectMapper.predIri("customer", "c_nationkey")),
              Pred(DirectMapper.predIri("nation", "n_regionkey"))), V("r")),
          Bgp(Seq(TriplePattern(V("cust"), pred("customer", "c_custkey"), V("ck"))))),
        Bgp(Seq(TriplePattern(V("r"), pred("region", "r_name"), V("rn")))))
      val sol = c.compile(op)
      ordered(sol.df.select(lv(sol.df, "ck", "c_custkey"), sv(sol.df, "rn", "r_name")))
    }),
    // G4: alternative + inverse paths — nation 7's customer|supplier names.
    "g4_path_alt_inv" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val nation7 = I(s"${DirectMapper.Base}/nation/7")
      val op = PropertyPaths.toOp(nation7,
        PAlt(
          PSeq(PInv(Pred(DirectMapper.predIri("customer", "c_nationkey"))),
            Pred(DirectMapper.predIri("customer", "c_name"))),
          PSeq(PInv(Pred(DirectMapper.predIri("supplier", "s_nationkey"))),
            Pred(DirectMapper.predIri("supplier", "s_name")))),
        V("name"))
      val sol = c.compile(op)
      ordered(sol.df.select(sv(sol.df, "name", "name")))
    }),
    // G4b: zero-or-one path `?` — one-hop ∪ identity ONLY; the oracle has no
    // customer→region rows, so a hash match proves multi-hop pairs are absent
    // (the defining difference from `*`). Exercises the TEXT parser's `?`.
    "g4_path_zero_or_one" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?s ?o WHERE {
          |  ?s (<urn:graft/customer#c_nationkey>|<urn:graft/nation#n_regionkey>)? ?o
          |}""".stripMargin)
      ordered(df.select(df("s").getField("value").as("src"),
        df("o").getField("value").as("dst")))
    }),
    // G5: transitive closure (+) over locatedIn edges — semi-naive fixpoint.
    "g5_path_closure" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val custEdges = c.compile(Bgp(Seq(
        TriplePattern(V("a"), pred("customer", "c_nationkey"), V("b")))))
      val natEdges = c.compile(Bgp(Seq(
        TriplePattern(V("a"), pred("nation", "n_regionkey"), V("b")))))
      def edgeDf(sol: Sol) = sol.df.select(
        sol.df("a").getField("value").as("src"), sol.df("b").getField("value").as("dst"))
      val edges = edgeDf(custEdges).unionAll(edgeDf(natEdges))
      ordered(PropertyPaths.closure(s, edges).select(col("src"), col("dst")))
    }),
    // G6: negated property set — all nation-subject triples except n_name.
    "g6_negated_set" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val op = FilterOp(r => !r("p").getField("value").isin(
        DirectMapper.predIri("nation", "n_name"), Rdf.RdfType),
        Bgp(Seq(TriplePattern(V("n"), I(Rdf.RdfType), cls("nation")),
          TriplePattern(V("n"), V("p"), V("o")))))
      val sol = c.compile(op)
      ordered(sol.df.select(sv(sol.df, "n", "s"), sv(sol.df, "p", "p"),
        sv(sol.df, "o", "o")))
    }),
    // G6b (r10): negated property set with an INVERSE member over a small
    // two-predicate graph (§9.1 alt/inv decomposition): the forward part
    // matches the `in` edges (tag excluded), the inverse part matches the
    // REVERSE of the tag edges (in excluded) — union of both directions.
    "g6_negated_inverse" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_regionkey").collect()
      val quads = rows.toSeq.flatMap { r =>
        val n = s"urn:g/n${r.getInt(0)}"
        val g = s"urn:g/r${r.getInt(1)}"
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, n, "urn:x:in", RdfTerm.iri(g)),
          graft.model.Quad(Rdf.DefaultGraph, n, "urn:x:tag",
            RdfTerm.iri(s"urn:g/t${r.getInt(0) % 3}")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """SELECT ?x ?y WHERE { ?x !(<urn:x:tag>|^<urn:x:in>) ?y }""")
      ordered(df.select(sv(df, "x", "x"), sv(df, "y", "y")))
    }),
    // G7: ASK — existence as a 1-row boolean.
    "g7_ask" -> ((s, dir) => {
      val (_, c) = ctx(s, dir)
      val sol = c.compile(Slice(0, Some(1), FilterOp(
        E.gt(E.v("bal"), E.lift(E.termLit(RdfTerm.dbl(9000.0)))),
        Bgp(Seq(TriplePattern(V("cust"), pred("customer", "c_acctbal"), V("bal")))))))
      val exists = !sol.df.isEmpty
      s.range(1).select(lit(exists).as("result"))
    }),
    // EP1: SPARQL TEXT → parser → algebra → compiler, end to end.
    "sp_select_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?name ?seg WHERE {
          |  ?c <urn:graft/customer#c_name> ?name ;
          |     <urn:graft/customer#c_mktsegment> ?seg .
          |}""".stripMargin)
      ordered(df.select(df("name").getField("value").as("c_name"),
        df("seg").getField("value").as("c_mktsegment")))
    }),
    "sp_agg_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?st (COUNT(?o) AS ?n) WHERE {
          |  ?o <urn:graft/orders#o_orderstatus> ?st .
          |} GROUP BY ?st""".stripMargin)
      ordered(df.select(df("st").getField("value").as("o_orderstatus"),
        df("n").getField("num").cast("bigint").as("n")))
    }),
    "sp_filter_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?name ?bal WHERE {
          |  ?c <urn:graft/customer#c_name> ?name ;
          |     <urn:graft/customer#c_acctbal> ?bal .
          |  FILTER(?bal > 1000.0 && ?bal < 5000.0)
          |}""".stripMargin)
      ordered(df.select(df("name").getField("value").as("c_name"),
        df("bal").getField("num").as("c_acctbal")))
    }),
    // EP1: OPTIONAL whose FILTER references a LEFT-side var — must be lifted
    // into the LeftJoin condition (SPARQL 18.2.2.2), not applied to the RHS.
    "sp_optional_filter_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?cn ?ok WHERE {
          |  ?c <urn:graft/customer#c_name> ?cn ;
          |     <urn:graft/customer#c_acctbal> ?bal .
          |  OPTIONAL {
          |    ?o <urn:graft/orders#o_custkey> ?c ;
          |       <urn:graft/orders#o_orderkey> ?ok ;
          |       <urn:graft/orders#o_totalprice> ?tp .
          |    FILTER(?tp > ?bal * 50.0)
          |  }
          |}""".stripMargin)
      ordered(df.select(df("cn").getField("value").as("cn"),
        df("ok").getField("value").cast("bigint").as("ok")))
    }),
    // EP1: subquery { SELECT … GROUP BY } joined with an outer pattern —
    // nested aggregation through the text surface.
    "sp_subquery" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?rn ?n WHERE {
          |  ?r <urn:graft/region#r_name> ?rn .
          |  { SELECT ?r (COUNT(?nat) AS ?n) WHERE {
          |      ?nat <urn:graft/nation#n_regionkey> ?r .
          |    } GROUP BY ?r }
          |}""".stripMargin)
      ordered(df.select(df("rn").getField("value").as("rn"),
        df("n").getField("num").cast("bigint").as("n")))
    }),
    // A3b: STRING MIN/MAX through the TEXT parser — term-ordered aggregation
    // returning the witness term (numeric-only min/max would yield NULL here).
    "a3_minmax_str" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?seg (MIN(?name) AS ?mn) (MAX(?name) AS ?mx) WHERE {
          |  ?c <urn:graft/customer#c_mktsegment> ?seg ;
          |     <urn:graft/customer#c_name> ?name .
          |} GROUP BY ?seg""".stripMargin)
      ordered(df.select(df("seg").getField("value").as("seg"),
        df("mn").getField("value").as("mn"), df("mx").getField("value").as("mx")))
    }),
    // A4b: COUNT(DISTINCT *) — distinct SOLUTIONS (via a projecting subquery,
    // so DISTINCT actually bites: 5 segments, not |customer| rows).
    "a4_count_distinct_star" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT (COUNT(DISTINCT *) AS ?n) WHERE {
          |  { SELECT ?seg WHERE { ?c <urn:graft/customer#c_mktsegment> ?seg . } }
          |}""".stripMargin)
      df.select(df("n").getField("num").cast("bigint").as("n"))
    }),
    // EP1: blank-node property list through the text parser — the anonymous
    // order `[ o_custkey ?c ; o_totalprice ?tp ]` is a non-distinguished var;
    // one row per qualifying order (bag semantics, like the SQL join).
    "sp_bnode_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?name ?tp WHERE {
          |  [ <urn:graft/orders#o_custkey> ?c ;
          |    <urn:graft/orders#o_totalprice> ?tp ] .
          |  ?c <urn:graft/customer#c_name> ?name .
          |  FILTER(?tp > 400000.0)
          |}""".stripMargin)
      ordered(df.select(df("name").getField("value").as("c_name"),
        df("tp").getField("num").as("o_totalprice")))
    }),
    // EP1: FROM dataset clause — only the named graph's triples are visible,
    // so the nation-side of the UNION contributes NOTHING.
    "sp_from_text" -> ((s, dir) => {
      val cat2 = new GraphCatalog(s)
      DirectMapper.testdataSpecs.toSeq.sortBy(_._1).foreach { case (t, spec0) =>
        val spec = spec0.copy(graph = s"urn:graft:g:$t")
        scala.util.Try(tbl(s, dir, t)).foreach(df => cat2.register(spec, df))
      }
      val df = new Engine(cat2).select(
        """SELECT ?v FROM <urn:graft:g:customer> WHERE {
          |  { ?c <urn:graft/customer#c_name> ?v }
          |  UNION { ?n <urn:graft/nation#n_name> ?v }
          |}""".stripMargin)
      ordered(df.select(df("v").getField("value").as("v")))
    }),
    // EP1: FROM NAMED — GRAPH ?g ranges over exactly the two named graphs.
    "sp_from_named_text" -> ((s, dir) => {
      val cat2 = new GraphCatalog(s)
      DirectMapper.testdataSpecs.toSeq.sortBy(_._1).foreach { case (t, spec0) =>
        val spec = spec0.copy(graph = s"urn:graft:g:$t")
        scala.util.Try(tbl(s, dir, t)).foreach(df => cat2.register(spec, df))
      }
      val df = new Engine(cat2).select(
        """SELECT ?g (COUNT(*) AS ?n)
          |FROM NAMED <urn:graft:g:region> FROM NAMED <urn:graft:g:nation>
          |WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g""".stripMargin)
      ordered(df.select(df("g").getField("value").as("g"),
        df("n").getField("num").cast("bigint").as("n")))
    }),
    // S1b: RDF/XML source — render the (constant-size) nation table as
    // RDF/XML, parse it back with RdfXmlReader, count triples per predicate;
    // the oracle is the table's per-column counts. (The driver-side render is
    // the TEST FIXTURE; parsing runs through the same pure parser the
    // distributed wholetext loader uses.)
    "src_rdfxml" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0"?><rdf:RDF """)
      sb.append("""xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" """)
      sb.append("""xmlns:g="urn:graft/nation#">""")
      rows.foreach { r =>
        sb.append(s"""<rdf:Description rdf:about="urn:graft/nation/${r.get(0)}">""")
        sb.append(s"<g:n_name>${r.getString(1)}</g:n_name>")
        sb.append(s"""<g:n_regionkey rdf:resource="urn:graft/region/${r.get(2)}"/>""")
        sb.append("</rdf:Description>")
      }
      sb.append("</rdf:RDF>")
      val quads = graft.sources.RdfXmlReader.parse(sb.toString).toDS().toDF()
      ordered(quads.groupBy("p").agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // EP1: aggregates NESTED in a compound projection expression
    // (SUM/COUNT register as hidden Group outputs; the division is a
    // post-Group Extend). l_quantity sums are integer-valued ⇒ the double
    // division is order-independent and oracle-exact.
    "sp_agg_expr_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?rf ((SUM(?q) / COUNT(?q)) AS ?avg_qty) WHERE {
          |  ?l <urn:graft/lineitem#l_returnflag> ?rf ;
          |     <urn:graft/lineitem#l_quantity> ?q .
          |} GROUP BY ?rf""".stripMargin)
      ordered(df.select(df("rf").getField("value").as("rf"),
        df("avg_qty").getField("num").as("avg_qty")))
    }),
    // EP1: HAVING with a DIRECT aggregate expression (not a projected alias).
    "sp_having_agg_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?st (COUNT(*) AS ?n) WHERE {
          |  ?o <urn:graft/orders#o_orderstatus> ?st .
          |} GROUP BY ?st HAVING (COUNT(*) > 500)""".stripMargin)
      ordered(df.select(df("st").getField("value").as("st"),
        df("n").getField("num").cast("bigint").as("n")))
    }),
    // EP1: RDFterm-equal through the text parser — an IRI is NOT equal to a
    // same-spelled literal, `"a"@en != "a"`, numerics compare by value. The
    // oracle pins exactly 3 matches; spelling-only equality would return 5.
    "sp_term_equality" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?x WHERE {
          |  VALUES ?x { <urn:graft/region/1> "urn:graft/region/1" "a"@en "a"
          |              "05"^^<http://www.w3.org/2001/XMLSchema#integer> }
          |  FILTER(?x = <urn:graft/region/1> || ?x = "a" || ?x = 5)
          |}""".stripMargin)
      ordered(df.select(df("x").getField("value").as("x")))
    }),
    // EP1 (8.2): a dataset clause FIXES the named-graph set to the FROM NAMED
    // list — FROM with no FROM NAMED means GRAPH matches NOTHING (the r4
    // ADVICE medium finding; previously GRAPH ranged over every graph).
    "sp_graph_dataset_empty" -> ((s, dir) => {
      val cat2 = new GraphCatalog(s)
      DirectMapper.testdataSpecs.toSeq.sortBy(_._1).foreach { case (t, spec0) =>
        val spec = spec0.copy(graph = s"urn:graft:g:$t")
        scala.util.Try(tbl(s, dir, t)).foreach(df => cat2.register(spec, df))
      }
      val df = new Engine(cat2).select(
        """SELECT (COUNT(*) AS ?n) FROM <urn:graft:g:customer> WHERE {
          |  GRAPH ?g { ?s ?p ?o }
          |}""".stripMargin)
      df.select(df("n").getField("num").cast("bigint").as("n"))
    }),
    // EP1: `{ SELECT … } UNION { … }` — a subquery as a UNION arm.
    "sp_union_subquery" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?v WHERE {
          |  { SELECT ?v WHERE { ?r <urn:graft/region#r_name> ?v } }
          |  UNION { ?n <urn:graft/nation#n_name> ?v }
          |}""".stripMargin)
      ordered(df.select(df("v").getField("value").as("v")))
    }),
    // G4c: path endpoints carry FULL terms — a literal object of `p?` stays a
    // LITERAL (isLiteral filters it in; the pre-fix IRI re-kinding returned 0
    // rows here). One-hop (nation, name) plus zero-length (name, name).
    "g4_path_literal_kind" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?s ?o WHERE {
          |  ?s <urn:graft/nation#n_name>? ?o .
          |  FILTER(isLiteral(?o))
          |}""".stripMargin)
      ordered(df.select(df("s").getField("value").as("s"),
        df("o").getField("value").as("o")))
    }),
    // EP1 (18.2.2.2): FILTER EXISTS inside OPTIONAL joins on a LEFT-only var
    // (?r is bound only outside the OPTIONAL) — it must be lifted into the
    // LeftJoin condition: suppliers match only for ASIA nations; other
    // nations keep their bare row. RHS-scoped EXISTS (the pre-fix behavior)
    // would have no shared var and match every supplier.
    // EXISTS composed INSIDE expressions (r12 — the general form beyond
    // the outermost BIND): IF(EXISTS{…},…) in a BIND and EXISTS{…} || cmp
    // in a FILTER, evaluated via the same mark-join machinery.
    "f_exists_expr" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?nn ?cls WHERE {
          |  ?n <urn:graft/nation#n_name> ?nn ;
          |     <urn:graft/nation#n_regionkey> ?r .
          |  BIND(IF(EXISTS { ?r <urn:graft/region#r_name> "ASIA" },
          |          "asian", "other") AS ?cls)
          |  FILTER(EXISTS { ?r <urn:graft/region#r_name> "EUROPE" }
          |         || ?cls = "asian")
          |}""".stripMargin)
      ordered(df.select(df("nn").getField("value").as("nn"),
        df("cls").getField("value").as("cls")))
    }),
    // EXISTS in HAVING (r12 cont., tranche 24): the constraint correlates
    // on the GROUP key — European nations keep their customer counts
    "f_exists_having" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?n (COUNT(*) AS ?c) WHERE {
          |  ?cust <urn:graft/customer#c_nationkey> ?n .
          |} GROUP BY ?n
          |HAVING(EXISTS { ?n <urn:graft/nation#n_regionkey> ?r .
          |                ?r <urn:graft/region#r_name> "EUROPE" })""".stripMargin)
      ordered(df.select(df("n").getField("value").as("n"),
        df("c").getField("num").cast("bigint").as("c")))
    }),
    // EXISTS inside an AGGREGATE ARGUMENT (r12 cont. — the last expression
    // position besides OPTIONAL conditions): the mark binds against the
    // PRE-group solution (18.2.4 evaluates the argument per input row), so
    // the pattern correlates on ?n, a variable the GROUP BY collapses away.
    "f_exists_agg" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?rn (SUM(IF(EXISTS { ?c <urn:graft/customer#c_nationkey> ?n ;
          |                             <urn:graft/customer#c_acctbal> ?b .
          |                             FILTER(?b > 9900) }, 1, 0)) AS ?rich)
          |           (COUNT(*) AS ?total)
          |WHERE {
          |  ?n <urn:graft/nation#n_regionkey> ?r .
          |  ?r <urn:graft/region#r_name> ?rn .
          |} GROUP BY ?rn""".stripMargin)
      ordered(df.select(df("rn").getField("value").as("rn"),
        df("rich").getField("num").cast("bigint").as("rich"),
        df("total").getField("num").cast("bigint").as("total")))
    }),
    "sp_optional_exists_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """SELECT ?nn ?sn WHERE {
          |  ?n <urn:graft/nation#n_name> ?nn ;
          |     <urn:graft/nation#n_regionkey> ?r .
          |  OPTIONAL {
          |    ?s <urn:graft/supplier#s_nationkey> ?n ;
          |       <urn:graft/supplier#s_name> ?sn .
          |    FILTER EXISTS { ?r <urn:graft/region#r_name> "ASIA" }
          |  }
          |}""".stripMargin)
      ordered(df.select(df("nn").getField("value").as("nn"),
        df("sn").getField("value").as("sn")))
    }),
    // §2.11b: owl:sameAs identity smushing, with the sameAs pair DERIVED via
    // owl:FunctionalProperty (rdfsplus parity, reference init-graphdb.sh:51-55):
    // x natAlias nation/1 ∧ x natAlias alias ⇒ nation/1 sameAs alias ⇒ every
    // triple mentioning nation/1 is copied to the alias.
    "inf_sameas" -> ((s, dir) => {
      import s.implicits._
      val alias = "urn:graft/alias/n1"
      val nat1 = s"${DirectMapper.Base}/nation/1"
      val natAlias = "urn:graft/test#natAlias"
      val ontology = Seq(
        Quad(Rdf.DefaultGraph, natAlias, Rdf.RdfType, RdfTerm.iri(Rdf.OwlFunctional)),
        Quad(Rdf.DefaultGraph, "urn:graft/test/x", natAlias, RdfTerm.iri(nat1)),
        Quad(Rdf.DefaultGraph, "urn:graft/test/x", natAlias, RdfTerm.iri(alias))
      ).toDS().toDF()
      val facts = DirectMapper.quads(tbl(s, dir, "customer"),
        DirectMapper.testdataSpecs("customer"), withTypes = false)
      val closed = Inference.materialize(s, facts.unionAll(ontology))
      ordered(closed.filter(col("s") === alias || col("o.value") === alias)
        .groupBy("p").agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // §2.11: RDFS-Plus inference — domain/range typing + subclass closure.
    "inf_domain_range" -> ((s, dir) => {
      import s.implicits._
      val base = DirectMapper.Base
      def t(n: String) = s"$base/class/$n"
      val ontology = Seq(
        Quad(Rdf.DefaultGraph, DirectMapper.predIri("customer", "c_nationkey"),
          Rdf.RdfsDomain, RdfTerm.iri(t("customer"))),
        Quad(Rdf.DefaultGraph, DirectMapper.predIri("customer", "c_nationkey"),
          Rdf.RdfsRange, RdfTerm.iri(t("nation"))),
        Quad(Rdf.DefaultGraph, DirectMapper.predIri("nation", "n_regionkey"),
          Rdf.RdfsDomain, RdfTerm.iri(t("nation"))),
        Quad(Rdf.DefaultGraph, DirectMapper.predIri("nation", "n_regionkey"),
          Rdf.RdfsRange, RdfTerm.iri(t("region"))),
        Quad(Rdf.DefaultGraph, t("customer"), Rdf.RdfsSubClassOf, RdfTerm.iri(t("agent"))),
        Quad(Rdf.DefaultGraph, t("nation"), Rdf.RdfsSubClassOf, RdfTerm.iri(t("place"))),
        Quad(Rdf.DefaultGraph, t("region"), Rdf.RdfsSubClassOf, RdfTerm.iri(t("place")))
      ).toDS().toDF()
      // facts WITHOUT asserted types: every rdf:type below must be DERIVED.
      val facts = Seq("customer", "nation").map(n =>
        DirectMapper.quads(tbl(s, dir, n), DirectMapper.testdataSpecs(n), withTypes = false))
        .reduce(_.unionAll(_))
      val closed = Inference.materialize(s, facts.unionAll(ontology))
      ordered(closed.filter(col("p") === Rdf.RdfType)
        .groupBy(col("o.value").as("cls")).agg(count(lit(1)).as("n")))
    })
  )

  private def functionQueries: Map[String, Q] = Map(
    // §2.8 strings: STRLEN/UCASE/SUBSTR/CONTAINS/STRSTARTS/REPLACE/CONCAT.
    "f_strings" -> ((s, dir) => {
      val p = tbl(s, dir, "part")
      ordered(p.select(col("p_partkey").cast("bigint").as("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 8).as("pfx"),
        length(col("p_brand")).cast("int").as("blen"),
        col("p_name").contains("a").as("has_a"),
        col("p_type").startsWith("S").as("starts_s"),
        regexp_replace(col("p_type"), " ", "_").as("repl"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("cat")))
    }),
    // §2.8 numerics: ABS/ROUND/CEIL/FLOOR (round at 4 decimals — away from
    // the representability boundary of 2-decimal money values).
    "f_numeric" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      ordered(c.select(col("c_custkey").cast("bigint").as("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        round(col("c_acctbal"), 4).as("r4"),
        ceil(col("c_acctbal")).cast("double").as("cl"),
        floor(col("c_acctbal")).cast("double").as("fl")))
    }),
    // §2.8 XPath math: namespace (r14) through the text parser — the
    // replayable subset (sqrt is correctly rounded IEEE in both engines,
    // pi is the shared closest double, pow on small integers exact).
    "f_math" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """PREFIX math: <http://www.w3.org/2005/xpath-functions/math#>
          |PREFIX nat: <urn:graft/nation#>
          |SELECT ?k ?sq ?pw ?pi WHERE {
          |  ?s nat:n_nationkey ?k .
          |  BIND(math:sqrt(?k) AS ?sq)
          |  BIND(math:pow(?k, 2) AS ?pw)
          |  BIND(math:pi() AS ?pi)
          |}""".stripMargin)
      ordered(df.select(nv(df, "k", "k"), nv(df, "sq", "sq"),
        nv(df, "pw", "pw"), nv(df, "pi", "pi")))
    }),
    // Deterministic EPOCH SHUFFLE (r14 cont. — training-reproducibility
    // mechanics): the corpus order for an epoch is the sort by
    // md5(seed || doc_id) — a uniform, cluster-size-independent
    // permutation any worker can recompute. The query extracts the
    // epoch's FIRST SHARD (top-k by key = TakeOrderedAndProject —
    // scale-safe: no global row_number window, no single-partition
    // sort); a full epoch materializes as a range-partitioned sort by
    // the same key. The oracle replays the md5 order exactly.
    "smp_shuffle" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      docs.select(col("doc_id").cast("bigint").as("doc_id"),
          md5(concat(lit("epoch1:"), col("doc_id").cast("string"))).as("k"))
        .orderBy(col("k").asc_nulls_first, col("doc_id").asc_nulls_first)
        .limit(100)
    }),
    // Custom ruleset (r14, the reference's user-defined .pie rulesets —
    // the sixth repository config axis): a two-rule PIE-subset program
    // over the store's FK edges — rule 2 consumes rule 1's derivations,
    // so the result needs the semi-naive DATALOG fixpoint, not one pass.
    // The oracle replays the composed derivation as the relational join.
    "inf_custom_rules" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val quadsIn = cat.resourceEdges.select(
        lit(Rdf.DefaultGraph).as("graph"), col("src").as("s"), col("p"),
        graft.sources.DirectMapper.iriTerm(col("dst")).as("o"))
      val rules = graft.inference.CustomRules.parse(
        """Prefices { x : <urn:x:> }
          |Rules {
          |  Id: supp_nation
          |    li <urn:graft/lineitem#l_suppkey> s
          |    s <urn:graft/supplier#s_nationkey> n
          |    ---
          |    li x:suppNation n
          |  Id: supp_region
          |    li x:suppNation n
          |    n <urn:graft/nation#n_regionkey> r
          |    ---
          |    li x:suppRegion r
          |}""".stripMargin)
      val closed = graft.inference.CustomRules.materialize(s, quadsIn, rules)
      ordered(closed.filter(col("p") === "urn:x:suppRegion")
        .select(col("s").as("li"), col("o.value").as("region")))
    }),
    // Custom ruleset, r15 grammar extensions: LITERAL constants in rule
    // atoms (string guard, bare-integer guard — sameTerm matching against
    // the quad store's typed literals), an `Axioms { … }` block whose
    // ground fact feeds a rule premise, http:// IRIs coexisting with `//`
    // comments, and literal conclusions. Oracle replays each derivation
    // relationally.
    "inf_custom_rules2" -> ((s, dir) => {
      val quadsIn = DirectMapper.quads(tbl(s, dir, "nation"),
        DirectMapper.testdataSpecs("nation"), withTypes = false)
      val ruleset = graft.inference.CustomRules.parseRuleset(
        """Prefices { x : <http://graft.example/x#> } // http:// is content
          |Axioms {
          |  <urn:graft/cfg> x:flag "on" // ground fact, joins rule `audited`
          |}
          |Rules {
          |  Id: name_guard // string-literal premise + literal conclusion
          |    n <urn:graft/nation#n_name> "NATION_7"
          |    ---
          |    n x:isSeven "yes"
          |  Id: key_guard // bare-integer premise (typed xsd:integer)
          |    n <urn:graft/nation#n_nationkey> 0
          |    ---
          |    n x:keyZero "zero"
          |  Id: audited // axiom-gated: fires only because the axiom holds
          |    c x:flag "on"
          |    n <urn:graft/nation#n_regionkey> r
          |    ---
          |    n x:audited r
          |}""".stripMargin)
      val closed = graft.inference.CustomRules.materializeRuleset(
        s, quadsIn, ruleset)
      ordered(closed.filter(col("p").startsWith("http://graft.example/x#"))
        .select(col("s"), col("p"), col("o.value").as("o")))
    }),
    // Proof plugin (r15 — GraphDB's proof plugin): explain WHY statements
    // hold on an inference repository. The inferred type explains as a
    // rule_domain application (schema + data antecedents), the asserted
    // name as `explicit` (itself). One row per antecedent; the oracle
    // replays the rule applications relationally.
    "inf_explain" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val name0 = rows.find(_.get(0).toString.toLong == 0L).get.getString(1)
      val sb = new StringBuilder(
        """@prefix t: <urn:t#> .
          |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
          |t:name rdfs:domain t:Nation .
          |""".stripMargin)
      rows.foreach(r => sb.append(
        s"""<urn:graft/nation/${r.get(0)}> t:name "${r.getString(1)}" .""").append('\n'))
      val f = java.nio.file.Files.createTempFile("graft_proof", ".ttl")
      java.nio.file.Files.writeString(f, sb.toString)
      val repos = new graft.sources.Repositories(s)
      repos.create("pf", graft.sources.RepoConfig(inference = true))
      repos.load("pf", f.toString)
      val df = repos.engine("pf").select(
        s"""PREFIX proof: <http://www.ontotext.com/proof/>
           |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           |SELECT ?to ?rule ?as ?ap ?ao WHERE {
           |  VALUES (?ts ?tp ?to) {
           |    (<urn:graft/nation/0> rdf:type <urn:t#Nation>)
           |    (<urn:graft/nation/0> <urn:t#name> "$name0")
           |  }
           |  ?sol proof:explain (?ts ?tp ?to) .
           |  ?sol proof:rule ?rule . ?sol proof:subject ?as .
           |  ?sol proof:predicate ?ap . ?sol proof:object ?ao .
           |}""".stripMargin)
      ordered(df.select(sv(df, "to", "target_o"), sv(df, "rule", "rule"),
        sv(df, "as", "asub"), sv(df, "ap", "apred"), sv(df, "ao", "aobj")))
    }),
    // Custom ruleset CONSISTENCY sections (r15 — GraphDB .pie checks):
    // rule `audit0` audits only region-0 nations; consistency
    // `all_audited` demands an audit edge for every FK edge (violators =
    // nations outside region 0, evaluated against the CLOSURE), and the
    // conclusion-free `no_zero_key` forbids key 0 outright. The oracle
    // replays both violation sets relationally.
    "inf_consistency" -> ((s, dir) => {
      val quadsIn = DirectMapper.quads(tbl(s, dir, "nation"),
        DirectMapper.testdataSpecs("nation"), withTypes = false)
      val rs = graft.inference.CustomRules.parseRuleset(
        """Prefices { x : <urn:x:> }
          |Rules {
          |  Id: audit0
          |    n <urn:graft/nation#n_regionkey> <urn:graft/region/0>
          |    ---
          |    n x:audited <urn:graft/region/0>
          |  Consistency: all_audited
          |    n <urn:graft/nation#n_regionkey> r
          |    ---
          |    n x:audited r
          |  Consistency: no_zero_key
          |    n <urn:graft/nation#n_nationkey> 0
          |}""".stripMargin)
      val closed = graft.inference.CustomRules.materializeRuleset(
        s, quadsIn, rs)
      val v1 = graft.inference.CustomRules.violations(closed,
          rs.consistencies(0))
        .select(lit("all_audited").as("rule"),
          col("n").getField("value").as("node"),
          col("r").getField("value").as("other"))
      val v2 = graft.inference.CustomRules.violations(closed,
          rs.consistencies(1))
        .select(lit("no_zero_key").as("rule"),
          col("n").getField("value").as("node"),
          lit(null).cast("string").as("other"))
      ordered(v1.unionAll(v2))
    }),
    // SQL access (r14, the reference's "SQL access over JDBC" repository
    // feature): two SPARQL-backed SQL views — customers (nation IRI +
    // balance) and nations (IRI + name) — joined, filtered, and
    // aggregated through plain spark.sql. The views register LAZILY, so
    // the SQL WHERE pushes through the SPARQL boundary into the parquet
    // scans (PlanSpec pins it). Oracle replays the join on the raw keys.
    "sql_view_join" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val eng = new Engine(cat)
      eng.createSqlView("v_cust",
        """SELECT ?nat ?bal WHERE {
          |  ?c <urn:graft/customer#c_acctbal> ?bal .
          |  ?c <urn:graft/customer#c_nationkey> ?nat . }""".stripMargin,
        Seq("nat" -> "string", "bal" -> "double"))
      eng.createSqlView("v_nat",
        """SELECT ?n ?nname WHERE {
          |  ?n <urn:graft/nation#n_name> ?nname . }""".stripMargin,
        Seq("n" -> "string", "nname" -> "string"))
      s.sql("""SELECT nname AS nation, count(*) AS cnt,
              |  cast(sum(cast(bal AS decimal(18,2))) AS double) AS total_bal
              |FROM v_cust JOIN v_nat ON v_cust.nat = v_nat.n
              |WHERE bal > 1000.0
              |GROUP BY nname
              |ORDER BY nation NULLS FIRST""".stripMargin)
    }),
    // §2.8 hashes: MD5/SHA256.
    "f_hash" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(d.select(col("doc_id").cast("bigint").as("doc_id"),
        md5(col("text")).as("h_md5"), sha2(col("text"), 256).as("h_sha")))
    }),
    // §2.8 date/time accessors: YEAR/MONTH/DAY.
    "f_datetime" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      ordered(o.select(col("o_orderkey").cast("bigint").as("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("y"),
        month(col("o_orderdate")).cast("int").as("m"),
        dayofmonth(col("o_orderdate")).cast("int").as("d")))
    }),
    // §2.8 functional forms: IF/COALESCE/IN.
    "f_conditional" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      ordered(c.select(col("c_custkey").cast("bigint").as("c_custkey"),
        when(col("c_acctbal") < 0, lit("neg"))
          .when(col("c_acctbal") < 5000, lit("mid"))
          .otherwise(lit("high")).as("bucket"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg2"),
        col("c_mktsegment").isin("MACHINERY", "FURNITURE").as("in_set")))
    }),
    // §2.8 / 17.5 XPath constructor casts through the SPARQL engine:
    // integer parse, double parse, boolean (only k=0's "0" is castable —
    // every other value errors to unbound), string-of-IRI.
    "f_casts" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:num", RdfTerm.str((k * 10).toString)),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:dec", RdfTerm.str(s"$k.25")),
          // r17: xsd:dateTime constructor input (valid lexical per key)
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:dtl", RdfTerm.str(
              f"2024-03-0${k % 7 + 1}T10:30:0${k % 10}Z")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?s ?i ?d ?b ?t ?dtv ?dts WHERE {
          |  ?s <urn:x:num> ?v ; <urn:x:dec> ?w ; <urn:x:dtl> ?e .
          |  BIND(xsd:dateTime(?e) AS ?dt)
          |  BIND(STR(?dt) AS ?dtv)
          |  BIND(SECONDS(?dt) AS ?dts)
          |  BIND(xsd:integer(?v) AS ?i)
          |  BIND(xsd:double(?w) AS ?d)
          |  BIND(xsd:boolean(?v) AS ?b)
          |  BIND(xsd:string(?s) AS ?t)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "i", "i"), sv(df, "d", "d"),
        sv(df, "b", "b"), sv(df, "t", "t"), sv(df, "dtv", "dtv"),
        df("dts").getField("num").cast("bigint").as("dts")))
    }),
    // §2.8 XPath temporal arithmetic (r18 — op:subtract-dateTimes →
    // xsd:dayTimeDuration with the XPath CANONICAL lexical, duration
    // add-back to a dateTime, unary negation, numeric scaling, and
    // duration÷duration → decimal). Fixtures are whole-minute offsets per
    // nation key so DuckDB replays the canonical D/T/H/M composition with
    // integer string algebra.
    "f_duration" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val end = f"2024-03-${1 + k}%02dT${(k * 7) % 24}%02d:${(k * 13) % 60}%02d:00Z"
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:s", RdfTerm.typed("2024-03-01T00:00:00Z", Rdf.XsdDateTime)),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:e", RdfTerm.typed(end, Rdf.XsdDateTime)))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?s ?dl ?dneg ?adv ?scaled ?ratio ?cmp WHERE {
          |  ?s <urn:x:s> ?a ; <urn:x:e> ?b .
          |  BIND(?b - ?a AS ?d)
          |  BIND(STR(?d) AS ?dl)
          |  BIND(STR(?a - ?b) AS ?dneg)
          |  BIND(STR(?a + ?d) AS ?adv)
          |  BIND(STR(?d * 2) AS ?scaled)
          |  BIND(?d / "PT1M"^^xsd:dayTimeDuration AS ?ratio)
          |  BIND(STR(?d > "P2D"^^xsd:dayTimeDuration) AS ?cmp)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "dl", "dl"),
        sv(df, "dneg", "dneg"), sv(df, "adv", "adv"),
        sv(df, "scaled", "scaled"),
        df("ratio").getField("num").cast("bigint").as("ratio"),
        sv(df, "cmp", "cmp")))
    }),
    // §2.8 xsd:yearMonthDuration (r18 — the calendar-month family):
    // month-adds CLAMP day-of-month (the Jan-31 base exercises Feb), 2×
    // scaling recomposes the canonical Y/M lexical, ÷P1M is the month
    // count, negation and an order test. DuckDB replays the clamping with
    // INTERVAL month arithmetic and the lexicals with integer algebra.
    "f_ymduration" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:b", RdfTerm.typed("2024-01-31T10:00:00Z",
              Rdf.XsdDateTime)),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:ym", RdfTerm.typed(s"P${k}M",
              Rdf.XsdYearMonthDuration)))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?s ?adv ?scaled ?ratio ?neg ?cmp WHERE {
          |  ?s <urn:x:b> ?b ; <urn:x:ym> ?d .
          |  BIND(STR(?b + ?d) AS ?adv)
          |  BIND(STR(?d * 2) AS ?scaled)
          |  BIND(?d / "P1M"^^xsd:yearMonthDuration AS ?ratio)
          |  BIND(STR(-?d) AS ?neg)
          |  BIND(STR(?d > "P1Y"^^xsd:yearMonthDuration) AS ?cmp)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "adv", "adv"),
        sv(df, "scaled", "scaled"),
        df("ratio").getField("num").cast("bigint").as("ratio"),
        sv(df, "neg", "neg"), sv(df, "cmp", "cmp")))
    }),
    // §2.8 xsd:float on the 17.3 promotion ladder (r18): DuckDB's REAL is
    // the same IEEE single, so the oracle replays the value-space split —
    // float(k.1) vs double(k.1) ordering flips with k's rounding
    // direction — plus promotion datatypes, integer truncation, and a
    // float-add lexical (both engines print shortest-roundtrip).
    "f_float" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:f", RdfTerm.typed(s"$k.1", Rdf.XsdFloat)),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:d", RdfTerm.typed(s"$k.1", Rdf.XsdDouble)))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?s ?pf ?pd ?ti ?gt ?fl WHERE {
          |  ?s <urn:x:f> ?f ; <urn:x:d> ?d .
          |  BIND(STR(DATATYPE(?f + 1)) AS ?pf)
          |  BIND(STR(DATATYPE(?f + ?d)) AS ?pd)
          |  BIND(xsd:integer(?f) AS ?ti)
          |  BIND(STR(?f > ?d) AS ?gt)
          |  BIND(STR(?f + 2) AS ?fl)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "pf", "pf"),
        sv(df, "pd", "pd"), sv(df, "ti", "ti"), sv(df, "gt", "gt"),
        sv(df, "fl", "fl")))
    }),
    // Custom-function SPI (r17 — the GraphDB Java-plugin analog):
    // a user-registered IRI function dispatches from any query call site;
    // term-struct in/out, errors flow open-world. The registered kernel
    // here is affine (2k + 7) so DuckDB replays it arithmetically.
    "f_registered" -> ((s, dir) => {
      import s.implicits._
      graft.functions.SparqlFunctions.registerFunction("urn:example:fn:aff",
        args => graft.functions.SparqlFunctions.numT(
          args.head.getField("num") * 2.0 + args(1).getField("num")))
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
          "urn:x:k", RdfTerm.int(k))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """SELECT ?s ?v WHERE {
          |  ?s <urn:x:k> ?k .
          |  BIND(<urn:example:fn:aff>(?k, 7) AS ?v)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"),
        df("v").getField("num").cast("bigint").as("v")))
    }),
    // §2.8 TZ / TIMEZONE from the stored LEXICAL form (mixed offsets — the
    // num shadow is UTC-normalized but value keeps the author's offset).
    "f_tz" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val e = new Engine(cat)
      val df = e.select(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?k ?tz ?dur WHERE {
          |  VALUES (?k ?x) {
          |    ("utc" "2024-03-01T10:00:00Z"^^xsd:dateTime)
          |    ("ist" "2024-03-01T10:00:00+05:30"^^xsd:dateTime)
          |    ("pst" "2024-03-01T10:00:00-08:00"^^xsd:dateTime)
          |    ("none" "2024-03-01T10:00:00"^^xsd:dateTime)
          |    ("zz" "2024-03-01T10:00:00+00:00"^^xsd:dateTime)
          |    ("str" "abcZ")
          |  }
          |  BIND(TZ(?x) AS ?tz)
          |  BIND(TIMEZONE(?x) AS ?dur)
          |}""".stripMargin)
      ordered(df.select(sv(df, "k", "k"), sv(df, "tz", "tz"), sv(df, "dur", "dur")))
    }),
    // §2.8 first-class xsd:time (r18): constructor cast from mixed-offset
    // lexicals, HOURS/MINUTES/SECONDS component extraction, TZ, and a
    // UTC-normalized order comparison ("before noon Z") — all integer
    // arithmetic per key so DuckDB replays it exactly.
    "f_time" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val z = (k % 3) match { case 0 => "Z"; case 1 => "+05:30"; case _ => "" }
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
          "urn:x:tl", RdfTerm.str(
            f"${k % 24}%02d:${(k * 7) % 60}%02d:${(k * 13) % 60}%02d$z"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?s ?tv ?h ?m ?sec ?tz ?early WHERE {
          |  ?s <urn:x:tl> ?v .
          |  BIND(xsd:time(?v) AS ?t)
          |  BIND(STR(?t) AS ?tv)
          |  BIND(HOURS(?t) AS ?h)
          |  BIND(MINUTES(?t) AS ?m)
          |  BIND(SECONDS(?t) AS ?sec)
          |  BIND(TZ(?t) AS ?tz)
          |  BIND(IF(?t < "12:00:00Z"^^xsd:time, "am", "pm") AS ?early)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "tv", "tv"),
        df("h").getField("num").cast("bigint").as("h"),
        df("m").getField("num").cast("bigint").as("m"),
        df("sec").getField("num").cast("bigint").as("sec"),
        sv(df, "tz", "tz"), sv(df, "early", "early")))
    })
  )

  private def pipelineQueries: Map[String, Q] = Map(
    // Exact dedup groups (hash-groupBy; one aggregate, map-side partial).
    "dd_exact" -> ((s, dir) =>
      ordered(Dedup.exactGroups(tblW(s, dir, "documents"), "doc_id", "text"))),
    // Formatting-robust fingerprint dedup.
    "dd_fingerprint" -> ((s, dir) =>
      ordered(Dedup.fingerprintGroups(tblW(s, dir, "documents"), "doc_id", "text"))),
    // MinHash LSH candidates → exact n-gram Jaccard verify at 0.5, through
    // the one-pass pipeline (corpus shingled ONCE for both stages).
    "dd_ngram_pairs" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(Dedup.minhashDedupPairs(docs, "doc_id", "text",
        k = 32, bands = 8, estThreshold = 0.2, threshold = 0.5))
    }),
    // Cluster resolution over the verified pairs: GraphX connected
    // components, min-id labels = cluster keep ids (Dedup.dupClusters doc).
    "dd_clusters" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(Dedup.dupClusters(docs, "doc_id", "text",
        k = 32, bands = 8, estThreshold = 0.2, threshold = 0.5)
        .select(col("doc").cast("bigint").as("doc"),
          col("cluster").cast("bigint").as("cluster")))
    }),
    // Incremental exact dedup (r11): the new batch (all docs) against the
    // seen corpus (doc_id % 3 == 0) through the bloom prefilter + exact
    // verify — output is exact, so the oracle is the plain anti-join.
    "dd_incremental" -> ((s, dir) => {
      val docs = tblW(s, dir, "documents")
      ordered(Dedup.incrementalNew(docs,
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text"))
    }),
    // Benchmark decontamination (r11): corpus docs sharing any token
    // 4-gram with the pseudo eval set (doc_id % 50 == 0) — bench grams
    // broadcast, corpus never shuffled (real pipelines use 13-grams; the
    // synthetic docs are 10-99 tokens, so 4 is the demonstrative width).
    "dd_decontam" -> ((s, dir) => {
      val docs = tblW(s, dir, "documents")
      ordered(Dedup.contamination(docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 4))
    }),
    // Exact substring-dedup spans (Lee et al. 2021, r13): merged per-doc
    // token spans whose 8-token windows recur in >= 2 distinct documents —
    // the cross-doc duplicated-text cut list.
    "dd_substring" -> ((s, dir) =>
      ordered(Dedup.duplicatedSpans(tblW(s, dir, "documents"),
        "doc_id", "text", l = 8)
        .select(col("doc").as("doc_id"), col("span_start"), col("span_end")))),
    // WITHIN-document repeated-span trimming (r15): a 3-token window
    // recurring inside one document marks every occurrence after its
    // first; marks merge and the doc reassembles from surviving tokens
    // (the self-repetition cleanup pass). The oracle replays window
    // marking, span merge, and reassembly token for token.
    "dd_trim_spans" -> ((s, dir) =>
      ordered(Dedup.trimRepeatedSpans(tblW(s, dir, "documents"),
        "doc_id", "text", l = 3)
        .select(col("doc").as("doc_id"), col("kept"), col("n_trimmed")))),
    // Cluster-balanced sampling (r13): at most 30 vectors per k-means
    // cluster by hash rank — the diversity quota; oracle replays the
    // shared deterministic Lloyd's + the md5 rank.
    "smp_cluster_cap" -> ((s, dir) =>
      ordered(graft.pipeline.Sampling.clusterCap(
        tbl(s, dir, "embeddings"), "vec_id", "embedding", cap = 30)
        .select(col("vec_id").cast("bigint").as("vec_id"),
          col("cid").cast("bigint").as("cid")))),
    // DSIR-shaped importance weighting (r13): every document scored by
    // how target-like (here: lang = 'en') its hashed-unigram distribution
    // is — integer-rational likelihood ratios, order-free sums.
    "smp_importance" -> ((s, dir) => {
      val docs = tblW(s, dir, "documents")
      ordered(graft.pipeline.Sampling.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text")
        .select(col("doc").as("doc_id"), col("score")))
    }),
    // MinHash signature table — md5-based shingle hash so the DuckDB oracle
    // replays the signatures bit-for-bit (same interpolated constants).
    "dd_minhash_sig" -> ((s, dir) => {
      val docs = tblW(s, dir, "documents")
      ordered(Dedup.minhashSignatures(docs, "doc_id", "text", 32, Dedup.md5ShingleHash)
        .select(col("doc").as("doc_id"), concat_ws(",", col("sig")).as("sig")))
    }),
    // SimHash keys — md5-based 60-bit token hash so the DuckDB oracle
    // replays every key bit-for-bit (same trick as dd_minhash_sig).
    "dd_simhash" -> ((s, dir) => {
      val docs = tblW(s, dir, "documents")
      ordered(Dedup.simhashes(docs, "doc_id", "text", nbits = 60,
          tokenHash = Dedup.md5TokenHash)
        .select(col("doc").as("doc_id"), col("sh")))
    }),
    // Full-text search: conjunctive keyword match over the inverted
    // postings table, deterministic integer tf score (the Lucene-connector
    // analog; oracle replays tokenization + scoring exactly).
    "fts_search" -> ((s, dir) => {
      val docs = tblW(s, dir, "documents")
      ordered(graft.pipeline.FullText.search(docs, "doc_id", "text",
        Seq("window", "merge", "scan")))
    }),
    // ANALYZED FTS (r12): the Lucene-EnglishAnalyzer chain — stopword
    // filter + deterministic suffix-stripping stemmer — on BOTH the index
    // and the query side, so inflected query terms ("scanning", "merges",
    // "sorted") match the corpus forms (scan, merge, sort). The stemmer is
    // generated SQL stages evaluated verbatim by Spark and DuckDB — one
    // source of truth, zero cross-engine drift.
    "fts_stem" -> ((s, dir) => {
      ordered(ftsIndexAnalyzed(s, dir, "ftsidx_stem")
        .search(Seq("scanning", "merges", "sorted")))
    }),
    // Ranked FTS through the PERSISTED index: build writes term-bucketed
    // postings + the stats row once; the query then fires no corpus scan
    // and no count job (integer idf — bit-exact in both engines), top-10
    // by (score desc, doc asc). Oracle unchanged from the corpus path.
    "fts_rank" -> ((s, dir) => {
      ftsIndex(s, dir, "ftsidx_rank")
        .rankedSearch(Seq("window", "merge", "scan"), k = 10)
    }),
    // BM25-shaped ranked FTS through the persisted index: integer idf ×
    // rational length normalization (k1=1.2, b=0.75), each contribution
    // floored to an integer before the order-free sum; n, total_tokens,
    // and doc lengths come from the index — zero per-query stat jobs.
    "fts_bm25" -> ((s, dir) => {
      ftsIndex(s, dir, "ftsidx_bm25")
        .bm25Search(Seq("window", "merge", "scan"), k = 10)
    }),
    // HYBRID RETRIEVAL (r15): reciprocal-rank fusion of the BM25 lexical
    // leg (persisted postings index) and the embedding-kNN leg (brute
    // cosine for the vec_id-0 query vector) — rank positions only, the
    // SIGIR-2009 RRF constant k0=60, fixed fold order so the fused
    // double is bit-replayable. Documents ranked by only one leg keep a
    // NULL rank on the other.
    "ret_hybrid_rrf" -> ((s, dir) => {
      val textLeg = graft.pipeline.Retrieval.ranked(
        ftsIndex(s, dir, "ftsidx_bm25")
          .bm25Search(Seq("window", "merge", "scan"), k = 20),
        col("score").desc, col("doc").asc)
      val e = tbl(s, dir, "embeddings")
      val vecLeg = Similarity.bruteTopK(e, e.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc"), col("rank"))
      val fused = graft.pipeline.Retrieval.rrf(
        Seq("text" -> textLeg, "vec" -> vecLeg), k0 = 60, k = 10)
      ordered(fused.select(col("doc").cast("bigint").as("doc"),
        col("rank_text"), col("rank_vec"), round(col("rrf"), 6).as("rrf")))
    }),
    // Proximity FTS ('"window scan"~3', r11): unordered within-slop pair
    // count through the SAME persisted index as fts_bm25 (positions table,
    // two bucket-pruned term scans, distance predicate inside the join).
    "fts_near" -> ((s, dir) => {
      ordered(ftsIndex(s, dir, "ftsidx_bm25").nearSearch("window", "scan", 3))
    }),
    // LM-fluency quality filter (CCNet-shaped): corpus-trained add-one
    // bigram model, per-doc mean scaled probability — integer-rational
    // (log-free) so the oracle replays it bit-exactly.
    "txt_lm" -> ((s, dir) =>
      ordered(graft.pipeline.TextAnalysis.lmFluency(
        tbl(s, dir, "documents"), "doc_id", "text")
        .select(col("doc").cast("bigint").as("doc"), col("n_bigrams"),
          col("total"), col("fluency")))),
    // Keyword extraction (r11 cont.): per-doc top-3 integer tf·idf terms
    // — the tag-generation pass; deterministic ties.
    "txt_keywords" -> ((s, dir) =>
      ordered(graft.pipeline.FullText.keyTerms(
        tbl(s, dir, "documents"), "doc_id", "text", k = 3)
        .select(col("doc").cast("bigint").as("doc"), col("term"),
          col("w"), col("rank")))),
    // MoreLikeThis (r11 cont.): the seed doc's most interesting terms
    // (integer tf·idf, deterministic ties) rank every sharing document.
    "fts_mlt" -> ((s, dir) =>
      ordered(graft.pipeline.FullText.moreLikeThis(
        tbl(s, dir, "documents"), "doc_id", "text", seed = 0L)
        .select(col("doc").cast("bigint").as("doc"), col("score"),
          col("n_shared")))),
    // Autocomplete (r12 cont.): the GraphDB Autocomplete plugin's label
    // suggestions — one sargable range on the label value (PushedFilters)
    // + TakeOrderedAndProject top-k, never a full sort.
    "fts_autocomplete" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("part"))
      ordered(graft.pipeline.FullText.autocomplete(
        data, "urn:graft/part#p_name", prefix = "sm", k = 25))
    }),
    // Similarity plugin surface (the GraphDB text-similarity plugin,
    // r13): term search against an explicitly built tf-vector index over
    // documents.text — cosine(tf_doc, tf_query), round-4, top-k by
    // (score desc, doc asc). The oracle replays tokenization, tf, norms
    // and scoring relationally.
    "sim_doc_search" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      if (cat.similarityIndex("docsim").isEmpty)
        cat.createSimilarityIndex("docsim",
          Seq(DirectMapper.predIri("documents", "text")))
      val df = new Engine(cat).select(
        """PREFIX similarity: <http://www.ontotext.com/graphdb/similarity/>
          |PREFIX inst: <http://www.ontotext.com/graphdb/similarity/instance/>
          |SELECT ?doc ?score WHERE {
          |  ?search a inst:docsim ;
          |    similarity:searchTerm "spark window query window" ;
          |    similarity:searchParameters "-numsearchresults 12" ;
          |    similarity:documentResult ?result .
          |  ?result similarity:value ?doc ;
          |          similarity:score ?score . }""".stripMargin)
      ordered(df.select(sv(df, "doc", "doc"), nv(df, "score", "score")))
    }),
    // Similarity-plugin EMBEDDING mode (r14): similarity:searchVector
    // probes the persisted IVF index (the shared "ivfidx" artifact,
    // nlist 8) — the hit cids prune the posting scan to the probed
    // buckets, round-4 cosine scores bind as literals, plugin top-k
    // before downstream ops. The query is vec 0's embedding rendered
    // shortest-roundtrip per component, so the parsed doubles equal the
    // oracle's float-widened e.v bit-for-bit.
    "sim_vec_search" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      if (cat.embeddingIndex("embsim").isEmpty)
        cat.registerEmbeddingIndex("embsim",
          ivfIndex(s, dir, "ivfidx", nlist = 8), "urn:graft/embeddings/")
      val qv = tbl(s, dir, "embeddings").filter(col("vec_id") === 0)
        .head().getSeq[Float](1).map(f => f.toDouble.toString).mkString(",")
      val df = new Engine(cat).select(
        s"""PREFIX similarity: <http://www.ontotext.com/graphdb/similarity/>
           |PREFIX inst: <http://www.ontotext.com/graphdb/similarity/instance/>
           |SELECT ?doc ?score WHERE {
           |  ?search a inst:embsim ;
           |    similarity:searchVector "$qv" ;
           |    similarity:searchParameters "-numsearchresults 8 -nprobe 3" ;
           |    similarity:documentResult ?result .
           |  ?result similarity:value ?doc ;
           |          similarity:score ?score . }""".stripMargin)
      ordered(df.select(sv(df, "doc", "doc"), nv(df, "score", "score")))
    }),
    // Doc-to-doc similarity (the plugin's searchDocumentID mode): the
    // stored tf vector of one document queries the rest of the index.
    // Composes with FILTER like any BGP member (score is numeric).
    "sim_doc_mlt" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      if (cat.similarityIndex("docsim").isEmpty)
        cat.createSimilarityIndex("docsim",
          Seq(DirectMapper.predIri("documents", "text")))
      val df = new Engine(cat).select(
        """PREFIX similarity: <http://www.ontotext.com/graphdb/similarity/>
          |PREFIX inst: <http://www.ontotext.com/graphdb/similarity/instance/>
          |SELECT ?doc ?score WHERE {
          |  ?search a inst:docsim ;
          |    similarity:searchDocumentID <urn:graft/documents/0> ;
          |    similarity:documentResult ?result .
          |  ?result similarity:value ?doc ;
          |          similarity:score ?score .
          |  FILTER(?score >= 0.72) }""".stripMargin)
      ordered(df.select(sv(df, "doc", "doc"), nv(df, "score", "score")))
    }),
    // Similarity-plugin PREDICATION mode (r14): psi:searchEntity over
    // per-entity predication vectors — a nation's statements are its
    // region FK edge and its name literal, so the neighbors of a nation
    // are exactly its region-mates at cosine 1/2 (one shared predication
    // out of two, norms sqrt(2) each, round-4). Entities never sharing a
    // predication stay out of the candidate join entirely — the posting
    // intersection IS the pruning, same shape as the text mode.
    "sim_pred_search" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      if (cat.predicationIndex("natpsi").isEmpty)
        cat.createPredicationIndex("natpsi",
          Seq(DirectMapper.predIri("nation", "n_regionkey"),
            DirectMapper.predIri("nation", "n_name")))
      val df = new Engine(cat).select(
        """PREFIX similarity: <http://www.ontotext.com/graphdb/similarity/>
          |PREFIX psi: <http://www.ontotext.com/graphdb/similarity/psi/>
          |PREFIX inst: <http://www.ontotext.com/graphdb/similarity/instance/>
          |SELECT ?ent ?score WHERE {
          |  ?search a inst:natpsi ;
          |    psi:searchEntity <urn:graft/nation/0> ;
          |    similarity:entityResult ?result .
          |  ?result similarity:value ?ent ;
          |          similarity:score ?score . }""".stripMargin)
      ordered(df.select(sv(df, "ent", "ent"), nv(df, "score", "score")))
    }),
    // FTS plugin surface (the GraphDB legacy Lucene plugin, final-r12):
    // `?s luc:<index> "terms"` as a BGP pseudo-property — conjunctive
    // token match over the subject's literal molecule (here p_name +
    // p_type), composed with an ordinary BGP member.
    "fts_luc" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      cat.createFtsIndex("parts", Seq(DirectMapper.predIri("part", "p_name"),
        DirectMapper.predIri("part", "p_type")))
      val df = new Engine(cat).select(
        """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
          |SELECT ?s ?nm WHERE {
          |  ?s luc:parts "red ECONOMY" ;
          |     <urn:graft/part#p_name> ?nm . }""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "nm", "nm")))
    }),
    // trailing-* prefix term in the plugin query (Lucene wildcard shape)
    "fts_luc_wild" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      cat.createFtsIndex("parts", Seq(DirectMapper.predIri("part", "p_name"),
        DirectMapper.predIri("part", "p_type")))
      val df = new Engine(cat).select(
        """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
          |SELECT ?s WHERE { ?s luc:parts "gi* small" . }""".stripMargin)
      ordered(df.select(sv(df, "s", "s")))
    }),
    // ANALYZED plugin index: stems match and query-side stopwords drop —
    // the Analyzer chain on both sides (oracle replays it via duckCtes).
    "fts_luc_stem" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      cat.createFtsIndex("docs",
        Seq(DirectMapper.predIri("documents", "text")), analyzed = true)
      val df = new Engine(cat).select(
        """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
          |SELECT ?s WHERE { ?s luc:docs "the scanning merges" . }""".stripMargin)
      ordered(df.select(sv(df, "s", "s")))
    }),
    // luc:score (r14): the plugin's relevance-score binding — the match's
    // deterministic integer tf·idf (per clause: tf * (N*1e6 div df_t),
    // summed per doc over the conjunctive match set) as xsd:integer,
    // composing with ORDER BY like any binding.
    "fts_luc_score" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      cat.createFtsIndex("parts", Seq(DirectMapper.predIri("part", "p_name"),
        DirectMapper.predIri("part", "p_type")))
      val df = new Engine(cat).select(
        """PREFIX luc: <http://www.ontotext.com/owlim/lucene#>
          |SELECT ?s ?score WHERE {
          |  ?s luc:parts "gi* small" ;
          |     luc:score ?score .
          |} ORDER BY DESC(?score) ?s""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), lv(df, "score", "score")))
    }),
    // Faceted search (r11 cont.): the conjunctive match set counted per
    // metadata facet value — the Lucene-facets dashboard shape.
    "fts_facets" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(graft.pipeline.FullText.facetCounts(docs, "doc_id", "text",
        Seq("window", "merge"), facet = "source"))
    }),
    // Highlighting (r11 cont.): match offsets per (doc, term) through the
    // SAME persisted positions table — what snippet rendering consumes.
    "fts_highlight" -> ((s, dir) => {
      ordered(ftsIndex(s, dir, "ftsidx_bm25")
        .highlight(Seq("window", "merge"))
        .select(col("doc").cast("bigint").as("doc"), col("term"),
          col("pos").cast("bigint").as("pos")))
    }),
    // Prefix FTS ("s*") through the persisted index: a sargable term range
    // over term-sorted postings (PushedFilters, plan-asserted in PlanSpec);
    // oracle replays it with LIKE.
    "fts_prefix" -> ((s, dir) => {
      ordered(ftsIndex(s, dir, "ftsidx_prefix").prefixSearch("s"))
    }),
    // Fuzzy FTS ("sow"~1 matches "slow" and "row"): edit-distance match over
    // the DISTINCT vocabulary (cost ∝ |vocab|), matched terms broadcast back
    // into the postings scan; levenshtein is bit-identical in both engines.
    "fts_fuzzy" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(graft.pipeline.FullText.fuzzySearch(docs, "doc_id", "text",
        "sow", maxDist = 1))
    }),
    // Disjunctive (OR) FTS: any query term matches; same bucket-prunable
    // term-IN scan as the conjunctive path, no HAVING gate.
    "fts_or" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(graft.pipeline.FullText.orSearch(docs, "doc_id", "text",
        Seq("window", "merge")))
    }),
    // Boolean FTS (Lucene MUST + MUST_NOT): conjunctive over the must
    // terms, LEFT ANTI join against the mustNot postings.
    "fts_boolean" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(graft.pipeline.FullText.booleanSearch(docs, "doc_id", "text",
        must = Seq("merge", "scan"), mustNot = Seq("window")))
    }),
    // Wildcard FTS ("w*ow"): literal prefix rides the sargable term range,
    // LIKE verifies inside it; oracle replays with the same LIKE pattern.
    "fts_wildcard" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(graft.pipeline.FullText.wildcardSearch(docs, "doc_id", "text",
        "w*ow"))
    }),
    // Exact phrase search via positional postings (m-way positional
    // equi-join, each side one selective term).
    "fts_phrase" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ordered(graft.pipeline.FullText.phraseSearch(docs, "doc_id", "text",
        Seq("window", "join")))
    }),
    // Profiling: exact rank-based quantiles (no interpolation — the form
    // every engine computes identically) of document length.
    "prof_quantiles" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").select(length(col("text")).as("len"))
      ordered(graft.pipeline.Profiling.quantiles(d, "len", Seq(0.5, 0.9, 0.99)))
    }),
    // Profiling: one-pass per-column stats (nulls/distincts/min/max).
    "prof_column_stats" -> ((s, dir) =>
      ordered(graft.pipeline.Profiling.columnStats(tbl(s, dir, "nation")))),
    // Deterministic hash sampling: stable under re-partitioning/re-runs,
    // same rows on any cluster size — and stratified downsampling of the
    // dominant event types. Oracle replays both filters exactly.
    "smp_stratified" -> ((s, dir) => {
      val ev = tbl(s, dir, "events").select(col("event_id"), col("event_type"))
      val sampled = graft.pipeline.Sampling.stratifiedHashSample(ev,
        "event_id", "event_type",
        Map("click" -> 0.1, "view" -> 0.05, "purchase" -> 1.0))
      ordered(sampled.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          min(col("event_id")).cast("bigint").as("first_id")))
    }),
    // Streaming exact dedup: an at-least-once source (events plus a
    // replayed 10% slice) deduped BY KEY AS IT ARRIVES with
    // dropDuplicatesWithinWatermark (bounded state). Oracle: the replay
    // vanishes — plain per-type counts of the original table.
    // Streaming quality gate (r13): the batch qualityGate predicate as a
    // stateless per-row column on a document stream — the ingest-path
    // curation hook; output = the batch keep-list (shared oracle shape).
    "stream_gate" -> ((s, dir) =>
      ordered(graft.streaming.StreamIngest.qualityGateStream(s, dir)
        .select(col("doc_id")))),
    // Streaming FTS postings maintenance (r14): arriving docs append
    // their (doc, term, tf) rows batch-locally (zero streaming state)
    // into term-hash buckets — row-identical to a batch postings build.
    "stream_fts_ingest" -> ((s, dir) =>
      ordered(graft.streaming.StreamIngest.ftsIngestStream(s, dir)
        .select(col("doc_id").cast("bigint").as("doc_id"), col("term"),
          col("tf")))),
    // Streaming decontamination (r13): eval-set grams as ONE broadcast
    // row, per-arrival array_intersect — stateless; equals dd_decontam.
    "stream_decontam" -> ((s, dir) =>
      ordered(graft.streaming.StreamIngest.contaminationStream(s, dir)
        .select(col("doc_id"), col("hit_grams")))),
    "stream_dedup" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val dup = ev.unionAll(ev.filter(col("event_id") % 10 === 0))
      val tmp = java.nio.file.Files.createTempDirectory("graft_dupsrc")
      dup.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val deduped = graft.streaming.StreamIngest.dedupStream(s, tmp.toString)
      ordered(deduped.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          count_distinct(col("event_id")).cast("bigint").as("n_ids")))
    }),
    // Domain-capped sampling (r11): at most 10 docs per source by hash
    // rank — the per-domain quota step of corpus mixing; stable under
    // re-partitioning, uniform within each domain.
    "smp_domain_cap" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").select("source", "doc_id")
      ordered(graft.pipeline.Sampling.domainCap(d, "doc_id", "source", 10)
        .select(col("source"), col("doc_id").cast("bigint").as("doc_id")))
    }),
    // Temperature-scaled domain mixing (r14): α=1/2 quotas — domain d
    // gets budget·⌊√n_d⌋ div Σ⌊√n_e⌋ of the mix, filled by its
    // lowest-hash-rank docs; integer-rational after the isqrt, so the
    // oracle replays quotas and membership bit-exactly.
    "smp_temperature" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").select("source", "doc_id")
      ordered(graft.pipeline.Sampling.temperatureQuota(
        d, "doc_id", "source", budget = 60L)
        .select(col("source"), col("doc_id").cast("bigint").as("doc_id")))
    }),
    // Vocabulary induction (r11): exact top-50 corpus token frequencies
    // (wordcount + TakeOrdered top-k; tie-break on token).
    "txt_vocab" -> ((s, dir) =>
      ordered(TextAnalysis.vocab(tbl(s, dir, "documents"), "text", k = 50))),
    // Sequence packing (r11): concatenate-then-cut per source shard —
    // each doc's training-sequence index under 512-token windows; the
    // oracle replays the same window arithmetic.
    "txt_pack" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(TextAnalysis.pack(d, "doc_id", "text", "source", seqLen = 512)
        .select(col("doc_id").cast("bigint").as("doc_id"), col("source"),
          col("tok_start"), col("seq")))
    }),
    // Deterministic train/val/test split: hash position assigns each key
    // to exactly one bucket — disjoint, exhaustive, repartition-stable,
    // join-consistent across tables (no leakage through joins).
    "smp_split" -> ((s, dir) => {
      val d = graft.pipeline.Sampling.split(
        tbl(s, dir, "documents").select("doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      ordered(d.groupBy(col("split")).agg(count(lit(1)).cast("bigint").as("n"),
        min(col("doc_id")).cast("bigint").as("first_id")))
    }),
    // KMV cardinality sketch: distinct-count ESTIMATE that is itself
    // oracle-replayable (md5 hashes + integer kth-min — bit-identical in
    // both engines, unlike an HLL).
    "sk_kmv_distinct" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      graft.pipeline.Sketches.kmvDistinct(o, "o_custkey", k = 256)
    }),
    // Cohort retention (r11 cont.): signup-anchored weekly cohorts ×
    // activity-week offsets — the retention-matrix feed; aggregates
    // before the join so the join is user-sized, never event-sized.
    "evt_retention" -> ((s, dir) =>
      ordered(graft.pipeline.Funnel.retention(tbl(s, dir, "events"),
        "user_id", "event_type", "ts", anchorType = "signup"))),
    // Funnel analysis (r11 cont.): greedy-earliest view→click→purchase
    // anchors per user — k filtered aggregates + k broadcast-able joins,
    // no whole-stream window, no per-user collect.
    "evt_funnel" -> ((s, dir) => {
      val f = graft.pipeline.Funnel.funnel(tbl(s, dir, "events"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      ordered(f.select(col("user_id").cast("bigint").as("user_id"),
        col("t1"), col("t2"), col("t3")))
    }),
    // Bucketed INTERVAL join (r11 cont.): which other orders of the same
    // customer fall inside each order's 14-day window — time buckets make
    // it a plain equi-join with the containment predicate inside, each
    // pair emitted exactly once (no cross join, no post-join distinct).
    "j9_interval_join" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val day = 86400L * 1000000L
      val points = o.select(col("o_custkey").as("cust"),
        col("o_orderkey").as("a_id"), col("o_orderdate").as("ts"))
      val intervals = o.select(col("o_custkey").as("cust"),
        col("o_orderkey").as("b"), col("o_orderdate").as("start"))
      ordered(graft.pipeline.Intervals.pointInInterval(
        points, "cust", "ts", intervals, "cust", "start",
        lenMicros = 14 * day, bucketMicros = 14 * day)
        .filter(col("a_id") =!= col("b_i"))
        .select(col("a_id").cast("bigint").as("a_id"),
          col("b_i").cast("bigint").as("b_id")))
    }),
    // AS-OF join (the attribution lookup): each purchase event picks the
    // LATEST preceding click of the same user within 2 hours — tagged
    // union + one per-key window carry-forward, ONE shuffle, no join
    // operator and no range-join explosion. DuckDB replays it with its
    // native ASOF LEFT JOIN.
    "j8_asof_join" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      ordered(graft.pipeline.AsOf.asofJoin(purchases, clicks, "user_id",
        "ts", "ts", Seq("click_id"), tieBreak = "click_id",
        toleranceMicros = Some(2L * 3600 * 1000000))
        .select(col("event_id").cast("bigint").as("event_id"),
          col("user_id").cast("bigint").as("user_id"),
          col("click_id").cast("bigint").as("click_id")))
    }),
    // Z-order layout (scale mechanic): events clustered on (user_id, value)
    // via Morton-curve range partitioning, then a 2-D range query over the
    // round-tripped files — losslessness is the oracle; the per-file span
    // tightness that drives footer-stats pruning is asserted in LayoutSpec.
    "lay_zorder" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val path = "/tmp/graft_zorder_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.pipeline.Layout.zOrderWrite(ev, path, Seq("user_id", "value"))
      ordered(s.read.parquet(path)
        .filter(col("user_id").between(100, 300) &&
          col("value").between(10.0, 50.0))
        .select(col("event_id").cast("bigint").as("event_id"),
          col("user_id").cast("bigint").as("user_id"),
          col("value").cast("double").as("value")))
    }),
    // Two-stage salted aggregation (hot-key skew spread over 16 reducers).
    // Salting is semantics-preserving, so the oracle is the PLAIN group-by
    // (l_quantity is integer-valued → exact sums in any order).
    "sk_salted_agg" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      ordered(graft.pipeline.Skew.saltedAgg(li, "l_returnflag",
        Seq(("l_quantity", "sum"), ("l_quantity", "count"),
          ("l_extendedprice", "max"))))
    }),
    // SimHash near-dup pairs, MULTI-PROBE: 60-bit key banded into 4×15-bit
    // sub-keys (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 band collides), per-band
    // equi-join — never all-pairs — then exact popcount verify.
    "dd_simhash_pairs" -> ((s, dir) => {
      val docs = tblW(s, dir, "documents")
      ordered(Dedup.simhashPairs(docs, "doc_id", "text", nbits = 60,
        tokenHash = Dedup.md5TokenHash, maxHamming = 3, bands = 4))
    }),
    // Embedding cosine near-dup pairs (double-exact cosine both engines).
    "dd_cosine_pairs" -> ((s, dir) =>
      ordered(Dedup.cosineNearDupPairs(tbl(s, dir, "embeddings"), "vec_id",
        "embedding", 0.42))),
    // SemDeDup-shaped semantic dedup: deterministic k-means clusters, then
    // exact within-cluster pairwise cosine — pairwise cost ∝ Σ|cluster|²,
    // never corpus². Oracle replays the Lloyd's training and the pair scan.
    "dd_semantic" -> ((s, dir) =>
      ordered(graft.pipeline.Similarity.semanticDupPairs(
        tbl(s, dir, "embeddings"), "vec_id", "embedding", 0.42)
        .select(col("a").cast("bigint").as("a"),
          col("b").cast("bigint").as("b"), col("cos")))),
    // The corpus-scale variant: sign-LSH banded candidates + exact cosine
    // verify (never all-pairs). Oracle replays the md5-derived hyperplanes,
    // banding and verify — the candidate set is deterministic.
    "dd_cosine_lsh" -> ((s, dir) =>
      ordered(Dedup.cosineLshPairs(tbl(s, dir, "embeddings"), "vec_id",
        "embedding", 0.42))),
    // Per-label embedding centroids (r11): exact decimal summation —
    // order-independent, bit-stable under any partitioning.
    "sim_centroids" -> ((s, dir) =>
      ordered(Similarity.labelCentroids(tbl(s, dir, "embeddings"),
        "label", "embedding"))),
    // Brute-force cosine top-k (exact ANN baseline).
    "sim_knn_brute" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      ordered(Similarity.bruteTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5))
    }),
    // int8 scalar-quantized kNN (4x smaller vectors; exact integer dots
    // make the whole search oracle-replayable bit-for-bit).
    "sim_knn_quant" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      ordered(Similarity.quantTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5))
    }),
    // LSH-bucketed ANN (oracle-replayed: md5-derived literal hyperplanes).
    "sim_knn_lsh" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      ordered(Similarity.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, planes = 8, probes = 4))
    }),
    // IVF ANN: k-means posting lists + nprobe probing (oracle-replayed:
    // the quantizer runs on scalar-quantized vectors, so the DuckDB oracle
    // unrolls the same Lloyd's iterations bit-for-bit).
    "sim_knn_ivf" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      ordered(Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, nlist = 8, nprobe = 3))
    }),
    // Product-quantization ANN (r12 cont.): per-subspace deterministic
    // codebooks, m-code encoding, ADC table-lookup scoring — the memory
    // path at corpus scale (m bytes per vector instead of D floats). The
    // oracle replays training + encoding + ADC in DuckDB bit-for-bit.
    "sim_knn_pq" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      ordered(Similarity.pqTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, m = 4, ksub = 8, iters = 2))
    }),
    // IVF-PQ composition (r12 cont.): coarse posting lists prune the
    // candidate set, PQ ADC scores inside the probed lists — the
    // billion-vector serving shape, replayed end-to-end by DuckDB.
    "sim_knn_ivfpq" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      ordered(Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, nlist = 8, nprobe = 3, coarseIters = 3,
        m = 4, ksub = 8, pqIters = 2))
    }),
    // PERSISTED IVF index (r11): train + write posting lists once
    // (memoized like the fts indexes — repeat calls, hence bench medians,
    // time the bucket-pruned PROBE only), then top-k through the stored
    // lists. Bit-identical to sim_knn_ivf by construction — shared oracle.
    "sim_knn_ivf_idx" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      ordered(ivfIndex(s, dir, "ivfidx", nlist = 8)
        .topK(e.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nprobe = 3))
    }),
    // Token/char counting + ratio features.
    "txt_stats" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val t = col("text")
      ordered(d.select(col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        TextAnalysis.subwordCount(t).as("n_subwords"),
        round(TextAnalysis.alphaRatio(t), 4).as("alpha_ratio"),
        round(TextAnalysis.whitespaceRatio(t), 4).as("ws_ratio")))
    }),
    // Language ID (marker-word heuristic, oracle replicates it exactly).
    "txt_langid" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(d.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred")))
    }),
    // Quality score.
    "txt_quality" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(d.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality")))
    }),
    // Overlapping token-window chunking (the embed-stage input shape);
    // chunk text hashed so the oracle compares content, not 64-token blobs.
    "txt_chunks" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(TextAnalysis.chunk(d, "doc_id", "text")
        .select(col("doc_id"), col("start"), col("n_tok"),
          md5(col("chunk")).as("chunk_md5")))
    }),
    // End-to-end quality gate: the keep-list a filter stage would emit
    // (language + quality + repetition thresholds composed).
    "txt_gate" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(TextAnalysis.qualityGate(d, "doc_id", "text"))
    }),
    // PII redaction (emails/IPs/digit runs → typed tokens); the oracle
    // replays the regexp chain (RE2-safe subset) and compares md5s.
    "txt_redact" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(d.select(col("doc_id"),
        md5(TextAnalysis.redact(col("text"))).as("r")))
    }),
    // Gopher/MassiveText repetition filters: duplicate-trigram and
    // duplicate-line fractions per document.
    "txt_rep" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(TextAnalysis.repetitionMetrics(d, "doc_id", "text"))
    }),
    // Winnowing (MOSS rolling-hash) fingerprints: min-hash per sliding
    // window of char-8-gram hashes; (doc, fp) rows drive substring-level
    // near-dup joins. Oracle replays hashes + windows via generate_series
    // and a windowed MIN.
    "txt_winnow" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      ordered(TextAnalysis.winnow(d, "doc_id", "text"))
    }),
    // Multimodal: binary payload + typed metadata plumbing.
    "mm_meta" -> ((s, dir) => {
      val m = Multimodal.toMediaTable(tbl(s, dir, "documents"), "doc_id", "text")
      ordered(m.select(col("media_id"), col("kind"), col("meta.n_bytes").as("n_bytes"),
        col("meta.mime").as("mime")))
    }),
    // Multimodal: stubbed decode + feature extraction (oracle-replayed:
    // md5-derived dims + exact byte-histogram feature).
    "mm_decode" -> ((s, dir) => {
      val m = Multimodal.toMediaTable(tbl(s, dir, "documents"), "doc_id", "text")
      val dec = Multimodal.decodeAndFeaturize(m)
      ordered(dec.select(col("media_id"), col("width"), col("height"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0")))
    }),
    // Multimodal RETRIEVAL composition (r12 cont.): stub-codec INTEGER
    // histogram features feed the same top-k shape as the Similarity
    // family — exact integer dot products, so the whole multimodal →
    // features → retrieval path replays bit-exactly in DuckDB.
    "mm_knn" -> ((s, dir) => {
      val m = Multimodal.toMediaTable(tbl(s, dir, "documents"), "doc_id", "text")
      val hist = Multimodal.histogramFeatures(m)
      val queries = hist.filter(col("media_id") < 3)
      ordered(Multimodal.histTopK(hist, queries, k = 5)
        .select(col("qid").cast("bigint").as("qid"),
          col("doc").cast("bigint").as("doc"),
          col("score").cast("bigint").as("score"),
          col("rank").cast("bigint").as("rank")))
    }),
    // GraphX bridge: connected components over the customer→nation→region
    // forest, labels normalized to min member IRI (BASELINE.json: "GraphX
    // for analytics queries").
    // GraphX triangle counting over the part co-occurrence graph (parts
    // sharing an order). Oracle: canonical-edge 3-way self-join.
    "gx_triangles" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.graph.GraphAnalytics.coOccurrenceEdges(
        li, "l_orderkey", "l_partkey")
      ordered(graft.graph.GraphAnalytics.triangleCounts(edges)
        .select(col("vid").as("part_id"), col("n_tri")))
    }),
    // k-core decomposition (r11 cont.): iterative peel to the maximal
    // min-degree-k subgraph; oracle unrolls a fixed 12 peels (idempotent
    // once converged — the Spark side asserts convergence inside that).
    "gx_kcore" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.graph.GraphAnalytics.coOccurrenceEdges(
        li, "l_orderkey", "l_partkey")
      ordered(graft.graph.GraphAnalytics.kCore(edges, k = 80)
        .select(col("v").as("part_id"), col("deg")))
    }),
    "gx_components" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val preds = Seq(DirectMapper.predIri("customer", "c_nationkey"),
        DirectMapper.predIri("nation", "n_regionkey"))
      val quads = cat.forPredicate(preds(0)).unionAll(cat.forPredicate(preds(1)))
      ordered(graft.graph.GraphAnalytics.connectedComponents(quads, preds))
    }),
    // BFS hop distances from the smallest co-occurrence vertex — semi-naive
    // frontier loop vs the oracle's recursive CTE.
    "gx_bfs" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val edges = graft.graph.GraphAnalytics.coOccurrenceEdges(
        li, "l_orderkey", "l_partkey")
      val source = edges.agg(min(col("src"))).collect()(0).getLong(0)
      ordered(graft.graph.GraphAnalytics.bfsDepths(edges, source, maxDepth = 4)
        .select(col("v").as("part_id"), col("dist")))
    }),
    // Cost-bounded weighted SSSP (r11): co-occurrence edges weighted by
    // affinity (more shared orders = cheaper, w in 1..5), min path cost
    // within total cost 8 — semi-naive Bellman-Ford, integer-exact.
    "gx_wsssp" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      // localCheckpoint: the co-occurrence self-join is the expensive part
      // of this query and BOTH consumers below (source pick, relaxation
      // loop) would otherwise re-execute it from parquet.
      val w = graft.graph.GraphAnalytics.coOccurrenceEdges(
        li, "l_orderkey", "l_partkey")
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        .select(col("src"), col("dst"),
          greatest(lit(6) - col("n"), lit(1)).cast("bigint").as("w"))
        .localCheckpoint()
      val source = w.agg(min(col("src"))).collect()(0).getLong(0)
      ordered(graft.graph.GraphAnalytics.ssspWeighted(w, source, maxCost = 8)
        .select(col("v").as("part_id"), col("dist")))
    }),
    // Degree analytics over the same edge set (plain aggregation path).
    "gx_degrees" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val preds = Seq(DirectMapper.predIri("customer", "c_nationkey"),
        DirectMapper.predIri("nation", "n_regionkey"))
      val quads = cat.forPredicate(preds(0)).unionAll(cat.forPredicate(preds(1)))
      ordered(graft.graph.GraphAnalytics.degrees(quads, preds))
    }),
    // PageRank over the location forest — fixed-iteration scaled-integer
    // variant: deterministic and oracle-replicable (the DuckDB oracle
    // unrolls the same 3 iterations in the same integer arithmetic).
    "gx_pagerank" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val preds = Seq(DirectMapper.predIri("customer", "c_nationkey"),
        DirectMapper.predIri("nation", "n_regionkey"))
      val quads = cat.forPredicate(preds(0)).unionAll(cat.forPredicate(preds(1)))
      ordered(graft.graph.GraphAnalytics.pageRankFixed(quads, preds, iters = 3))
    }),
    // RDF Rank as a QUERYABLE pseudo-property (the GraphDB RDF Rank
    // plugin, r12 cont.): ranks compute once (the plugin's explicit
    // "compute full rank" batch), then `?n rank:hasRDFRank ?r` reads the
    // cached table as an ordinary BGP member — the value binds as a
    // numeric literal, so it filters/sorts like any other.
    "gx_rdfrank" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      cat.computeRdfRank(Seq(DirectMapper.predIri("customer", "c_nationkey"),
        DirectMapper.predIri("nation", "n_regionkey")), iters = 3)
      val df = new Engine(cat).select(
        """PREFIX rank: <http://www.ontotext.com/owlim/RDFRank#>
          |SELECT ?nm ?r WHERE {
          |  ?n <urn:graft/nation#n_name> ?nm ;
          |     rank:hasRDFRank ?r .
          |}""".stripMargin)
      ordered(df.select(df("nm").getField("value").as("nm"),
        df("r").getField("num").as("rnk")))
    }),
    // Graph Path Search (the GraphDB plugin's SERVICE path:search surface,
    // r12 cont.): all simple paths from a picked lineitem to a region it
    // reaches BOTH ways (3 hops via its supplier, 4 via its order's
    // customer — the pick guarantees the two nation routes share the
    // region), exported as deterministic per-edge bindings. The oracle
    // replays the walk as a recursive CTE over the same FK edges.
    "gx_pathsearch" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      ensureEdgeIndex(cat, dir)
      val (src, dst) = pathSearchEndpoints(s, dir)
      val df = new Engine(cat).select(
        s"""PREFIX path: <http://www.ontotext.com/path#>
           |SELECT ?pi ?ei ?es ?ep ?eo WHERE {
           |  SERVICE path:search {
           |    [] path:findPath path:allPaths ;
           |       path:sourceNode <$src> ;
           |       path:destinationNode <$dst> ;
           |       path:maxPathLength 4 ;
           |       path:pathIndex ?pi ;
           |       path:resultBindingIndex ?ei ;
           |       path:startNode ?es ;
           |       path:propertyBinding ?ep ;
           |       path:endNode ?eo . } }""".stripMargin)
      ordered(df.select(lv(df, "pi", "pi"), lv(df, "ei", "ei"),
        sv(df, "es", "es"), sv(df, "ep", "ep"), sv(df, "eo", "eo")))
    }),
    // Pattern-restricted path search (r14): a nested
    // SERVICE <urn:path.search:wildcard> graph pattern defines the edge
    // set — here only the supplier-route FK predicates — so the walk
    // finds ONLY the 3-hop supplier route; the customer route's edges
    // never exist. The oracle shrinks the recursive CTE's edge relation
    // the same way.
    "gx_pathsearch_pattern" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val (src, dst) = pathSearchEndpoints(s, dir)
      val df = new Engine(cat).select(
        s"""PREFIX path: <http://www.ontotext.com/path#>
           |SELECT ?pi ?ei ?es ?ep ?eo WHERE {
           |  SERVICE path:search {
           |    [] path:findPath path:allPaths ;
           |       path:sourceNode <$src> ;
           |       path:destinationNode <$dst> ;
           |       path:maxPathLength 4 ;
           |       path:pathIndex ?pi ;
           |       path:resultBindingIndex ?ei ;
           |       path:startNode ?es ;
           |       path:propertyBinding ?ep ;
           |       path:endNode ?eo .
           |    SERVICE <urn:path.search:wildcard> {
           |      ?es ?ep ?eo .
           |      FILTER(?ep IN (<urn:graft/lineitem#l_suppkey>,
           |        <urn:graft/supplier#s_nationkey>,
           |        <urn:graft/nation#n_regionkey>))
           |    }
           |  } }""".stripMargin)
      ordered(df.select(lv(df, "pi", "pi"), lv(df, "ei", "ei"),
        sv(df, "es", "es"), sv(df, "ep", "ep"), sv(df, "eo", "eo")))
    }),
    // path:shortestPath — THE (length, path)-minimal path, path_idx 0.
    "gx_shortestpath" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      ensureEdgeIndex(cat, dir)
      val (src, dst) = pathSearchEndpoints(s, dir)
      val df = new Engine(cat).select(
        s"""PREFIX path: <http://www.ontotext.com/path#>
           |SELECT ?ei ?es ?ep ?eo WHERE {
           |  SERVICE path:search {
           |    [] path:findPath path:shortestPath ;
           |       path:sourceNode <$src> ;
           |       path:destinationNode <$dst> ;
           |       path:maxPathLength 4 ;
           |       path:resultBindingIndex ?ei ;
           |       path:startNode ?es ;
           |       path:propertyBinding ?ep ;
           |       path:endNode ?eo . } }""".stripMargin)
      ordered(df.select(lv(df, "ei", "ei"), sv(df, "es", "es"),
        sv(df, "ep", "ep"), sv(df, "eo", "eo")))
    }),
    // path:distance — minimum hop count, bound as an xsd:integer.
    "gx_pathdist" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      ensureEdgeIndex(cat, dir)
      val (src, dst) = pathSearchEndpoints(s, dir)
      val df = new Engine(cat).select(
        s"""PREFIX path: <http://www.ontotext.com/path#>
           |SELECT ?d WHERE {
           |  SERVICE path:search {
           |    [] path:findPath path:distance ;
           |       path:sourceNode <$src> ;
           |       path:destinationNode <$dst> ;
           |       path:maxPathLength 4 ;
           |       path:distanceBinding ?d . } }""".stripMargin)
      df.select(lv(df, "d", "dist"))
    }),
    // S6: SPARQL Update — DELETE WHERE produces a new snapshot.
    "upd_delete_where" -> ((s, dir) => {
      val (cat, c) = ctx(s, dir)
      val store = cat.forPredicate(DirectMapper.predIri("customer", "c_mktsegment"))
      val pat = Bgp(Seq(TriplePattern(V("cust"),
        pred("customer", "c_mktsegment"), L.str("BUILDING"))))
      val after = graft.sources.GraphUpdate.deleteWhere(c, store, pat,
        Seq(TriplePattern(V("cust"), pred("customer", "c_mktsegment"), L.str("BUILDING"))))
      after.agg(count(lit(1)).cast("bigint").as("n"))
    }),
    // S6: SPARQL Update text grammar — INSERT DATA (ground quads parsed from
    // the update string, applied as a new snapshot).
    "upd_insert_data" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val store = cat.forPredicate(DirectMapper.predIri("customer", "c_mktsegment"))
      val after = graft.sources.GraphUpdate.update(store,
        """INSERT DATA {
          |  <urn:graft/customer/x1> <urn:graft/customer#c_mktsegment> "SPACE" .
          |  <urn:graft/customer/x2> <urn:graft/customer#c_mktsegment> "SPACE" .
          |}""".stripMargin)
      ordered(after.select(col("o.value").as("seg"))
        .groupBy("seg").agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // S6: chained operations in one request (`;`): INSERT DATA then DELETE
    // DATA — the second op sees the first's snapshot.
    "upd_data_roundtrip" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val store = cat.forPredicate(DirectMapper.predIri("customer", "c_mktsegment"))
      val after = graft.sources.GraphUpdate.update(store,
        """INSERT DATA {
          |  <urn:graft/customer/x1> <urn:graft/customer#c_mktsegment> "SPACE" .
          |  <urn:graft/customer/x2> <urn:graft/customer#c_mktsegment> "MOON" . } ;
          |DELETE DATA {
          |  <urn:graft/customer/x2> <urn:graft/customer#c_mktsegment> "MOON" . }""".stripMargin)
      ordered(after.select(col("o.value").as("seg"))
        .groupBy("seg").agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // S6: DELETE … INSERT … WHERE — both templates instantiated from the same
    // solution set, evaluated against the snapshot itself.
    "upd_modify" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val store = cat.forPredicate(DirectMapper.predIri("customer", "c_mktsegment"))
      val after = graft.sources.GraphUpdate.update(store,
        """DELETE { ?c <urn:graft/customer#c_mktsegment> "BUILDING" }
          |INSERT { ?c <urn:graft/customer#c_mktsegment> "REBUILT" }
          |WHERE  { ?c <urn:graft/customer#c_mktsegment> "BUILDING" }""".stripMargin)
      ordered(after.select(col("o.value").as("seg"))
        .groupBy("seg").agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // SERVICE federation: the regions sub-pattern is delegated to a
    // catalog-registered sub-engine and joined back on ?rk (the pluggable
    // resolver seam — a remote endpoint registers the same way).
    "sp_service_text" -> ((s, dir) => {
      val cat = GraphCatalog.testdata(s, dir)
        .registerService("urn:graft:svc:regions", GraphCatalog.testdata(s, dir))
      val df = new Engine(cat).select(
        """SELECT ?n ?r WHERE {
          |  ?x <urn:graft/nation#n_name> ?n ;
          |     <urn:graft/nation#n_regionkey> ?rk .
          |  SERVICE <urn:graft:svc:regions> { ?rk <urn:graft/region#r_name> ?r }
          |}""".stripMargin)
      ordered(df.select(sv(df, "n", "n"), sv(df, "r", "r")))
    }),
    // SERVICE SILENT (r10): the first SERVICE federates normally through
    // the HTTP-shaped loopback client (text out, results JSON back); the
    // second names an UNREGISTERED endpoint — SILENT turns that failure
    // into the unit solution (spec §5), so the outer rows pass through
    // with ?zzz unbound instead of the whole query erroring.
    "sp_service_silent" -> ((s, dir) => {
      val cat = GraphCatalog.testdata(s, dir)
        .registerService("urn:graft:svc:regions", GraphCatalog.testdata(s, dir))
      val df = new Engine(cat).select(
        """SELECT ?n ?r WHERE {
          |  ?x <urn:graft/nation#n_name> ?n ;
          |     <urn:graft/nation#n_regionkey> ?rk .
          |  SERVICE SILENT <urn:graft:svc:regions> { ?rk <urn:graft/region#r_name> ?r }
          |  SERVICE SILENT <urn:graft:svc:nowhere> { ?x <urn:x:zzz> ?zzz }
          |}""".stripMargin)
      ordered(df.select(sv(df, "n", "n"), sv(df, "r", "r")))
    }),
    // SERVICE with a VARIABLE endpoint (r11, Fed-Query §2.3-shaped over
    // the catalog's registered set): ?ep iterates every registered
    // endpoint, binding to each one's IRI; the supplier-only endpoint has
    // no region triples, so its federated sub-solution is empty and only
    // the regions endpoint contributes rows — variable endpoints filter
    // naturally by who answers.
    "sp_service_var" -> ((s, dir) => {
      val cat0 = GraphCatalog.testdata(s, dir)
      val regions = new GraphCatalog(s)
        .addQuads(cat0.forPredicate(DirectMapper.predIri("region", "r_name")))
      val suppliers = new GraphCatalog(s)
        .addQuads(cat0.forPredicate(DirectMapper.predIri("supplier", "s_name")))
      val cat = GraphCatalog.testdata(s, dir)
        .registerService("urn:graft:svc:regions", regions)
        .registerService("urn:graft:svc:suppliers", suppliers)
      val df = new Engine(cat).select(
        """SELECT ?ep ?n ?r WHERE {
          |  ?x <urn:graft/nation#n_name> ?n ;
          |     <urn:graft/nation#n_regionkey> ?rk .
          |  SERVICE ?ep { ?rk <urn:graft/region#r_name> ?r }
          |}""".stripMargin)
      ordered(df.select(sv(df, "ep", "ep"), sv(df, "n", "n"),
        sv(df, "r", "r")))
    }),
    // Spec-exact zero-length path domain (SPARQL 18.4 ZeroLengthPath,
    // opt-in via conf): literal terms — NOT incident to the path — bind to
    // themselves under `*`.
    "g5_zero_domain_all" -> ((s, dir) => {
      val (cat0, _) = ctx(s, dir)
      val cat = new GraphCatalog(s)
        .addQuads(cat0.forPredicate(DirectMapper.predIri("nation", "n_regionkey"))
          .unionAll(cat0.forPredicate(DirectMapper.predIri("nation", "n_name"))))
      s.conf.set(graft.paths.PropertyPaths.ZeroDomainKey, "all")
      try {
        val df = new Engine(cat).select(
          """SELECT ?x ?o WHERE {
            |  ?x <urn:graft/nation#n_regionkey>* ?o .
            |  FILTER(isLiteral(?x))
            |}""".stripMargin)
        ordered(df.select(sv(df, "x", "x"), sv(df, "o", "o")))
      } finally s.conf.unset(graft.paths.PropertyPaths.ZeroDomainKey)
    }),
    // Streaming → store merge (S6 continuous): micro-batches of event quads
    // merge into a snapshot seeded with nation names; ONE SPARQL query then
    // sees the streamed quads (count per event type).
    "stream_merge_select" -> ((s, dir) => {
      val (cat0, _) = ctx(s, dir)
      val initial = cat0.forPredicate(DirectMapper.predIri("nation", "n_name"))
      val merged = graft.streaming.StreamIngest.mergeToStore(s,
        graft.streaming.StreamIngest.quadStream(s, dir), initial)
      val df = new Engine(new GraphCatalog(s).addQuads(merged)).select(
        """SELECT ?t (COUNT(*) AS ?n) WHERE {
          |  ?ev <urn:graft/events#event_type> ?t .
          |} GROUP BY ?t""".stripMargin)
      ordered(df.select(sv(df, "t", "t"),
        df("n").getField("num").cast("bigint").as("n")))
    }),
    // Streaming merge WITH incremental inference: each micro-batch is closed
    // against a fixed vocabulary (cost ∝ batch, not store) before merging —
    // the rdfs:domain rule types every streamed event, and the SPARQL SELECT
    // sees the inferred triples. Oracle: one inferred type per event.
    "stream_merge_infer" -> ((s, dir) => {
      import s.implicits._
      val onto = Seq(graft.model.Quad(Rdf.DefaultGraph,
        DirectMapper.predIri("events", "event_type"), Rdf.RdfsDomain,
        RdfTerm.iri("urn:graft/class/stream_event"))).toDS().toDF()
      val (cat0, _) = ctx(s, dir)
      val initial = cat0.forPredicate(DirectMapper.predIri("nation", "n_name")).limit(0)
      // the vocabulary is the FIXED one-rule ontology — collect it ONCE
      // (not per batch) and run the single-pass closure: DirectMapper
      // event quads can add neither schema rows nor sameAs facts (the
      // materializeOnceWith preconditions), the batch arrives deduped
      // (assumeDistinct), and mergeToStore persists each batch union
      // itself (cut = false would double-materialize)
      val vocab = Inference.vocab(onto)
      val merged = graft.streaming.StreamIngest.mergeToStore(s,
        graft.streaming.StreamIngest.quadStream(s, dir), initial,
        inferDelta = b => Inference.materializeOnceWith(s, b.unionAll(onto),
          vocab, assumeDistinct = true, cut = false))
      val df = new Engine(new GraphCatalog(s).addQuads(merged)).select(
        "SELECT (COUNT(*) AS ?n) WHERE { ?ev a <urn:graft/class/stream_event> }")
      df.select(df("n").getField("num").cast("bigint").as("n"))
    }),
    // Streaming merge under a CUSTOM ruleset (r14 cont.): arriving event
    // quads join the STORED customer->nation edges through a two-premise
    // rule — a derivation a batch-local closure cannot make (the other
    // premise is never in the batch); the incremental semi-naive delta IS
    // the batch. Oracle: the relational join, counted per nation.
    "stream_custom_infer" -> ((s, dir) => {
      val (cat0, _) = ctx(s, dir)
      val initial = cat0.forPredicate(
        DirectMapper.predIri("customer", "c_nationkey"))
      val rules = graft.inference.CustomRules.parse(
        """Prefices { x : <urn:x:> }
          |Rules {
          |  Id: user_nation
          |    ev <urn:graft/events#user_id> c
          |    c <urn:graft/customer#c_nationkey> n
          |    ---
          |    ev x:userNation n
          |}""".stripMargin)
      val merged = graft.streaming.StreamIngest.mergeWithRules(s,
        graft.streaming.StreamIngest.quadStream(s, dir), initial, rules)
      ordered(merged.filter(col("p") === "urn:x:userNation")
        .groupBy(col("o.value").as("nation"))
        .agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // Delete-aware streaming merge (S4 x S6, continuous): batch 0 streams
    // every nation's name quad (closed incrementally against the rdfs:domain
    // rule), batch 1 streams TOMBSTONES for nations < 10 — the retraction
    // removes the asserted names AND re-closes, so their entailed types
    // disappear from the final snapshot. Result: typed subjects >= 10.
    "stream_retract_infer" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      def quadsOf(pred: java.lang.Long => Boolean) = rows
        .filter(r => pred(r.get(0).toString.toLong))
        .map(r => graft.model.Quad(Rdf.DefaultGraph,
          s"urn:graft/nation/${r.get(0)}", "urn:t#name",
          RdfTerm.str(r.getString(1)))).toSeq
      val tmp = java.nio.file.Files.createTempDirectory("graft_retract")
      val streamDir = new java.io.File(tmp.toFile, "stream")
      streamDir.mkdirs()
      def writeBatch(quads: Seq[graft.model.Quad], tomb: Boolean,
          name: String, mtime: Long): org.apache.spark.sql.types.StructType = {
        val df = quads.toDS().toDF().withColumn("tombstone", lit(tomb))
        val staging = new java.io.File(tmp.toFile, s"${name}_staging")
        df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
        val part = staging.listFiles().find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(streamDir, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(mtime)
        df.schema
      }
      val now = System.currentTimeMillis()
      val schema = writeBatch(quadsOf(_ => true), tomb = false, "b0", now - 60000)
      writeBatch(quadsOf(_ < 10), tomb = true, "b1", now)
      val onto = Seq(graft.model.Quad(Rdf.DefaultGraph, "urn:t#name",
        Rdf.RdfsDomain, RdfTerm.iri("urn:t#Nation"))).toDS().toDF()
      val vocab = Inference.vocab(onto)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      val merged = graft.streaming.StreamIngest.mergeWithRetractions(s,
        stream, initial = onto,
        inferDelta = b => Inference.materializeOnceWith(s, b.unionAll(onto),
          vocab, assumeDistinct = true, cut = false),
        closeAll = st => Inference.materialize(s, st))
      val df = new Engine(new GraphCatalog(s).addQuads(merged)).select(
        "SELECT ?x WHERE { ?x a <urn:t#Nation> }")
      ordered(df.select(df("x").getField("value").as("x")))
    }),
    // G5 × G2: property-path closure under MULTI-graph FROM — the a→c hop
    // only exists in the MERGED dataset (a→b in pg1, b→c in pg2).
    "sp_path_multifrom" -> ((s, dir) => {
      val (cat0, _) = ctx(s, dir)
      val store = graft.sources.GraphUpdate.update(
        cat0.forPredicate(DirectMapper.predIri("nation", "n_name")).limit(0),
        """INSERT DATA {
          |  GRAPH <urn:pg1> { <urn:a> <urn:p> <urn:b> . }
          |  GRAPH <urn:pg2> { <urn:b> <urn:p> <urn:c> . } }""".stripMargin)
      val df = new Engine(new GraphCatalog(s).addQuads(store)).select(
        "SELECT ?s ?o FROM <urn:pg1> FROM <urn:pg2> WHERE { ?s <urn:p>+ ?o }")
      ordered(df.select(sv(df, "s", "s"), sv(df, "o", "o")))
    }),
    // S6: graph-management ops — INSERT DATA into named graphs, ADD the
    // default graph into one, CLEAR the other; chained in one request.
    "upd_clear_graph" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val store = cat.forPredicate(DirectMapper.predIri("nation", "n_name"))
      val after = graft.sources.GraphUpdate.update(store,
        """INSERT DATA {
          |  GRAPH <urn:g1> { <urn:a> <urn:p> "one" . <urn:b> <urn:p> "two" . }
          |  GRAPH <urn:g2> { <urn:c> <urn:p> "three" . }
          |} ;
          |ADD DEFAULT TO GRAPH <urn:g2> ;
          |CLEAR GRAPH <urn:g1>""".stripMargin)
      ordered(after.groupBy(col("graph")).agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // S6×audit (r11 cont.): snapshot DIFF between update epochs — the
    // change feed of a DELETE+INSERT modify, two anti-joins on the quad key.
    "upd_diff" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val before = cat.forPredicate(DirectMapper.predIri("nation", "n_name"))
      val after = graft.sources.GraphUpdate.update(before,
        """DELETE { ?s <urn:graft/nation#n_name> ?n }
          |INSERT { ?s <urn:graft/nation#n_name> "REDACTED" }
          |WHERE { ?s <urn:graft/nation#n_name> ?n
          |  FILTER(STRSTARTS(?n, "NATION_1")) }""".stripMargin)
      ordered(graft.sources.GraphStore.diff(before, after)
        .select(col("op"), col("s"), col("o").getField("value").as("v")))
    }),
    // DATA HISTORY (r16): the binary's data-history/versioning plugin
    // surface over the repository's immutable commit epochs — point-in-
    // time counts via the `urn:graft:hist:<k>` pseudo-graphs (FROM-
    // routable like every pseudo-graph view) and the epoch-to-epoch
    // change feed (two anti-joins per [[GraphStore.diff]]). Epoch 1 =
    // initial load, epoch 2 = a DELETE pass, epoch 3 = one INSERT.
    "upd_history" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val sb = new StringBuilder
      rows.foreach(r => sb.append(
        s"""<urn:graft/nation/${r.get(0)}> <urn:t#name> "${r.getString(1)}" .""")
        .append('\n'))
      val f = java.nio.file.Files.createTempFile("graft_hist", ".ttl")
      java.nio.file.Files.writeString(f, sb.toString)
      val repos = new graft.sources.Repositories(s)
      repos.create("h")
      repos.load("h", f.toString)
      repos.update("h",
        """DELETE { ?s <urn:t#name> ?n }
          |WHERE { ?s <urn:t#name> ?n
          |  FILTER(STRSTARTS(?n, "NATION_1")) }""".stripMargin)
      repos.update("h", """INSERT DATA { <urn:x/new> <urn:t#name> "EXTRA" }""")
      val e = repos.engine("h")
      def epochN(k: Int): DataFrame = {
        val df = e.select(
          s"""SELECT (COUNT(*) AS ?n) FROM <urn:graft:hist:$k>
             |WHERE { ?x <urn:t#name> ?v }""".stripMargin)
        df.select(lit("epoch").as("kind"), lit(k).as("k"),
          lit(null).cast("string").as("op"), lit(null).cast("string").as("v"),
          df("n").getField("num").cast("bigint").as("n"))
      }
      def feed(label: String, from: Int, to: Int): DataFrame =
        repos.changeFeed("h", from, to)
          .select(lit(label).as("kind"), lit(to).as("k"), col("op"),
            col("o").getField("value").as("v"),
            lit(null).cast("bigint").as("n"))
      // r17: the SAME feed read through SPARQL — the changes pseudo-graph
      // family urn:graft:changes:<from>:<to>:added|removed
      def sfeed(label: String, from: Int, to: Int, dir: String,
          op: String): DataFrame = {
        val df = e.select(
          s"""SELECT ?v FROM <urn:graft:changes:$from:$to:$dir>
             |WHERE { ?x <urn:t#name> ?v }""".stripMargin)
        df.select(lit(label).as("kind"), lit(to).as("k"),
          lit(op).as("op"), df("v").getField("value").as("v"),
          lit(null).cast("bigint").as("n"))
      }
      ordered(Seq(epochN(1), epochN(2), epochN(3),
        feed("feed12", 1, 2), feed("feed23", 2, 3),
        sfeed("sfeed12", 1, 2, "removed", "-"),
        sfeed("sfeed23", 2, 3, "added", "+")).reduce(_.unionAll(_)))
    }),
    // S6 (r11 cont.): GRAPH-variable quad templates + USING NAMED — names
    // split across two named graphs by parity; the delete's GRAPH ?g ranges
    // over the USING NAMED graph only, so NATION_1x names vanish from the
    // even graph and survive in the odd one.
    "upd_graph_var" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val quads = rows.map { r =>
        val g = if (r.getInt(0) % 2 == 0) "urn:g/even" else "urn:g/odd"
        graft.model.Quad(g, s"urn:graft/nation/${r.get(0)}", "urn:t#name",
          RdfTerm.str(r.getString(1)))
      }.toSeq
      val after = graft.sources.GraphUpdate.update(quads.toDS().toDF(),
        """DELETE { GRAPH ?g { ?s <urn:t#name> ?n } }
          |USING NAMED <urn:g/even>
          |WHERE { GRAPH ?g { ?s <urn:t#name> ?n
          |  FILTER(STRSTARTS(?n, "NATION_1")) } }""".stripMargin)
      ordered(after.select(col("graph"), col("s"),
        col("o").getField("value").as("n")))
    }),
    // S6: WITH + USING on DELETE/INSERT..WHERE — USING scopes the WHERE to a
    // source graph, WITH scopes templates (and the WHERE of the second op).
    "upd_with_using" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val store = cat.forPredicate(DirectMapper.predIri("nation", "n_name"))
      val after = graft.sources.GraphUpdate.update(store,
        """INSERT DATA {
          |  GRAPH <urn:src> { <urn:s1> <urn:p> "one" . <urn:s2> <urn:p> "two" . }
          |} ;
          |WITH <urn:dst> INSERT { ?s <urn:q> ?o }
          |USING <urn:src> WHERE { ?s <urn:p> ?o } ;
          |WITH <urn:dst> DELETE { ?s <urn:q> "two" } WHERE { ?s <urn:q> "two" }""".stripMargin)
      ordered(after.filter(col("graph") =!= graft.model.Rdf.DefaultGraph)
        .select(col("graph"), col("s"), col("o.value").as("v")))
    }),
    // Bucketed co-located fact-fact join (the 100 TB shuffle answer): both
    // sides bucketed by orderkey, revenue per order with NO exchange on
    // either side (plan-asserted in BucketingSpec).
    "j7_bucketed_join" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      graft.sources.Bucketing.writeBucketed(orders, "graft_b_orders", "o_orderkey", 8)
      graft.sources.Bucketing.writeBucketed(li, "graft_b_lineitem", "l_orderkey", 8)
      val j = graft.sources.Bucketing.table(s, "graft_b_orders")
        .join(graft.sources.Bucketing.table(s, "graft_b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("rev").cast("decimal(18,6)")).cast("double").as("revenue"))
      ordered(j.select(col("o_orderkey").cast("bigint").as("o_orderkey"),
        col("revenue")))
    }),
    // Multimodal frame sampling: every stride-th byte offset, capped at
    // maxFrames — the bounded-explode plumbing for video frame references.
    "mm_frames" -> ((s, dir) => {
      val m = Multimodal.toMediaTable(tbl(s, dir, "documents"), "doc_id", "text")
      ordered(graft.pipeline.Multimodal.sampleFrames(m)
        .select(col("media_id"), col("frame_offset")))
    }),
    // Streaming custom state (flatMapGroupsWithState): per-user session
    // close-counts over the event stream with a 2-hour gap; only CLOSED
    // sessions emit (append semantics — the oracle excludes each user's
    // trailing session likewise).
    "stream_sessions" -> ((s, dir) =>
      ordered(graft.streaming.StreamIngest.sessionCounts(s, dir))),
    // S4: repository DDL with config knobs — create a repo with the
    // inference ruleset ON, load a Turtle doc whose rdfs:domain rule types
    // every nation, and count the DERIVED types through the repo's engine.
    "s4_repo_infer" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val sb = new StringBuilder(
        """@prefix t: <urn:t#> .
          |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
          |t:name rdfs:domain t:Nation .
          |""".stripMargin)
      rows.foreach(r => sb.append(
        s"""<urn:graft/nation/${r.get(0)}> t:name "${r.getString(1)}" .""").append('\n'))
      val f = java.nio.file.Files.createTempFile("graft_repo", ".ttl")
      java.nio.file.Files.writeString(f, sb.toString)
      val repos = new graft.sources.Repositories(s)
      repos.create("nations", graft.sources.RepoConfig(inference = true))
      repos.load("nations", f.toString)
      val df = repos.engine("nations").select(
        "SELECT (COUNT(*) AS ?n) WHERE { ?x a <urn:t#Nation> }")
      ordered(df.select(df("n").getField("num").cast("bigint").as("n")))
    }),
    // S4 x S6: the closure is MAINTAINED across SPARQL Update on an
    // inference repo — INSERT DATA derives each nation's rdfs:domain type,
    // DELETE DATA retracts the entailments whose support is gone. The
    // result is the typed subjects that survive (n_nationkey >= 10).
    "s4_repo_update_infer" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val repos = new graft.sources.Repositories(s)
      repos.create("nup", graft.sources.RepoConfig(inference = true))
      val schema = java.nio.file.Files.createTempFile("graft_nup", ".ttl")
      java.nio.file.Files.writeString(schema,
        """@prefix t: <urn:t#> .
          |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
          |t:name rdfs:domain t:Nation .""".stripMargin)
      repos.load("nup", schema.toString)
      val inserts = rows.map(r =>
        s"""<urn:graft/nation/${r.get(0)}> <urn:t#name> "${r.getString(1)}"""")
        .mkString(" .\n")
      repos.update("nup", s"INSERT DATA { $inserts }")
      val deletes = rows.filter(r => r.get(0).toString.toLong < 10).map(r =>
        s"""<urn:graft/nation/${r.get(0)}> <urn:t#name> "${r.getString(1)}"""")
        .mkString(" .\n")
      repos.update("nup", s"DELETE DATA { $deletes }")
      val df = repos.engine("nup").select(
        "SELECT ?x WHERE { ?x a <urn:t#Nation> }")
      ordered(df.select(df("x").getField("value").as("x")))
    }),
    // S4 pseudo-graphs (r15 — GraphDB's special query graphs): on an
    // inference repository, GRAPH <onto:explicit> scans only ASSERTED
    // statements, GRAPH <onto:implicit> only INFERRED ones, and
    // FROM <onto:disable-sameAs> answers against the closure computed
    // WITHOUT sameAs expansion. Data: domain-typed nation names plus one
    // owl:sameAs alias node, so every view has a distinct, replayable
    // count: types are all inferred (explicit 0 / implicit N+1 — the
    // alias node gains the copied name and with it the domain type),
    // the sameAs copy doubles the alias holders (2 → 1 without
    // expansion) and adds one name (N+1 → N without).
    "s4_pseudo_graphs" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val sb = new StringBuilder(
        """@prefix t: <urn:t#> .
          |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
          |@prefix owl: <http://www.w3.org/2002/07/owl#> .
          |t:name rdfs:domain t:Nation .
          |<urn:x/a> owl:sameAs <urn:graft/nation/0> .
          |<urn:x/a> t:alias "Zero" .
          |""".stripMargin)
      rows.foreach(r => sb.append(
        s"""<urn:graft/nation/${r.get(0)}> t:name "${r.getString(1)}" .""").append('\n'))
      val f = java.nio.file.Files.createTempFile("graft_pseudo", ".ttl")
      java.nio.file.Files.writeString(f, sb.toString)
      val repos = new graft.sources.Repositories(s)
      repos.create("pg", graft.sources.RepoConfig(inference = true))
      repos.load("pg", f.toString)
      val e = repos.engine("pg")
      def n1(label: String, q: String): DataFrame = {
        val df = e.select(q)
        df.select(lit(label).as("view"),
          df("n").getField("num").cast("bigint").as("n"))
      }
      val parts = Seq(
        n1("alias_default",
          "SELECT (COUNT(*) AS ?n) WHERE { ?x <urn:t#alias> ?v }"),
        n1("alias_nosameas",
          """SELECT (COUNT(*) AS ?n) FROM <http://www.ontotext.com/disable-sameAs>
            |WHERE { ?x <urn:t#alias> ?v }""".stripMargin),
        n1("explicit_names",
          """SELECT (COUNT(*) AS ?n) WHERE {
            |  GRAPH <http://www.ontotext.com/explicit> { ?x <urn:t#name> ?v } }""".stripMargin),
        n1("explicit_types",
          """SELECT (COUNT(*) AS ?n) WHERE {
            |  GRAPH <http://www.ontotext.com/explicit> { ?x a <urn:t#Nation> } }""".stripMargin),
        n1("implicit_types",
          """SELECT (COUNT(*) AS ?n) WHERE {
            |  GRAPH <http://www.ontotext.com/implicit> { ?x a <urn:t#Nation> } }""".stripMargin),
        n1("names_default",
          "SELECT (COUNT(*) AS ?n) WHERE { ?x <urn:t#name> ?v }"),
        n1("names_nosameas",
          """SELECT (COUNT(*) AS ?n) FROM <http://www.ontotext.com/disable-sameAs>
            |WHERE { ?x <urn:t#name> ?v }""".stripMargin))
      ordered(parts.reduce(_.unionAll(_)))
    }),
    // S4×SHACL: a shapes-configured repository validates every mutation
    // BEFORE commit (GraphDB's transactional SHACL) — the compliant insert
    // lands, the duplicate-name and typed-name updates are REJECTED with
    // the store unchanged, and the final state proves both.
    "s4_repo_shacl" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val repos = new graft.sources.Repositories(s)
      repos.create("nsh", graft.sources.RepoConfig(shapesTtl = Some(
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
          |<urn:shape/Named> a sh:NodeShape ;
          |  sh:targetSubjectsOf <urn:t#name> ;
          |  sh:property [ sh:path <urn:t#name> ; sh:maxCount 1 ;
          |                sh:datatype xsd:string ] .
          |""".stripMargin)))
      val inserts = rows.map(r =>
        s"""<urn:graft/nation/${r.get(0)}> <urn:t#name> "${r.getString(1)}"""")
        .mkString(" .\n")
      repos.update("nsh", s"INSERT DATA { $inserts }")
      def rejected(upd: String): Boolean =
        try { repos.update("nsh", upd); false }
        catch { case _: graft.shacl.ShaclViolationException => true }
      require(rejected(
        """INSERT DATA { <urn:graft/nation/0> <urn:t#name> "SECOND" }"""),
        "maxCount violation must reject the transaction")
      require(rejected(
        """INSERT DATA { <urn:graft/nation/1> <urn:t#name> 7 }"""),
        "datatype violation must reject the transaction")
      val df = repos.engine("nsh").select(
        "SELECT ?x ?n WHERE { ?x <urn:t#name> ?n }")
      ordered(df.select(df("x").getField("value").as("x"),
        df("n").getField("value").as("n")))
    }),
    // Dedup pipeline end-to-end: LSH → verify → components → keep min-id
    // per cluster (what a training-data dedup pass actually emits).
    "dd_dedup_keep" -> ((s, dir) =>
      ordered(Dedup.dedupKeep(tbl(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id").cast("bigint").as("doc_id")))),
    // S5: JSON-LD source — context-compacted nation docs; names in a named
    // graph (@id + @graph), region refs at the top level, real file read.
    "src_jsonld" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val names = rows.map(r =>
        s"""{"@id": "urn:graft/nation/${r.get(0)}", "name": "${r.getString(1)}"}""")
        .mkString(",")
      val links = rows.map(r =>
        s"""{"@id": "urn:graft/nation/${r.get(0)}", "region": {"@id": "urn:graft/region/${r.get(2)}"}}""")
        .mkString(",")
      val doc =
        s"""[{"@context": {"name": "urn:graft/nation#n_name",
           |               "region": {"@id": "urn:graft/nation#n_regionkey"}},
           |  "@id": "urn:graft/g/names", "@graph": [$names]},
           | {"@context": {"region": "urn:graft/nation#n_regionkey"},
           |  "@graph": [$links]}]""".stripMargin
      val f = java.nio.file.Files.createTempFile("graft_src", ".jsonld")
      java.nio.file.Files.writeString(f, doc)
      val quads = graft.sources.JsonLdReader.load(s, f.toString).toDF()
      ordered(quads.groupBy(col("graph")).agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // S5 (r12): JSON-LD 1.1 minimal — `"@version": 1.1` accepted, `@nest`
    // groups read transparently, and the 1.1 PREFIX rule pins both ways:
    // `g:` (expanded def with `"@prefix": true`) expands, `noexp:` (no
    // flag) stays a verbatim IRI.
    "src_jsonld_v11" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val nodes = rows.map(r =>
        s"""{"@id": "g:nation/${r.get(0)}", "@nest": {"name": "${r.getString(1)}", "region": "g:region/${r.get(2)}"}}""")
        .mkString(",")
      // @included siblings (r12 cont.) carry an @json-coerced literal whose
      // canonical sorted-key form the oracle rebuilds by concatenation
      val included = rows.map(r =>
        s"""{"@id": "g:inc/${r.get(0)}", "stats": {"b": ${r.get(0)}, "a": "${r.getString(1)}"}}""")
        .mkString(",")
      val doc =
        s"""{"@context": {"@version": 1.1,
           |  "g": {"@id": "urn:graft/", "@prefix": true},
           |  "noexp": {"@id": "urn:other/"},
           |  "name": "urn:graft/nation#n_name",
           |  "stats": {"@id": "urn:graft/nation#stats", "@type": "@json"},
           |  "region": {"@id": "urn:graft/nation#n_regionkey", "@type": "@id"}},
           | "@included": [$included],
           | "@graph": [$nodes, {"@id": "g:probe", "@type": "noexp:X"}]}""".stripMargin
      val f = java.nio.file.Files.createTempFile("graft_src11", ".jsonld")
      java.nio.file.Files.writeString(f, doc)
      val quads = graft.sources.JsonLdReader.load(s, f.toString).toDF()
      ordered(quads.select(col("s"), col("p"),
        col("o").getField("value").as("v")))
    }),
    // S5 (r11): JSON-LD @graph NAMED-GRAPH ROUTING queried back through
    // GRAPH scoping — nations split by key parity into two named graphs
    // (each `{"@id": g, "@graph": […]}` wrapper), names carrying the
    // context DEFAULT @language (r11 keyword audit); the SPARQL GRAPH ?g
    // pattern + LANG() read both back.
    "src_jsonld_graph" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name").collect()
      def graphDoc(parity: Int): String = {
        val nodes = rows.filter(_.getInt(0) % 2 == parity).map(r =>
          s"""{"@id": "urn:graft/nation/${r.get(0)}", "name": "${r.getString(1)}"}""")
          .mkString(",")
        val gname = if (parity == 0) "urn:graft/g/even" else "urn:graft/g/odd"
        s"""{"@id": "$gname", "@graph": [$nodes]}"""
      }
      val doc =
        s"""{"@context": {"@language": "en", "name": "urn:x:name"},
           | "@graph": [${graphDoc(0)}, ${graphDoc(1)}]}""".stripMargin
      val f = java.nio.file.Files.createTempFile("graft_srcgraph", ".jsonld")
      java.nio.file.Files.writeString(f, doc)
      val quads = graft.sources.JsonLdReader.load(s, f.toString).toDF()
      val cat = new GraphCatalog(s).addQuads(quads)
      val df = new Engine(cat).select(
        """SELECT ?g ?n ?l WHERE {
          |  GRAPH ?g { ?s <urn:x:name> ?n }
          |  BIND(LANG(?n) AS ?l)
          |}""".stripMargin)
      ordered(df.select(sv(df, "g", "g"), sv(df, "n", "n"), sv(df, "l", "l")))
    }),
    // S5 (r10): JSON-LD @list + in-document @context term definitions —
    // `@container: @list` coerces the tags array into an rdf:first/rest
    // chain; `{"@type": "@id"}` coerces the region STRING into an IRI ref;
    // a datatype coercion types the key literal. The SPARQL query walks
    // the 2-element chain to rdf:nil and reads the coerced region back as
    // an IRI — every value string-replayable from the nation table.
    "src_jsonld_list" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val nodes = rows.map(r =>
        s"""{"@id": "urn:graft/nation/${r.get(0)}",
           | "tags": ["${r.getString(1)}", "k${r.get(0)}"],
           | "region": "urn:graft/region/${r.get(2)}",
           | "key": "${r.get(0)}"}""".stripMargin)
        .mkString(",")
      val doc =
        s"""{"@context": {
           |   "tags": {"@id": "urn:x:tags", "@container": "@list"},
           |   "region": {"@id": "urn:x:reg", "@type": "@id"},
           |   "key": {"@id": "urn:x:key",
           |           "@type": "http://www.w3.org/2001/XMLSchema#integer"}},
           | "@graph": [$nodes]}""".stripMargin
      val f = java.nio.file.Files.createTempFile("graft_srclist", ".jsonld")
      java.nio.file.Files.writeString(f, doc)
      val quads = graft.sources.JsonLdReader.load(s, f.toString).toDF()
      val cat = new GraphCatalog(s)
      cat.addQuads(quads)
      val df = new Engine(cat).select(
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
          |SELECT ?s ?first ?second ?reg ?key WHERE {
          |  ?s <urn:x:tags> ?l ; <urn:x:reg> ?reg ; <urn:x:key> ?key .
          |  ?l rdf:first ?first ; rdf:rest ?r .
          |  ?r rdf:first ?second ; rdf:rest rdf:nil .
          |  FILTER(isIRI(?reg) && datatype(?key) = <http://www.w3.org/2001/XMLSchema#integer>)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "first", "first"),
        sv(df, "second", "second"), sv(df, "reg", "reg"),
        sv(df, "key", "key")))
    }),
    // S5 (r14): JSON-LD 1.1 FRAMING round-trip — nation nodes (typed,
    // with a plain name, an xsd:integer key and an @id-coerced region
    // link) frame under `@type g:Nation` with the region sub-frame
    // embedding each region node @once; re-parsing the FRAMED document
    // with the engine's own JsonLdReader must reproduce every input
    // triple (embedding, compaction, or coercion bugs all break the
    // replayed (s, p, v) set).
    // JSON-LD rdfDirection=i18n-datatype (r15): a per-nation document
    // with directed titles parses to i18n-typed literals — the datatype
    // carries the lowercased language + direction, the lang slot empty.
    // Oracle rebuilds datatype and value by string algebra.
    "src_jsonld_i18n" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name").collect()
      val doc = rows.map { r =>
        val (k, nm) = (r.getInt(0), r.getString(1))
        val d = if (k % 2 == 0) "ltr" else "rtl"
        s"""{"@id": "urn:graft/nation/$k", "urn:x:title":
           |  {"@value": "$nm", "@language": "EN", "@direction": "$d"}}"""
          .stripMargin
      }.mkString("[", ",\n", "]")
      val quads = graft.sources.JsonLdReader.parse(doc,
        rdfDirection = Some("i18n-datatype"))
      ordered(quads.toDS().toDF().filter(col("p") === "urn:x:title")
        .select(col("s"), col("o.value").as("title"),
          col("o.dtype").as("dt")))
    }),
    "src_jsonld_frame" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val G = "urn:graft/"
      val XsdInt = "http://www.w3.org/2001/XMLSchema#integer"
      val quads = rows.toSeq.flatMap { r =>
        val (k, nm, rk) = (r.getInt(0), r.getString(1), r.getInt(2))
        Seq(
          Quad(Rdf.DefaultGraph, s"${G}nation/$k", Rdf.RdfType,
            RdfTerm.iri(s"${G}Nation")),
          Quad(Rdf.DefaultGraph, s"${G}nation/$k", s"${G}name",
            RdfTerm.str(nm)),
          Quad(Rdf.DefaultGraph, s"${G}nation/$k", s"${G}key",
            RdfTerm.typed(k.toString, XsdInt)),
          Quad(Rdf.DefaultGraph, s"${G}nation/$k", s"${G}region",
            RdfTerm.iri(s"${G}region/$rk")))
      } ++ rows.map(_.getInt(2)).distinct.sorted.flatMap { rk =>
        Seq(
          Quad(Rdf.DefaultGraph, s"${G}region/$rk", Rdf.RdfType,
            RdfTerm.iri(s"${G}Region")),
          Quad(Rdf.DefaultGraph, s"${G}region/$rk", s"${G}rname",
            RdfTerm.str(s"R$rk")))
      }
      val frameDoc =
        s"""{"@context": {
           |   "g": {"@id": "$G", "@prefix": true},
           |   "name": "${G}name",
           |   "rname": "${G}rname",
           |   "key": {"@id": "${G}key", "@type": "$XsdInt"},
           |   "region": {"@id": "${G}region", "@type": "@id"}},
           | "@type": "g:Nation",
           | "region": {"@embed": "@once"}}""".stripMargin
      val framed = graft.sources.JsonLdFramer.frame(quads, frameDoc)
      val f = java.nio.file.Files.createTempFile("graft_frame", ".jsonld")
      java.nio.file.Files.writeString(f, framed)
      val back = graft.sources.JsonLdReader.load(s, f.toString).toDF()
      ordered(back.select(col("s"), col("p"),
        col("o").getField("value").as("v")))
    }),
    // S5: TriG source — Turtle + graph blocks; nation names land in a named
    // graph, region links in the default graph, through a real file read.
    // GeoSPARQL: geof:distance over WKT POINT literals (IRI-named function
    // call through the text parser). Coordinates are STRING-built from
    // integer keys (no FP formatting), so both engines parse identical
    // doubles; the haversine uses one fixed association and rounds to mm.
    "geo_distance" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(s"POINT (-6.${k % 10} 53.${k % 7})",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s ?d WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  BIND(geof:distance(?w, "POINT (-6.2603 53.3498)") AS ?d)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), round(nv(df, "d", "d0"), 3).as("d")))
    }),
    // GeoSPARQL topological subset: geof:sfWithin POINT-in-envelope FILTER
    // (the reference portal's Q4 bbox query via the proper OGC predicate).
    // Coordinates string-built from integer keys — identical doubles in
    // both engines; inclusive bounds.
    // GeoSPARQL Req.22 QUERY REWRITE (r11 cont.): sfWithin used as a
    // PROPERTY between features — each nation a feature with a
    // hasGeometry/asWKT point, one polygon area; the pattern expands to
    // the WKT computation in the compiler, no geof: call in the query.
    "geo_rewrite" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val Geo = "http://www.opengis.net/ont/geosparql#"
      val quads = keys.flatMap { k =>
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            s"${Geo}hasGeometry", RdfTerm.iri(s"urn:geom/$k")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:geom/$k",
            s"${Geo}asWKT", RdfTerm.typed(s"POINT (-6.${k % 10} 53.${k % 7})",
              s"${Geo}wktLiteral")))
      } :+ graft.model.Quad(Rdf.DefaultGraph, "urn:area/west",
        s"${Geo}asWKT", RdfTerm.typed(
          "POLYGON ((-6.95 52.95, -6.35 52.95, -6.35 53.45, -6.95 53.45, -6.95 52.95))",
          s"${Geo}wktLiteral"))
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geo: <http://www.opengis.net/ont/geosparql#>
          |SELECT ?s WHERE { ?s geo:sfWithin <urn:area/west> .
          |  ?s geo:hasGeometry ?g }""".stripMargin)
      ordered(df.select(df("s").getField("value").as("s")))
    }),
    "geo_within" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(s"POINT (-6.${k % 10} 53.${k % 7})",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  FILTER(geof:sfWithin(?w,
          |    "POLYGON ((-6.5 53.0, -6.0 53.0, -6.0 53.4, -6.5 53.4, -6.5 53.0))"))
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s")))
    }),
    // sfIntersects + sfDisjoint over the same points: a vertical band that
    // clips the longitude range only — intersects ∪ disjoint must
    // partition the table (checked by the oracle's complementary counts).
    "geo_intersects" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(s"POINT (-6.${k % 10} 53.${k % 7})",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s ?hit ?miss WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  BIND(geof:sfIntersects(?w,
          |    "POLYGON ((-6.4 52.0, -6.2 52.0, -6.2 54.0, -6.4 54.0, -6.4 52.0))") AS ?hit)
          |  BIND(geof:sfDisjoint(?w,
          |    "POLYGON ((-6.4 52.0, -6.2 52.0, -6.2 54.0, -6.4 54.0, -6.4 52.0))") AS ?miss)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "hit", "hit"),
        sv(df, "miss", "miss")))
    }),
    // Spatial range join: nation points × region envelopes through the
    // grid-bucketed equi-join (never a cross join; see GeoSpatial).
    "geo_sjoin" -> ((s, dir) => {
      val pts = tbl(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("pid"),
        concat(lit("-6."), (col("n_nationkey") % 10).cast("string"))
          .cast("double").as("lon"),
        concat(lit("53."), (col("n_nationkey") % 7).cast("string"))
          .cast("double").as("lat"))
      val areas = tbl(s, dir, "region").select(
        col("r_regionkey").cast("long").as("aid"),
        concat(lit("-6."), (col("r_regionkey") * 2 + 1).cast("string"))
          .cast("double").as("minx"),
        lit(53.0).as("miny"),
        concat(lit("-6."), (col("r_regionkey") * 2).cast("string"))
          .cast("double").as("maxx"),
        concat(lit("53."), (col("r_regionkey") + 1).cast("string"))
          .cast("double").as("maxy"))
      ordered(graft.pipeline.GeoSpatial.withinJoin(pts, areas, cellSize = 0.1)
        .select(col("aid"), col("pid")))
    }),
    // GeoSPARQL point-in-POLYGON: sfWithin against a real (L-shaped,
    // non-rectangle) polygon through the text parser — the exact ray-cast
    // path. Vertices sit at .x5 offsets so no data point lies on an edge;
    // the oracle replays the identical IEEE crossing count in DuckDB.
    "geo_polygon" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(s"POINT (-6.${k % 10} 53.${k % 7})",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  FILTER(geof:sfWithin(?w,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))"))
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s")))
    }),
    // POLYGON WITH HOLES (r12 cont.): sfWithin on a holed polygon is
    // even-odd parity over ALL rings (UnionWithin) — a point inside the
    // hole is OUT. Rings are axis-aligned so the oracle is exactly
    // rectangle-minus-rectangle; every point sits off both boundaries.
    "geo_holes_within" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(s"POINT (-6.${k % 10} 53.${k % 7})",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  FILTER(geof:sfWithin(?w,
          |    "POLYGON ((-6.85 52.95, -6.05 52.95, -6.05 53.65, -6.85 53.65, -6.85 52.95), (-6.65 53.15, -6.25 53.15, -6.25 53.45, -6.65 53.45, -6.65 53.15))"))
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s")))
    }),
    // Holed-polygon spatial JOIN: the grid equi-join reads the EXTERIOR
    // envelope, the post-join verify is all-rings parity
    // (GeoSpatial.holedPolygonJoin) — customers inside the hole drop.
    "geo_holes_sjoin" -> ((s, dir) => {
      val pts = tbl(s, dir, "customer").select(
        col("c_custkey").cast("long").as("pid"),
        concat(lit("-6."), (col("c_custkey") % 10).cast("string"))
          .cast("double").as("lon"),
        concat(lit("53."), (col("c_custkey") % 7).cast("string"))
          .cast("double").as("lat"))
      val polys = tbl(s, dir, "region")
        .filter(col("r_regionkey") === 0).select(
          col("r_regionkey").cast("long").as("aid"),
          graft.functions.SparqlFunctions.wktRingsText(lit(
            "POLYGON ((-6.85 52.95, -6.05 52.95, -6.05 53.65, -6.85 53.65, -6.85 52.95), (-6.65 53.15, -6.25 53.15, -6.25 53.45, -6.65 53.45, -6.65 53.15))"))
            .as("rings"))
      ordered(graft.pipeline.GeoSpatial.holedPolygonJoin(pts, polys,
        cellSize = 0.1).select(col("aid"), col("pid")))
    }),
    // Polygon spatial JOIN: customer points × per-region L-shaped polygons
    // through the grid-cell equi-join with exact ray-cast verify (never a
    // cross join — see GeoSpatial.polygonJoin). The oracle replays the
    // same crossing count per (polygon, point) pair.
    "geo_polygon_sjoin" -> ((s, dir) => {
      val pts = tbl(s, dir, "customer").select(
        col("c_custkey").cast("long").as("pid"),
        concat(lit("-6."), (col("c_custkey") % 10).cast("string"))
          .cast("double").as("lon"),
        concat(lit("53."), (col("c_custkey") % 7).cast("string"))
          .cast("double").as("lat"))
      val xR = concat(lit("-6."), col("r_regionkey").cast("string"), lit("5"))
      val xM = concat(lit("-6."), (col("r_regionkey") + 2).cast("string"), lit("5"))
      val xL = concat(lit("-6."), (col("r_regionkey") + 4).cast("string"), lit("5"))
      val wkt = concat(lit("POLYGON (("),
        xL, lit(" 52.95, "), xR, lit(" 52.95, "), xR, lit(" 53.25, "),
        xM, lit(" 53.25, "), xM, lit(" 53.55, "), xL, lit(" 53.55, "),
        xL, lit(" 52.95))"))
      val polys = tbl(s, dir, "region").select(
        col("r_regionkey").cast("long").as("aid"),
        graft.functions.SparqlFunctions.wktRingText(wkt).as("ring"))
      ordered(graft.pipeline.GeoSpatial.polygonJoin(pts, polys, cellSize = 0.1)
        .select(col("aid"), col("pid")))
    }),
    // Polygon×polygon sfWithin: per-nation axis-aligned square WKTs against
    // the L-shaped polygon through the exact vertex+crossing test. Square
    // coords sit at .d2/.d8 offsets, the L at .x5 — no boundary contact
    // anywhere, so the oracle's interval-logic replay is exact.
    "geo_poly_within" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(
            s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  FILTER(geof:sfWithin(?w,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))"))
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s")))
    }),
    // The full DE-9IM subset over polygon pairs: intersects/overlaps vs the
    // L polygon; equals vs the k=13 square REWRITTEN from a different start
    // vertex and winding (vertex-set equality must be rotation-invariant);
    // touches vs a rectangle sharing the k=14 square's right edge exactly;
    // crosses (constant false for point/area families). The oracle replays
    // interval logic for inter/over and the parameter conditions for eq/tch.
    "geo_poly_relate" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(
            s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s ?inter ?over ?eq ?tch ?crs WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  BIND(geof:sfIntersects(?w,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?inter)
          |  BIND(geof:sfOverlaps(?w,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?over)
          |  BIND(geof:sfEquals(?w,
          |    "POLYGON ((-6.32 53.68, -6.38 53.68, -6.38 53.62, -6.32 53.62, -6.32 53.68))") AS ?eq)
          |  BIND(geof:sfTouches(?w,
          |    "POLYGON ((-6.42 53.02, -6.36 53.02, -6.36 53.08, -6.42 53.08, -6.42 53.02))") AS ?tch)
          |  BIND(geof:sfCrosses(?w,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?crs)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "inter", "inter"),
        sv(df, "over", "over"), sv(df, "eq", "eq"), sv(df, "tch", "tch"),
        sv(df, "crs", "crs")))
    }),
    // Polygon×polygon spatial JOIN: nation squares × region bands through
    // the grid-cell equi-join with canonical-cell exactly-once pairing and
    // the exact ring-intersection verify. Band r spans x in
    // [-6.(2r)9, -6.(2r)1] × y in [53.05, 53.65]: squares with digit
    // d = 2r intersect (contained for e in 1..5, proper edge crossings for
    // e = 0 and 6); everything else is x-disjoint.
    "geo_poly_sjoin" -> ((s, dir) => {
      val d = (col("n_nationkey") % 10).cast("string")
      val e = (col("n_nationkey") % 7).cast("string")
      val x1 = concat(lit("-6."), d, lit("8"))
      val x2 = concat(lit("-6."), d, lit("2"))
      val y1 = concat(lit("53."), e, lit("2"))
      val y2 = concat(lit("53."), e, lit("8"))
      val wkt = concat(lit("POLYGON (("), x1, lit(" "), y1, lit(", "),
        x2, lit(" "), y1, lit(", "), x2, lit(" "), y2, lit(", "),
        x1, lit(" "), y2, lit(", "), x1, lit(" "), y1, lit("))"))
      val sqs = tbl(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("aid"),
        graft.functions.SparqlFunctions.wktRingText(wkt).as("ring"))
      val g = (col("r_regionkey") * 2).cast("string")
      val bx1 = concat(lit("-6."), g, lit("9"))
      val bx2 = concat(lit("-6."), g, lit("1"))
      val bwkt = concat(lit("POLYGON (("), bx1, lit(" 53.05, "), bx2,
        lit(" 53.05, "), bx2, lit(" 53.65, "), bx1, lit(" 53.65, "),
        bx1, lit(" 53.05))"))
      val bands = tbl(s, dir, "region").select(
        col("r_regionkey").cast("long").as("bid"),
        graft.functions.SparqlFunctions.wktRingText(bwkt).as("ring"))
      ordered(graft.pipeline.GeoSpatial
        .polygonIntersectsJoin(sqs, bands, cellSize = 0.1)
        .select(col("aid"), col("bid")))
    }),
    // LINESTRING GeoSPARQL: per-nation vertical lines against the L
    // polygon — sfCrosses is exact for line×area (proper boundary
    // crossings; the d∈{2,3} lines pass straight THROUGH the right arm
    // with both endpoints outside, the d∈{4,5} lines end inside the left
    // arm); a short inside segment exercises line-within-polygon.
    "geo_linestring" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val d = k % 10
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:line", RdfTerm.typed(
              s"LINESTRING (-6.${d}3 52.85, -6.${d}3 53.35)",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:seg", RdfTerm.typed(
              s"LINESTRING (-6.${d}3 53.05, -6.${d}3 53.15)",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s ?crs ?inter ?win ?win2 WHERE {
          |  ?s <urn:x:line> ?l ; <urn:x:seg> ?m .
          |  BIND(geof:sfCrosses(?l,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?crs)
          |  BIND(geof:sfIntersects(?l,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?inter)
          |  BIND(geof:sfWithin(?l,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?win)
          |  BIND(geof:sfWithin(?m,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?win2)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "crs", "crs"),
        sv(df, "inter", "inter"), sv(df, "win", "win"),
        sv(df, "win2", "win2")))
    }),
    // Multi-geometry GeoSPARQL (r10 — the reference's GeoSPARQL plugin
    // accepts every WKT class): per-nation MULTIPOINTs against the L
    // polygon. sfWithin is forall-components (both points in),
    // sfIntersects is exists-components (either point in) — each component
    // runs the SAME exact ray-cast as geo_polygon, so the oracle replays
    // the crossing count per point and combines with AND/OR. geof:envelope
    // returns the bbox POLYGON text; all coords are one-decimal doubles so
    // the double->string rendering agrees between engines.
    "geo_multi" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val (d, e) = (k % 10, k % 7)
        val (d2, e2) = ((d + 5) % 10, (e + 3) % 7)
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(
            s"MULTIPOINT ((-6.$d 53.$e), (-6.$d2 53.$e2))",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s ?win ?inter ?env WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  BIND(geof:sfWithin(?w,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?win)
          |  BIND(geof:sfIntersects(?w,
          |    "POLYGON ((-6.55 52.95, -6.15 52.95, -6.15 53.25, -6.35 53.25, -6.35 53.55, -6.55 53.55, -6.55 52.95))") AS ?inter)
          |  BIND(geof:envelope(?w) AS ?env)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "win", "win"),
        sv(df, "inter", "inter"), sv(df, "env", "env")))
    }),
    // Multi-geometry touches/overlaps/crosses (r11 component dispatch):
    // each nation's MULTIPOLYGON (squares at digits d and (d+3)%10, same
    // construction as geo_multi_sjoin) probed against two fixed strips
    // and a vertical line. Strip1 [-6.42,-6.38] is edge-adjacent to the
    // d∈{3,4} squares (touches, interiors never meet); strip2
    // [-6.35,-6.31] strictly overlaps only the d=3 square (overlaps, not
    // contained); the line at x=-6.35 pierces the d=3 square and exits
    // south (crosses). All digit arithmetic — the oracle replays it as
    // CASE logic.
    "geo_multi_relate" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val (d, e) = (k % 10, k % 7)
        val d2 = (d + 3) % 10
        def sq(dd: Int) =
          s"((-6.${dd}8 53.${e}2, -6.${dd}2 53.${e}2, -6.${dd}2 53.${e}8, " +
            s"-6.${dd}8 53.${e}8, -6.${dd}8 53.${e}2))"
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(s"MULTIPOLYGON (${sq(d)}, ${sq(d2)})",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val strip1 = "POLYGON ((-6.42 53.0, -6.38 53.0, -6.38 53.9, -6.42 53.9, -6.42 53.0))"
      val strip2 = "POLYGON ((-6.35 53.0, -6.31 53.0, -6.31 53.9, -6.35 53.9, -6.35 53.0))"
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |SELECT ?s ?t ?o ?c WHERE {
           |  ?s <urn:x:wkt> ?w .
           |  BIND(geof:sfTouches(?w, "$strip1") AS ?t)
           |  BIND(geof:sfOverlaps(?w, "$strip2") AS ?o)
           |  BIND(geof:sfCrosses("LINESTRING (-6.35 54.0, -6.35 52.0)", ?w) AS ?c)
           |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "t", "t"),
        sv(df, "o", "o"), sv(df, "c", "c")))
    }),
    // Generic DE-9IM geof:relate (r11): canonical touches/overlaps/within
    // patterns against fixed probes, digit-replayable like
    // geo_multi_relate — strip1 [-6.42,-6.38] shares an edge with d∈{3,4}
    // squares, strip2 [-6.35,-6.31] strictly overlaps d=3, and the box
    // [-6.5,-6.0]×[53.0,54.0] strictly contains the d≤4 squares.
    "geo_relate_pat" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(
            s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val strip1 = "POLYGON ((-6.42 53.0, -6.38 53.0, -6.38 53.9, -6.42 53.9, -6.42 53.0))"
      val strip2 = "POLYGON ((-6.35 53.0, -6.31 53.0, -6.31 53.9, -6.35 53.9, -6.35 53.0))"
      val box = "POLYGON ((-6.5 53.0, -6.0 53.0, -6.0 54.0, -6.5 54.0, -6.5 53.0))"
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |SELECT ?s ?t ?o ?w WHERE {
           |  ?s <urn:x:wkt> ?x .
           |  BIND(geof:relate(?x, "$strip1", "F***T****") AS ?t)
           |  BIND(geof:relate(?x, "$strip2", "T*T***T**") AS ?o)
           |  BIND(geof:relate(?x, "$box", "T*F**F***") AS ?w)
           |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "t", "t"),
        sv(df, "o", "o"), sv(df, "w", "w")))
    }),
    // Multi-polygon spatial JOIN: per-nation MULTIPOLYGONs (the d-square
    // and its (d+3)%10 twin) x per-region vertical bands through
    // component explode + the SAME grid-cell canonical-cell equi-join as
    // geo_poly_sjoin, then one dedup hash agg over id pairs ("some
    // component intersects some component"). Never a cross join; cost is
    // proportional to components, not geometries.
    "geo_multi_sjoin" -> ((s, dir) => {
      val F = graft.functions.SparqlFunctions
      val d = (col("n_nationkey") % 10).cast("string")
      val d2 = ((col("n_nationkey") + 3) % 10).cast("string")
      val e = (col("n_nationkey") % 7).cast("string")
      def sqWkt(dd: Column): Column = {
        val x1 = concat(lit("-6."), dd, lit("8"))
        val x2 = concat(lit("-6."), dd, lit("2"))
        val y1 = concat(lit("53."), e, lit("2"))
        val y2 = concat(lit("53."), e, lit("8"))
        concat(lit("POLYGON (("), x1, lit(" "), y1, lit(", "),
          x2, lit(" "), y1, lit(", "), x2, lit(" "), y2, lit(", "),
          x1, lit(" "), y2, lit(", "), x1, lit(" "), y1, lit("))"))
      }
      val multis = tbl(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("aid"),
        array(F.wktRingText(sqWkt(d)), F.wktRingText(sqWkt(d2))).as("rings"))
      val g = (col("r_regionkey") * 2).cast("string")
      val bx1 = concat(lit("-6."), g, lit("9"))
      val bx2 = concat(lit("-6."), g, lit("1"))
      val bwkt = concat(lit("POLYGON (("), bx1, lit(" 53.05, "), bx2,
        lit(" 53.05, "), bx2, lit(" 53.65, "), bx1, lit(" 53.65, "),
        bx1, lit(" 53.05))"))
      val bands = tbl(s, dir, "region").select(
        col("r_regionkey").cast("long").as("bid"),
        array(F.wktRingText(bwkt)).as("rings"))
      ordered(graft.pipeline.GeoSpatial
        .multiPolygonIntersectsJoin(multis, bands, cellSize = 0.1)
        .select(col("aid"), col("bid")))
    }),
    // Egenhofer + RCC8 predicate families (r10): each nation's square is
    // classified against three fixed references — the d=3 vertical strip
    // (shared left/right edges -> tpp / ehCovers), a strictly-larger box
    // (ntpp / ehContains), and the adjacent strip at x=-6.32 (shared edge
    // -> ec for d=3, proper crossings -> po for d=2, dc for the rest).
    // All contact coordinates are textually identical literals in both
    // engines, so the vertex-level exact predicates are bit-deterministic.
    "geo_rcc8" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(
            s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val strip = "POLYGON ((-6.38 53.0, -6.32 53.0, -6.32 53.9, -6.38 53.9, -6.38 53.0))"
      val big = "POLYGON ((-6.39 53.0, -6.31 53.0, -6.31 53.9, -6.39 53.9, -6.39 53.0))"
      val next = "POLYGON ((-6.32 53.0, -6.26 53.0, -6.26 53.9, -6.32 53.9, -6.32 53.0))"
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |SELECT ?s ?tpp ?ntpp ?ec ?po ?dc ?cov ?cont WHERE {
           |  ?s <urn:x:wkt> ?w .
           |  BIND(geof:rcc8tpp(?w, "$strip") AS ?tpp)
           |  BIND(geof:rcc8ntpp(?w, "$big") AS ?ntpp)
           |  BIND(geof:rcc8ec(?w, "$next") AS ?ec)
           |  BIND(geof:rcc8po(?w, "$next") AS ?po)
           |  BIND(geof:rcc8dc(?w, "$next") AS ?dc)
           |  BIND(geof:ehCovers("$strip", ?w) AS ?cov)
           |  BIND(geof:ehContains("$big", ?w) AS ?cont)
           |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "tpp", "tpp"),
        sv(df, "ntpp", "ntpp"), sv(df, "ec", "ec"), sv(df, "po", "po"),
        sv(df, "dc", "dc"), sv(df, "cov", "cov"), sv(df, "cont", "cont")))
    }),
    // Distance units + getSRID (r10): the 3-arg geof:distance converts by
    // the OGC uom IRI (fixed-association division, rounded to absorb the
    // libm/JDK trig ulp); getSRID reads the embedded CRS prefix with the
    // CRS84 default.
    "geo_units" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(s"POINT (-6.${k % 10} 53.${k % 7})",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val uom = "http://www.opengis.net/def/uom/OGC/1.0/"
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |SELECT ?s ?km ?mi ?srid ?srid2 WHERE {
           |  ?s <urn:x:wkt> ?w .
           |  BIND(geof:distance(?w, "POINT (-6.2603 53.3498)",
           |    <${uom}kilometre>) AS ?km)
           |  BIND(geof:distance(?w, "POINT (-6.2603 53.3498)",
           |    <${uom}mile>) AS ?mi)
           |  BIND(geof:getSRID(?w) AS ?srid)
           |  BIND(geof:getSRID("<http://www.opengis.net/def/crs/EPSG/0/4326> POINT (0 0)") AS ?srid2)
           |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), round(nv(df, "km", "k0"), 6).as("km"),
        round(nv(df, "mi", "m0"), 6).as("mi"), sv(df, "srid", "srid"),
        sv(df, "srid2", "srid2")))
    }),
    // Geometry constructors (r10): convexHull of each square (plus an
    // interior centroid via MULTIPOINT — dropped from the hull) returns the
    // SAME square in canonical SW-start CCW form, so the oracle is string
    // algebra; union with a far square wraps as the exact MULTIPOLYGON.
    "geo_hull" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val far = "POLYGON ((-5.5 50.0, -5.4 50.0, -5.4 50.1, -5.5 50.1, -5.5 50.0))"
      val quads = keys.flatMap { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
            RdfTerm.typed(
              s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:mp",
            RdfTerm.typed(
              s"MULTIPOINT (($x1 $y1), ($x2 $y1), ($x2 $y2), ($x1 $y2), (-6.${d}5 53.${e}5))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |SELECT ?s ?h ?hm ?u WHERE {
           |  ?s <urn:x:wkt> ?w . ?s <urn:x:mp> ?mp .
           |  BIND(geof:convexHull(?w) AS ?h)
           |  BIND(geof:convexHull(?mp) AS ?hm)
           |  BIND(geof:union(?w, "$far") AS ?u)
           |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "h", "h"),
        sv(df, "hm", "hm"), sv(df, "u", "u")))
    }),
    // Convex clip (r10): square ∩ the fixed strip [-6.35,-6.31]×[53.0,53.9]
    // is a proper rectangle for d=3 and POLYGON EMPTY otherwise; corner
    // coordinates from the line-intersection formula can be 1 ulp off, so
    // the oracle compares the ROUNDED envelope, not the lexical ring.
    "geo_clip" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.map { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
          RdfTerm.typed(
            s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
            "http://www.opengis.net/ont/geosparql#wktLiteral"))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val clip = "POLYGON ((-6.35 53.0, -6.31 53.0, -6.31 53.9, -6.35 53.9, -6.35 53.0))"
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |SELECT ?s ?c WHERE {
           |  ?s <urn:x:wkt> ?w .
           |  BIND(geof:intersection(?w, "$clip") AS ?c)
           |}""".stripMargin)
      val c = sv(df, "c", "cw")
      val pairs = regexp_extract_all(col("cw"),
        lit("(-?[0-9.]+)\\s+(-?[0-9.]+)"), lit(0))
      val xs = transform(pairs, p => split(p, "\\s+").getItem(0).cast("double"))
      val ys = transform(pairs, p => split(p, "\\s+").getItem(1).cast("double"))
      ordered(df.select(sv(df, "s", "s"), c)
        .withColumn("empty",
          when(col("cw") === "POLYGON EMPTY", "true").otherwise("false"))
        .withColumn("minx", round(array_min(xs), 6))
        .withColumn("miny", round(array_min(ys), 6))
        .withColumn("maxx", round(array_max(xs), 6))
        .withColumn("maxy", round(array_max(ys), 6))
        .drop("cw"))
    }),
    // Polygon overlay (r11): difference against the fixed strip — a proper
    // two-crossing Greiner–Hormann trace for d=3 (left slab remains),
    // verbatim A for the disjoint rest — plus symDifference with a far
    // square (always the 2-component MULTIPOLYGON). Corner coordinates
    // from the intersection formula can be 1 ulp off, so the oracle
    // compares ROUNDED envelopes + the component count (same posture as
    // geo_clip).
    "geo_diff" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        val y3 = s"53.${e + 1}8" // e <= 6, so always a clean two-decimal text
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
            RdfTerm.typed(
              s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          // the square directly ABOVE, sharing the full top edge — the
          // r12 degenerate-contact fixture (difference must answer A
          // verbatim, not error)
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:adj",
            RdfTerm.typed(
              s"POLYGON (($x1 $y2, $x2 $y2, $x2 $y3, $x1 $y3, $x1 $y2))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          // r15 arrangement fixture on the INTEGER grid: a 4x4 square and
          // a quad sharing the right-edge segment (a+4, b+1)-(a+4, b+2)
          // AND properly crossing the top edge — the crossing parameter
          // is exactly 0.5, so the crossing point (a+3, b+4) is an exact
          // double and the oracle rebuilds the notched WKT verbatim
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:w2",
            RdfTerm.typed(
              s"POLYGON (($d ${e}, ${d + 4} $e, ${d + 4} ${e + 4}, $d ${e + 4}, $d $e))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:xing",
            RdfTerm.typed(
              s"POLYGON ((${d + 4} ${e + 1}, ${d + 4} ${e + 2}, ${d + 2} ${e + 6}, ${d + 6} ${e + 6}, ${d + 4} ${e + 1}))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          // r18 REPAIR-THEN-OVERLAY fixture: a SELF-INTERSECTING bowtie
          // (even-odd pair of triangles pinched at (d+2, e+2)) minus the
          // center square — routed through makeValid repair, answered by
          // the per-component arrangement; the oracle rebuilds the
          // two-member difference verbatim
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:bow",
            RdfTerm.typed(
              s"POLYGON (($d $e, ${d + 4} ${e + 4}, ${d + 4} $e, $d ${e + 4}, $d $e))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:ctr",
            RdfTerm.typed(
              s"POLYGON ((${d + 1} ${e + 1}, ${d + 3} ${e + 1}, ${d + 3} ${e + 3}, ${d + 1} ${e + 3}, ${d + 1} ${e + 1}))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val strip = "POLYGON ((-6.35 53.0, -6.31 53.0, -6.31 53.9, -6.35 53.9, -6.35 53.0))"
      val far = "POLYGON ((-5.5 50.0, -5.4 50.0, -5.4 50.1, -5.5 50.1, -5.5 50.0))"
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |SELECT ?s ?d ?sd ?ds ?dx ?dbow WHERE {
           |  ?s <urn:x:wkt> ?w ; <urn:x:adj> ?adj ;
           |     <urn:x:w2> ?w2 ; <urn:x:xing> ?xing ;
           |     <urn:x:bow> ?bow ; <urn:x:ctr> ?ctr .
           |  BIND(geof:difference(?w, "$strip") AS ?d)
           |  BIND(geof:symDifference(?w, "$far") AS ?sd)
           |  BIND(geof:difference(?w, ?adj) AS ?ds)
           |  BIND(geof:difference(?w2, ?xing) AS ?dx)
           |  BIND(geof:difference(?bow, ?ctr) AS ?dbow)
           |}""".stripMargin)
      val pairs = regexp_extract_all(col("dw"),
        lit("(-?[0-9.]+)\\s+(-?[0-9.]+)"), lit(0))
      val xs = transform(pairs, p => split(p, "\\s+").getItem(0).cast("double"))
      val ys = transform(pairs, p => split(p, "\\s+").getItem(1).cast("double"))
      ordered(df.select(sv(df, "s", "s"), sv(df, "d", "dw"), sv(df, "sd", "sdw"),
          sv(df, "ds", "dshared"), sv(df, "dx", "dxing"), sv(df, "dbow", "dbow"))
        .withColumn("minx", round(array_min(xs), 6))
        .withColumn("miny", round(array_min(ys), 6))
        .withColumn("maxx", round(array_max(xs), 6))
        .withColumn("maxy", round(array_max(ys), 6))
        .withColumn("ncomp",
          size(regexp_extract_all(col("sdw"), lit("\\(\\("), lit(0))))
        .drop("dw", "sdw"))
    }),
    // GeoSPARQL 1.1 measures (r14 cont.): a HOLED rectangle per nation —
    // area subtracts the hole, perimeter adds the hole boundary,
    // length(polygon) = perimeter (JTS conventions), the hole is centered
    // so the area centroid is the exact rectangle center, and a 3-4-5
    // diagonal pins LINESTRING length. All coordinates/areas exact
    // doubles, so the oracle replays by arithmetic.
    "geo_measures" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val (a, b) = (k % 10, k % 7)
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:wkt", RdfTerm.typed(
              s"POLYGON (($a $b, ${a + 4} $b, ${a + 4} ${b + 3}, $a ${b + 3}, $a $b), " +
                s"(${a + 1}.5 ${b + 1}, ${a + 2}.5 ${b + 1}, ${a + 2}.5 ${b + 2}, ${a + 1}.5 ${b + 2}, ${a + 1}.5 ${b + 1}))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:line", RdfTerm.typed(
              s"LINESTRING ($a $b, ${a + 3} ${b + 4})",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s ?area ?perim ?plen ?cw ?llen WHERE {
          |  ?s <urn:x:wkt> ?w ; <urn:x:line> ?l .
          |  BIND(geof:area(?w) AS ?area)
          |  BIND(geof:perimeter(?w) AS ?perim)
          |  BIND(geof:length(?w) AS ?plen)
          |  BIND(geof:centroid(?w) AS ?cw)
          |  BIND(geof:length(?l) AS ?llen)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), nv(df, "area", "area"),
        nv(df, "perim", "perim"), nv(df, "plen", "plen"),
        sv(df, "cw", "cw"), nv(df, "llen", "llen")))
    }),
    // geof:distance between NON-POINT geometries (r15): each nation's
    // square vs a point due EAST at the square's mid latitude — the min
    // candidate is the perpendicular foot on the right edge at that
    // latitude, which the oracle replays as the plain point-pair
    // haversine (round 3: the planar foot differs by ulps); a second
    // column pins overlap -> 0.
    "geo_mindist" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
            RdfTerm.typed(
              s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:pt",
            RdfTerm.typed(s"POINT (-5.5 53.${e}5)",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |SELECT ?s ?d ?z WHERE {
          |  ?s <urn:x:wkt> ?w ; <urn:x:pt> ?p .
          |  BIND(geof:distance(?w, ?p) AS ?d)
          |  BIND(geof:distance(?w, ?w) AS ?z)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"),
        round(nv(df, "d", "d0"), 3).as("d"), nv(df, "z", "z0").as("z")))
    }),
    // GEODESIC measures (r15): metre-true metricArea/metricPerimeter/
    // metricLength plus the uom-argument area form over lon/lat
    // quadrilaterals near Dublin (the reference's CRS84 WKT posture,
    // facilities.ttl:167-171). Coordinates are string-built so both
    // engines parse identical doubles; the oracle replays the haversine
    // segments and the spherical-excess terms per edge and rounds
    // (last-ulp libm/JVM trig spread — the geof:distance posture).
    // geof:transform (r15, GeoSPARQL 1.1): the CRS84 <-> EPSG:4326 axis
    // swap — every coordinate pair flips lon-lat to lat-lon, the target
    // SRID rides as the literal's <iri> prefix, and the round trip back
    // to the CRS84 default restores the bare body. The oracle constructs
    // the expected strings from the same key arithmetic.
    "geo_transform" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:pt", RdfTerm.typed(
              s"POINT (${k % 10}.5 ${k % 7}.25)",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          // r16: Dublin-ish lon/lat for the projected-CRS (EPSG:2157 ITM)
          // round trip — the geo_geodesic key arithmetic, well inside the
          // transverse-Mercator domain guard
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:dub", RdfTerm.typed(
              s"POINT (-6.2${k % 10} 53.3${k % 7})",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |PREFIX geo: <http://www.opengis.net/ont/geosparql#>
          |SELECT ?s ?to4326 ?rt ?same ?itm ?rt2 ?utm ?wm ?cross ?ig ?rt3 ?cig ?ig75 ?cig75 ?bad WHERE {
          |  ?s <urn:x:pt> ?w .
          |  ?s <urn:x:dub> ?d2 .
          |  BIND(geof:transform(?w, <http://www.opengis.net/def/crs/EPSG/0/4326>) AS ?to4326)
          |  BIND(geof:transform(?to4326, <http://www.opengis.net/def/crs/OGC/1.3/CRS84>) AS ?rt)
          |  BIND(geof:transform(?w, <http://www.opengis.net/def/crs/OGC/1.3/CRS84>) AS ?same)
          |  BIND(geof:transform(?d2, <http://www.opengis.net/def/crs/EPSG/0/2157>) AS ?itm)
          |  BIND(geof:transform(?itm, <http://www.opengis.net/def/crs/OGC/1.3/CRS84>) AS ?rt2)
          |  BIND(geof:transform(?d2, <http://www.opengis.net/def/crs/EPSG/0/32629>) AS ?utm)
          |  BIND(geof:transform(?d2, <http://www.opengis.net/def/crs/EPSG/0/3857>) AS ?wm)
          |  BIND(geof:transform(?itm, <http://www.opengis.net/def/crs/EPSG/0/3857>) AS ?cross)
          |  BIND(geof:transform(?d2, <http://www.opengis.net/def/crs/EPSG/0/29902>) AS ?ig)
          |  BIND(geof:transform(?ig, <http://www.opengis.net/def/crs/OGC/1.3/CRS84>) AS ?rt3)
          |  BIND(geof:transform(?itm, <http://www.opengis.net/def/crs/EPSG/0/29902>) AS ?cig)
          |  BIND(geof:transform(?d2, <http://www.opengis.net/def/crs/EPSG/0/29903>) AS ?ig75)
          |  BIND(geof:transform(?itm, <http://www.opengis.net/def/crs/EPSG/0/29903>) AS ?cig75)
          |  BIND(geof:transform(STRDT("POINT Z (1 2 3)", geo:wktLiteral), <http://www.opengis.net/def/crs/EPSG/0/2157>) AS ?bad)
          |}""".stripMargin)
      // ITM easting/northing to the mm; the CRS84 round trip to 1e-7°
      // (the Krüger forward/inverse truncation mismatch is ~1e-13 rad)
      val numPat = "POINT \\((-?[0-9.eE+-]+) (-?[0-9.eE+-]+)\\)"
      val raw = df.select(sv(df, "s", "s"), sv(df, "to4326", "to4326"),
        sv(df, "rt", "rt"), sv(df, "same", "same"), sv(df, "itm", "_itm"),
        sv(df, "rt2", "_rt2"), sv(df, "utm", "_utm"), sv(df, "wm", "_wm"),
        sv(df, "cross", "_cross"), sv(df, "ig", "_ig"),
        sv(df, "rt3", "_rt3"), sv(df, "cig", "_cig"),
        sv(df, "ig75", "_ig75"), sv(df, "cig75", "_cig75"),
        sv(df, "bad", "bad"))
      def xy(c: String, g: Int, d: Int) =
        round(regexp_extract(col(c), numPat, g).cast("double"), d)
      ordered(raw.select(col("s"), col("to4326"), col("rt"), col("same"),
        xy("_itm", 1, 3).as("itm_e"), xy("_itm", 2, 3).as("itm_n"),
        xy("_rt2", 1, 7).as("rt2x"), xy("_rt2", 2, 7).as("rt2y"),
        // r16 cont.: UTM 29N + Web Mercator, and the projected->projected
        // composition (ITM -> 3857 through CRS84) — the cross columns must
        // land on the SAME mm-rounded values as the direct 3857 transform
        xy("_utm", 1, 3).as("utm_e"), xy("_utm", 2, 3).as("utm_n"),
        xy("_wm", 1, 3).as("wm_x"), xy("_wm", 2, 3).as("wm_y"),
        xy("_cross", 1, 3).as("cr_x"), xy("_cross", 2, 3).as("cr_y"),
        // r17: TM65 / Irish Grid datum shift — forward to the mm, the
        // CRS84 round trip to 1e-7 deg (the small-angle Helmert reverse
        // is ~1e-8 deg), and the ITM->29902 composition pinned onto the
        // SAME mm-rounded values as the direct transform
        xy("_ig", 1, 3).as("ig_e"), xy("_ig", 2, 3).as("ig_n"),
        xy("_rt3", 1, 7).as("rt3x"), xy("_rt3", 2, 7).as("rt3y"),
        xy("_cig", 1, 3).as("ci_e"), xy("_cig", 2, 3).as("ci_n"),
        // r18: TM75 / Irish Grid (EPSG:29903) — the sibling datum's
        // rounded Helmert; direct transform to the mm, and the
        // ITM->29903 composition pinned onto the SAME mm-rounded values
        xy("_ig75", 1, 3).as("i75_e"), xy("_ig75", 2, 3).as("i75_n"),
        xy("_cig75", 1, 3).as("c75_e"), xy("_cig75", 2, 3).as("c75_n"),
        col("bad")))
    }),
    "geo_geodesic" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val (x1, x2) = (s"-6.2${k % 10}", s"-6.1${k % 10}")
        val (y1, y2) = (s"53.3${k % 7}", s"53.4${k % 7}")
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:wkt", RdfTerm.typed(
              s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:line", RdfTerm.typed(
              s"LINESTRING ($x1 $y1, $x2 $y1, $x2 $y2)",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
          |PREFIX uom: <http://www.opengis.net/def/uom/OGC/1.0/>
          |SELECT ?s ?am2 ?akm2 ?pm ?lm ?gc WHERE {
          |  ?s <urn:x:wkt> ?w ; <urn:x:line> ?l .
          |  BIND(geof:metricArea(?w) AS ?am2)
          |  BIND(geof:area(?w, uom:kilometre) AS ?akm2)
          |  BIND(geof:metricPerimeter(?w) AS ?pm)
          |  BIND(geof:metricLength(?l) AS ?lm)
          |  BIND(geof:metricCentroid(?w) AS ?gc)
          |}""".stripMargin)
      // r16: the spherical centroid, pinned as rounded lon/lat (1e-9 deg)
      val gcPat = "POINT \\((-?[0-9.eE+-]+) (-?[0-9.eE+-]+)\\)"
      ordered(df.select(sv(df, "s", "s"),
        round(nv(df, "am2", "a"), 3).as("am2"),
        round(nv(df, "akm2", "a2"), 6).as("akm2"),
        round(nv(df, "pm", "p0"), 3).as("pm"),
        round(nv(df, "lm", "l0"), 3).as("lm"),
        round(regexp_extract(sv(df, "gc", "g0"), gcPat, 1)
          .cast("double"), 9).as("gcx"),
        round(regexp_extract(sv(df, "gc", "g0"), gcPat, 2)
          .cast("double"), 9).as("gcy")))
    }),
    // Even-odd makeValid (r14): each nation key builds an integer-grid
    // BOWTIE ring (self-crossing at the exact midpoint — every coordinate
    // and the crossing itself are exact doubles), repaired to the
    // canonical two-triangle MULTIPOLYGON. The oracle reconstructs the
    // FULL WKT string by concatenation, LEAST/GREATEST replaying the
    // lexical member sort.
    "geo_makevalid" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val (a, b) = (k % 10, k % 7)
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
            RdfTerm.typed(
              s"POLYGON (($a $b, ${a + 2} ${b + 2}, ${a + 2} $b, $a ${b + 2}, $a $b))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          // r17: a fully-cancelling collinear out-and-back spike — the
          // even-odd interior is the EMPTY SET, answered as POLYGON
          // EMPTY (not refused)
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:spk",
            RdfTerm.typed(
              s"POLYGON (($a $b, ${a + 1} $b, ${a + 2} $b, ${a + 1} $b, $a $b))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """SELECT ?s ?fixed ?empt WHERE {
          |  ?s <urn:x:wkt> ?w .
          |  ?s <urn:x:spk> ?sp .
          |  BIND(<urn:graft:fn:makeValid>(?w) AS ?fixed)
          |  BIND(<urn:graft:fn:makeValid>(?sp) AS ?empt)
          |}""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "fixed", "fixed"),
        sv(df, "empt", "empt")))
    }),
    // Convex polygon buffer (r11): each nation square buffered by 0.01
    // degrees — the Minkowski envelope grows by exactly r on every side
    // (rounded compare like geo_clip) and the 32-gon arc sampling gives a
    // constant 36 distinct vertices (4 edges x 9-point quarter arcs,
    // shared endpoints deduped; +1 closing point in the WKT text).
    "geo_pbuffer" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val (d, e) = (k % 10, k % 7)
        val (x1, x2, y1, y2) = (s"-6.${d}8", s"-6.${d}2", s"53.${e}2", s"53.${e}8")
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:wkt",
            RdfTerm.typed(
              s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          // r15 POCKET fixtures on the integer grid: a C (slot width 2,
          // sealed at r = 1.2 — one ring, slot filled) and a lipped
          // FLASK (mouth 1 < 2r, chamber clearance > r — the chamber
          // survives as an interior ring)
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:cpock",
            RdfTerm.typed(
              s"POLYGON (($d $e, ${d + 6} $e, ${d + 6} ${e + 6}, ${d + 4} ${e + 6}, " +
                s"${d + 4} ${e + 2}, ${d + 2} ${e + 2}, ${d + 2} ${e + 6}, $d ${e + 6}, $d $e))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:flask",
            RdfTerm.typed(
              s"POLYGON (($d $e, ${d + 8} $e, ${d + 8} ${e + 8}, ${d + 4}.5 ${e + 8}, " +
                s"${d + 4}.5 ${e + 7}.5, ${d + 6} ${e + 7}.5, ${d + 6} ${e + 2}, " +
                s"${d + 2} ${e + 2}, ${d + 2} ${e + 7}.5, ${d + 3}.5 ${e + 7}.5, " +
                s"${d + 3}.5 ${e + 8}, $d ${e + 8}, $d $e))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")),
          // r18 SWALLOWED-CORNER fixture: an L whose reflex corner's
          // adjacent edges (length 2) are shorter than the radius 2.5 —
          // the raw offset corner + nonzero-winding fill answer (the
          // exact-by-grid pin lives in GeoOverlayEdgeSpec); here the
          // oracle pins the grown envelope and the single ring
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k", "urn:x:ell",
            RdfTerm.typed(
              s"POLYGON (($d $e, ${d + 4} $e, ${d + 4} ${e + 2}, ${d + 2} ${e + 2}, " +
                s"${d + 2} ${e + 4}, $d ${e + 4}, $d $e))",
              "http://www.opengis.net/ont/geosparql#wktLiteral")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        s"""PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
           |PREFIX uom: <http://www.opengis.net/def/uom/OGC/1.0/>
           |SELECT ?s ?b ?bc ?bf ?bl WHERE {
           |  ?s <urn:x:wkt> ?w ; <urn:x:cpock> ?cp ; <urn:x:flask> ?fl ;
           |     <urn:x:ell> ?el .
           |  BIND(geof:buffer(?w, 0.01, uom:degree) AS ?b)
           |  BIND(geof:buffer(?cp, 1.2, uom:degree) AS ?bc)
           |  BIND(geof:buffer(?fl, 0.8, uom:degree) AS ?bf)
           |  BIND(geof:buffer(?el, 2.5, uom:degree) AS ?bl)
           |}""".stripMargin)
      def stats(c: String, pfx: String) = {
        val pairs = regexp_extract_all(col(c),
          lit("(-?[0-9.]+)\\s+(-?[0-9.]+)"), lit(0))
        val xs = transform(pairs, p => split(p, "\\s+").getItem(0).cast("double"))
        val ys = transform(pairs, p => split(p, "\\s+").getItem(1).cast("double"))
        Seq(round(array_min(xs), 6).as(s"${pfx}minx"),
          round(array_min(ys), 6).as(s"${pfx}miny"),
          round(array_max(xs), 6).as(s"${pfx}maxx"),
          round(array_max(ys), 6).as(s"${pfx}maxy"))
      }
      def nrings(c: String) =
        (size(regexp_extract_all(col(c), lit("\\("), lit(0))) - 1)
      val base = df.select(sv(df, "s", "s"), sv(df, "b", "bw"),
        sv(df, "bc", "bcw"), sv(df, "bf", "bfw"), sv(df, "bl", "blw"))
      ordered(base.select(
        (col("s") +: (stats("bw", "") :+
          size(regexp_extract_all(col("bw"),
            lit("(-?[0-9.]+)\\s+(-?[0-9.]+)"), lit(0))).as("nvert")) ++:
          (stats("bcw", "c") :+ nrings("bcw").as("cnring")) ++:
          (stats("bfw", "f") :+ nrings("bfw").as("fnring")) ++:
          (stats("blw", "l") :+ nrings("blw").as("lnring"))): _*))
    }),
    // RDF-star end-to-end: Turtle-star annotations on nation name triples,
    // queried back with a SPARQL-star pattern. Certainty literals are
    // string-parsed doubles in BOTH engines (identical bits).
    "src_turtlestar" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val sb = new StringBuilder("@prefix ex: <urn:x:> .\n")
      rows.foreach { r =>
        val iri = s"<urn:graft/nation/${r.get(0)}>"
        val cert = "0." + (5 + r.getInt(0) % 5)
        sb.append(s"""$iri ex:name "${r.getString(1)}" .""").append('\n')
        sb.append(s"""<< $iri ex:name "${r.getString(1)}" >> ex:certainty $cert .""").append('\n')
      }
      val quads = graft.sources.TurtleReader.parse(sb.toString)
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX ex: <urn:x:>
          |SELECT ?s ?nm ?c WHERE { << ?s ex:name ?nm >> ex:certainty ?c }""".stripMargin)
      ordered(df.select(sv(df, "s", "s"), sv(df, "nm", "nm"), nv(df, "c", "c")))
    }),
    // SPARQL-star builtins (S7): SUBJECT/PREDICATE/OBJECT read back the
    // components of the annotated triples via decomposition-quad LeftJoins;
    // isTRIPLE tests the term kind; TRIPLE reconstructs the quoted-triple id
    // scalar-side and must equal the loader's node (proving constructor ≡
    // loader id). All replayed in DuckDB (md5 over the same canonical key).
    "f_star_accessors" -> ((s, dir) => {
      import s.implicits._
      val rows = tbl(s, dir, "nation").select("n_nationkey", "n_name").collect()
      val sb = new StringBuilder("@prefix ex: <urn:x:> .\n")
      rows.foreach { r =>
        val iri = s"<urn:graft/nation/${r.get(0)}>"
        val cert = "0." + (5 + r.getInt(0) % 5)
        sb.append(s"""$iri ex:name "${r.getString(1)}" .""").append('\n')
        sb.append(s"""<< $iri ex:name "${r.getString(1)}" >> ex:certainty $cert .""").append('\n')
      }
      val quads = graft.sources.TurtleReader.parse(sb.toString)
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val df = new Engine(cat).select(
        """PREFIX ex: <urn:x:>
          |SELECT ?qt ?s ?p ?nm ?c ?isq ?same WHERE {
          |  ?qt ex:certainty ?c .
          |  BIND(SUBJECT(?qt) AS ?s)
          |  BIND(PREDICATE(?qt) AS ?p)
          |  BIND(OBJECT(?qt) AS ?nm)
          |  BIND(isTRIPLE(?qt) AS ?isq)
          |  BIND((TRIPLE(?s, ex:name, ?nm) = ?qt) AS ?same)
          |}""".stripMargin)
      ordered(df.select(sv(df, "qt", "qt"), sv(df, "s", "s"), sv(df, "p", "p"),
        sv(df, "nm", "nm"), nv(df, "c", "c"), sv(df, "isq", "isq"),
        sv(df, "same", "same")))
    }),
    "src_trig" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val sb = new StringBuilder("@prefix n: <urn:graft/nation#> .\n")
      sb.append("GRAPH <urn:graft/g/names> {\n")
      rows.foreach(r => sb.append(
        s"""<urn:graft/nation/${r.get(0)}> n:n_name "${r.getString(1)}" .""").append('\n'))
      sb.append("}\n")
      rows.foreach(r => sb.append(
        s"<urn:graft/nation/${r.get(0)}> n:n_regionkey <urn:graft/region/${r.get(2)}> .").append('\n'))
      val f = java.nio.file.Files.createTempFile("graft_src", ".trig")
      java.nio.file.Files.writeString(f, sb.toString)
      val quads = graft.sources.TrigReader.load(s, f.toString).toDF()
      ordered(quads.groupBy(col("graph")).agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // S5: N-Quads source — the line-delimited QUAD bulk format; the 4th term
    // routes quads into named graphs end-to-end through a real file read.
    "src_nquads" -> ((s, dir) => {
      val rows = tbl(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val sb = new StringBuilder
      rows.foreach { r =>
        sb.append(s"""<urn:graft/nation/${r.get(0)}> <urn:graft/nation#n_name> "${r.getString(1)}" <urn:graft/g/names> .""").append('\n')
        sb.append(s"""<urn:graft/nation/${r.get(0)}> <urn:graft/nation#n_regionkey> <urn:graft/region/${r.get(2)}> .""").append('\n')
      }
      val f = java.nio.file.Files.createTempFile("graft_src", ".nq")
      java.nio.file.Files.writeString(f, sb.toString)
      val quads = graft.sources.NQuadsReader.load(s, f.toString).toDF()
      ordered(quads.groupBy(col("graph")).agg(count(lit(1)).cast("bigint").as("n")))
    }),

    // Sink: N-Triples EXPORT of the direct-mapped nation table — one
    // codegen'd projection per quad, no shuffle (RdfWriter). The oracle
    // replays the exact line format (incl. the literal escape chain) in SQL.
    // S3/S5 (r11 cont.): RDF/XML EXPORT — nation quads serialized to an
    // RDF/XML document and parsed straight back by the engine's own
    // RdfXmlReader; the oracle re-derives the triple set relationally, so
    // the round-trip proves writer and reader agree on the wire format.
    "snk_rdfxml" -> ((s, dir) => {
      import s.implicits._
      val quads = DirectMapper.quads(tbl(s, dir, "nation"),
        DirectMapper.testdataSpecs("nation"))
      val doc = graft.sources.RdfWriter.document(
        graft.sources.RdfWriter.rdfXmlLines(quads))
      val back = graft.sources.RdfXmlReader.parse(doc).toDS().toDF()
      ordered(back.select(col("s"), col("p"),
        col("o").getField("value").as("v"),
        col("o").getField("dtype").as("dt")))
    }),
    // TriG export (r12 cont.): odd-key nations route to a named graph so
    // the block form exercises; round-trip through the engine's TrigReader.
    "snk_trig" -> ((s, dir) => {
      import s.implicits._
      val quads = DirectMapper.quads(tbl(s, dir, "nation"),
        DirectMapper.testdataSpecs("nation"))
        .withColumn("graph", when(col("s").rlike("[13579]$"),
          lit("urn:g/odd")).otherwise(col("graph")))
      val doc = graft.sources.RdfWriter.document(
        graft.sources.RdfWriter.trigLines(quads))
      val back = graft.sources.TrigReader.parse(doc).toDS().toDF()
      ordered(back.select(col("graph"), col("s"), col("p"),
        col("o").getField("value").as("v")))
    }),
    // JSON-LD export (r12 cont.): the fifth negotiated statement-export
    // format — write nation as flat expanded JSON-LD, parse it back with
    // the engine's own reader, and compare the quads relationally.
    "snk_jsonld" -> ((s, dir) => {
      import s.implicits._
      val quads = DirectMapper.quads(tbl(s, dir, "nation"),
        DirectMapper.testdataSpecs("nation"))
      val doc = graft.sources.RdfWriter.document(
        graft.sources.RdfWriter.jsonLdLines(quads))
      val back = graft.sources.JsonLdReader.parse(doc).toDS().toDF()
      ordered(back.select(col("s"), col("p"),
        col("o").getField("value").as("v"),
        col("o").getField("dtype").as("dt")))
    }),
    "snk_ntriples" -> ((s, dir) => {
      val quads = DirectMapper.quads(tbl(s, dir, "nation"),
        DirectMapper.testdataSpecs("nation"))
      ordered(graft.sources.RdfWriter.ntriplesLines(quads))
    }),
    // G7: DESCRIBE as text — var form; CBD of all nations in region 2,
    // summarized as per-predicate counts.
    "sp_describe_text" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val e = new Engine(cat)
      val cbd = e.describeQuery(
        "DESCRIBE ?x WHERE { ?x <urn:graft/nation#n_regionkey> <urn:graft/region/2> }")
      ordered(cbd.groupBy(col("p")).agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // Recursive CBD DESCRIBE (r10): each nation carries a bnode address
    // that points to a SECOND bnode (geo) — the Concise Bounded Description
    // must follow bnode objects to fixpoint (2 levels here), include the
    // 1-hop inbound reference, and EXCLUDE the unreachable distractor
    // bnode. 5 rows per described nation, all string-replayable.
    "sp_describe_cbd" -> ((s, dir) => {
      import s.implicits._
      val keys = tbl(s, dir, "nation").select("n_nationkey").collect()
        .map(_.getInt(0)).toSeq
      val quads = keys.flatMap { k =>
        val a = s"_:addr$k"; val g = s"_:geo$k"
        Seq(
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/nation/$k",
            "urn:x:addr", RdfTerm.blank(a)),
          graft.model.Quad(Rdf.DefaultGraph, a, "urn:x:city",
            RdfTerm.str(s"city-$k")),
          graft.model.Quad(Rdf.DefaultGraph, a, "urn:x:geo", RdfTerm.blank(g)),
          graft.model.Quad(Rdf.DefaultGraph, g, "urn:x:lat",
            RdfTerm.str(s"53.${k % 7}")),
          graft.model.Quad(Rdf.DefaultGraph, s"urn:graft/ref/$k",
            "urn:x:ref", RdfTerm.iri(s"urn:graft/nation/$k")),
          graft.model.Quad(Rdf.DefaultGraph, s"_:other$k", "urn:x:city",
            RdfTerm.str("unreachable")))
      }
      val cat = new GraphCatalog(s)
      cat.addQuads(quads.toDS().toDF())
      val cbd = new Engine(cat).describeQuery(
        "DESCRIBE ?x WHERE { ?x <urn:x:addr> ?a }")
      ordered(cbd.select(col("s"), col("p"),
        col("o").getField("value").as("v")))
    }),
    // Structured Streaming: quad ingestion — events stream lifted to quads,
    // counted per predicate (S6 continuous-ingest shape).
    "stream_quad_counts" -> ((s, dir) => {
      val stream = graft.streaming.StreamIngest.quadStream(s, dir)
      val agg = stream.groupBy(col("p")).agg(count(lit(1)).as("n"))
      ordered(graft.streaming.StreamIngest.runCompleteToTable(s, agg)
        .select(col("p"), col("n").cast("bigint").as("n")))
    }),
    // Structured Streaming: watermarked windowed aggregation over events.
    "stream_window_counts" -> ((s, dir) => {
      val res = graft.streaming.StreamIngest.runWindowedCounts(s, dir)
      ordered(res.select(col("window_start"), col("event_type"),
        col("n").cast("bigint").as("n"), round(col("sum_value"), 4).as("sum_value")))
    }),
    // STREAM-STREAM join: correlated per-user event pairs within 30 min,
    // both sides watermarked so join state is bounded (StreamIngest doc).
    "stream_pair_join" -> ((s, dir) => {
      val res = graft.streaming.StreamIngest.pairJoin(s, dir)
      ordered(res.select(col("user_id").cast("bigint").as("user_id"),
        col("a_id").cast("bigint").as("a_id"),
        col("b_id").cast("bigint").as("b_id")))
    }),
    // Streaming data quality (r11 cont.): row-level SHACL over the quad
    // stream — value-level constraints compile to ONE codegen'd
    // array-filter-explode per arriving quad (no state, no aggregation),
    // the continuous ingest-path validation hook. Same valueChecks builder
    // as the batch validator, so semantics cannot drift.
    "stream_shacl" -> ((s, dir) => {
      val shapes = graft.shacl.Shacl.parseShapes(
        graft.sources.TurtleReader.parse(
          """@prefix sh: <http://www.w3.org/ns/shacl#> .
            |<urn:shape/Event> a sh:NodeShape ;
            |  sh:targetSubjectsOf <urn:graft/events#value>,
            |    <urn:graft/events#event_type> ;
            |  sh:property [ sh:path <urn:graft/events#value> ;
            |                sh:maxInclusive 100.0 ] ;
            |  sh:property [ sh:path <urn:graft/events#event_type> ;
            |                sh:in ("click" "view" "purchase" "signup") ] .
            |""".stripMargin))
      val stream = graft.streaming.StreamIngest.quadStream(s, dir)
      val violations = graft.shacl.Shacl.rowValidator(shapes)(stream)
      ordered(graft.streaming.StreamIngest.runCompleteToTable(s, violations,
        mode = "append")
        .select(col("s"), col("p"), col("value"), col("component")))
    }),
    // Streaming IVF index maintenance (r11 cont.): vectors arriving on a
    // stream assign to BATCH-trained centroids via a pure column-fold
    // argmax (no window, no join — stream-safe); posting lists grow per
    // micro-batch, no retrain in the hot path. Oracle replays the same
    // Lloyd's training + final assignment.
    "stream_ivf_assign" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.pipeline.Similarity.trainedCentroids(
        emb, "vec_id", "embedding")
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      val stream = s.readStream.schema(schema)
        .parquet(s"$dir/embeddings.parque[t]")
      val assigned = graft.pipeline.Similarity.assignToCentroids(
        stream, "vec_id", "embedding", cents)
      ordered(graft.streaming.StreamIngest.runCompleteToTable(s, assigned,
        mode = "append")
        .select(col("vec_id").cast("bigint").as("vec_id"),
          col("cid").cast("bigint").as("cid")))
    }),
    // Streaming PQ encoding (r12 cont.): vectors arriving on a stream
    // compress to m codes against batch-trained codebooks — a pure
    // column fold per row (no state/join/window), the PQ index-
    // maintenance path; codes equal the batch encoding (shared oracle
    // arithmetic replayed by DuckDB).
    "stream_pq_code" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val emb = tbl(s, dir, "embeddings")
      val books = graft.pipeline.Similarity.trainedBooks(
        emb, "vec_id", "embedding")
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      val stream = s.readStream.schema(schema)
        .parquet(s"$dir/embeddings.parque[t]")
      val coded = graft.pipeline.Similarity.encodePq(
        stream, "vec_id", "embedding", books)
      ordered(graft.streaming.StreamIngest.runCompleteToTable(s, coded,
        mode = "append")
        .select(col("vec_id").cast("bigint").as("vec_id"),
          col("code0").cast("bigint").as("code0"),
          col("code1").cast("bigint").as("code1"),
          col("code2").cast("bigint").as("code2"),
          col("code3").cast("bigint").as("code3")))
    }),
    // STREAMING as-of join (r12 cont.): events arriving on a stream look up
    // the latest static right row per key — the static side interval-izes
    // once (lead window) so the lookup is a plain stream-static
    // equi+range LEFT join, no state/watermark; answers equal the batch
    // j8_asof_join (same DuckDB ASOF LEFT JOIN oracle).
    "stream_asof" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = graft.streaming.StreamIngest.readEventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val joined = graft.pipeline.AsOf.asofStream(purchases, clicks,
        "user_id", "ts", "ts", Seq("click_id"), tieBreak = "click_id",
        toleranceMicros = Some(2L * 3600 * 1000000))
      ordered(graft.streaming.StreamIngest.runCompleteToTable(s, joined,
        mode = "append")
        .select(col("event_id").cast("bigint").as("event_id"),
          col("user_id").cast("bigint").as("user_id"),
          col("click_id").cast("bigint").as("click_id")))
    }),
    // Streaming LSH near-dup (r11): SimHash keys computed per arriving
    // row by the one-pass kernel, per-bucket custom state emits verified
    // pairs — output equals the batch band join (shared oracle).
    "stream_simhash_pairs" -> ((s, dir) =>
      ordered(graft.streaming.StreamIngest.simhashPairsStream(s, dir))),
    // SHACL core validation (GraphDB ships shape validation as a repository
    // feature — reference Dockerfile:2): the shapes graph is parsed
    // driver-side (schema-sized), every constraint compiles to joins /
    // aggregates over the quad view, and the report rows ARE the violations.
    // Here: customers over an account-balance cap + a market-segment
    // allow-list; every nation under-counts a required duplicate name.
    "shacl_report" -> ((s, dir) => {
      // ~15 constraint branches each re-scan the quad view; materialize the
      // (row-count-bounded) exploded quads ONCE so every branch reads the
      // checkpoint instead of re-running the 3-table explode
      val data = DirectMapper.testdataQuads(s, dir,
        Seq("customer", "nation", "region")).localCheckpoint()
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |<urn:shape/Customer> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/customer> ;
          |  sh:property [ sh:path <urn:graft/customer#c_acctbal> ;
          |                sh:maxInclusive 8000.0 ; sh:minCount 1 ] ;
          |  sh:property [ sh:path <urn:graft/customer#c_acctbal> ;
          |                sh:or ( [ sh:maxInclusive 5000.0 ]
          |                        [ sh:minInclusive 7000.0 ] ) ] ;
          |  sh:property [ sh:path <urn:graft/customer#c_mktsegment> ;
          |                sh:in ("AUTOMOBILE" "BUILDING" "FURNITURE" "MACHINERY") ] ;
          |  sh:property [ sh:path <urn:graft/customer#c_nationkey> ;
          |                sh:nodeKind sh:IRI ; sh:class <urn:graft/class/nation> ] ;
          |  sh:property [ sh:path <urn:graft/customer#c_nationkey> ;
          |                sh:node <urn:shape/SmallNation> ] .
          |<urn:shape/SmallNation> a sh:NodeShape ;
          |  sh:property [ sh:path <urn:graft/nation#n_nationkey> ;
          |                sh:maxInclusive 9.0 ] .
          |<urn:shape/Nation> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/nation> ;
          |  sh:property [ sh:path <urn:graft/nation#n_name> ; sh:minCount 2 ] ;
          |  sh:property [ sh:path <urn:graft/nation#n_regionkey> ;
          |                sh:class <urn:graft/class/region> ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("result_path"), col("component")))
    }),
    // SHACL sh:xone (r12): exactly-one-branch semantics at BOTH levels —
    // a property-level xone over acctbal ranges (values passing both
    // branches flag) and a NODE-level xone whose focus nodes are the
    // LITERAL objects of c_mktsegment (pattern XOR in-list on the focus
    // term itself).
    "shacl_xone" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("customer"))
        .localCheckpoint()
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |<urn:shape/Bal> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/customer> ;
          |  sh:property [ sh:path <urn:graft/customer#c_acctbal> ;
          |    sh:xone ( [ sh:maxInclusive 3000.0 ]
          |              [ sh:minInclusive 1000.0 ] ) ] .
          |<urn:shape/Seg> a sh:NodeShape ;
          |  sh:targetObjectsOf <urn:graft/customer#c_mktsegment> ;
          |  sh:xone ( [ sh:pattern "^B" ]
          |            [ sh:in ("BUILDING" "MACHINERY") ] ) .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("component")))
    }),
    // SHACL-SPARQL (r12): an sh:sparql constraint whose sh:select joins two
    // tables through the engine's own SPARQL compiler — flags customers
    // with a negative balance, reporting their nation's name as ?value.
    // Set-based $this pre-binding: the query runs ONCE, solutions join to
    // the focus set; DuckDB replays it as the plain relational join.
    "shacl_sparql" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("customer", "nation"))
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |<urn:shape/Solvent> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/customer> ;
          |  sh:sparql [
          |    sh:message "negative balance" ;
          |    sh:select "SELECT $this ?value WHERE { $this <urn:graft/customer#c_nationkey> ?n . ?n <urn:graft/nation#n_name> ?value . $this <urn:graft/customer#c_acctbal> ?b . FILTER(?b < 0) }"
          |  ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("component"), col("value"), col("message")))
    }),
    // SHACL property paths beyond predicate/inverse/sequence (r12 cont.):
    // sh:alternativePath (one IN-list scan over the alternatives) and
    // sh:zeroOrOnePath (the focus node itself joins the value set).
    "shacl_paths" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("customer", "nation"))
        .localCheckpoint()
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
          |<urn:shape/CustLabel> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/customer> ;
          |  sh:property [
          |    sh:path [ sh:alternativePath ( <urn:graft/customer#c_name>
          |                                   <urn:graft/customer#c_mktsegment> ) ] ;
          |    sh:pattern "^Customer" ] .
          |<urn:shape/NationRef> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/nation> ;
          |  sh:property [ sh:path [ sh:zeroOrOnePath <urn:graft/nation#n_regionkey> ] ;
          |                sh:datatype xsd:string ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("result_path"), col("component"),
          col("value")))
    }),
    // SHACL-SPARQL CUSTOM constraint component (r12 cont.): a declared
    // sh:ConstraintComponent whose parameter value substitutes into an
    // ASK validator — FILTER-only body compiles to one codegen'd column
    // predicate per value (the same posture as built-in value
    // constraints); the report carries the component's own IRI.
    "shacl_component" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("customer"))
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |<urn:comp/MinBal> a sh:ConstraintComponent ;
          |  sh:parameter [ sh:path <urn:param/minBal> ] ;
          |  sh:message "balance below floor" ;
          |  sh:validator [ sh:ask "ASK { FILTER($value >= $minBal) }" ] .
          |<urn:shape/CustBal> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/customer> ;
          |  sh:property [ sh:path <urn:graft/customer#c_acctbal> ;
          |                <urn:param/minBal> 0.0 ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("result_path"), col("component"),
          col("message")))
    }),
    // SHACL property-PAIR constraints (r12 cont.): sh:equals/sh:disjoint
    // (full-term set algebra per focus — anti/semi-joins) over part's
    // size-vs-key columns, and sh:lessThan(OrEquals) (every value pair must
    // compare by the numeric shadow) over lineitem's discount-vs-tax — a
    // real data-quality mix: ~55% of lineitems discount above their tax.
    "shacl_pairs" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("part", "lineitem"))
        .localCheckpoint()
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |<urn:shape/PartPair> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/part> ;
          |  sh:property [ sh:path <urn:graft/part#p_size> ;
          |                sh:equals <urn:graft/part#p_partkey> ] ;
          |  sh:property [ sh:path <urn:graft/part#p_size> ;
          |                sh:disjoint <urn:graft/part#p_partkey> ] .
          |<urn:shape/LinePair> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/lineitem> ;
          |  sh:property [ sh:path <urn:graft/lineitem#l_discount> ;
          |                sh:lessThanOrEquals <urn:graft/lineitem#l_tax> ] ;
          |  sh:property [ sh:path <urn:graft/lineitem#l_quantity> ;
          |                sh:lessThan <urn:graft/lineitem#l_extendedprice> ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("result_path"), col("component")))
    }),
    // SHACL sh:qualifiedValueShape (r12 cont.): per-nation counts of
    // customers (inverse path) whose IRI passes the qualifying value-level
    // shape, gated by qualifiedMinCount / qualifiedMaxCount.
    "shacl_qualified" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("customer", "nation"))
        .localCheckpoint()
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |<urn:shape/NationCust> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/nation> ;
          |  sh:property [ sh:path [ sh:inversePath <urn:graft/customer#c_nationkey> ] ;
          |                sh:qualifiedValueShape [ sh:pattern "[02468]$" ] ;
          |                sh:qualifiedMinCount 30 ] ;
          |  sh:property [ sh:path [ sh:inversePath <urn:graft/customer#c_nationkey> ] ;
          |                sh:qualifiedValueShape [ sh:pattern "^urn" ] ;
          |                sh:qualifiedMaxCount 60 ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("component")))
    }),
    // SHACL-SPARQL on a PROPERTY shape (r12 cont.): $PATH substitutes the
    // shape's path in the sh:select text (the spec's validator convention),
    // $this pre-binding stays set-based — one compiled query + one
    // broadcast join against the focus set.
    "shacl_psparql" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("supplier"))
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |<urn:shape/Supp> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/supplier> ;
          |  sh:property [ sh:path <urn:graft/supplier#s_acctbal> ;
          |    sh:message "negative supplier balance" ;
          |    sh:sparql [
          |      sh:select "SELECT $this ?value WHERE { $this $PATH ?value . FILTER(?value < 0) }"
          |    ] ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .select(col("focus"), col("result_path"), col("component"),
          col("value"), col("message")))
    }),
    // SHACL closed shape + pattern + inverse-path cardinality, reported as
    // per-component violation COUNTS (the conformance-dashboard shape).
    "shacl_counts" -> ((s, dir) => {
      val data = DirectMapper.testdataQuads(s, dir, Seq("customer", "nation"))
      val shapes =
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
          |@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
          |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
          |<urn:shape/NationClosed> a sh:NodeShape ;
          |  sh:targetClass <urn:graft/class/nation> ;
          |  sh:closed true ;
          |  sh:ignoredProperties ( rdf:type ) ;
          |  sh:property [ sh:path <urn:graft/nation#n_name> ;
          |                sh:pattern "^[A-J]" ; sh:datatype xsd:string ] ;
          |  sh:property [ sh:path <urn:graft/nation#n_regionkey> ;
          |                sh:nodeKind sh:IRI ] ;
          |  sh:property [ sh:path [ sh:inversePath <urn:graft/customer#c_nationkey> ] ;
          |                sh:minCount 1 ] .
          |""".stripMargin
      ordered(graft.shacl.Shacl.validateTtl(data, shapes)
        .groupBy(col("component"), col("result_path"))
        .agg(count(lit(1)).cast("bigint").as("n")))
    }),
    // TPC-H Q1-style pricing summary — decimal-exact aggregate (bench
    // headliner; exercises the property-table fast path directly).
    // TPC-H Q5-shaped SPARQL text (r13): a SIX-way join — region filter,
    // nation, customer, orders (dateTime range), lineitem, supplier with
    // the customer-and-supplier-share-a-nation equality — grouped per
    // nation. Exercises the statistics-driven greedy join order end to
    // end; measures are integer-exact (SUM of integer-valued quantity,
    // COUNT) so the aggregate is order-free across engines.
    "q5_region_volume" -> ((s, dir) => {
      val (cat, _) = ctx(s, dir)
      val df = new Engine(cat).select(
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
          |SELECT ?nname (SUM(?qty) AS ?sum_qty) (COUNT(*) AS ?n) WHERE {
          |  ?r <urn:graft/region#r_name> "ASIA" .
          |  ?nk <urn:graft/nation#n_regionkey> ?r ;
          |      <urn:graft/nation#n_name> ?nname .
          |  ?c <urn:graft/customer#c_nationkey> ?nk .
          |  ?o <urn:graft/orders#o_custkey> ?c ;
          |     <urn:graft/orders#o_orderdate> ?od .
          |  ?l <urn:graft/lineitem#l_orderkey> ?o ;
          |     <urn:graft/lineitem#l_suppkey> ?sp ;
          |     <urn:graft/lineitem#l_quantity> ?qty .
          |  ?sp <urn:graft/supplier#s_nationkey> ?nk .
          |  FILTER(?od >= "1994-01-01T00:00:00"^^xsd:dateTime &&
          |         ?od < "1996-01-01T00:00:00"^^xsd:dateTime)
          |} GROUP BY ?nname""".stripMargin)
      ordered(df.select(sv(df, "nname", "nname"), nv(df, "sum_qty", "sum_qty"),
        cnt(df, "n", "n")))
    }),
    "q1_pricing" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem")
      ordered(l.filter(col("l_shipdate") <= lit("1999-12-31"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n")))
    })
  )

  def queries: Map[String, Q] = algebraQueries ++ functionQueries ++ pipelineQueries

  /** Headline subset Bench runs at sf0.1 (Verify still runs everything). */
  val benchQueries: Seq[String] = Seq(
    "q1_pricing", "j1_star_bgp", "j2_chain_join", "j3_optional", "a1_count_all",
    "a2_group_count", "a3_stats", "o1_order_limit", "g5_path_closure",
    "dd_ngram_pairs", "dd_cosine_pairs", "sim_knn_brute", "txt_quality",
    "stream_window_counts",
    // spatial pair (r9): the polygon verify must keep the grid equi-join's
    // posture — geo_polygon_sjoin is gated at ≤ 2x geo_sjoin's wall
    "geo_sjoin", "geo_polygon_sjoin",
    // r10 (judge ask): measure the index-pruned BM25 path and the
    // canonical-cell polygon×polygon join at every bench scale, so the
    // pruning/exactly-once claims are benchmarked, not only plan-asserted
    "fts_bm25", "geo_poly_sjoin",
    // r11 (judge ask): the two most state/iteration-heavy r10 additions —
    // the watermarked stream-stream join and the recursive bnode-closure
    // DESCRIBE — now have tracked wall-time, not only correctness
    "stream_pair_join", "sp_describe_cbd",
    // r11: the persisted-IVF probe (build memoized into the cold rep,
    // medians time the bucket-pruned query path — same split as fts_bm25)
    "sim_knn_ivf_idx",
    // late-r11: the new iteration/state-heavy additions get tracked
    // wall-time — kernel-keyed streaming LSH dedup, cost-bounded weighted
    // SSSP, and the broadcast decontamination join
    "stream_simhash_pairs", "gx_wsssp", "dd_decontam",
    // r11 cont.: the two join-shaped additions — SHACL validation (a
    // union of constraint scans/aggregates) and the windowed as-of join —
    // plus the two heaviest pipeline additions, SemDeDup (k-means +
    // within-cluster pairs) and the corpus bigram LM
    "shacl_report", "j8_asof_join", "dd_semantic", "txt_lm",
    // r12: the analyzed-FTS path (stopword+stemmer chain on index build,
    // memoized like fts_bm25 — medians time the analyzed query side) and
    // the degenerate-capable polygon overlay
    "fts_stem", "geo_diff",
    // r12 cont.: the two new join-shaped scale paths — the set-based
    // SHACL-SPARQL constraint (one compiled query + one broadcast join
    // against the focus set) and the holed-polygon grid join (exterior
    // envelope cells + all-rings parity verify)
    "shacl_sparql", "geo_holes_sjoin",
    // late-r12: the stream-static as-of lookup (the online feature-store
    // join shape). The property-PAIR validation stays OUT of the headline
    // set deliberately: at sf0.1 it emits ~560k violation rows, so its
    // wall is output-bound (±2x run-to-run on materialization), not a
    // stable signal — correctness gates it at sf0.01 instead.
    "stream_asof",
    // final-r12: the wildcard path search — edge-view build (the allQuads
    // lift) + 4 frontier rounds; tracks the plugin surface's real cost
    "gx_pathsearch",
    // r13: the three new shuffle-shaped ops — exact substring-dedup spans
    // (gram aggregate + per-doc merge window), DSIR importance weighting
    // (two bucket aggregates + map-side weight join), and the similarity
    // plugin's term search (broadcast query vector + per-doc aggregate)
    "dd_substring", "smp_importance", "sim_doc_search",
    // r13 cont.: the six-way-join SPARQL text query (join-order probe)
    "q5_region_volume",
    // r14: the three new surfaces — luc:score (per-clause tf·idf joins
    // over the tf postings), the pattern-restricted path walk (compiled
    // edge pattern feeding the frontier loop), and the similarity
    // plugin's IVF vector probe (bucket-pruned posting scan)
    "fts_luc_score", "gx_pathsearch_pattern", "sim_vec_search",
    // r14 cont.: the predication-similarity search (posting-intersection
    // candidates + shared cosine path), temperature-scaled domain quotas
    // (two tiny aggregates + the two-stage group-limit window), and the
    // streaming postings maintenance (stateless batch-local explode +
    // bucketed append — the ingest-side index cost)
    "sim_pred_search", "smp_temperature", "stream_fts_ingest",
    // r14 cont.: the SQL-access surface (SPARQL views under spark.sql —
    // cross-boundary pushdown is the point), the even-odd makeValid
    // repair, and the GeoSPARQL 1.1 measures
    "sql_view_join", "geo_makevalid", "geo_measures",
    // r15: the geodesic measure kernels, the literal/axiom ruleset
    // fixpoint, the consistency-violation join, and the pocket-sealing
    // buffer (arrangement fills) — each a new per-row kernel or join
    // shape whose wall should be tracked, not only gated
    "geo_geodesic", "inf_custom_rules2", "inf_consistency", "geo_pbuffer",
    // r15 cont.: the pseudo-graph views (two extra closures — implicit =
    // anti-join, disable-sameAs = the no-subst re-materialization), the
    // proof-plugin explanation joins (per-rule broadcast joins over the
    // store, constant-target pruned), and RRF fusion (two top-k legs +
    // a k-row outer join — the legs are the cost)
    "s4_pseudo_graphs", "inf_explain", "ret_hybrid_rrf",
    // r15 cont.: the in-doc span trim (window-keyed dedup + per-doc
    // reassembly fold) — a corpus-sized two-window shape worth tracking
    "dd_trim_spans")

  // ------------------------------------------------------------ oracles

  def oracleSql: Map[String, String] = OracleSql.all
}
