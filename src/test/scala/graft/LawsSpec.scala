package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algebra._
import graft.model.{Rdf, RdfTerm}
import graft.sources.GraphCatalog

/** Law tests for the two §7.4 top risks: SPARQL term total ordering (O2) and
  * join compatibility with possibly-unbound variables (risk #1) — checked
  * against driver-side reference implementations over seeded random inputs.
  */
class LawsSpec extends AnyFunSuite {
  import TestSpark.spark

  val rnd = new scala.util.Random(42)

  def randTerm(): RdfTerm = rnd.nextInt(4) match {
    case 0 => RdfTerm.iri(s"urn:x:${rnd.nextInt(20)}")
    case 1 => RdfTerm.blank(s"_:b${rnd.nextInt(10)}")
    case 2 => RdfTerm.str(s"s${rnd.nextInt(20)}")
    case _ => RdfTerm.dbl(rnd.nextInt(100) - 50 + (if (rnd.nextBoolean()) 0.5 else 0.0))
  }

  test("term ordering law: unbound < blank < IRI < literal; numerics by value") {
    import spark.implicits._
    val terms: Seq[Option[RdfTerm]] =
      Seq.fill(150)(if (rnd.nextInt(10) == 0) None else Some(randTerm()))
    val df = terms.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
      .select(col("i"), col("t").as("term"))
    val sorted = df.orderBy(E.sortKey(r => r("term"))(n => df(n)).asc)
      .collect().map(r => Option(r.getStruct(1)).map(s =>
        (s.getByte(0), Option(s.getString(1)), Option(s.get(4)).map(_.toString.toDouble))))
    def rank(t: Option[(Byte, Option[String], Option[Double])]): Int = t match {
      case None => 0
      case Some((Rdf.KindBlank, _, _)) => 1
      case Some((Rdf.KindIri, _, _)) => 2
      case Some(_) => 3
    }
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(rank(a) <= rank(b), s"$a before $b")
        if (rank(a) == 3 && rank(b) == 3)
          for (na <- a.get._3; nb <- b.get._3) assert(na <= nb, s"$a before $b")
      case _ => ()
    }
  }

  test("RDFterm-equal: kind/lang/datatype-aware, not spelling-only (17.4.1.7)") {
    import graft.functions.SparqlFunctions
    val row = spark.range(1).select(
      SparqlFunctions.eqB(E.termLit(RdfTerm.iri("urn:x")),
        E.termLit(RdfTerm.str("urn:x"))).as("iri_vs_lit"),
      SparqlFunctions.eqB(E.termLit(RdfTerm.lang("a", "en")),
        E.termLit(RdfTerm.str("a"))).as("lang_vs_plain"),
      SparqlFunctions.eqB(E.termLit(RdfTerm.typed("a", Rdf.XsdString)),
        E.termLit(RdfTerm.str("a"))).as("xsdstr_vs_plain"),
      SparqlFunctions.eqB(E.termLit(RdfTerm.typed("05", Rdf.XsdInteger)),
        E.termLit(RdfTerm.dbl(5.0))).as("num_promotion"),
      SparqlFunctions.neqB(E.termLit(RdfTerm.iri("urn:x")),
        E.termLit(RdfTerm.str("urn:x"))).as("neq_mixed")
    ).collect()(0)
    assert(!row.getBoolean(0), "IRI must not equal a same-spelled literal")
    // r15 tranche 36: two DISTINCT literals outside the operator table are
    // a TYPE ERROR (open-world), not false — "a"@en vs "a" errors
    assert(row.isNullAt(1), "\"a\"@en = \"a\" is a type error (17.4.1.7)")
    assert(row.getBoolean(2), "explicit xsd:string IS the plain literal (RDF 1.1)")
    assert(row.getBoolean(3), "numerics compare by value across dtypes")
    assert(row.getBoolean(4), "!= is the negation")
  }

  test("join compatibility law: compiler join == reference compat join") {
    import spark.implicits._
    val cat = new GraphCatalog(spark)
    val compiler = new Compiler(cat)
    for (iter <- 1 to 3) {
      // two solution sets over vars (x shared-cert? no — x,y shared, z left, w right)
      def randRow(): (Option[String], Option[String]) =
        (if (rnd.nextInt(4) == 0) None else Some(s"v${rnd.nextInt(4)}"),
          if (rnd.nextInt(4) == 0) None else Some(s"v${rnd.nextInt(4)}"))
      val left = Seq.fill(12)(randRow())
      val right = Seq.fill(12)(randRow())
      def toSol(rows: Seq[(Option[String], Option[String])], v1: String, v2: String): Sol = {
        val df = rows.toDF("a", "b").select(
          when(col("a").isNotNull, E.iriTerm(col("a"))).as(v1),
          when(col("b").isNotNull, E.iriTerm(col("b"))).as(v2))
        Sol(df, Set.empty, Set(v1, v2)) // all vars possibly unbound
      }
      val l = toSol(left, "x", "y")
      val r = toSol(right, "x", "w")
      val got = compiler.compile(JoinOp(Wrap(l.df, l.cert, l.maybe),
          Wrap(r.df, r.cert, r.maybe)))
        .df.select(col("x").getField("value"), col("y").getField("value"),
          col("w").getField("value"))
        .collect().map(row => (Option(row.getString(0)), Option(row.getString(1)),
          Option(row.getString(2)))).toSeq.sorted.toList
      // reference: SPARQL compat — shared var x compatible iff either unbound
      // or equal; merged x = whichever is bound
      val expect = (for {
        (lx, ly) <- left
        (rx, rw) <- right
        if lx.isEmpty || rx.isEmpty || lx == rx
      } yield (lx.orElse(rx), ly, rw)).sorted.toList
      assert(got == expect, s"iter $iter")
    }
  }

  test("N-Triples round-trip law: parse(serialize(q)) == q over random terms") {
    import spark.implicits._
    import graft.sources.{NTriplesReader, RdfWriter}
    // adversarial literal alphabet: escapes, quotes, unicode, whitespace
    val chars = Array('a', 'β', '"', '\\', '\n', '\t', '\r', ' ', '.', '<')
    def randLit(): RdfTerm = rnd.nextInt(4) match {
      case 0 => RdfTerm.str(Seq.fill(rnd.nextInt(8))(chars(rnd.nextInt(chars.length))).mkString)
      case 1 => RdfTerm.lang(s"v${rnd.nextInt(5)}", if (rnd.nextBoolean()) "en" else "ga")
      case 2 => RdfTerm.typed(rnd.nextInt(100).toString, Rdf.XsdInteger)
      case _ => randTerm()
    }
    val quads = Seq.fill(120)(graft.model.Quad(Rdf.DefaultGraph,
      if (rnd.nextBoolean()) s"urn:s:${rnd.nextInt(10)}" else s"_:b${rnd.nextInt(5)}",
      s"urn:p:${rnd.nextInt(5)}", randLit()))
    val lines = RdfWriter.ntriplesLines(quads.toDS().toDF()).as[String].collect()
    val round = lines.flatMap(NTriplesReader.parseLine(_))
    assert(round.toSet == quads.toSet)
    assert(round.length == quads.length)
  }

  test("quantization law: cosine drift bounded on random unit-ish vectors") {
    import spark.implicits._
    val dim = 16
    def randVec(): Seq[Float] = Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val rows = (0L until 40L).map(i => (i, randVec()))
    val df = rows.toDF("vec_id", "embedding")
    val exact = graft.pipeline.Similarity.bruteTopK(df, df.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val quant = graft.pipeline.Similarity.quantTopK(df, df.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 10).collect()
    // int8 max-abs quantization: per-component error <= 0.5/127, cosine
    // drift stays well inside 3% for 16-dim random vectors
    quant.foreach { r =>
      exact.get((r.getLong(0), r.getLong(1))).foreach { e =>
        assert(math.abs(r.getDouble(2) - e) < 0.03, s"drift ${r.getDouble(2)} vs $e")
      }
    }
  }

  test("overlay area-conservation law: |A∩B| + |A∪B| = |A| + |B| and " +
    "|A−B| = |A| − |A∩B| over seeded random polygons") {
    import spark.implicits._
    val F = graft.functions.SparqlFunctions
    val r2 = new scala.util.Random(7)
    def rect(): String = {
      val x = r2.nextDouble() * 8; val y = r2.nextDouble() * 8
      val w = 1 + r2.nextDouble() * 5; val h = 1 + r2.nextDouble() * 5
      f"POLYGON (($x%.4f $y%.4f, ${x + w}%.4f $y%.4f, ${x + w}%.4f ${y + h}%.4f, $x%.4f ${y + h}%.4f, $x%.4f $y%.4f))"
    }
    def convex(): String = {
      // convex hull of random points = guaranteed simple convex ring
      val cx = r2.nextDouble() * 8; val cy = r2.nextDouble() * 8
      val pts = Seq.fill(7)((cx + (r2.nextDouble() - 0.5) * 6,
        cy + (r2.nextDouble() - 0.5) * 6))
      val hull = {
        val s = pts.distinct.sorted
        def half(ps: Seq[(Double, Double)]) =
          ps.foldLeft(List.empty[(Double, Double)]) { (acc, p) =>
            var a = acc
            while (a.size >= 2 && {
              val (ox, oy) = a(1); val (ax, ay) = a.head
              (ax - ox) * (p._2 - oy) - (ay - oy) * (p._1 - ox) <= 0
            }) a = a.tail
            p :: a
          }.reverse.dropRight(1)
        half(s) ++ half(s.reverse)
      }
      val ring = hull :+ hull.head
      s"POLYGON ((${ring.map(p => f"${p._1}%.4f ${p._2}%.4f").mkString(", ")}))"
    }
    def ringArea(txt: String): Double = {
      val ps = txt.split(",").map(_.trim.split("\\s+"))
        .map(a => (a(0).toDouble, a(1).toDouble))
      math.abs(ps.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
        x1 * y2 - x2 * y1 }.sum / 2.0)
    }
    def areaOf(wkt: String): Double =
      if (wkt.startsWith("MULTIPOLYGON"))
        // serializer emits MULTIPOLYGON components hole-free
        "\\(\\(([^()]*)\\)\\)".r.findAllMatchIn(wkt)
          .map(m => ringArea(m.group(1))).sum
      else {
        // POLYGON: first ring is the exterior, the rest are HOLES
        // (r12 cont. — hole-producing overlay results are answered)
        val rs = "\\(([^()]+)\\)".r.findAllMatchIn(wkt)
          .map(m => ringArea(m.group(1))).toSeq
        if (rs.isEmpty) 0.0 else rs.head - rs.tail.sum
      }
    val pairs = Seq.fill(25)((rect(), rect())) ++
      Seq.fill(25)((convex(), convex())) ++ Seq.fill(10)((rect(), convex()))
    val got = pairs.toDF("wa", "wb").select(
      col("wa"), col("wb"),
      F.geoIntersection(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("i"),
      F.geoUnion(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("u"),
      F.geoDifference(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("d"),
      F.geoSymDifference(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("sd")).collect()
    var checked = 0
    got.foreach { r =>
      val (wa, wb) = (r.getString(0), r.getString(1))
      // skip pairs where any op hit the documented error posture
      // (degenerate contact / hole-producing containment)
      if (!r.isNullAt(2) && !r.isNullAt(3) && !r.isNullAt(4) && !r.isNullAt(5)) {
        val (aA, aB) = (areaOf(wa), areaOf(wb))
        val (ai, au) = (areaOf(r.getString(2)), areaOf(r.getString(3)))
        val (ad, asd) = (areaOf(r.getString(4)), areaOf(r.getString(5)))
        val eps = 1e-6 * (aA + aB + 1)
        assert(math.abs(ai + au - (aA + aB)) < eps, s"inc-exc: $wa / $wb")
        assert(math.abs(ad - (aA - ai)) < eps, s"difference: $wa / $wb")
        assert(math.abs(asd - (au - ai)) < eps, s"symdiff: $wa / $wb")
        checked += 1
      }
    }
    assert(checked >= 40, s"only $checked non-degenerate pairs checked")
  }
}
