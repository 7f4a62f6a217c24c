package graft.inference

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Rdf

/** CUSTOM RULESETS — the Spark-native analog of the reference binary's
  * user-defined `.pie` rulesets (GraphDB repositories take a custom
  * ruleset file as the sixth config axis next to the built-in
  * rdfsplus-optimized; `Dockerfile:2` ships the feature, the repo's
  * `init-graphdb.sh` uses a built-in name). A ruleset is a list of horn
  * rules over triple atoms; materialization is the semi-naive DATALOG
  * fixpoint over the quad view.
  *
  * Text format (a PIE-inspired subset, documented here rather than the
  * binary's exact grammar):
  *
  * {{{
  * Prefices { x : <urn:x:> }
  * Rules {
  *   Id: supplier_nation
  *     li <urn:graft/lineitem#l_suppkey> s
  *     s  <urn:graft/supplier#s_nationkey> n
  *     ----------------------------------
  *     li x:suppNation n
  * }
  * }}}
  *
  * Plain identifiers are VARIABLES, `<iri>` / `pfx:local` are constants
  * (predicate positions must resolve to constants or variables bound by
  * another atom; literal constants are not part of the subset — rules
  * derive structure, not strings). `//` comments allowed.
  *
  * EVALUATION (scale posture): each rule compiles to a JOIN TREE over
  * the quad frame — a premise with a CONSTANT predicate is a narrow
  * `p = <iri>` filtered scan (partition-prunable at 100 TB where the
  * store is parquet partitioned by `p`), premises join on their shared
  * variables via term equality, conclusions project new quads. The
  * fixpoint is SEMI-NAIVE: iteration k joins the round-(k-1) DELTA into
  * each premise position against the full set (never full × full after
  * round 1), new facts are the anti-join against everything known, and
  * every round's frames are lineage-cut ([[graft.paths.PropertyPaths.cut]])
  * so no executor replays a growing DAG. Work per round ∝ |delta ⋈ …|,
  * the Datalog textbook bound, and rounds stop at the fixpoint — the
  * same loop discipline as [[Inference.materialize]] and the path
  * closure.
  */
object CustomRules {

  /** One triple atom: each position is Var(name) or Iri(value). */
  sealed trait Term
  final case class Var(name: String) extends Term
  final case class Iri(value: String) extends Term
  final case class RuleAtom(s: Term, p: Term, o: Term)
  final case class Rule(name: String, premises: Seq[RuleAtom],
      conclusions: Seq[RuleAtom]) {
    require(premises.nonEmpty, s"rule $name: no premises")
    require(conclusions.nonEmpty, s"rule $name: no conclusions")
    private val bound = premises.flatMap(a => Seq(a.s, a.p, a.o))
      .collect { case Var(n) => n }.toSet
    conclusions.flatMap(a => Seq(a.s, a.p, a.o)).collect { case Var(n) => n }
      .foreach(n => require(bound(n),
        s"rule $name: conclusion variable $n is not bound by any premise"))
  }

  // ------------------------------------------------------------- parser

  /** Parse the PIE-inspired ruleset text: optional `Prefices { … }`
    * block, one `Rules { … }` block with `Id: name` sections, premise
    * atoms, a dashed separator, conclusion atoms.
    */
  def parse(text: String): Seq[Rule] = {
    val noComments = text.linesIterator
      .map(l => { val i = l.indexOf("//"); if (i >= 0) l.substring(0, i) else l })
      .mkString("\n")
    val prefices = collection.mutable.Map.empty[String, String]
    val prefBlock = """Prefices\s*\{([^}]*)\}""".r
      .findFirstMatchIn(noComments).map(_.group(1)).getOrElse("")
    """(\S+)\s*:\s*<([^>]*)>""".r.findAllMatchIn(prefBlock).foreach { m =>
      prefices(m.group(1)) = m.group(2)
    }
    val rulesBlock = """Rules\s*\{([\s\S]*)\}""".r
      .findFirstMatchIn(noComments).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException("ruleset: no Rules { … } block"))
    def term(tok: String): Term = tok match {
      case t if t.startsWith("<") && t.endsWith(">") =>
        Iri(t.substring(1, t.length - 1))
      case t if t.contains(":") =>
        val Array(pfx, local) = t.split(":", 2)
        Iri(prefices.getOrElse(pfx, throw new IllegalArgumentException(
          s"ruleset: undeclared prefix '$pfx' in $t")) + local)
      case t if t.matches("[A-Za-z_][A-Za-z0-9_]*") => Var(t)
      case t => throw new IllegalArgumentException(s"ruleset: bad term $t")
    }
    def atom(line: String): RuleAtom = {
      val toks = line.trim.split("\\s+")
      require(toks.length == 3, s"ruleset: atom needs 3 terms: $line")
      RuleAtom(term(toks(0)), term(toks(1)), term(toks(2)))
    }
    val out = collection.mutable.ListBuffer.empty[Rule]
    var name: String = null
    var prem = collection.mutable.ListBuffer.empty[RuleAtom]
    var conc = collection.mutable.ListBuffer.empty[RuleAtom]
    var inConc = false
    def flush(): Unit = if (name != null) {
      out += Rule(name, prem.toList, conc.toList)
      prem = collection.mutable.ListBuffer.empty
      conc = collection.mutable.ListBuffer.empty
      inConc = false
    }
    rulesBlock.linesIterator.map(_.trim).filter(_.nonEmpty).foreach {
      case l if l.startsWith("Id:") =>
        flush(); name = l.stripPrefix("Id:").trim
        require(name.nonEmpty, "ruleset: empty rule id")
      case l if l.matches("-{3,}") =>
        require(name != null, "ruleset: separator before any Id:")
        require(!inConc, s"ruleset: two separators in rule $name")
        inConc = true
      case l =>
        require(name != null, s"ruleset: atom before any Id: — $l")
        if (inConc) conc += atom(l) else prem += atom(l)
    }
    flush()
    require(out.nonEmpty, "ruleset: no rules")
    out.toList
  }

  // --------------------------------------------------------- evaluation

  /** Node term struct for a subject string (IRI or `_:` bnode). */
  private def nodeTerm(c: Column): Column =
    when(c.startsWith("_:"),
      struct(lit(Rdf.KindBlank).cast("tinyint").as("kind"), c.as("value"),
        lit(null).cast("string").as("dtype"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("double").as("num")))
      .otherwise(graft.sources.DirectMapper.iriTerm(c))

  /** Bindings frame of one premise atom over `facts`: one column per
    * variable, every value a TERM STRUCT (uniform join/term equality
    * across positions). Constant positions filter; a repeated variable
    * inside one atom filters on equality.
    */
  private def atomBindings(facts: DataFrame, a: RuleAtom): DataFrame = {
    var df = facts
    var bind = List.empty[(String, Column)]
    def handle(t: Term, raw: Column, asTerm: Column => Column,
        constFilter: String => Column): Unit = t match {
      case Iri(v) => df = df.filter(constFilter(v))
      case Var(n) =>
        bind.find(_._1 == n) match {
          case Some((_, c)) => df = df.filter(c === asTerm(raw))
          case None => bind ::= (n -> asTerm(raw))
        }
    }
    handle(a.s, col("s"), nodeTerm, v => col("s") === v)
    handle(a.p, col("p"), graft.sources.DirectMapper.iriTerm,
      v => col("p") === v)
    handle(a.o, col("o"), identity, v =>
      col("o.kind") === Rdf.KindIri && col("o.value") === v)
    df.select(bind.reverse.map { case (n, c) => c.as(n) }: _*)
  }

  /** One rule firing with premise `di` reading `delta` and the rest
    * reading `full` — the semi-naive split. Returns derived QUADS.
    */
  private def fire(rule: Rule, full: DataFrame, delta: DataFrame,
      di: Int): Seq[DataFrame] = {
    val sols = rule.premises.zipWithIndex.map { case (a, i) =>
      atomBindings(if (i == di) delta else full, a)
    }.reduceLeft { (l, r) =>
      val shared = l.columns.toSeq.intersect(r.columns.toSeq)
      if (shared.isEmpty) l.crossJoin(r) // rare: disconnected premises
      else l.join(r, shared)
    }
    rule.conclusions.map { c =>
      val s = c.s match {
        case Var(n) => sols(n).getField("value")
        case Iri(v) => lit(v)
      }
      val sOk = c.s match { // a literal binding cannot be a subject
        case Var(n) => sols(n).getField("kind") =!= Rdf.KindLiteral
        case _ => lit(true)
      }
      val p = c.p match {
        case Var(n) => sols(n).getField("value")
        case Iri(v) => lit(v)
      }
      val pOk = c.p match {
        case Var(n) => sols(n).getField("kind") === Rdf.KindIri
        case _ => lit(true)
      }
      val o = c.o match {
        case Var(n) => sols(n)
        case Iri(v) => graft.sources.DirectMapper.iriTerm(lit(v))
      }
      sols.filter(sOk && pOk).select(lit(Rdf.DefaultGraph).as("graph"),
        s.as("s"), p.as("p"), o.as("o"))
    }
  }

  /** Topological rule order when the ruleset is NON-RECURSIVE: rule A
    * precedes B when a conclusion predicate of A can feed a premise of B.
    * Any variable predicate (in premise or conclusion position) is
    * conservatively recursive — it could match anything. None on a cycle.
    */
  private[graft] def stratify(rules: Seq[Rule]): Option[Seq[Rule]] = {
    def preds(atoms: Seq[RuleAtom]): Option[Set[String]] = {
      val ps = atoms.map(_.p)
      if (ps.exists(_.isInstanceOf[Var])) None
      else Some(ps.collect { case Iri(v) => v }.toSet)
    }
    val info = rules.map(r => (preds(r.premises), preds(r.conclusions)))
    if (info.exists(i => i._1.isEmpty || i._2.isEmpty)) return None
    val feeds = Array.tabulate(rules.length, rules.length) { (a, b) =>
      info(a)._2.get.intersect(info(b)._1.get).nonEmpty
    }
    // Kahn's algorithm over the rule graph
    val indeg = Array.tabulate(rules.length)(b =>
      rules.indices.count(a => a != b && feeds(a)(b)))
    if (rules.indices.exists(i => feeds(i)(i))) return None // self-loop
    val order = collection.mutable.ArrayBuffer.empty[Int]
    val ready = collection.mutable.Queue(
      rules.indices.filter(indeg(_) == 0): _*)
    while (ready.nonEmpty) {
      val a = ready.dequeue()
      order += a
      rules.indices.foreach { b =>
        if (b != a && feeds(a)(b)) { indeg(b) -= 1
          if (indeg(b) == 0) ready += b }
      }
    }
    if (order.length == rules.length) Some(order.map(rules).toSeq) else None
  }

  /** Materialize `quads` under `rules` to the unique minimal fixpoint.
    * A NON-RECURSIVE ruleset (acyclic predicate dependencies, all
    * predicates constant) evaluates STRATIFIED — each rule fires exactly
    * once in topological order, no fixpoint rounds, no empty-delta
    * closing round; anything else runs the semi-naive loop (see object
    * doc for the scale shape). Output = input ∪ derived, distinct,
    * default graph for derived facts.
    */
  def materialize(spark: SparkSession, quads: DataFrame, rules: Seq[Rule],
      maxIters: Int = 64): DataFrame = {
    val cut = (df: DataFrame) => graft.paths.PropertyPaths.cut(spark, df)
    val all0 = cut(quads.distinct())
    stratify(rules) match {
      case Some(order) =>
        var all = all0
        order.foreach { r =>
          fire(r, all, all, 0).reduceOption(_.unionAll(_)).foreach { d =>
            val fresh = d.distinct()
              .join(all, Seq("graph", "s", "p", "o"), "left_anti")
            all = cut(all.unionAll(fresh))
          }
        }
        all
      case None => loop(spark, all0, all0, rules, maxIters,
        deltaIsAll = true)
    }
  }

  /** INCREMENTAL insert: `closed` is already a fixpoint, `added` the new
    * facts — semi-naive restarts with delta = added, so the work is
    * ∝ derivations TOUCHING the insert, never a re-close of the store
    * (sound for any monotone Datalog: closure(closure(A) ∪ D) =
    * closure(A ∪ D), the same identity the RDFS incremental path uses).
    * Deletes still force re-materialization from the asserted set — a
    * derived fact may lose its last support.
    */
  def materializeIncremental(spark: SparkSession, closed: DataFrame,
      added: DataFrame, rules: Seq[Rule], maxIters: Int = 64): DataFrame = {
    val cut = (df: DataFrame) => graft.paths.PropertyPaths.cut(spark, df)
    val fresh = cut(added.distinct()
      .join(closed, Seq("graph", "s", "p", "o"), "left_anti"))
    if (fresh.isEmpty) return closed
    val all = cut(closed.unionAll(fresh))
    loop(spark, all, fresh, rules, maxIters, deltaIsAll = false)
  }

  private def loop(spark: SparkSession, all0: DataFrame, delta0: DataFrame,
      rules: Seq[Rule], maxIters: Int, deltaIsAll: Boolean): DataFrame = {
    val cut = (df: DataFrame) => graft.paths.PropertyPaths.cut(spark, df)
    var all = all0
    var delta = delta0
    var iter = 0
    while (iter < maxIters && !delta.isEmpty) {
      val derived = rules.flatMap { r =>
        // when delta == all (round 0 of a full materialize), ONE firing
        // position covers every derivation; otherwise the delta must
        // visit each premise position
        val positions =
          if (iter == 0 && deltaIsAll) Seq(0) else r.premises.indices
        positions.flatMap(i => fire(r, all, delta, i))
      }.reduceOption(_.unionAll(_)) match {
        case None => return all
        case Some(d) => d.distinct()
      }
      val fresh = cut(derived.join(all, Seq("graph", "s", "p", "o"),
        "left_anti"))
      delta = fresh
      if (!fresh.isEmpty) all = cut(all.unionAll(fresh))
      iter += 1
    }
    if (iter == maxIters && !delta.isEmpty)
      throw new IllegalStateException(
        s"custom ruleset: no fixpoint within $maxIters rounds")
    all
  }
}
