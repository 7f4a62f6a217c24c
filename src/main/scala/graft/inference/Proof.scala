package graft.inference

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Rdf
import graft.sources.DirectMapper

/** PROOF PLUGIN — the Spark-native analog of GraphDB's proof plugin
  * (`http://www.ontotext.com/proof/`, a documented plugin of the shipped
  * binary, `Dockerfile:2`): explain WHY a statement is in the closure.
  * For a target triple, each SOLUTION is one rule application concluding
  * exactly that triple, presented one row per ANTECEDENT — the rule name,
  * a solution id grouping the application's antecedents, the antecedent
  * index, and the antecedent quad. An asserted statement explains itself
  * under the rule name `explicit`.
  *
  * The rule inventory mirrors [[Inference.applyRules]] one-to-one (RDFS-
  * Plus): every non-asserted fact of a materialized store is concluded by
  * at least one SINGLE-STEP application over CLOSED-store facts — the
  * fixpoint guarantees intermediate conclusions are themselves store
  * facts, so single-step joins give complete proofs (chains surface as
  * one application per link, each separately explainable).
  *
  * SCALE SHAPE: [[explanations]] is LAZY — per rule, the schema side
  * (domain/range/subclass… declarations) is a vocabulary-sized broadcast
  * and the data side one predicate-filtered store scan, the same join
  * shapes as a single inference pass. A caller restricting the target
  * (the compiler pushes constant subject/predicate/object filters onto
  * the conclusion columns) prunes the data-side scans through ordinary
  * Catalyst pushdown; nothing is ever enumerated per-fact on the driver.
  */
object Proof {

  val Ns = "http://www.ontotext.com/proof/"

  /** One rule application before unpivoting: conclusion (cs, cp, co) +
    * up to three antecedent quads. Absent antecedent columns are null.
    */
  private final case class RuleFrame(rule: String, df: DataFrame, arity: Int)

  private def iriT(c: Column): Column = DirectMapper.iriTerm(c)

  /** Canonical text of a term struct (solution-id hashing). */
  private def canon(t: Column): Column = concat_ws("",
    t.getField("kind").cast("string"), t.getField("value"),
    coalesce(t.getField("dtype"), lit("")),
    coalesce(t.getField("lang"), lit("")))

  private def ante(i: Int, s: Column, p: Column, o: Column,
      g: Column): Seq[Column] =
    Seq(s.as(s"a${i}_s"), p.as(s"a${i}_p"), o.as(s"a${i}_o"), g.as(s"a${i}_g"))

  /** All single-step explanations over a closed `store`, one row per
    * (rule application, antecedent):
    * `cs, cp, co` — the concluded triple (subject/predicate strings,
    * object term struct); `rule` — rule name; `sol` — md5 id shared by
    * the application's antecedent rows; `idx` — 1-based antecedent
    * position; `a_s, a_p, a_o, a_g` — the antecedent quad. `asserted`
    * (when known — repository catalogs register it as the
    * `onto:explicit` pseudo-graph) contributes the `explicit`
    * self-explanations.
    */
  def explanations(store: DataFrame, asserted: Option[DataFrame],
      customRules: Seq[CustomRules.Rule] = Nil): DataFrame = {
    val isIriObj = col("o.kind") === Rdf.KindIri
    def schema(pred: String): DataFrame = broadcast(
      store.filter(col("p") === pred && isIriObj)
        .select(col("s").as("_ss"), col("o.value").as("_so"),
          col("graph").as("_sg")))
    def declared(cls: String): DataFrame = broadcast(
      store.filter(col("p") === Rdf.RdfType && isIriObj &&
          col("o.value") === cls)
        .select(col("s").as("_ss"), col("graph").as("_sg")))

    val frames = collection.mutable.ListBuffer.empty[RuleFrame]

    asserted.foreach { a =>
      frames += RuleFrame("explicit", a.select(
        Seq(col("s").as("cs"), col("p").as("cp"), col("o").as("co")) ++
          ante(1, col("s"), col("p"), col("o"), col("graph")): _*), 1)
    }

    // rdfs2 (domain): [p domain C], [x p y] ⇒ x a C
    frames += RuleFrame("rule_domain",
      store.join(schema(Rdf.RdfsDomain), col("p") === col("_ss")).select(
        Seq(col("s").as("cs"), lit(Rdf.RdfType).as("cp"),
          iriT(col("_so")).as("co")) ++
          ante(1, col("_ss"), lit(Rdf.RdfsDomain), iriT(col("_so")), col("_sg")) ++
          ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)

    // rdfs3 (range): [p range C], [x p y·IRI] ⇒ y a C
    frames += RuleFrame("rule_range",
      store.filter(isIriObj)
        .join(schema(Rdf.RdfsRange), col("p") === col("_ss")).select(
        Seq(col("o.value").as("cs"), lit(Rdf.RdfType).as("cp"),
          iriT(col("_so")).as("co")) ++
          ante(1, col("_ss"), lit(Rdf.RdfsRange), iriT(col("_so")), col("_sg")) ++
          ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)

    // rdfs9 (subclass instance): [C1 sco C2], [x a C1] ⇒ x a C2
    frames += RuleFrame("rule_subclass",
      store.filter(col("p") === Rdf.RdfType && isIriObj)
        .join(schema(Rdf.RdfsSubClassOf), col("o.value") === col("_ss"))
        .select(
          Seq(col("s").as("cs"), lit(Rdf.RdfType).as("cp"),
            iriT(col("_so")).as("co")) ++
            ante(1, col("_ss"), lit(Rdf.RdfsSubClassOf), iriT(col("_so")), col("_sg")) ++
            ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)

    // owl equivalentClass (both orientations): [C1 eq C2], [x a C1] ⇒ x a C2
    val eqc = schema(Rdf.OwlEquivalentClass)
    Seq(("_ss", "_so"), ("_so", "_ss")).foreach { case (from, to) =>
      frames += RuleFrame("rule_equiv_class",
        store.filter(col("p") === Rdf.RdfType && isIriObj)
          .join(eqc, col("o.value") === col(from)).select(
          Seq(col("s").as("cs"), lit(Rdf.RdfType).as("cp"),
            iriT(col(to)).as("co")) ++
            ante(1, col("_ss"), lit(Rdf.OwlEquivalentClass), iriT(col("_so")), col("_sg")) ++
            ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)
    }

    // rdfs7 (subproperty): [p spo q], [x p y] ⇒ x q y
    frames += RuleFrame("rule_subprop",
      store.join(schema(Rdf.RdfsSubPropertyOf), col("p") === col("_ss"))
        .select(
          Seq(col("s").as("cs"), col("_so").as("cp"), col("o").as("co")) ++
            ante(1, col("_ss"), lit(Rdf.RdfsSubPropertyOf), iriT(col("_so")), col("_sg")) ++
            ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)

    // owl equivalentProperty (both orientations)
    val eqp = schema(Rdf.OwlEquivalentProperty)
    Seq(("_ss", "_so"), ("_so", "_ss")).foreach { case (from, to) =>
      frames += RuleFrame("rule_equiv_prop",
        store.join(eqp, col("p") === col(from)).select(
          Seq(col("s").as("cs"), col(to).as("cp"), col("o").as("co")) ++
            ante(1, col("_ss"), lit(Rdf.OwlEquivalentProperty), iriT(col("_so")), col("_sg")) ++
            ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)
    }

    // owl inverseOf (both orientations): [p inv q], [x p y·IRI] ⇒ y q x
    val inv = schema(Rdf.OwlInverseOf)
    Seq(("_ss", "_so"), ("_so", "_ss")).foreach { case (from, to) =>
      frames += RuleFrame("rule_inverse",
        store.filter(isIriObj).join(inv, col("p") === col(from)).select(
          Seq(col("o.value").as("cs"), col(to).as("cp"),
            iriT(col("s")).as("co")) ++
            ante(1, col("_ss"), lit(Rdf.OwlInverseOf), iriT(col("_so")), col("_sg")) ++
            ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)
    }

    // SymmetricProperty: [p a Sym], [x p y·IRI] ⇒ y p x
    frames += RuleFrame("rule_symmetric",
      store.filter(isIriObj)
        .join(declared(Rdf.OwlSymmetric), col("p") === col("_ss")).select(
        Seq(col("o.value").as("cs"), col("p").as("cp"),
          iriT(col("s")).as("co")) ++
          ante(1, col("_ss"), lit(Rdf.RdfType), iriT(lit(Rdf.OwlSymmetric)), col("_sg")) ++
          ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)

    // built-in sameAs symmetry: [x sameAs y] ⇒ y sameAs x
    frames += RuleFrame("rule_sameas_sym",
      store.filter(col("p") === Rdf.OwlSameAs && isIriObj &&
          col("s") =!= col("o.value")).select(
        Seq(col("o.value").as("cs"), lit(Rdf.OwlSameAs).as("cp"),
          iriT(col("s")).as("co")) ++
          ante(1, col("s"), col("p"), col("o"), col("graph")): _*), 1)

    // TransitiveProperty: [p a Trans], [x p m·IRI], [m p z] ⇒ x p z
    val transDecl = declared(Rdf.OwlTransitive)
    val hop = store.filter(isIriObj)
      .join(transDecl, col("p") === col("_ss"))
      .select(col("s").as("_h1s"), col("p").as("_hp"), col("o").as("_h1o"),
        col("graph").as("_h1g"), col("_sg"))
    frames += RuleFrame("rule_transitive",
      hop.join(store.select(col("s").as("_h2s"), col("p").as("_h2p"),
          col("o").as("_h2o"), col("graph").as("_h2g")),
        col("_h1o.value") === col("_h2s") && col("_hp") === col("_h2p"))
        .select(
          Seq(col("_h1s").as("cs"), col("_hp").as("cp"),
            col("_h2o").as("co")) ++
            ante(1, col("_hp"), lit(Rdf.RdfType), iriT(lit(Rdf.OwlTransitive)), col("_sg")) ++
            ante(2, col("_h1s"), col("_hp"), col("_h1o"), col("_h1g")) ++
            ante(3, col("_h2s"), col("_h2p"), col("_h2o"), col("_h2g")): _*), 3)

    // built-in sameAs transitivity: [x sameAs m], [m sameAs z] ⇒ x sameAs z
    val sa = store.filter(col("p") === Rdf.OwlSameAs && isIriObj)
    frames += RuleFrame("rule_sameas_trans",
      sa.select(col("s").as("_h1s"), col("o").as("_h1o"), col("graph").as("_h1g"))
        .join(sa.select(col("s").as("_h2s"), col("o").as("_h2o"),
          col("graph").as("_h2g")), col("_h1o.value") === col("_h2s"))
        .filter(col("_h1s") =!= col("_h2o.value")) // rdfsplus drops x sameAs x
        .select(
          Seq(col("_h1s").as("cs"), lit(Rdf.OwlSameAs).as("cp"),
            col("_h2o").as("co")) ++
            ante(1, col("_h1s"), lit(Rdf.OwlSameAs), col("_h1o"), col("_h1g")) ++
            ante(2, col("_h2s"), lit(Rdf.OwlSameAs), col("_h2o"), col("_h2g")): _*), 2)

    // FunctionalProperty: [p a Func], [s p o1·IRI], [s p o2·IRI], o1<o2
    //   ⇒ o1 sameAs o2
    val fdecl = declared(Rdf.OwlFunctional)
    val fdat = store.filter(isIriObj).join(fdecl, col("p") === col("_ss"))
    frames += RuleFrame("rule_functional",
      fdat.select(col("s").as("_f1s"), col("p").as("_fp"), col("o").as("_f1o"),
          col("graph").as("_f1g"), col("_sg"))
        .join(fdat.select(col("s").as("_f2s"), col("p").as("_f2p"),
          col("o").as("_f2o"), col("graph").as("_f2g")),
          col("_f1s") === col("_f2s") && col("_fp") === col("_f2p") &&
            col("_f1o.value") < col("_f2o.value"))
        .select(
          Seq(col("_f1o.value").as("cs"), lit(Rdf.OwlSameAs).as("cp"),
            iriT(col("_f2o.value")).as("co")) ++
            ante(1, col("_fp"), lit(Rdf.RdfType), iriT(lit(Rdf.OwlFunctional)), col("_sg")) ++
            ante(2, col("_f1s"), col("_fp"), col("_f1o"), col("_f1g")) ++
            ante(3, col("_f2s"), col("_f2p"), col("_f2o"), col("_f2g")): _*), 3)

    // InverseFunctionalProperty: [p a InvFunc], [s1 p o], [s2 p o], s1<s2
    //   ⇒ s1 sameAs s2
    val ifdecl = declared(Rdf.OwlInverseFunctional)
    val ifdat = store.join(ifdecl, col("p") === col("_ss"))
    frames += RuleFrame("rule_invfunctional",
      ifdat.select(col("s").as("_f1s"), col("p").as("_fp"), col("o").as("_f1o"),
          col("graph").as("_f1g"), col("_sg"))
        .join(ifdat.select(col("s").as("_f2s"), col("p").as("_f2p"),
          col("o").as("_f2o"), col("graph").as("_f2g")),
          col("_fp") === col("_f2p") && col("_f1o") === col("_f2o") &&
            col("_f1s") < col("_f2s"))
        .select(
          Seq(col("_f1s").as("cs"), lit(Rdf.OwlSameAs).as("cp"),
            iriT(col("_f2s")).as("co")) ++
            ante(1, col("_fp"), lit(Rdf.RdfType), iriT(lit(Rdf.OwlInverseFunctional)), col("_sg")) ++
            ante(2, col("_f1s"), col("_fp"), col("_f1o"), col("_f1g")) ++
            ante(3, col("_f2s"), col("_f2p"), col("_f2o"), col("_f2g")): _*), 3)

    // sameAs substitution: [x sameAs y], [x p o] ⇒ y p o (not reflexive)
    frames += RuleFrame("rule_sameas_subj",
      store.join(sa.select(col("s").as("_xs"), col("o").as("_xo"),
          col("graph").as("_xg")), col("s") === col("_xs"))
        .filter(!(col("p") === Rdf.OwlSameAs &&
          col("_xo.value") === col("o.value")))
        .select(
          Seq(col("_xo.value").as("cs"), col("p").as("cp"), col("o").as("co")) ++
            ante(1, col("_xs"), lit(Rdf.OwlSameAs), col("_xo"), col("_xg")) ++
            ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)

    // sameAs substitution: [x sameAs y], [s p x·obj] ⇒ s p y (not reflexive)
    frames += RuleFrame("rule_sameas_obj",
      store.filter(isIriObj)
        .join(sa.select(col("s").as("_xs"), col("o").as("_xo"),
          col("graph").as("_xg")), col("o.value") === col("_xs"))
        .filter(!(col("p") === Rdf.OwlSameAs &&
          col("s") === col("_xo.value")))
        .select(
          Seq(col("s").as("cs"), col("p").as("cp"),
            col("_xo").as("co")) ++
            ante(1, col("_xs"), lit(Rdf.OwlSameAs), col("_xo"), col("_xg")) ++
            ante(2, col("s"), col("p"), col("o"), col("graph")): _*), 2)

    // custom PIE-subset rules (the repository's own ruleset, when one is
    // configured): one frame per (rule, conclusion atom), premise quads
    // as antecedents — GraphDB's proof plugin explains under whatever
    // ruleset the repository runs
    frames ++= CustomRules.proofFrames(store, customRules)
      .map { case (name, df, n) => RuleFrame(name, df, n) }

    // unpivot: sol id over (rule, conclusion, all antecedents), then one
    // row per present antecedent
    frames.toList.map { rf =>
      val solParts: Seq[Column] =
        Seq(lit(rf.rule), col("cs"), col("cp"), canon(col("co"))) ++
          (1 to rf.arity).flatMap(i => Seq(
            coalesce(col(s"a${i}_s"), lit("")),
            coalesce(col(s"a${i}_p"), lit("")),
            when(col(s"a${i}_o").isNull, lit(""))
              .otherwise(canon(col(s"a${i}_o"))),
            coalesce(col(s"a${i}_g"), lit(""))))
      val withSol = rf.df.withColumn("sol",
        md5(concat_ws("", solParts: _*)))
      (1 to rf.arity).map { i =>
        withSol.select(col("cs"), col("cp"), col("co"),
          lit(rf.rule).as("rule"), col("sol"), lit(i).as("idx"),
          col(s"a${i}_s").as("a_s"), col(s"a${i}_p").as("a_p"),
          col(s"a${i}_o").as("a_o"), col(s"a${i}_g").as("a_g"))
      }.reduce(_.unionAll(_))
    }.reduce(_.unionAll(_))
  }
}
