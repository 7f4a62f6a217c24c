package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID RETRIEVAL — reciprocal-rank fusion of heterogeneous rankers
  * (Cormack, Clarke & Büttcher, "Reciprocal Rank Fusion outperforms
  * Condorcet and individual Rank Learning Methods", SIGIR 2009): the
  * standard way a training-data / RAG pipeline combines a lexical BM25
  * leg with an embedding-kNN leg without score calibration — only RANK
  * positions enter, so the two legs' incomparable score scales never
  * meet.
  *
  *   rrf(d) = Σ_legs 1 / (k0 + rank_leg(d))      (k0 = 60, the paper's
  *                                                constant)
  *
  * Scale posture: every leg is a TOP-K result by construction (BM25
  * top-k is a TakeOrderedAndProject, kNN top-k likewise), so fusion
  * operates on ≤ Σ k_i rows regardless of corpus size — the outer joins
  * and the final sort are driver-trivial at any scale; all the 100 TB
  * work happened inside the legs, which keep their own scale shapes
  * (term-bucketed postings, IVF posting-list pruning). Determinism: rank
  * assignment breaks ties on document id, and the fused score is a
  * fixed-order sum of correctly-rounded IEEE divisions — the DuckDB
  * oracle replays it bit-for-bit.
  */
object Retrieval {

  /** Upper bound accepted by [[ranked]] for a leg's statically-provable
    * row count — generous for any top-k leg, far below corpus scale.
    */
  val MaxLegRows = 100000L

  /** Rank a leg's scored output: (doc, rank) with rank = 1-based position
    * under `order` (pass score DESC first, then doc ASC as the
    * deterministic tie-break). The window is UNPARTITIONED — legal only
    * because a leg is a top-k result (≤ k rows), never a corpus — and the
    * contract is ENFORCED structurally: the leg's analyzed plan must
    * statically bound its row count (a `limit`, a VALUES list, …) at or
    * under [[MaxLegRows]], or this throws. An unbounded frame would put
    * the whole corpus through a single-partition sort; refusing beats
    * silently degrading.
    */
  def ranked(leg: DataFrame, order: Column*): DataFrame = {
    val bound = leg.queryExecution.analyzed.maxRows
    require(bound.exists(_ <= MaxLegRows),
      s"Retrieval.ranked needs a statically bounded leg (<= $MaxLegRows " +
        s"rows via limit/top-k); got maxRows=$bound — add .limit(k) " +
        "upstream so the unpartitioned rank window never meets a corpus")
    leg.withColumn("rank",
      row_number().over(Window.orderBy(order: _*)).cast("int"))
  }

  /** Fuse named legs of (doc, rank) rows: full-outer join on `doc`, score
    * Σ 1/(k0+rank) with absent legs contributing 0, top-k by (rrf DESC,
    * doc ASC). Output: doc, one `rank_<name>` per leg (NULL when the leg
    * missed the document), rrf.
    */
  def rrf(legs: Seq[(String, DataFrame)], k0: Int = 60,
      k: Int = 10): DataFrame = {
    require(legs.nonEmpty, "rrf needs at least one leg")
    val named = legs.map { case (name, df) =>
      df.select(col("doc"), col("rank").cast("int").as(s"rank_$name"))
    }
    val joined = named.reduce(_.join(_, Seq("doc"), "full_outer"))
    // fixed fold order over the legs: both engines add the SAME doubles
    // in the SAME order (each term a correctly-rounded division)
    val score = legs.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0.toDouble) + col(s"rank_$name")
        .cast("double")), lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("rrf", score)
      .orderBy(col("rrf").desc, col("doc").asc)
      .limit(k)
  }
}
