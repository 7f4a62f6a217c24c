package graft.sources

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Rdf

/** Per-repository configuration — the Spark analog of the reference's
  * repository JSON config (`init-graphdb.sh:41-72`):
  *   - `inference`: run the RDFS-Plus closure on load (the config's
  *     `"ruleset": "rdfsplus-optimized"`, `init-graphdb.sh:47`);
  *   - `partitionByPredicate`: persist snapshots predicate-partitioned
  *     ([[GraphStore]] — the predicate-list / context-index analog,
  *     `init-graphdb.sh:56-65`);
  *   - `location`: a base path for persisted snapshots; None keeps the
  *     repository as an in-session lazy DataFrame.
  *   - `queryTimeoutSec`: the config's `queryTimeout: 30`
  *     (`init-graphdb.sh:66-70`) — eager [[graft.Engine]] actions on this
  *     repository are cancelled (job-group watchdog) past the bound.
  */
final case class RepoConfig(inference: Boolean = false,
    partitionByPredicate: Boolean = true, location: Option[String] = None,
    queryTimeoutSec: Option[Int] = None)

/** S4: repository DDL / catalog management — create, list, drop, load into,
  * update, and query named repositories (the `POST /rest/repositories`
  * surface, `init-graphdb.sh:41-72`; `README.md:103`).
  *
  * Each repository owns an immutable quad snapshot; loads and updates
  * produce new snapshots (the same versioned-Parquet posture as
  * [[GraphUpdate]]). With a `location`, each load writes the snapshot to
  * Parquet and re-reads it — the store survives the session and every later
  * query plans against plain partition-pruned file scans.
  */
final class Repositories(spark: SparkSession) {

  private final class Repo(var quads: Option[DataFrame], val config: RepoConfig)
  private val repos = mutable.LinkedHashMap[String, Repo]()

  private def repo(id: String): Repo =
    repos.getOrElse(id, throw new IllegalArgumentException(
      s"repository '$id' does not exist"))

  def create(id: String, config: RepoConfig = RepoConfig()): this.type = {
    require(!repos.contains(id), s"repository '$id' already exists")
    repos(id) = new Repo(None, config)
    this
  }

  def list: Seq[String] = repos.keys.toSeq
  def exists(id: String): Boolean = repos.contains(id)
  def drop(id: String): Unit = repos.remove(id)

  /** Current snapshot (empty quad set if nothing loaded yet). */
  def quads(id: String): DataFrame =
    repo(id).quads.getOrElse(GraphUpdate.quadsDf(spark, Nil))

  private def commit(id: String, next: DataFrame): DataFrame = {
    val r = repo(id)
    val snap = r.config.location match {
      case Some(loc) if r.config.partitionByPredicate =>
        GraphStore.write(next, s"$loc/$id"); GraphStore.read(spark, s"$loc/$id")
      case Some(loc) =>
        next.write.mode("overwrite").parquet(s"$loc/$id")
        spark.read.parquet(s"$loc/$id")
          .select(org.apache.spark.sql.functions.col("graph"),
            org.apache.spark.sql.functions.col("s"),
            org.apache.spark.sql.functions.col("p"),
            org.apache.spark.sql.functions.col("o"))
      case None => next
    }
    r.quads = Some(snap)
    snap
  }

  /** Load an RDF document (format by extension: ttl/nt/nq/trig/jsonld/
    * rdf+xml) into the repository; applies the configured inference closure
    * over the merged snapshot and persists per config. → new snapshot.
    */
  def load(id: String, path: String, graph: String = Rdf.DefaultGraph): DataFrame = {
    val r = repo(id)
    val incoming = GraphUpdate.loadByExtension(spark,
      path.stripPrefix("file://"), graph)
    val merged = r.quads.map(GraphUpdate.insertData(_, incoming))
      .getOrElse(incoming.distinct())
    val closed =
      if (r.config.inference) graft.inference.Inference.materialize(spark, merged)
      else merged
    commit(id, closed)
  }

  /** Apply a SPARQL Update request to the repository. → new snapshot. */
  def update(id: String, text: String): DataFrame =
    commit(id, GraphUpdate.update(quads(id), text))

  /** A catalog (and engine) over the current snapshot. */
  def catalog(id: String): GraphCatalog =
    new GraphCatalog(spark).addQuads(quads(id))
  def engine(id: String): graft.Engine =
    new graft.Engine(catalog(id), repo(id).config.queryTimeoutSec)
}
