package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Rdf

/** Relational→RDF direct mapping (SURVEY.md §7.3 harness bridge).
  *
  * The reference's facility entities were themselves CSV rows lifted to RDF
  * (`facilities.ttl:129-133` — "Name of the source CSV file this facility came
  * from"); this mapper does the same lift for the driver's Parquet tables:
  * one row → one subject IRI `urn:graft/{table}/{pk}`, one cell → one triple
  * `<subject> <urn:graft/{table}#{col}> (literal|IRI)`. Foreign-key columns
  * become object properties pointing at the target table's subject IRI —
  * mirroring the facility→area edge (`facilities.ttl:115-119`) so graph
  * traversal queries have real edges to walk.
  *
  * Spark-first notes: the lift is a single narrow projection
  * (`explode(array(...))` — no shuffle, no UDF, whole-stage codegen) so it
  * streams at scan speed on any input size; the inverse (property-table pivot)
  * is NOT computed from quads but recovered by reading the original Parquet,
  * which is what the compiler's star-BGP fast path does (SURVEY §4.3).
  */
object DirectMapper {
  val Base = "urn:graft"

  /** @param pks  primary key columns — composite keys joined with '/' in the
    *              subject IRI (lineitem needs (l_orderkey, l_linenumber)).
    * @param fks   fk column → referenced table (single-column keys).
    * @param graph named graph this table's quads live in (G2 context index).
    */
  final case class TableSpec(name: String, pks: Seq[String],
      fks: Map[String, String] = Map.empty, graph: String = Rdf.DefaultGraph)

  /** The driver testdata star schema (FIXTURES.md §C). */
  val testdataSpecs: Map[String, TableSpec] = Map(
    "region" -> TableSpec("region", Seq("r_regionkey")),
    "nation" -> TableSpec("nation", Seq("n_nationkey"), Map("n_regionkey" -> "region")),
    "customer" -> TableSpec("customer", Seq("c_custkey"), Map("c_nationkey" -> "nation")),
    "supplier" -> TableSpec("supplier", Seq("s_suppkey"), Map("s_nationkey" -> "nation")),
    "part" -> TableSpec("part", Seq("p_partkey")),
    "orders" -> TableSpec("orders", Seq("o_orderkey"), Map("o_custkey" -> "customer")),
    "lineitem" -> TableSpec("lineitem", Seq("l_orderkey", "l_linenumber"),
      Map("l_orderkey" -> "orders", "l_partkey" -> "part", "l_suppkey" -> "supplier")),
    "events" -> TableSpec("events", Seq("event_id"), Map("user_id" -> "customer")),
    "documents" -> TableSpec("documents", Seq("doc_id")),
    "embeddings" -> TableSpec("embeddings", Seq("vec_id"))
  )

  def entityIri(table: String, pk: Column): Column =
    concat(lit(s"$Base/$table/"), pk.cast(StringType))

  def entityIri(table: String, pks: Seq[Column]): Column =
    concat(lit(s"$Base/$table/"), concat_ws("/", pks.map(_.cast(StringType)): _*))

  def subjectOf(spec: TableSpec): Column =
    entityIri(spec.name, spec.pks.map(col))
  def predIri(table: String, col: String): String = s"$Base/$table#$col"
  def classIri(table: String): String = s"$Base/class/$table"

  private val nullS = lit(null).cast(StringType)
  private val nullD = lit(null).cast(DoubleType)

  private def termStruct(kind: Column, value: Column, dtype: Column, lang: Column, num: Column): Column =
    struct(kind.cast(ByteType).as("kind"), value.as("value"),
      dtype.as("dtype"), lang.as("lang"), num.as("num"))

  def iriTerm(value: Column): Column =
    termStruct(lit(Rdf.KindIri), value, nullS, nullS, nullD)

  /** Literal term struct for a typed column (numeric shadow populated). */
  def literalTerm(c: Column, dt: DataType): Column = dt match {
    case StringType =>
      termStruct(lit(Rdf.KindLiteral), c, nullS, nullS, nullD)
    case ByteType | ShortType | IntegerType | LongType =>
      termStruct(lit(Rdf.KindLiteral), c.cast(StringType),
        lit(Rdf.XsdInteger), nullS, c.cast(DoubleType))
    case FloatType | DoubleType | _: DecimalType =>
      termStruct(lit(Rdf.KindLiteral), c.cast(StringType),
        lit(Rdf.XsdDouble), nullS, c.cast(DoubleType))
    case BooleanType =>
      termStruct(lit(Rdf.KindLiteral), c.cast(StringType),
        lit(Rdf.XsdBoolean), nullS, nullD)
    case TimestampType | TimestampNTZType =>
      // ISO lexical form + epoch-micros shadow (exact in Double below 2^53).
      // NTZ (how the driver's pyarrow files read under Spark 4's
      // inferTimestampNTZ) is interpreted as UTC — session tz is pinned UTC.
      termStruct(lit(Rdf.KindLiteral),
        date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS"),
        lit(Rdf.XsdDateTime), nullS, unix_micros(c.cast(TimestampType)).cast(DoubleType))
    case DateType =>
      termStruct(lit(Rdf.KindLiteral), c.cast(StringType),
        lit(Rdf.XsdDateTime), nullS, unix_micros(c.cast(TimestampType)).cast(DoubleType))
    case other =>
      // Arrays/maps/binary have no RDF literal form in this model (RDF has no
      // nested values, SURVEY §1.1) — keep them out of the quad view.
      throw new IllegalArgumentException(s"no RDF literal mapping for $other")
  }

  /** Lift one table to quads. Columns with no literal mapping (arrays, binary)
    * are skipped; FK columns emit IRI objects; a `rdf:type` triple is emitted
    * per row unless `withTypes=false` (inference tests derive it instead,
    * SURVEY §2.11).
    */
  def quads(df: DataFrame, spec: TableSpec, withTypes: Boolean = true): DataFrame = {
    val graph = spec.graph
    val subj = subjectOf(spec)
    val mappable = df.schema.fields.filter { f =>
      spec.fks.contains(f.name) || (f.dataType match {
        case _: ArrayType | _: MapType | BinaryType | _: StructType => false
        case _ => true
      })
    }
    val pos: Seq[Column] = mappable.toSeq.map { f =>
      val o = spec.fks.get(f.name) match {
        case Some(target) => iriTerm(entityIri(target, col(f.name)))
        case None => literalTerm(col(f.name), f.dataType)
      }
      struct(lit(predIri(spec.name, f.name)).as("p"), o.as("o"))
    }
    val typed =
      if (withTypes)
        pos :+ struct(lit(Rdf.RdfType).as("p"), iriTerm(lit(classIri(spec.name))).as("o"))
      else pos
    df.select(subj.as("s"), explode(array(typed: _*)).as("po"))
      .select(lit(graph).as("graph"), col("s"), col("po.p").as("p"), col("po.o").as("o"))
      .filter(col("o.value").isNotNull)
  }

  /** Quad view of a whole testdata scale-factor directory. */
  def testdataQuads(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      tables: Seq[String] = testdataSpecs.keys.toSeq.sorted): DataFrame =
    tables.map { t =>
      quads(spark.read.parquet(s"$sfDir/$t.parquet"), testdataSpecs(t))
    }.reduce(_.unionAll(_))
}
