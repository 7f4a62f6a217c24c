package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star ops).
  *
  * Media payloads are opaque `binary` columns with typed metadata structs —
  * the Spark-side plumbing (schema, batch shape, partition-preserving
  * per-batch processing) is real; the codec itself is STUBBED with a
  * deterministic fake (no image/audio libraries ship in this container).
  * Swap [[StubCodec]] for a real decoder (JNI/FFI or `mapInPandas` +
  * PIL/torchaudio on the Python side) without touching any schema.
  *
  * Scale notes: decode is a narrow per-partition map (no shuffle); frame
  * sampling explodes bounded arrays; feature vectors are fixed-width float
  * arrays identical in shape to the `embeddings` table, so everything in
  * [[Similarity]] composes downstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("mime", StringType))), nullable = true)))

  /** Wrap any table with a string column into a media table: payload =
    * UTF-8 bytes (a stand-in for real image/audio bytes), metadata computed
    * from the payload itself. Demonstrates the binary-column plumbing on the
    * driver's `documents` table.
    */
  def toMediaTable(df: DataFrame, id: String, text: String, kind: String = "image"): DataFrame =
    df.select(col(id).cast("long").as("media_id"), lit(kind).as("kind"),
        encode(col(text), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast("long").as("n_bytes"),
        concat(lit("application/x-stub-"), col("kind")).as("mime")))

  /** The stubbed codec: deterministic pseudo-decode so tests are stable.
    * A real implementation replaces ONLY this object.
    */
  object StubCodec {
    /** "Decode" image dimensions from payload bytes (deterministic fake).
      * Derived from a 60-bit md5 prefix of the payload — the repo's standard
      * oracle-replayable derivation (`('0x'||substr(md5(x),1,15))::BIGINT`
      * computes the identical value in DuckDB), so `mm_decode` hash-matches.
      */
    def imageDims(payload: Array[Byte]): (Int, Int) = {
      val hex = java.security.MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      (((h % 1920) + 32).toInt, (((h / 1920) % 1080) + 32).toInt)
    }
    /** "Extract" a fixed-width feature vector from payload bytes: byte
      * histogram over 16 buckets, L2-normalized — deterministic, shaped like
      * a real embedding.
      */
    def features(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val counts = new Array[Double](dim)
      payload.foreach(b => counts((b & 0xff) % dim) += 1.0)
      val norm = math.sqrt(counts.map(c => c * c).sum).max(1e-9)
      counts.map(c => (c / norm).toFloat)
    }
  }

  private val decodedSchema = StructType(mediaSchema.fields ++ Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Per-partition decode + feature extraction: the real-decoder seam.
    * Partition-preserving (no shuffle); batch shape = one row per media item.
    */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "kind", "payload", "meta").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h) = if (payload == null) (0, 0) else StubCodec.imageDims(payload)
        val feats = if (payload == null) Array.empty[Float] else StubCodec.features(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, feats))
      }
    }(enc)
  }

  /** Deterministic frame sampling for "video": every `stride`-th byte offset
    * becomes a frame reference (bounded explode — the real thing samples
    * decoded frames at the same plumbing position).
    */
  def sampleFrames(media: DataFrame, stride: Int = 1024, maxFrames: Int = 8): DataFrame =
    media.select(col("media_id"),
        explode(slice(sequence(lit(0L), greatest(col("meta.n_bytes") - 1, lit(0L)),
          lit(stride.toLong)), 1, maxFrames)).as("frame_offset"))

  /** INTEGER byte-histogram features (r12 cont.) — the exact-arithmetic
    * sibling of [[StubCodec.features]]: raw bucket counts, no
    * normalization, so downstream similarity scoring is order-free integer
    * sums that replay BIT-EXACTLY in SQL (no float drift across engines).
    * Same per-partition codec seam as [[decodeAndFeaturize]].
    */
  def histogramFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("hist", ArrayType(LongType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val counts = new Array[Long](dim)
        if (payload != null)
          payload.foreach(b => counts((b & 0xff) % dim) += 1L)
        Row(r.getLong(0), counts.toSeq)
      }
    }(enc)
  }

  /** Multimodal retrieval composition (r12 cont.): top-k most similar
    * media per query by INTEGER histogram dot product — the feature
    * vectors from the (stubbed) decoder feed the same top-k shape as the
    * [[Similarity]] family. Brute-force by design (the exact baseline the
    * float ANN paths accelerate): the corpus explodes to (dim, value)
    * rows, the dimension-sized query side broadcasts, partial+final
    * hash aggregates per (query, doc) pair, then one per-query top-k
    * window. Self-pairs excluded; ties break on doc id.
    */
  def histTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // zero-count buckets are dropped BEFORE the join (sparse semantics):
    // a (query, doc) pair sharing no nonzero bucket must not rank at all —
    // the dense join gave such pairs a score-0 row, which could push a
    // real hit out of the top-k when fewer than k docs overlap (r12
    // ADVICE) — and the sparse side is smaller to shuffle anyway.
    val c = corpus.select(col("media_id").as("doc"),
      posexplode(col("hist")).as(Seq("i", "dv")))
      .filter(col("dv") > 0)
    val q = queries.select(col("media_id").as("qid"),
      posexplode(col("hist")).as(Seq("i", "qv")))
      .filter(col("qv") > 0)
    val scores = c.join(broadcast(q), Seq("i"))
      .filter(col("qid") =!= col("doc"))
      .groupBy(col("qid"), col("doc"))
      .agg(sum(col("qv") * col("dv")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc").asc)
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
