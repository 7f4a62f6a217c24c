package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star ops).
  *
  * Scale posture: every variant is shuffle-minimal —
  *   - exact / fingerprint dedup: ONE hash-aggregate (map-side partial).
  *   - MinHash+LSH: signatures are a narrow map (no shuffle); the only
  *     shuffle is the band-bucket self-join, whose cost is bounded by bucket
  *     sizes (near-linear for non-degenerate corpora). A frequency cap drops
  *     degenerate buckets (stop-shingles) instead of exploding quadratically.
  *   - SimHash: narrow map to a 64-bit key, then bucket-join on key.
  *   - n-gram Jaccard verify: only over LSH candidates, never all pairs.
  * All signature math is `functions._` expressions (codegen), no UDFs.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact duplicate groups by content hash; `keep_id` = min id (stable). */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("h"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n"))

  /** Drop exact duplicates, keeping the smallest id per content hash. */
  def dropExact(df: DataFrame, id: String, text: String): DataFrame =
    df.join(exactGroups(df, id, text).select(col("keep_id").as(id)), Seq(id), "left_semi")

  /** Normalized-content duplicate groups (formatting-robust). */
  def fingerprintGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(text)).as("fp"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n"))

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles as a deduplicated array column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(lower(trim(text)), "\\W+")
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(size(toks) >= n, concat_ws(" ", slice(toks, i + 1, lit(n))))),
      s => s.isNotNull && length(s) > 0))
  }

  // ------------------------------------------------------------- minhash

  /** Deterministic permutation constants for minhash (fixed seed → results
    * reproducible across runs; required by the verify harness).
    */
  private val Prime = 2038074743L
  private def perm(k: Int): (Long, Long) = {
    val rnd = new scala.util.Random(42L + k)
    (math.abs(rnd.nextLong()) % Prime + 1, math.abs(rnd.nextLong()) % Prime)
  }

  /** Per-document k-permutation MinHash signatures, computed by exploding
    * shingles and running k `min` aggregates — k simple codegen'd aggregates
    * with map-side partial combine (NOT k array-transform expressions, which
    * blow up the Catalyst plan and evaluate interpreted). Output:
    * (doc, sig: array<bigint>). Documents with no shingles get sig = [Prime]*k.
    */
  def minhashSignatures(df: DataFrame, id: String, text: String, k: Int = 32): DataFrame = {
    val sh = df.select(col(id).as("doc"),
      explode_outer(shingles(col(text))).as("shingle"))
      .withColumn("h", abs(xxhash64(col("shingle"))) % Prime)
    val mins = (0 until k).map { i =>
      val (a, b) = perm(i)
      coalesce(min((col("h") * a + b) % Prime), lit(Prime)).as(s"m$i")
    }
    sh.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** doc → (band, bandHash) pairs for LSH banding (bands × rowsPerBand = k). */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), hash(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bh"))
    }: _*)

  /** MinHash-LSH candidate pairs with estimated Jaccard from signature
    * agreement, filtered at `threshold`. `maxBucket` caps degenerate buckets
    * (the skew guard at scale).
    */
  def minhashPairs(df: DataFrame, id: String, text: String, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.5, maxBucket: Int = 200): DataFrame = {
    val r = k / bands
    val sigs = minhashSignatures(df, id, text, k)
    val banded = sigs.select(col("doc"), col("sig"),
        explode(lshBands(col("sig"), bands, r)).as("b"))
      .select(col("doc"), col("sig"), col("b.band"), col("b.bh"))
    val capped = banded.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .filter(col("bucket_n") <= maxBucket)
    val l = capped.alias("l"); val rr = capped.alias("r")
    val cand = l.join(rr, col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("a"), col("r.doc").as("b"),
        col("l.sig").as("siga"), col("r.sig").as("sigb"))
      .distinct()
    val estSim = size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
      (e: Column) => e)).cast("double") / lit(k)
    cand.select(col("a"), col("b"), round(estSim, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  // ------------------------------------------------------------- simhash

  /** Per-document 64-bit SimHash (majority vote per bit), computed by
    * exploding tokens and running 64 bit-count aggregates — simple codegen'd
    * sums with map-side combine, one shuffle. Output: (doc, sh: bigint).
    */
  def simhashes(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(split(lower(trim(col(text))), "\\W+"), t => length(t) > 0)
    val exploded = df.select(col(id).as("doc"), explode_outer(toks).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val aggs = count(col("h")).as("ntok") +:
      (0 until 64).map(i => sum(shiftright(col("h"), i).bitwiseAND(1)).as(s"b$i"))
    val counted = exploded.groupBy(col("doc")).agg(aggs.head, aggs.tail: _*)
    val sh = (0 until 64).map { i =>
      when(col(s"b$i") * 2 > col("ntok"), shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce[Column](_ + _)
    counted.select(col("doc"), sh.as("sh"))
  }

  /** Near-dup pairs by SimHash: exact-key buckets (hamming distance 0); the
    * classic multi-probe extension (rotate/band the key) slots in here.
    */
  def simhashPairs(df: DataFrame, id: String, text: String): DataFrame = {
    val keyed = simhashes(df, id, text)
    val l = keyed.select(col("doc").as("a"), col("sh"))
    val r = keyed.select(col("doc").as("b"), col("sh").as("sh_r"))
    l.join(r, col("sh") === col("sh_r") && col("a") < col("b"))
      .select(col("a"), col("b"), col("sh"))
  }

  // ------------------------------------------------------------- jaccard

  /** Exact n-gram Jaccard over candidate pairs (or all pairs of a small set).
    * `pairs` must have columns (a, b); df provides (id, text).
    */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, id: String, text: String,
      n: Int = 3): DataFrame = {
    val sh = df.select(col(id).as("doc"), shingles(col(text), n).as("sh"))
    pairs
      .join(sh.select(col("doc").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("doc").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        round(size(array_intersect(col("sha"), col("shb"))).cast("double") /
          greatest(size(array_union(col("sha"), col("shb"))), lit(1)).cast("double"), 4)
          .as("jaccard"))
  }

  // ------------------------------------------------------------- embeddings

  /** Dot product of two double-array columns (sequential fold — deterministic
    * left-to-right accumulation, matching a sequential oracle bit-for-bit).
    * NOTE: Spark evaluates higher-order functions interpreted (not codegen),
    * so pair-wise work should fold ONCE per pair — normalize vectors per ROW
    * first ([[normalized]]) and take a single dot per pair.
    */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** L2-normalized copy of a float-array column (one fold per row). */
  def normalized(vec: Column): Column = {
    val d = transform(vec, x => x.cast("double"))
    val nrm = sqrt(aggregate(transform(d, x => x * x), lit(0.0), (acc, v) => acc + v))
    transform(d, x => when(nrm > 0, x / nrm).otherwise(lit(0.0)))
  }

  /** Cosine similarity of two float-array columns. For pairwise workloads
    * prefer `dot(normalized, normalized)` — see [[normalized]].
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val denom = sqrt(dot(ad, ad)) * sqrt(dot(bd, bd))
    when(denom > 0, dot(ad, bd) / denom).otherwise(lit(0.0))
  }

  /** Embedding near-duplicate pairs above a cosine threshold. Brute-force
    * O(n²) baseline — at scale, feed LSH/IVF candidates (see Similarity)
    * through the same verify instead.
    */
  def cosineNearDupPairs(df: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val ad = transform(col(vec), x => x.cast("double"))
    val nrm2 = aggregate(transform(ad, x => x * x), lit(0.0), (acc, v) => acc + v)
    val base = df.select(col(id).as("_id"), ad.as("_v"), sqrt(nrm2).as("_n"))
    val l = base.select(col("_id").as("a"), col("_v").as("va"), col("_n").as("na"))
    val r = base.select(col("_id").as("b"), col("_v").as("vb"), col("_n").as("nb"))
    l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"),
        when(col("na") * col("nb") > 0, dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .otherwise(lit(0.0)).as("cos0"))
      .filter(round(col("cos0"), 4) >= threshold)
      .select(col("a"), col("b"), round(col("cos0"), 4).as("cos"))
  }
}
