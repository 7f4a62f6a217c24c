package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (brief: "salting for skew, AQE for runtime
  * re-plan"). AQE's skew-join split handles most cases at runtime; these are
  * the explicit forms for when the skew is KNOWN ahead of time — a hot
  * grouping key (a handful of keys owning most rows) or a hot join key —
  * and the plan should not depend on runtime stats.
  */
object Skew {

  /** Two-stage salted aggregation: rows are first aggregated by
    * (key, salt) — a hot key's rows spread over `salts` reducers — then the
    * per-salt partials combine in a second, tiny aggregation. Exact for any
    * algebraic aggregate (count/sum/min/max); the salt is a deterministic
    * per-row value, so the result is identical to the unsalted plan (which
    * is exactly what the oracle checks).
    *
    * Spark's map-side partial aggregation already spreads the MAP work;
    * salting additionally spreads the REDUCE work of a hot key — without
    * it one reducer owns the whole key at 100 TB.
    *
    * Output columns: `key`, then `<col>_<fn>` per requested aggregate.
    */
  def saltedAgg(df: DataFrame, key: String, aggs: Seq[(String, String)],
      salts: Int = 16): DataFrame = {
    require(aggs.nonEmpty)
    def partial(spec: (String, String)): Column = spec match {
      case (c, "count") => count(col(c)).as(s"_p_${c}_count")
      case (c, "sum") => sum(col(c)).as(s"_p_${c}_sum")
      case (c, "min") => min(col(c)).as(s"_p_${c}_min")
      case (c, "max") => max(col(c)).as(s"_p_${c}_max")
      case (c, fn) => throw new IllegalArgumentException(s"unsupported salted agg $fn($c)")
    }
    // counts combine by SUM; sum/min/max are self-combining
    def combine(spec: (String, String)): Column = spec match {
      case (c, "count") => sum(col(s"_p_${c}_count")).as(s"${c}_count")
      case (c, "sum") => sum(col(s"_p_${c}_sum")).as(s"${c}_sum")
      case (c, "min") => min(col(s"_p_${c}_min")).as(s"${c}_min")
      case (c, "max") => max(col(s"_p_${c}_max")).as(s"${c}_max")
      case _ => throw new IllegalStateException
    }
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(salts))
    df.groupBy(col(key), salt.as("_salt"))
      .agg(partial(aggs.head), aggs.tail.map(partial): _*)
      .groupBy(col(key))
      .agg(combine(aggs.head), aggs.tail.map(combine): _*)
  }

  /** Salted inner equi-join for a KNOWN hot key set: the build side's hot
    * rows are replicated once per salt, the probe side salts per row — so
    * a hot key's probe rows land on `salts` reducers instead of one. Cold
    * keys join normally; duplication cost is |hot build rows| × salts.
    * Requires disjoint non-key column names (rename upstream otherwise).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      hotKeys: Seq[Any], salts: Int = 8): DataFrame = {
    val spark = probe.sparkSession
    val isHot = col(key).isin(hotKeys: _*)
    val saltsDf = spark.range(salts).select(col("id").as("_bsalt"))
    val hotBuild = build.filter(isHot).withColumnRenamed(key, "_bk")
      .crossJoin(saltsDf)
    val hotProbe = probe.filter(isHot).withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val hot = hotProbe.join(hotBuild,
        hotProbe(key) === hotBuild("_bk") && col("_salt") === col("_bsalt"))
      .drop("_bk", "_salt", "_bsalt")
    val cold = probe.filter(!isHot).join(build.filter(!isHot), key)
    hot.select(cold.columns.map(col).toSeq: _*).unionByName(cold)
  }
}
