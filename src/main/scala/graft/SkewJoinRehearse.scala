package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: adjudicate MANUAL key salting (Relational.saltedJoin, the
  * j7 idiom) against AQE's runtime skew-join splitting on the same
  * deliberately-skewed large-large join — the "when is the salt
  * load-bearing?" question a deployment has to answer before copying
  * j7 (TUNING.md records the measured outcome).
  *
  * Input shape: lineitem ⋈ supplier on l_suppkey, with l_suppkey
  * REMAPPED so one supplier holds `hotPct`% of the fact rows — the
  * single-hot-vendor shape. Broadcast is disabled for every variant
  * (autoBroadcastJoinThreshold=-1): at deployment scale the dim side
  * exceeds broadcast, and a broadcast join would make skew moot.
  *
  * Variants, 3 runs each, consumed by the j7 aggregation:
  *   plain-aqe-skew  — plain equi-join, AQE skew-join splitting ON
  *                     (thresholds lowered so fixture-scale partitions
  *                     qualify: factor 2, 16 MiB)
  *   plain-no-skew   — plain equi-join, AQE skew handling OFF (the
  *                     pre-AQE baseline: one straggler task owns the
  *                     hot key)
  *   salted          — Relational.saltedJoin at GRAFT_SALT_FACTOR
  *                     (default 8), AQE skew handling OFF
  *
  * Usage: runMain graft.SkewJoinRehearse <sfDir> [hotPct]
  * Env: SPARK_GRAFT_CPUS (default 32), GRAFT_SALT_FACTOR (default 8).
  */
object SkewJoinRehearse {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val hotPct = if (args.length > 1) args(1).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val saltFactor = sys.env.getOrElse("GRAFT_SALT_FACTOR", "8").toInt
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // skew only matters for non-broadcast joins; the dim side at
      // deployment scale does not broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    val hotKey = supp.agg(min(col("s_suppkey"))).head.getLong(0)
    // remap: hotPct% of fact rows land on ONE supplier, the rest keep
    // their original key — deterministic (hash of the row's orderkey)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(100))
            < hotPct, lit(hotKey))
          .otherwise(col("l_suppkey")).as("l_suppkey"),
        col("l_quantity"))

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))

    def time(tag: String, confs: Map[String, String],
        mk: () => DataFrame): Unit = {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = agg(mk()).collect().map(_.getLong(1)).sum
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[skewjoin] $tag hotPct=$hotPct run=$i rows=$n%d " +
          f"secs=$secs%.2f")
      } finally prev.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }

    val skewOn = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "16MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16MB")
    val skewOff = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      // keep coalescing from re-merging what we want to observe
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16MB")

    time("plain-aqe-skew", skewOn, () => li.join(supp,
      col("l_suppkey") === col("s_suppkey")))
    time("plain-no-skew", skewOff, () => li.join(supp,
      col("l_suppkey") === col("s_suppkey")))
    time("salted", skewOff, () => graft.operators.Relational.saltedJoin(
      li, supp.withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey", saltFactor))
    spark.stop()
  }
}
