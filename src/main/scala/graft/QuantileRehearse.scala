package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions
import graft.plans.QuantileSketch

/** Dev tool: measure the KLL/MRL quantile sketch's TRUE rank error
  * (the x65 governance number) across k and data scale, so the
  * entry's tolerance is a measured envelope with stated headroom,
  * not a guess. For each k, builds the x65 shape — per-(returnflag,
  * orderkey%8) shard sketches over l_extendedprice, unioned per
  * group — then evaluates |rank(quantile(p)) - p| for every group x
  * probe against the data itself, and reports the max alongside the
  * sketch's retained size (the bytes that actually cross the shuffle
  * per group).
  *
  * Usage: runMain graft.QuantileRehearse <sfDir> [k,k,...]
  */
object QuantileRehearse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(128, 256, 512))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val vals = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        pmod(col("l_orderkey"), lit(8)).as("shard"),
        col("l_extendedprice").cast("double").as("v"))
      .persist()
    val nRows = vals.count()
    for (k <- ks) {
      val merged = vals.groupBy(col("grp"), col("shard"))
        .agg(SketchFunctions.kllAgg(col("v"), k).as("sk"))
        .groupBy(col("grp"))
        .agg(SketchFunctions.kllUnionAgg(col("sk")).as("sk"))
        .collect()
      val ests = merged.toSeq.flatMap { r =>
        val sk = QuantileSketch.deserialize(r.getAs[Array[Byte]]("sk"))
        probes.map(p => (r.getString(0), p, sk.quantile(p),
          sk.retained, sk.serialize.length))
      }
      import spark.implicits._
      val estDf = ests.map(e => (e._1, e._2, e._3)).toDF("grp", "p", "est")
      val errs = vals.join(broadcast(estDf), Seq("grp"))
        .groupBy(col("grp"), col("p"))
        .agg((sum(when(col("v") <= col("est"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("true_rank"))
        .select(col("grp"), col("p"),
          abs(col("true_rank") - col("p")).as("err"))
        .collect()
      val maxErr = errs.map(_.getDouble(2)).max
      val worst = errs.maxBy(_.getDouble(2))
      val retained = ests.map(_._4).max
      val bytes = ests.map(_._5).max
      println(f"[quantile-rehearse] sf=$sfDir rows=$nRows k=$k " +
        f"maxRankErr=$maxErr%.5f (worst ${worst.getString(0)}@p=" +
        f"${worst.getDouble(1)}) retained<=$retained " +
        f"sketchBytes<=$bytes")
    }
    spark.stop()
  }
}
