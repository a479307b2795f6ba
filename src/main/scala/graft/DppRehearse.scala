package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dynamic partition pruning measured at volume. s20's
  * catalog gate proves the PLAN contract (the DynamicPruningSubquery
  * is present) at sf0.01; this rehearses the RUNTIME effect on the
  * decade fixtures — wall clock and scan I/O (numFiles/filesSize
  * metrics from the fact scan) with pruning enabled vs disabled.
  *
  * Unlike s20 (whose md5-tag dim filter Catalyst can also infer
  * statically through the join equivalence — deliberately, so the
  * oracle stays pure SQL), the dim here is a LITERAL lookup table
  * with an attribute (`cost`) underivable from the partition column:
  * static inference is impossible and the dynamic filter is the ONLY
  * pruning path, which isolates what DPP alone buys.
  *
  * AQE is off for the measurement so the fact scan's metrics are
  * directly readable from the physical plan (rehearsal-only; the
  * engine runs AQE everywhere else).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.DppRehearse [keepTypes]
  *   keepTypes: comma list the dim filter keeps (default click,view —
  *   2 of the 5 event types = 2/5 of partitions should prune away)
  */
object DppRehearse {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val keep = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("click", "view"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val factPath = graft.catalog.Warehouse.savePartitioned(
      graft.sources.Tables.load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value")),
      "events_dpp_rehearse", Seq("event_type"))

    // scan-backed dim: cost is NOT derivable from event_type, so only
    // the runtime subquery can prune the fact scan. MUST be a file
    // scan, not a literal frame — ConvertToLocalRelation folds a
    // Filter-over-LocalRelation away before the PartitionPruning
    // batch runs, and with no selective predicate left on the
    // filtering side the rule declines (measured: a literal dim
    // yields numFiles=50 in both modes — zero pruning)
    val allTypes = Seq("click", "error", "purchase", "signup", "view")
    val dimPath = graft.catalog.Warehouse.saveFormat(
      allTypes.zipWithIndex
        .map { case (t, i) => (t, if (keep.contains(t)) 1.0 else 100.0 + i) }
        .toDF("event_type", "cost"),
      "events_dpp_dim", "parquet")
    val dim = spark.read.parquet(dimPath)

    def run(dpp: Boolean, cycle: Int): Unit = {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", dpp)
      (1 to 2).foreach { pass =>
        val q = spark.read.parquet(factPath)
          .join(broadcast(dim.filter(col("cost") < 50)), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
        val t0 = System.nanoTime()
        val rows = q.collect().sortBy(_.getString(0))
        val secs = (System.nanoTime() - t0) / 1e9
        val scan = q.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains("events_dpp_rehearse")) => f
        }.head
        val nFiles = scan.metrics("numFiles").value
        val mb = scan.metrics("filesSize").value / (1024 * 1024)
        println(f"[dpp] enabled=$dpp cycle=$cycle pass=$pass secs=$secs%.2f " +
          f"factFiles=$nFiles factMB=$mb " +
          s"rows=${rows.map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(",")}")
      }
    }

    // two full cycles: cycle 1 pays fresh-JVM warm-up on whichever
    // mode runs first; compare cycle-2 (warm) numbers across modes
    (1 to 2).foreach { c => run(dpp = false, c); run(dpp = true, c) }
    spark.stop()
  }
}
