package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Dev tool: the shuffled-shard WRITE path at real volume. s17's
  * catalog gate runs over `documents` (58 MB at sf10); a pretraining
  * layout job writes terabytes — this rehearses
  * [[Layout.saveShuffledShards]] over `lineitem` (1.1 GB parquet at
  * sf10, ~60M rows) so the decade table has a bytes-bound data point
  * for the (shard, key) range exchange + hive write, and sweeps
  * `nFiles` to show writer parallelism is the knob that scales while
  * shard membership stays fixed.
  *
  * Row id: lineitem's natural key is (l_orderkey, l_linenumber);
  * l_linenumber < 8, so `l_orderkey * 8 + l_linenumber` is a
  * collision-free deterministic id.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ShuffleShardRehearse
  *        [nShards] [nFilesCsv]
  */
object ShuffleShardRehearse {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nShards = args.headOption.map(_.toInt).getOrElse(8)
    val fileCounts = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 32, 64))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .withColumn("li_id", col("l_orderkey") * 8 + col("l_linenumber"))
    fileCounts.foreach { nf =>
      val t0 = System.nanoTime()
      val out = Layout.saveShuffledShards(li, s"lineitem_shuffled_$nf",
        "li_id", nShards = nShards, nFiles = nf)
      val secs = (System.nanoTime() - t0) / 1e9
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = fs.getContentSummary(p).getLength
      val files = fs.listStatus(p).count(_.isDirectory) // shard dirs
      println(f"[shufshard] nShards=$nShards nFiles=$nf " +
        f"bytes=${bytes / (1024 * 1024)}%dMB shardDirs=$files " +
        f"secs=$secs%.2f")
      fs.delete(p, true)
    }
    spark.stop()
  }
}
