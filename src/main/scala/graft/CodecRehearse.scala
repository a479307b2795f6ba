package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: parquet compression-codec adjudication at volume — the
  * storage knob every 100 TB layout decision starts from. For each
  * codec: write lineitem once (wall + bytes on disk), then run a
  * scan-bound aggregate over the written copy (2 passes, min wall).
  * snappy is Spark's default; zstd typically buys 25-40% smaller
  * files for slightly more write CPU — at 100 TB that difference is
  * tens of TB of storage AND proportionally less scan I/O, so the
  * read leg decides whether the write premium pays for itself.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.CodecRehearse [codecs]
  *   codecs: comma list (default snappy,zstd,lz4)
  */
object CodecRehearse {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val codecs = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("snappy", "zstd", "lz4"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val hconf = spark.sparkContext.hadoopConfiguration

    def scanAgg(path: String): Unit =
      spark.read.parquet(path)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sq"),
          sum(col("l_extendedprice")).as("sp"),
          count(lit(1)).as("n"))
        .collect()

    // untimed warm-up: the FIRST write+scan of a fresh JVM pays
    // codegen/classloading — measured as a verdict-flipping order
    // effect (whichever codec ran first lost ~2x on both legs)
    locally {
      val warm = "/tmp/graft_codec_warmup"
      val p = new org.apache.hadoop.fs.Path(warm)
      val fs = p.getFileSystem(hconf)
      fs.delete(p, true)
      li.write.option("compression", "snappy").parquet(warm)
      scanAgg(warm)
      fs.delete(p, true)
    }

    codecs.foreach { codec =>
      val out = s"/tmp/graft_codec_$codec"
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(hconf)
      val writes = (1 to 2).map { _ =>
        fs.delete(p, true)
        val t0 = System.nanoTime()
        li.write.option("compression", codec).parquet(out)
        (System.nanoTime() - t0) / 1e9
      }
      val mb = fs.getContentSummary(p).getLength / (1024.0 * 1024.0)
      val reads = (1 to 3).map { _ =>
        val r0 = System.nanoTime()
        scanAgg(out)
        (System.nanoTime() - r0) / 1e9
      }
      println(f"[codec] codec=$codec writeSecsMin=${writes.min}%.2f " +
        f"sizeMB=$mb%.0f scanSecsMin=${reads.min}%.2f " +
        f"writeSecs=${writes.map(s => f"$s%.2f").mkString(",")} " +
        f"scanSecs=${reads.map(s => f"$s%.2f").mkString(",")}")
      fs.delete(p, true)
    }
    spark.stop()
  }
}
