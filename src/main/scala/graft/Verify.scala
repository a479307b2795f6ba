package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name prefixes — dump only
    // matching queries (local iteration; the driver always passes 2).
    // A filtered run CLEARS outDir first: stale parquet from an
    // earlier full dump next to a filtered oracle_sql.json would let
    // a subset check read as full parity.
    val keep: String => Boolean = args.lift(2) match {
      case Some(pfx) =>
        val root = Paths.get(args(1))
        if (Files.exists(root)) {
          import scala.jdk.CollectionConverters._
          Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.delete)
        }
        val ps = pfx.split(","); name => ps.exists(name.startsWith)
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.sources.Tables.withSessionConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        try {
          val df = fn(spark, sfDir)
          // cheap boundary lint at dump time (CatalogSpec is the hard
          // gate): a DECIMAL output or a missing top-level ORDER BY is
          // a comparator-nondeterminism defect (r12's s14b/s22).
          val decs = graft.queries.CatalogChecks.decimalColumns(df)
          if (decs.nonEmpty) System.err.println(
            s"[verify] WARNING $name returns DECIMAL column(s) " +
              decs.mkString(","))
          if (graft.queries.CatalogChecks.totalOrderCheck(df).isLeft)
            System.err.println(
              s"[verify] WARNING $name has no name-resolvable " +
                "top-level ORDER BY")
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFiltered(keep)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
