package graft

import org.apache.spark.sql.functions._

/** Seeded-violation gate for Verify's dump-time boundary checks —
  * proves the dump actually FAILS (nonzero return) on the defect
  * shapes r12 shipped as unread warnings, and stays zero on a clean
  * entry. The full catalog's cleanliness is CatalogSpec's job; this
  * spec pins the mechanism. */
class VerifySpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-verify-spec")
      .toAbsolutePath.toString

  test("clean entry dumps with exit code 0 and writes oracle json") {
    import spark.implicits._
    val out = tmp()
    val code = Verify.dump(spark, sf(), out, _ => true,
      Map("ok" -> ((s, _) => Seq((1, "a"), (2, "b")).toDF("k", "v")
        .orderBy(col("k"), col("v")))),
      _ => Map("ok" -> "SELECT 1 AS k, 'a' AS v"))
    assert(code == 0)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "oracle_sql.json")))
    assert(spark.read.parquet(s"$out/ok").count() == 2)
  }

  test("seeded DECIMAL output fails the dump (nonzero return)") {
    import spark.implicits._
    val code = Verify.dump(spark, sf(), tmp(), _ => true,
      Map("bad_dec" -> ((s, _) => Seq((1, BigDecimal(1.5))).toDF("k", "d")
        .orderBy(col("k")))),
      _ => Map.empty)
    assert(code == 1)
  }

  test("seeded missing ORDER BY fails the dump (nonzero return)") {
    import spark.implicits._
    val code = Verify.dump(spark, sf(), tmp(), _ => true,
      Map("bad_sort" -> ((s, _) => Seq((1, "a")).toDF("k", "v"))),
      _ => Map.empty)
    assert(code == 1)
  }

  test("one entry with both defects counts both; dump still completes") {
    import spark.implicits._
    val out = tmp()
    val code = Verify.dump(spark, sf(), out, _ => true,
      Map(
        "bad_both" -> ((s, _) =>
          Seq((1, BigDecimal(1.5))).toDF("k", "d")),
        "ok" -> ((s, _) => Seq((1, "a")).toDF("k", "v")
          .orderBy(col("k"), col("v")))),
      _ => Map("ok" -> "SELECT 1"))
    assert(code == 2)
    // the violating run still leaves complete artifacts for the driver
    assert(spark.read.parquet(s"$out/bad_both").count() == 1)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "oracle_sql.json")))
  }
}
