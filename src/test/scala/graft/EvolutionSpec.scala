package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Evolution

class EvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val canonical = new StructType()
    .add("id", LongType).add("v", LongType).add("note", StringType)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"evolution_$name")
      .resolve("data").toString

  test("union fills missing columns with typed NULLs, widens INT to " +
    "BIGINT, and tags provenance") {
    val p1 = tmp("v1")
    val p2 = tmp("v2")
    // v1: no `note`, and `v` written as INT (pre-widening history)
    Seq((1, 10), (2, 20)).toDF("id", "v")
      .select(col("id").cast("long"), col("v").cast("int"))
      .write.parquet(p1)
    // v2: full current schema, `v` already BIGINT
    Seq((3L, 30L, "n3")).toDF("id", "v", "note").write.parquet(p2)

    val u = Evolution.readUnion(spark, Seq("v1" -> p1, "v2" -> p2),
      canonical)
    assert(u.schema.map(f => (f.name, f.dataType)) ==
      Seq(("snapshot_id", StringType), ("id", LongType),
        ("v", LongType), ("note", StringType)))
    val rows = u.orderBy(col("id"))
      .as[(String, Long, Long, Option[String])].collect().toSeq
    assert(rows == Seq(("v1", 1L, 10L, None), ("v1", 2L, 20L, None),
      ("v2", 3L, 30L, Some("n3"))))
  }

  test("snapshot filter prunes to a single scan — incremental " +
    "consumers never touch older snapshot directories") {
    val p1 = tmp("f1")
    val p2 = tmp("f2")
    Seq((1L, 10L, "a")).toDF("id", "v", "note").write.parquet(p1)
    Seq((2L, 20L, "b")).toDF("id", "v", "note").write.parquet(p2)
    val q = Evolution.readUnion(spark, Seq("v1" -> p1, "v2" -> p2),
        canonical)
      .filter(col("snapshot_id") === "v2")
    // the literal provenance tag folds per branch, so the v1 branch
    // collapses to an empty relation at optimization time
    val scans = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"expected the v1 branch pruned, got ${scans.size} scans")
    assert(q.select(col("id")).as[Long].collect().toSeq == Seq(2L))
  }

  test("empty path list is rejected") {
    intercept[IllegalArgumentException] {
      Evolution.readUnion(spark, Seq.empty, canonical)
    }
  }
}
