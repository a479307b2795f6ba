package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: known examples, x in even positions") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 6).as("z"))
      .as[Long].collect().toSeq
    // z(3,5): x bits {0,1} -> z {0,2}; y bits {0,2} -> z {1,5} = 39
    assert(got == Seq(1L, 2L, 39L, 4095L))
  }

  test("z-ordered files cover tight boxes in BOTH dimensions; a " +
      "linear sort leaves every file spanning the other dim's full " +
      "range") {
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    def boxes(path: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max($"x") - min($"x")).cast("long").as("xs"),
          (max($"y") - min($"y")).cast("long").as("ys"))
        .select($"xs", $"ys").as[(Long, Long)].collect().toSeq

    val zb = boxes(Layout.saveZOrdered(grid, "grid_zorder", "x", "y",
      bits = 6, nFiles = 16))
    assert(zb.length == 16)
    // 16 z-contiguous files over a 64x64 grid are ~16x16 tiles; range
    // boundaries are sampled so a file may straddle two tiles, but a
    // clear majority must stay within a 2-tile box in BOTH dims
    val tight = zb.count { case (xs, ys) => xs <= 31 && ys <= 31 }
    assert(tight >= 12, s"expected >= 12/16 tight z-boxes, got $tight: $zb")

    val ydir = Files.createTempDirectory("grid_ysort").toString
    grid.repartitionByRange(16, $"y").sortWithinPartitions($"y")
      .write.mode("overwrite").parquet(ydir)
    val yb = boxes(ydir)
    assert(yb.count { case (xs, ys) => xs <= 31 && ys <= 31 } == 0,
      s"a y-sorted layout must span x's full range in every file: $yb")
  }

  test("compact: fragmented files collapse to ceil(n/target), rows " +
      "preserved, per-file sort-key ranges disjoint") {
    val src = Files.createTempDirectory("frag").toString
    (1 to 500).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
      .repartition(50).write.mode("overwrite").parquet(src)
    assert(Layout.parquetFileCount(spark, src) == 50)
    val out = Layout.compact(spark, src, "compact_spec", 200L, "id")
    assert(Layout.parquetFileCount(spark, out) == 3) // ceil(500/200)
    val back = spark.read.parquet(out)
    assert(back.count() == 500)
    // range-partitioned on the sort key: per-file [min,max] intervals
    // must not overlap — that is what restores min/max pruning
    val ranges = back.groupBy(input_file_name())
      .agg(min($"id").as("lo"), max($"id").as("hi"))
      .select($"lo", $"hi").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: $ranges")
      case _ =>
    }
  }
}
