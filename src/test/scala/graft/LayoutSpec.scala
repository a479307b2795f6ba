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

  private def shardOf(dir: String): Map[Long, Int] =
    spark.read.parquet(dir)
      .select($"id", $"shard".cast("int"))
      .as[(Long, Int)].collect().toMap

  test("saveShuffledShards: deterministic across writes, rows in " +
      "shuffle-key order within every file, all rows kept") {
    val docs = (0L until 200L).map(i => (i, s"d$i")).toDF("id", "text")
    val a = Layout.saveShuffledShards(docs, "shuf_a", "id", nShards = 4)
    val b = Layout.saveShuffledShards(docs, "shuf_b", "id", nShards = 4)
    assert(shardOf(a) == shardOf(b), "same data+salt => same shards")
    val back = spark.read.parquet(a)
    assert(back.count() == 200)
    // within every physical file, rows are sorted by shuffle_key —
    // reading a shard start-to-finish IS the shuffled order
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(collect_list($"shuffle_key").as("ks"))
      .select($"ks").as[Seq[Long]].collect()
    perFile.foreach(ks => assert(ks == ks.sorted,
      "rows within a file must be in shuffle_key order"))
    // and the permutation is not the identity: ids in key order are
    // scattered, not ascending
    val order = back.orderBy($"shuffle_key").select($"id")
      .as[Long].collect().toSeq
    assert(order != order.sorted, "shuffle must not preserve id order")
  }

  test("saveShuffledShards: growth-stable (a row's shard never " +
      "changes as the corpus grows) and salt picks the permutation") {
    val small = (0L until 100L).map(i => (i, s"d$i")).toDF("id", "text")
    val grown = (0L until 200L).map(i => (i, s"d$i")).toDF("id", "text")
    val s1 = shardOf(Layout.saveShuffledShards(small, "shuf_s", "id", 4))
    val s2 = shardOf(Layout.saveShuffledShards(grown, "shuf_g", "id", 4))
    s1.foreach { case (id, sh) => assert(s2(id) == sh,
      s"doc $id moved shard when the corpus grew") }
    val salted = shardOf(Layout.saveShuffledShards(small, "shuf_salt",
      "id", 4, salt = "epoch2"))
    assert(s1 != salted, "a different salt must pick a different permutation")
  }

  test("saveShuffledShards: writer parallelism beyond shard count — " +
      "a shard spans several files whose key ranges are DISJOINT, so " +
      "footer-stat file ordering restores the shard's total order") {
    val docs = (0L until 2000L).map(i => (i, s"d$i")).toDF("id", "text")
    val out = Layout.saveShuffledShards(docs, "shuf_wide", "id",
      nShards = 2, nFiles = 8)
    val ranges = spark.read.parquet(out)
      .groupBy($"shard".cast("int").as("sh"), input_file_name().as("f"))
      .agg(min($"shuffle_key").as("lo"), max($"shuffle_key").as("hi"),
        count(lit(1)).as("n"))
      .select($"sh", $"lo", $"hi", $"n")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(ranges.map(_._4).sum == 2000)
    val multiFile = ranges.groupBy(_._1).filter(_._2.length > 1)
    assert(multiFile.nonEmpty, "expected at least one multi-file shard")
    multiFile.foreach { case (sh, fs) =>
      fs.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, hi1, _), (_, lo2, _, _)) =>
          assert(hi1 < lo2, s"shard $sh file key ranges overlap: $fs")
        case _ =>
      }
    }
  }

  test("saveBloomFiltered: every row group carries a bloom filter on " +
      "the key; a present key matches few row groups, an ABSENT key " +
      "matches none (the needle-in-100TB skip evidence)") {
    val rows = (0L until 40000L).map(i => (i, s"payload $i"))
      .toDF("k", "payload")
    val out = Layout.saveBloomFiltered(rows, "bloom_unit", "k",
      nFiles = 4, expectedNdv = 40000L, blockBytes = 128L << 10)
    val (total, withBloom, candPresent) =
      Layout.bloomPointLookupStats(spark, out, "k", probe = 12345L)
    assert(total >= 4, s"expected several row groups, got $total")
    assert(withBloom == total,
      s"bloom filter missing on ${total - withBloom} of $total groups")
    assert(candPresent >= 1 && candPresent < total,
      s"present key should match a strict minority: $candPresent/$total")
    val (_, _, candAbsent) =
      Layout.bloomPointLookupStats(spark, out, "k", probe = -99L)
    assert(candAbsent == 0 || candAbsent < candPresent,
      s"absent key should match (almost) nothing: $candAbsent/$total")
    // the lookup itself stays correct over the rewritten layout
    assert(spark.read.parquet(out).filter($"k" === 12345L).count() == 1)
    assert(spark.read.parquet(out).filter($"k" === -99L).count() == 0)
  }
}
