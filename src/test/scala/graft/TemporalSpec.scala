package graft

import java.sql.Timestamp

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOfJoinLeft picks latest right <= left ts; null when none") {
    val left = Seq(
      (1L, ts(5), 7L),   // after right@0 -> matches R10
      (2L, ts(20), 7L),  // after right@15 -> matches R20
      (3L, ts(15), 7L),  // equal ts -> inclusive match R20
      (4L, ts(1), 8L)    // user with no right rows -> null
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (7L, ts(0), 10L), (7L, ts(15), 20L)
    ).toDF("user_id", "ts", "rid")
    val got = Temporal.asOfJoinLeft(left, right, "user_id", "ts",
        rightOrder = "rid", payload = Seq("rid"))
      .select("event_id", "asof_rid").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(10L))
    assert(got(2L).contains(20L))
    assert(got(3L).contains(20L)) // <= is inclusive
    assert(got(4L).isEmpty)
  }

  test("asOfJoinLeft: NULL payload fields of the matched row survive " +
      "(no backfill from older right rows)") {
    val left = Seq((1L, ts(20), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (7L, ts(0), 1L, Option("old")),      // older row HAS a label
      (7L, ts(15), 2L, Option.empty[String]) // matched row's label is NULL
    ).toDF("user_id", "ts", "rid", "label")
    val got = Temporal.asOfJoinLeft(left, right, "user_id", "ts",
        rightOrder = "rid", payload = Seq("rid", "label"))
      .select("asof_rid", "asof_label")
      .as[(Option[Long], Option[String])].head()
    assert(got._1.contains(2L))
    assert(got._2.isEmpty, "NULL in the matched row must NOT be backfilled")
  }

  test("rangeJoinWithin equals the naive theta-join on every boundary") {
    val ev = Seq(
      (1L, ts(0), 7L), (2L, ts(4), 7L),   // 4 min apart -> pair
      (3L, ts(5), 7L),                     // exactly 5 min from id 1 -> inclusive
      (4L, ts(20), 7L),                    // far -> no pair with 1-3
      (5L, ts(2), 8L)                      // other key
    ).toDF("event_id", "ts", "user_id")
    val got = Temporal.rangeJoinWithin(ev, "user_id", "event_id", "ts", 300)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = Set((1L, 2L), (1L, 3L), (2L, 3L)) // id4/id5 isolated
    assert(got == want)
  }

  test("asOfJoinLeftSharded equals asOfJoinLeft across seam shapes: " +
      "match in an earlier bucket, empty buckets between, edge ties, " +
      "keys with no right rows, and it is bucket-width invariant") {
    val left = Seq(
      (1L, ts(5), 7L),   // match lives in the same bucket
      (2L, ts(35), 7L),  // match (R@15) is 2 buckets back, 1 empty between
      (3L, ts(10), 7L),  // left EXACTLY ON a bucket edge; R@10 ties -> inclusive
      (4L, ts(1), 8L),   // key with no right rows -> null
      (5L, ts(59), 9L)   // match far back across many empty buckets
    ).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (7L, ts(0), 10L), (7L, ts(10), 15L), (7L, ts(15), 20L),
      (9L, ts(2), 30L)
    ).toDF("user_id", "ts", "rid")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "asof_rid").as[(Long, Option[Long])]
        .collect().toMap
    val plain = canon(Temporal.asOfJoinLeft(left, right, "user_id", "ts",
      rightOrder = "rid", payload = Seq("rid")))
    assert(plain == Map(1L -> Some(10L), 2L -> Some(20L), 3L -> Some(15L),
      4L -> None, 5L -> Some(30L)))
    // 600s buckets put each decisive pair on a seam; then sweep widths
    for (b <- Seq(1L, 60L, 600L, 86400L)) {
      val sharded = canon(Temporal.asOfJoinLeftSharded(left, right,
        "user_id", "ts", rightOrder = "rid", payload = Seq("rid"),
        bucketSeconds = b))
      assert(sharded == plain, s"bucketSeconds=$b: $sharded != $plain")
    }
  }

  test("asOfJoinLeftSharded: NULL payload fields survive ACROSS bucket " +
      "seams (the whole-struct carry, not per-column backfill)") {
    // older right (HAS label) in bucket 0; matched right (label NULL)
    // in bucket 1; probe in bucket 2 — the seam carry must hand the
    // probe bucket the MATCHED row's struct, nulls intact
    val left = Seq((1L, ts(25), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (7L, ts(0), 1L, Option("old")),
      (7L, ts(15), 2L, Option.empty[String])
    ).toDF("user_id", "ts", "rid", "label")
    val got = Temporal.asOfJoinLeftSharded(left, right, "user_id", "ts",
        rightOrder = "rid", payload = Seq("rid", "label"),
        bucketSeconds = 600)
      .select("asof_rid", "asof_label")
      .as[(Option[Long], Option[String])].head()
    assert(got._1.contains(2L))
    assert(got._2.isEmpty, "NULL in the matched row must NOT be backfilled")
  }

  test("asOfJoinLeft preserves all left rows and columns") {
    val left = Seq((1L, ts(5), 7L, "x")).toDF("event_id", "ts", "user_id", "tag")
    val right = Seq((7L, ts(0), 1L)).toDF("user_id", "ts", "rid")
    val out = Temporal.asOfJoinLeft(left, right, "user_id", "ts", "rid",
      Seq("rid"))
    assert(out.columns.toSeq == Seq("event_id", "ts", "user_id", "tag",
      "asof_rid"))
    assert(out.count() == 1)
  }
}
