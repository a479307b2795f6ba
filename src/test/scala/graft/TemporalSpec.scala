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
