package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time arithmetic shared by the segmented (time-bucketed) operator
  * forms — `Sessionize.batchSessionsSharded`,
  * `Temporal.asOfJoinLeftSharded`.
  */
object TimeFunctions {

  /** Exact floor division of a long column by a positive long
    * constant, at ANY magnitude: the numerator is made exactly
    * divisible first (pmod), so the integral `div` that follows
    * truncates nothing — unlike double `/`, which rounds above 2^53,
    * and unlike bare `div`, which truncates toward zero for negative
    * numerators. */
  def floorDivLong(a: Column, b: Long): Column = {
    require(b > 0, s"divisor must be > 0: $b")
    call_function("div", a - pmod(a, lit(b)), lit(b))
  }

  /** Fixed-width time bucket id of a TIMESTAMP column:
    * floorDiv(unix_micros(ts), bucketSeconds * 1e6). Equal timestamps
    * always share a bucket; pre-epoch timestamps land in the correct
    * negative bucket. Throws (ArithmeticException) instead of
    * silently mis-bucketing when `bucketSeconds * 1e6` overflows
    * Long. */
  def timeBucketUs(ts: Column, bucketSeconds: Long): Column = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0: $bucketSeconds")
    floorDivLong(unix_micros(ts), Math.multiplyExact(bucketSeconds, 1000000L))
  }
}
