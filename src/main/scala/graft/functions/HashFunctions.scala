package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * MinHash / SimHash / LSH all need hash functions that can be
  * reproduced bit-for-bit by the DuckDB oracle. Spark's `hash()`
  * (Murmur3) and DuckDB's `hash()` differ, so everything here derives
  * from md5, which both engines expose with identical semantics:
  *
  *   Spark:  conv(substr(md5(s), 1, 15), 16, 10)::long
  *   DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
  *
  * 15 hex chars = 60 bits, always positive in a signed 64-bit long.
  */
object HashFunctions {

  /** 60-bit positive hash from md5 chars [1,15]. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Independent 60-bit hash from md5 chars [17,31]. */
  def md5Hash60b(c: Column): Column =
    conv(substring(md5(c), 17, 15), 16, 10).cast("long")

  /** Carter–Wegman family member j derived from ONE md5 evaluation:
    * h_j = (a + j * (b mod 2^40)) mod 2^60, with a/b the two 60-bit md5
    * halves. j*b < 2^46 and a < 2^60, so the sum stays far from
    * overflowing a signed long (safe under ANSI mode, identical in
    * DuckDB's BIGINT arithmetic). */
  def cwHash(a: Column, b: Column, j: Int): Column =
    (a + lit(j.toLong) * (b % lit(1L << 40))) % lit(1L << 60)
}
