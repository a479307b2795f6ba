package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively.
  *
  * The as-of join (`left` row ⟵ most recent `right` row with
  * right.ts <= left.ts per key) is composed from built-ins — the
  * union-tag-and-carry-forward technique — rather than a custom
  * SparkPlan: one union, one window keyed by the join key, one filter.
  * The window partitions by key only, so state per partition is one
  * key's timeline — scales like any keyed window, no range-explosion,
  * no cross product. DuckDB's native `ASOF LEFT JOIN` is the oracle.
  */
object Temporal {

  /** Left as-of join: every left row picks the latest right row with
    * `rightTs <= leftTs` for the same key (ties on ts resolved toward
    * the largest `rightOrder` value, deterministically).
    *
    * @param left       probe side (all columns preserved)
    * @param right      reference side; its payload columns are carried
    * @param keyCol     equi-key name present on both sides
    * @param tsCol      event-time column name present on both sides
    * @param rightOrder tie-break column on the right side
    * @param payload    right-side columns to carry (each becomes
    *                   `asof_<name>`, NULL when no match exists)
    */
  def asOfJoinLeft(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightOrder: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    // The payload travels as ONE struct carried by a single
    // last(ignoreNulls) — the struct is non-null for every right row
    // (even when all its FIELDS are null), so the whole payload always
    // comes from the one matched right row and row-level NULL payload
    // values survive verbatim, exactly like a native ASOF LEFT JOIN.
    // (Carrying each column separately would backfill a NULL field
    // from an OLDER right row — the per-column lasts could even source
    // different rows.)
    val payloadType = StructType(
      payload.map(c => StructField(c, right.schema(c).dataType)))
    // tag 0 sorts before tag 1 at equal ts: a right row AT the probe
    // timestamp is eligible (<= semantics)
    val taggedRight = right.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("__tag"),
        col(rightOrder).as("__ord"),
        struct(payload.map(col): _*).as("__p")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__tag"),
        lit(null).cast(right.schema(rightOrder).dataType).as("__ord"),
        lit(null).cast(payloadType).as("__p")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col)): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__tag"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .select((Seq(col(keyCol), col(tsCol), col("__tag")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) :+
        last(col("__p"), ignoreNulls = true).over(w).as("__p")): _*)
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(s"asof_$c")): _*)
  }

  /** Bounded range self-join: all pairs of rows sharing `keyCol` whose
    * timestamps lie within `toleranceSec` of each other (id_a < id_b).
    *
    * A naive theta-join is O(n²) per key; this composition buckets each
    * row onto a `toleranceSec` grid, replicates one side onto its
    * adjacent buckets (x3), equi-joins on (key, bucket), and applies
    * the exact interval filter — every qualifying pair meets in exactly
    * one bucket, so no dedup pass is needed and the join stays an
    * equi-join (shuffle keyed by (key, bucket), skew-splittable by
    * AQE). The standard interval-join shape for 100 TB event logs. */
  def rangeJoinWithin(events: DataFrame, keyCol: String, idCol: String,
      tsCol: String, toleranceSec: Long): DataFrame = {
    val tolMicros = toleranceSec * 1000000L
    val a = events.select(col(keyCol), col(idCol).as("id_a"),
      unix_micros(col(tsCol)).as("us_a"),
      floor(unix_micros(col(tsCol)) / tolMicros).as("__bucket"))
    val b = events.select(col(keyCol), col(idCol).as("id_b"),
        unix_micros(col(tsCol)).as("us_b"),
        explode(sequence(
          floor(unix_micros(col(tsCol)) / tolMicros) - 1,
          floor(unix_micros(col(tsCol)) / tolMicros) + 1)).as("__bucket"))
    a.join(b, Seq(keyCol, "__bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_b") - col("us_a")) <= tolMicros)
      .select(col(keyCol), col("id_a"), col("id_b"))
  }
}
