package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators covering the reference's reshaping
  * surface (SURVEY.md §2.4) plus the PK/FK validation idiom (§5).
  */
object Relational {

  /** Deterministic surrogate key: `'PRE-' || row_number() over (order by
    * natural key)` — the reference's `with_row_count(offset=1)` + prefix
    * concat (`scripts/build_db.py:142-144` etc.), made order-stable by an
    * explicit natural-key sort (SURVEY.md §7.4 hazard 1).
    *
    * Scale note: a global (unpartitioned) window collapses to ONE
    * partition — acceptable only for dimension tables (all reference
    * dims are tiny). For fact-scale keys use content hashes
    * (HashFunctions.md5Hash60) instead; this helper is deliberately for
    * dims. */
  def surrogateKey(df: DataFrame, prefix: String, keyCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val rn = row_number().over(Window.orderBy(orderCols: _*))
    df.withColumn("__rn", rn)
      .withColumn(keyCol, concat(lit(prefix), col("__rn").cast("string")))
      .withColumn("__rn", col("__rn").cast("long"))
      .withColumnRenamed("__rn", s"${keyCol}_n")
  }

  /** Distributed deterministic surrogate key for FACT tables: md5 over
    * the '|'-joined natural key plus a per-duplicate ordinal. The only
    * window is PARTITIONED BY the full natural key (a handful of rows
    * per partition), so the largest table never funnels through one
    * task — contrast [[surrogateKey]], whose global ORDER BY is
    * deliberately dims-only. Each key component is md5-hashed BEFORE
    * joining: parts become fixed-width, so values containing the '|'
    * separator cannot shift boundaries and collide across different
    * natural keys, and a NULL component (md5(NULL) = NULL, coalesced
    * to '-', which no 32-hex digest can equal) cannot collide with any
    * real value.
    *
    * DETERMINISM PRECONDITION: `tieBreak` must totally order the rows
    * WITHIN each natural key. With duplicate (naturalKey, tieBreak)
    * tuples whose other columns differ, row_number assigns the ordinal
    * (and thus the key) to an arbitrary one of them per run. If no
    * natural total order exists, append a deterministic final
    * tie-break (e.g. md5 over all remaining columns). */
  def factKey(df: DataFrame, prefix: String, keyCol: String,
      naturalKey: Seq[Column], tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(naturalKey: _*).orderBy(tieBreak: _*)
    val parts = naturalKey.map(c =>
      coalesce(md5(c.cast("string")), lit("-"))) :+
      row_number().over(w).cast("string")
    df.withColumn(keyCol, concat(lit(prefix), md5(concat_ws("|", parts: _*))))
  }

  /** Union-by-name with missing columns null-filled — Polars
    * `concat(how='diagonal')` (`scripts/build_db.py:1047-1102`). */
  def unionDiagonal(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Wide one-hot flag columns → long (variable, value) rows — Polars
    * `melt` (`scripts/build_db.py:1069-1081`). */
  def unpivotFlags(df: DataFrame, idCols: Seq[String],
      flagCols: Seq[String]): DataFrame =
    df.unpivot(idCols.map(col).toArray, flagCols.map(col).toArray,
      "variable", "value")

  /** PK-uniqueness violations (empty = constraint holds). Replaces
    * DuckDB's INSERT-time PK enforcement (SURVEY.md §5.1). */
  def pkViolations(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.groupBy(pkCols.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** FK orphans: child rows with no parent (empty = constraint holds).
    * Anti-join is the distributed FK check — no driver-side loops.
    * SQL (simple-match) FK semantics: a child row with ANY NULL FK
    * column satisfies the constraint, so such rows are excluded before
    * the anti-join — a DuckDB INSERT of them would succeed. */
  def fkOrphans(child: DataFrame, parent: DataFrame,
      keys: Seq[(String, String)]): DataFrame = {
    val candidates =
      child.filter(keys.map { case (ck, _) => col(ck).isNotNull }
        .reduce(_ && _))
    val cond = keys.map { case (ck, pk) => candidates(ck) === parent(pk) }
      .reduce(_ && _)
    candidates.join(parent, cond, "left_anti")
  }

  /** Skew-mitigating equi-join: salt the skewed (large) side's key with
    * a random-free deterministic shard (hash of the whole row mod
    * `saltFactor`) and replicate the small side across all shards, so a
    * single hot key spreads over `saltFactor` reducers. Use when AQE's
    * skew-join splitting isn't available/enough; results are identical
    * to a plain inner join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Slowly-changing-dimension type-2 merge — the warehouse upsert that
    * keeps full history instead of overwriting (Kimball SCD2; the
    * MERGE INTO ... WHEN MATCHED pattern, expressed as pure dataflow
    * so it needs no table format with transactional merge support).
    *
    * `dim` is the dimension WITH history: one row per (key, version),
    * columns = key, `tracked` attribute columns, `valid_from` DATE,
    * `valid_to` DATE (null = open), `is_current` BOOLEAN. `updates` is
    * the incoming snapshot batch: key + tracked columns, one row per
    * key. Result:
    *
    *  - closed history rows pass through untouched;
    *  - current rows whose key is absent from the batch, or whose
    *    tracked values are unchanged (null-safe compare), pass through;
    *  - changed current rows are CLOSED (valid_to = effectiveDate,
    *    is_current = false) and a new open version row is appended;
    *  - batch keys with no current row become brand-new open rows.
    *
    * Scale shape: one full-outer equi-join on the key between the
    * CURRENT slice and the batch (history rows never join), then
    * narrow projections unioned by name. At 100 TB the join shuffles
    * once on the dimension key; no windows, no driver state. */
  def scd2Merge(dim: DataFrame, updates: DataFrame, keyCol: String,
      tracked: Seq[String], effectiveDate: Column): DataFrame = {
    // an empty tracked list would make the change-detection reduce
    // throw an opaque UnsupportedOperationException at plan time
    require(tracked.nonEmpty, "scd2Merge needs at least one tracked column")
    // NOTE: `updates` must hold ONE row per key (it is a snapshot
    // batch); duplicate keys would silently fan out the full-outer
    // join into one closed+opened pair per duplicate.
    val hist = dim.filter(!col("is_current"))
    val cur = dim.filter(col("is_current"))

    val u = updates.select(col(keyCol).as("__uk") +:
      tracked.map(c => col(c).as(s"__u_$c")): _*)
    val joined = cur.join(u, col(keyCol) === col("__uk"), "full_outer")

    val inBoth = col(keyCol).isNotNull && col("__uk").isNotNull
    val changed = inBoth &&
      tracked.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    val dimCols = dim.columns.map(col)
    // untouched: current rows with no batch key or no tracked change
    val untouched = joined
      .filter(col(keyCol).isNotNull && (col("__uk").isNull || !changed))
      .select(dimCols: _*)
    // closed-out predecessors of changed keys
    val closed = joined.filter(changed)
      .select(dimCols: _*)
      .withColumn("valid_to", effectiveDate)
      .withColumn("is_current", lit(false))
    // new open versions: changed keys + brand-new keys
    val opened = joined
      .filter(changed || (col(keyCol).isNull && col("__uk").isNotNull))
      .select(col("__uk").as(keyCol) +:
        tracked.map(c => col(s"__u_$c").as(c)) :+
        effectiveDate.as("valid_from") :+
        lit(null).cast("date").as("valid_to") :+
        lit(true).as("is_current"): _*)

    unionDiagonal(Seq(hist, untouched, closed, opened))
  }

  /** Snapshot diff — the audit step of an incremental corpus update:
    * classify every key across two versions of a table as `added`
    * (new only), `removed` (old only), or `changed` (present in both
    * with any `tracked` column differing, null-safely). Unchanged
    * keys are dropped: at 100 TB the diff of consecutive snapshots
    * is tiny relative to the table, and the unchanged bulk must not
    * ride the result. One key-partitioned join is the whole cost —
    * both sides shuffle on `keyCol` (or neither, if persisted
    * bucketed on it); the classification is a narrow projection.
    *
    * `keyCol` must be unique per side (snapshots, not logs) —
    * duplicate keys would fan the full-outer join out into one row
    * per pair. */
  def snapshotDiff(old: DataFrame, cur: DataFrame, keyCol: String,
      tracked: Seq[String]): DataFrame = {
    require(tracked.nonEmpty, "snapshotDiff needs at least one tracked column")
    val o = old.select(col(keyCol).as("__ok") +:
      tracked.map(c => col(c).as(s"__o_$c")): _*)
    val n = cur.select(col(keyCol).as("__nk") +:
      tracked.map(c => col(c).as(s"__n_$c")): _*)
    val changed = tracked
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    o.join(n, col("__ok") === col("__nk"), "full_outer")
      .withColumn("change",
        when(col("__ok").isNull, "added")
          .when(col("__nk").isNull, "removed")
          .when(changed, "changed"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("__ok"), col("__nk")).as(keyCol), col("change"))
  }
}
