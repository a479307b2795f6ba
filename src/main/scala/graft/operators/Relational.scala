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
    * Anti-join is the distributed FK check — no driver-side loops. */
  def fkOrphans(child: DataFrame, parent: DataFrame,
      keys: Seq[(String, String)]): DataFrame = {
    val cond = keys.map { case (ck, pk) => child(ck) === parent(pk) }
      .reduce(_ && _)
    child.join(parent, cond, "left_anti")
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
}
