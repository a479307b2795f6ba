package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.types._

/** Mechanized boundary checks for catalog entries.
  *
  * The driver's comparator round-trips each entry's result through
  * parquet, sorts columns by name, and hashes values in row order, so
  * an entry is deterministic across engines only if
  *
  *  (a) no output column is DECIMAL — a decimal column crosses
  *      parquet→comparator with engine-specific scale/dtype rendering
  *      (the r12 s14b/s22 failures), which is why the catalog's
  *      convention is exact DECIMAL(18,2) arithmetic followed by a
  *      cast back to DOUBLE at the boundary; and
  *  (b) the final ORDER BY is TOTAL over the result — within a
  *      sort-key tie group every row must be bit-identical, or both
  *      engines are free to emit the tied rows in either order and
  *      the hash gate flaps (the synthetic fixture's duplicate
  *      (l_orderkey, l_linenumber) pairs made exactly this latent in
  *      three entries across ten rounds).
  *
  * These checks ran by hand per entry since round ~2 and still let
  * violations ship; CatalogSpec now runs them across the whole
  * catalog, and Verify warns loudly on (a) and on a missing top-level
  * sort at dump time.
  */
object CatalogChecks {

  /** Output columns that contain a DecimalType anywhere in their type
    * tree (top-level, struct field, array element, map key/value). */
  def decimalColumns(df: DataFrame): Seq[String] = {
    def has(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType  => s.fields.exists(f => has(f.dataType))
      case a: ArrayType   => has(a.elementType)
      case m: MapType     => has(m.keyType) || has(m.valueType)
      case _              => false
    }
    df.schema.fields.filter(f => has(f.dataType)).map(_.name).toSeq
  }

  /** What the data-side totality check must run on: the sort-key
    * column names plus the frame to group — the entry's own output
    * when no LIMIT sits above the Sort, or the PRE-limit sort input
    * when one does (a non-total key above a limit picks different
    * boundary rows per engine, invisible post-limit). `frame = None`
    * marks a shape that is order-safe with no data check (a global
    * ungrouped aggregate: exactly one row). */
  final case class SortCheck(keys: Seq[String], frame: Option[DataFrame])

  /** Resolve the entry's top-level global ORDER BY, looking through
    * order-preserving Projects and global/local Limits; Left(reason)
    * when there is no global top sort, a sort key is a computed
    * expression rather than a plain column, or (unlimited case) a
    * sorted column does not survive to the output — each of those
    * shapes defeats the data-side check and needs a hand-written
    * justification in CatalogSpec. */
  def totalOrderCheck(df: DataFrame): Either[String, SortCheck] = {
    val plan = df.queryExecution.analyzed
    @annotation.tailrec
    def topSort(p: LogicalPlan, limited: Boolean)
        : (Option[Sort], Boolean) = p match {
      case s: Sort if s.global => (Some(s), limited)
      case pr: Project         => topSort(pr.child, limited)
      case l: GlobalLimit      => topSort(l.child, limited = true)
      case l: LocalLimit       => topSort(l.child, limited = true)
      case _                   => (None, limited)
    }
    @annotation.tailrec
    def globalAgg(p: LogicalPlan): Boolean = p match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case pr: Project  => globalAgg(pr.child)
      // a filter over a ≤1-row frame is still ≤1 row (g9b's
      // empty-input guard: agg(...).where(n_rows is not null))
      case f: Filter    => globalAgg(f.child)
      case _            => false
    }
    def resolveNames(keys: Seq[org.apache.spark.sql.catalyst.expressions
        .Expression], out: Seq[org.apache.spark.sql.catalyst.expressions
        .Attribute]): Either[String, Seq[String]] = {
      val byId = out.map(a => a.exprId -> a.name).toMap
      val dupNames = out.groupBy(_.name).filter(_._2.size > 1).keySet
      val resolved = keys.map {
        case a: AttributeReference =>
          byId.get(a.exprId) match {
            case Some(n) if dupNames(n) =>
              Left(s"ambiguous sort column name '$n'")
            case Some(n) => Right(n)
            case None    => Left(s"sort column '${a.name}' not in output")
          }
        case e => Left(s"non-column sort key: ${e.sql}")
      }
      resolved.collectFirst { case Left(err) => err }
        .toLeft(resolved.map(_.toOption.get))
    }
    // a Limit sitting BELOW the top Sort (the orderBy(k).limit(n)
    // .orderBy(k) top-k idiom, x64) still picks boundary rows
    // PRE-limit: find it through order-preserving Projects
    @annotation.tailrec
    def limitBelow(p: LogicalPlan): Option[LogicalPlan] = p match {
      case pr: Project    => limitBelow(pr.child)
      case l: GlobalLimit => Some(l.child)
      case l: LocalLimit  => Some(l.child)
      case _              => None
    }
    @annotation.tailrec
    def unwrapLimits(p: LogicalPlan): LogicalPlan = p match {
      case l: GlobalLimit => unwrapLimits(l.child)
      case l: LocalLimit  => unwrapLimits(l.child)
      case _              => p
    }
    topSort(plan, limited = false) match {
      case (None, _) if globalAgg(plan) =>
        // ungrouped aggregate: exactly one output row, order-safe
        Right(SortCheck(Nil, None))
      case (None, _) => Left("no top-level global ORDER BY")
      case (Some(s), limited) =>
        val keys = s.order.map(_.child)
        if (limited)
          // check on the pre-limit frame: stricter than the output
          // needs (a tied row differing only in a column dropped
          // ABOVE the limit flags too) — strictness errs safe; such
          // an entry should carry the extra sort key anyway
          resolveNames(keys, s.child.output).map(ns =>
            SortCheck(ns, Some(org.apache.spark.sql.GraftBridge
              .ofRows(df.sparkSession, s.child))))
        else limitBelow(s.child) match {
          case None =>
            resolveNames(keys, plan.output).map(ns =>
              SortCheck(ns, Some(df)))
          case Some(underLimit) => unwrapLimits(underLimit) match {
            // the limit's boundary rows are picked by the INNER sort;
            // when it matches the top sort key-for-key, one pre-limit
            // tie check covers both the boundary pick and the final
            // emission order (totality over a frame implies totality
            // over any subset of its rows)
            case inner: Sort if inner.global &&
                inner.order.length == s.order.length &&
                inner.order.zip(s.order).forall {
                  case (a, b) => a.semanticEquals(b) } =>
              resolveNames(keys, inner.child.output).map(ns =>
                SortCheck(ns, Some(org.apache.spark.sql.GraftBridge
                  .ofRows(df.sparkSession, inner.child))))
            case _ => Left("LIMIT below the top ORDER BY with a " +
              "different (or no) inner sort — boundary rows are picked " +
              "by a key the checker cannot verify")
          }
        }
    }
  }

  /** Number of sort-key groups holding more than one DISTINCT full
    * row. Zero ⇒ the order is total up to bit-identical rows, which
    * hash the same in either emission order. (dropDuplicates first:
    * duplicate identical rows are NOT a violation.) */
  def totalOrderViolations(df: DataFrame, keys: Seq[String]): Long =
    df.dropDuplicates()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__graft_tie_n"))
      .filter(col("__graft_tie_n") > 1)
      .count()
}
