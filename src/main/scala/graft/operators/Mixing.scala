package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted deterministic corpus mixing — combining source corpora at
  * target sampling ratios into one global training order, the step
  * after per-corpus cleaning and before packing.
  *
  * Stride interleaving: a row with 0-based rank r inside source s of
  * weight w gets mix key (r + 0.5) / w. Reading rows in ascending key
  * order yields each source at a rate proportional to its weight
  * (a weight-2 source contributes two rows for every one from a
  * weight-1 source), deterministically — no RNG, stable under
  * re-runs, appends to one source shift only that source's tail.
  *
  * Scale shape: the per-source rank is the distributed two-level
  * prefix sum ([[Packing.exclusiveRunningSum]] over a constant 1) —
  * no global window over any corpus; the union is map-side. Consumers
  * sort by (mix_key, source, id) — a total order since ranks are
  * unique within a source. The key arithmetic is plain double
  * division, bit-identical cross-engine. */
object Mixing {

  /** Tag + interleave `sources` (name, frame, weight): returns
    * (source, idCol, mix_key) for every row of every source. Weights
    * must be positive; `idCol` must be unique within each source.
    * `nBuckets = 0` adapts the rank prefix sum to each source's
    * partitioning (see [[Packing.assignPacks]]). */
  def weightedInterleave(sources: Seq[(String, DataFrame, Double)],
      idCol: String, nBuckets: Int = 0): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(sources.forall(_._3 > 0), "weights must be positive")
    sources.map { case (name, df, w) =>
      Packing.exclusiveRunningSum(
          df.select(col(idCol), lit(1L).as("__one")), idCol, "__one",
          nBuckets)
        .select(lit(name).as("source"), col(idCol),
          ((col("__excl").cast("double") + 0.5) / w).as("mix_key"))
    }.reduce(_.unionByName(_))
  }
}
