package graft.queries

/** Training-data-pipeline operator catalog (driver-mandated extensions,
  * SURVEY.md §7.5): deduplication, similarity search, text analysis,
  * JSON extraction, streaming-equivalent windowed aggregation, and
  * binary-column (multimodal) plumbing. Hash-verifiable against DuckDB
  * wherever the computation is exactly portable; approximate/LSH
  * variants that are Spark-plan-specific are rows-only checked.
  *
  * Split (r15) across five CONTIGUOUS, ORDER-PRESERVING slice files
  * plus ExtensionSupport (shared helpers/fixtures); this aggregator
  * preserves the original catalog order exactly.
  */
object ExtensionQueries {
  val specs: Seq[QuerySpec] =
    ExtensionDedupAnnQueries.specs ++
    ExtensionStorageRetrievalQueries.specs ++
    ExtensionSketchQueries.specs ++
    ExtensionCrawlGraphQueries.specs ++
    ExtensionWebStreamQueries.specs
}
