package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** HTTP fetch + local cache — the reference's S2.1/S3 ingestion step
  * (`fetch_csv`, `/root/reference/scripts/build_db.py:33-52`: build
  * `data_dir/<name>.csv`, GET `<base>/<name>.csv` only when the file
  * does not already exist, return the local path).
  *
  * Same shape here, driver-side by design: the cluster never fetches —
  * upstream files land once in a shared cache directory and every
  * executor reads the cached copy through the normal scan path. The
  * transport is pluggable so zero-egress environments (tests, CI) can
  * inject one; the default uses the JDK's URL stream.
  */
object Http {

  type Transport = String => Array[Byte]

  /** Default transport: plain JDK fetch of the URL's bytes (stream
    * closed even when readAllBytes throws). */
  val defaultTransport: Transport = url => {
    val in = new java.net.URI(url).toURL.openStream()
    try in.readAllBytes() finally in.close()
  }

  /** Reference `fetch_csv` semantics: return `cacheDir/<name>`,
    * fetching `<baseUrl>/<name>` first ONLY if the cached copy does
    * not exist (repeat builds never re-download). The cache write is
    * temp-file + atomic rename, so an interrupted fetch can never
    * leave a truncated file that later calls would trust, and
    * concurrent drivers sharing the cache directory see either
    * nothing or the complete file. */
  def fetchCached(name: String, cacheDir: String, baseUrl: String,
      transport: Transport = defaultTransport): Path = {
    val local = Paths.get(cacheDir, name)
    if (!Files.exists(local)) {
      Files.createDirectories(local.getParent)
      val bytes = transport(s"$baseUrl/$name")
      val tmp = Files.createTempFile(local.getParent, s".$name.", ".part")
      try {
        Files.write(tmp, bytes)
        // ATOMIC_MOVE on POSIX replaces an existing target (rename(2)),
        // so a concurrent fetch race resolves to last-writer-wins with
        // both writers having written complete identical content —
        // no existence check needed, and none would be atomic anyway.
        Files.move(tmp, local,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case e: Throwable =>
          Files.deleteIfExists(tmp); throw e
      }
    }
    local
  }

  /** Fetch-then-scan: the reference's read path (fetch to cache, read
    * the cached CSV with a declared schema). */
  def readCsv(spark: SparkSession, name: String, cacheDir: String,
      baseUrl: String, schema: StructType,
      transport: Transport = defaultTransport): DataFrame =
    Csv.read(spark, fetchCached(name, cacheDir, baseUrl, transport).toString,
      schema)
}
