package graft.core

import org.apache.spark.sql.SparkSession

/** Cheap content fingerprint for a parquet table under a fixture dir:
  * the sorted (path, length, mtime) listing, hashed. Session memos
  * (LSH signature frames, candidate-pair frames, IVF quantizers and
  * indexes) key on this so that files changing under a cached dir
  * mid-session — a streaming ingest landing docs, a stress-corpus
  * regeneration in a reused session — are DETECTED (stale entry
  * evicted, fresh one built) instead of silently served stale.
  * Listing + mtimes is a metadata-only pass: no file contents are
  * read, so taking the fingerprint costs microseconds even on wide
  * tables.
  *
  * Listing goes through the session's Hadoop `FileSystem`, so the
  * fingerprint works for any scheme the session can read (local,
  * HDFS, S3A, …) — a `java.io.File` walk would silently collapse
  * every non-local dir to one constant fingerprint, restoring the
  * serve-stale behavior the memo keys exist to prevent.
  *
  * Known granularity limit (inherent to metadata-only): an in-place
  * rewrite that preserves every file's length within the filesystem's
  * mtime granularity is undetected. Callers needing stronger
  * guarantees should call the explicit invalidate hooks
  * ([[graft.ops.Dedup.invalidateSignatureCache]],
  * [[graft.ops.Similarity.invalidateIvfCache]]).
  */
object Fingerprint {

  def of(spark: SparkSession, dir: String, table: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(path)) {
      val it = fs.listFiles(path, true)
      while (it.hasNext) {
        val st = it.next()
        entries += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
    }
    java.util.UUID
      .nameUUIDFromBytes(entries.sorted.mkString("|").getBytes("UTF-8"))
      .toString
  }
}
