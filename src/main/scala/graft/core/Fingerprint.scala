package graft.core

/** Cheap content fingerprint for a parquet table under a fixture dir:
  * the sorted (path, length, mtime) listing, hashed. Session memos
  * (LSH signature frames, IVF quantizers) key on this so that files
  * changing under a cached dir mid-session — a streaming ingest landing
  * docs, a stress-corpus regeneration in a reused session — are
  * DETECTED (stale entry evicted, fresh one built) instead of silently
  * served stale. Listing + mtimes is a metadata-only pass: no file
  * contents are read, so taking the fingerprint costs microseconds even
  * on wide tables.
  */
object Fingerprint {

  def of(dir: String, table: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).fold(Seq.empty[java.io.File])(
          _.toSeq.sortBy(_.getName).flatMap(walk))
      else Seq(f)
    val root = new java.io.File(s"$dir/$table.parquet")
    val entries = walk(root)
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
    java.util.UUID
      .nameUUIDFromBytes(entries.mkString("|").getBytes("UTF-8"))
      .toString
  }
}
