package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Spark-side analog of the reference's vendored `FileUtil.copyMerge`
  * (reference `FileUtil.java:194-228`): concatenate a job's `part-*`
  * files, in part-index (= filename) order, into one file.
  *
  * Because a global `orderBy` range-partitions, part files are globally
  * ordered by part index — so the concatenation equals the
  * `singleFile = true` (coalesce(1)) output byte-for-byte, without ever
  * funneling the job itself through one task. This is the 100 TB shape:
  * full-parallelism sort + sink, then one sequential streaming merge (an
  * fs-level copy, no parse/decode), only when a single artifact file is
  * actually required.
  *
  * Uses the Hadoop FileSystem API so the same code runs against HDFS /
  * object stores, not just local disk.
  */
object Merge {

  /** Part index parsed from the filename: Spark ("part-00042-uuid.ext")
    * and classic Hadoop MR ("part-r-00042" / "part-m-00042") forms.
    * Merging sorts by the PARSED index, not lexicographically: once a
    * job exceeds 99,999 tasks the index outgrows its %05d padding and
    * "part-100000" sorts before "part-99999" as a string — exactly at
    * the scale this utility exists for. Unparseable names sort last,
    * stably by full name.
    */
  def partIndex(name: String): Int = {
    val segs = name.split("-")
    val idxSeg = segs.lift(1) match {
      case Some("r") | Some("m") => segs.lift(2) // Hadoop part-r-NNNNN
      case other => other // Spark part-NNNNN-uuid
    }
    idxSeg.flatMap(s => s.takeWhile(_.isDigit) match {
      case "" => None
      case ds => ds.toIntOption
    }).getOrElse(Int.MaxValue)
  }

  /** Concatenate `srcDir`'s part files into `dstFile` (fails if it
    * exists — the FileOutputFormat overwrite contract). Returns the
    * number of part files merged.
    */
  def copyMerge(conf: Configuration, srcDir: String, dstFile: String,
      deleteSrc: Boolean = false): Int = {
    val src = new Path(srcDir)
    val dst = new Path(dstFile)
    val fs = src.getFileSystem(conf)
    val parts = fs.listStatus(src).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .sortBy(p => (partIndex(p.getName), p.getName))
    val out = fs.create(dst, /* overwrite = */ false)
    try {
      try parts.foreach { p =>
        val in = fs.open(p)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, conf, /* close = */ false)
        finally in.close()
      } finally out.close()
    } catch {
      case e: Throwable =>
        // a partially-written dst would make the retry fail on the
        // fail-if-exists create with no hint the file is garbage —
        // remove it so retries start clean
        try fs.delete(dst, /* recursive = */ false)
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
    }
    if (deleteSrc) fs.delete(src, true)
    parts.length
  }
}
