package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness: generates a ~20× corpus from sf0.1 (documents
  * ×20, embeddings ×10, ids remapped so every copy is distinct; all other
  * tables passed through), then runs the full Bench loop on it and emits
  * a BENCH-format JSON artifact. This mechanizes the round-1 ad-hoc
  * stress run (NOTES.md) so scale regressions are caught per-round, not
  * rediscovered.
  *
  * The replicated corpus is deliberately dup-heavy (20 identical copies
  * of every document): the dedup family (q30–q34, q39) sees worst-case
  * candidate volume, which is exactly what the stress run is for.
  *
  * Usage: runMain graft.Stress [corpusDir] [artifactPath] [queries...]
  */
object Stress {

  /** Cross-join replicate with id remap — distributed, no driver loop:
    * copy k of row id becomes id + k·(maxId+1).
    */
  private def replicate(spark: SparkSession, src: String, table: String,
      idCol: String, copies: Int, dst: String): Unit = {
    val df = spark.read.parquet(s"$src/$table.parquet")
    val off = df.agg(max(col(idCol))).head().getLong(0) + 1L
    df.crossJoin(spark.range(copies).toDF("copy_k"))
      .withColumn(idCol, col(idCol) + col("copy_k") * off)
      .drop("copy_k")
      .write.mode("overwrite").parquet(s"$dst/$table.parquet")
  }

  def generateIfAbsent(spark: SparkSession, src: String, dst: String,
      docCopies: Int = 20, vecCopies: Int = 10): Unit = {
    // the marker records the replication factors: a request for a
    // DIFFERENT scale must regenerate, not silently reuse the old corpus
    // under the new label
    val marker = Paths.get(s"$dst/_GRAFT_STRESS_READY")
    val stamp = s"docCopies=$docCopies,vecCopies=$vecCopies,src=$src"
    if (Files.exists(marker) && Files.readString(marker).trim == stamp) return
    replicate(spark, src, "documents", "doc_id", docCopies, dst)
    replicate(spark, src, "embeddings", "vec_id", vecCopies, dst)
    graft.core.Tables.all.filterNot(t => t == "documents" || t == "embeddings")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    Files.writeString(marker, stamp + "\n")
  }

  def main(args: Array[String]): Unit = {
    val dst = args.headOption.getOrElse("/tmp/graft-stress")
    val artifact = args.lift(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession
      .builder("graft-stress", s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generateIfAbsent(spark, "/root/testdata/sf0.1", dst)
    // 2 clean probe-gated sweeps: the 20x sweep is long enough that
    // single passes show one-off GC/page-cache outliers on heavy
    // queries (see Bench.timeAll) — the regression gate needs the
    // noise floor, and the probes say whether it was reached
    val run = Bench.timeAll(spark, dst, only = only, passes = 2)
    System.err.println(s"[stress] sweeps=${run.sweeps} clean=${run.cleanSweeps}")
    val line = Bench.jsonLine(run, dst, passes = 2)
    println(line)
    artifact.foreach(f => Files.writeString(Paths.get(f), line + "\n"))
    spark.stop()
  }
}
