package graft.wordcount

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.functions.TextFunctions.tokens

/** The reference's one query — WordCount — rebuilt Spark-first.
  *
  * Semantics pinned to the reference (SURVEY §2):
  *  - tokenize on the single char U+0020, no empty tokens
  *    (`MapClass.java:22`, StringTokenizer semantics — §2.4);
  *  - count per token (`ReduceClass.java:15-22`) — Spark's
  *    HashAggregateExec does partial+final aggregation, i.e. the map-side
  *    combine the reference never registers (`WordCount.java:41-42`);
  *  - total-order sort in UTF-8 BYTE order (`Text.Comparator`, §2.6):
  *    sort on `encode(word, "UTF-8")` (BinaryType sorts byte-wise) —
  *    plain string orderBy would diverge for supplementary-plane chars;
  *  - TSV output `word\tcount`, fail-if-output-exists
  *    (`TextOutputFormat` + `FileOutputFormat.checkOutputSpecs`,
  *    `WordCount.java:35,39`) = SaveMode.ErrorIfExists;
  *  - CLI contract: exactly 2 args, usage + exit -1 otherwise
  *    (`WordCount.java:25-28`).
  *
  * Scale: `singleFile = true` reproduces the reference's 1-reducer single
  * output file (`coalesce(1)` at the SINK only — the aggregation still
  * runs at full parallelism). At 100 TB you run `singleFile = false`:
  * the global sort range-partitions, part files are globally ordered by
  * part index — same total order, concatenation-compatible (cf. the
  * reference's vendored `FileUtil.copyMerge`, `FileUtil.java:194-228`).
  */
object WordCountJob {

  /** word → count, sorted by UTF-8 byte order of the word. */
  def count(spark: SparkSession, input: DataFrame): DataFrame =
    input
      .select(explode(tokens(col("value"))).as("word"))
      .groupBy("word")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))
      .orderBy(encode(col("word"), "UTF-8"))

  def run(spark: SparkSession, in: String, out: String, singleFile: Boolean = true): Unit = {
    val counted = count(spark, spark.read.text(in))
    val lines = counted.select(concat_ws("\t", col("word"), col("count")).as("value"))
    val sink = if (singleFile) lines.coalesce(1) else lines
    sink.write.mode(SaveMode.ErrorIfExists).text(out)
  }

  def main(args: Array[String]): Unit = sys.exit(execute(args))

  /** Reference driver contract (`WordCount.java:19-28,44-52`). */
  def execute(args: Array[String]): Int = {
    if (args.length != 2) {
      System.err.println("Usage: WordCountJob <input> <output>")
      return -1
    }
    val spark = GraftSession.builder("WordCounter").getOrCreate()
    try {
      run(spark, args(0), args(1))
      println("Job was successful")
      0
    } catch {
      case e: Exception =>
        System.err.println(s"Job was not successful: ${e.getMessage}")
        1
    } finally spark.stop()
  }
}
