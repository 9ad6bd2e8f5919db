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

  /** `-Dkey=value` generic options, the ToolRunner/GenericOptionsParser
    * surface the reference driver accepts (`WordCount.java:20`) and then
    * silently drops (`WordCount.java:30` builds a fresh Configuration
    * instead of using `getConf()` — documented reference bug, SURVEY
    * §2.1). Here the overrides are parsed AND applied (fixed, not
    * reproduced): they land in the session conf via GraftSession's
    * `extraConf`. A `-D` without `=` is not an option, per
    * GenericOptionsParser — it falls through to the positional args.
    */
  def parseDashD(args: Array[String]): (Map[String, String], Array[String]) = {
    val (opts, rest) = args.partition(a => a.startsWith("-D") && a.contains("="))
    val conf = opts.map(_.stripPrefix("-D")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> v
    }.toMap
    (conf, rest)
  }

  /** Reference driver contract (`WordCount.java:19-28,44-52`). */
  def execute(args: Array[String]): Int = {
    val (conf, rest) = parseDashD(args)
    if (rest.length != 2) {
      System.err.println("Usage: WordCountJob [-Dkey=value ...] <input> <output>")
      return -1
    }
    // stop only a session this invocation created — getOrCreate may hand
    // back a caller's live session (and applies `conf` to it). A default
    // session whose context was already stopped does NOT count: getOrCreate
    // replaces it with a fresh one that this invocation then owns
    val preexisting = org.apache.spark.sql.SparkSession.getDefaultSession
      .exists(s => !s.sparkContext.isStopped)
    val spark = GraftSession.builder("WordCounter", extraConf = conf).getOrCreate()
    try {
      run(spark, rest(0), rest(1))
      println("Job was successful")
      0
    } catch {
      case e: Exception =>
        System.err.println(s"Job was not successful: ${e.getMessage}")
        1
    } finally if (!preexisting) spark.stop()
  }
}
