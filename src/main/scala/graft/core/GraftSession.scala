package graft.core

import org.apache.spark.sql.SparkSession

/** Session bootstrap for the graft engine.
  *
  * Tuned for the driver's harness (single-JVM `local[N]`) but with the
  * settings we would ship on a real cluster: AQE on (runtime shuffle
  * coalescing + skew-join splitting), shuffle parallelism sized to the
  * executor count rather than Spark's default 200, UTC session time zone
  * (fixture timestamps are UTC — see FIXTURES.md §B).
  *
  * Unlike the reference driver (which drops `-D` overrides on the floor —
  * reference `WordCount.java:30` constructs a fresh Configuration instead of
  * using `getConf()`, SURVEY §2.1), `extraConf` entries here are actually
  * applied.
  */
object GraftSession {
  def builder(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32,
      extraConf: Map[String, String] = Map.empty): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    b
  }

  def local(appName: String = "graft-test", threads: Int = 4): SparkSession = {
    val s = builder(appName, s"local[$threads]", shufflePartitions = threads)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
