package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan for the named
  * queries (or a pushdown/broadcast/codegen summary for all with no args).
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets: Seq[String] =
      if (names.nonEmpty) names.toSeq else SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: unknown query ==")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (names.nonEmpty) {
            println(s"== $name ==")
            df.explain("formatted")
          } else {
            val p = df.queryExecution.executedPlan.toString
            val lines = p.linesIterator.toSeq
            def c(s: String) = lines.count(_.contains(s))
            val pushed = lines.filter(_.contains("PushedFilters: [")).exists(!_.contains("PushedFilters: []"))
            println(f"$name%-30s wscg=${c("WholeStageCodegen")}%2d exchanges=${c("Exchange")}%2d bhj=${c("BroadcastHashJoin")}%2d smj=${c("SortMergeJoin")}%2d pushedFilters=$pushed")
          }
      }
    }
    spark.stop()
  }
}
