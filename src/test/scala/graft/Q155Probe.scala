package graft

import org.apache.spark.sql.functions._

/** MEASUREMENT main (Test/runMain graft.Q155Probe [dir]): q155 stage
  * timings — where do the seconds go (byte decode fold vs grid build vs
  * banding join vs verify)?
  */
object Q155Probe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    t("warm: docs count")(docs.count())
    val hx = docs.select(col("doc_id"),
      lower(hex(encode(col("text"), "UTF-8"))).as("hx"))
    t("hex only")(hx.count())
    val cells = hx
      .select(col("doc_id"),
        explode(sequence(lit(1), (length(col("hx")) / lit(2)).cast("int")))
          .as("p"),
        col("hx"))
      .select(col("doc_id"), ((col("p") - 1) % lit(72)).cast("long").as("cell"),
        conv(col("hx").substr(col("p") * 2 - 1, lit(2)), 16, 10)
          .cast("long").as("v"))
      .groupBy("doc_id", "cell").agg(sum("v").as("v"))
    t("cells agg (explode+conv)")(cells.count())
    t("cells agg again")(cells.count())
    val grid = cells.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("cell"), col("v"))))
        .as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(71L)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("g"))
    t("grid")(grid.count())
    val q = graft.ops.Multimodal.q155PhashNearDup(spark, dir)
    t("full q155 (first)")(q.count())
    t("full q155 (second)")(graft.ops.Multimodal.q155PhashNearDup(spark, dir).count())
  }
}
