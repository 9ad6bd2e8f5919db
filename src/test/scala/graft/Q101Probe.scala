package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** MEASUREMENT main (Test/runMain graft.Q101Probe [dir]): the round-9
  * verdict's item 4 — q101's candidate volume. Two variants against the
  * shipped verify-then-distinct plan:
  *
  *  - distinct-before-verify: dedupe candidate PAIRS ahead of the
  *    levenshtein, paying a bigger distinct shuffle to run fewer DP
  *    verifications;
  *  - length-segmented keys: NOT measured as a variant because it is a
  *    no-op under string-equality join — a deletion key of a length-L
  *    name has length L or L-1, so two names with |len| > 1 can never
  *    share a key STRING; the SymSpell refinement pays off for
  *    in-memory dictionary lookups, not for a join already keyed on
  *    the full key (the hash join's key includes the length by
  *    construction). Recorded in NOTES with this reasoning.
  */
object Q101Probe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def keysOf(named: DataFrame): DataFrame = named
      .select(col("key"), col("name"),
        explode(array_union(
          array(col("name")),
          expr("""transform(sequence(1, length(name)),
                 | i -> concat(substring(name, 1, i - 1),
                 |             substring(name, i + 1, length(name))))
                 |""".stripMargin.replace('\n', ' ')))).as("k0"))
      .select(col("key"), col("name"), xxhash64(col("k0")).as("k"))

    def candidates(named: DataFrame): DataFrame = {
      val keys = keysOf(named)
      val a = keys.select(col("key").as("key_a"),
        col("name").as("name_a"), col("k"))
      val b = keys.select(col("key").as("key_b"),
        col("name").as("name_b"), col("k"))
      a.join(b, Seq("k")).where(col("key_a") < col("key_b"))
    }

    // shipped: verify -> distinct
    def current(named: DataFrame): DataFrame = candidates(named)
      .withColumn("lev", levenshtein(col("name_a"), col("name_b"), 1).cast("long"))
      .where(col("lev") >= 0L && col("lev") <= 1L)
      .select("key_a", "key_b", "name_a", "name_b", "lev")
      .distinct()

    // variant: distinct -> verify
    def preDistinct(named: DataFrame): DataFrame = candidates(named)
      .select("key_a", "key_b", "name_a", "name_b")
      .distinct()
      .withColumn("lev", levenshtein(col("name_a"), col("name_b"), 1).cast("long"))
      .where(col("lev") >= 0L && col("lev") <= 1L)
      .select("key_a", "key_b", "name_a", "name_b", "lev")

    val named = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_name").as("name"))

    def timeMin(mk: => DataFrame): (Double, Long) = {
      val n = mk.count() // warm
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }.min
      (t, n)
    }
    val occurrences = candidates(named).count()
    val (tCur, nCur) = timeMin(current(named))
    val (tPre, nPre) = timeMin(preDistinct(named))
    println(f"candidate occurrences: $occurrences")
    println(f"current (verify->distinct):     $tCur%6.2f s, rows $nCur")
    println(f"variant (distinct->verify):     $tPre%6.2f s, rows $nPre")
    require(nCur == nPre, s"variant changed the answer: $nCur vs $nPre")
  }
}
