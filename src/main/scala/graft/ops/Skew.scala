package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (natural-language token
  * frequencies are Zipfian — "the" alone can be a double-digit share of
  * a 100 TB corpus).
  *
  * Defense-in-depth order at scale:
  *  1. partial (map-side) aggregation — HashAggregateExec gives this for
  *     free and absorbs most aggregation skew (the reference's
  *     no-combiner plan had none: every ("the", 1) pair crossed its
  *     shuffle);
  *  2. AQE skew-join splitting (enabled in every graft session) for
  *     joins whose build side can't be broadcast;
  *  3. explicit salting (below) when a single group's PARTIAL state is
  *     still too hot — e.g. distinct-heavy or collect-style aggregates
  *     where map-side combine can't shrink the hot key.
  */
object Skew {

  /** Two-stage salted count: spread each key over `salts` sub-keys with a
    * deterministic salt derived from row content (crc32, not rand() —
    * retries/speculative tasks must re-produce identical partials), count
    * per (key, salt), then merge partials per key.
    *
    * Result is exactly groupBy(key).count() — verified in SkewSpec —
    * but the widest shuffle carries `salts` rows per hot key instead of
    * one giant group.
    */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column, salts: Int): DataFrame =
    df.select(key.as("k"), (crc32(saltSource.cast("string")) % salts).as("salt"))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy("k")
      .agg(sum("partial_cnt").as("cnt"))

  /** Salted long-sum, same contract as [[saltedCount]]. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltSource: Column,
      salts: Int): DataFrame =
    df.select(key.as("k"), value.as("v"),
        (crc32(saltSource.cast("string")) % salts).as("salt"))
      .groupBy("k", "salt")
      .agg(sum("v").as("partial_sum"))
      .groupBy("k")
      .agg(sum("partial_sum").as("total"))

  /** Replicated ("salt the small side") join for a skewed equi-join that
    * cannot broadcast: each big-side row gets a deterministic salt in
    * [0, salts); the small side is replicated `salts` times; the join key
    * becomes (key, salt), splitting each hot key's rows across `salts`
    * reducers. Output equals the plain inner join (SkewSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltSource: Column,
      salts: Int): DataFrame = {
    // null saltSource must still salt deterministically (crc32(null) is
    // null and a null __salt would be silently dropped by the equi-join)
    val saltedBig = big.withColumn("__salt",
      coalesce(crc32(saltSource.cast("string")) % salts, lit(0L)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
