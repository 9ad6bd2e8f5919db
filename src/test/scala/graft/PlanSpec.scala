package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: facts the scale story depends on, checked
  * mechanically so they can't silently regress.
  *
  * Nested-loop joins (BroadcastNestedLoopJoin / CartesianProduct) are
  * quadratic per partition-pair; they are acceptable ONLY where the
  * semantics are inherently non-equi AND one side is provably tiny
  * (single-row aggregate frames, fixed band tables, broadcast query
  * subsets). Everything else must be a hash/sort-merge join on keys.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Documented exceptions — every entry is a deliberate non-equi or
    * single-row cross join over a bounded broadcast side.
    */
  private val nestedLoopAllowed: Map[String, String] = Map(
    "q40_cosine_topk" -> "exact all-pairs baseline: =!= join, broadcast query subset",
    "q35_knn_classify" -> "built on q40's exact baseline",
    "q166_hard_negatives" -> ("q40's exact-baseline scan with the " +
      "label-inequality predicate riding it — same =!= join, same " +
      "broadcast query subset"),
    "q167_label_noise" -> "built on q40's exact baseline (the memoized top-5)",
    "q132_ann_recall" -> "recall eval built on q40's exact baseline",
    "q140_retrieval_metrics" -> "MRR/NDCG eval built on q40's exact baseline",
    "q142_ivf_recall_gate" -> ("recall gate built on q40's exact baseline " +
      "+ q48's centroid probe; its own joins are single-row aggregates"),
    "q48_ivf_ann" -> "nProbe probe: cross join against the nCentroids-row centroid table",
    "q70_ivf_probe_indexed" -> "same probe core as q48, reading the persisted index table",
    "q169_pq_adc_topk" -> ("q48's coarse probe shape (cross join against " +
      "the nCentroids-row centroid table) in front of the compressed-code " +
      "ADC ranking; the ADC joins themselves are keyed equality joins"),
    "q172_hybrid_query_rrf" -> ("dense side: broadcast query workload " +
      "against the corpus scan — q40's exact-baseline shape (|Q| is the " +
      "bounded broadcast side); the lexical side is keyed equality joins " +
      "and the approximate dense tier is q174/hybridAnnAtIngest"),
    "q174_hybrid_ann_rrf" -> ("q48's coarse probe shape (cross join " +
      "against the nCentroids-row centroid table) inside the ADC dense " +
      "tier (adcDenseList = q169's probe core); the lexical side and the " +
      "ADC/fusion joins are keyed equality joins"),
    "q58_band_join" -> "theta join against the fixed 5-row band table",
    "q26_tfidf" -> "single-row nDocs aggregate frame cross-joined in",
    "q49_collocations" -> "single-row corpus-totals aggregate frame cross-joined in",
    "q84_heavy_hitters" -> "single-row token-total aggregate frame cross-joined in",
    "q85_source_drift" -> "single-row token-total aggregate frame cross-joined in",
    "q104_equidepth_hist" -> "single-row percentile-boundaries frame cross-joined in",
    "q120_vocab_growth" -> "single-row id-bounds aggregate frame cross-joined in",
    "q124_mix_temperature" -> "single-row Σw totals aggregate frame cross-joined in",
    "q144_temporal_split" -> "single-row time-bounds aggregate frame cross-joined in",
    "q134_dedup_adjusted_mix" -> "single-row Σw totals aggregate frame cross-joined in",
    "q161_kmv_overlap" -> ("theta self-join (s1 < s2) of the #sources-row " +
      "KMV sketch frame — both sides are one k-length array per source, " +
      "bounded by source count, never by corpus size"),
    "q162_stupid_backoff" -> "single-row N-total aggregate frame cross-joined in",
    // r16: the rank operators (globalRank/groupedRank) are single lazy
    // Catalyst plans now — the old RDD hop truncated the inspected plan
    // at `Scan ExistingRDD`, hiding everything upstream of a rank from
    // this gate. Three queries' pre-existing single-row cross joins
    // became VISIBLE (not new): they get the same entries their plan
    // twins always had.
    "q158_bm25_topk" -> ("single-row corpus-stats (avgdl) aggregate frame " +
      "cross-joined in — was hidden behind the k-row globalRank RDD hop"),
    "q150_dsir_weights" -> ("single-row totals aggregate frame cross-joined " +
      "into the hash-feature ratio table — was hidden behind the " +
      "globalRank RDD hop"),
    "q170_hybrid_rrf" -> ("q158's single-row avgdl cross join (the lexical " +
      "side) plus the broadcast 1-row query-anchor frame against the " +
      "corpus scan (the dense side) — was hidden behind the globalRank " +
      "RDD hop"),
    "q121_containment_exact" -> ("dictionary-bitset brute force against the " +
      "broadcast contracted-rep mask table — taken only in the measured " +
      "degenerate-vocabulary regime (V<=2048, R<=20000; the test corpus is " +
      "V=31) where the answer is provably dense and prefix-filter candidates " +
      "cannot prune; general corpora plan the keyed prefix-filter path " +
      "(Dedup.qualifiedSetPairs)"),
    "q141_containment_reps" -> ("same guarded qualifiedSetPairs core as " +
      "q121 (one definition of 'qualified pair'): the bitset crossJoin in " +
      "the measured degenerate-vocabulary regime, the keyed prefix-filter " +
      "path on general corpora"))

  test("no nested-loop join outside the documented non-equi allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val hasNlj = plan.linesIterator.exists(l =>
        l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
      if (hasNlj && !nestedLoopAllowed.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: ${offenders.mkString(", ")}")
  }

  test("allowlist is not stale: every allowlisted query still plans a nested-loop join") {
    // if a query gets restructured away from its nested loop, this forces
    // the allowlist entry to be removed rather than rot
    val stale = nestedLoopAllowed.keys.toSeq.sorted.filterNot { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      plan.linesIterator.exists(l =>
        l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
    }
    assert(stale.isEmpty, s"allowlist entries with no nested loop left: ${stale.mkString(", ")}")
  }

  test("filter pushdown and column pruning reach the parquet scan") {
    // q01/q02 carry scan-pushable predicates (timestamp/number
    // comparisons); modulo-filter queries (q11, q54) are excluded —
    // Spark can't push `%`. Pruning: q01 needs 7 lineitem columns, so
    // the scan schema must not include unneeded ones.
    for (name <- Seq("q01_pricing_summary", "q02_filter_project")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: ["), s"$name: no pushdown block")
      assert(!plan.contains("PushedFilters: []"), s"$name: empty pushdown")
    }
    val q01 = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!q01.contains("l_orderkey"), "q01 scan reads an unneeded column")
  }

  test("q69 propagation round is a hash join + hash agg, never a nested loop") {
    // the exact operator connectedComponents runs each round, via the
    // factored-out propagateOnce — a nested-loop or cartesian here would
    // be quadratic in the pair-graph size every round
    import org.apache.spark.sql.functions._
    val edges = graft.ops.Dedup.symmetrizeEdges(
      graft.ops.Dedup.lshCandidatePairs(spark, sf))
    val labels = edges.groupBy(col("doc_a").as("doc_id"))
      .agg(min(least(col("doc_a"), col("doc_b"))).as("component"))
    val plan = graft.ops.Dedup.propagateOnce(edges, labels)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"propagation round must be an equi join:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"propagation round must fold labels in a hash agg:\n$plan")
  }

  test("q155/q156 band-index joins flip on the measured-size broadcast gate") {
    // Under the rep limit the corpus band index is broadcast (candidate
    // generation map-side, zero candidate shuffle); above it every
    // gated join is a pinned shuffle hash join on its equality keys —
    // the shape that survives a corpus-sized rep set at 100 TB, where
    // an unconditional broadcast() hint OOMs the driver. Both shapes
    // are asserted here so neither can silently regress.
    import graft.ops.Multimodal
    for (name <- Seq("q155_phash_neardup", "q156_phash_topk")) {
      val small = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(small.contains("BroadcastHashJoin"),
        s"$name small regime: band-index joins should broadcast")
      assert(!small.contains("ShuffledHashJoin"),
        s"$name small regime: no gated join should take the shuffle path")
    }
    // force the large regime: a zero rep limit makes the measured
    // count exceed it, so the gate must pick shuffle hash joins
    spark.conf.set(Multimodal.BroadcastRepLimitConf, "0")
    try {
      for (name <- Seq("q155_phash_neardup", "q156_phash_topk")) {
        val large = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(large.contains("ShuffledHashJoin"),
          s"$name large regime: gated joins must take the shuffle-hash path")
      }
    } finally spark.conf.unset(Multimodal.BroadcastRepLimitConf)
  }

  test("q121 member-list expansion joins flip on the measured-size broadcast gate") {
    // The member-expansion joins attach per-rep member-id LISTS and
    // explode map-side, so the quadratic member blow-up never crosses
    // an exchange. Under the doc limit the list frames broadcast;
    // above it (forced here with a zero limit) the gate must degrade
    // to pinned shuffle-hash joins on the rep keys — the shape that
    // survives a corpus-sized membership at 100 TB.
    import graft.ops.Dedup
    val small = SparkEntry.queries("q121_containment_exact")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"),
      s"q121 small regime: member-list joins should broadcast:\n$small")
    spark.conf.set(Dedup.ContainmentBroadcastDocLimitConf, "0")
    try {
      val large = SparkEntry.queries("q121_containment_exact")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(large.contains("ShuffledHashJoin"),
        s"q121 large regime: gated joins must take the shuffle-hash path:\n$large")
    } finally spark.conf.unset(Dedup.ContainmentBroadcastDocLimitConf)
  }

  test("NO query plans a no-key (global) window — all registered queries") {
    // the q49 hazard class: Window.partitionBy()/Window.orderBy() with no
    // partition keys funnels everything through one partition. Even
    // semantically-global ranks (q60) and guard-bounded dictionaries
    // (the q121/q141 bitset branch) use the distributed
    // sort+zipWithIndex formulation (ScalarSuites.globalRank) instead —
    // so this invariant holds over the ENTIRE query surface with no
    // exception list.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val globalWindows = fn(spark, sf)
          .queryExecution.optimizedPlan.collect {
            case w: LWindow if w.partitionSpec.isEmpty => w
          }
        if (globalWindows.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"no-key global windows in: ${offenders.mkString(", ")}")
  }

  test("NO corpus-sized window keyed only by low-cardinality columns — all registered queries") {
    // the no-key window's SKEWED sibling (the r15 q177 finding): a
    // Window partitioned only by a bounded-cardinality attribute
    // (source / lang / label in this schema) hashes each group onto ONE
    // task — with a dominant group at 100 TB (one web-crawl source
    // dwarfing the curated ones is the normal case) that is a
    // single-executor sort of most of the corpus. A low-card window is
    // acceptable ONLY when InferWindowGroupLimit has pruned it to a
    // constant per-group top-k (q73/q99/q115/q130: the exchange then
    // carries <= k rows per group per map partition, never the group).
    // Full per-group rankings, group totals, and running sums use the
    // range-partitioned ScalarSuites.groupedRank instead
    // (q124/q128/q134/q177) — executor-bounded sorts whatever the skew.
    import org.apache.spark.sql.catalyst.expressions.NamedExpression
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit => LWgl}
    val lowCard = Set("source", "lang", "label")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: LWindow
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall {
                case a: NamedExpression => lowCard.contains(a.name)
                case _ => false
              } &&
              w.child.collectFirst { case g: LWgl => g }.isEmpty => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpruned low-cardinality-key windows in: ${offenders.mkString(", ")}")
  }
}
