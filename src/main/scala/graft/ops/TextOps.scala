package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.functions.Round._
import org.apache.spark.sql.graft.Bridge

/** Text-analysis operators over the `documents` fixture: word count (the
  * reference's one and only query — `MapClass.java`/`ReduceClass.java` —
  * generalized to a table column), per-language counts, per-document
  * token statistics & quality scoring, heuristic language ID, and
  * document fingerprinting.
  *
  * All tokenization is StringTokenizer-faithful (SURVEY §2.4) via
  * [[graft.functions.TextFunctions.tokens]].
  */
object TextOps {

  /** The reference query, Spark-native: tokenize → count per token →
    * sort. Partial aggregation gives the map-side combine the reference
    * lacks (it shuffles every (word,1) pair — SURVEY §2 op#4); Zipfian
    * token skew is absorbed by that partial agg.
    */
  def q20WordCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Word count per language — the grouped variant (lang, word). */
  def q21WordCountPerLang(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "word")

  /** Per-document token statistics + a composite quality score:
    * token count, distinct count, mean token length, type-token ratio,
    * stopword ratio. All computed with array higher-order functions —
    * no explode, no shuffle: a pure map-side pass (at 100 TB this is
    * embarrassingly parallel over parquet row groups).
    */
  /** (doc_id, n_tokens, n_distinct, sum_chars, n_stop) — the raw
    * per-document token stats q22 and docQuality (q77's input) both
    * feed into [[qualityExpr]]; ONE definition so the stop-word list
    * and stat expressions can never drift between consumers (each
    * oracle mirrors these exact expressions). Consumers that skip
    * columns get them pruned by Catalyst — docQuality never pays for
    * sum_chars.
    */
  private def tokenStats(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a")
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        tokenChars(col("toks")).as("sum_chars"),
        size(filter(col("toks"), t => t.isin(stop.map(lit): _*))).cast("long").as("n_stop"))
  }

  def q22DocTokenStats(s: SparkSession, d: String): DataFrame =
    tokenStats(s, d)
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_distinct"),
        r4(col("sum_chars").cast("double") / col("n_tokens")).as("avg_token_len"),
        r4(col("n_distinct").cast("double") / col("n_tokens")).as("ttr"),
        r4(col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"),
        qualityExpr(col("n_tokens"), col("n_distinct"), col("n_stop")).as("quality"))
      .orderBy("doc_id")

  /** The composite quality score shared by q22 and q73:
    * quality = 0.5*ttr + 0.3*(1-stop_ratio) + 0.2*min(n/100, 1),
    * expressed as a single exact-integer rational so both engines divide
    * identical numerator/denominator bits, rounded to 4 dp so rankings
    * over it are cross-engine stable.
    */
  private def qualityExpr(nTokens: org.apache.spark.sql.Column,
      nDistinct: org.apache.spark.sql.Column,
      nStop: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    r4((lit(5000.0) * nDistinct
      + lit(3000.0) * (nTokens - nStop)
      + lit(20.0) * least(nTokens, lit(100L)) * nTokens)
      / (lit(10000.0) * nTokens))

  /** (doc_id, quality) — the 4-dp composite score as a standalone frame
    * for consumers outside this file (q77's keeper selection). Pure
    * map-side (array HOFs, no explode, no shuffle), like q22.
    */
  private[ops] def docQuality(s: SparkSession, d: String): DataFrame =
    tokenStats(s, d)
      .select(col("doc_id"),
        qualityExpr(col("n_tokens"), col("n_distinct"), col("n_stop")).as("quality"))

  /** Text NORMALIZATION — the pre-tokenization cleanup pass every
    * training pipeline runs before dedup/quality: lowercase → Unicode
    * accent strip (NFD + drop combining marks, the strip_accents
    * contract) → URL scrub → email scrub → whitespace collapse → trim.
    * Everything is a per-row scalar chain (builtin codegen'd
    * regexp_replace + the [[graft.functions.expressions.StripAccents]]
    * expression) — embarrassingly parallel over row groups, no shuffle.
    *
    * The fixture corpus is already clean lowercase ASCII (FIXTURES.md),
    * so — like q50/q68's stub arithmetic — the input is a DETERMINISTIC
    * MESS constructed from (text, doc_id): mixed case, accented words,
    * a URL and an email address, doubled spaces. Both engines build the
    * identical messy string and normalize it, so the driver gate
    * exercises every real code path (case folding, accent folding,
    * regex scrubs, collapse) rather than vacuously passing on
    * already-clean text.
    */
  def q78NormalizeText(s: SparkSession, d: String): DataFrame = {
    import graft.functions.expressions.TextExpressions.stripAccents
    val messy = concat(
      lit("  Héllo "), upper(substring(col("text"), 1, 40)),
      lit(" visit https://Ex.Ample.com/p/"), col("doc_id").cast("string"),
      lit("?q=1 mail Tést.Üser@Example.COM and çafé  dönér  "))
    val cleaned = trim(regexp_replace(
      regexp_replace(
        regexp_replace(stripAccents(lower(messy)), "https?://[^ ]+", ""),
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", ""),
      " +", " "))
    Tables.documents(s, d)
      .select(col("doc_id"), cleaned.as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
      .orderBy("doc_id")
  }

  /** Statistical LM quality score — the perplexity-proxy filter: each
    * document scores as the MEAN CORPUS BIGRAM CONDITIONAL PROBABILITY
    * of its bigrams, P(w2|w1) = count(w1 w2) / count(w1 ·) estimated
    * from the corpus itself. Fluent, corpus-typical text scores high;
    * token salad scores low — the classic n-gram stand-in for
    * model-based perplexity filtering.
    *
    * Exactness design (the q53 power-sum discipline applied to
    * probabilities): each per-occurrence probability is an exact
    * integral micro-prob `(c_bg * 1e6) div c_prefix` (true integer
    * division, mirroring DuckDB's `//` — floating division + floor
    * would round differently near integer boundaries), so the per-doc
    * sum is an exact integer and partition-order-invariant; the final
    * mean divides two exact numbers and rounds portably. Plan shape:
    * two hash aggs build the count tables, two hash joins score the
    * exploded bigrams, one keyed agg per doc — open-vocabulary tables
    * stay hash-joined, never broadcast-pinned.
    */
  def q83LmScore(s: SparkSession, d: String): DataFrame = {
    import graft.functions.expressions.TextExpressions.tokenShingles
    val docBg = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokenShingles(tokens(col("text")), 2)).as("bigram"))
    val bgCounts = docBg.groupBy("bigram").agg(count(lit(1)).as("c_bg"))
    val prefixCounts = bgCounts
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum("c_bg").as("c_prefix"))
    val perDoc = docBg
      .join(bgCounts, Seq("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(prefixCounts, Seq("w1"))
      .withColumn("micro", expr("(c_bg * 1000000) div c_prefix"))
      .groupBy("doc_id")
      .agg(sum("micro").as("sum_micro"), count(lit(1)).as("n_bigrams"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        // null for docs with no bigrams (< 2 tokens): no evidence ≠ low score
        r4(col("sum_micro").cast("double") / (lit(1000000.0) * col("n_bigrams")))
          .as("lm_score"))
      .orderBy("doc_id")
  }

  /** EXACT heavy hitters at BOUNDED memory — two-phase Misra-Gries:
    * tokens whose global frequency strictly exceeds N/k, without ever
    * holding the full vocabulary in aggregation state.
    *
    * Phase 1 (candidates): each partition runs a k-counter Misra-Gries
    * summary over its token stream — O(k) memory regardless of local
    * vocabulary. Guarantee chain making the final result EXACT, not
    * approximate: a globally-heavy token (freq > N/k) must be locally
    * heavy (freq_p > N_p/k) in at least one partition (else summing the
    * per-partition bounds caps its total at N/k), and Misra-Gries'
    * undercount is at most N_p/k, so every locally-heavy token survives
    * in that partition's summary. The union of per-partition summaries
    * is therefore a SUPERSET of the true heavy hitters, of size ≤
    * k × partitions — independent of vocabulary size.
    *
    * Phase 2 (exact recount): one hash agg over the token stream
    * restricted to candidates (broadcast semi-join), so aggregation
    * state is candidate-bounded, then the exact integer threshold
    * cnt · k > N filters the supersets' false positives. At 100 TB this
    * is the difference between agg state sized by an open web-scale
    * vocabulary and state sized by k × partitions; the output is
    * bit-identical to the naive full groupBy (which is the oracle).
    */
  def q84HeavyHitters(s: SparkSession, d: String, k: Int = 256): DataFrame = {
    import s.implicits._
    // both phases consume the row-local (token, cnt) pairs from the
    // codegen'd TokenCounts (the q26/q158 move) instead of the exploded
    // occurrence stream: the typed MG pass and the recount shuffle then
    // scale with docs × per-doc DISTINCT tokens, not token occurrences
    // (20.6M -> 3.1M rows at the 20x stress; measured 3.3 -> ~1 s). The
    // MG fold becomes the WEIGHTED Misra-Gries update (Berinde et al.
    // 2010): add the full per-doc count at once; on overflow subtract
    // d = min(incoming, min counter) everywhere, evict zeros, keep the
    // remainder — the superset guarantee (any token above W/(k+1)
    // survives the summary) is the weighted form's, and the exact
    // recount phase makes the final answer bit-identical either way.
    val tokCnts = Tables.documents(s, d)
      .select(explode(graft.functions.expressions.TextExpressions
        .tokenCounts(col("text"))).as("tc"))
      .select(col("tc.token").as("word"), col("tc.cnt").cast("long").as("cnt"))
    val candidates = tokCnts.as[(String, Long)].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { case (w, c) =>
        counters.get(w) match {
          case Some(x) => counters.update(w, x + c)
          case None if counters.size < k => counters.update(w, c)
          case None =>
            val d0 = math.min(c, counters.valuesIterator.min)
            counters.mapValuesInPlace((_, x) => x - d0)
            counters.filterInPlace((_, x) => x > 0)
            if (c - d0 > 0) counters.update(w, c - d0)
        }
      }
      counters.keysIterator
    }.toDF("word").distinct()
    // N without a third pass: per-row token counts summed row-local
    // (identical value to count over the exploded stream)
    val totals = Tables.documents(s, d)
      .agg(sum(size(tokens(col("text"))).cast("long")).as("n_total"))
    tokCnts.join(broadcast(candidates), Seq("word"), "left_semi")
      .groupBy("word").agg(sum("cnt").as("cnt"))
      .crossJoin(broadcast(totals))
      .filter(col("cnt") * lit(k.toLong) > col("n_total"))
      .select("word", "cnt")
      .orderBy("word")
  }

  /** Per-source DISTRIBUTION DRIFT: exact total-variation distance
    * between each source's token distribution and the whole-corpus
    * distribution, TVD(s) = ½ Σ_t |o_st/n_s − c_t/N| — the monitoring
    * metric mixture curation watches (a source drifting from the corpus
    * profile gets re-weighted or investigated).
    *
    * Exactness: multiply through by the per-source common denominator
    * n_s·N, so every |o_st·N − c_t·n_s| term is an exact integer and
    * the sum is partition-order-invariant; one division + portable
    * rounding at the end. Tokens ABSENT from a source still contribute
    * (|0 − c_t·n_s| = c_t·n_s) without materializing the source×vocab
    * grid: Σ_t |…| = Σ_{observed} (|o·N − c·n_s| − c·n_s) + n_s·N —
    * the absent-token mass has the closed form n_s·N. Long arithmetic
    * is exact to ~10^18 intermediate products (fixture scales are
    * ≤ 10^14); a true 100 TB corpus would lift the same expressions to
    * DECIMAL(38,0). Plan: two hash aggs, two hash joins, a single-row
    * totals cross-join (allowlisted like q26/q49/q84).
    */
  def q85SourceDrift(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
    val ost = tok.groupBy("source", "word").agg(count(lit(1)).as("o"))
    val ct = ost.groupBy("word").agg(sum("o").as("c"))
    val ns = ost.groupBy("source").agg(sum("o").as("n_s"))
    val totals = ct.agg(sum("c").as("n_total"))
    ost.join(ct, Seq("word")).join(ns, Seq("source"))
      .crossJoin(broadcast(totals))
      .withColumn("term",
        abs(col("o") * col("n_total") - col("c") * col("n_s"))
          - col("c") * col("n_s"))
      .groupBy("source", "n_s", "n_total")
      .agg(sum("term").as("obs_sum"))
      .select(col("source"), col("n_s").as("n_tokens"),
        r4((col("obs_sum") + col("n_s") * col("n_total")).cast("double")
          / (lit(2.0) * col("n_s") * col("n_total"))).as("tvd"))
      .orderBy("source")
  }

  /** Heuristic language ID: marker-lexicon scoring with deterministic
    * argmax (see TextFunctions.LangMarkers); reports predicted vs actual.
    */
  def q23LangId(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).withColumn("toks", tokens(col("text")))
    val scored = LangMarkers.foldLeft(base) { case (df, (lang, markers)) =>
      df.withColumn(s"score_$lang", markerScore(col("toks"), markers))
    }
    val scores = LangMarkers.map { case (lang, _) => lang -> col(s"score_$lang") }
    scored
      .select(
        Seq(col("doc_id"), col("lang"), langPredict(scores).as("lang_pred")) ++
          LangMarkers.map { case (l, _) => col(s"score_$l") }: _*)
      .orderBy("doc_id")
  }

  /** Document fingerprints: content hash (md5) + order-sensitive rolling
    * hash over the token sequence (detects reorderings md5 alone would
    * miss only if text differs — the rolling hash pins token ORDER into
    * the fingerprint with cheap integer math).
    */
  def q24Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        md5(col("text")).as("content_md5"),
        rollingFingerprint(col("toks")).as("rolling_fp"),
        size(col("toks")).cast("long").as("n_tokens"))
      .orderBy("doc_id")

  /** TF-IDF top-5 terms per document. IDF uses the BM25-style RATIONAL
    * form (N − df + 0.5)/(df + 0.5) instead of ln(N/df): exact integer
    * arithmetic plus two divisions, so both engines compute identical
    * bits (ln is libm-dependent and NOT portable). The df table is tiny
    * (vocabulary-sized) and broadcast.
    */
  def q26TfIdf(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tf, df and the ranking are pure functions of the text given the
    // corpus totals, so the exact-text contraction applies: terms
    // explode once per DISTINCT text, df weights by copy multiplicity
    // (= count of DOCS containing the term, exactly), n_total is the
    // copy-weighted doc count, and members inherit their rep's ranked
    // rows closed-form
    val (repDocs, membership) = textContraction(s, d)
    val docs = repDocs
    val nDocs = repDocs.agg(sum("copies").as("n_total"))
    // NOTE measured, not assumed: persisting the exploded frame to share
    // it between the df aggregation and the scoring join is SLOWER than
    // the double-compute at 20x stress scale (cache materialization of
    // ~3M string rows costs more than re-running the columnar explode).
    //
    // tf is computed ROW-LOCAL by the TokenCounts expression (one byte
    // scan per doc): the explode emits one row per DISTINCT term instead
    // of one per token occurrence, and the old repartition+groupBy tf
    // aggregation disappears entirely — the scoring path's only exchange
    // is the ranking window's partitionBy(doc_id), carrying
    // distinct-term rows. Measured at 20× stress: 24.4 s → see NOTES.md.
    val terms = docs
      .select(col("doc_id"), col("copies"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        explode(graft.functions.expressions.TextExpressions.tokenCounts(col("text")))
          .as("tc"))
      .select(col("doc_id"), col("copies"), col("n_tokens"),
        col("tc.token").as("token"), col("tc.cnt").cast("long").as("tf_cnt"))
    // document frequency: groupBy + broadcast join on a second pass of
    // the terms subtree (already (doc, token)-distinct, so count(1) =
    // count distinct docs; map-side combine shrinks the shuffle to
    // per-partition term counts). An earlier window-count-over-token
    // formulation avoided recomputing the subtree but serialized 3M rows
    // into vocabulary-count partitions at a 100k-doc stress run (39 s vs
    // seconds) — the vocabulary-sized df table broadcasts for free, so
    // pay the second pass instead
    val dfTable = terms.groupBy("token").agg(sum("copies").as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf6").desc, col("token"))
    terms
      .join(broadcast(dfTable), Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf6", r6(
        (col("tf_cnt").cast("double") / col("n_tokens"))
          * ((col("n_total") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))))
      // df (copy-weighted sum over rep-distinct (doc, token) rows)
      // matches the oracle's count(DISTINCT doc_id) exactly
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .withColumnRenamed("doc_id", "rep")
      .join(membership, Seq("rep"))
      .select(col("doc_id"), col("rk"), col("token"), col("tfidf6").as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  /** Global bigram frequencies, top 20 (token 2-gram shingles over the
    * ordered sequence — the n-gram statistics pass of a corpus profile).
    */
  def q27BigramFreq(s: SparkSession, d: String): DataFrame = {
    import graft.functions.expressions.TextExpressions.tokenShingles
    // no length filter needed: tokenShingles yields an empty array for
    // docs shorter than the shingle width (explode then emits nothing),
    // and the filter would re-evaluate the tokenize HOF per row
    Tables.documents(s, d)
      .select(explode(tokenShingles(tokens(col("text")), 2)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(20)
  }

  /** Collocation mining: bigrams scored by PMI-style LIFT,
    * P(ab)/(P(a)·P(b)) = c_ab·N_u² / (N_bg·c_a·c_b) — kept as a ratio of
    * counts (no log: libm log isn't engine-portable) with the
    * multiplication order mirrored in the oracle so both engines produce
    * identical double bits.
    *
    * Corpus totals come from ONE extra map-side pass over documents:
    * N_u = Σ len(toks) and N_bg = Σ max(len − 1, 0) are per-document
    * facts, so a single-row aggregate frame (the q26 `nDocs` pattern)
    * cross-joins them in. No no-key `Window.partitionBy()` anywhere — the
    * earlier global-window formulation funneled the whole (open, at
    * 100 TB unbounded) vocabulary through a single partition. The unigram
    * joins are plain hash joins, not broadcasts, for the same reason.
    */
  def q49Collocations(s: SparkSession, d: String, minCount: Int = 5, k: Int = 20): DataFrame = {
    import graft.functions.expressions.TextExpressions.tokenShingles
    // every statistic here is a corpus-level count — the exact-text
    // contraction turns copies into integer weights (explode once per
    // DISTINCT text; counts sum `copies`), values bit-identical
    val (docs, _) = textContraction(s, d)
    val totals = docs
      .select((size(tokens(col("text"))).cast("long") * col("copies")).as("n"),
        (greatest(size(tokens(col("text"))) - 1, lit(0)).cast("long")
          * col("copies")).as("nb"))
      .agg(sum("n").as("n_u"), sum("nb").as("n_bg"))
    val uni = docs.select(explode(tokens(col("text"))).as("w"), col("copies"))
      .groupBy("w").agg(sum("copies").as("c_u"))
    val bg = docs
      .select(explode(tokenShingles(tokens(col("text")), 2)).as("bigram"),
        col("copies"))
      .groupBy("bigram").agg(sum("copies").as("c_bg"))
    val u1 = uni.select(col("w").as("w1"), col("c_u").as("c_a"))
    val u2 = uni.select(col("w").as("w2"), col("c_u").as("c_b"))
    bg.filter(col("c_bg") >= minCount)
      .withColumn("w1", split_part(col("bigram"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("bigram"), lit(" "), lit(2)))
      .join(u1, Seq("w1"))
      .join(u2, Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("c_bg"),
        r6((col("c_bg").cast("double") * col("n_u") * col("n_u"))
          / (col("n_bg").cast("double") * col("c_a") * col("c_b"))).as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(k)
  }

  /** Subword-style token counting: alongside the whitespace word count,
    * a BPE-ish pre-tokenization pass (alphanumeric runs via regex — the
    * shape of a byte-pair-encoder's pre-split) with the resulting
    * chars-per-token compression ratio. Spark's `split` takes a Java
    * regex; the oracle uses DuckDB's regexp_split_to_array with the same
    * class-based pattern (identical semantics for this pattern family).
    */
  def q29RegexTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("n_chars"),
        tokenCount(col("text")).cast("long").as("n_words"),
        size(filter(split(col("text"), "[^a-z0-9]+", -1), t => t =!= lit("")))
          .cast("long").as("n_regex_tokens"))
      .withColumn("chars_per_token",
        r4(col("n_chars").cast("double") / col("n_regex_tokens")))
      .orderBy("doc_id")

  /** Sequence packing for LLM training: assign documents to fixed-
    * capacity context windows ("sequences") and report per-sequence fill.
    * Sharded greedy block packing — the distributed formulation: docs are
    * packed in doc_id order WITHIN a shard (shard = doc_id % nShards), so
    * each shard packs independently with one partition-local window pass.
    * A doc lands in the bin its preceding token count fills:
    * bin = floor(cum_before / capacity). Oversized docs spill past
    * capacity rather than split (count_oversize reports them) — the
    * document-preserving packing variant.
    *
    * At 100 TB: one shuffle on shard, windows bounded per shard; no
    * global cumulative sum (a no-key window) anywhere.
    */
  def q64PackSequences(s: SparkSession, d: String, capacity: Int = 256,
      nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % nShards).as("shard"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_before", sum("n_tokens").over(w) - col("n_tokens"))
      // integer division (div), never float floor(x/y): exact in both
      // engines, no double-rounding hazard
      .withColumn("seq_id", expr(s"cum_before div $capacity"))
      .groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens_used"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"),
        sum(when(col("n_tokens") > capacity, 1L).otherwise(0L)).as("count_oversize"))
      .orderBy("shard", "seq_id")
  }

  /** Curation funnel: the standard LLM-data quality gauntlet (language
    * keep-list → length window → stopword-ratio ceiling) with per-stage
    * survivor counts per source. One pass, conditional aggregation —
    * each stage is a cumulative AND of the previous gates, so the funnel
    * is monotone by construction. Embarrassingly parallel map + one
    * aggregation shuffle on source.
    */
  def q65CurationFunnel(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a")
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(stop.map(lit): _*))).cast("long")
    val g1 = col("lang").isin("en", "de", "fr")
    val g2 = g1 && nTok >= lit(10L) && nTok <= lit(5000L)
    // exact-integer comparison (10*n_stop <= 3*n_tokens ⇔ ratio <= 0.3):
    // no double division, so both engines agree bit-for-bit
    val g3 = g2 && (nStop * 10L <= nTok * 3L)
    Tables.documents(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(g1, 1L).otherwise(0L)).as("pass_lang"),
        sum(when(g2, 1L).otherwise(0L)).as("pass_len"),
        sum(when(g3, 1L).otherwise(0L)).as("pass_quality"))
      .orderBy("source")
  }

  /** Deterministic train/val/test split: assignment is a pure function
    * of the content hash (md5 of text, NOT of doc_id), so (a) it is
    * reproducible across runs/engines/partitionings, (b) exact
    * duplicates land in the SAME split — the leakage rule that
    * doc-id-based splits break when a corpus has dups. 90/5/5 via the
    * first two hex digits (256 buckets: <230 train, <243 val, rest
    * test). Pure map-side assignment + one aggregation shuffle.
    */
  def q67HashSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 1, 2), 16, 10).cast("long")
    val split = when(bucket < 230L, "train")
      .when(bucket < 243L, "val").otherwise("test")
    Tables.documents(s, d)
      .select(col("source"), split.as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "split")
  }

  /** Deterministic per-language stratified sampling — the data-MIXING
    * op: rebalance a corpus's language distribution by keeping each
    * language at a fixed rate, decided by a pure content-hash predicate
    * (reproducible across runs / engines / partitionings, like q67's
    * split; an independent hex window of the same md5 so the sampling
    * decision does not correlate with split assignment). Rates here
    * model downsampling the dominant language: en 25% (bucket < 64 of
    * 256), de/fr 50%, everything else kept whole. Pure map-side filter —
    * at 100 TB this is a scan with zero shuffle, and per-language rates
    * arrive as a tiny literal (production: a broadcast rates table).
    */
  def q72StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 3, 2), 16, 10).cast("long")
    val threshold = when(col("lang") === "en", 64L)
      .when(col("lang").isin("de", "fr"), 128L)
      .otherwise(256L)
    Tables.documents(s, d)
      .filter(bucket < threshold)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Per-source quality QUOTA selection — the curation step after q65's
    * pass/fail funnel: cap each source's contribution at `quota` docs,
    * keeping its highest-quality ones (rank on the 4-dp-rounded q22
    * quality score, doc_id tie-break, so the cut is deterministic and
    * cross-engine stable). One window partitioned by source —
    * WindowGroupLimit prunes each partition to the quota, no global
    * window, no shuffle beyond the source partitioning.
    */
  def q73QualityQuota(s: SparkSession, d: String, quota: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    tokenStats(s, d)
      .select(col("doc_id"), col("source"),
        qualityExpr(col("n_tokens"), col("n_distinct"), col("n_stop")).as("quality"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
      .select("source", "rk", "doc_id", "quality")
      .orderBy("source", "rk")
  }

  /** Benchmark DECONTAMINATION — flag training documents that share any
    * token 3-gram with the eval set (stand-in: doc_id % 100 == 0), the
    * overlap check every training pipeline runs before a corpus ships.
    * Shape: explode both sides to hashed shingles, LEFT SEMI join the
    * training side against the DISTINCT benchmark shingle set, distinct
    * the flagged ids. At 100 TB the benchmark side is eval-suite-sized
    * (bounded, tiny) → AQE broadcasts it and the corpus side never
    * shuffles; the training side's explode is the same one-md5-per-
    * shingle pass the LSH family uses. The n-gram width is the
    * conservative knob: production decontamination uses 8–13-gram
    * windows, same plan, longer shingles.
    */
  def q74Decontaminate(s: SparkSession, d: String): DataFrame = {
    // the flag is a pure function of (text, bench shingle set), so the
    // two-sided contraction applies (the q143 frames): screen reps,
    // expand flagged members closed-form
    val (g, membership) = benchSideContraction(s, d)
    val sh = g
      .select(col("doc_id"), col("is_bench"),
        explode(shingles3(tokens(col("text")))).as("sh"))
      .withColumn("h", md5(col("sh")))
    val bench = sh.filter(col("is_bench")).select("h").distinct()
    sh.filter(!col("is_bench"))
      .join(bench, Seq("h"), "left_semi")
      .select("doc_id").distinct()
      .withColumnRenamed("doc_id", "rep")
      .join(membership.filter(!col("is_bench")).select("rep", "doc_id"),
        Seq("rep"))
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** BLOOM-pre-filtered decontamination with exact verification — the
    * 100 TB shape of q74. The benchmark shingle set is eval-suite-sized
    * (bounded), so it compresses into a Bloom filter broadcast to every
    * executor; the corpus-side explode stream is pre-filtered by
    * `mightContain` BEFORE anything shuffles, cutting the join input
    * from every-shingle-in-the-corpus to (true hits + fpp·corpus). The
    * surviving sliver then exact-joins the real benchmark hash set, so
    * Bloom false positives are REMOVED and the result is exactly the
    * contaminated set — the filter changes the plan, never the answer.
    * This is the same move Spark's own runtime row-level filtering
    * makes (InjectRuntimeFilter's bloom on join keys), applied where
    * the optimizer can't see it: across the explode.
    *
    * Output is per-doc contamination intensity (n distinct overlapping
    * shingles), a strict superset of q74's flagged-id info: q74 answers
    * "which docs", q86 answers "how badly". The pre-filter UDF is
    * off-codegen by nature (sketch probe); it sits on the already-
    * codegen'd explode output and removes work downstream of itself.
    * Exactness is oracle-gated: the DuckDB SQL knows nothing about the
    * Bloom filter, so any false-positive leak or false-negative drop
    * breaks the hash match.
    */
  def q86BloomDecontaminate(s: SparkSession, d: String, fpp: Double = 0.03)
      : DataFrame = {
    // the eval-suite side: scanned eagerly twice (count + sketch build)
    // and once more lazily by the verify join — all three are jobs over
    // the BOUNDED side, and recompute-over-cache is this repo's
    // measured default (NOTES.md r1)
    // contracted like q74: intensity is a pure function of (text,
    // bench set) — screen reps, expand members closed-form
    val (g, membership) = benchSideContraction(s, d)
    val bench = benchShingleHashes(g.filter(col("is_bench")))
    contaminationScreen(g.filter(!col("is_bench")),
      bench, benchBloom(bench, fpp))
      .withColumnRenamed("doc_id", "rep")
      .join(membership.filter(!col("is_bench")).select("rep", "doc_id"),
        Seq("rep"))
      .select(col("doc_id"), col("n_contaminated_shingles"))
      .orderBy("doc_id")
  }

  /** Distinct hashed 3-shingles of a benchmark/eval doc set — ONE
    * definition of what "a benchmark shingle" is, consumed by the batch
    * screen ([[q86BloomDecontaminate]]) and the streaming index
    * ([[graft.streaming.StreamingOps.buildContaminationIndex]]); the
    * shingling matches q74's corpus side by construction.
    */
  def benchShingleHashes(bench: DataFrame): DataFrame =
    bench
      .select(explode(shingles3(tokens(col("text")))).as("sh"))
      .select(md5(col("sh")).as("h")).distinct()

  /** Bloom sketch over a hash frame as SERIALIZED BYTES, sized from the
    * TRUE distinct count (one tiny job over the eval-suite-sized side,
    * never the corpus). Built with Spark's own `BloomFilterAggregate`
    * over `xxhash64(h)` — the same sketch class the engine's runtime
    * row-group filtering uses — so the probe side can be the codegen'd
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * expression instead of a Scala UDF (which would break whole-stage
    * codegen on the q86 filter path; this retired the codebase's last
    * UDF). `bloom_filter_agg`/`might_contain` are not SQL-registered in
    * Spark 4.1.2 (they are optimizer-internal), so both go through the
    * Expression→Column bridge.
    */
  def benchBloom(hashes: DataFrame, fpp: Double): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val n = math.max(1L, hashes.count())
    val bits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col("h"))),
      Bridge.expression(lit(n)), Bridge.expression(lit(math.max(1L, bits))))
      .toAggregateExpression()
    hashes.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Core of the Bloom-pre-filtered contamination screen, shared by
    * [[q86BloomDecontaminate]] (whole-corpus batch) and
    * [[graft.streaming.StreamingOps]]' ingest-time screen (per
    * micro-batch): explode `docs` (doc_id, text) to hashed 3-shingles,
    * pre-filter through the sketch (a plan literal probed by the
    * codegen'd `might_contain` expression — the filter stays inside the
    * WholeStageCodegen span), exact-verify against the real benchmark
    * hash set (false positives drop here), count distinct contaminated
    * shingles per doc. Exact regardless of the sketch's error rate; the
    * sketch only sizes the join input. Eval-suite sketches are small
    * (KBs), so carrying the bytes as a literal costs what a broadcast
    * would.
    */
  def contaminationScreen(docs: DataFrame, benchHashes: DataFrame,
      bloom: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val mightContain = Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bloom)),
      Bridge.expression(xxhash64(col("h")))))
    docs
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("sh"))
      .withColumn("h", md5(col("sh")))
      .filter(mightContain)                        // codegen'd sketch probe
      .join(benchHashes.select("h"), Seq("h"), "left_semi") // exact: drops FPs
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_contaminated_shingles"))
  }

  /** Intra-document REPETITION statistics — the Gopher-style repetition
    * filter: a document whose 3-gram shingles repeat heavily is
    * boilerplate/spam-shaped. Per doc: shingle count, distinct shingle
    * count, repetition ratio (1 − distinct/total as an exact rational,
    * 4 dp), and the filter flag at the 0.2 threshold via exact integer
    * cross-multiplication (5·distinct ≥ 4·total) so the cut is
    * bit-stable across engines. Entirely map-side array arithmetic —
    * no explode, no shuffle; at 100 TB this is a scan.
    */
  def q75Repetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), shingles3(tokens(col("text"))).as("sh"))
      .select(
        col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        size(array_distinct(col("sh"))).cast("long").as("n_distinct_shingles"))
      .select(
        col("doc_id"), col("n_shingles"), col("n_distinct_shingles"),
        when(col("n_shingles") > 0L,
          r4(lit(1.0) - col("n_distinct_shingles").cast("double")
            / col("n_shingles").cast("double")))
          .otherwise(lit(0.0)).as("rep_ratio"),
        (col("n_shingles") > 0L &&
          col("n_distinct_shingles") * 5L < col("n_shingles") * 4L)
          .as("is_repetitive"))
      .orderBy("doc_id")

  /** Deterministic EXACT-K holdout per group — the eval-set builder:
    * exactly `k` documents per language (fewer only if the group is
    * smaller), chosen by ranking a salted md5 of the doc id. Unlike the
    * rate-based samplers (q52 fraction-of-stream, q72 per-stratum
    * rates), the output SIZE is fixed per group — what a held-out eval
    * set needs — while staying reproducible and partition-layout-
    * independent (the hash orders documents, not their physical
    * placement; `df.sample` would change membership under repartition).
    * The per-group rank is a window top-k: WindowGroupLimit pushes the
    * k-cutoff below the sort, so each group carries k rows out of the
    * exchange, not the group.
    */
  def q99EvalHoldout(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("hk"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        md5(concat_ws("|", col("doc_id").cast("string"), lit("q99-holdout")))
          .as("hk"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k.toLong)
      .select("lang", "rank", "doc_id")
      .orderBy("lang", "rank")
  }

  /** Sliding-window token CHUNKING with overlap — the training-data
    * chunker that splits long documents into model-context-sized
    * pieces (window `W` tokens, stride `S` < W, so consecutive chunks
    * overlap by W−S tokens and no token is lost at a boundary). A
    * chunk starts at every multiple of S up to the last start that
    * still contributes tokens (start ≤ n−W+S−1); the final chunk is
    * short rather than padded, and a degenerate tail that would sit
    * entirely inside the previous chunk is never emitted. Per chunk:
    * (doc_id, chunk_id, start, chunk_len, first/last token — the
    * content witnesses the oracle hash-checks).
    *
    * Scale shape: ZERO shuffles — the chunk starts are generated
    * per-row (`sequence` + explode), everything else is array
    * indexing on the already-tokenized row. At 100 TB this is a pure
    * map over parquet row groups; the orderBy is presentation-only.
    */
  def q94ChunkOverlap(s: SparkSession, d: String, window: Int = 32,
      stride: Int = 24): DataFrame = {
    require(stride > 0 && window >= stride, "need 0 < stride <= window")
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .where(col("n_tokens") > 0L)
      .withColumn("start",
        explode(sequence(lit(0L),
          greatest(col("n_tokens") - lit((window - stride + 1).toLong),
            lit(0L)),
          lit(stride.toLong))))
      .withColumn("chunk_len",
        least(lit(window.toLong), col("n_tokens") - col("start")))
      .select(
        col("doc_id"),
        expr(s"start div $stride").as("chunk_id"),
        col("start").as("chunk_start"), col("chunk_len"),
        element_at(col("toks"), (col("start") + 1L).cast("int"))
          .as("first_token"),
        element_at(col("toks"), (col("start") + col("chunk_len")).cast("int"))
          .as("last_token"))
      .orderBy("doc_id", "chunk_id")
  }

  /** INVERTED INDEX with skew-safe posting blocks — the search-side
    * artifact a corpus engine feeds from the same tokenization as the
    * word count. Postings for a term are emitted in fixed-size BLOCKS
    * of `blockSize` doc ids (sorted within and across blocks by the
    * per-term row_number), never as one unbounded list: a stopword
    * with a billion postings at 100 TB becomes many bounded rows
    * instead of a single collect_list that OOMs its reducer — the
    * block is the unit a posting-list reader would range-scan anyway
    * (min_doc/max_doc per block are the skip pointers). `df` is the
    * term's total document frequency, computed on the block-level
    * frame (one window over rows that are already ~blockSize× smaller
    * than the postings).
    *
    * Plan shape: one exchange on `term` serves the row_number window,
    * the (term, block) aggregation (hash(term) co-locates every block
    * of a term) AND the df window — Catalyst reuses the partitioning
    * all the way down. Postings are emitted as a comma-joined string,
    * the portable wire shape for the oracle gate.
    */
  def q95InvertedIndex(s: SparkSession, d: String, blockSize: Int = 32,
      minDf: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posts = Tables.documents(s, d)
      // per-doc distinct at tokenize time: (doc_id × distinct terms) is
      // globally distinct already — no DISTINCT shuffle needed
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))
    val wOrd = Window.partitionBy("term").orderBy("doc_id")
    posts
      .withColumn("rn", row_number().over(wOrd).cast("long") - 1L)
      .withColumn("block", expr(s"rn div $blockSize"))
      .groupBy("term", "block")
      .agg(
        count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"),
        array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("postings"))
      .withColumn("df", sum("n_docs").over(Window.partitionBy("term")))
      .where(col("df") >= minDf.toLong)
      .select("term", "df", "block", "n_docs", "min_doc", "max_doc",
        "postings")
      .orderBy("term", "block")
  }

  /** The 24-bit hash-uniform of md5-hex column `h` (q105/q115's
    * shared digit extraction; SparkEntry.uDigitsSql is the oracle's
    * verbatim mirror — keep in lockstep). `instr` with a COLUMN needle
    * only exists on the SQL surface, so this is an expr.
    */
  private def hashUniform: org.apache.spark.sql.Column =
    (0 until 6).map { i =>
      (expr(s"instr('0123456789abcdef', substring(h, ${i + 1}, 1))").cast("long") - 1L) *
        (1L << (4 * (5 - i)))
    }.reduce(_ + _)

  /** Deterministic WEIGHTED sampling without replacement — sequential
    * Poisson / priority sampling (Ohlsson 1998; Duffield et al. 2007):
    * each doc gets priority u/w where u is a hash-derived uniform and
    * w its weight (token count), and the k smallest priorities are the
    * sample. Inclusion probability is approximately proportional to w,
    * so long docs are token-budget-representative — the corpus-mixing
    * cousin of q52's unweighted hash sample.
    *
    * Engine-portable determinism: u is built DIGIT BY DIGIT from the
    * first 6 hex chars of md5(doc_id) ([[hashUniform]] — no
    * engine-specific hex-to-int cast), and priority = u/w is ONE
    * IEEE division of exact integers, which every engine rounds
    * identically — no ln/pow (multi-ulp, libm-dependent) anywhere.
    * Plan shape: pure map-side pass → TakeOrderedAndProject (per-
    * partition k-heaps, k rows per partition to the driver — no global
    * sort, no full shuffle; at 1000 executors that is k·partitions
    * driver rows, fine for sample-sized k).
    */
  def q105WeightedSample(s: SparkSession, d: String, k: Int = 1000): DataFrame =
    Tables.documents(s, d)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("w", tokenCount(col("text")).cast("long"))
      .filter(col("w") > 0)
      .withColumn("priority", hashUniform.cast("double") / col("w"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("w"), r4(col("priority")).as("priority"))
      .orderBy("doc_id")

  /** PER-GROUP weighted sampling — q99's exact-k-per-group holdout
    * discipline with q105's sequential-Poisson priorities: the k
    * token-weighted-representative docs of EACH language, rank = the
    * per-group priority order. Same WindowGroupLimit shape as q99 (the
    * exchange carries ≤ k rows per group per map partition, never the
    * group), same layout-independent membership (priority is a pure
    * function of (doc_id, w)) — the auditable way to build balanced
    * per-language eval or mixing sets where long docs deserve
    * proportionally more selection mass.
    */
  def q115WeightedGroupSample(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy("lang")
      .orderBy(col("priority").asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("w", tokenCount(col("text")).cast("long"))
      .filter(col("w") > 0)
      .withColumn("priority", hashUniform.cast("double") / col("w"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k.toLong)
      .select(col("lang"), col("rank"), col("doc_id"), col("w"),
        r4(col("priority")).as("priority"))
      .orderBy("lang", "rank")
  }

  /** BPE merge-pair mining — the inner statistic of byte-pair-encoding
    * tokenizer training: frequency of each ADJACENT CHARACTER PAIR,
    * weighted by word frequency, computed over the DISTINCT word list
    * (the classic Sennrich et al. 2016 formulation: counts live on the
    * vocabulary, occurrences weight them). The top pair is the first
    * BPE merge; iterating = training. One vocabulary-sized groupBy then
    * a pair-sized groupBy — both orders of magnitude smaller than the
    * corpus, so the expensive explode happens exactly once (q20's).
    */
  def q106BpePairs(s: SparkSession, d: String, k: Int = 30): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("word")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
  }

  /** Per-document shingle NOVELTY — what fraction of a doc's distinct
    * 3-gram shingles appear in NO doc with a smaller id (its "first
    * sighting" share). The dataset-curation signal behind dedup-aware
    * corpus growth curves: bulk-duplicated content scores ~0, fresh
    * content ~1. Shares the hashed-3-shingle definition with the
    * q74/q86 decontamination family (one lockstep oracle CTE).
    *
    * Plan: per-doc-distinct shingles (distinct at generation — one
    * (doc_id,h) DISTINCT shuffle), unordered window min over h for the
    * first-sighting doc (no sort — min needs no ORDER BY), then a
    * doc_id re-aggregation. Three keyed shuffles, all linear in the
    * shingle count; no self-join, no quadratic pair space.
    */
  def q107ShingleNovelty(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("sh"))
      .select(col("doc_id"), md5(col("sh")).as("h"))
      .distinct()
    dist
      .withColumn("first_doc", min("doc_id").over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        r4(col("n_novel").cast("double") / col("n_shingles")).as("novelty"))
      .orderBy("doc_id")
  }

  /** CONTENT-DEFINED chunking of every document (the storage-dedup
    * counterpart of q94's fixed-stride chunking): a token ENDS a chunk
    * whenever its own hash lands in the boundary class (md5 first hex
    * digit ≡ 0 mod 8 → mean chunk ≈ 8 tokens, geometric). Because the
    * boundary decision depends ONLY on the token, chunk boundaries are
    * INSERTION-STABLE: edits re-chunk just the spliced region, and
    * every chunk after the next boundary hashes identically — which is
    * what makes chunk-level dedup survive boilerplate drift (q94's
    * fixed strides shift wholesale on a one-token insert; spec-proven
    * in TextDedupSimSpec).
    *
    * Plan: posexplode → map-side boundary flag → ONE per-doc window
    * prefix-sum (chunk ids) → (doc, chunk) aggregation whose state is
    * bounded by the geometric chunk length. All linear; shuffles key on
    * doc_id, so a 100 TB corpus spreads by document.
    */
  def contentChunksOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("f",
        when(ascii(substring(md5(col("tok")), 1, 1)) % 8 === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", coalesce(sum("f").over(w), lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_hash"))
  }

  // memoized, persisted chunk frame — q108 and q109 both start from the
  // same chunks, so the explode + window + agg subtree runs once per
  // (session, dir, fingerprint), same staleness discipline as
  // Dedup.lshSignatures. Scale honesty: unlike the signature frame
  // (#docs × bands rows), chunks are ~corpus/8 ROWS carrying md5 hashes
  // (~1/3 of corpus bytes) — at 100 TB this persists as a LANDED TABLE
  // (the production shape: chunk once, every dedup pass reads it), and
  // MEMORY_AND_DISK spills the in-session equivalent to local disk.
  private val chunkCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  private def contentChunks(s: SparkSession, d: String): DataFrame =
    chunkCache.synchronized {
      val fp = graft.core.Fingerprint.of(s, d, "documents")
      chunkCache.keys
        .filter(k => k._1 == s && k._2 == d && k._3 != fp)
        .foreach { stale =>
          chunkCache.remove(stale).foreach { df =>
            try df.unpersist() catch { case _: Throwable => () }
          }
        }
      chunkCache.getOrElseUpdate((s, d, fp),
        contentChunksOf(Tables.documents(s, d))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** Drop the memoized chunk frames (the chunk-side analog of
    * [[graft.ops.Dedup.invalidateSignatureCache]]; single lock, takes
    * no other).
    */
  def invalidateChunkCache(): Unit = chunkCache.synchronized {
    chunkCache.values.foreach { df =>
      try df.unpersist() catch { case _: Throwable => () }
    }
    chunkCache.clear()
  }

  def q108ContentChunks(s: SparkSession, d: String): DataFrame =
    contentChunks(s, d)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_hash")
      .orderBy("doc_id", "chunk_id")

  /** Boilerplate detection over [[contentChunksOf]]: chunks (≥ 3
    * tokens) that recur across documents — shared headers, footers,
    * license blocks, templated spans. The aggregation runs on chunk
    * HASHES (bounded rows, no text re-shuffle); the top slice is the
    * remove-list a curation pass subtracts before training.
    */
  def q109BoilerplateChunks(s: SparkSession, d: String, minDocs: Int = 2,
      k: Int = 20): DataFrame =
    contentChunks(s, d)
      .filter(col("n_tokens") >= 3L)
      .groupBy("chunk_hash")
      .agg(
        max("n_tokens").as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs.toLong)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("chunk_hash").asc)
      .limit(k)

  /** SKIP-GRAM co-occurrence (window ±2) — the word2vec training-pair
    * statistic, where q27/q49 are the adjacent-only (±1) case. Pairs
    * are generated with window `lead`s over one doc-keyed exchange —
    * never a positions self-join: each token pairs with at most two
    * successors, so the pair stream is ≤ 2× the token stream by
    * construction, and the backward directions are mirrors (the
    * unordered least/greatest pair counts both). cnt_adj splits out
    * the adjacent share, so lift-style scoring can separate bigram
    * collocation from loose co-occurrence downstream.
    */
  def q110SkipgramCooccur(s: SparkSession, d: String, k: Int = 30): DataFrame = {
    // pairs generated ROW-LOCAL: posexplode the token array but RETAIN
    // the array alongside each row, so a token's +1/+2 successors are
    // O(1) null-safe `get`s into the same array — no doc-keyed
    // exchange, no per-doc sort (the first cut's two `lead` windows
    // cost both), and no per-doc struct-array materialization (a
    // transform-then-explode variant measured 7.5 s at 20× against the
    // window shape's 3.1 — building the pair arrays is dearer than the
    // sort it saves). This shape's only exchange is the final
    // (w_a, w_b) partial-agg shuffle. `get`, not element_at: ANSI mode
    // throws on out-of-range element_at, get returns the null the
    // boundary filter expects.
    Tables.documents(s, d)
      .select(tokens(col("text")).as("ts"))
      .select(col("ts"), posexplode(col("ts")).as(Seq("pos", "w")))
      .select(col("w"), explode(array(
        struct(get(col("ts"), col("pos") + 1).as("c"), lit(1L).as("off")),
        struct(get(col("ts"), col("pos") + 2).as("c"), lit(2L).as("off")))).as("e"))
      .select(col("w"), col("e.c").as("c"), col("e.off").as("off"))
      .filter(col("c").isNotNull)
      .select(least(col("w"), col("c")).as("w_a"),
        greatest(col("w"), col("c")).as("w_b"), col("off"))
      .groupBy("w_a", "w_b")
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("off") === 1L, 1L).otherwise(0L)).as("cnt_adj"))
      .orderBy(col("cnt").desc, col("w_a").asc, col("w_b").asc)
      .limit(k)
  }

  /** Structured URL EXTRACTION — the provenance-parsing pass of a web
    * corpus (host for per-domain quotas, path for route analytics,
    * query params for tracking-stripping). The engine side uses
    * Spark's native `parse_url` (codegen'd, RFC-shaped); the oracle
    * re-derives the same fields with anchored regexes — two
    * INDEPENDENT parsers agreeing on every row is the gate. URLs are
    * deterministically constructed per doc (the fixtures carry no real
    * ones — q78's messy-text trick), which also pins the parse against
    * mixed-case hosts and multi-param query strings. Pure map-side
    * pass; the per-domain rollup is the only (tiny, host-keyed)
    * shuffle.
    */
  def q116UrlExtract(s: SparkSession, d: String): DataFrame = {
    val url = concat(
      lit("https://sub"), (col("doc_id") % 7).cast("string"),
      lit(".Example.com/p/"), col("doc_id").cast("string"),
      lit("/view?q="), (col("doc_id") % 13).cast("string"),
      lit("&lang="), col("lang"))
    Tables.documents(s, d)
      .withColumn("url", url)
      .select(
        col("doc_id"),
        lower(expr("parse_url(url, 'HOST')")).as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'q')").as("q_param"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"))
      .orderBy("doc_id")
  }

  /** The reference query in PURE SQL through the extension surface:
    * word count written as SQL text over the SQL-registered
    * `string_tokens` (GraftExtensions) — proof the custom-expression
    * SQL surface produces oracle-exact results end-to-end, not just
    * spec-level equality. Same dir-scoped view-name discipline as q98
    * (md5-derived suffix, concurrent Verify threads can't collide);
    * the oracle is q20's own text, so q20, this query, and the oracle
    * form a three-way agreement on the reference semantics.
    */
  def q117SqlWordCount(s: SparkSession, d: String): DataFrame = {
    val suffix = java.util.UUID
      .nameUUIDFromBytes(d.getBytes("UTF-8")).toString.take(8)
    val view = s"q117_documents_$suffix"
    Tables.documents(s, d).createOrReplaceTempView(view)
    s.sql(
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT explode(string_tokens(text)) AS word FROM $view)
         |GROUP BY word ORDER BY word""".stripMargin)
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson, Aiken 2003
    * — the MOSS algorithm): slide a window of `w` consecutive shingle
    * hashes over each document and select each window's minimum
    * (rightmost on hash ties), giving a position-aware fingerprint set
    * with the guarantee that any shared run of ≥ w+k−1 tokens between
    * two docs shares at least one selected fingerprint — the
    * local-similarity detector that whole-doc MinHash (q32) is blind
    * to (MinHash sees global resemblance; winnowing catches a single
    * plagiarized paragraph).
    *
    * The rightmost-min selection is ONE windowed `min` over an
    * engine-portable composite key: `h || '|' || lpad(BIG − pos)` —
    * lexicographic min = smallest hash, ties to the LARGEST position
    * (inverted zero-padded offset). No argmin window-over-window, no
    * struct-ordering semantics to disagree on. One doc-keyed exchange;
    * the DISTINCT collapses the ~w duplicate selections per window
    * run. Fingerprint density ≈ 2/(w+1) of the shingle stream.
    */
  /** The winnow selection core: distinct per-window composite-key
    * minima `(doc_id, mk)` — `mk` encodes (hash, inverted position),
    * so this distinct IS the fingerprint set. q118 decorates it for
    * presentation; q119 projects just the hash.
    */
  private def winnowSelections(docs: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    docs
      .select(col("doc_id"), posexplode(shingles3(tokens(col("text")))).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos"), md5(col("sh")).as("h"))
      .withColumn("k",
        concat(col("h"), lit("|"),
          lpad((lit(999999999999L) - col("pos")).cast("string"), 12, "0")))
      .select(col("doc_id"), col("pos"), min("k").over(win).as("mk"))
      // STRICT winnowing (Schleimer et al. §4): select only from FULL
      // w-windows — positions 0..w-2 see a truncated leading window and
      // would emit extra fingerprints the algorithm doesn't define. A
      // doc with fewer than w shingles selects nothing, which is the
      // spec: the detection guarantee only covers runs ≥ w+k−1 tokens.
      .where(col("pos") >= lit((w - 1).toLong))
      .select(col("doc_id"), col("mk"))
      .distinct()
  }

  def q118WinnowFingerprints(s: SparkSession, d: String, w: Int = 4): DataFrame = {
    // same exact-dup contraction as q119: winnow the distinct-text
    // reps once, replicate to members by the content-hash membership
    // join (selection is a function of content alone, so a member's
    // set IS its rep's — positions included, since identical text has
    // identical shingle positions)
    val hashes = graft.ops.Dedup.contentHashes(s, d)
    val reps = hashes.groupBy("h").agg(min("doc_id").as("rep"))
    val membership = hashes.join(reps, Seq("h"))
      .select(col("doc_id"), col("rep"))
    val repDocs = Tables.documents(s, d)
      .join(membership.filter(col("doc_id") === col("rep"))
        .select("doc_id"), Seq("doc_id"))
    winnowSelections(repDocs, w)
      .select(col("doc_id").as("rep"),
        (lit(999999999999L) - expr("split_part(mk, '|', 2)").cast("long")).as("sel_pos"),
        expr("split_part(mk, '|', 1)").as("sel_h"))
      .join(membership, Seq("rep"))
      .select(col("doc_id"), col("sel_pos"), col("sel_h"))
      .orderBy("doc_id", "sel_pos")
  }

  /** Winnow-fingerprint SHARING pairs — MOSS's actual report: doc
    * pairs ranked by how many distinct winnowed fingerprints they
    * share (local overlap evidence; `minShared` prunes singleton-hash
    * coincidences). Candidate generation is an equality join on the
    * fingerprint hash — the winnowed stream is ~2/(w+1) of the shingle
    * stream, so this joins a DENSITY-REDUCED key space (the same
    * bucket-join shape as LSH, never all-pairs; a boilerplate hash
    * shared by m docs contributes C(m,2) pairs, the same blow-up
    * consideration the LSH family documents).
    */
  def q119WinnowPairs(s: SparkSession, d: String, w: Int = 4,
      minShared: Int = 2): DataFrame = {
    // EXACT-DUP CONTRACTION first — the q102 move, valid for the same
    // reason: fingerprints are a function of content alone, so every
    // member of a content-hash group carries the rep's exact set. On a
    // dup-heavy corpus the naive fingerprint self-join pays m² joins
    // per m-member group against an m-times-replicated hash space
    // (MEASURED: 22.5 s at the 20× stress corpus; contracted: the
    // rep-level join runs on the distinct-text corpus). The doc-pair
    // OUTPUT is still quadratic per group — that is the answer's own
    // size — but it is produced by closed-form membership expansion,
    // never by joining replicated fingerprints.
    val hashes = graft.ops.Dedup.contentHashes(s, d)
    val reps = hashes.groupBy("h").agg(min("doc_id").as("rep"))
    val membership = hashes.join(reps, Seq("h"))
      .select(col("doc_id"), col("rep"))
    val repDocs = Tables.documents(s, d)
      .join(membership.filter(col("doc_id") === col("rep"))
        .select("doc_id"), Seq("doc_id"))
    val fp = winnowSelections(repDocs, w)
      .select(col("doc_id").as("rep"), expr("split_part(mk, '|', 1)").as("sel_h"))
      .distinct()
    val a = fp.select(col("rep").as("rep_a"), col("sel_h"))
    val b = fp.select(col("rep").as("rep_b"), col("sel_h"))
    // rep_a == rep_b rows carry |fp(group)| — the within-group count
    val repShared = a.join(b, Seq("sel_h"))
      .filter(col("rep_a") <= col("rep_b"))
      .groupBy("rep_a", "rep_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared.toLong)
    // expand to doc pairs: a cross-group member pair appears exactly
    // once (each member binds only its group's side); within-group
    // cross products need the doc_a < doc_b half
    repShared
      .join(membership.select(col("rep").as("rep_a"), col("doc_id").as("doc_a")),
        Seq("rep_a"))
      .join(membership.select(col("rep").as("rep_b"), col("doc_id").as("doc_b")),
        Seq("rep_b"))
      .filter(col("rep_a") =!= col("rep_b") || col("doc_a") < col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("n_shared"))
      .orderBy("doc_a", "doc_b")
  }

  /** VOCABULARY GROWTH curve (the Heaps'-law probe): distinct-token
    * count after each decile of the corpus in doc_id order — the
    * curve that says whether more data still buys new vocabulary
    * (sub-linear growth) or the corpus is saturating (plateau), the
    * standard scaling-decision diagnostic. Computed WITHOUT rescanning
    * per prefix: each token's FIRST-SIGHTING doc (min doc_id — q107's
    * trick) lands in a decile of the ID RANGE (pure integer arithmetic
    * off one broadcast min/max row — no global rank window, which the
    * PlanSpec gate bans repo-wide; with non-dense ids the x-axis is
    * id-range share rather than exact doc count, same curve shape),
    * tokens-per-decile aggregate to ten rows, and a 10-row running sum
    * (a literal triangular equality join — window-free) yields the
    * curve. One token-keyed shuffle regardless of curve resolution.
    */
  def q120VocabGrowth(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bounds = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    val firstSeen = docs
      .select(explode(tokens(col("text"))).as("tok"), col("doc_id"))
      .groupBy("tok").agg(min("doc_id").as("doc_id"))
      .crossJoin(broadcast(bounds))
      .withColumn("decile",
        least(lit(10L),
          expr("(doc_id - lo) * 10 div (hi - lo + 1)") + 1L))
    val counts = firstSeen
      .groupBy("decile")
      .agg(count(lit(1)).as("n_new_tokens"))
    // a TOTAL ten-row curve (saturated deciles emit 0, not a gap)
    val curve = s.range(1, 11).toDF("decile")
      .join(counts, Seq("decile"), "left")
      .withColumn("n_new_tokens", coalesce(col("n_new_tokens"), lit(0L)))
    // cumsum WITHOUT a window: a constant-key window over the ten-row
    // frame would be harmless in fact, but Catalyst folds the constant
    // partition key away and plans a genuine no-key WindowExec — which
    // the repo-wide PlanSpec gate bans with no exceptions. A literal
    // 55-row triangular (decile, src_decile ≤ decile) table joined on
    // equality gives the same running sum as broadcast hash joins.
    import s.implicits._
    val tri = (1 to 10).flatMap(i => (1 to i).map(j => (i.toLong, j.toLong)))
      .toDF("decile", "src_decile")
    tri
      .join(curve.select(col("decile").as("src_decile"),
        col("n_new_tokens")), Seq("src_decile"))
      .groupBy("decile")
      .agg(
        sum(when(col("src_decile") === col("decile"), col("n_new_tokens"))
          .otherwise(lit(0L))).as("n_new_tokens"),
        sum("n_new_tokens").as("cum_vocab"))
      .orderBy("decile")
  }

  /** Corpus statistics per source: document counts, char sums, token
    * means, language diversity.
    */
  def q25SourceStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tokens", tokenCount(col("text")).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        r4(sum("n_tokens").cast("double") / count(lit(1))).as("avg_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("source")

  /** Duplicate n-gram SPAN coverage — the per-position diagnostic behind
    * EXACT SUBSTRING deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", at n-gram rather than
    * suffix-array granularity): an 8-token gram is DUPLICATED when it
    * occurs in ≥ 2 distinct documents; a document reports how many of
    * its gram start positions are duplicated (`n_dup` / `dup_frac`) and
    * its longest consecutive duplicated streak (`max_run` — a shared
    * substring of max_run + 7 tokens, the thing substring dedup would
    * cut). Documents shorter than 8 tokens carry no grams and are
    * excluded, mirrored by the oracle.
    *
    * Plan shape at 100 TB: one posexplode of gram starts (corpus-linear,
    * grams carried as md5 hashes — bounded width regardless of n), one
    * keyed groupBy on the gram hash for the cross-doc test, one
    * LEFT SEMI join back on the hash (never a pair space — a gram
    * shared by k docs costs k join rows, not k²), and a per-doc window
    * for the gaps-and-islands streak. Every shuffle is keyed on h or
    * doc_id.
    */
  def q122DupNgramSpans(s: SparkSession, d: String, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // EXACT-TEXT CONTRACTION ([[textContraction]], plan-only — the spec
    // pins this against the un-contracted formulation on a dup-heavy
    // corpus): grams explode once per DISTINCT text; the cross-doc
    // distinct-doc count sees a rep's copies as the distinct docs they
    // are (sum of copies over distinct reps containing the gram);
    // members inherit the rep's row. Measured 9.0 → ~1 s at the 20×
    // dup-heavy stress corpus.
    val (repDocs, membership) = textContraction(s, d)
    val grams = repDocs
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("ts")) - n),
          i => md5(array_join(slice(col("ts"), i + 1, lit(n)), " "))))
          .as(Seq("pos", "h")))
    val dupGrams = grams
      .join(repDocs.select("doc_id", "copies"), Seq("doc_id"))
      .select("h", "doc_id", "copies").distinct()
      .groupBy("h").agg(sum("copies").as("nd"))
      .filter(col("nd") >= 2)
      .select("h")
    // gaps-and-islands over the duplicated positions only: consecutive
    // positions share (pos - row_number) within a doc
    val runs = grams.join(dupGrams, Seq("h"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id")
      .agg(sum("run").as("n_dup"), max("run").as("max_run"))
    grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id").as("rep"), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("max_run"), lit(0L)).as("max_run"),
        r4(coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_grams"))
          .as("dup_frac"))
      .join(membership, Seq("rep"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"), col("max_run"),
        col("dup_frac"))
      .orderBy("doc_id")
  }

  /** Pairwise SOURCE OVERLAP matrix — corpus-composition diagnostics:
    * for every unordered source pair, the exact Jaccard similarity of
    * their DISTINCT 3-shingle sets (the same hashed-shingle definition
    * as the q74/q86/q107 decontamination family). The mixing-time
    * question this answers — "which feeds are near-copies of each
    * other?" — is what decides whether two sources should share a dedup
    * pass before training.
    *
    * Plan shape at 100 TB: distinct (source, h) is one keyed shuffle
    * bounded by corpus shingle volume; the pair counts come from a
    * self-EQUALITY join on h whose per-key fan-out is bounded by
    * #sources² (a constant ~190 at 20 sources — NOT corpus-sized), and
    * the final agg has ≤ C(#sources, 2) groups. The size frame is
    * #sources rows — broadcast.
    */
  def q123SourceOverlap(s: SparkSession, d: String): DataFrame = {
    // distinct-text-per-source pre-pass: the output is built from
    // DISTINCT (source, shingle) sets, so exact copies within a source
    // contribute nothing — dedup the (source, text) pairs BEFORE the
    // shingle explode and the dup-heavy corpus pays reps, not copies
    // (exact by the distinct semantics; measured 5.3 -> ~1 s at 20x)
    val sh = Tables.documents(s, d)
      .select(col("source"), col("text")).distinct()
      .select(col("source"), explode(shingles3(tokens(col("text")))).as("sh"))
      .select(col("source"), md5(col("sh")).as("h"))
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("source").as("s1"), col("h"))
      .join(sh.select(col("source").as("s2"), col("h")), Seq("h"))
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("s1"), col("sz").as("sz1"))), Seq("s1"))
      .join(broadcast(sizes.select(col("source").as("s2"), col("sz").as("sz2"))), Seq("s2"))
      .select(col("s1"), col("s2"), col("inter"),
        r6(col("inter").cast("double")
          / (col("sz1") + col("sz2") - col("inter")).cast("double")).as("jaccard"))
      .orderBy("s1", "s2")
  }

  /** Temperature-weighted source MIXING — the training-mix assembly
    * step (multinomial sampling with exponent α, Conneau & Lample 2019
    * / GPT-3-style corpus weighting) at α = 1/2: per-source quota
    * ∝ √count, then a deterministic hash-ranked draw of exactly that
    * quota from each source. Up-weights small high-value sources
    * relative to proportional sampling without letting any source
    * dominate.
    *
    * Determinism: the ONLY floating-point steps are sqrt (correctly
    * rounded by IEEE 754 on every engine) and one multiply by 1e6,
    * floored to micro-unit BIGINT weights map-side; quota = N·w div Σw
    * is exact integer arithmetic, and the draw ranks on md5 — no RNG,
    * no platform drift. Quotas under-fill by < #sources rows (floor),
    * which is the documented contract (exact-N would need largest-
    * remainder allocation — a 20-row driver-side fixup at any scale).
    *
    * Plan shape at 100 TB: the weight/quota frame is #sources rows
    * (broadcast); the draw rank is [[ScalarSuites.groupedRank]] — one
    * range-partitioned sort on (source, hk, doc_id) with executor-
    * bounded partitions, so a dominant source never lands on a single
    * task (the `Window.partitionBy("source")` hazard PlanSpec bans;
    * the quota is a per-source COLUMN, so `InferWindowGroupLimit`
    * cannot rescue a window formulation here).
    */
  def q124MixTemperature(s: SparkSession, d: String, target: Int = 200): DataFrame = {
    val w = Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("cnt"))
      .withColumn("w",
        floor(sqrt(col("cnt").cast("double")) * lit(1e6)).cast("long"))
    val tot = w.agg(sum("w").as("wtot"))
    val quota = w.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"$target * w div wtot"))
      .select("source", "cnt", "quota")
    val draw = Tables.documents(s, d)
      .select(col("source"), col("doc_id"))
      .withColumn("hk", md5(concat(col("doc_id").cast("string"), lit("-mix"))))
    ScalarSuites.groupedRank(draw, Seq("source"),
        Seq(col("hk"), col("doc_id")), rankCol = "rk")
      .join(broadcast(quota), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("doc_id"), col("rk"), col("cnt"), col("quota"))
      .orderBy("source", "rk")
  }

  /** C4/Gopher-style quality RULE battery (Raffel et al. 2020, Rae et
    * al. 2021): each document gets a boolean verdict per rule plus the
    * conjunction — the form a production filter pipeline consumes
    * (filter on `pass`, audit the per-rule booleans). Rules, all
    * exact-integer comparisons (cross-multiplied — no float thresholds,
    * so the booleans are bit-stable on any engine):
    *
    *  - `r_len`:      10 ≤ n_tokens ≤ 1000 (document length band)
    *  - `r_word_len`: 2·n ≤ sum_chars ≤ 8·n (mean token length in [2,8])
    *  - `r_stop`:     ≥ 1 stopword occurrence (C4's "has English glue")
    *  - `r_ttr`:      10·n_distinct ≥ 3·n (type-token ratio ≥ 0.3 —
    *                  the Gopher repetition gate's set-level twin)
    *
    * Shares [[tokenStats]] with q22/q73/q77 — one stop list, one token
    * definition, map-side only (no shuffle; at 100 TB this is a pure
    * scan predicate that fuses into whole-stage codegen).
    */
  def q125QualityRules(s: SparkSession, d: String): DataFrame =
    tokenStats(s, d)
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") >= 10L && col("n_tokens") <= 1000L).as("r_len"),
        (col("sum_chars") >= lit(2L) * col("n_tokens")
          && col("sum_chars") <= lit(8L) * col("n_tokens")).as("r_word_len"),
        (col("n_stop") >= 1L).as("r_stop"),
        (lit(10L) * col("n_distinct") >= lit(3L) * col("n_tokens")).as("r_ttr"))
      .withColumn("pass",
        col("r_len") && col("r_word_len") && col("r_stop") && col("r_ttr"))
      .orderBy("doc_id")

  /** The q127 query workload — a fixed phrase set, the bounded "query
    * side" of the retrieval op (SparkEntry's oracle embeds the same
    * literals; keep in lockstep).
    */
  val DefaultPhrases: Seq[String] = Seq(
    "hash join", "table scan", "sort merge", "stream window", "the table")

  /** PHRASE retrieval with tf ranking — the exact-match search op a
    * corpus index serves: for each query phrase (a token bigram), the
    * top-k documents ranked by PHRASE term frequency (occurrence count
    * of the exact adjacent pair), ties broken by doc_id. This is the
    * positional-index capability q95's posting blocks feed in a real
    * engine — "docs where these tokens are ADJACENT", which bag-of-words
    * retrieval (q26 TF-IDF top-k) structurally cannot ask.
    *
    * Entirely integer arithmetic (tf counts + rank) — nothing to round.
    *
    * Plan shape at 100 TB: adjacency is computed IN-ROW ([[graft
    * .functions.expressions.TextExpressions.tokenShingles]] over the
    * token array — no positions explode, no self-join on pos+1), and
    * the `isin` filter on the query vocabulary cuts the exploded stream
    * to query-matched occurrences BEFORE the one (phrase, doc) keyed
    * shuffle — the shuffle is sized by matches, not by corpus tokens.
    * The per-phrase top-k is a WindowGroupLimit (k rows per phrase per
    * map partition reach the exchange, never the full posting list).
    */
  def q127PhraseTopk(s: SparkSession, d: String,
      phrases: Seq[String] = DefaultPhrases, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.expressions.TextExpressions.tokenShingles
    val w = Window.partitionBy("phrase")
      .orderBy(col("tf").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(tokenShingles(tokens(col("text")), 2)).as("phrase"))
      .filter(col("phrase").isin(phrases: _*))
      .groupBy("phrase", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k.toLong)
      .select("phrase", "rk", "doc_id", "tf")
      .orderBy("phrase", "rk")
  }

  /** TOKEN-BUDGET mixing — the other half of the q124 training-mix
    * assembly: where q124 draws a DOC quota per source, this fills a
    * TOKEN budget per source (what the training run actually consumes),
    * taking docs in the deterministic md5-ranked order until the
    * running token total reaches the budget. A doc is taken iff the
    * budget is not yet exhausted BEFORE it (`cum_before < budget`), so
    * the crossing doc is included and every source covers ≥ budget
    * tokens (unless the source itself is smaller) — the standard
    * greedy budget fill.
    *
    * Exactness: token counts and running sums are BIGINT; membership is
    * one integer comparison. The inclusive running sum is computed over
    * the unique (hk, doc_id) order (the oracle's explicit ROWS-frame),
    * so engine default-frame differences (RANGE vs ROWS) can never
    * matter.
    *
    * Plan shape at 100 TB: rank AND running sum ride one
    * [[ScalarSuites.groupedRank]] pass — a single range-partitioned
    * sort on (source, hk, doc_id) with executor-bounded partitions and
    * per-group offsets (count + token prefix) from its lightweight
    * count pass; no joins at all — cheaper than q124 (no quota frame),
    * and a dominant source never sorts on one task (the
    * `Window.partitionBy("source")` hazard PlanSpec bans; a running
    * sum has no `InferWindowGroupLimit` rescue at all).
    */
  def q128TokenBudgetMix(s: SparkSession, d: String,
      budget: Long = 1000L): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        md5(concat(col("doc_id").cast("string"), lit("-budget"))).as("hk"))
    ScalarSuites.groupedRank(base, Seq("source"),
        Seq(col("hk"), col("doc_id")), rankCol = "rk",
        cumSums = Seq("n_tokens" -> "cum_tokens"))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("source", "rk", "doc_id", "n_tokens", "cum_tokens")
      .orderBy("source", "rk")
  }

  /** BIGRAM LM TABLE — the count-based language-model ARTIFACT whose
    * per-document consumption is q83's perplexity-proxy score: for each
    * prefix token with corpus support ≥ `minPrefix` bigram occurrences,
    * the top-`k` continuations by conditional probability
    * P(w2|w1) = c_bg / c_prefix, emitted as q83's exact integral
    * micro-prob (`c_bg·10⁶ div c_prefix` — true integer division, the
    * idiom DuckDB's `//` mirrors bit-for-bit). This is the first
    * Kneser-Ney-free n-gram table a filtering pipeline ships: q83
    * scores documents against exactly these statistics.
    *
    * Plan shape at 100 TB: one bigram-keyed agg (corpus-linear in, at
    * most vocabulary² rows out), the prefix totals via a second agg
    * OVER THE BIGRAM TABLE (vocabulary-sized input, not corpus), one
    * hash join on w1, and a per-prefix WindowGroupLimit top-k — every
    * post-scan operator is bounded by vocabulary, not corpus.
    */
  def q131BigramLm(s: SparkSession, d: String,
      minPrefix: Long = 50L, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.expressions.TextExpressions.tokenShingles
    // corpus-level counts: the exact-text contraction turns copies into
    // integer weights (the q49 move; values bit-identical)
    val (cdocs, _) = textContraction(s, d)
    val bg = cdocs
      .select(explode(tokenShingles(tokens(col("text")), 2)).as("bigram"),
        col("copies"))
      .groupBy("bigram").agg(sum("copies").as("c_bg"))
      .withColumn("w1", split_part(col("bigram"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("bigram"), lit(" "), lit(2)))
    val prefix = bg.groupBy("w1").agg(sum("c_bg").as("c_prefix"))
    val w = Window.partitionBy("w1").orderBy(col("c_bg").desc, col("w2"))
    bg.join(prefix, Seq("w1"))
      .filter(col("c_prefix") >= minPrefix)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k.toLong)
      .select(col("w1"), col("rk"), col("w2"), col("c_bg"), col("c_prefix"),
        expr("c_bg * 1000000L div c_prefix").as("micro_prob"))
      .orderBy("w1", "rk")
  }

  /** SIMPSON lexical diversity — the repetition-complementary quality
    * signal: per document, the probability two token draws (without
    * replacement intuition, computed with-replacement) differ,
    * 1 − Σ(cᵢ/n)² = (n² − Σcᵢ²)/n². Token salad scores near 1 − 1/V;
    * a one-word loop scores near 0. Unlike entropy (log — multi-ulp
    * libm, not engine-portable) this is EXACT integer arithmetic up to
    * one final division: n and Σcᵢ² are BIGINTs from the in-row
    * [[graft.functions.expressions.TextExpressions.tokenCounts]]
    * fold, so both engines divide identical integers.
    *
    * Plan shape: ZERO shuffles — tokenCounts yields per-distinct-token
    * (token, cnt) structs in-row; n, V and Σc² are array folds. At
    * 100 TB this is a pure scan, like q75/q125.
    */
  def q133SimpsonDiversity(s: SparkSession, d: String): DataFrame = {
    import graft.functions.expressions.TextExpressions.tokenCounts
    Tables.documents(s, d)
      .select(col("doc_id"), tokenCounts(col("text")).as("tc"))
      .select(col("doc_id"),
        expr("aggregate(tc, 0L, (acc, x) -> acc + x.cnt)").as("n_tokens"),
        size(col("tc")).cast("long").as("n_distinct"),
        expr("aggregate(tc, 0L, (acc, x) -> acc + CAST(x.cnt AS BIGINT) * x.cnt)")
          .as("sum_sq"))
      .filter(col("n_tokens") > 0L)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        r6((col("n_tokens") * col("n_tokens") - col("sum_sq")).cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double")).as("simpson"))
      .orderBy("doc_id")
  }

  /** Java-regex text of the three PII patterns, shared by engine and
    * spec; the oracle carries the identical TEXT (the patterns stay in
    * the common Java-regex/RE2 subset: literal classes, bounded
    * repetition, `\b` ASCII word boundaries — no lookaround, no
    * backreferences, which RE2 lacks).
    */
  val EmailRe: String = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  val Ipv4Re: String = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe: String = """\b555-\d{4}\b"""

  /** PII DETECTION + REDACTION — the scrubbing pass every training
    * corpus runs before release (emails, phone numbers, IP addresses →
    * typed placeholders), as a pure map-side regex battery. The gate is
    * unusually strong here: Spark matches with java.util.regex, DuckDB
    * with RE2 — two INDEPENDENT regex engines must agree on every match
    * count and on the md5 of every redacted string, so the patterns are
    * pinned to the semantics subset the engines share (see [[EmailRe]]).
    *
    * The fixture corpus carries no organic PII, so each doc gets a
    * deterministic contact block derived from doc_id (the q78/q116
    * constructed-content idiom) with VARIED multiplicity — a second
    * email every 3rd doc, no phone every 4th — so zero / one / many
    * matches per doc are all exercised, not just the happy path.
    * Redaction order (email → ip → phone) is part of the operator
    * contract; placeholders contain no digits, so later passes cannot
    * re-match inside earlier replacements. Plan: scan-only (regexes
    * fuse into whole-stage codegen); the only shuffle is the
    * presentation sort. At 100 TB this runs at parquet-read speed.
    */
  def q135PiiRedact(s: SparkSession, d: String): DataFrame = {
    val pii = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail"), (col("doc_id") % 5).cast("string"), lit(".com"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" cc admin"), (col("doc_id") % 7).cast("string"),
          lit("@ex.org"))).otherwise(lit("")),
      lit(" ip 10."), (col("doc_id") % 254).cast("string"),
      lit("."), (col("doc_id") % 97).cast("string"), lit(".7"),
      when(col("doc_id") % 4 =!= 1,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    Tables.documents(s, d)
      .select(col("doc_id"), pii.as("pii_text"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("pii_text"), lit(EmailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("pii_text"), lit(Ipv4Re), lit(0)))
          .cast("long").as("n_ipv4"),
        size(regexp_extract_all(col("pii_text"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phone"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("pii_text"), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>").as("redacted"))
      .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_phone"),
        length(col("redacted")).cast("long").as("n_chars_redacted"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** TOKENIZER FERTILITY per (lang, source) — bytes-per-token and
    * tokens-per-doc, the cost model every budget decision downstream
    * rests on (token budgets q128, quotas q124, packing q64 all count
    * tokens; storage and scan cost count bytes; fertility converts
    * between them, and a fertility outlier flags a tokenizer/content
    * mismatch — e.g. non-Latin text under a whitespace tokenizer).
    * Exact integer sums (byte lengths and token counts are BIGINTs)
    * with one final division each, q133's portability discipline.
    * Plan: one scan, one |lang×source|-keyed agg — nothing at corpus
    * cardinality crosses the wire.
    */
  def q138TokenFertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        expr("octet_length(text)").cast("long").as("n_bytes"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_bytes").as("n_bytes"),
        sum("n_toks").as("n_tokens"))
      .filter(col("n_tokens") > 0L)
      .select(col("lang"), col("source"), col("n_docs"), col("n_bytes"),
        col("n_tokens"),
        r6(col("n_bytes").cast("double") / col("n_tokens").cast("double"))
          .as("bytes_per_token"),
        r6(col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("tokens_per_doc"))
      .orderBy("lang", "source")

  /** CONTAMINATION SPANS (q143) — the severity companion to q74/q86:
    * those answer "which training docs touch the benchmark" (binary)
    * and "how many shingles overlap" (counts); this answers the
    * question an eval-integrity review actually asks — "what is the
    * LONGEST verbatim token run shared with a benchmark doc?" (the
    * published decontamination rule is a threshold on exactly that
    * run length — e.g. the 13-gram rule; GPT-3 appendix C).
    *
    * Seed-and-extend, exact: every shared 3-gram is a SEED at
    * (train position, bench position); a verbatim run of L ≥ 3 tokens
    * appears as L−2 consecutive seeds on ONE DIAGONAL (pos_t − pos_b
    * constant), so longest_run = max island length + 2 — exact for all
    * runs ≥ the gram width, which is the decontamination regime by
    * definition (sub-gram overlaps are below any rule's threshold).
    * Islands via the gaps-and-islands idiom (pos_t − row_number per
    * (pair, diag) — q112's move): within a diagonal, pos_t is unique
    * (same diag + same pos_t ⇒ same pos_b), so the island id is exact.
    *
    * Scale shape: the gram-hash equality join is q74's shape — the
    * bench side is eval-suite-sized, AQE broadcasts it and the corpus
    * side never shuffles; per-key fan-out is tf_train(g)·tf_bench(g),
    * bounded by in-doc gram repetition, and the islands window keys on
    * (train_doc, bench_doc, diag) — contamination-density-sized, never
    * corpus-sized. Production corpora additionally cap gram document
    * frequency on the bench side (STOP-GRAM GUARD, `benchDfCap`,
    * implemented in [[capBenchGrams]]) before seeding — a plan knob,
    * not a semantics change at any threshold ≥ the max bench gram df
    * (nothing dropped; spec-pinned), and a documented one-sided
    * approximation below it (dropped seeds only ever SPLIT or SHRINK
    * runs — n_seeds and longest_run are monotone non-increasing in the
    * cap, also spec-pinned — the direction a decontamination gate can
    * live with: ubiquitous stop-grams are exactly the runs the
    * published 13-gram rules ignore).
    *
    * q74 RECONCILIATION (spec-pinned): the distinct train docs here
    * are EXACTLY q74's flagged set — one shared gram is one seed.
    */
  def q143ContaminationSpans(s: SparkSession, d: String,
      benchDfCap: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // EXACT-TEXT CONTRACTION first (the q102/q118/q121 move, exact here
    // because spans are a function of the two texts alone): duplicate
    // copies — the norm on the corpora this op polices — would
    // otherwise re-run the seed join per copy PAIR (20 copies each side
    // ⇒ 400× the seeds for identical answers; measured 15.8 s at the
    // 20× stress corpus pre-contraction). Reps are per (side, text):
    // the same text appearing as both a bench doc and a train doc is
    // two different reps, so sides never mix.
    val (g, membership) = benchSideContraction(s, d)
    val repPairs = contaminationSpanCore(
      positionedGrams(g.filter(!col("is_bench")), "train_doc", "pos_t"),
      capBenchGrams(
        positionedGrams(g.filter(col("is_bench")), "bench_doc", "pos_b"),
        benchDfCap))
      .withColumnRenamed("train_doc", "train_rep")
      .withColumnRenamed("bench_doc", "bench_rep")
    // closed-form membership expansion: output size is the answer's own
    // size, never recomputation
    repPairs
      .join(membership.filter(!col("is_bench"))
        .select(col("rep").as("train_rep"), col("doc_id").as("train_doc")),
        Seq("train_rep"))
      .join(membership.filter(col("is_bench"))
        .select(col("rep").as("bench_rep"), col("doc_id").as("bench_doc")),
        Seq("bench_rep"))
      .select(col("train_doc"), col("bench_doc"), col("n_seeds"),
        col("longest_run"))
      .orderBy("train_doc", "bench_doc")
  }

  /** The bench/train-split exact-text contraction shared by q143 and
    * q152 (factored from q143's body, unchanged): reps per (side,
    * text) — the same text appearing as both a bench doc and a train
    * doc is two different reps, so sides never mix. Returns (g,
    * membership): the contracted doc frame (with `is_bench`) and the
    * (is_bench, doc_id, rep) expansion map.
    */
  // memoized like [[textContraction]]'s frames: FOUR queries consume
  // the bench-split contraction (q143, q152, q74, q86) — one build per
  // (session, dir, corpus version), both frames persisted.
  private val benchContractionCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), (DataFrame, DataFrame)]

  private def benchSideContraction(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    benchContractionCache.synchronized {
      val fp = graft.core.Fingerprint.of(s, d, "documents")
      benchContractionCache.keys
        .filter(k => k._1 == s && k._2 == d && k._3 != fp)
        .foreach { stale =>
          benchContractionCache.remove(stale).foreach { case (a, b) =>
            try { a.unpersist(); b.unpersist() } catch { case _: Throwable => () }
          }
        }
      benchContractionCache.getOrElseUpdate((s, d, fp), {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            (col("doc_id") % 100 === 0).as("is_bench"), md5(col("text")).as("h"))
        val reps = base.groupBy("is_bench", "h").agg(min("doc_id").as("rep"))
        val membership = base.select("is_bench", "h", "doc_id")
          .join(reps, Seq("is_bench", "h"))
          .select(col("is_bench"), col("doc_id"), col("rep"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val g = base.join(reps.select(col("rep").as("doc_id")), Seq("doc_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (g, membership)
      })
    }

  /** DECONTAMINATION REWRITE (q152) — the intervention the
    * contamination family exists to enable (q74/q86 detect, q143
    * measures, this REMOVES): cut every train-doc token run of
    * ≥ `minRun` tokens shared verbatim with any benchmark doc, and
    * report the rewritten doc as (n_kept, md5) — the published
    * n-gram-collision removal rule (GPT-3 appendix C uses 13-grams;
    * production corpora use that setting). The GATED default is
    * minRun = 4 because that is where the driver fixture has signal
    * (its contamination spans top out at 4 tokens; at 13 the gate
    * would certify an identity function — the q150 lesson): runs of
    * exactly 3 survive and runs of 4 are cut, so both regimes of the
    * threshold are exercised by the gate.
    *
    * Runs come from [[contaminationIslandRuns]] — the SAME seeds,
    * window, and islands q143 aggregates, so "what is a run" has one
    * definition — with run START positions; covered positions are the
    * exact interval union (q148's distinct-expansion move), and the
    * rewrite is the q149/q151 kernel. Same two-sided contraction and
    * scale shape as q143: bench side broadcast, train side never
    * shuffles for the seed join, islands window keyed on (pair, diag).
    */
  /** The decontamination-rewrite kernel over explicit frames — ONE
    * definition shared by batch [[q152DecontaminateRewrite]] (fed
    * contracted train reps) and the ingest twin
    * ([[graft.streaming.StreamingOps.decontaminateRewriteAtIngest]],
    * fed each micro-batch against the static bench gram index), so the
    * two surfaces cannot diverge on what gets cut. Returns (doc_id,
    * n_tokens, n_kept, kept_md5).
    */
  private[graft] def decontaminateRewriteCore(docs: DataFrame,
      benchGrams: DataFrame, minRun: Int): DataFrame = {
    val runs = contaminationIslandRuns(
      positionedGrams(docs, "train_doc", "pos_t"), benchGrams)
      .filter(col("run_grams") + lit(2L) >= lit(minRun.toLong))
    val covered = runs
      .select(col("train_doc").as("doc_id"),
        explode(sequence(col("start_t"), col("start_t") + col("run_grams") + 1L))
          .as("pos"))
      .distinct()
    finishRewrite(docs, keptRewrite(docPosToks(docs), covered))
      .select(col("rep").as("doc_id"), col("n_tokens"), col("n_kept"),
        col("kept_md5"))
  }

  def q152DecontaminateRewrite(s: SparkSession, d: String,
      minRun: Int = 4): DataFrame = {
    val (g, membership) = benchSideContraction(s, d)
    decontaminateRewriteCore(
      g.filter(!col("is_bench")),
      positionedGrams(g.filter(col("is_bench")), "bench_doc", "pos_b"),
      minRun)
      .withColumnRenamed("doc_id", "rep")
      .join(membership.filter(!col("is_bench")).select("rep", "doc_id"),
        Seq("rep"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"), col("kept_md5"))
      .orderBy("doc_id")
  }

  /** Positioned 3-gram hashes of a (doc_id, text) frame — (idCol,
    * posCol, h) — the seed coordinate space of [[q143ContaminationSpans]]
    * and its streaming twin.
    */
  private[graft] def positionedGrams(docs: DataFrame, idCol: String,
      posCol: String): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(shingles3(tokens(col("text")))).as(Seq("pos", "sh")))
      .select(col("doc_id").as(idCol), col("pos").cast("long").as(posCol),
        md5(col("sh")).as("h"))

  /** STOP-GRAM GUARD over a positioned bench gram frame (the q143
    * family's bench side): drop every gram hash whose bench DOCUMENT
    * frequency exceeds `dfCap` before seeding. Per-key seed fan-out is
    * tf_train(g)·tf_bench(g) summed over the gram's bench docs, so a
    * ubiquitous bench gram (boilerplate headers, license lines shared
    * by the whole eval suite) is the one fan-out risk in the seed
    * join; capping its df bounds that product at the source. The df
    * agg runs on the eval-suite-sized bench frame — never the corpus.
    * `Long.MaxValue` (the gated default) is the identity — the
    * `if` keeps the extra agg out of the default plan entirely.
    */
  private[graft] def capBenchGrams(bench: DataFrame, dfCap: Long): DataFrame =
    if (dfCap == Long.MaxValue) bench
    else bench.join(
      bench.groupBy("h").agg(countDistinct(col("bench_doc")).as("bdf"))
        .filter(col("bdf") <= dfCap).select("h"),
      Seq("h"))

  /** The seed-and-extend span measurement over explicit gram frames —
    * ONE definition shared by the batch q143 (which feeds it contracted
    * reps) and `StreamingOps.contaminationSpansAtIngest` (which feeds
    * it each micro-batch against the static bench index), so the two
    * surfaces cannot diverge on what a span is. Returns (train_doc,
    * bench_doc, n_seeds, longest_run).
    */
  private[graft] def contaminationSpanCore(train: DataFrame,
      bench: DataFrame): DataFrame =
    contaminationIslandRuns(train, bench)
      .groupBy("train_doc", "bench_doc")
      .agg(sum("run_grams").as("n_seeds"),
        (max("run_grams") + lit(2L)).as("longest_run"))

  /** The island (maximal diagonal run) frame under
    * [[contaminationSpanCore]], exposed for the q152 rewrite which
    * needs run START positions, not just lengths: one row per maximal
    * run of consecutive seeds on a (train, bench, diag) diagonal, with
    * `start_t` (first train token of the run) and `run_grams` (gram
    * count; token length = run_grams + 2). Same seeds, same window,
    * same islands — q143 aggregates this frame, so the two operators
    * share one definition of a run.
    */
  private[graft] def contaminationIslandRuns(train: DataFrame,
      bench: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seeds = train.join(bench, Seq("h"))
      .select(col("train_doc"), col("bench_doc"), col("pos_t"),
        (col("pos_t") - col("pos_b")).as("diag"))
    val w = Window.partitionBy("train_doc", "bench_doc", "diag")
      .orderBy("pos_t")
    seeds
      .withColumn("isl", col("pos_t") - row_number().over(w))
      .groupBy("train_doc", "bench_doc", "diag", "isl")
      .agg(min("pos_t").as("start_t"), count(lit(1)).as("run_grams"))
  }

  /** MODEL-BASED quality scoring (q145) — the linear-classifier filter
    * shape (fastText-style: hashed token features × a weight vector,
    * per-doc margin decides keep/drop) that sits beside the RULE
    * battery (q125) and the statistical LM score (q83) in every
    * production curation stack. The inference plan is the real thing:
    * explode to tokens (corpus-linear, the q20 pass), map-side feature
    * hashing into 4096 buckets (q67's engine-portable hex idiom), a
    * BROADCAST join against the weight table — production swaps in
    * learned weights; a 4096-row (or 2M-row) table broadcasts either
    * way and the corpus side never shuffles for it — then ONE
    * doc-keyed partial-agg sum. Margins are exact BIGINT milli-units
    * (partition-order invariant, q88's discipline); the only float op
    * is the final mean, rounded at 6 dp.
    *
    * The weight table here is a pure deterministic function of the
    * bucket id (Knuth multiplicative hash, w ∈ [−1000, 1000] milli) so
    * the DuckDB oracle derives the IDENTICAL table and the whole
    * inference path — hashing, join, margin fold, threshold — is
    * hash-gated end to end. A learned model changes the table's
    * VALUES, not this plan or its verification story.
    */
  def q145LinearQualityScore(s: SparkSession, d: String): DataFrame = {
    val weights = s.range(0, 4096)
      .select(col("id").as("bucket"),
        (col("id") * lit(2654435761L) % lit(2001L) - lit(1000L)).as("w"))
    // the margin is a pure function of the text, so the exact-text
    // contraction applies: score once per DISTINCT text, members
    // inherit the row (measured 10.0 → ~1 s at the 20× dup corpus)
    val (repDocs, membership) = textContraction(s, d)
    val tok = repDocs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 3), 16, 10).cast("long").as("bucket"))
    tok.join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("margin_milli"))
      .withColumnRenamed("doc_id", "rep")
      .join(membership, Seq("rep"))
      .select(col("doc_id"), col("n_tokens"), col("margin_milli"),
        r6(col("margin_milli").cast("double") / col("n_tokens").cast("double"))
          .as("mean_w_milli"),
        when(col("margin_milli") >= 0L, "keep").otherwise("drop").as("label"))
      .orderBy("doc_id")
  }

  /** PER-SOURCE SCORE CALIBRATION (q177) — the step between a
    * model-based quality score and a usable corpus gate: q145's margin
    * is SOURCE-BIASED (each source's text style shifts the score
    * distribution wholesale), so one global threshold over-prunes some
    * sources and guts others; the standard remedy is rank calibration
    * WITHIN source — keep the top q% of each source, whatever its raw
    * score range. Output is the calibration table that decision
    * consumes: per (source, decile) the doc count and the EXACT margin
    * bounds, so any target keep-rate maps to a per-source threshold by
    * lookup. Decile = ((rank−1)·10) div n with rank = row_number over
    * (margin desc, doc_id asc) — all BIGINT, deterministic under ties,
    * hash-exact with no rounding discipline at all.
    *
    * Plan shape: q145's margin chain (exact-text contraction, broadcast
    * weight table) + [[ScalarSuites.groupedRank]] — ONE range-
    * partitioned sort on (source, margin, doc_id) with per-group
    * offsets from its lightweight count pass, so a 100 TB corpus where
    * one source dominates still sorts in executor-bounded partitions
    * (a `Window.partitionBy("source")` would sort the dominant source
    * on a single task — the skew hazard PlanSpec now bans). The group
    * totals the decile needs ride out of the same count pass; the
    * decile TABLE this emits is model-sized (sources × 10 rows).
    */
  def q177ScoreCalibration(s: SparkSession, d: String): DataFrame = {
    val margins = q145LinearQualityScore(s, d)
      .select(col("doc_id"), col("margin_milli"))
    val src = Tables.documents(s, d).select("doc_id", "source")
    ScalarSuites.groupedRank(margins.join(src, Seq("doc_id")),
        Seq("source"), Seq(col("margin_milli").desc, col("doc_id").asc),
        rankCol = "rk", totalCol = Some("n"))
      .withColumn("decile", expr("((rk - 1) * 10) div n"))
      .groupBy("source", "decile")
      .agg(count(lit(1)).as("n_docs"),
        min("margin_milli").as("min_margin_milli"),
        max("margin_milli").as("max_margin_milli"))
      .orderBy("source", "decile")
  }

  /** The DECISION [[q177ScoreCalibration]]'s table exists to drive:
    * per-source admission thresholds for a target keep-rate. Keeping
    * the top `keepDeciles`/10 of each source by within-source rank
    * maps to threshold = the smallest margin inside the kept deciles;
    * the gate is then `margin_milli >= threshold_milli` — a pure
    * per-row comparison, TIE-INCLUSIVE at the boundary (a doc whose
    * margin equals the cut is kept even if its rank falls in the next
    * decile: a threshold gate cannot and should not split equal-score
    * docs, and admitting ties errs on keeping data). Output is
    * model-sized (one row per source) — the broadcast side of the
    * streaming admission twin
    * ([[graft.streaming.StreamingOps.calibratedAdmitAtIngest]]).
    */
  def calibrationThresholds(calib: DataFrame, keepDeciles: Int = 3)
      : DataFrame = {
    require(keepDeciles >= 1 && keepDeciles <= 10,
      s"keepDeciles must be in [1, 10], got $keepDeciles")
    calib.filter(col("decile") < keepDeciles)
      .groupBy("source")
      .agg(min("min_margin_milli").as("threshold_milli"))
  }

  /** Shared frames of the CORPUS-INTERNAL repeated-substring family
    * (q148/q149) — the suffix-array exact-substring-dedup question
    * ("which token spans appear more than once ANYWHERE in the corpus",
    * Lee et al. 2022) re-expressed in the q143 positioned-gram
    * coordinate space: a position (doc, pos) is REPEATED iff its
    * 3-gram's total occurrence count across the whole corpus is ≥ 2 —
    * another doc or another position of the same doc; a repeated
    * substring of L ≥ 3 tokens is then L−2 consecutive repeated starts.
    * No doc-vs-doc pair space exists anywhere: the corpus-wide
    * repetition test is ONE gram-keyed count, which is what makes this
    * formulation linear where the naive "join every doc against every
    * doc sharing a gram" is quadratic in duplication.
    *
    * EXACT-TEXT CONTRACTION (the q143 move, exact here too): duplicate
    * copies of a text have identical repeated-position sets — every
    * gram of a duplicated text is repeated BY the copy itself, and a
    * rep's gram counts see the copies through the `copies` weight — so
    * grams explode once per DISTINCT text, counts weight by
    * multiplicity, and members inherit the rep's row closed-form.
    *
    * Returns (repDocs, membership, starts): reps with their texts and
    * copy counts; (rep → doc_id) membership; repeated (doc_id=rep,
    * pos) starts.
    */
  private def repeatedStartFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (repDocs, membership) = textContraction(s, d)
    val pg = positionedGrams(repDocs, "doc_id", "pos")
    // corpus-wide occurrence count: per-rep occurrences × copy count
    // (the un-contracted corpus's exact total)
    val repeatedHashes = pg
      .join(repDocs.select("doc_id", "copies"), Seq("doc_id"))
      .groupBy("h").agg(sum("copies").as("cnt"))
      .filter(col("cnt") >= 2L).select("h")
    val starts = pg.join(repeatedHashes, Seq("h")).select("doc_id", "pos", "h")
    (repDocs, membership, starts)
  }

  /** The exact-text contraction frames shared by the per-doc text
    * statistics that are pure functions of the text (q122, q148, q149;
    * q143 carries its own two-sided variant): (repDocs, membership)
    * where repDocs holds one row per DISTINCT text (`rep` = min doc_id,
    * `copies` = multiplicity) and membership maps rep → every doc_id.
    * Expensive per-text work (gram explodes, windows) runs on reps;
    * copy-level answers expand closed-form through membership — the
    * move that makes the family dup-count-invariant on dup-heavy
    * corpora (measured: q148 1.09 s at the 20× stress corpus where the
    * un-contracted q122 paid 9.0 s before this helper reached it).
    */
  // memoized per (session, dir, fingerprint) like the Dedup session
  // frames: SEVEN queries consume this contraction (q122, q148, q149,
  // q151, q26, q49, q145), and without the memo each pays the
  // md5-groupBy + membership join even on dup-free corpora — the memo
  // makes the no-dup overhead a one-off per session instead of
  // per-query. Both frames persist; eviction unpersists both.
  private val contractionCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), (DataFrame, DataFrame)]

  private[ops] def textContraction(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    contractionCache.synchronized {
      val fp = graft.core.Fingerprint.of(s, d, "documents")
      contractionCache.keys
        .filter(k => k._1 == s && k._2 == d && k._3 != fp)
        .foreach { stale =>
          contractionCache.remove(stale).foreach { case (a, b) =>
            try { a.unpersist(); b.unpersist() } catch { case _: Throwable => () }
          }
        }
      contractionCache.getOrElseUpdate((s, d, fp), {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), md5(col("text")).as("h_text"))
        val reps = base.groupBy("h_text")
          .agg(min("doc_id").as("rep"), count(lit(1)).as("copies"))
        val membership = base.select("h_text", "doc_id")
          .join(reps.select("h_text", "rep"), Seq("h_text"))
          .select(col("rep"), col("doc_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val repDocs = base
          .join(reps.select(col("rep").as("doc_id"), col("copies")), Seq("doc_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (repDocs, membership)
      })
    }

  /** Repeated-start positions expanded to the token positions they
    * cover ([pos, pos+2] per 3-gram start), distinct — the EXACT
    * interval union, so adjacent and overlapping repeated grams never
    * double-count a token (a sum of island lengths would: two islands
    * whose starts are 2 apart overlap at one token).
    */
  private def coveredPositions(starts: DataFrame): DataFrame =
    starts
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + 2)).as("pos"))
      .distinct()

  /** REPEATED-SPAN PROFILE per document (q148) — the measurement side
    * of exact substring dedup: how much of each doc's text appears
    * MORE THAN ONCE in the corpus, verbatim. Columns: n_rep_grams
    * (repeated 3-gram starts), longest_rep_run (longest verbatim token
    * run also occurring elsewhere — q143's islands idiom on the
    * corpus-internal diagonal-free space), n_dup_tokens (EXACT count
    * of tokens covered by any repeated gram — interval union, not
    * island-length sum) and dup_fraction.
    *
    * Relationship to [[q122DupNgramSpans]] (same published family,
    * different question): q122 is the cross-doc DIAGNOSTIC — 8-gram
    * starts duplicated across ≥ 2 DISTINCT docs, counted at start
    * granularity. This operator is the REWRITE'S measurement
    * companion: repetition includes a doc repeating ITSELF (q122's
    * distinct-doc test is blind to intra-doc boilerplate loops),
    * coverage is the exact token-interval union rather than a start
    * count, and the numbers are the rewrite's own — n_dup_tokens is
    * precisely what [[q149DedupRewrite]] cuts (spec-pinned:
    * n_kept + n_dup_tokens = n_tokens), which no start-level count
    * can provide.
    *
    * Plan: one gram explode over DISTINCT texts, one gram-keyed count,
    * one gram-keyed equality join back, then doc-keyed window + aggs —
    * every shuffle keyed, everything linear in gram count; the
    * contraction makes the whole pipeline dup-count-invariant (the
    * 20× dup-heavy stress corpus pays reps, not copies).
    */
  def q148RepeatedSpans(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (repDocs, membership, starts) = repeatedStartFrames(s, d)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val runs = starts
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy("doc_id", "isl").agg(count(lit(1)).as("run_grams"))
      .groupBy("doc_id")
      .agg(sum("run_grams").as("n_rep_grams"),
        (max("run_grams") + lit(2L)).as("longest_rep_run"))
    val covered = coveredPositions(starts)
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_tokens"))
    val perRep = repDocs
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 3L)
      .join(runs, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id").as("rep"), col("n_tokens"),
        coalesce(col("n_rep_grams"), lit(0L)).as("n_rep_grams"),
        coalesce(col("longest_rep_run"), lit(0L)).as("longest_rep_run"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
    perRep.join(membership, Seq("rep"))
      .select(col("doc_id"), col("n_tokens"), col("n_rep_grams"),
        col("longest_rep_run"), col("n_dup_tokens"),
        r6(col("n_dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("dup_fraction"))
      .orderBy("doc_id")
  }

  /** DEDUP REWRITE (q149) — the transformation side of exact substring
    * dedup (Lee et al. 2022's actual intervention): REMOVE every token
    * covered by a repeated gram and report the rewritten document as
    * (n_kept, md5) — the corpus after "delete all text that appears
    * more than once", verifiable without shipping the text itself.
    * A fully-duplicated doc rewrites to the empty string (md5('')).
    *
    * Plan: kept tokens = positions anti-joined against the covered
    * set (doc-keyed equality anti-join), then ONE doc-keyed agg whose
    * state is the kept tokens of one document (doc-bounded, the
    * collect_list+array_sort reassembly idiom) — no self-join, no
    * per-pair work; the q148 contraction applies unchanged since the
    * rewrite is a pure function of the text.
    */
  /** (doc_id, pos, tok) positions of a (doc_id, text) frame — the
    * q149/q151 rewrite coordinate space.
    */
  private def docPosToks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))

  /** The rewrite kernel shared by q149 and q151: drop `covered`
    * positions (doc-keyed equality anti-join), reassemble the kept
    * tokens in position order inside ONE doc-keyed agg (state =
    * one document's kept tokens, doc-bounded) → (doc_id, n_kept,
    * kept_md5). Docs with nothing kept produce no row — callers
    * left-join and default to (0, md5('')).
    */
  private def keptRewrite(posToks: DataFrame, covered: DataFrame): DataFrame =
    posToks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x("tok")))).as("kept_md5"))

  /** Attach n_tokens and the empty-doc defaults to a [[keptRewrite]]
    * result, keyed as `rep` for membership expansion.
    */
  private def finishRewrite(repDocs: DataFrame, kept: DataFrame): DataFrame =
    repDocs
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id").as("rep"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))

  def q149DedupRewrite(s: SparkSession, d: String): DataFrame = {
    val (repDocs, membership, starts) = repeatedStartFrames(s, d)
    val perRep = finishRewrite(repDocs,
      keptRewrite(docPosToks(repDocs), coveredPositions(starts)))
    perRep.join(membership, Seq("rep"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"), col("kept_md5"))
      .orderBy("doc_id")
  }

  /** KEEP-FIRST dedup rewrite (q151) — the intervention production
    * dedup actually performs (q149 removes EVERY occurrence of
    * repeated text; real pipelines keep one): a repeated gram
    * occurrence is REMOVABLE iff it is not the corpus-wide FIRST
    * occurrence of its gram (lexicographic (doc_id, pos) — one
    * gram-keyed min), and only removable occurrences' positions are
    * cut. Exact copies behave exactly as dedup should: the first copy
    * survives INTACT (it holds every canonical occurrence), later
    * copies rewrite to empty. Honesty note, spec-pinned: at gram
    * granularity the keep-first guarantee is per-GRAM, not per-string —
    * a canonical occurrence's tokens can still be cut when overlapped
    * by a DIFFERENT gram's non-canonical occurrence (cross-doc partial
    * overlap chains; the spec plants one), so content shared by
    * partially-overlapping docs retains each gram somewhere but not
    * necessarily contiguously. q151.n_kept ≥ q149.n_kept pointwise
    * (keep-first removes a strict subset), spec-pinned corpus-wide.
    *
    * Contraction correctness (same frames as q148/q149): the global
    * first occurrence of any gram always lives in a REP (a rep is its
    * group's min doc_id and copies hold identical positions), so
    * canonical resolution needs only rep-level occurrences. A non-rep
    * copy can never hold a canonical occurrence — its removable set is
    * ALL its repeated positions (exactly q149's covered set) — so the
    * group expands as two closed-form row shapes: the rep's
    * keep-first row and the shared fully-removed member row; the
    * member-variant rewrite only runs over multi-copy reps.
    */
  def q151DedupKeepFirst(s: SparkSession, d: String): DataFrame = {
    val (repDocs, membership, starts) = repeatedStartFrames(s, d)
    val canon = starts.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("c"))
      .select(col("h"), col("c.doc_id").as("doc_id"), col("c.pos").as("pos"))
    val removable = starts.join(canon, Seq("h", "doc_id", "pos"), "left_anti")
    val posToks = docPosToks(repDocs)
    val repRows = finishRewrite(repDocs,
      keptRewrite(posToks, coveredPositions(removable)))
      .select(col("rep").as("doc_id"), col("n_tokens"), col("n_kept"),
        col("kept_md5"))
    // non-rep copies: removable = every repeated position (they hold no
    // canonical occurrence) — computed only over multi-copy groups
    val multiReps = repDocs.filter(col("copies") >= 2L).select("doc_id")
    val memberRows = finishRewrite(repDocs.join(multiReps, Seq("doc_id")),
      keptRewrite(posToks.join(multiReps, Seq("doc_id")),
        coveredPositions(starts.join(multiReps, Seq("doc_id")))))
      .join(membership.filter(col("doc_id") =!= col("rep")), Seq("rep"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"), col("kept_md5"))
    repRows.unionByName(memberRows).orderBy("doc_id")
  }

  /** ONE definition of the BPE greedy-left merge scan, shared by
    * training (q153 — applied to the evolving vocabulary) and encoding
    * (q159 — applied to the tokens being encoded), so the two surfaces
    * cannot diverge on what a merge does. lit()-based (the pair text
    * never enters SQL source, so no literal-escaping hazard): `get` is
    * null-safe on the empty accumulator, and null === x1 is null, so
    * the first symbol always takes the push branch under ANSI. The
    * merged symbol can never re-merge as the LEFT element within the
    * same pass (xy ≠ x since y is nonempty) — exactly the Sennrich
    * scan-with-skip semantics.
    */
  private def greedyMergeFold(sym: org.apache.spark.sql.Column,
      x1: String, x2: String, merged: String): org.apache.spark.sql.Column =
    aggregate(sym,
      lit(Array.empty[String]),
      (acc, x) => when(
        get(acc, size(acc) - 1) === lit(x1) && x === lit(x2),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(lit(merged))))
        .otherwise(concat(acc, array(x))))

  /** BPE TOKENIZER TRAINING (q153) — the iterated form of
    * [[q106BpePairs]] (which computes exactly this loop's FIRST
    * statistic): starting from character symbols over the
    * frequency-weighted DISTINCT vocabulary, repeatedly find the most
    * frequent adjacent symbol pair and merge it corpus-wide — the
    * Sennrich et al. 2016 training algorithm itself, not just its
    * inner statistic. Output is the artifact tokenizer training
    * produces: the MERGE TABLE (iter, pair, merged, cnt), the thing a
    * BPE tokenizer ships as its model.
    *
    * Exactness/portability: symbol sequences are space-joined strings;
    * a merge is a greedy-LEFT fold over the split symbol array
    * (`aggregate`: if the accumulator's last symbol is x and the next
    * is y, pop-and-push xy, else push) — the Sennrich scan itself.
    * A single-pass padded-space replace is NOT equivalent: the match
    * consumes the shared separator space, so "a a a a" would come out
    * "aa a a" instead of BPE's "aa aa" (spec-planted at a merge depth
    * where the self-repeat word wins the argmax). The merged symbol
    * can never re-merge as the left element within the same pass
    * because xy ≠ x (y is nonempty) — exactly the scan-with-skip
    * semantics. The top pair breaks ties deterministically by
    * (cnt desc, pair asc); the oracle re-derives every iteration —
    * including the same greedy fold, via `list_reduce` — through
    * `merges` unrolled CTE blocks (the q147 discipline: the gate
    * covers the LOOP's decisions, not one step).
    *
    * Scale shape: everything after the one corpus-sized word count is
    * VOCABULARY-bounded (q106's argument), and since r16 the per-merge
    * step on large vocabularies is DELTA-MAINTAINED rather than
    * recounted: the pair-count table rides in the loop state beside
    * the vocabulary (one combined frame, `kind` ∈ {w, p}), and a merge
    * of (x1 x2) updates it from the AFFECTED words only — subtract the
    * old pairs of every word containing the adjacency, add the pairs
    * of its folded form (symbols never contain spaces, so the padded
    * substring test `" x1 x2 " ⊆ " seq "` is an exact adjacency test
    * with no false positives). The invariant
    * pc = Σ_w freq(w)·pairs(seq_w) is preserved exactly, so the argmax
    * equals a fresh recount — gated by the oracle at merges=3 and by
    * the depth-10 JVM-reference spec plus a paths-agree pin
    * (TextDedupSimSpec) — and the argmax job is a shuffle-free
    * TakeOrdered over the maintained counts instead of an
    * explode + vocabulary-wide agg every iteration. Per iteration: ONE
    * driver scalar (the argmax pair), one affected-only fold + delta
    * checkpoint; the state is persisted and lineage-truncated per
    * step, the q69/q147 loop discipline with unpersist-one-behind.
    *
    * The path choice is COST-BASED, like Spark's own broadcast
    * threshold, because the delta's win is regime-dependent (BpeProbe
    * A/B, r16): the delta trades the recount's vocabulary-wide
    * explode+agg for one extra scheduler-bound shuffle stage in the
    * state-maintenance job. On a 1M-distinct-word corpus that wins
    * 1.55× by depth 64 (0.86 vs 1.33 s/merge marginal) and the gap
    * WIDENS with depth (the affected set shrinks as the argmax pair
    * rarefies — marginal decays 1.23 → 0.86 while the recount's is
    * flat); on a 20k-word vocabulary, where per-merge data is trivial
    * and cost is pure scheduler latency, the same extra stage makes it
    * ~2× SLOWER (0.48 vs 0.25 s/merge). So: vocabulary ≥
    * [[BpeDeltaMinVocab]] → delta, below → recount, decided from one
    * cached-count job on the materialized vocabulary;
    * [[BpeRecountConf]] forces either path (the probe's A/B lever).
    * `merges` is a constant (a tokenizer trains tens of thousands of
    * merges, each this same bounded step; the gated default is 3 to
    * keep the oracle's unrolled CTEs honest).
    */
  /** Session conf forcing q153's merge-step path: "1" = full recount,
    * "0" = delta maintenance, unset = cost-based auto (vocabulary size
    * vs [[BpeDeltaMinVocab]]). The forced settings are BpeProbe's A/B
    * lever; production leaves it unset. */
  val BpeRecountConf = "graft.bpe.recount"

  /** Distinct-word threshold above which q153's delta-maintained merge
    * step beats the full recount (BpeProbe r16: recount wins ~2× at
    * 20k words, delta wins 1.55×-and-widening at 1M; the crossover is
    * where the vocabulary-wide explode+agg outgrows one extra
    * scheduler-bound stage, ~low hundreds of thousands on this box). */
  val BpeDeltaMinVocab = 200000L

  def q153BpeTrain(s: SparkSession, d: String, merges: Int = 3): DataFrame = {
    import s.implicits._
    // adjacent-pair strings of a space-joined symbol sequence; the
    // size guard comes BEFORE the transform (Spark's sequence(1, 0)
    // yields a DESCENDING [1, 0], not an empty array)
    def pairsOf(seqC: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val sy = split(seqC, " ")
      when(size(sy) >= 2,
        transform(sequence(lit(1), size(sy) - 1),
          i => concat(element_at(sy, i), lit(" "), element_at(sy, i + 1))))
        .otherwise(array().cast("array<string>"))
    }
    val words0 = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(
        concat_ws(" ",
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          .as("seq"),
        col("freq"))
    // cost-based path pick (scaladoc above; forced by BpeRecountConf):
    // materialize the vocabulary once, and when the conf doesn't force
    // a path, one cached-count job decides — small vocabulary →
    // recount (per-merge cost is scheduler latency; the delta's extra
    // stage only hurts), large → delta (the recount's per-merge
    // vocabulary-wide explode+agg dominates)
    val wordsCk = words0.localCheckpoint(true)
    val recount = s.conf.getOption(BpeRecountConf) match {
      case Some("1") => true
      case Some("0") => false
      case _ => wordsCk.count() < BpeDeltaMinVocab
    }
    // loop state: vocabulary rows (kind=w) + the maintained pair-count
    // table (kind=p) in one checkpointed frame — one materialization
    // job per merge covers both (built from the cached vocabulary, so
    // the corpus is scanned exactly once either way)
    var state = {
      val w = wordsCk.select(lit("w").as("kind"), col("seq"), col("freq"))
      if (recount) w else w.unionByName(wordsCk
        .select(explode(pairsOf(col("seq"))).as("seq"), col("freq"))
        .groupBy("seq").agg(sum("freq").as("freq"))
        .select(lit("p").as("kind"), col("seq"), col("freq")))
    }.localCheckpoint(true)
    wordsCk.unpersist()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (i <- 1 to merges) {
      val top = (if (recount)
        state.filter(col("kind") === "w")
          .select(explode(pairsOf(col("seq"))).as("seq"), col("freq"))
          .groupBy("seq").agg(sum("freq").as("freq"))
          .select(lit("p").as("kind"), col("seq"), col("freq"))
      else state.filter(col("kind") === "p"))
        .orderBy(col("freq").desc, col("seq").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val p = top(0).getString(1)
        val Array(x1, x2) = p.split(" ", 2)
        val merged = p.replace(" ", "")
        out += ((i.toLong, p, merged, top(0).getLong(2)))
        val words = state.filter(col("kind") === "w")
        // exact adjacency test: symbols are space-free, so the padded
        // substring match hits iff (x1, x2) are adjacent symbols; only
        // these words change under the fold — everything else passes
        // through untouched and contributes zero pair delta
        val hit = concat(lit(" "), col("seq"), lit(" ")).contains(s" $p ")
        val affected = words.filter(hit)
        val folded = affected.select(
          array_join(greedyMergeFold(split(col("seq"), " "), x1, x2, merged),
            " ").as("seq"),
          col("freq"))
        val deltas = affected
          .select(explode(pairsOf(col("seq"))).as("seq"),
            (-col("freq")).as("freq"))
          .unionByName(folded
            .select(explode(pairsOf(col("seq"))).as("seq"), col("freq")))
        // the union CONCATENATES partitions (unaffected P + folded P +
        // the delta shuffle), so without the coalesce the checkpointed
        // state's partition count would roughly double every merge —
        // geometric task-count growth that kills a deep train on pure
        // scheduler overhead. Coalesce is narrow (no shuffle) and the
        // state is vocabulary-bounded, so a fixed width is right.
        val next = (if (recount)
          words.select(
              array_join(greedyMergeFold(split(col("seq"), " "), x1, x2,
                merged), " ").as("seq"),
              col("freq"))
            .select(lit("w").as("kind"), col("seq"), col("freq"))
        else words.filter(!hit)
          .unionByName(folded.select(lit("w").as("kind"), col("seq"), col("freq")))
          .unionByName(state.filter(col("kind") === "p")
            .select(col("seq"), col("freq"))
            .unionByName(deltas)
            .groupBy("seq").agg(sum("freq").as("freq"))
            .filter(col("freq") > 0L)
            .select(lit("p").as("kind"), col("seq"), col("freq"))))
          .coalesce(s.sparkContext.defaultParallelism)
          .localCheckpoint(true)
        // deep-merge hygiene: the eager checkpoint above has already
        // materialized `next`, so the prior state's blocks are dead —
        // drop them (the q171 unpersist-one-behind discipline). Noise
        // at the gated merges=3; at probe depth (BpeProbe, merges=256)
        // it is an accumulating block-manager leak otherwise, the
        // exact failure mode the r13 bench degradation traced to.
        state.unpersist()
        state = next
      }
    }
    state.unpersist()
    out.toSeq.toDF("iter", "pair", "merged", "cnt").orderBy("iter")
  }

  /** COUNT-MIN SKETCH frequency estimates (q154) — the third sketch in
    * the inventory (HLL q38 counts distincts, t-digest q66 quantiles;
    * CMS answers POINT frequency queries) and the mergeable structure
    * streaming frequency estimation is built on. Depth 4 × width 1024
    * counters; row hashes are deterministic md5 arithmetic
    * (md5(j || ':' || token), first 4 hex digits mod width), so unlike
    * the q38/q66 error-bound gates the ENTIRE sketch is
    * oracle-reproducible bit-for-bit — the DuckDB gate recomputes every
    * counter and every estimate, not just a bound. Output: the top-k
    * exact heavy hitters with (true_cnt, est_cnt) and the structural
    * CMS guarantee est ≥ true as a literal-TRUE boolean (`over_ok` —
    * CMS never underestimates; the spec additionally checks the
    * estimate against an independent JVM sketch).
    *
    * Plan shape: the corpus-level counts take the exact-text
    * contraction (copies are integer weights); the sketch build is one
    * (depth × reps)-explode into a ≤ depth·width-row agg (broadcast);
    * the probe joins k tokens against it. At 100 TB the sketch is the
    * bounded artifact that ships — the whole point of CMS.
    */
  def q154CountMin(s: SparkSession, d: String, depth: Int = 4,
      width: Int = 1024, k: Int = 20): DataFrame = {
    val (cdocs, _) = textContraction(s, d)
    val tok = cdocs
      .select(explode(tokens(col("text"))).as("token"), col("copies"))
    val exact = tok.groupBy("token").agg(sum("copies").as("true_cnt"))
    def bucket(j: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column =
      conv(substring(md5(concat(j.cast("string"), lit(":"), t)), 1, 4), 16, 10)
        .cast("long") % width.toLong
    // the sketch builds from the VOCABULARY-level count table, not the
    // token stream: cells are identical (a cell sums the counts of the
    // tokens hashing into it) and the depth-fold explode runs over
    // vocabulary rows instead of corpus occurrences
    val sketch = exact
      .select(col("token"), col("true_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), bucket(col("j"), col("token")).as("b"), col("true_cnt"))
      .groupBy("j", "b").agg(sum("true_cnt").as("c"))
    val top = exact
      .orderBy(col("true_cnt").desc, col("token").asc).limit(k)
    top
      .select(col("token"), col("true_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("b", bucket(col("j"), col("token")))
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy("token", "true_cnt")
      .agg(min("c").as("est_cnt"))
      .select(col("token"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") >= col("true_cnt")).as("over_ok"))
      .orderBy(col("true_cnt").desc, col("token").asc)
  }

  /** DSIR-style IMPORTANCE WEIGHTS (q150) — data selection via
    * importance resampling (Xie et al. 2023): score every raw document
    * by how target-domain-like its hashed bigram features are, the
    * published cheap stand-in for training a domain classifier. Target
    * domain = the doc_id % 100 == 0 set (the q74/q143 benchmark
    * convention — "select raw data that looks like the benchmark");
    * features = bigrams hashed to 4096 buckets (q145's hex idiom, the
    * DSIR paper's hashed-ngram design); per-feature weight = the
    * add-one-smoothed likelihood ratio
    * ((c_t+1)/(N_t+B)) / ((c_r+1)/(N_r+B)).
    *
    * Exactness design: DSIR sums LOG ratios — a transcendental the
    * oracle cannot reproduce bit-for-bit — so the score here is the
    * MEAN per-occurrence ratio in exact integer micro-units:
    * ratio_micro = ((c_t+1)·(N_r+B)·1e6) div ((c_r+1)·(N_t+B)) — all
    * BIGINT multiplications before ONE integer division (q83's
    * micro-prob discipline; exact and partition-order-invariant; the
    * monotone selection signal survives the log→ratio swap). At gate
    * scale the products fit BIGINT (≤ ~4e17 at sf0.1); at corpus
    * sizes past ~1e9 tokens the same expression runs in DECIMAL(38,0)
    * (DuckDB HUGEINT) — a type swap, not a plan change.
    *
    * Selection is the paper's: TOP-K by importance weight (top 10%
    * here), not an absolute threshold — thresholds degenerate when the
    * target's vocabulary coverage is small (measured on the gate
    * fixture: zero docs clear mean ≥ 1). Rank is an output column, so
    * the gate covers the selection order itself.
    *
    * Plan shape at 100 TB: one corpus-linear bigram explode, ONE
    * bucket-keyed agg producing a ≤4096-row count table (target and
    * raw counts in the same pass), totals from that table (single-row
    * broadcast), the ratio table BROADCAST back against the exploded
    * features, one doc-keyed partial-agg sum, then the
    * range-partitioned [[ScalarSuites.globalRank]] for top-K — never a
    * no-key window. The model is bucket-bounded everywhere — corpus
    * cardinality only ever crosses the wire keyed by doc.
    */
  /** Per-occurrence hashed bigram features of a (doc_id, text) frame —
    * ONE feature definition shared by batch q150 and the ingest twin
    * ([[graft.streaming.StreamingOps.importanceScoreAtIngest]]).
    */
  private[graft] def dsirFeatures(docs: DataFrame): DataFrame = {
    import graft.functions.expressions.TextExpressions.tokenShingles
    docs
      .select(col("doc_id"),
        explode(tokenShingles(tokens(col("text")), 2)).as("bigram"))
      .select(col("doc_id"),
        conv(substring(md5(col("bigram")), 1, 3), 16, 10).cast("long")
          .as("bucket"))
  }

  /** The contracted DSIR model frames: (repDocs, membership, ratios).
    * Per-SIDE exact-text contraction (q143's two-sided variant — the
    * target flag is a function of doc_id, not text, so the same text
    * may appear on both sides and reps are per (is_target, text)):
    * bigrams explode once per DISTINCT (side, text) and the count
    * tables weight by copy multiplicity, so `ratios` carries the exact
    * un-contracted corpus's values at rep cost. The ratio table is the
    * MODEL — ≤ 4096 rows, broadcastable, and what the ingest twin
    * builds once per stream lifetime.
    */
  private[graft] def dsirModel(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val B = 4096L
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        (col("doc_id") % 100 === 0).as("is_target"), md5(col("text")).as("h"))
    val reps = base.groupBy("is_target", "h")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("copies"))
    val membership = base.select("is_target", "h", "doc_id")
      .join(reps.select("is_target", "h", "rep"), Seq("is_target", "h"))
      .select(col("is_target"), col("rep"), col("doc_id"))
    val repDocs = base.join(
      reps.select(col("is_target"), col("rep").as("doc_id"), col("copies")),
      Seq("is_target", "doc_id"))
    val counts = dsirFeatures(repDocs)
      .join(repDocs.select("doc_id", "is_target", "copies"), Seq("doc_id"))
      .groupBy("bucket").agg(
        sum(when(col("is_target"), col("copies")).otherwise(0L)).as("c_t"),
        sum(when(!col("is_target"), col("copies")).otherwise(0L)).as("c_r"))
    val totals = counts.agg(sum("c_t").as("n_t"), sum("c_r").as("n_r"))
    val ratios = counts.crossJoin(broadcast(totals)) // single-row broadcast
      .select(col("bucket"),
        expr(s"((c_t + 1) * (n_r + $B) * 1000000) div ((c_r + 1) * (n_t + $B))")
          .as("ratio_micro"))
    (repDocs, membership, ratios)
  }

  /** Score a (doc_id, text) frame against a DSIR ratio table — ONE
    * scoring definition shared by batch q150 (fed contracted raw-side
    * reps) and the ingest twin (fed each micro-batch), so the two
    * surfaces cannot diverge on what a score is: n_feats,
    * sum_ratio_micro (exact BIGINT), mean_ratio_micro (null when the
    * doc has no bigrams — no evidence).
    */
  private[graft] def dsirScoreDocs(docs: DataFrame, ratios: DataFrame)
      : DataFrame = {
    val perDoc = dsirFeatures(docs)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("ratio_micro").as("sum_ratio_micro"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("sum_ratio_micro"), lit(0L)).as("sum_ratio_micro"),
        // guarded: a doc with zero bigram features (< 2 tokens) must
        // yield the documented null mean, never an ANSI DIVIDE_BY_ZERO
        // — the when() also keeps the semantics fixed regardless of
        // whether n_feats resolves to the join column (null) or the
        // lateral coalesced alias (0)
        when(col("n_feats") > 0, expr("sum_ratio_micro div n_feats"))
          .as("mean_ratio_micro"))
  }

  def q150DsirWeights(s: SparkSession, d: String): DataFrame = {
    // contraction + shared scoring core; measured 16.7 → 0.88 s at the
    // 20× dup-heavy stress corpus — cheaper than the un-contracted
    // query at sf0.1 (1.61 s), because reps are sf0.1-sized there
    val (repDocs, membership, ratios) = dsirModel(s, d)
    val scored = dsirScoreDocs(repDocs.filter(!col("is_target")), ratios)
      .withColumnRenamed("doc_id", "rep")
      .join(membership.filter(!col("is_target")).select("rep", "doc_id"),
        Seq("rep"))
      .select("doc_id", "n_feats", "sum_ratio_micro", "mean_ratio_micro")
      // materialized ONCE (by the count below); the two rank passes
      // (sort + zipWithIndex) then read the cache instead of re-running
      // the whole pipeline per action
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the DSIR intervention is TOP-K selection by weight (not an
    // absolute threshold, which degenerates when the target's
    // vocabulary coverage is small — measured: zero raw docs of the
    // gate fixture clear mean ≥ 1): keep the top 10%, deterministic
    // tie-break by doc_id, no-evidence docs ranked last. globalRank is
    // the range-partitioned idiom — no no-key window.
    val k = (scored.count() + 9L) / 10L
    ScalarSuites.globalRank(scored,
      Seq(col("mean_ratio_micro").desc_nulls_last, col("doc_id")), "rank")
      .withColumn("selected", col("rank") <= lit(k))
      .orderBy("doc_id")
  }

  /** The q158 query workload — a fixed disjunctive term set, the
    * bounded "query side" of ranked retrieval (SparkEntry's oracle
    * embeds the same literals; keep in lockstep).
    */
  val DefaultBm25Terms: Seq[String] = Seq("hash", "stream", "vector", "merge")

  /** ONE definition of the BM25 integer arithmetic (k1 = 6/5, b = 3/4
    * lifted to exact BIGINT form — q158's scaladoc derives it), shared
    * by the fixed-term ranking (q158) and the per-query hybrid
    * retrieval (q172 / the at-ingest twin) so the surfaces can never
    * diverge on the formula. Contract: the input frame carries
    * `n`, `df`, `avgdl_milli`, `tf`, `dl` columns.
    */
  private[ops] def bm25IdfMicro: Column =
    expr("((2 * n - 2 * df + 1) * 1000000) div (2 * df + 1)")
  private[ops] def bm25FracMicro: Column =
    expr("(22 * tf * avgdl_milli * 1000000) div " +
      "(10 * tf * avgdl_milli + 3 * avgdl_milli + 9000 * dl)")

  /** Rep-level lexical index frames over the corpus at `d` — the
    * postings a BM25 server retrieves from, over the exact-text
    * contraction so every piece is dup-count-invariant:
    * (postings (token, rep, tf, dl), copy-weighted df table,
    * single-row totals (n, avgdl_milli), rep→member membership).
    * Unlike q158's fixed-term path (which prunes term rows to its
    * query literals BEFORE any shuffle), these carry the FULL
    * vocabulary — the index must answer arbitrary query terms. Used
    * by q172's hybrid retrieval and the at-ingest twin's serving
    * index; persistence/lifecycle is the caller's.
    */
  private[ops] def bm25IndexFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (repDocs, membership) = textContraction(s, d)
    val totals = repDocs
      .agg(sum(col("copies")).as("n"),
        sum(col("copies") * tokenCount(col("text")).cast("long")).as("tt"))
      .select(col("n"), expr("(tt * 1000) div n").as("avgdl_milli"))
    val termRows = repDocs
      .select(col("doc_id").as("rep"), col("copies"),
        tokenCount(col("text")).cast("long").as("dl"),
        explode(graft.functions.expressions.TextExpressions
          .tokenCounts(col("text"))).as("tc"))
      .select(col("rep"), col("copies"), col("dl"),
        col("tc.token").as("token"), col("tc.cnt").cast("long").as("tf"))
    val dfTable = termRows.groupBy("token").agg(sum("copies").as("df"))
    (termRows.select("token", "rep", "tf", "dl"), dfTable, totals, membership)
  }

  /** BM25-RANKED retrieval (Robertson et al., TREC-3; k1 = 1.2,
    * b = 0.75) — the scored-retrieval capability between q127's exact
    * phrase match and q26's per-doc TF-IDF profile: the global top-`k`
    * documents for a disjunctive term query under the standard
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * ranking, with the SAME rational idf q26 uses,
    * (N − df + ½)/(df + ½) = (2N − 2df + 1)/(2df + 1) — no libm log
    * anywhere.
    *
    * Exactness (the q83/q150 micro-unit discipline, so the gate is
    * hash-exact with NO rounding): with k1 = 6/5 and b = 3/4 the
    * per-term factor is exactly 22·tf·A / (10·tf·A + 3·A + 9000·dl)
    * where A = avgdl in milli-tokens = (Σdl·1000) div N — every
    * quantity BIGINT, idf and the factor each floored through ONE
    * integer division to micro-units, the product floored back to
    * micro-units, and the per-doc score a BIGINT SUM of those
    * (order-invariant, unlike a double sum). Exact while
    * tf·A < 4.2×10¹¹ (tf·avgdl < 4×10⁸ token² — far past any chunked
    * corpus; a 10k-token doc in a 1k-avgdl corpus sits at 10¹⁰).
    *
    * Plan shape at 100 TB: tf comes ROW-LOCAL from the TokenCounts
    * expression (q26's move — one byte-scan per doc, no token
    * explode), the `isin` query filter prunes the per-doc term rows
    * map-side BEFORE the only corpus-keyed shuffle (the per-doc score
    * agg, carrying ≤ |Q| rows per doc), df is a |Q|-row broadcast, the
    * corpus totals one broadcast row, and the final top-k is
    * TakeOrderedAndProject (per-partition k-heaps) — never a global
    * sort of the scored corpus. The exact-text contraction makes the
    * whole pipeline dup-count-invariant: copies enter df/N/Σdl as
    * integer weights and members inherit their rep's score closed-form.
    */
  def q158Bm25TopK(s: SparkSession, d: String,
      terms: Seq[String] = DefaultBm25Terms, k: Int = 20): DataFrame = {
    val (repDocs, membership) = textContraction(s, d)
    val totals = repDocs
      .agg(sum(col("copies")).as("n"),
        sum(col("copies") * tokenCount(col("text")).cast("long")).as("tt"))
      .select(col("n"), expr("(tt * 1000) div n").as("avgdl_milli"))
    val termRows = repDocs
      .select(col("doc_id"), col("copies"),
        tokenCount(col("text")).cast("long").as("dl"),
        explode(graft.functions.expressions.TextExpressions
          .tokenCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("copies"), col("dl"),
        col("tc.token").as("token"), col("tc.cnt").cast("long").as("tf"))
      .filter(col("token").isin(terms: _*))
    // df = copy-weighted doc count per term over (doc, token)-distinct
    // rows — matches the oracle's count(DISTINCT doc_id) exactly
    val dfTable = termRows.groupBy("token").agg(sum("copies").as("df"))
    val scored = termRows
      .join(broadcast(dfTable), Seq("token"))
      .crossJoin(broadcast(totals)) // single-row corpus stats
      .select(col("doc_id"),
        bm25IdfMicro.as("idf_micro"),
        bm25FracMicro.as("frac_micro"))
      .select(col("doc_id"),
        expr("(idf_micro * frac_micro) div 1000000").as("contrib_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib_micro").as("score_micro"))
      .withColumnRenamed("doc_id", "rep")
      .join(membership, Seq("rep"))
      .select(col("doc_id"), col("n_terms"), col("score_micro"))
    // (score, doc_id) is a unique sort key: limit is deterministic and
    // the rank runs over k rows, not the corpus — boundedRank (r16)
    ScalarSuites.boundedRank(
      scored.orderBy(col("score_micro").desc, col("doc_id")).limit(k),
      Seq(col("score_micro").desc, col("doc_id")), "rank")
      .select("rank", "doc_id", "n_terms", "score_micro")
      .orderBy("rank")
  }

  /** BPE ENCODE (q159) — the APPLY half of the tokenizer family q153
    * trains: every document encoded with the trained merge table, the
    * per-doc numbers a tokenizer-cost plan actually consumes. Where
    * q138's fertility is WHITESPACE bytes-per-token, this is fertility
    * under the TRAINED subword tokenizer: n_words (whitespace tokens),
    * n_chars (their total characters = the char-symbol count before
    * any merge), n_symbols (symbols after applying every merge in
    * training order), fertility_micro = symbols-per-word and
    * compression_micro = chars-per-symbol, both exact micro-unit
    * integer divisions (null when the denominator is empty — a doc
    * with no tokens has no fertility).
    *
    * One definition of a merge: encoding applies [[greedyMergeFold]] —
    * the very fold training used — once per merge in iteration order,
    * which IS how a shipped BPE tokenizer encodes (replay the merge
    * list). Unseen words therefore encode correctly too: the fold is a
    * pure function of the word, not a vocabulary lookup.
    *
    * Plan shape at 100 TB: training cost is q153's (vocabulary-bounded
    * per iteration, one driver scalar each — the merge table IS the
    * model, `merges` rows). Encoding computes the fold ONCE per
    * DISTINCT corpus word (the explicit vocab dimension — at
    * production merge counts the fold is the expensive step, so it
    * must run per word, never per occurrence), broadcasts the
    * vocabulary-sized (word → n_sym) table back onto the row-local
    * (doc, word, cnt) stream (q26's measured vocabulary-broadcast
    * argument), and aggregates per doc — the only corpus-keyed shuffle
    * carries distinct-word rows per doc. The exact-text contraction
    * makes all of it dup-count-invariant; members inherit the rep's
    * numbers closed-form.
    */
  def q159BpeEncode(s: SparkSession, d: String, merges: Int = 3): DataFrame = {
    val mergeTable = bpeMergeTable(s, d, merges)
    val (repDocs, membership) = textContraction(s, d)
    bpeEncodeDocs(repDocs, mergeTable)
      .withColumnRenamed("doc_id", "rep")
      .join(membership, Seq("rep"))
      .select("doc_id", "n_words", "n_chars", "n_symbols",
        "fertility_micro", "compression_micro")
      .orderBy("doc_id")
  }

  /** The trained merge table as the driver-held model a shipped BPE
    * tokenizer carries — (x1, x2, merged) in training order. Shared by
    * q159 and the encode-at-ingest twin so both serve the SAME model.
    */
  private[graft] def bpeMergeTable(s: SparkSession, d: String,
      merges: Int = 3): Array[(String, String, String)] =
    q153BpeTrain(s, d, merges).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .map { case (pair, merged) =>
        val Array(x1, x2) = pair.split(" ", 2); (x1, x2, merged)
      }

  /** The per-doc encode core shared by batch q159 (applied to the
    * contraction reps, members inheriting closed-form) and the ingest
    * twin (applied to each arriving micro-batch): fold runs ONCE per
    * DISTINCT word of the input frame (corpus vocab for batch, batch
    * vocab for the stream — same per-word values either way, the fold
    * is a pure function of the word), broadcast back onto the
    * row-local (doc, word, cnt) stream, aggregated per doc. Empty docs
    * survive the left join with zero counts and null ratios.
    */
  private[graft] def bpeEncodeDocs(docs: DataFrame,
      mergeTable: Array[(String, String, String)]): DataFrame = {
    val docToks = docs
      .select(col("doc_id"),
        explode(graft.functions.expressions.TextExpressions
          .tokenCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("tok"),
        col("tc.cnt").cast("long").as("cnt"))
    val chars = expr(
      "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))")
    val encoded = mergeTable.foldLeft(chars) { case (sym, (x1, x2, m)) =>
      greedyMergeFold(sym, x1, x2, m)
    }
    val encTable = docToks.select("tok").distinct()
      .select(col("tok"), length(col("tok")).cast("long").as("n_ch"),
        size(encoded).cast("long").as("n_sym"))
    val perDoc = docToks
      .join(broadcast(encTable), Seq("tok"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_words"),
        sum(col("cnt") * col("n_ch")).as("n_chars"),
        sum(col("cnt") * col("n_sym")).as("n_symbols"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_symbols"), lit(0L)).as("n_symbols"))
      .withColumn("fertility_micro",
        when(col("n_words") > 0L,
          expr("(n_symbols * 1000000) div n_words")))
      .withColumn("compression_micro",
        when(col("n_symbols") > 0L,
          expr("(n_chars * 1000000) div n_symbols")))
  }

  // ---- KMV / bottom-k-theta distinct sketches (q160, q161) --------------

  /** KMV sketch size: relative standard error ~ 1/sqrt(k-2) ~ 6.3%. */
  val KmvK: Int = 256

  /** Hash domain: the first 12 hex chars of md5 as a 48-bit integer,
    * shifted to [1, 2^48] so the kth-value division can never see 0.
    * (k-1)·2^48 = 71776119061217280 fits BIGINT with 2 decimal orders
    * to spare — the reason for a 48-bit domain rather than 63: DuckDB
    * replays the estimate in exact BIGINT floor division. At 48 bits,
    * expected hash collisions only bite beyond ~2^24 distinct values
    * per source (birthday bound) — and a collision UNDERcounts by one,
    * noise far under the sketch's own 6% error.
    */
  private val KmvNum: Long = (KmvK - 1).toLong * (1L << 48)

  /** The 48-bit KMV value hash as a column expression — shared with the
    * streaming twin ([[graft.streaming.StreamingOps.kmvSketchStream]])
    * so both surfaces hash identically.
    */
  private[graft] def kmvHash(sh: Column): Column =
    conv(substring(md5(sh), 1, 12), 16, 10).cast("long") + 1L

  /** Scalar form of the KMV estimate for a k-sized sketch: exact count
    * while unsaturated, else (k−1)·2^48 div h_k — the same BIGINT floor
    * division [[withKmvEstimate]] plans; shared with the streaming twin.
    */
  private[graft] def kmvEstimate(k: Int, n: Int, kth: Long): Long =
    if (n < k) n.toLong else (k - 1).toLong * (1L << 48) / kth

  /** Per-source KMV sketch frame: (source, sk) with sk the ascending
    * ≤k smallest distinct 48-bit shingle hashes. The scale story —
    * and the reason this is q123's production surface — is the
    * aggregation shape: [[graft.api.TypedPipeline.BottomKDistinct]] is
    * O(k)-state with map-side partial aggregation, so the ONLY shuffle
    * moves ≤ k·#sources·#tasks pre-combined values; neither the
    * corpus-wide DISTINCT (source, shingle) frame nor the shingle ×
    * shingle equality self-join that q123's exact overlap pays is ever
    * planned, and exact-duplicate documents cost hashing only (every
    * copy's shingles reject in O(1) against the full buffer head).
    */
  // memoized, persisted per-source sketch frame — q160 AND q161 consume
  // it, and without the memo each paid the full corpus scan + shingle
  // explode (measured 7.2 s + 7.4 s at the 20× stress corpus for a
  // #sources-row result). Fingerprint-keyed like every session memo;
  // standalone lock (the build touches no other memo).
  private val kmvCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  private def kmvSketches(s: SparkSession, d: String): DataFrame =
    kmvCache.synchronized {
      val fp = graft.core.Fingerprint.of(s, d, "documents")
      kmvCache.keys
        .filter(k => k._1 == s && k._2 == d && k._3 != fp)
        .foreach { stale =>
          kmvCache.remove(stale).foreach { df =>
            try df.unpersist() catch { case _: Throwable => () }
          }
        }
      kmvCache.getOrElseUpdate((s, d, fp),
        kmvSketchesRaw(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  private def kmvSketchesRaw(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new graft.api.TypedPipeline.BottomKDistinct(KmvK)
    Tables.documents(s, d)
      .select(col("source"), explode(shingles3(tokens(col("text")))).as("sh"))
      .select(col("source"), kmvHash(col("sh")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sk"))
      .toDF("source", "sk")
  }

  /** Attaches the estimate for sketch column `sk`: exact count while the
    * sketch is unsaturated (m < k ⇒ the sketch IS the distinct set),
    * else (k-1)·2^48 div h_k — one BIGINT floor division the oracle
    * replays bit-for-bit.
    */
  private def withKmvEstimate(df: DataFrame, sk: String, out: String): DataFrame =
    df.withColumn(out, {
      val m = size(col(sk)).cast("long")
      when(m < KmvK.toLong, m)
        .otherwise(expr(s"${KmvNum}L div element_at($sk, $KmvK)"))
    })

  /** q160: per-source distinct-shingle sketch summary — the
    * dup-count-invariant, k-bounded production surface for "how many
    * distinct 3-gram shingles does each source contribute" (q25/q123's
    * exact counterpart question at 100 TB). Emits the sketch occupancy,
    * the kth-smallest hash (the theta threshold; NULL while
    * unsaturated) and the estimate. Everything is a deterministic
    * integer function of the corpus, so the DuckDB oracle hash-gates
    * the full sketch math, and the spec separately pins estimator
    * QUALITY against a JVM exact count.
    */
  def q160KmvDistinct(s: SparkSession, d: String): DataFrame =
    withKmvEstimate(kmvSketches(s, d), "sk", "est_distinct")
      .select(col("source"),
        size(col("sk")).cast("long").as("n_kept"),
        when(size(col("sk")) >= KmvK, element_at(col("sk"), KmvK)).as("kth_h"),
        col("est_distinct"))
      .orderBy("source")

  /** q161: sketch-based cross-source overlap — the scale path for
    * q123's EXACT shingle-overlap matrix, whose corpus-sized equality
    * self-join on shingle hash is the cost a 100 TB pipeline cannot
    * pay per source pair. Union sketch = k smallest of the merged
    * sketches (standard KMV union; exact while under k), intersection
    * by inclusion–exclusion clamped at 0, Jaccard in micro-units.
    * All pairs (s1 < s2) are emitted — including non-overlapping ones,
    * which q123's inner join drops. The pair frame is #sources² rows
    * over k-length arrays: driver-trivial, PlanSpec-allowlisted theta
    * self-join.
    */
  def q161KmvOverlap(s: SparkSession, d: String): DataFrame = {
    val sk = withKmvEstimate(kmvSketches(s, d), "sk", "est")
    val a = sk.select(col("source").as("s1"), col("sk").as("sk1"),
      col("est").as("est1"))
    val b = sk.select(col("source").as("s2"), col("sk").as("sk2"),
      col("est").as("est2"))
    withKmvEstimate(
      a.join(b, col("s1") < col("s2"))
        .withColumn("mu", array_sort(array_union(col("sk1"), col("sk2")))),
      "mu", "est_union")
      .withColumn("est_inter",
        greatest(lit(0L), col("est1") + col("est2") - col("est_union")))
      .select(col("s1"), col("s2"), col("est1"), col("est2"),
        col("est_union"), col("est_inter"),
        when(col("est_union") > 0L,
          expr("(est_inter * 1000000) div est_union")).as("jaccard_est_micro"))
      .orderBy("s1", "s2")
  }

  // ---- trigram stupid-backoff LM scoring (q162) -------------------------

  /** TRIGRAM LM scoring with STUPID BACKOFF (Brants et al., EMNLP 2007
    * — "Large Language Models in Machine Translation", the canonical
    * distributed-LM scheme, designed precisely because at corpus scale
    * the unnormalized back-off S(w|context) needs no discounting pass):
    * each document scores as the sum/mean of
    *
    *   S(w | u,v) = c3(u,v,w)/c2(u,v)            if the trigram is in the LM
    *              = 0.4 · c2(v,w)/c1(v)          else if the bigram is
    *              = 0.4² · c1(w)/N               else if the unigram is
    *              = 0                             else (true OOV)
    *
    * with counts from a HELD-OUT LM slice (doc_id % 10 < 8), not the
    * scored doc itself — self-scoring would make every trigram a hit
    * and the backoff dead code (the q83 self-corpus design is the MLE
    * diagnostic; this is the inference shape: train slice → score
    * everything, and the 20% non-LM docs exercise every depth).
    *
    * Exactness (q83's integral discipline, backoff factors as exact
    * rationals): 0.4 = 2/5 and 0.16 = 4/25, so each per-position score
    * is ONE BIGINT floor division — micro(depth0) = 1e6·c3 div c2ctx,
    * micro(depth1) = 2e6·c2vw div (5·c1v), micro(depth2) = 4e6·c1w div
    * (25·N) — and the per-doc sum is order-invariant: the whole answer
    * hash-gates with NO rounding discipline. Depth conditions nest
    * safely: a trigram hit implies its context bigram is in c2 (same
    * slice), a (v,w) hit implies c1(v) > 0 — no denominator can be
    * NULL or 0 on its branch.
    *
    * Plan shape: three gram-keyed hash aggs build the LM tables
    * (map-side combined; open-vocabulary, so hash joins — never
    * broadcast-pinned), five keyed left joins score the exploded
    * trigram stream, the single-row N frame rides a broadcast cross
    * join (the q124 idiom), one doc-keyed agg. Every shuffle is keyed
    * on a gram or doc_id; nothing is corpus² anywhere.
    */
  def q162StupidBackoff(s: SparkSession, d: String): DataFrame =
    stupidBackoffCore(Tables.documents(s, d))

  /** The q162 pipeline over an arbitrary (doc_id, text) frame — split
    * out so the spec can plant a corpus where every backoff depth
    * (including true OOV, which the sf0.001 fixture's shared
    * vocabulary never produces) is reachable.
    */
  private[graft] def stupidBackoffCore(docs: DataFrame): DataFrame = {
    import graft.functions.expressions.TextExpressions.tokenShingles
    val lm = docs.filter(col("doc_id") % 10 < 8)
    def gramCounts(n: Int, cn: String): DataFrame =
      lm.select(explode(tokenShingles(tokens(col("text")), n)).as("g"))
        .groupBy("g").agg(count(lit(1)).as(cn))
    val c3 = gramCounts(3, "c3")
    val c2 = gramCounts(2, "c2")
    val c1 = gramCounts(1, "c1")
    val nTot = c1.agg(sum("c1").as("n_total"))
    val pos = docs
      .select(col("doc_id"),
        explode(tokenShingles(tokens(col("text")), 3)).as("g"))
      // tokens never contain spaces (StringTokenizer contract), so the
      // split is unambiguous
      .withColumn("v", element_at(split(col("g"), " "), 2))
      .withColumn("w", element_at(split(col("g"), " "), 3))
      .withColumn("ctx", concat_ws(" ",
        element_at(split(col("g"), " "), 1), col("v")))
      .withColumn("vw", concat_ws(" ", col("v"), col("w")))
    val scored = pos
      .join(c3, Seq("g"), "left")
      .join(c2.toDF("ctx", "c2ctx"), Seq("ctx"), "left")
      .join(c2.toDF("vw", "c2vw"), Seq("vw"), "left")
      .join(c1.toDF("v", "c1v"), Seq("v"), "left")
      .join(c1.toDF("w", "c1w"), Seq("w"), "left")
      .crossJoin(broadcast(nTot))
      .withColumn("depth",
        when(col("c3").isNotNull, 0L)
          .when(col("c2vw").isNotNull, 1L)
          .when(col("c1w").isNotNull, 2L)
          .otherwise(3L))
      .withColumn("micro",
        when(col("depth") === 0L, expr("(c3 * 1000000) div c2ctx"))
          .when(col("depth") === 1L, expr("(c2vw * 2000000) div (5 * c1v)"))
          .when(col("depth") === 2L, expr("(c1w * 4000000) div (25 * n_total)"))
          .otherwise(lit(0L)))
    val perDoc = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_pos"),
      sum(when(col("depth") === 0L, 1L).otherwise(0L)).as("n_tri"),
      sum(when(col("depth") === 1L, 1L).otherwise(0L)).as("n_bi"),
      sum(when(col("depth") === 2L, 1L).otherwise(0L)).as("n_uni"),
      sum(when(col("depth") === 3L, 1L).otherwise(0L)).as("n_oov"),
      sum("micro").as("score_sum_micro"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("score_sum_micro"), lit(0L)).as("score_sum_micro"),
        // null for docs with < 3 tokens: no evidence ≠ low score (q83)
        when(col("n_pos") > 0L, expr("score_sum_micro div n_pos"))
          .as("mean_score_micro"))
      .orderBy("doc_id")
  }
}
