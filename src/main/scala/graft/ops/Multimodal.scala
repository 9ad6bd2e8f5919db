package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The fixtures carry no real image/audio bytes, so the payload here is
  * the UTF-8 encoding of `documents.text` — the POINT is the Spark-side
  * plumbing (binary columns, metadata extraction, batch-shaped
  * per-partition decode), which is real and tested. The actual media
  * decode is a clearly-marked deterministic stub (this container has no
  * image/audio libraries).
  */
object Multimodal {

  /** Binary payload + SQL-derivable metadata: byte length, content hash,
    * and fake decoded dimensions derived deterministically from the
    * payload (stands in for width/height of a decoded image).
    */
  def q50BinaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        (octet_length(col("payload")) % 640).cast("long").as("fake_width"),
        (col("doc_id") * 7 % 480).cast("long").as("fake_height"))
      .orderBy("doc_id")

  /** Frame sampling: every `step`-th frame index per media payload —
    * the pre-processing pass that turns video into a bounded set of
    * frames for feature extraction. Generation (explode of a sequence)
    * keeps it distributed and shuffle-free; the frame COUNT comes from
    * the same deterministic stub arithmetic as [[decodeBatch]]
    * (1 + n_bytes % 16), so the sampling plumbing is oracle-gated even
    * though the decode itself is stubbed. A real pipeline feeds
    * frame_idx into the per-partition decoder to seek+extract.
    */
  def q68FrameSample(s: SparkSession, d: String, step: Int = 4): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        (lit(1) + octet_length(col("payload")) % 16).cast("long").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(step.toLong))).as("frame_idx"))
      .withColumn("sample_ord", expr(s"frame_idx div $step"))
      .orderBy("doc_id", "frame_idx")

  /** Per-FRAME feature extraction + per-media pooling — the shape of
    * every video/audio feature pipeline (decode → per-frame features →
    * clip-level pooling): sampled frame indices from the q68 arithmetic
    * (same stub frame count, same stride — keep in lockstep), a
    * deterministic per-frame stub "brightness" (integer arithmetic on
    * (doc_id, frame_idx, n_bytes) standing in for the decoded pixel
    * statistic), then per-media min/max/mean pooling with the mean as
    * an exact integer ratio. The frame fan-out collapses map-side
    * (partial agg) before the doc-keyed shuffle, so the exchanged rows
    * are media-sized, not frame-sized — at 100 TB of video that is the
    * difference between shuffling clips and shuffling frames.
    */
  def q114FrameFeatures(s: SparkSession, d: String, step: Int = 4): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .withColumn("n_frames", lit(1L) + col("n_bytes") % 16)
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(step.toLong))).as("frame_idx"))
      .withColumn("brightness",
        (col("doc_id") * 31L + col("frame_idx") * 17L + col("n_bytes")) % 256L)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        min("brightness").as("min_brightness"),
        max("brightness").as("max_brightness"),
        graft.functions.Round.r4(
          sum("brightness").cast("double") / count(lit(1))).as("mean_brightness"))
      .orderBy("doc_id")

  /** PERCEPTUAL-HASH media near-dup (q155) — dHash over the binary
    * payload column, banded for scale: the q33 SimHash move (banded
    * Hamming blocking, never all-pairs) applied to MEDIA bytes, which
    * closes the multimodal family's dedup gap (re-encoded or
    * lightly-edited media shares a perceptual fingerprint even when
    * sha256 differs — q30's exact hash can't see it).
    *
    * The dHash pipeline is structurally the real thing:
    *  1. DECODE/RESIZE (stub): fold the payload bytes into an 8×9
    *     "grayscale grid" — cell i sums bytes at positions ≡ i
    *     (mod 72). A real pipeline swaps this fold for
    *     decode+grayscale+resize(9×8); everything downstream is
    *     unchanged. Deterministic byte arithmetic (hex-pair parse, the
    *     q67 engine-portable idiom) so the DuckDB oracle replays it.
    *  2. GRADIENT BITS: per row r, bit c = [cell(r,c+1) > cell(r,c)]
    *     — 8 row-adjacent comparisons × 8 rows = the 64-bit dHash,
    *     carried as 8 one-byte BAND values (b0..b7; a single BIGINT
    *     would need the sign bit, which DuckDB refuses to shift into).
    *  3. BANDED BLOCKING: candidates from an equality join on
    *     (band, value). Pigeonhole gives EXACT recall at the gated
    *     threshold: hamming ≤ 7 over 8 bands forces ≥ 1 identical
    *     band, so unlike the probabilistic q31/q33 recall this blocking
    *     loses nothing.
    *  4. VERIFY: hamming = Σ_band bit_count(xor) on candidates only;
    *     keep pairs ≤ `maxHamming`.
    *
    * Dup-heavy scale shape: payload is a pure function of the text, so
    * the exact-text contraction applies (q148's discipline, shared
    * memo) — signatures are computed once per DISTINCT payload, pairs
    * are emitted at REP level with member counts (the q31 oracle's
    * members_a/members_b design), and the 20× stress corpus costs the
    * same as sf0.1 plus one closed-form self-row per dup group. The
    * byte explode is the decode pass itself — corpus-linear, folded by
    * a map-side partial agg into ≤ 72 rows per doc before any
    * exchange.
    */
  // dHash band-vector memo per (session, dir, corpus fingerprint) — the
  // sigCache discipline (Dedup.contentHashes): the decode fold + grid
  // build run once per corpus, every q155 call (and the bench's
  // warm+timed protocol) probes the persisted rep-count-sized frame;
  // a corpus changing under a cached dir evicts by fingerprint
  private val phashCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  /** Drop memoized dHash band frames (unpersisting live ones) — same
    * contract as [[graft.ops.Dedup.invalidateSignatureCache]].
    */
  def invalidatePhashCache(): Unit = phashCache.synchronized {
    phashCache.values.foreach { df =>
      try df.unpersist() catch { case _: Throwable => () }
    }
    phashCache.clear()
  }

  def q155PhashNearDup(s: SparkSession, d: String, maxHamming: Int = 7)
      : DataFrame = {
    val bandsN = 8
    val (repDocs, _) = TextOps.textContraction(s, d)
    val hx = repDocs.select(col("doc_id"), col("copies"),
      lower(hex(encode(col("text"), "UTF-8"))).as("hx"))
    val cells = hx
      .select(col("doc_id"),
        explode(sequence(lit(1), (length(col("hx")) / lit(2)).cast("int")))
          .as("p"),
        col("hx"))
      .select(col("doc_id"), ((col("p") - 1) % lit(72)).cast("long").as("cell"),
        conv(col("hx").substr(col("p") * 2 - 1, lit(2)), 16, 10)
          .cast("long").as("v"))
      .groupBy("doc_id", "cell").agg(sum("v").as("v"))
    val grid = cells.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("cell"), col("v"))))
        .as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(71L)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("g"))
    val bandArr = array((0 until bandsN).map { r =>
      (0 until 8).map { c =>
        when(element_at(col("g"), r * 9 + c + 2)
          > element_at(col("g"), r * 9 + c + 1), lit(1L << c))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    // bands twice: EXPLODED for the blocking join, as an ARRAY column
    // for the verify — so a candidate pair verifies with one map-side
    // unrolled 8-term bit_count instead of an 8-row join+agg. Verify
    // runs BEFORE distinct (the q101 regime rule: band-collision
    // multiplicity here is ~1.04 — 938k occurrences vs 904k pairs at
    // sf0.1 — so a pre-verify distinct shuffles the whole candidate
    // space to save almost nothing, while ham ≤ 7 survivors are a few
    // hundred rows); the band-vector frames are rep-count-sized and
    // broadcast, so candidates never shuffle at all
    // materialized ONCE into the session memo: bandVec feeds four plan
    // branches (both sides of the blocking self-join + both broadcast
    // verify sides), and without truncation each branch re-runs the
    // whole byte-decode lineage — measured 4× the decode pass, ~8 s of
    // q155's first-cut 7.5 s at sf0.1. The frame is rep-count × 9
    // longs — trivially resident at any scale where the rep set itself
    // is manageable
    val bandVec = phashCache.synchronized {
      val fp = graft.core.Fingerprint.of(s, d, "documents")
      phashCache.keys
        .filter(k => k._1 == s && k._2 == d && k._3 != fp)
        .foreach { stale =>
          phashCache.remove(stale).foreach { df =>
            try df.unpersist() catch { case _: Throwable => () }
          }
        }
      phashCache.getOrElseUpdate((s, d, fp), {
        val f = grid.select(col("doc_id"), bandArr.as("bands"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count()
        f
      })
    }
    val bands = bandVec
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bv")))
    val hamExpr = (0 until bandsN).map { r =>
      bit_count(element_at(col("ba"), r + 1)
        .bitwiseXOR(element_at(col("bb"), r + 1)))
    }.reduce(_ + _).cast("long")
    val ham = bands
      .select(col("doc_id").as("doc_a"), col("band"), col("bv"))
      // the blocking join's build side is the rep-count-sized band
      // frame — broadcast it explicitly so the candidate space is
      // generated map-side (and the strategy can't flip to a shuffle
      // join on a size misestimate)
      .join(broadcast(bands.select(col("doc_id").as("doc_b"),
        col("band"), col("bv"))), Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .join(broadcast(bandVec.select(col("doc_id").as("doc_a"),
        col("bands").as("ba"))), Seq("doc_a"))
      .join(broadcast(bandVec.select(col("doc_id").as("doc_b"),
        col("bands").as("bb"))), Seq("doc_b"))
      .withColumn("hamming", hamExpr)
      .filter(col("hamming") <= lit(maxHamming.toLong))
      .select("doc_a", "doc_b", "hamming")
      .distinct()
    val members = hx.select(col("doc_id"), col("copies"))
    val crossRows = ham
      .join(members.select(col("doc_id").as("doc_a"),
        col("copies").as("members_a")), Seq("doc_a"))
      .join(members.select(col("doc_id").as("doc_b"),
        col("copies").as("members_b")), Seq("doc_b"))
      .select("doc_a", "doc_b", "hamming", "members_a", "members_b")
    // identical payloads (hamming 0 by construction) surface as one
    // closed-form self-row per multi-copy group, the q31 oracle design
    val selfRows = members.filter(col("copies") >= 2L)
      .select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b"),
        lit(0L).as("hamming"), col("copies").as("members_a"),
        col("copies").as("members_b"))
    crossRows.unionByName(selfRows).orderBy("doc_a", "doc_b")
  }

  /** Decoded-media record produced by the per-partition decode pass. */
  case class DecodedMedia(doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, n_frames: Int)

  /** Batch decode over binary payloads via mapPartitions — the shape a
    * real pipeline uses (decoder initialized once per partition, rows
    * streamed through it; on a cluster each executor core runs one
    * decoder instance).
    *
    * STUB: `decodeStub` fabricates deterministic metadata from the raw
    * bytes in place of a real image/audio decoder (none is available in
    * this container). Swap `decodeStub` for a real codec binding to
    * productionize; nothing else changes.
    */
  def decodeBatch(s: SparkSession, d: String): Dataset[DecodedMedia] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one "decoder" per partition (stands in for e.g. libjpeg init)
        val decoder = decodeStub _
        rows.map { case (id, bytes) => decoder(id, bytes) }
      }
  }

  /** Deterministic fake decoder: derives pseudo-metadata from payload
    * bytes. A real implementation would parse the container format here.
    */
  private def decodeStub(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val fmt = if (bytes.length % 2 == 0) "png" else "jpeg"
    val w = 64 + (bytes.headOption.getOrElse(0: Byte).toInt & 0x7f)
    val h = 64 + (bytes.lastOption.getOrElse(0: Byte).toInt & 0x7f)
    DecodedMedia(id, bytes.length, fmt, w, h, 1 + (bytes.length % 16))
  }
}
