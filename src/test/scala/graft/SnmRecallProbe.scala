package graft

import graft.ops.Dedup

/** MEASUREMENT main (Test/runMain graft.SnmRecallProbe): q139
  * sorted-neighborhood (SNM) recall on planted true-dup pairs — the
  * documented heuristic trade of the sort family (a true dup whose
  * blocking keys land > w apart in BOTH sort orders is missed),
  * quantified the way ContainmentRecallProbe quantified q113's LSH
  * caveat.
  *
  * Fixture families, each of 50 planted pairs at Jaccard ≈ 0.9 (36
  * shared mid tokens + 2 private per member — comfortably above the
  * 0.6 verify threshold, so candidate generation is the only thing
  * that can lose a pair), on a 400-doc unique-token background:
  *
  * - `lastEdit`: members share everything up to the final tokens —
  *   IDENTICAL prefix keys (adjacent in pass-1 rank order), divergent
  *   suffix keys. The pair single-key SNM-on-suffix would miss.
  * - `firstEdit`: the mirror — divergent prefix keys (members start
  *   with `a…` vs `z…`, so the full background sits between them in
  *   pass-1 order), identical suffix keys. Pass 1 alone misses; pass 2
  *   finds at any w.
  * - `bothEdit`: first AND last tokens both private — keys land far
  *   apart in BOTH orders. The designed blind spot: multi-pass SNM
  *   should score ~0 here at any practical w.
  * - `crowd<c>` (c ∈ 4, 8, 16, 32): all c members of a crowd share the
  *   SAME ≥24-char leading and trailing token, so both ranks collapse
  *   to doc_id order and a planted pair sits exactly c/2 positions
  *   apart in BOTH passes. Found iff w − 1 ≥ c/2 — the window-vs-block-
  *   crowding curve, and the demonstration that multi-pass helps with
  *   key EDITS, not key COLLISIONS (both passes see the same distance).
  */
object SnmRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(11)
    val nPairs = 50

    var nextId = 0L
    def id(): Long = { nextId += 1; nextId }
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    def addDoc(text: String, src: String): Long = {
      val i = id(); rows += ((i, text, "en", src, text.length.toLong)); i
    }

    // background: unique-token docs whose keys scatter across the space
    (1 to 400).foreach { b =>
      addDoc((1 to 40).map(i => s"bg${rnd.nextInt(1 << 30)}x$i").mkString(" "), "bg")
    }

    def mids(tag: String): Seq[String] = (1 to 36).map(i => s"${tag}m$i")

    val planted = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(Long, Long)]]

    planted("lastEdit") = (1 to nPairs).map { p =>
      val m = mids(s"le$p")
      val a = addDoc((s"le${p}head" +: m :+ s"le${p}tailA" :+ s"le${p}xa").mkString(" "), "le")
      val b = addDoc((s"le${p}head" +: m :+ s"le${p}tailB" :+ s"le${p}xb").mkString(" "), "le")
      (a, b)
    }
    planted("firstEdit") = (1 to nPairs).map { p =>
      val m = mids(s"fe$p")
      val a = addDoc((s"aaahead${p}A" +: s"aaax${p}A" +: m :+ s"fe${p}tail").mkString(" "), "fe")
      val b = addDoc((s"zzzhead${p}B" +: s"zzzx${p}B" +: m :+ s"fe${p}tail").mkString(" "), "fe")
      (a, b)
    }
    // private head AND tail tokens, each EXACTLY 24 chars with the
    // divergent letters in front, so each key is entirely private text
    // diverging at char 0 (a longer tail token would have its leading
    // letters cut off by the last-24-chars window; a shorter one would
    // leave the window's leading chars to a shared mid token — either
    // way the pair would still sort adjacent in pass 2)
    planted("bothEdit") = (1 to nPairs).map { p =>
      val m = mids(s"be$p")
      val a = addDoc((s"aaabehead${p}A".padTo(24, 'x') +: m
        :+ s"aaabetail${p}A".padTo(24, 'x')).mkString(" "), "be")
      val b = addDoc((s"zzzbehead${p}B".padTo(24, 'x') +: m
        :+ s"zzzbetail${p}B".padTo(24, 'x')).mkString(" "), "be")
      (a, b)
    }
    // crowds: shared 25-char head/tail tokens pin both rank orders to
    // doc_id; pair members allocated c/2 ids apart
    for (c <- Seq(4, 8, 16, 32)) {
      val pairsPerCrowd = c / 2
      val nCrowds = math.max(1, nPairs / pairsPerCrowd)
      planted(s"crowd$c") = (1 to nCrowds).flatMap { g =>
        val head = f"crowdhead$c%02d${g}%03dpadpadpadpad" // ≥ 24 chars
        val tail = f"crowdtail$c%02d${g}%03dpadpadpadpad"
        val pairMids = (1 to pairsPerCrowd).map(k => mids(s"c$c-$g-$k"))
        // first members 1..c/2, then second members in the same order:
        // pair k = ids (base+k, base+c/2+k), distance exactly c/2
        val firsts = (1 to pairsPerCrowd).map(k =>
          addDoc((head +: (pairMids(k - 1) :+ s"c$c${g}${k}xa") :+ tail).mkString(" "), s"cr$c"))
        val seconds = (1 to pairsPerCrowd).map(k =>
          addDoc((head +: (pairMids(k - 1) :+ s"c$c${g}${k}xb") :+ tail).mkString(" "), s"cr$c"))
        firsts.zip(seconds)
      }
    }

    val dir = java.nio.file.Files.createTempDirectory("snm_probe").toString
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val ws = Seq(2, 4, 6, 8, 16, 32)
    println(f"%nfamily      pairs  " + ws.map(w => f"w=$w%-4d").mkString("  ") +
      "   (recall; multi-pass = found by either key)")
    val perW = ws.map { w =>
      w -> Dedup.q139SortedNeighborhood(spark, dir, w = w)
        .select("doc_a", "doc_b", "hit_prefix", "hit_suffix")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getBoolean(2), r.getBoolean(3)))
        .toMap
    }.toMap
    planted.foreach { case (fam, pairs) =>
      val cells = ws.map { w =>
        val found = perW(w)
        val hit = pairs.count { case (a, b) =>
          found.contains((math.min(a, b), math.max(a, b))) }
        f"${hit.toDouble / pairs.size}%.2f"
      }
      println(f"$fam%-10s  ${pairs.size}%5d  " + cells.map(c => f"$c%-5s").mkString("  "))
    }
    // single-pass split at the default window, for the multi-pass claim
    println("\nper-pass split at w=6 (prefix-only / suffix-only / either):")
    planted.foreach { case (fam, pairs) =>
      val found = perW(6)
      def cnt(f: ((Boolean, Boolean)) => Boolean) = pairs.count { case (a, b) =>
        found.get((math.min(a, b), math.max(a, b))).exists(f) }
      val p = cnt(_._1); val s0 = cnt(_._2); val e = cnt(_ => true)
      println(f"$fam%-10s  ${p.toDouble / pairs.size}%.2f / ${s0.toDouble / pairs.size}%.2f / ${e.toDouble / pairs.size}%.2f")
    }
    spark.stop()
  }
}
