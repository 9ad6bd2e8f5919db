package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** MEASUREMENT main (Test/runMain graft.ContainmentRecallProbe): LSH
  * candidate recall on extreme-ratio containment pairs — the
  * documented q113 caveat, quantified.
  *
  * Fixture: for each length ratio r ∈ {8, 16, 32}, plant `nPairs`
  * (short, long) pairs where the long doc embeds the short doc's text
  * verbatim and pads with unique filler tokens to r× the length
  * (containment = 1.0 by construction, shingle-Jaccard ≈ 1/r), on top
  * of a unique-token background corpus. Recall = planted pairs present
  * in lshCandidatePairs (and in the q113 output at threshold 0.8 —
  * identical by construction since verification can't reject a
  * containment-1.0 pair).
  */
object ContainmentRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(7)
    val nPairs = 50
    val shortToks = 26
    val ratios = Seq(8, 16, 32)

    def tok(prefix: String, i: Int): String = s"$prefix$i"
    var nextId = 0L
    def id(): Long = { nextId += 1; nextId }

    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    // background: 200 all-unique-token docs (no accidental collisions)
    (1 to 200).foreach { b =>
      val t = (1 to 40).map(i => tok(s"bg${b}x", i)).mkString(" ")
      rows += ((id(), t, "en", "bg", t.length.toLong))
    }
    val planted = ratios.map { r =>
      r -> (1 to nPairs).map { p =>
        val base = (1 to shortToks).map(i => tok(s"r${r}p${p}s", i))
        val shortText = base.mkString(" ")
        val filler = (1 to (r - 1) * shortToks)
          .map(i => tok(s"r${r}p${p}f", i))
        // embed the quote at a random offset within the filler stream
        val cut = rnd.nextInt(filler.length + 1)
        val longText =
          (filler.take(cut) ++ base ++ filler.drop(cut)).mkString(" ")
        val sid = id(); val lid = id()
        rows += ((sid, shortText, "en", s"short_r$r", shortText.length.toLong))
        rows += ((lid, longText, "en", s"long_r$r", longText.length.toLong))
        (sid, lid)
      }
    }

    val dir = java.nio.file.Files.createTempDirectory("contain_probe").toString
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cand = Dedup.lshCandidatePairs(spark, dir)
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .as[(Long, Long)].collect().toSet
    val verified = Dedup.q113ContainmentPairs(spark, dir)
      .select(col("contained_doc"), col("container_doc"))
      .as[(Long, Long)].collect().toSet
    val exact = Dedup.q121ContainmentExact(spark, dir)
      .select(col("contained_doc"), col("container_doc"))
      .as[(Long, Long)].collect().toSet

    println(f"%nratio  planted  cand-recall  q113-recall  q121-recall")
    planted.foreach { case (r, pairs) =>
      val hitC = pairs.count { case (s0, l0) =>
        cand(math.min(s0, l0) -> math.max(s0, l0)) }
      val hitV = pairs.count { case (s0, l0) => verified(s0 -> l0) }
      val hitE = pairs.count { case (s0, l0) => exact(s0 -> l0) }
      println(f"$r%5d  ${pairs.size}%7d  ${hitC.toDouble / pairs.size}%11.2f  ${hitV.toDouble / pairs.size}%11.2f  ${hitE.toDouble / pairs.size}%11.2f")
    }
    spark.stop()
  }
}
