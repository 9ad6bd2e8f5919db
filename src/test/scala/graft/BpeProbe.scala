package graft

/** Merge-depth envelope measurement for BPE training (run via
  * Test/runMain): times q153's driver-sequenced merge loop at
  * increasing depths on the 20× corpora, so the per-merge cost — one
  * vocab-keyed pair aggregation, one driver argmax scalar, one
  * map-side greedy-fold pass, one eager checkpoint — is a measured
  * number with a measured linear bound instead of a design argument
  * (VERDICT r14 #4: a real tokenizer's ~30k merges are ~30k sequential
  * Spark jobs, where scheduler overhead could dominate; this says what
  * each one costs at 20×).
  *
  * The meaningful corpus is the ZIPF one (20k-word vocabulary → real
  * merge structure in the "w<rank>" digit strings); the dup-heavy
  * stress corpus's 31-word vocabulary exhausts its pair space after a
  * handful of merges, which the probe reports rather than hides
  * (emitted merge count < requested depth). Numbers land in NOTES
  * round 15 and SCALE.md.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("bpeprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-stress-zipf")
    val depths = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(8, 64, 256)
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    println(s"[bpeprobe] corpus $dir: $nDocs docs; depths=${depths.mkString(",")}")
    // warm the corpus-sized word count + codegen once so depth 1's
    // one-off costs aren't billed to the smallest depth
    graft.ops.TextOps.q153BpeTrain(spark, dir, merges = 1).count()
    var prevDepth = 0
    var prevSec = 0.0
    depths.foreach { m =>
      val t0 = System.nanoTime()
      val emitted = graft.ops.TextOps.q153BpeTrain(spark, dir, merges = m)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      val marginal =
        if (prevDepth > 0 && m > prevDepth) (dt - prevSec) / (m - prevDepth)
        else dt / m
      println(f"[bpeprobe] merges=$m%4d: $dt%7.2f s total, $emitted%4d emitted, ${dt / m}%.3f s/merge mean, $marginal%.3f s/merge marginal")
      prevDepth = m; prevSec = dt
      // storage hygiene check: the unpersist-one-behind in q153 should
      // keep the block-manager flat across depths
      val storageMb = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum / 1048576.0
      println(f"[bpeprobe] storage after depth $m: $storageMb%.0f MB")
    }
    spark.stop()
  }
}
