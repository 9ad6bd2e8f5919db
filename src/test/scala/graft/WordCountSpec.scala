package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.wordcount.WordCountJob

/** End-to-end golden test for the reference-parity WordCount pipeline
  * (SURVEY §5.2(2)): byte-compare the single output part file, including
  * the UTF-8-byte-order collation case the reference's Text comparator
  * implies (SURVEY §2.6), plus the sink/CLI failure contracts.
  */
class WordCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runJob(lines: Seq[String]): Seq[String] = {
    val in = Files.createTempDirectory("wc_in")
    val out = Files.createTempDirectory("wc_out_parent").resolve("out")
    Files.write(in.resolve("input.txt"), lines.asJava)
    WordCountJob.run(spark, in.toString, out.toString)
    val part = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(part.size == 1, "single-file sink must produce exactly one part file")
    Files.readAllLines(part.head).asScala.toSeq
  }

  test("golden: counts, tabs-in-tokens, multi-space, empty lines") {
    val got = runJob(Seq(
      "hello world",
      "  leading  and   multiple spaces  ",
      "",
      "hello world hello"))
    assert(got == Seq(
      "and\t1", "hello\t3", "leading\t1", "multiple\t1", "spaces\t1", "world\t2"))
  }

  test("collation: supplementary-plane chars sort in UTF-8 byte order, not UTF-16") {
    // U+FFFD < U+1F600 in UTF-8 byte order; UTF-16 code-unit order says
    // the opposite (surrogates) — SURVEY §2.6 (verified against Hadoop
    // Text.Comparator semantics).
    val got = runJob(Seq("� 😀 zz"))
    assert(got == Seq("zz\t1", "�\t1", "😀\t1"))
  }

  test("gzipped input decompresses transparently (TextInputFormat codec parity)") {
    // Hadoop's TextInputFormat decompresses .gz inputs by extension, and
    // the reference inherits that for free — so must spark.read.text
    val in = Files.createTempDirectory("wc_gz_in")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(in.resolve("input.txt.gz")))
    gz.write("hello world\nhello\n".getBytes("UTF-8")); gz.close()
    val out = Files.createTempDirectory("wc_gz_out_parent").resolve("out")
    WordCountJob.run(spark, in.toString, out.toString)
    val part = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(Files.readAllLines(part.head).asScala.toSeq ==
      Seq("hello\t2", "world\t1"))
  }

  test("scale path: multi-part output concatenates to the same global order") {
    val in = Files.createTempDirectory("wc_in_mp")
    val out = Files.createTempDirectory("wc_out_mp_parent").resolve("out")
    val words = (1 to 500).map(i => f"w$i%03d")
    val rng = new scala.util.Random(7)
    Files.write(in.resolve("input.txt"),
      rng.shuffle(words ++ words).grouped(10).map(_.mkString(" ")).toSeq.asJava)
    // singleFile = false: global orderBy range-partitions; part files in
    // filename order concatenate to the same total order as the 1-file
    // path (the reference's copyMerge idiom, SURVEY §7.4)
    WordCountJob.run(spark, in.toString, out.toString, singleFile = false)
    val parts = Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
      .sortBy(_.getFileName.toString)
    val concat = parts.flatMap(p => Files.readAllLines(p).asScala)
    assert(concat == words.map(w => s"$w\t2"))
  }

  test("copyMerge: part ordering is numeric, not lexicographic (past %05d padding)") {
    import graft.sources.Merge.partIndex
    assert(partIndex("part-00007-uuid.txt") == 7)
    assert(partIndex("part-99999-uuid.txt") == 99999)
    assert(partIndex("part-100000-uuid.txt") == 100000)
    val names = Seq("part-100000-a.txt", "part-99999-a.txt", "part-00001-a.txt")
    assert(names.sortBy(n => (partIndex(n), n)) ==
      Seq("part-00001-a.txt", "part-99999-a.txt", "part-100000-a.txt"))
    // lexicographic order would be wrong, which is the point
    assert(names.sorted != names.sortBy(n => (partIndex(n), n)))
  }

  test("copyMerge: concatenated multi-part output equals the single-file output byte-for-byte") {
    val in = Files.createTempDirectory("wc_in_cm")
    val words = (1 to 400).map(i => f"t$i%03d")
    val rng = new scala.util.Random(11)
    Files.write(in.resolve("input.txt"),
      rng.shuffle(words ++ words ++ words).grouped(7).map(_.mkString(" ")).toSeq.asJava)
    val outSingle = Files.createTempDirectory("wc_cm_s").resolve("out")
    val outMulti = Files.createTempDirectory("wc_cm_m").resolve("out")
    WordCountJob.run(spark, in.toString, outSingle.toString, singleFile = true)
    WordCountJob.run(spark, in.toString, outMulti.toString, singleFile = false)
    val merged = Files.createTempDirectory("wc_cm_merged").resolve("merged.tsv")
    val nParts = graft.sources.Merge.copyMerge(
      spark.sparkContext.hadoopConfiguration, outMulti.toString, merged.toString)
    assert(nParts >= 1)
    val singlePart = Files.list(outSingle).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.head
    assert(Files.readAllBytes(merged).sameElements(Files.readAllBytes(singlePart)))
  }

  test("sink: output dir must not pre-exist (FileOutputFormat contract)") {
    val in = Files.createTempDirectory("wc_in2")
    Files.write(in.resolve("a.txt"), Seq("x").asJava)
    val out = Files.createTempDirectory("wc_out_exists")
    intercept[Exception] {
      WordCountJob.run(spark, in.toString, out.toString)
    }
  }

  test("CLI: wrong arg count returns -1 with usage (WordCount.java:25-28)") {
    assert(WordCountJob.execute(Array("only-one")) == -1)
    assert(WordCountJob.execute(Array("a", "b", "c")) == -1)
    // -D options don't count toward the positional-arg contract
    assert(WordCountJob.execute(Array("-Dspark.graft.x=1", "only-one")) == -1)
  }

  test("CLI: -D overrides are parsed and land in the session conf (SURVEY §2.1 fixed-not-reproduced)") {
    val (conf, rest) = WordCountJob.parseDashD(
      Array("-Dspark.graft.marker=round3", "in", "-Dspark.graft.two=2", "out", "-Dnot-an-option"))
    assert(conf == Map("spark.graft.marker" -> "round3", "spark.graft.two" -> "2"))
    assert(rest.toSeq == Seq("in", "out", "-Dnot-an-option"))
    // end-to-end: execute() against the live test session must apply the
    // override to that session's runtime conf (and must NOT stop it)
    val in = Files.createTempDirectory("wc_in_dopt")
    val out = Files.createTempDirectory("wc_out_dopt_parent").resolve("out")
    Files.write(in.resolve("a.txt"), Seq("x y x").asJava)
    assert(WordCountJob.execute(
      Array("-Dspark.graft.marker=round3", in.toString, out.toString)) == 0)
    assert(spark.conf.get("spark.graft.marker") == "round3")
    assert(!spark.sparkContext.isStopped)
  }
}
