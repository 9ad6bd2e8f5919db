package graft

import java.util.StringTokenizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Pins tokenization to the reference mapper's semantics
  * (`MapClass.java:22`: `new StringTokenizer(line, " ")`) — SURVEY §2.4.
  * The JDK StringTokenizer itself is the executable oracle; the property
  * test uses seeded random lines (scalatestplus isn't in the offline
  * dependency cache, so generation is hand-rolled).
  */
class TokenizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def engineTokens(lines: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    lines.toDF("value")
      .select(TextFunctions.tokens(col("value")).as("t"))
      .as[Seq[String]].collect().toSeq
  }

  private def oracleTokens(line: String): Seq[String] = {
    val st = new StringTokenizer(line, " ")
    Iterator.continually(st).takeWhile(_.hasMoreTokens).map(_.nextToken()).toSeq
  }

  test("SURVEY §2.4 semantics table") {
    val cases = Seq(
      "hello world" -> Seq("hello", "world"),
      "  leading  and   multiple spaces  " -> Seq("leading", "and", "multiple", "spaces"),
      "tab\tseparated stays\ttogether" -> Seq("tab\tseparated", "stays\ttogether"),
      "" -> Seq(),
      "   " -> Seq(),
      "punct, kept! as-is." -> Seq("punct,", "kept!", "as-is."))
    val got = engineTokens(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), actual) =>
      assert(actual == want, s"input=<$in>")
    }
  }

  test("property: engine tokenizer ≡ java.util.StringTokenizer(line, \" \") on random lines") {
    val rng = new scala.util.Random(42)
    val atoms = Seq(" ", " ", "\t", "é", "中", "😀", ",", ".", "ab", "Xy9", "—")
    val lines = Seq.fill(200) {
      Seq.fill(rng.nextInt(12))(atoms(rng.nextInt(atoms.length))).mkString
    }
    val got = engineTokens(lines)
    lines.zip(got).foreach { case (line, actual) =>
      assert(actual == oracleTokens(line), s"input=<$line>")
    }
  }
}
