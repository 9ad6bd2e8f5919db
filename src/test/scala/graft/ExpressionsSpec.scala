package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, VectorFunctions}

/** The custom Catalyst expressions must be BIT-IDENTICAL to the
  * composable built-ins formulations they replace (the DuckDB oracle
  * mirrors the built-ins semantics).
  */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("FloatDot ≡ aggregate(zip_with(...)) bit-for-bit on fixture embeddings") {
    import spark.implicits._
    val e = graft.core.Tables.embeddings(spark, TestSpark.sf).limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(500)
    val diff = pairs.select(
      VectorFunctions.dot(col("va"), col("vb")).as("fast"),
      VectorFunctions.dotHof(col("va"), col("vb")).as("spec"))
      .filter(col("fast") =!= col("spec"))
      .count()
    assert(diff == 0L)
  }

  test("FloatDot interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq((Array(1.5f, -2.0f, 3.25f), Array(0.5f, 4.0f, -1.0f)))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head()
    assert(got == (1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.0))
  }

  test("BitsetIntersectCount ≡ aggregate(zip_with(bit_count(&))) on random masks") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      val nw = 1 + rnd.nextInt(32)
      (Array.fill(nw)(rnd.nextLong()), Array.fill(nw)(rnd.nextLong()))
    }
    val df = rows.toDF("ma", "mb")
    val diff = df.select(
      graft.functions.expressions.FloatVecExpressions
        .bitsetIntersectCount(col("ma"), col("mb")).as("fast"),
      expr("CAST(aggregate(zip_with(ma, mb, (x, y) -> bit_count(x & y)), " +
        "0, (acc, c) -> acc + c) AS BIGINT)").as("spec"))
      .filter(col("fast") =!= col("spec"))
      .count()
    assert(diff == 0L)
  }

  test("BitsetIntersectCount interpreted eval matches a hand computation") {
    import spark.implicits._
    val df = Seq((Array(0xFL, 0x3L), Array(0x6L, 0x1L))).toDF("a", "b")
    val got = df.select(graft.functions.expressions.FloatVecExpressions
      .bitsetIntersectCount(col("a"), col("b"))).as[Long].head()
    // 0xF & 0x6 = 0x6 (2 bits); 0x3 & 0x1 = 0x1 (1 bit)
    assert(got == 3L)
  }

  test("TokenShingles ≡ transform/slice/array_join formulation on fixture docs") {
    import spark.implicits._
    val d = graft.core.Tables.documents(spark, TestSpark.sf)
      .withColumn("toks", TextFunctions.tokens(col("text")))
    val diff = d.select(
      TextFunctions.shingles3(col("toks")).as("fast"),
      TextFunctions.shingles3Hof(col("toks")).as("spec"))
      .filter(col("fast") =!= col("spec"))
      .count()
    assert(diff == 0L)
  }

  test("StringTokens ≡ split+filter formulation on fixture docs") {
    val d = graft.core.Tables.documents(spark, TestSpark.sf)
    val diff = d.select(
      TextFunctions.tokens(col("text")).as("fast"),
      TextFunctions.tokensHof(col("text")).as("spec"))
      .filter(!(col("fast") <=> col("spec")))
      .count()
    assert(diff == 0L)
  }

  test("StringTokens edge cases: empties, runs of spaces, multibyte, null") {
    import spark.implicits._
    val df = Seq("", " ", "  a  b ", "a", "😀 b", "ü ß").toDF("t")
    val got = df.select(TextFunctions.tokens(col("t")).as("x"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq(), Seq(), Seq("a", "b"), Seq("a"), Seq("😀", "b"), Seq("ü", "ß")))
    val nulls = Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.tokens(col("t")).as("x")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("ArrayIntersectCount ≡ size(array_intersect) on fixture token pairs") {
    import graft.functions.expressions.TextExpressions.arrayIntersectCount
    val d = graft.core.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val a = d.select(col("doc_id").as("ia"), col("toks").as("ta"))
    val b = d.select(col("doc_id").as("ib"), col("toks").as("tb"))
    // NON-distinct arrays too: the contract must match for any input
    val pairs = a.join(b, col("ia") % 7 === col("ib") % 7 && col("ia") < col("ib"))
    val diff = pairs.select(
      arrayIntersectCount(col("ta"), col("tb")).as("fast"),
      size(array_intersect(col("ta"), col("tb"))).as("spec"))
      .filter(col("fast") =!= col("spec"))
      .count()
    assert(diff == 0L)
  }

  test("TokenCounts ≡ explode(tokens)+groupBy count on fixture docs") {
    import spark.implicits._
    val d = graft.core.Tables.documents(spark, TestSpark.sf)
    val viaExpr = d.select(col("doc_id"),
        explode(graft.functions.expressions.TextExpressions.tokenCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.token").as("token"),
        col("tc.cnt").cast("long").as("cnt"))
    val viaAgg = d.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    assert(viaExpr.exceptAll(viaAgg).count() == 0L &&
      viaAgg.exceptAll(viaExpr).count() == 0L)
  }

  test("TokenCounts edge cases: empty, spaces-only, repeats, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("   "), Some("a b a  a"), None).toDF("t")
    val got = df.select(graft.functions.expressions.TextExpressions
        .tokenCounts(col("t")).as("tc"))
      .as[Option[Seq[(String, Int)]]].collect().toSeq
    assert(got == Seq(Some(Seq()), Some(Seq()),
      Some(Seq(("a", 3), ("b", 1))), None))
  }

  test("input type contracts: wrong-typed input fails at analysis, not execution") {
    import spark.implicits._
    val df = Seq((1, Array(1, 2))).toDF("n", "ints")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.expressions.TextExpressions
        .stringTokens(col("n"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.expressions.TextExpressions
        .arrayIntersectCount(col("ints"), col("ints"))).collect()
    }
  }

  test("ArrayIntersectCount ≡ size(array_intersect) on null-bearing arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq[String]("a", null, "b", null), Seq[String](null, "b", "c")),
      (Seq[String]("a", null), Seq[String]("a", "b")),
      (Seq[String]("x"), Seq[String](null)))
      .toDF("a", "b")
    val diff = df.select(
      graft.functions.expressions.TextExpressions
        .arrayIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("spec"))
      .filter(col("fast") =!= col("spec")).count()
    assert(diff == 0L)
  }

  test("TokenShingles edge cases: short arrays") {
    import spark.implicits._
    val df = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "b", "c", "d"))
      .toDF("toks")
    val got = df.select(TextFunctions.shingles3(col("toks")).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq(), Seq(), Seq("a b c"), Seq("a b c", "b c d")))
  }

  test("portable rounding: floor-based r2/r4 behave as round-half-up") {
    import spark.implicits._
    import graft.functions.Round._
    val df = Seq(1.005, 2.675, -1.005, 0.12345).toDF("x")
    val got = df.select(r2(col("x")).as("r")).as[Double].collect().toSeq
    // NOTE: these are the DOUBLE values' floor(x*100+0.5)/100 results —
    // deterministic and engine-portable, which is the contract; the
    // decimal-pretty answer is NOT (1.005 is stored as 1.00499…, while
    // 2.675*100.0 rounds to exactly 267.5 under IEEE multiplication).
    assert(got == Seq(1.0, 2.68, -1.0, 0.12))
  }

  test("StripAccents: Latin accents fold, non-Latin and ASCII pass through") {
    import spark.implicits._
    import graft.functions.expressions.TextExpressions.stripAccents
    // expected values PROBED from DuckDB strip_accents (the oracle this
    // expression must match): Latin folds, kana voicing mark stripped,
    // Hangul stays COMPOSED (NFC recomposition), supplementary-plane
    // marks (U+1D165 Mc, U+11100 Mn) stripped via code-point iteration
    val cases = Seq(
      "café" -> "cafe", "Émile" -> "Emile", "über" -> "uber",
      "niño" -> "nino", "çafé dönér" -> "cafe doner",
      "plain ascii 123" -> "plain ascii 123", // ASCII fast path
      "mixed tëxt ok" -> "mixed text ok",
      "中文 unchanged" -> "中文 unchanged", // no combining marks: untouched
      "ば" -> "は",
      "한국어" -> "한국어",
      "x𝅥y" -> "xy",
      "a𑄀b" -> "ab",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(stripAccents(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
    val nulls = Seq[Option[String]](None).toDF("t")
      .select(stripAccents(col("t"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("StripAccents: precomposed and decomposed input normalize identically") {
    import spark.implicits._
    import graft.functions.expressions.TextExpressions.stripAccents
    // é as U+00E9 vs e + U+0301 (combining acute): NFD inside the
    // expression makes both collapse to the same stripped form
    val df = Seq("café", "café").toDF("t")
    val got = df.select(stripAccents(col("t"))).as[String].collect().toSeq
    assert(got == Seq("cafe", "cafe"))
  }

  test("SQL surface: every registered custom function resolves in spark.sql and equals its Column twin") {
    import graft.functions.expressions.TextExpressions._
    def one(sql: String) = spark.sql(sql).collect().head
    assert(one("SELECT string_tokens('  a  b ') AS r").getSeq[String](0) == Seq("a", "b"))
    assert(one("SELECT token_shingles(array('a','b','c'), 2) AS r")
      .getSeq[String](0) == Seq("a b", "b c"))
    assert(one("SELECT array_intersect_count(array('a','b'), array('b','c')) AS r")
      .getInt(0) == 1)
    assert(one("SELECT float_dot(CAST(array(1.0, 2.0) AS array<float>), CAST(array(3.0, 4.0) AS array<float>)) AS r")
      .getDouble(0) == 11.0)
    assert(one("SELECT strip_accents('çafé') AS r").getString(0) == "cafe")
    // byte_fold_cells: hand-computed fold ("abcde" into 2 cells:
    // a+c+e = 97+99+101 = 297, b+d = 98+100 = 198) and Column-twin parity
    assert(one("SELECT byte_fold_cells(encode('abcde', 'UTF-8'), 2) AS r")
      .getSeq[Long](0) == Seq(297L, 198L))
    val bfSql = one("SELECT byte_fold_cells(encode('abcde', 'UTF-8'), 3) AS r")
      .getSeq[Long](0)
    val bfCol = spark.range(1)
      .select(graft.functions.expressions.MediaExpressions
        .byteFoldCells(org.apache.spark.sql.functions
          .encode(org.apache.spark.sql.functions.lit("abcde"), "UTF-8"), 3)
        .as("r"))
      .head().getSeq[Long](0)
    assert(bfSql == bfCol && bfSql == Seq(97L + 100L, 98L + 101L, 99L))
    // dhash_bands ≡ the composed fold-then-compare formulation (the
    // fused expression must be bit-identical to what it fused)
    val text = "the quick brown fox jumps over the lazy dog " * 4
    val dhSql = one(s"SELECT dhash_bands(encode('$text', 'UTF-8')) AS r")
      .getSeq[Long](0)
    val cellsRef = {
      val cells = Array.fill(72)(0L)
      text.getBytes("UTF-8").zipWithIndex
        .foreach { case (b, j) => cells(j % 72) += (b & 0xff).toLong }
      (0 until 8).map { r =>
        (0 until 8).map { c =>
          if (cells(r * 9 + c + 1) > cells(r * 9 + c)) 1L << c else 0L
        }.sum
      }
    }
    assert(dhSql == cellsRef && dhSql.length == 8)
    // token_counts: equality with its Column twin
    val viaSql = spark.sql("SELECT token_counts('x y x') AS r")
      .selectExpr("explode(r) AS e").selectExpr("e.*").collect().toSet
    val viaCol = spark.range(1)
      .select(tokenCounts(org.apache.spark.sql.functions.lit("x y x")).as("r"))
      .selectExpr("explode(r) AS e").selectExpr("e.*").collect().toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // misuse fails at analysis/resolution, not execution: wrong input
    // type (ExpectsInputTypes) and a non-literal shingle width
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT string_tokens(42)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT token_shingles(array('a'), 'two')").collect()
    }
    // byte_fold_cells rejects non-positive cell counts at RESOLUTION
    // (n = 0 would otherwise reach the generated `i % 0` as a raw
    // per-row ArithmeticException; n < 0 a NegativeArraySizeException)
    for (bad <- Seq(0, -3)) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT byte_fold_cells(encode('a', 'UTF-8'), $bad)").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("n must be >= 1")),
        s"expected a clear n>=1 rejection for n=$bad, got: $e")
    }
  }

  test("optimizer rule: size(array_intersect) on string arrays rewrites to array_intersect_count") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("a", "a", null), Seq(null, "a")))
      .toDF("x", "y")
      // repartition keeps ConvertToLocalRelation from folding the whole
      // projection before the plan string can be inspected
      .repartition(1)
      .select(org.apache.spark.sql.functions
        .expr("size(array_intersect(x, y)) AS n"))
    // the rewrite fired...
    assert(df.queryExecution.optimizedPlan.toString.contains("array_intersect_count"),
      df.queryExecution.optimizedPlan.toString)
    // ...and the answers are the builtin's (null element in both → 1)
    assert(df.as[Int].collect().toSeq == Seq(2, 0, 2))
    // non-string arrays stay on the builtin (the expression is
    // string-typed; silently rewriting ints would be an analysis break)
    val ints = Seq((Seq(1, 2), Seq(2, 3))).toDF("x", "y")
      .repartition(1)
      .select(org.apache.spark.sql.functions
        .expr("size(array_intersect(x, y)) AS n"))
    assert(!ints.queryExecution.optimizedPlan.toString.contains("array_intersect_count"))
    assert(ints.as[Int].collect().toSeq == Seq(1))
  }

  test("KcenterNearest ≡ least()-of-(d2, rk)-structs chain at k=6 and k=64 on fixture embeddings") {
    import graft.ops.Similarity
    val e = graft.core.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), Similarity.microVec(col("embedding")).as("mvec"))
    for (k <- Seq(6, 64)) {
      // deterministic center list straight off the corpus (first k by
      // vec_id) — duplicate vectors in the dup-heavy fixture exercise
      // the tie-to-earlier-rank rule at both sizes
      val centers = e.orderBy("vec_id").limit(k)
        .collect().map(_.getSeq[Long](1).toArray)
      val scored = centers.zipWithIndex.map { case (mv, i) =>
        struct(Similarity.dist2(col("mvec"), lit(mv)), lit(i + 1L))
      }
      val specBest = if (scored.length == 1) scored.head
        else least(scored.toIndexedSeq: _*)
      val diff = e.select(
          graft.functions.expressions.FloatVecExpressions
            .kcenterNearest(col("mvec"), centers).as("kn"),
          specBest.getField("col1").as("d2_spec"),
          specBest.getField("col2").as("rk_spec"))
        .filter(col("kn").getItem(0) =!= col("d2_spec") ||
          col("kn").getItem(1) =!= col("rk_spec"))
        .count()
      assert(diff == 0L, s"k=$k: codegen argmin diverges from least() chain")
    }
  }

  test("KcenterNearest hand computation: tie to earlier rank, length-mismatch prefix fold, null in → null out") {
    import spark.implicits._
    // centers: rk1 = origin, rk2 = (3,4), rk3 = duplicate origin
    val centers = Array(Array(0L, 0L), Array(3L, 4L), Array(0L, 0L))
    val got = Seq(
        Tuple1(Array(0L, 0L)),   // tie between rk1 and rk3 → rk1
        Tuple1(Array(3L, 4L)),   // exact hit on rk2
        Tuple1(Array(3L)))       // shorter vector: prefix fold (d2 to rk2 = 0 over 1 dim)
      .toDF("mvec")
      .select(graft.functions.expressions.FloatVecExpressions
        .kcenterNearest(col("mvec"), centers).as("kn")).collect()
      .map(r => r.getSeq[Long](0).toList)
    assert(got(0) == List(0L, 1L), s"tie rule: ${got(0)}")
    assert(got(1) == List(0L, 2L), s"exact hit: ${got(1)}")
    assert(got(2) == List(0L, 2L), s"prefix fold: ${got(2)}")
    val nul = Seq(Tuple1(Option.empty[Array[Long]])).toDF("mvec")
      .select(graft.functions.expressions.FloatVecExpressions
        .kcenterNearest(col("mvec"), centers).as("kn"))
      .collect()
    assert(nul.head.isNullAt(0), "null vector must give null assignment")
  }
}
