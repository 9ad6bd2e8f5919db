package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token n-gram shingling as a single Catalyst expression.
  *
  * Semantically identical to the composable formulation
  * `transform(sequence(0, size(t)-n), i -> array_join(slice(t, i+1, n), " "))`
  * (which remains in TextFunctions as the spec / oracle mirror), but one
  * tight loop over the backing ArrayData instead of three nested
  * interpreted higher-order functions — the HOF version cost ~7 µs per
  * shingle and dominated the MinHash pipeline.
  *
  * CodegenFallback is fine here: the expression runs once per DOCUMENT
  * row (not per shingle/pair), so interpretation overhead is negligible.
  */
case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  // wrong-typed input is an ANALYSIS error, not a runtime ClassCastException
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "token_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = math.max(0, len - n + 1)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** StringTokenizer-equivalent tokenization as one tight byte scan.
  *
  * Semantically identical to `filter(split(text, " ", -1), t => t <> "")`
  * (kept in TextFunctions as `tokensHof`, the spec / oracle mirror), but
  * a single pass over the UTF-8 bytes instead of a regex split plus an
  * interpreted higher-order filter. Tokenization runs under every
  * explode in the text family — word count, TF-IDF, shingles, stats —
  * so it is the hottest scalar in the engine. Splitting on the single
  * byte 0x20 is UTF-8-safe: an ASCII byte never occurs inside a
  * multi-byte sequence.
  *
  * CodegenFallback is fine: one call per document ROW (not per token);
  * the per-row loop is the win, codegen would only shave the call.
  */
case class StringTokens(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  // wrong-typed input is an ANALYSIS error, not a runtime ClassCastException
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "string_tokens"

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    val out = new java.util.ArrayList[AnyRef](8)
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document term frequencies in ONE byte scan:
  * `array<struct<token string, cnt int>>` over StringTokenizer-faithful
  * tokens (same 0x20-split/empty-suppression contract as
  * [[StringTokens]]). Semantically `explode(tokens) → groupBy(token) →
  * count` per row, but computed row-local — downstream consumers
  * (TF-IDF) explode one row per DISTINCT term instead of one per token
  * occurrence, and need NO shuffle to obtain tf. Struct order is
  * first-occurrence order; consumers must not depend on it (and don't —
  * everything downstream re-sorts or aggregates).
  *
  * CodegenFallback for the usual reason: one call per document ROW.
  */
case class TokenCounts(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "token_counts"

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, Int](16)
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == 0x20) {
        if (i > start) {
          val t = UTF8String.fromBytes(b, start, i - start)
          counts.put(t, counts.getOrDefault(t, 0) + 1)
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[AnyRef](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `size(array_intersect(a, b))` without materializing the intersection
  * array — the verify-stage scalar of the Jaccard join, evaluated once
  * per CANDIDATE PAIR (millions of times on a dup-heavy corpus), which
  * is why it carries real codegen (`doGenCode`) like FloatDot rather
  * than CodegenFallback. Counts DISTINCT elements of `a` present in `b`
  * (identical contract to size(array_intersect) for any inputs, not
  * just pre-distincted ones — including null elements, which
  * array_intersect treats as a value: null counts once iff present on
  * both sides).
  */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  // wrong-typed input is an ANALYSIS error, not a runtime ClassCastException
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def prettyName: String = "array_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val inB = new java.util.HashSet[UTF8String](y.numElements() * 2)
    var bHasNull = false
    var i = 0
    while (i < y.numElements()) {
      if (y.isNullAt(i)) bHasNull = true else inB.add(y.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var aHadNull = false
    var cnt = 0
    var j = 0
    while (j < x.numElements()) {
      if (x.isNullAt(j)) {
        if (!aHadNull) { aHadNull = true; if (bHasNull) cnt += 1 }
      } else {
        val t = x.getUTF8String(j)
        if (inB.contains(t) && seen.add(t)) cnt += 1
      }
      j += 1
    }
    cnt
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val inB = ctx.freshName("inB")
      val seen = ctx.freshName("seen")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val bHasNull = ctx.freshName("bHasNull")
      val aHadNull = ctx.freshName("aHadNull")
      // raw HashSet: janino compiles no generics
      s"""
         |java.util.HashSet $inB = new java.util.HashSet($b.numElements() * 2);
         |boolean $bHasNull = false;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if ($b.isNullAt($i)) { $bHasNull = true; }
         |  else { $inB.add($b.getUTF8String($i)); }
         |}
         |java.util.HashSet $seen = new java.util.HashSet($a.numElements() * 2);
         |boolean $aHadNull = false;
         |int $cnt = 0;
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  if ($a.isNullAt($j)) {
         |    if (!$aHadNull) { $aHadNull = true; if ($bHasNull) $cnt++; }
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $t = $a.getUTF8String($j);
         |    if ($inB.contains($t) && $seen.add($t)) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode accent stripping: NFD decomposition, drop ALL mark
  * categories (Mn/Mc/Me) by CODE POINT, then NFC recomposition — the
  * utf8proc strip-mark pipeline DuckDB's `strip_accents` runs, verified
  * against it on Latin (é→e, ü→u, ñ→n, ç→c), kana (ば→は), Hangul
  * (한 stays COMPOSED — hence the NFC pass; NFD residue would differ),
  * and supplementary-plane marks (U+1D165/U+11100 stripped — hence
  * code-point iteration; a char loop never sees a surrogate pair's
  * category). Spark has no builtin for this; it is the accent-folding
  * half of the standard training-data normalization pass (q78).
  *
  * ASCII fast path: a byte scan decides whether the (expensive)
  * Normalizer passes are needed at all — on mostly-ASCII corpora the
  * expression is one branch per row. CodegenFallback for the usual
  * reason: one call per document ROW, not per pair/token.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  // wrong-typed input is an ANALYSIS error, not a runtime ClassCastException
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "strip_accents"

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) u
    else {
      val nfd = java.text.Normalizer.normalize(u.toString, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var j = 0
      while (j < nfd.length) {
        val cp = nfd.codePointAt(j)
        val t = Character.getType(cp)
        if (t != Character.NON_SPACING_MARK &&
            t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
        j += Character.charCount(cp)
      }
      UTF8String.fromString(
        java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API for [[TokenShingles]]. */
  def tokenShingles(toks: Column, n: Int): Column =
    Bridge.column(TokenShingles(Bridge.expression(toks), n))

  /** Column API for [[StringTokens]]. */
  def stringTokens(text: Column): Column =
    Bridge.column(StringTokens(Bridge.expression(text)))

  /** Column API for [[ArrayIntersectCount]]. */
  def arrayIntersectCount(a: Column, b: Column): Column =
    Bridge.column(ArrayIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[TokenCounts]]. */
  def tokenCounts(text: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(text)))

  /** Column API for [[StripAccents]]. */
  def stripAccents(text: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(text)))
}
