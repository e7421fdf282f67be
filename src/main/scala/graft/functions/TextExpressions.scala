package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass shingle hashing: text → DISTINCT xxhash64(n-token shingle)
  * array, as a single native expression.
  *
  * The composed form (posexplode tokens → two lead() windows → concat
  * → distinct) pays a per-doc sort SHUFFLE just to line tokens up next
  * to each other — the dominant cost of every shingle-based dedup
  * query. This expression does the same work in one narrow pass over
  * each document: tokenize (the same `[\p{Punct}\s]+` Java regex as
  * `Text.tokens`, lowercased like `lower()` — identical ASCII
  * semantics), slide the n-window, hash with the same xxhash64 seed 42
  * Spark's `xxhash64(...)` uses, and dedup in-loop. Output equals the
  * old pipeline's distinct hashed-shingle set row-for-row; the only
  * difference is the missing exchange.
  *
  * Real `doGenCode` (VERDICT r9 #1): the generated code calls the
  * same static `compute` the interpreted path uses — the per-row body
  * is compiled Scala either way, but staying OUT of `CodegenFallback`
  * keeps the enclosing projection inside whole-stage codegen (no
  * boxed `InternalRow` round-trip per document, and `CodegenGuard` /
  * NativeCodegenSpec can now assert the dedup scans are fallback-free).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleHashes$$.MODULE$$.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private[functions] val SplitPattern =
    java.util.regex.Pattern.compile(Text.TokenSplitRegex)

  /** Static per-row body shared by eval and generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    // Locale.ROOT: default-locale lowercasing diverges from Spark's
    // lower() / the DuckDB oracle under e.g. tr_TR ('I' → 'ı').
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val tokens = SplitPattern.split(text).filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= tokens.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.result())
  }

  def shingle_hashes(c: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      ShingleHashes(org.apache.spark.sql.graftshim.ColumnShim.expression(c), n))
}

/** One-pass n-gram emission: text → ALL space-joined n-token grams in
  * order (multiset, not deduped — n-gram counting needs every
  * occurrence). Same tokenizer + lowercasing as `ShingleHashes`; the
  * same shuffle-elimination argument applies to the bigram queries,
  * which previously lined tokens up with a per-doc lead() window.
  * Same static-call `doGenCode` as `ShingleHashes`.
  */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "ngrams"

  override def nullSafeEval(input: Any): Any =
    NGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NGrams$$.MODULE$$.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {
  /** Static per-row body shared by eval and generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val tokens = ShingleHashes.SplitPattern.split(text).filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](tokens.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= tokens.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def ngrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      NGrams(org.apache.spark.sql.graftshim.ColumnShim.expression(c), n))
}

/** One-pass dHash-style frame signature: text → the `PhashBits`-bit
  * integer `mm_phash_dedup` previously derived through a per-char
  * posexplode → (doc, frame) groupBy SHUFFLE → lag window. The
  * composed form pushed ~(bits+1)·frameChars rows PER PAYLOAD through
  * an exchange just to line frame sums up next to each other; this
  * expression walks the same prefix once per row and packs the bits
  * in-loop — no explode, no shuffle, no window.
  *
  * Bit-identical semantics to the composed plan (which the DuckDB
  * oracle still replays independently):
  *  - `substring(text, 1, (bits+1)·frameChars)` counts CODE POINTS —
  *    the walk consumes at most that many code points;
  *  - `filter(split(text, ""), length(s) === 1)` keeps EVERY code
  *    point: Spark `length()` counts code points, so a surrogate
  *    pair is one length-1 piece (split("") never splits inside a
  *    pair), and the filter only strips empty boundary pieces —
  *    `kept` indexes code points exactly as posexplode's `pos` did;
  *  - `ascii(piece)` is the full code point (not a byte);
  *  - per frame f: n = kept-char count, s = Σ codepoint (`ascii`),
  *    HALF_UP mean mv = (2s+n) div (2n) — positive longs, so Java `/`
  *    is Spark's `div`;
  *  - signature = Σ_{f≥1, frame f non-empty} [mv(f) > mv(f−1)] ·
  *    2^(f−1); single-frame payloads yield 0, censusing the whole
  *    population (ADVICE r8 #5).
  *
  * `doGenCode` boxes through the nullable static `compute` (NULL only
  * on a zero-code-point prefix — see `nullable`), assigning
  * `ev.isNull` in-branch like Spark's own nullable generators.
  */
case class PhashSignature(child: Expression, frameChars: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "phash_signature"
  // NULL (→ filtered upstream) only when the prefix holds zero code
  // points — unreachable behind the operator's length(text) > 0
  // filter, kept so the expression alone can never fabricate a row
  // the composed plan's posexplode would not have emitted.
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PhashSignature.compute(input.asInstanceOf[UTF8String], frameChars, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("phashRes")
      s"""
         |Object $r = graft.functions.PhashSignature$$.MODULE$$.compute(
         |  $v, $frameChars, $bits);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) $r).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PhashSignature =
    copy(child = newChild)
}

object PhashSignature {
  /** Static per-row body shared by eval and generated code; boxed
    * Long, null on an empty-prefix input.
    */
  def compute(input: UTF8String, frameChars: Int, bits: Int): java.lang.Long = {
    val text = input.toString
    val maxCp = (bits + 1) * frameChars
    val ns = new Array[Long](bits + 1)
    val ss = new Array[Long](bits + 1)
    var kept = 0
    var i = 0
    while (i < text.length && kept < maxCp) {
      val cp = text.codePointAt(i)
      val f = kept / frameChars
      ns(f) += 1
      ss(f) += cp
      kept += 1
      i += Character.charCount(cp)
    }
    if (ns(0) == 0) return null
    var sig = 0L
    var prev = (2 * ss(0) + ns(0)) / (2 * ns(0))
    var f = 1
    while (f <= bits && ns(f) > 0) {
      val mv = (2 * ss(f) + ns(f)) / (2 * ns(f))
      if (mv > prev) sig |= 1L << (f - 1)
      prev = mv
      f += 1
    }
    java.lang.Long.valueOf(sig)
  }

  def phash_signature(c: Column, frameChars: Int, bits: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      PhashSignature(org.apache.spark.sql.graftshim.ColumnShim.expression(c), frameChars, bits))
}

/** One-pass RAKE candidate extraction: text → one element per
  * NON-STOPWORD token occurrence, tagged with its maximal
  * non-stopword run ("island"): (island ordinal, space-joined phrase
  * text, the word, phrase length). The composed form derived islands
  * with a per-doc lag/cumsum WINDOW over the posexploded token
  * stream (a corpus-scaled exchange) and then joined the token
  * stream back against the phrase aggregate TWICE; this expression
  * walks each document's token array once — same tokenizer +
  * lowercasing as `ShingleHashes` (identical ASCII semantics to
  * `Text.tokens(lower(..))`), islands broken exactly where the
  * lag(pos) == pos−1 test broke them (any intervening stopword or
  * delimiter). The corpus-scaled word-score and phrase aggregations
  * stay declarative on the exploded output.
  *
  * The stopword set rides into generated code as a reference object
  * (the `PqEncode` codebook pattern), so codegen and eval share one
  * immutable set instance.
  */
case class RakeCandidates(child: Expression, stopwords: Set[String])
    extends UnaryExpression {

  import org.apache.spark.sql.types.{StringType, StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("island", LongType, nullable = false),
      StructField("phrase", StringType, nullable = false),
      StructField("w", StringType, nullable = false),
      StructField("len", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "rake_candidates"

  override def nullSafeEval(input: Any): Any =
    RakeCandidates.compute(input.asInstanceOf[UTF8String], stopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val swRef = ctx.addReferenceObj("rakeStopwords", stopwords,
      "scala.collection.immutable.Set")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RakeCandidates$$.MODULE$$.compute($v, $swRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RakeCandidates =
    copy(child = newChild)
}

object RakeCandidates {
  /** Static per-row body shared by eval and generated code. */
  def compute(input: UTF8String, stopwords: Set[String]): ArrayData = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val tokens = ShingleHashes.SplitPattern.split(text).filter(_.nonEmpty)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var island = 0L
    var i = 0
    while (i < tokens.length) {
      if (stopwords.contains(tokens(i))) i += 1
      else {
        var j = i
        while (j < tokens.length && !stopwords.contains(tokens(j))) j += 1
        val phrase = UTF8String.fromString(tokens.slice(i, j).mkString(" "))
        val len = (j - i).toLong
        var k = i
        while (k < j) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](island, phrase, UTF8String.fromString(tokens(k)), len))
          k += 1
        }
        island += 1L
        i = j
      }
    }
    new GenericArrayData(out.toArray)
  }

  def rake_candidates(c: Column, stopwords: Set[String]): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      RakeCandidates(org.apache.spark.sql.graftshim.ColumnShim.expression(c), stopwords))
}
