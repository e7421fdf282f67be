package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
  * CodegenFallback is deliberate: the per-row body is compiled Scala
  * (regex split + tight loop), and falling out of whole-stage codegen
  * for this one projection is far cheaper than the shuffle it
  * replaces.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    // Locale.ROOT: default-locale lowercasing diverges from Spark's
    // lower() / the DuckDB oracle under e.g. tr_TR ('I' → 'ı').
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val tokens = ShingleHashes.SplitPattern.split(text).filter(_.nonEmpty)
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

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private[functions] val SplitPattern =
    java.util.regex.Pattern.compile(Text.TokenSplitRegex)

  def shingle_hashes(c: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      ShingleHashes(org.apache.spark.sql.graftshim.ColumnShim.expression(c), n))
}

/** One-pass n-gram emission: text → ALL space-joined n-token grams in
  * order (multiset, not deduped — n-gram counting needs every
  * occurrence). Same tokenizer + lowercasing as `ShingleHashes`; the
  * same shuffle-elimination argument applies to the bigram queries,
  * which previously lined tokens up with a per-doc lead() window.
  */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "ngrams"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
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

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {
  def ngrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      NGrams(org.apache.spark.sql.graftshim.ColumnShim.expression(c), n))
}
