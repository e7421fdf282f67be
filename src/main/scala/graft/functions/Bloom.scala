package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** A distributed Bloom filter over 64-bit keys: the build side is a
  * typed Aggregator whose buffer is the bitset itself (partials OR
  * together — a pure map-side-combinable reduction), the probe side a
  * native codegen expression. The point at corpus scale: a membership
  * set with millions of entries collapses to a CONSTANT-size bitmap
  * (m/8 bytes) that broadcasts for free, so the 99.x% of probe rows
  * that miss never reach a join — only Bloom-positive candidates flow
  * into the exact verification join, which removes the false
  * positives. No false negatives by construction.
  *
  * Both sides derive the k probe positions from the same splitmix64
  * mix (JVM `Long` arithmetic wraps — no ANSI overflow concern, and
  * no dependence on Spark's xxhash64 internals).
  */
object BloomHash {
  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Bit index of hash function `j` for key `key` in an `mBits`-wide
    * filter.
    */
  def idx(key: Long, j: Int, mBits: Int): Int =
    (((mix(key + j.toLong) % mBits) + mBits) % mBits).toInt
}

/** Build-side Aggregator: bitset buffer, OR merge. */
class BloomAgg(mBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val i = BloomHash.idx(key, j, mBits)
      b(i >>> 6) |= 1L << (i & 63)
      j += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Probe-side native expression: true iff all k bits for `key` are
  * set in `bloom` (array<long> of length mBits/64). Codegen'd so the
  * pre-filter stays inside the whole-stage pipeline over the probe
  * scan.
  */
@ExpressionDescription(
  usage = "bloom_might_contain(key, bloom) - Bloom membership probe.")
case class BloomMightContain(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects (bigint, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(keyAny: Any, bloomAny: Any): Any = {
    val key = keyAny.asInstanceOf[Long]
    val bloom = bloomAny.asInstanceOf[ArrayData]
    val mBits = bloom.numElements() * 64
    var j = 0
    while (j < k) {
      val i = BloomHash.idx(key, j, mBits)
      if ((bloom.getLong(i >>> 6) & (1L << (i & 63))) == 0L)
        return java.lang.Boolean.FALSE
      j += 1
    }
    java.lang.Boolean.TRUE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, bloom) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val hit = ctx.freshName("hit")
      s"""
         |int $m = $bloom.numElements() * 64;
         |boolean $hit = true;
         |for (int $j = 0; $j < $k; $j++) {
         |  int $i = graft.functions.BloomHash.idx($key, $j, $m);
         |  if (($bloom.getLong($i >>> 6) & (1L << ($i & 63))) == 0L) {
         |    $hit = false; break;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Bloom {
  /** Build UDAF: `bloom_agg(mBits, k)(keyCol)` → array<long> bitset. */
  def bloomAgg(mBits: Int, k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BloomAgg(mBits, k), Encoders.scalaLong)

  /** Probe: all-k-bits-set membership test. */
  def mightContain(key: Column, bloom: Column, k: Int): Column =
    ColumnShim.column(BloomMightContain(
      ColumnShim.expression(key), ColumnShim.expression(bloom), k))
}
