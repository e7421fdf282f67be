package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Gram-matrix accumulation (G = Σ v·vᵀ) as a typed Aggregator — the
  * classic distributed linear-algebra job (MLlib RowMatrix
  * .computeGramian's plan shape). The naive formulation explodes every
  * vector into dim² (i, j, vᵢ·vⱼ) rows before aggregating — a dim²
  * row-multiplication of the corpus through the shuffle. Here each map
  * partition folds its vectors into ONE dim×dim dense buffer (upper
  * triangle, flattened), partials merge by element-wise add, and the
  * exchange carries partitions × dim(dim+1)/2 doubles total,
  * independent of row count. Accumulation per cell is in corpus row
  * order within a partition; the oracle rounds (6) away the
  * summation-order ulps exactly like every other FP aggregate here.
  */
class GramAgg(dim: Int) extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {

  private val n = dim * (dim + 1) / 2 // upper triangle, row-major

  override def zero: Array[Double] = new Array[Double](n)

  override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
    var k = 0
    var i = 0
    while (i < dim) {
      val vi = v(i).toDouble
      var j = i
      while (j < dim) {
        b(k) += vi * v(j).toDouble
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var k = 0
    while (k < n) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(b: Array[Double]): Seq[Double] = b.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object Gram {
  /** Column-API UDAF: `gram(dim)(vecCol)` → flattened upper triangle
    * of Σ v·vᵀ, row-major: entry (i ≤ j) at index i·dim − i(i−1)/2 + (j−i).
    */
  def gram(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new GramAgg(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
}
