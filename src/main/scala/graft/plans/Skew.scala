package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling: salted equi-join for hot keys.
  *
  * A shuffled join on a skewed key puts every row of the hot key in
  * one task. Salting splits each big-side key into `salts` synthetic
  * sub-keys (deterministically, from a row-unique column so retries
  * are stable) and replicates the small side across all salt values —
  * the hot key's rows then spread over `salts` tasks. AQE's skew-join
  * handles the sort-merge case automatically; explicit salting is the
  * portable fallback (e.g. for aggregations or non-AQE paths).
  */
object Skew {

  /** Inner equi-join of `big` and `small` on `key`, with the big side
    * salted by `rowId` (any row-unique big-side column).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      rowId: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(rowId), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
