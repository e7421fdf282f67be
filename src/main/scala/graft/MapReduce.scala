package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Generic pluggable map→reduce entry point — the migration facade for
  * the reference's `STEP_ID_TO_FUNCTION` registry
  * (reference mapreduce/worker/algorithm.py:25-28, where a job is a
  * (map_function, reduce_function) pair dispatched by step id).
  *
  * A reference job's `map` emits keyed records from each input row and
  * its `reduce` folds one key's group; here `mapFn` is any
  * DataFrame→DataFrame transform emitting a `key` column (explode,
  * filter, project — the map step), and `reduceExprs` are the
  * aggregates folded per key (the reduce step). Spark plans it as
  * scan → generate → hash-exchange on key → partial+final aggregate:
  * the distributed execution of the reference's split/shuffle/collect
  * loop (coordinator/algorithm.py:20-117) with the coordinator's
  * in-memory shuffle replaced by a sort-based exchange.
  *
  * `WordCount.wordcount` runs through this facade, so the reference's
  * flagship job is literally a `mapReduce(...)` call here too.
  */
object MapReduce {
  def mapReduce(input: DataFrame, mapFn: DataFrame => DataFrame,
      key: String, reduceExprs: Column*): DataFrame =
    mapFn(input)
      .groupBy(key)
      .agg(reduceExprs.head, reduceExprs.tail: _*)
      .orderBy(key)
}
