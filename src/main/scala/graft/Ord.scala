package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic final output ordering for the oracle dump, without a
  * range-partitioned global sort: `orderBy` plans an extra sampling job
  * that re-executes the whole upstream to pick range bounds — doubling
  * every query's cost just to order its (small) result. `orderedBy`
  * shuffles the finished result to one partition and sorts there: same
  * total order, upstream computed once. Use ONLY on final query outputs;
  * scale-path ordering (top-k, windows) keeps `orderBy`+`limit`, which
  * Catalyst plans as TakeOrdered without a global sort.
  */
object Ord {
  implicit class OrderedOps(private val df: DataFrame) extends AnyVal {
    def orderedBy(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
    def orderedBy(c: String, cs: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(c, cs: _*)
  }
}
