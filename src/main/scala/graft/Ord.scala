package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic total ordering for the *verify dump only* — library
  * operators return unordered DataFrames (each module publishes its dump
  * sort keys in a `dumpOrder` map, applied by [[Verify]]).
  *
  * Why not `orderBy`: a global sort plans an extra sampling job that
  * re-executes the whole upstream to pick range bounds — doubling every
  * query's cost just to order its (small) result. `orderedBy` shuffles the
  * finished result to one partition and sorts there: same total order,
  * upstream computed once. The single partition is fine for a dump that is
  * written `coalesce(1)` anyway; it must never appear inside an operator
  * (PlanQualitySpec asserts operators are SinglePartition-free).
  * Scale-path ordering (top-k, pagination) stays inside operators as
  * `orderBy`+`limit`, which Catalyst plans as TakeOrdered without a global
  * sort.
  */
object Ord {
  implicit class OrderedOps(private val df: DataFrame) extends AnyVal {
    def orderedBy(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
    def orderedBy(c: String, cs: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(c, cs: _*)
  }
}
