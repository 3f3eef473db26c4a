package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.ops.Route

/** The composed CDC delivery pipeline — batch form. The identical transform
  * chain runs under Structured Streaming in [[Streaming]]; batch-first so
  * the DuckDB oracle can differential-test it (SURVEY §5).
  *
  * Reference trace (`app/services/sf_pubsub.py:602-789`):
  * decode → header/commit-ms (P3) → since-drop (F2) → empty-ids skip (F3)
  * → per-record fan-out (E1) → flash normalize+gate (P4+F1) → payload
  * projection (P5) → webhook sink (K1) with gated offset commit (K2).
  */
object Pipeline {

  /** events-shaped CDC view → delivery rows. Narrow end-to-end: no shuffle,
    * one codegen stage, scales linearly with input splits at any SF.
    */
  def deliveries(cdc: DataFrame, cutoffMs: Long = CdcView.SinceCutoffMs): DataFrame =
    cdc.transform(Route.withCommitMs)
      .transform(Route.sinceFilter(cutoffMs))
      .transform(Route.nonEmptyIds)
      .transform(Route.fanOut)
      .transform(Route.flashGate)
      .transform(Route.project)

  def deliveries(spark: SparkSession, sfDir: String): DataFrame =
    deliveries(CdcView(spark, sfDir))
}
