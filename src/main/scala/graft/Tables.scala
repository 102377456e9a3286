package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `$dir/`. All readers go through
  * [[Tables.table]] so filter pushdown / column pruning reach the
  * parquet scan (the scan is declared lazily; Catalyst prunes).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** The events table's `ts` physical encoding has changed across testdata
    * generations (TIMESTAMP(NANOS) historically; plain timestamp[us] since
    * 2026-08-13). Adapt to whatever the file carries so a regeneration in
    * either direction cannot take the whole events family down:
    *   - LongType: the nanos-as-long legacy read (conf set session-wide in
    *     [[graft.plans.GraftSession]] and defensively here) — truncate to
    *     micros; whole-second semantics downstream are unaffected.
    *   - TIMESTAMP_NTZ (timestamp[us], isAdjustedToUTC=false): cast to
    *     TimestampType — the session tz is pinned to UTC, so the wall-clock
    *     value maps to the identical instant and every downstream
    *     window/date_trunc/oracle comparison is unchanged.
    *   - TimestampType: use directly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(spark, dir, "events"))
  }

  /** Shared by the batch loader and the streaming file-source tests, so both
    * paths adapt identically to whichever `ts` encoding the files carry. */
  def normalizeEventsTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
