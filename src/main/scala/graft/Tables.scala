package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet test data
  * (see TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * At cluster scale these reads are plain `spark.read.parquet` over a
  * directory tree — filter pushdown and column pruning reach the scan
  * untouched, so every operator downstream only pays for the columns
  * and row groups it actually needs.
  */
object Tables {
  /** Resolved-relation memo, keyed per (session, path). `spark.read
    * .parquet` re-runs datasource resolution on EVERY call — file
    * listing plus a driver-side parquet footer read for schema
    * inference — and the bench/verify surface constructs each table
    * several hundred times per session (201 queries × ~1.5 tables ×
    * 3 passes). A catalog table would carry its schema in the
    * metastore and skip that work; this memo is the same idea for the
    * path-addressed test tables. It caches the resolved LOGICAL plan
    * only — no rows, no results: every action still scans parquet.
    * (The test corpus is immutable for a session's lifetime; a
    * mutable path must not go through this memo — the at-rest index
    * layouts use [[graft.operators.IndexCache]]'s epoch-invalidated
    * cache instead.)
    */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    relationCache.computeIfAbsent(
      graft.operators.IndexCache.sessionKey(spark) + "#" + s"$sfDir/$name.parquet",
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "region")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark only reads via the legacy nanos-as-long mode; convert the
    * long back to a (microsecond) timestamp so downstream operators
    * and the DuckDB oracle (which also truncates nanos to micros) see
    * the same instants.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    relationCache.computeIfAbsent(
      graft.operators.IndexCache.sessionKey(spark) + "#events-conv#" + sfDir,
      { _ =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.LongType
        // integer `div`, not `/`: double division of an ~1.7e18 nanos
        // value has only ~9e15 exact range and corrupts the microsecond
        if (raw.schema("ts").dataType == LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else raw
      })
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
