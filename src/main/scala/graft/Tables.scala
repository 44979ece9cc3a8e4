package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are columnar parquet; reads are lazy and Catalyst pushes
  * filters/column pruning into the scan. At 100 TB the same call works
  * against a partitioned table root — nothing here assumes local paths.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
    * drops and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others, so
    * the loader is representation-adaptive: nanos read as raw longs
    * (legacy conf) and truncate to micros — the same truncation DuckDB
    * applies — while micros NTZ casts to session-local TimestampType
    * (identity on the wall clock under the UTC session this library
    * pins). Downstream code always sees microsecond TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** ts → microsecond TimestampType from any of the three shapes a
    * raw events read can produce (legacy nanos long / micros NTZ /
    * already-local timestamp). */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's
        // 2^53 exact range, so float division can land 1 µs off DuckDB's
        // exact integer truncation on unlucky values
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
