package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.Tables

/** Structured Streaming ingestion of the `events` table — the
  * streaming extension surface (SURVEY.md §2.9: absent from the
  * reference, which is batch-only by design; README.md:274).
  *
  * The transforms are plain DataFrame functions, so the SAME code
  * path serves batch (Tables.events) and streaming (readEventsStream)
  * inputs — batch-equivalence is the correctness oracle for the
  * stream, tested in EventsStreamSpec.
  *
  * Scale: event-time tumbling windows + watermark bound the state
  * store; dedup state is similarly watermark-expired. At 100 TB/day
  * the only extra knob is shuffle partitioning on (window,
  * event_type) — already the grouping key.
  */
object EventsStream {

  /** events.parquet raw schema: ts is TIMESTAMP(NANOS), which Spark
    * only reads as raw longs (see Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events parquet directory, ts
    * normalized to microsecond TimestampType exactly as the batch
    * loader does. */
  def readEventsStream(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
  }

  /** Tumbling 1-hour event-time windows per event_type; 10-minute
    * watermark for late data. Works on batch and stream alike. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Exactly-once-per-event_id dedup with watermark-bounded state. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicates("event_id")

  /** Drive a streaming DataFrame to a memory sink synchronously
    * (test/smoke harness). Complete mode so un-finalized windows are
    * visible for batch-equivalence checks. */
  def runToMemory(df: DataFrame, name: String, mode: String = "complete"): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }

  /** ST1 — the batch-semantics twin of windowedCounts, exposed in the
    * driver query inventory with a DuckDB oracle (tumbling 1-hour
    * windows are epoch-aligned, so window_start == date_trunc hour). */
  def st1EventWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").cast("timestamp").as("window_start"),
              col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_event_windows" -> (st1EventWindows _))

  val oracles: Map[String, String] = Map(
    "st1_event_windows" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n_events, round(sum(value),2) AS total_value
         FROM events GROUP BY 1,2 ORDER BY window_start, event_type""")
}
