package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Correctness oracle for the streaming path: the SAME transform over
  * a file-source stream must converge to the batch answer. */
class EventsStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  /** File stream sources require a directory — stage the single
    * events.parquet into one. */
  lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streamed windowed counts == batch windowed counts") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(EventsStream.windowedCounts(stream), "win_stream")
    try {
      val streamed = spark.table("win_stream")
        .select(col("window_start"), col("event_type"), col("n_events"),
                round(col("total_value"), 2).as("total_value"))
        .orderBy(col("window_start"), col("event_type"))
        .collect()
      val batch = EventsStream.st1EventWindows(spark, dir).collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("stateful transitionsStream == batch lag-window transitions") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.transitionsStream(stream).toDF(), "trans_stream", mode = "append")
    try {
      val streamed = spark.table("trans_stream")
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n_transitions"))
        .orderBy(col("prev_type"), col("event_type"))
        .collect()
      val batch = EventsStream.st3Transitions(spark, dir).collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("watermarked dedup emits each event_id once") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.dedupEvents(stream).select("event_id"), "dedup_stream", mode = "append")
    try {
      val n = spark.table("dedup_stream").count()
      val distinctIds = spark.table("dedup_stream").select("event_id").distinct().count()
      assert(n === distinctIds)
      assert(n === graft.Tables.events(spark, dir).select("event_id").distinct().count())
    } finally q.stop()
  }
}
