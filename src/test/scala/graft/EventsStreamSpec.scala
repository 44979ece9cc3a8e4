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

  test("streaming moment state drains to the batch aggregate exactly (int64 sums)") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.momentsStream(stream).toDF(), "moments_stream", mode = "update")
    try {
      // update mode emits per-batch snapshots; the final state per
      // user is the row with the largest n
      val streamed = spark.table("moments_stream").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.maxBy(_.getAs[Long]("n")) }
      val batch = Tables.events(spark, dir)
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("c"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
             sum(col("c") * col("c")).as("q"))
        .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (u, s) =>
        val b = batch(u)
        assert(s.getAs[Long]("n") === b.getAs[Long]("n"), s"user $u n")
        assert(s.getAs[Long]("s") === b.getAs[Long]("s"), s"user $u s")
        assert(s.getAs[Long]("q") === b.getAs[Long]("q"), s"user $u q")
      }
    } finally q.stop()
  }

  test("streamed trending counts + downstream rank == batch st7 top-k") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.trendWindowCounts(stream), "trend_stream")
    try {
      // the rank runs DOWNSTREAM of the stream, over completed
      // windows — the same split st7's scaladoc documents
      val streamed = EventsStream.rankTrending(spark.table("trend_stream")).collect()
      val batch = EventsStream.st7Trending(spark, dir).collect()
      assert(streamed.length === batch.length && streamed.nonEmpty)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("stream-static enrichment == batch left-join rollup") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val dim = EventsStream.segmentDim(spark, dir)
    // append mode: the enrichment join is stateless, rows emit as-is
    val q = EventsStream.runToMemory(
      EventsStream.enrichWithSegment(stream, dim), "enrich_stream", mode = "append")
    try {
      val streamed = spark.table("enrich_stream")
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"),
             round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("segment"))
        .collect()
      val batch = EventsStream.st6StaticEnrich(spark, dir).collect()
      assert(streamed.length === batch.length)
      assert(streamed.map(_.getAs[String]("segment")).contains("UNKNOWN"),
        "unmatched-user bucket must be exercised")
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

  test("foreachBatch upsert converges to the batch snapshot across micro-batches") {
    import org.apache.spark.sql.SaveMode
    // split events into two time-ordered files so the upsert sees two
    // micro-batches with re-emitted (refined) windows in between
    val splitDir = java.nio.file.Files.createTempDirectory("events_split").toString
    // split from the RAW representation so the staged files carry the
    // same ts encoding the stream's sniffed schema expects (the legacy
    // conf makes this read nanos drops as raw longs; on micros drops
    // it is a no-op and ts stays a parquet timestamp)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(s"$dir/events.parquet").orderBy("ts").cache()
    val n = all.count()
    val firstHalf = all.limit((n / 2).toInt)
    val secondHalf = all.join(firstHalf.select("event_id"), Seq("event_id"), "left_anti")
    firstHalf.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$splitDir/f1")
    secondHalf.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$splitDir/f2")
    val inDir = java.nio.file.Files.createTempDirectory("events_in")
    def stage(src: String, dst: String, mtime: Long): Unit = {
      val part = new java.io.File(src).listFiles().find(_.getName.endsWith(".parquet")).get
      val to = inDir.resolve(dst)
      java.nio.file.Files.copy(part.toPath, to)
      to.toFile.setLastModified(mtime); ()
    }
    stage(s"$splitDir/f1", "a.parquet", 1000000L)
    stage(s"$splitDir/f2", "b.parquet", 2000000L)

    val target = java.nio.file.Files.createTempDirectory("snap").toString + "/snapshot"
    val stream = EventsStream.readEventsStream(spark, inDir.toString, maxFilesPerTrigger = 1)
    val q = EventsStream.runSnapshotUpsert(stream, target)
    try {
      val got = spark.read.parquet(target)
        .select(col("window_start"), col("event_type"), col("n_events"),
                round(col("total_value"), 2).as("total_value"))
        .orderBy(col("window_start"), col("event_type")).collect()
      val want = EventsStream.st1EventWindows(spark, dir).collect()
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) => assert(g === w) }
    } finally q.stop()
  }

  test("chained hour→day windows: streamed append output == batch rollup below the watermark") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.chainedDaily(stream)
        .select(col("window.start").cast("timestamp").as("day_start"),
                col("event_type"), col("n_hours"), col("n_events"),
                col("peak_hour_events")),
      "chained_stream", mode = "append")
    try {
      // append emits a day only after the watermark (max ts − 10 min)
      // passes its end — the batch twin restricted to those days must
      // match the streamed output exactly
      val maxTs = Tables.events(spark, dir).agg(max(col("ts"))).collect().head
        .getTimestamp(0)
      val frontierMicros = maxTs.getTime * 1000L - 10L * 60 * 1000000
      val closed = EventsStream.st9ChainedWindows(spark, dir)
        .filter(unix_micros(col("day_start")) + 86400L * 1000000 <= frontierMicros)
        .collect()
      assert(closed.nonEmpty, "need at least one watermark-closed day")
      val streamed = spark.table("chained_stream")
        .orderBy(col("day_start"), col("event_type")).collect()
      assert(streamed.length === closed.length,
        s"streamed ${streamed.length} vs closed-batch ${closed.length}")
      streamed.zip(closed).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("streamed dropDuplicatesWithinWatermark debounce == batch distinct counts") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.debounceStream(stream)
        .select(col("user_id"), col("event_type"), col("hour_bucket")),
      "debounce_stream", mode = "append")
    try {
      val streamed = spark.table("debounce_stream")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_debounced"))
        .orderBy(col("event_type"))
        .collect()
      val batch = EventsStream.st5Debounce(spark, dir)
        .select(col("event_type"), col("n_debounced")).collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
      // the debounce is non-vacuous: at least one duplicate was dropped
      val raw = EventsStream.st5Debounce(spark, dir)
        .agg(sum(col("n_raw")), sum(col("n_debounced"))).collect().head
      assert(raw.getLong(0) > raw.getLong(1), "debounce must drop something")
    } finally q.stop()
  }

  test("stream-stream interval join == batch attribution pairs") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.attributionStream(stream)
        .select(col("user_id"), col("buy_id"), col("view_id")),
      "attr_stream", mode = "append")
    try {
      val streamed = spark.table("attr_stream")
        .orderBy(col("user_id"), col("buy_id"), col("view_id")).collect()
      val e = Tables.events(spark, dir)
      val batch = EventsStream.attributionPairs(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "purchase"))
        .select(col("user_id"), col("buy_id"), col("view_id"))
        .orderBy(col("user_id"), col("buy_id"), col("view_id")).collect()
      assert(batch.nonEmpty)
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join == batch pairs + watermark-closed orphans") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.attributionOuterStream(stream)
        .select(col("user_id"), col("buy_id"), col("buy_ts"), col("view_id")),
      "attr_outer_stream", mode = "append")
    try {
      def key(r: org.apache.spark.sql.Row): (Long, Long, Long) =
        (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))
      val streamedRows = spark.table("attr_outer_stream").collect()
      val streamedMatched = streamedRows.filter(!_.isNullAt(3)).map(key).sorted
      val streamedOrphans = streamedRows.filter(_.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = Tables.events(spark, dir)
      val batchAll = EventsStream.attributionOuterPairs(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "purchase")).collect()
      // matched pairs emit eagerly → exact equality over ALL of them
      val batchMatched = batchAll.filter(!_.isNullAt(3)).map(key).sorted
      assert(streamedMatched.length === batchMatched.length)
      streamedMatched.zip(batchMatched).foreach { case (s, b) => assert(s === b) }
      // a null-extended orphan emits only once the watermark
      // (max ts − 1 h, ms-truncated, with a ±1 ms eviction guard)
      // passes its buy_ts: soundness — every streamed orphan is a
      // batch orphan; completeness — every batch orphan a full second
      // clear of the frontier has streamed
      val batchOrphans = batchAll.filter(_.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamedOrphans.subsetOf(batchOrphans),
        "stream emitted an orphan the batch join attributes")
      // each branch watermarks AFTER its event-type filter, so the
      // global (min) watermark trails the SLOWER branch's max ts
      val maxByType = e.filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("event_type")).agg(max(col("ts")).as("m"))
        .collect().map(_.getTimestamp(1).getTime).min
      val frontierMicros = maxByType * 1000L - 3600L * 1000000
      val safelyClosed = batchAll
        .filter(r => r.isNullAt(3) &&
          r.getTimestamp(2).getTime * 1000L < frontierMicros - 1000000L)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(safelyClosed.nonEmpty, "need at least one closed orphan")
      assert(safelyClosed.subsetOf(streamedOrphans),
        s"missing closed orphans: ${safelyClosed -- streamedOrphans}")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join == batch pairs + BOTH watermark-closed orphan classes") {
    val stream = EventsStream.readEventsStream(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.attributionFullOuterStream(stream)
        .select(col("user_id"), col("buy_id"), col("buy_ts"),
          col("view_id"), col("view_ts")),
      "attr_full_stream", mode = "append")
    try {
      val streamedRows = spark.table("attr_full_stream").collect()
      def pairKey(r: org.apache.spark.sql.Row): (Long, Long, Long) =
        (r.getLong(0), r.getLong(1), r.getLong(3))
      val streamedMatched = streamedRows
        .filter(r => !r.isNullAt(1) && !r.isNullAt(3)).map(pairKey).sorted
      val streamedBuyOrphans = streamedRows.filter(r => !r.isNullAt(1) && r.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamedViewOrphans = streamedRows.filter(r => r.isNullAt(1))
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      val e = Tables.events(spark, dir)
      val batchAll = EventsStream.attributionFullOuterPairs(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "purchase")).collect()
      // matched pairs emit eagerly → exact equality over ALL of them
      val batchMatched = batchAll
        .filter(r => !r.isNullAt(1) && !r.isNullAt(3)).map(pairKey).sorted
      assert(streamedMatched.length === batchMatched.length)
      streamedMatched.zip(batchMatched).foreach { case (s, b) => assert(s === b) }
      // soundness: every streamed orphan (either class) is a batch orphan
      val batchBuyOrphans = batchAll.filter(r => !r.isNullAt(1) && r.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batchViewOrphans = batchAll.filter(r => r.isNullAt(1))
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(streamedBuyOrphans.subsetOf(batchBuyOrphans))
      assert(streamedViewOrphans.subsetOf(batchViewOrphans))
      // completeness at the frontier: the global watermark trails the
      // SLOWER branch's max ts by the 1 h delay; a purchase is
      // orphan-final past its buy_ts, a view only past view_ts + gap
      // (a qualifying purchase could arrive that much later)
      val frontierMicros = e.filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("event_type")).agg(max(col("ts")).as("m"))
        .collect().map(_.getTimestamp(1).getTime).min * 1000L - 3600L * 1000000
      val closedBuyOrphans = batchAll
        .filter(r => !r.isNullAt(1) && r.isNullAt(3) &&
          r.getTimestamp(2).getTime * 1000L < frontierMicros - 1000000L)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val closedViewOrphans = batchAll
        .filter(r => r.isNullAt(1) &&
          r.getTimestamp(4).getTime * 1000L + EventsStream.AttributionGapMicros
            < frontierMicros - 1000000L)
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(closedBuyOrphans.nonEmpty && closedViewOrphans.nonEmpty,
        "need at least one closed orphan of EACH class")
      assert(closedBuyOrphans.subsetOf(streamedBuyOrphans),
        s"missing closed buy orphans: ${closedBuyOrphans -- streamedBuyOrphans}")
      assert(closedViewOrphans.subsetOf(streamedViewOrphans),
        s"missing closed view orphans: ${closedViewOrphans -- streamedViewOrphans}")
      // census conservation: the st12 gate row's three partitions
      // reconcile with the raw event counts
      val census = EventsStream.st12FullOuter(spark, dir).collect()
      val totBuys = e.filter(col("event_type") === "purchase").count()
      val totViews = e.filter(col("event_type") === "view").count()
      assert(census.map(_.getAs[Long]("n_buys")).sum === totBuys)
      val matchedViews = batchAll
        .filter(r => !r.isNullAt(1) && !r.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(3))).distinct.length
      assert(census.map(_.getAs[Long]("n_orphan_views")).sum + matchedViews === totViews,
        "orphan views + distinct matched views = all views")
    } finally q.stop()
  }

  test("stream starts on an EMPTY directory (schema fallback) and picks up late files") {
    val emptyDir = java.nio.file.Files.createTempDirectory("events_late")
    // classic file-source lifecycle: the query starts before any file
    // exists — the footer sniff cannot work, the explicit fallback
    // schema must carry it
    val stream = EventsStream.readEventsStream(spark, emptyDir.toString)
    val q = EventsStream.runToMemory(
      EventsStream.windowedCounts(stream), "late_stream")
    try {
      assert(spark.table("late_stream").count() === 0)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        emptyDir.resolve("events.parquet"))
      q.processAllAvailable()
      val streamed = spark.table("late_stream")
        .select(col("window_start"), col("event_type"), col("n_events"),
                round(col("total_value"), 2).as("total_value"))
        .orderBy(col("window_start"), col("event_type")).collect()
      val batch = EventsStream.st1EventWindows(spark, dir).collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("snapshot swap recovers from a crash between the two renames") {
    import spark.implicits._
    val target = java.nio.file.Files.createTempDirectory("swap").toString + "/snap"
    val merge = EventsStream.mergeIntoParquet(target, Seq("k")) _
    merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), 0L)
    // simulate dying after "rename target aside" but before "promote
    // tmp": only the .old copy exists
    assert(new java.io.File(target).renameTo(new java.io.File(target + ".old")))
    merge(Seq(("b", 20L), ("c", 3L)).toDF("k", "v"), 1L)
    val got = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'a' survives only if the stranded .old snapshot was restored
    // before merging; 'b' takes the newer batch's value
    assert(got === Map("a" -> 1L, "b" -> 20L, "c" -> 3L))
  }

  test("restart from checkpoint: exactly-once across stop/start, no loss, no dups") {
    // stage the events into two files so the first run can stop after
    // one trigger and the restarted run has genuinely unseen input
    val e = Tables.events(spark, dir)
    val half = e.count() / 2
    val splitDir = java.nio.file.Files.createTempDirectory("events_ckpt_split").toString
    e.filter(col("event_id") < half).coalesce(1)
      .write.mode("overwrite").parquet(s"$splitDir/f1")
    e.filter(col("event_id") >= half).coalesce(1)
      .write.mode("overwrite").parquet(s"$splitDir/f2")
    val inDir = java.nio.file.Files.createTempDirectory("events_ckpt_in")
    def stage(src: String, dst: String): Unit = {
      val part = new java.io.File(src).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, inDir.resolve(dst)); ()
    }
    val ckpt = java.nio.file.Files.createTempDirectory("events_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("events_ckpt_out").toString + "/dedup"
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      EventsStream.dedupEvents(
          EventsStream.readEventsStream(spark, inDir.toString))
        .select(col("event_id"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    // run 1: only the first file exists; process it and STOP
    stage(s"$splitDir/f1", "a.parquet")
    val q1 = run(); q1.processAllAvailable(); q1.stop()
    // run 2: second file arrives while the query is DOWN; the restart
    // must resume from the checkpoint — reprocessing nothing, missing
    // nothing
    stage(s"$splitDir/f2", "b.parquet")
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out).select(col("event_id")).collect()
        .map(_.getLong(0)).sorted
      val want = e.select(col("event_id")).distinct().collect()
        .map(_.getLong(0)).sorted
      assert(got.length === got.distinct.length, "restart re-emitted rows (dups)")
      assert(got.toSeq === want.toSeq, "restart lost or invented rows")
    } finally q2.stop()
  }

  test("restart from checkpoint: the STATEFUL windowed-count upsert (st11's " +
    "merge path) stopped mid-stream and resumed converges to the batch answer") {
    import org.apache.spark.sql.SaveMode
    // four time-ordered files: two processed before the stop, two
    // arriving while the query is DOWN — the restart must recover the
    // source offsets (f1/f2 never reprocess), the WINDOW STATE STORE
    // (windows spanning the stop keep their partial counts — a lost
    // state store would restart them at zero and the merge would
    // upsert the too-small refinement), and the watermark. Time-ordered
    // staging keeps every later file's ts above the recovered
    // watermark, so no row can be late-dropped (st11's argument).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(s"$dir/events.parquet").cache()
    // the STOP boundary must fall INSIDE some 1-hour window (two
    // consecutive-in-time events sharing an hour land on opposite
    // sides of it), else the state-recovery branch is vacuous — the
    // sf0.001 events average ~1.4/hour, so a blind row-count quartile
    // usually lands between windows. Find the split nearest the middle
    // whose neighbors share an hour, on the NORMALIZED view (the raw
    // ts encoding varies across drops), keyed by event_id.
    val orderedIds = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy(col("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = orderedIds.length
    def hourOf(us: Long): Long = us / 3600000000L
    val mid = ((n / 2) until n)
      .find(i => hourOf(orderedIds(i - 1)._2) == hourOf(orderedIds(i)._2))
      .orElse((2 until n / 2).reverse
        .find(i => hourOf(orderedIds(i - 1)._2) == hourOf(orderedIds(i)._2)))
      .getOrElse(fail("no 1-hour window holds two events — cannot exercise restart"))
    val bounds = Seq(0, mid / 2, mid, (mid + n) / 2, n)
    val splitDir = java.nio.file.Files.createTempDirectory("events_rs_split").toString
    val inDir = java.nio.file.Files.createTempDirectory("events_rs_in")
    (0 until 4).foreach { k =>
      val ids = orderedIds.slice(bounds(k), bounds(k + 1)).map(_._1)
      all.filter(col("event_id").isin(ids: _*))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$splitDir/f$k")
    }
    def stage(k: Int): Unit = {
      val part = new java.io.File(s"$splitDir/f$k").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val to = inDir.resolve(s"$k.parquet")
      java.nio.file.Files.copy(part.toPath, to)
      to.toFile.setLastModified((k + 1) * 1000000L); ()
    }
    val ckpt = java.nio.file.Files.createTempDirectory("events_rs_ckpt").toString
    val target = java.nio.file.Files.createTempDirectory("events_rs_out").toString + "/snapshot"
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      EventsStream.runSnapshotUpsert(
        EventsStream.readEventsStream(spark, inDir.toString, maxFilesPerTrigger = 1),
        target, checkpoint = Some(ckpt))
    def counts(): Map[(java.sql.Timestamp, String), Long] =
      spark.read.parquet(target)
        .select(col("window_start").cast("timestamp"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    // run 1: two files, two micro-batches, then STOP (the deploy/crash)
    stage(0); stage(1)
    val q1 = run(); q1.stop()
    val preStop = counts()
    // run 2: the rest arrives while the query is down; resume
    stage(2); stage(3)
    val q2 = run()
    try {
      val got = spark.read.parquet(target)
        .select(col("window_start"), col("event_type"), col("n_events"),
                round(col("total_value"), 2).as("total_value"))
        .orderBy(col("window_start"), col("event_type")).collect()
      val want = EventsStream.st1EventWindows(spark, dir).collect()
      assert(got.length === want.length,
        "restarted snapshot lost or invented (window, event_type) rows")
      got.zip(want).foreach { case (g, w) => assert(g === w) }
      // non-vacuity: at least one window GREW across the restart — its
      // pre-stop partial count was recovered from the state store and
      // refined, which is exactly the branch a lost store would break
      // (the window would restart at zero and upsert a smaller count,
      // failing the batch comparison above)
      assert(counts().exists { case (k, v) => preStop.get(k).exists(v > _) },
        "no window spanned the stop — the state-recovery branch was not exercised")
    } finally q2.stop()
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
