package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-first port of the reference ETL pipeline's semantics
  * (reference: scripts/clean_data.py — "the code is the spec",
  * SURVEY.md §1.4). Each stage is a pure DataFrame => DataFrame so
  * Catalyst fuses the whole chain into scan-project-filter stages;
  * the only shuffle is the collision-dedup aggregate (clean_data.py:78-88).
  *
  * Scale notes: all stages are narrow except `dedupCollisions`, which
  * is a groupBy(transaction_id) + broadcast-able anti-join — at 100 TB
  * the aggregate output (collided ids only) is tiny, so the anti-join
  * broadcasts and the fact never reshuffles.
  */
object RetailClean {

  /** Staging schema — explicit, not inferred (SURVEY §1.3: pandas'
    * inference is an artifact, schema drift is a correctness hazard).
    * Source column names per clean_data.py:33-56,115-123 and
    * README.md:300-311. */
  val stagingSchema: StructType = StructType(Seq(
    StructField("Transaction_ID", LongType),
    StructField("Customer_ID", LongType),
    StructField("Name", StringType),
    StructField("Email", StringType),
    StructField("Phone", StringType),
    StructField("Address", StringType),
    StructField("City", StringType),
    StructField("State", StringType),
    StructField("Zipcode", LongType),
    StructField("Country", StringType),
    StructField("Age", LongType),
    StructField("Gender", StringType),
    StructField("Income", StringType),
    StructField("Customer_Segment", StringType),
    StructField("Date", StringType),
    StructField("Year", StringType),
    StructField("Month", StringType),
    StructField("Time", StringType),
    StructField("Total_Purchases", LongType),
    StructField("Amount", DoubleType),
    StructField("Total_Amount", DoubleType),
    StructField("Product_Category", StringType),
    StructField("Product_Brand", StringType),
    StructField("Product_Type", StringType),
    StructField("Feedback", StringType),
    StructField("Shipping_Method", StringType),
    StructField("Payment_Method", StringType),
    StructField("Order_Status", StringType),
    StructField("Ratings", DoubleType),
    StructField("products", StringType)))

  /** Semicolon-delimited staging CSV (clean_data.py:10). */
  def readStaging(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", ";")
      .schema(stagingSchema)
      .csv(path)

  /** Stage 1 — renames to warehouse names (clean_data.py:33-39). */
  val renames: Map[String, String] = Map(
    "Transaction_ID"  -> "transaction_id",
    "Total_Purchases" -> "quantity",
    "Amount"          -> "unit_price",
    "Total_Amount"    -> "line_total_amount",
    "products"        -> "product_name")

  def rename(df: DataFrame): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** Stage 2 — drop rows null in any critical column (clean_data.py:42-46). */
  val criticalCols: Seq[String] = Seq(
    "transaction_id", "Customer_ID", "Date", "Time",
    "line_total_amount", "quantity", "unit_price")

  def dropCriticalNulls(df: DataFrame): DataFrame =
    df.na.drop("any", criticalCols.filter(df.columns.contains))

  /** Stage 3 — ONLY these 9 categorical columns get 'Unknown'
    * (clean_data.py:49-56); Ratings/Name/Email etc. keep their nulls
    * (SURVEY §1.4 quirk 6). Column presence is defensive, mirroring
    * `if col in df.columns`. */
  val categoricalCols: Seq[String] = Seq(
    "Income", "Customer_Segment", "Feedback", "Shipping_Method",
    "Payment_Method", "Order_Status", "Product_Category",
    "Product_Brand", "Product_Type")

  def fillUnknown(df: DataFrame): DataFrame =
    df.na.fill("Unknown", categoricalCols.filter(df.columns.contains))

  /** Stage 4 — parse Date (M/d/yyyy, clean_data.py:60) and Time
    * (timedelta "H:m:s", clean_data.py:61). There is no auto-format
    * fallback here (SURVEY §1.4 quirk 5): a non-conforming Date
    * yields null, surfaced via `parseFailures` rather than silently
    * re-parsed. Hours mirror pandas' timedelta components: hours are
    * mod 24 (days overflow into a separate component the reference
    * never reads). */
  def parseDateTime(df: DataFrame): DataFrame = {
    val parts = split(col("Time"), ":")
    df.withColumn("Date_dt", to_date(col("Date"), "M/d/yyyy"))
      .withColumn("hour_i", (parts.getItem(0).cast(IntegerType) % 24))
      .withColumn("minute_i", parts.getItem(1).cast(IntegerType))
      .withColumn("second_i", parts.getItem(2).cast(IntegerType))
  }

  /** Rows whose Date/Time failed to parse — the reference would have
    * raised then re-parsed format-free (clean_data.py:62-68); we fail
    * loudly instead (SURVEY §1.4 quirk 5 decision). */
  def parseFailures(df: DataFrame): DataFrame =
    df.filter(col("Date_dt").isNull || col("hour_i").isNull ||
              col("minute_i").isNull || col("second_i").isNull)

  /** Stage 5 — collision dedup (clean_data.py:78-88): drop ALL rows of
    * any transaction_id whose rows disagree on Customer_ID or Date.
    * Multi-line transactions that agree survive — that IS the fact
    * grain (SURVEY §1.4 quirk 3). groupBy then left_anti: the
    * collided-id set is tiny so the anti-join broadcasts; never a
    * window/collect_set (O(group) memory).
    *
    * "disagree" is min≠max, not countDistinct>1: two countDistincts
    * in one aggregate plan an Expand that doubles the shuffled rows,
    * while min/max pairs stay a single complete HashAggregate — and
    * min≠max ⟺ ≥2 distinct non-null values (both ignore nulls; the
    * all-null group yields null≠null = null, which the filter drops,
    * exactly as countDistinct=0 fails >1). Same trick as q9. */
  def dedupCollisions(df: DataFrame): DataFrame =
    df.join(dedupCollisionIds(df), Seq("transaction_id"), "left_anti")

  /** The collided-transaction id set over parsed staging (shared by
    * the dedup stage and the quarantine view). */
  def dedupCollisionIds(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("transaction_id"))
      .agg(min(col("Customer_ID")).as("c0"), max(col("Customer_ID")).as("c1"),
           min(col("Date_dt")).as("d0"), max(col("Date_dt")).as("d1"))
      .filter(col("c0") =!= col("c1") || col("d0") =!= col("d1"))
      .select(col("transaction_id"))

  /** Stage 6 — key synthesis (clean_data.py:97-104): zero-padded
    * STRINGS, not ints (SURVEY §1.4 quirk 1), and time_key is
    * SECONDS-FIRST "SSMMHH" (quirk 2). */
  def synthesizeKeys(df: DataFrame): DataFrame =
    df.withColumn("date_key", date_format(col("Date_dt"), "ddMMyyyy"))
      .withColumn("month_key", date_format(col("Date_dt"), "MMyyyy"))
      .withColumn("time_key", format_string("%02d%02d%02d",
        col("second_i"), col("minute_i"), col("hour_i")))
      .drop("Date_dt", "hour_i", "minute_i", "second_i")

  /** Stage 6b — numeric finishing (clean_data.py:109-112): ids stay
    * nullable long; Zipcode null → -1 sentinel, int. */
  def castNumerics(df: DataFrame): DataFrame = {
    val zipped =
      if (df.columns.contains("Zipcode"))
        df.na.fill(Map("Zipcode" -> -1L))
          .withColumn("Zipcode", col("Zipcode").cast(IntegerType))
      else df
    zipped
      .withColumn("quantity", col("quantity").cast(LongType))
      .withColumn("Customer_ID", col("Customer_ID").cast(LongType))
      .withColumn("transaction_id", col("transaction_id").cast(LongType))
  }

  /** Stage 7 — final 31-column order, intersected with what exists
    * (clean_data.py:115-126). */
  val finalColumns: Seq[String] = Seq(
    "transaction_id", "date_key", "time_key", "month_key", "Customer_ID",
    "quantity", "unit_price", "line_total_amount", "Ratings",
    "product_name", "Product_Category", "Product_Brand", "Product_Type",
    "Payment_Method", "Shipping_Method", "Order_Status", "Feedback",
    "Name", "Email", "Phone", "Address", "City", "State",
    "Zipcode", "Country", "Age", "Gender", "Income", "Customer_Segment",
    "Date", "Time")

  def selectFinal(df: DataFrame): DataFrame =
    df.select(finalColumns.filter(df.columns.contains).map(col): _*)

  /** The full pipeline (clean_data.py:19-129 semantics). */
  def clean(df: DataFrame): DataFrame =
    selectFinal(castNumerics(synthesizeKeys(dedupCollisions(
      parseDateTime(fillUnknown(dropCriticalNulls(rename(df))))))))

  /** Persisted audit/data-quality table (README.md:177-178: "Record
    * row counts, rejections, and data quality metrics" — A7). One row
    * per metric so downstream monitoring can diff loads without
    * schema changes. Fate counts come from ONE aggregate over the
    * quarantine frame (which already tags every row's reject reason
    * and parse flag — one scan plus the collision aggregate clean()
    * pays anyway), rather than five separate count() actions each
    * re-deriving staging. rows_out stays an independent count of the
    * actual cleaned output so the audit still cross-checks the
    * pipeline rather than restating the tags. */
  def audit(raw: DataFrame, cleaned: DataFrame, loadId: String): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val fates = quarantine(raw).agg(
      count(lit(1)),
      coalesce(sum(when(col("reject_reason") === "null_critical", 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("parse_failed"), 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("reject_reason") === "id_collision", 1L).otherwise(0L)), lit(0L))
    ).collect()(0)
    val nClean = cleaned.count()
    Seq(
      ("rows_in",                fates.getLong(0)),
      ("rows_dropped_null",      fates.getLong(1)),
      ("rows_parse_failed",      fates.getLong(2)),
      ("rows_dropped_collision", fates.getLong(3)),
      ("rows_out",               nClean)
    ).toDF("metric", "value").withColumn("load_id", lit(loadId))
  }

  /** Quarantine view of the pipeline (README.md:160-162 data-quality
    * checks, production form): every raw row tagged with its fate —
    * `reject_reason` NULL for rows the pipeline keeps,
    * 'null_critical' / 'id_collision' for the two drop rules (first
    * match wins, mirroring stage order), plus an independent
    * `parse_failed` flag for rows clean() keeps with null keys (the
    * reference would have raised; we surface instead — SURVEY §1.4
    * quirk 5). Rows with NULL reject_reason are exactly clean()'s
    * output rows (spec-reconciled against the audit counts), so a
    * load can write rejects to a quarantine table with reasons
    * instead of silently shrinking.
    *
    * Scale: one pass plus the same collision aggregate clean()
    * already pays; the reason column is row-local. */
  def quarantine(raw: DataFrame): DataFrame = {
    val renamed = rename(raw)
    val criticalNull = criticalCols.filter(renamed.columns.contains)
      .map(col(_).isNull).reduce(_ || _)
    val staged = parseDateTime(renamed)
    // collision ids computed over the same population clean() uses:
    // parsed rows that survived the critical-null drop
    val collidedIds = dedupCollisionIds(parseDateTime(dropCriticalNulls(rename(raw))))
    staged
      .join(broadcast(collidedIds.withColumn("_collided", lit(true))),
        Seq("transaction_id"), "left")
      .withColumn("reject_reason",
        when(criticalNull, "null_critical")
          .when(col("_collided"), "id_collision"))
      .withColumn("parse_failed",
        !criticalNull && (col("Date_dt").isNull || col("hour_i").isNull ||
          col("minute_i").isNull || col("second_i").isNull))
      .drop("_collided", "Date_dt", "hour_i", "minute_i", "second_i")
  }

  /** Comma-delimited cleaned CSV (clean_data.py:136). Spark writes a
    * directory of part files; singleFile coalesces for byte-parity
    * tests only — never at scale. */
  def writeClean(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.option("header", "true").mode("overwrite").csv(path)
  }
}
