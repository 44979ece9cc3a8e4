package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second slice of the SURVEY.md §2 operator inventory: anti-join
  * dedup (A5/J9/P6), outer joins + COALESCE (J5/J6/A6), cross-join
  * scaffold (J4), literal month+1 self-join (J7), calendar/time-key
  * scalar functions (F2-F4, F8), per-group top-N (W4), customer
  * activity (W5/W6), set ops (§2.7), JSON extraction, and a
  * pushdown-friendly scan-filter-project (P2/P8/P9).
  */
object InventoryQueries {

  /** Collision dedup, reference semantics (clean_data.py:78-88 via
    * SURVEY §1.4 quirk 3): a "transaction" (l_orderkey) is dropped
    * only when its lines DISAGREE on an attribute; multi-line groups
    * that agree survive. groupBy+countDistinct then left_anti join —
    * the scalable form (the window/collect_set variant is O(group)
    * memory; SURVEY §2.4 A5). */
  def q9DedupCollisions(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // "disagrees" = min != max — same answer as countDistinct > 1 but
    // without the distinct-aggregate Expand (one pass, map-side combine)
    val bad = li.groupBy(col("l_orderkey"))
      .agg(min(col("l_returnflag")).as("f0"), max(col("l_returnflag")).as("f1"),
           min(col("l_linestatus")).as("s0"), max(col("l_linestatus")).as("s1"))
      .filter(col("f0") =!= col("f1") || col("s0") =!= col("s1"))
      .select(col("l_orderkey"))
    li.join(bad, Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("kept_rows"),
           round(sum(col("l_extendedprice")), 2).as("kept_revenue"),
           countDistinct(col("l_orderkey")).as("kept_orders"))
  }

  /** All customers incl. zero-order ones: LEFT OUTER join + COALESCE
    * on aggregates (README.md:186-194; J5/J6/A6). nation broadcast;
    * customer⟕orders shuffles on custkey. */
  def q8LeftJoinSpend(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(o, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"), col("n_name"))
      .agg(round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"),
           count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** first/last order date + activity flag per customer (README.md:64;
    * W5/W6). The global max date is a 1-row aggregate broadcast back —
    * no driver-side collect, works at any scale. */
  def q7CustomerActivity(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("customer_id"))
      .agg(min(col("o_orderdate")).cast("date").as("first_order_date"),
           max(col("o_orderdate")).cast("date").as("last_order_date"),
           count(lit(1)).as("n_orders"))
    val mx = agg.agg(max(col("last_order_date")).as("maxd"))
    agg.crossJoin(broadcast(mx))
      .withColumn("is_active", col("last_order_date") >= date_sub(col("maxd"), 90))
      .drop("maxd")
      .orderBy(col("customer_id"))
  }

  /** DimDate-style calendar derivations (README.md:51; F8) rolled up
    * over the fact — one scan, one agg shuffle. */
  def q10DateDim(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupBy(
        year(col("o_orderdate")).as("year"),
        quarter(col("o_orderdate")).as("quarter"),
        month(col("o_orderdate")).as("month_num"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"),
        date_format(col("o_orderdate"), "EEEE").as("day_name"),
        dayofweek(col("o_orderdate")).isin(1, 7).as("is_weekend"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("total_spent"))
      .orderBy(col("year"), col("quarter"), col("month_num"),
               col("day_name"), col("is_weekend"))
  }

  /** DimTimeOfDay buckets (README.md:57; F2/F8 + A1) over the events
    * table's true time-of-day. */
  def q11TimeBuckets(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val h = hour(col("ts"))
    e.groupBy(
        h.as("hour_24"),
        when(h < 6, "night").when(h < 12, "morning")
          .when(h < 18, "afternoon").otherwise("evening").as("period"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour_24"))
  }

  /** date_key/month_key synthesis — zero-padded strings, exactly the
    * bytes the reference writes (clean_data.py:97-98; SURVEY §1.4
    * quirk 1: strings, not ints). */
  def q12DateKeys(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "ddMMyyyy").as("date_key"),
               date_format(col("o_orderdate"), "MMyyyy").as("month_key"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("date_key"), col("month_key"))
  }

  /** time_key synthesis — SECONDS-FIRST "SSMMHH" (clean_data.py:100-104,
    * README.md:56; SURVEY §1.4 quirk 2), zero-padded via
    * format_string (F4). */
  def q13TimeKeys(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(format_string("%02d%02d%02d",
          second(col("ts")), minute(col("ts")), hour(col("ts"))).as("time_key"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("time_key"))
  }

  /** Per-group top-N via row_number window (W4; README.md:227 top-k
    * generalized to per-brand ranking). */
  def q14TopPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val rev = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(desc("revenue"), col("p_name"))
    rev.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy(col("p_brand"), col("rank"))
  }

  /** Set operations (§2.7): nation coverage across customer vs
    * supplier bases — INTERSECT / EXCEPT / UNION ALL. */
  def q15SetOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")).distinct()
    cn.intersect(sn).withColumn("tag", lit("both"))
      .union(cn.except(sn).withColumn("tag", lit("customer_only")))
      .union(sn.except(cn).withColumn("tag", lit("supplier_only")))
      .select(col("tag"), col("nationkey"))
      .orderBy(col("tag"), col("nationkey"))
  }

  /** Q5.4's literal self-join form (README.md:247-253; J7) with the
    * month arithmetic done on real dates (add_months) instead of the
    * reference's MMYYYY key+1 year-increment bug (SURVEY §1.4 quirk
    * 4). Kept alongside the lag() form (q6) as the declared-semantics
    * cross-check. */
  def q16MomStrict(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("customer_id"),
               date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .agg(round(sum(col("o_totalprice")), 2).as("spent"))
    m.as("m1").join(m.as("m2"),
        col("m1.customer_id") === col("m2.customer_id") &&
        col("m2.month_start") === add_months(col("m1.month_start"), 1) &&
        col("m2.spent") > col("m1.spent"))
      .groupBy(col("m1.customer_id").as("customer_id"))
      .agg(count(lit(1)).as("rising_months"),
           round(sum(col("m2.spent") - col("m1.spent")), 2).as("total_rise"))
      .orderBy(col("customer_id"))
  }

  /** The snapshot cross-join scaffold (README.md:190-196; J4+J5+A6):
    * month spine × region dim, left-joined to activity. Both scaffold
    * sides are small (distinct months × 5 regions) so the cross join
    * is broadcast — the FACT is aggregated BEFORE the join, which is
    * what keeps this shape viable at 100 TB (never cross-join against
    * the raw fact; README.md:199). */
  def q17CrossScaffold(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // month spine = DimMonth over the data's span (README.md:190 `DimMonth m`),
    // bounds from a tiny min/max aggregate — contiguous months, so gap
    // months appear as zero rows (the scaffold's whole point)
    val months = graft.etl.Warehouse.dimMonthSpan(o.agg(
        min(date_trunc("month", col("o_orderdate")).cast("date")).as("m0"),
        max(date_trunc("month", col("o_orderdate")).cast("date")).as("m1")))
      .select(col("month_start"))
    val act = o
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("am"),
               col("r_regionkey").as("ark"))
      .agg(round(sum(col("o_totalprice")), 2).as("aspent"),
           count(lit(1)).as("an"))
    months.crossJoin(broadcast(Tables.region(spark, dir)))
      .join(act, col("am") === col("month_start") && col("ark") === col("r_regionkey"), "left")
      .select(col("month_start"), col("r_name"),
              round(coalesce(col("aspent"), lit(0.0)), 2).as("spent"),
              coalesce(col("an"), lit(0L)).as("n_orders"))
      .orderBy(col("month_start"), col("r_name"))
  }

  /** Scan-filter-project (P2/P8/P9): both predicates and the 4-column
    * projection reach the parquet scan (PushedFilters / ReadSchema —
    * verified via explain in the spec). */
  def q18ScanFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
              col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Semi-structured extraction: events.props is a JSON string →
    * get_json_object (extension surface; SURVEY §2.8 note). */
  def q19EventsJson(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(avg(col("k")), 2).as("avg_k"),
           round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_customer_activity" -> (q7CustomerActivity _),
    "q8_left_join_spend"   -> (q8LeftJoinSpend _),
    "q9_dedup_collisions"  -> (q9DedupCollisions _),
    "q10_date_dim"         -> (q10DateDim _),
    "q11_time_buckets"     -> (q11TimeBuckets _),
    "q12_date_keys"        -> (q12DateKeys _),
    "q13_time_keys"        -> (q13TimeKeys _),
    "q14_top_per_brand"    -> (q14TopPerBrand _),
    "q15_set_ops"          -> (q15SetOps _),
    "q16_mom_strict"       -> (q16MomStrict _),
    "q17_cross_scaffold"   -> (q17CrossScaffold _),
    "q18_scan_filter"      -> (q18ScanFilter _),
    "q19_events_json"      -> (q19EventsJson _))

  val oracles: Map[String, String] = Map(
    "q7_customer_activity" ->
      """WITH agg AS (
           SELECT o_custkey AS customer_id,
                  CAST(min(o_orderdate) AS DATE) AS first_order_date,
                  CAST(max(o_orderdate) AS DATE) AS last_order_date,
                  count(*) AS n_orders
           FROM orders GROUP BY 1),
         mx AS (SELECT max(last_order_date) AS maxd FROM agg)
         SELECT customer_id, first_order_date, last_order_date, n_orders,
                (last_order_date >= maxd - INTERVAL 90 DAY) AS is_active
         FROM agg, mx ORDER BY customer_id""",
    "q8_left_join_spend" ->
      """SELECT c_custkey, n_name,
         round(coalesce(sum(o_totalprice), 0), 2) AS total_spent,
         count(o_orderkey) AS n_orders
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY 1,2 ORDER BY c_custkey""",
    "q9_dedup_collisions" ->
      """SELECT count(*) AS kept_rows,
         round(sum(l_extendedprice),2) AS kept_revenue,
         count(DISTINCT l_orderkey) AS kept_orders
         FROM lineitem
         WHERE l_orderkey NOT IN (
           SELECT l_orderkey FROM lineitem GROUP BY 1
           HAVING count(DISTINCT l_returnflag) > 1 OR count(DISTINCT l_linestatus) > 1)""",
    "q10_date_dim" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
         CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS quarter,
         CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month_num,
         monthname(o_orderdate) AS month_name,
         dayname(o_orderdate) AS day_name,
         (EXTRACT(dow FROM o_orderdate) IN (0, 6)) AS is_weekend,
         count(*) AS n_orders,
         round(sum(o_totalprice),2) AS total_spent
         FROM orders GROUP BY 1,2,3,4,5,6
         ORDER BY year, quarter, month_num, day_name, is_weekend""",
    "q11_time_buckets" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_24,
         CASE WHEN EXTRACT(hour FROM ts) < 6 THEN 'night'
              WHEN EXTRACT(hour FROM ts) < 12 THEN 'morning'
              WHEN EXTRACT(hour FROM ts) < 18 THEN 'afternoon'
              ELSE 'evening' END AS period,
         count(*) AS n_events,
         round(sum(value),2) AS total_value
         FROM events GROUP BY 1,2 ORDER BY hour_24""",
    "q12_date_keys" ->
      """SELECT strftime(o_orderdate, '%d%m%Y') AS date_key,
         strftime(o_orderdate, '%m%Y') AS month_key,
         count(*) AS n_orders
         FROM orders GROUP BY 1,2 ORDER BY date_key, month_key""",
    "q13_time_keys" ->
      """SELECT strftime(ts, '%S%M%H') AS time_key, count(*) AS n_events
         FROM events GROUP BY 1 ORDER BY time_key""",
    "q14_top_per_brand" ->
      """WITH rev AS (
           SELECT p_brand, p_name,
                  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1,2),
         r AS (SELECT p_brand, p_name, revenue,
                      CAST(row_number() OVER (PARTITION BY p_brand
                        ORDER BY revenue DESC, p_name) AS INTEGER) AS rank
               FROM rev)
         SELECT p_brand, p_name, revenue, rank FROM r
         WHERE rank <= 3 ORDER BY p_brand, rank""",
    "q15_set_ops" ->
      """SELECT 'both' AS tag, nationkey FROM (
           SELECT DISTINCT c_nationkey AS nationkey FROM customer
           INTERSECT SELECT DISTINCT s_nationkey FROM supplier) t1
         UNION ALL
         SELECT 'customer_only', nationkey FROM (
           SELECT DISTINCT c_nationkey AS nationkey FROM customer
           EXCEPT SELECT DISTINCT s_nationkey FROM supplier) t2
         UNION ALL
         SELECT 'supplier_only', nationkey FROM (
           SELECT DISTINCT s_nationkey AS nationkey FROM supplier
           EXCEPT SELECT DISTINCT c_nationkey FROM customer) t3
         ORDER BY tag, nationkey""",
    "q16_mom_strict" ->
      """WITH m AS (
           SELECT o_custkey AS customer_id,
                  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                  round(sum(o_totalprice),2) AS spent
           FROM orders GROUP BY 1,2)
         SELECT m1.customer_id AS customer_id,
                count(*) AS rising_months,
                round(sum(m2.spent - m1.spent),2) AS total_rise
         FROM m m1 JOIN m m2
           ON m1.customer_id = m2.customer_id
          AND m2.month_start = CAST(m1.month_start + INTERVAL 1 MONTH AS DATE)
          AND m2.spent > m1.spent
         GROUP BY m1.customer_id ORDER BY m1.customer_id""",
    "q17_cross_scaffold" ->
      """WITH bounds AS (
           SELECT min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS m0,
                  max(CAST(date_trunc('month', o_orderdate) AS DATE)) AS m1
           FROM orders),
         months AS (
           SELECT CAST(unnest(generate_series(CAST(m0 AS TIMESTAMP),
                  CAST(m1 AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month_start
           FROM bounds),
         act AS (
           SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS am,
                  r_regionkey AS ark,
                  round(sum(o_totalprice),2) AS aspent,
                  count(*) AS an
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1,2)
         SELECT m.month_start, r.r_name,
                round(coalesce(a.aspent, 0),2) AS spent,
                coalesce(a.an, 0) AS n_orders
         FROM months m CROSS JOIN region r
         LEFT JOIN act a ON a.am = m.month_start AND a.ark = r.r_regionkey
         ORDER BY m.month_start, r.r_name""",
    "q18_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",
    "q19_events_json" ->
      """SELECT event_type,
         count(*) AS n_events,
         round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)),2) AS avg_k,
         round(sum(value),2) AS total_value
         FROM events GROUP BY 1 ORDER BY event_type""")
}
