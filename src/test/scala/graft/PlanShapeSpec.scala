package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CoreQueries, InventoryQueries}

/** Plan-shape assertions — the properties that decide whether a query
  * survives a 100× scale-up, checked on the optimized physical plan
  * rather than guessed from timings: filters/projections reaching the
  * parquet scan, dim joins broadcasting, top-k avoiding a global
  * sort, and shuffle counts staying at their minimum.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan text only — AdaptiveSparkPlan's
    * toString appends the Initial Plan too, which would double-count
    * operators. */
  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q18: predicate pushdown and column pruning reach the scan") {
    val p = plan(InventoryQueries.q18ScanFilter(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert("l_quantity#\\d+ > 45".r.findFirstIn(p).nonEmpty, p) // data filter at the scan stage
    // projection pruned to the 4 selected + 2 filter columns — never
    // the full 16-column lineitem schema
    val scanLine = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.nonEmpty && !scanLine.contains("l_returnflag") &&
      !scanLine.contains("l_partkey"),
      s"scan reads unprojected columns: $scanLine")
  }

  test("q2: dim join broadcasts; top-k plans TakeOrderedAndProject, no global sort") {
    val p = plan(CoreQueries.q2TopParts(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1: aggregation shuffles once (partial+final), plus only the output sort") {
    val p = plan(CoreQueries.q1PricingSummary(spark, dir))
    assert(countOf(p, "Exchange hashpartitioning") === 1, p)
    assert(countOf(p, "Exchange rangepartitioning") === 1, p)
  }

  test("q5: one hash shuffle serves both the aggregation and the lifetime window") {
    val p = plan(CoreQueries.q5MonthlySnapshot(spark, dir))
    assert(countOf(p, "Exchange hashpartitioning") === 1,
      s"agg+window must share the customer_id partitioning:\n$p")
  }

  test("q29: inline-key star fact prunes staging columns and joins only its one dim") {
    val df = graft.etl.RetailStar.q29TopProducts(spark, dir)
    val p = plan(df)
    // the product dim broadcasts; the fact side carries NO dim-lookup
    // joins (inline hash keys), so the only remaining joins are the
    // staging synthesis (lineitem⋈orders⋈part), the cleaning
    // pipeline's dedup anti-join, and the one rollup dim join
    assert(p.contains("BroadcastHashJoin"), p)
    // column pruning must reach the orders scan: q29 never reads
    // o_totalprice / o_orderstatus — only the join key + o_custkey
    // + o_orderdate survive the cleaning pipeline's needs
    val ordersScan = p.linesIterator.find(l => l.contains("FileScan") && l.contains("orders"))
      .getOrElse("")
    assert(ordersScan.nonEmpty && !ordersScan.contains("o_totalprice"),
      s"orders scan reads unprojected columns: $ordersScan")
  }

  test("q26: decile assignment is window-free — no single-partition sort anywhere") {
    val p = plan(graft.queries.AdvancedQueries.q26SpendDeciles(spark, dir))
    // the r1 form planned ntile over Window(ORDER BY …) — a one-task
    // sort of every customer. (The remaining Exchange SinglePartition
    // is the percentile agg's final step over per-partition partials —
    // one row per partition, not the dataset.)
    assert(!p.contains("Window"), s"q26 must not plan a WindowExec:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"decile bounds should broadcast back:\n$p")
  }

  private def countOf(haystack: String, needle: String): Int =
    haystack.sliding(needle.length).count(_ == needle)
}
