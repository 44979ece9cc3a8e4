package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql], so
  * this one-file shim lives inside the org.apache.spark.sql package —
  * the standard pattern Spark extension libraries use to hand a
  * custom Catalyst Expression to the public Column API without a
  * per-session function registry round-trip. No other internals are
  * touched.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Frees the storage behind `DataFrame.localCheckpoint()`.
  *
  * A local checkpoint pins MEMORY_AND_DISK RDD blocks that
  * `spark.catalog.clearCache()` does NOT release (it only drops
  * SQL-cache entries). Iterative algorithms that checkpoint per round
  * must unpersist superseded rounds themselves or the blocks
  * accumulate for the life of the session — at a 100 TB dedup run
  * that is real executor memory, and even at bench scale the leaked
  * blocks show up as `Block ... already exists` warnings and memory
  * pressure on later queries.
  */
object CheckpointShim {
  /** Unpersist every checkpoint RDD backing `df`'s plan (no-op for
    * plans with no LogicalRDD, i.e. anything not derived from a
    * checkpoint). Safe to call once downstream consumers have
    * materialized their own checkpoints. */
  def unpersist(df: DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed.foreach {
        case l: LogicalRDD => l.rdd.unpersist(blocking = false)
        case _ => ()
      }
}
