package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Snapshot the formatted physical plan of named queries into
  * per-query text files — the before/after evidence the optimization
  * rounds commit under plans/rNN/. Usage:
  *   sbt "Test/runMain graft.PlanSnap plans/r17 _before q55_snapshot_increment ..."
  * Special name "star_build" snapshots the bench-only row's three
  * frames (fact, dim_product, dim_shipping) into one file. Building
  * the DataFrame runs any artifact side effects the entry performs —
  * same contract as the bench. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <suffix> <query>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(32)
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    names.foreach { name =>
      val text = name match {
        case "star_build" =>
          // the bench row's form (materializeStar since r17)
          val st = graft.etl.RetailStar.materializeStar(spark, sfDir)
          Seq("fact" -> st.fact, "dim_product" -> st.product,
            "dim_shipping" -> st.shipping)
            .map { case (t, df) => s"== star_build: $t ==\n" + planOf(df) }
            .mkString("\n")
        case n => planOf(SparkEntry.queries(n)(spark, sfDir))
      }
      Files.writeString(outDir.resolve(s"$name$suffix.txt"), text)
      println(s"SNAP $name -> ${outDir.resolve(s"$name$suffix.txt")}")
    }
    spark.stop()
  }
}
