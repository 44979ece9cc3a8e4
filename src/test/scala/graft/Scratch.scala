package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness for chasing individual bench outliers;
  * not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try {
        if (t == "events") Tables.events(spark, sfDir).count()
        else Tables.load(spark, sfDir, t).count()
      } catch { case e: Throwable =>
        System.err.println(s"warmup failed for table $t: ${e.getClass.getSimpleName}")
      }
    }
    val names = if (args.isEmpty) Seq("q24_approx_distinct") else args.toSeq
    names.foreach { name =>
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame = name match {
        case "star_staging" => (s, d) => graft.etl.RetailStar.stagingFromTpch(s, d)
        case "star_cleaned" => (s, d) => graft.etl.RetailClean.clean(graft.etl.RetailStar.stagingFromTpch(s, d))
        case "star_fact"    => (s, d) => graft.etl.RetailStar.buildFact(s, d)
        case n              => SparkEntry.queries(n)
      }
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(s"RUN $name $i ${(System.nanoTime() - t0) / 1e9}")
        spark.catalog.clearCache()
      }
      if (names.size == 1) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
