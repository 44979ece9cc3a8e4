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
      // multi-frame rows (the bench's star_build shapes) time ALL
      // their outputs; single-frame rows go through the usual path
      val frames: (SparkSession, String) => Seq[org.apache.spark.sql.DataFrame] = name match {
        case "star_staging" => (s, d) => Seq(graft.etl.RetailStar.stagingFromTpch(s, d))
        case "star_cleaned" => (s, d) => Seq(graft.etl.RetailClean.clean(graft.etl.RetailStar.stagingFromTpch(s, d)))
        case "star_fact"    => (s, d) => Seq(graft.etl.RetailStar.buildFact(s, d))
        case "star_build_lazy" => (s, d) =>
          val st = graft.etl.RetailStar.buildStar(s, d)
          Seq(st.fact, st.product, st.shipping)
        case "star_build_shared" => (s, d) =>
          val st = graft.etl.RetailStar.materializeStar(s, d)
          Seq(st.fact, st.product, st.shipping)
        case n => (s, d) => Seq(SparkEntry.queries(n)(s, d))
      }
      def fn(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
        frames(s, d).head
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        frames(spark, sfDir).foreach(_.write.mode("overwrite").format("noop").save())
        println(s"RUN $name $i ${(System.nanoTime() - t0) / 1e9}")
        spark.catalog.clearCache()
      }
      if (names.size == 1) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
