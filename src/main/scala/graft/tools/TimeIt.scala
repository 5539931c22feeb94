package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual queries (or prep stages) at an arbitrary SF with
  * the Bench session config — the iteration loop for performance work
  * without paying for the full 56-query bench.
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TimeIt q13_reconciliation prep_gold_marts"` */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()

    val preps: Map[String, () => Unit] = Map(
      "prep_text_lsh" -> (() => graft.operators.TextOps.prepareArtifacts(spark, sfDir)),
      "prep_gold_marts" -> (() => graft.operators.DqChecks.prepareArtifacts(spark, sfDir)),
      "prep_demand_series" -> (() => graft.operators.Forecast.prepareArtifacts(spark, sfDir)),
      "prep_srp_bands" -> (() => graft.operators.VectorOps.prepareArtifacts(spark, sfDir)))

    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"TIMEIT $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    args.foreach { name =>
      if (preps.contains(name)) timed(name)(preps(name)())
      else timed(name) {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
