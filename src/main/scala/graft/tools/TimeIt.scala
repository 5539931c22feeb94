package graft.tools

/** Time individual queries (or prep stages) at an arbitrary SF with
  * the Bench session/prep/run machinery (shared — this tool exists to
  * reproduce bench timings, so it must never drift from Bench):
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.TimeIt q13_reconciliation prep_gold_marts"` */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = graft.Bench.session()
    val preps = graft.Bench.prepStages.toMap

    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"TIMEIT $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    args.foreach { name =>
      preps.get(name) match {
        case Some(prep) => timed(name)(prep(spark, sfDir))
        case None => timed(name)(graft.Bench.runQuery(spark, sfDir, name))
      }
    }
    spark.stop()
  }
}
