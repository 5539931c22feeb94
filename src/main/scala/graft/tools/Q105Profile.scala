package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: decompose q105's warm wall at sf0.1 — delta banding,
  * candidate probe, exact verify, decision assembly — plus job/stage
  * counts per piece. Not part of the contract surface. */
object Q105Profile {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.TextOps.prepareArtifacts(spark, sfDir)
    val lst = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); tasks.addAndGet(st.stageInfo.numTasks); () }
    }
    spark.sparkContext.addSparkListener(lst)
    def t(label: String)(body: => Unit): Unit = {
      val (j0, s0, k0) = (lst.jobs.get, lst.stages.get, lst.tasks.get)
      val t0 = System.nanoTime()
      body
      Thread.sleep(300) // let the listener bus drain
      println(f"Q105 $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"jobs=${lst.jobs.get - j0}%3d stages=${lst.stages.get - s0}%3d tasks=${lst.tasks.get - k0}%5d")
    }
    for (i <- 1 to 3)
      t(s"full q105 run$i")(graft.Bench.runQuery(spark, sfDir, "q105_incremental_dedup"))
    spark.stop()
  }
}
