package graft.tools

/** Throwaway profiling probe for the k-means fit phases. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = graft.Bench.session()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"KMPROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("warm-scan") {
      graft.Tables.t(spark, sfDir, "embeddings").count()
    }
    t("kmeansAssignment") {
      graft.operators.VectorOps.kmeansAssignment(spark, sfDir).count()
    }
    t("docVectors-count") {
      graft.operators.VectorOps.docVectors(spark, sfDir).count()
    }
    t("docKmeansAssignment") {
      graft.operators.VectorOps.docKmeansAssignment(spark, sfDir).count()
    }
    spark.stop()
  }
}
