package graft.tools

/** Phase-profile q152 (span excision) at SPARK_GRAFT_SF_DIR. Kept as
  * the measurement harness behind the lead-chain gram build decision
  * (the projected-transform shape hit the InferFiltersFromGenerate
  * re-inlining trap — see tools.ShingleProfile; the lead chain is
  * 12× faster and immune). */
object ExcisionProfile {
  def main(args: Array[String]): Unit = {
    val (spark, dir) = graft.Bench.session()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val stages = graft.operators.CorpusOps.spanExcisionStages(spark, dir)
    t("warmup full")(stages("full").write.format("noop").mode("overwrite").save())
    t("eval grams distinct")(println("  evalG=" + stages("evalG").count()))
    t("training gram positions")(println("  grams=" + stages("grams").count()))
    t("hits")(println("  hits=" + stages("hits").count()))
    t("merged spans")(println("  merged=" + stages("merged").count()))
    t("full")(stages("full").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
