package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Measurement harness behind the Generate-inline rule (see
  * TextOps.shinglesOverDocs): a transform() gram array materialized in
  * its OWN Project feeding a non-outer Generate triggers
  * InferFiltersFromGenerate — size(arr) > 0 / isnotnull(arr) are pushed
  * into the scan filter with the whole transform re-inlined, every
  * element_at re-splitting the document (measured 0.4 s → 11 s at
  * sf0.1). Prints both shapes' walls and their plans' split() counts. */
object ShingleProfile {
  def main(args: Array[String]): Unit = {
    val (spark, dir) = graft.Bench.session()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"PHASE $label%-38s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.t(spark, dir, "documents")
    docs.count()
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val inline = toks.select(col("doc_id"), posexplode(shinglesOf(col("toks"), 5)).as(Seq("p", "g")))
    val projected = toks.select(col("doc_id"), shinglesOf(col("toks"), 5).as("grams"))
      .select(col("doc_id"), posexplode(col("grams")).as(Seq("p", "g")))
    for (v <- Seq("inline" -> inline, "projected" -> projected); _ <- 1 to 2)
      t(s"generator-${v._1}")(println("  n=" + v._2.count()))
    for (v <- Seq("inline" -> inline, "projected" -> projected))
      println(s"${v._1} plan split() count = " +
        "split\\(".r.findAllIn(v._2.queryExecution.executedPlan.toString).size)
    spark.stop()
  }
}
