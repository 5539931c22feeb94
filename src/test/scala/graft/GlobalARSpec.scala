package graft

import graft.operators.GlobalAR
import org.apache.spark.sql.functions._

/** Pins the generated-formula machinery of the global AR model:
  * the Gaussian-elimination formulas must actually solve the normal
  * equations, and the unrolled recursion must implement the
  * reference's autoregressive indexing (lag_1 = previous prediction,
  * lag_7/lag_14 shifting through history, roll = mean of the 7 most
  * recent values, predictions first). */
class GlobalARSpec extends SparkSpec {

  test("solve formulas recover known coefficients from exact sums") {
    // y = 2 + 0.5*f1 - 1*f2 + 0.25*f3 + 3*f4 over a deterministic
    // full-rank design; sums computed exactly in the test, solved by
    // the SAME formula text the query and oracle evaluate
    val beta = Array(2.0, 0.5, -1.0, 0.25, 3.0)
    val rows = (1 to 200).map { i =>
      val f = Array(1.0, (i % 7).toDouble, (i % 11).toDouble,
        ((i * i) % 13).toDouble, ((i * 3) % 5).toDouble)
      (f, f.zip(beta).map { case (x, b) => x * b }.sum)
    }
    val s = Array.tabulate(5, 5)((i, j) =>
      rows.map { case (f, _) => f(i) * f(j) }.sum)
    val t = Array.tabulate(5)(i => rows.map { case (f, y) => f(i) * y }.sum)
    val sumCols =
      (for (i <- 0 to 4; j <- i to 4) yield lit(s(i)(j)).as(s"s$i$j")) ++
      (0 to 4).map(i => lit(t(i)).as(s"t$i"))
    val one = spark.range(1).select(sumCols: _*)
    val solved = GlobalAR.solveFormulas.foldLeft(one) {
      case (df, (name, f)) => df.withColumn(name, expr(f)) }
      .select((0 to 4).map(i => col(s"beta$i")): _*).head()
    (0 to 4).foreach { i =>
      assert(math.abs(solved.getDouble(i) - beta(i)) < 1e-8,
        s"beta$i: ${solved.getDouble(i)} != ${beta(i)}")
    }
  }

  test("step formulas implement the autoregressive recursion") {
    // Scala-side mirror of forecasting.py:303-321 (hist newest-first)
    val beta = Array(1.0, 0.6, 0.2, 0.1, 0.5)
    val h = (1 to 14).map(k => k * 10.0).toArray // h1=10 .. h14=140
    var hist = h.toList // newest first
    val expected = (1 to 7).map { _ =>
      val roll = hist.take(7).sum / 7.0
      val p = beta(0) + beta(1) * hist.head + beta(2) * hist(6) +
        beta(3) * hist(13) + beta(4) * roll
      hist = p :: hist
      p
    }
    val cols = (1 to 14).map(k => lit(h(k - 1)).as(s"h$k")) ++
      (0 to 4).map(i => lit(beta(i)).as(s"beta$i"))
    val stepped = GlobalAR.stepFormulas.foldLeft(spark.range(1).select(cols: _*)) {
      case (df, (name, f)) => df.withColumn(name, expr(f)) }
    val got = stepped.select((1 to 7).map(k => col(s"p$k")): _*).head()
    (0 until 7).foreach { k =>
      assert(math.abs(got.getDouble(k) - expected(k)) < 1e-9,
        s"p${k + 1}: ${got.getDouble(k)} != ${expected(k)}")
    }
  }

  test("end-to-end forecast: 7 rows per entity, non-negative, interface columns") {
    val fc = GlobalAR.forecastGlobalAr(spark, sf0001)
    val n = fc.count()
    val entities = fc.select("entity_id").distinct().count()
    assert(n == entities * 7)
    assert(fc.filter(col("yhat") < 0).count() == 0) // max(0, .) clamp
    assert(fc.columns.toSet == Set("entity_id", "ds", "yhat", "yhat_lower",
      "yhat_upper", "granularity", "model", "level"))
  }
}
