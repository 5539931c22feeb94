package graft

import graft.plans.DotProduct.dot_product
import org.apache.spark.sql.functions._

/** The native dot-product expression must be bit-identical to the
  * composed ordered fold it replaced — same index-order binary64
  * accumulation — and mirror its null semantics exactly, in both the
  * interpreted and codegen paths. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the composed fold on real embeddings") {
    val df = Tables.t(spark, sf0001, "embeddings")
      .select(transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("native", dot_product(col("e"), col("e")))
      .withColumn("composed", fold(col("e"), col("e")))
    assert(df.filter(col("native") =!= col("composed")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("null semantics: null array, length mismatch, null element") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (None, Some(Seq(1.0))),                        // null side
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),         // length mismatch
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))) // empty -> 0.0
      .toDF("a", "b")
      .select(dot_product(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(df.toSeq == Seq(11.0, null, null, 0.0))
    val nullElem = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
      .select(dot_product(col("a").cast("array<double>"), col("b").cast("array<double>")).as("d"))
      .collect()
    assert(nullElem.head.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path through a filter on the expression in
    // a non-codegen context: evaluate directly via the Column on rows
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = graft.plans.DotProduct(
      Literal.create(Seq(1.5, -2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Seq(2.0, 0.5, 4.0), ArrayType(DoubleType)))
    assert(e.eval(null) == (1.5 * 2.0 + -2.0 * 0.5 + 3.0 * 4.0))
  }

  test("optimizer rule rewrites the composed fold to the native expression") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.DotProduct.RewriteRule
    try {
      val df = Tables.t(spark, sf0001, "embeddings")
        .select(transform(col("embedding"), x => x.cast("double")).as("e"))
        .select(fold(col("e"), col("e")).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dotproduct") || optimized.contains("DotProduct"), optimized.take(500))
      // a -0.0 seed changes the empty-array result: must NOT rewrite
      val negZero = Tables.t(spark, sf0001, "embeddings")
        .select(transform(col("embedding"), x => x.cast("double")).as("e"))
        .select(aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
          lit(-0.0), (acc, v) => acc + v).as("d"))
      val nzPlan = negZero.queryExecution.optimizedPlan.toString
      assert(!(nzPlan.contains("dotproduct") || nzPlan.contains("DotProduct")), nzPlan.take(500))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.DotProduct.RewriteRule)
    }
  }

  test("stays inside whole-stage codegen") {
    val plan = Tables.t(spark, sf0001, "embeddings")
      .select(dot_product(transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double"))).as("n2"))
    // no fallback to interpreted projection
    assert(plan.queryExecution.executedPlan.toString.contains("*(1)"))
  }

  test("SQL registration via the extension descriptor") {
    val (id, info, builder) = graft.plans.DotProduct.fnDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
    // the builder rejects wrong arities instead of dropping arguments
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("dot_product"))
  }
}
