package graft

import graft.operators.GoldMarts
import graft.sources.LayerStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental-refresh contract: recomputing only the delta's
  * months and key-swapping them into the stored mart must equal a
  * from-scratch rebuild over the same silver state. */
class IncrementalMartSpec extends SparkSpec {

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("incremental month refresh equals a full rebuild") {
    val root = java.nio.file.Files.createTempDirectory("inc_mart").toString
    val store = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, store, sf0001).ok)
    assert(Pipeline.runSilver(spark, store, "inc-run").ok)
    // initial mart (direct build — the full runGold's forecasting
    // stack is irrelevant to this contract)
    store.write("gold", "monthly_sales",
      GoldMarts.monthlySalesFrom(Pipeline.goldResolver(store), identity))
    // collect eagerly: the refresh below swaps the mart's files, so a
    // lazily-held frame over the old files would fail to re-read
    val beforeRows = rows(store.table("gold", "monthly_sales"))
    val monthsBefore = store.table("gold", "monthly_sales")
      .select("sales_month").distinct().count()

    // delta: extra lineitems on three existing orders (their months'
    // quantities/revenues change; no new months appear)
    val victims = store.table("silver", "lineitem")
      .orderBy("l_orderkey", "l_linenumber").limit(3)
      .withColumn("l_quantity", col("l_quantity") + lit(5.0))
      .withColumn("l_linenumber", col("l_linenumber") + lit(100L))
    // pin the victim keys BEFORE the write swaps the files the
    // `victims` plan reads from
    val victimKeys = victims.select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSeq
    store.write("silver", "lineitem",
      store.table("silver", "lineitem").unionByName(victims))
    val deltaOrders = Pipeline.goldResolver(store)("orders")
      .filter(col("o_orderkey").isin(victimKeys: _*))

    val n = Pipeline.refreshMonthlySales(spark, store, deltaOrders)
    assert(n > 0)
    val expected = GoldMarts.monthlySalesFrom(Pipeline.goldResolver(store), identity)
    val got = store.table("gold", "monthly_sales")
    assert(got.count() == expected.count())
    assert(rows(got) == rows(expected),
      "incremental refresh diverged from the full rebuild")
    // the refresh changed the victims' months and ONLY those months
    val monthSet = deltaOrders
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .distinct().collect().map(_.getDate(0)).toSet
    val changed = rows(got) -- beforeRows
    assert(changed.nonEmpty)
    assert(changed.forall(r => monthSet.contains(r.head.asInstanceOf[java.sql.Date])),
      "a month outside the delta changed")
    assert(got.select("sales_month").distinct().count() == monthsBefore)

    // empty delta is a no-op
    val n2 = Pipeline.refreshMonthlySales(spark, store, deltaOrders.limit(0))
    assert(n2 == 0L)
    assert(rows(store.table("gold", "monthly_sales")) == rows(expected))
    store.teardown()
  }
}
