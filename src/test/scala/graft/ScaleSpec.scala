package graft

import graft.sources.LayerStore
import graft.util.SkewJoin
import org.apache.spark.sql.functions._

/** Scale-mechanism proofs at the plan level: salting preserves join
  * semantics while spreading hot keys; bucketed tables join with NO
  * shuffle on either side. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on a skewed fact") {
    // 90% of fact rows hit one key — the classic hot-key shape
    val fact = (1 to 10000).map(i =>
      (if (i % 10 == 0) (i % 100).toLong else 7L, i.toLong)).toDF("k", "v")
    val dim = (0L to 100L).map(k => (k, s"dim$k")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk").agg(
      count(lit(1)), sum($"v"), countDistinct($"name")).first()
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "dk", salts = 8).agg(
      count(lit(1)), sum($"v"), countDistinct($"name")).first()
    assert(salted == plain)
    // and the salt actually spreads the hot key
    val spread = fact.withColumn("__salt", pmod(hash($"v"), lit(8)))
      .filter($"k" === 7).select("__salt").distinct().count()
    assert(spread == 8)
  }

  test("partitioned write prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val store = new LayerStore(spark, dir)
    val dash = Tables.t(spark, sf0001, "orders")
      .withColumn("order_year", year($"o_orderdate"))
    store.writePartitioned("gold", "orders_by_year", dash, Seq("order_year"))
    // one directory per year on disk
    val years = new java.io.File(s"$dir/gold/orders_by_year")
      .listFiles.filter(_.getName.startsWith("order_year=")).map(_.getName).sorted
    assert(years.length >= 5 && years.head == "order_year=1995")
    val filtered = store.table("gold", "orders_by_year").filter($"order_year" === 1997)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"expected partition pruning in:\n$plan")
    val full = store.table("gold", "orders_by_year")
    assert(filtered.count() > 0 && filtered.count() < full.count())
  }

  test("bucketed co-located join plans without a shuffle") {
    // bucketed tables are managed: they live under the (gitignored)
    // default warehouse dir; the store root only hosts plain layers
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val store = new LayerStore(spark, dir)
    val l = Tables.t(spark, sf0001, "lineitem")
    val o = Tables.t(spark, sf0001, "orders")
    store.writeBucketed("bronze", "lineitem_b", l, 4, Seq("l_orderkey"))
    store.writeBucketed("bronze", "orders_b", o, 4, Seq("o_orderkey"))
    val lb = store.bucketedTable("bronze", "lineitem_b")
    val ob = store.bucketedTable("bronze", "orders_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = lb.join(ob, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == l.count()) // every line matches its order
      // contrast: the unbucketed join DOES shuffle both sides
      val unbucketed = l.join(o, $"l_orderkey" === $"o_orderkey")
        .queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
