package graft

import graft.sources.LayerStore
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The incremental-silver contract: re-cleaning only a bronze delta
  * and tuple-key-swapping it into silver.lineitem must equal a full
  * re-clean of the new bronze state — including DELETING rows whose
  * delta version stops validating (the case a bare upsert gets
  * wrong). */
class IncrementalSilverSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("delta re-clean + tuple-key swap equals a full silver reload") {
    val root = java.nio.file.Files.createTempDirectory("inc_silver").toString
    val store = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, store, sf0001).ok)
    assert(Pipeline.runSilver(spark, store, "inc-silver-run").ok)
    val before = rows(store.table("silver", "lineitem"))

    // pin three victim rows eagerly (the delta writes swap the files
    // any lazy plan over bronze would re-read)
    val schema = store.table("bronze", "lineitem").schema
    val victims = store.table("bronze", "lineitem")
      .orderBy("l_orderkey", "l_linenumber").limit(3).collect()
    val qi = schema.fieldIndex("l_quantity")
    val li = schema.fieldIndex("l_linenumber")
    def patched(r: Row, f: Int, v: Any): Row =
      Row.fromSeq(r.toSeq.updated(f, v))
    val delta = spark.createDataFrame(
      java.util.Arrays.asList(
        patched(victims(0), qi, victims(0).getDouble(qi) + 7.0), // update, stays valid
        patched(victims(1), li, victims(1).getInt(li) + 1000),   // brand-new key
        patched(victims(2), qi, -1.0)),                          // key turns invalid
      schema)

    // flow the delta through bronze (latest-wins), then refresh silver
    store.upsert("bronze", "lineitem", delta,
      Seq("l_orderkey", "l_linenumber"), "l_orderkey")
    val n = Pipeline.refreshSilverLineitem(spark, store, delta)
    assert(n > 0)

    // equality against a from-scratch re-clean of the NEW bronze state
    val expected = rows(store.table("bronze", "lineitem")
      .filter(col("l_quantity") > 0))
    val got = rows(store.table("silver", "lineitem"))
    assert(got == expected, "incremental silver diverged from a full re-clean")

    // the invalidated key is GONE (the bare-upsert failure mode)
    val k2 = (victims(2).getLong(schema.fieldIndex("l_orderkey")),
      victims(2).getInt(li))
    assert(!got.exists(r => (r(schema.fieldIndex("l_orderkey")),
      r(li)) == (k2: (Any, Any))), "stale silver row survived its delta invalidation")
    // untouched rows are bit-identical; only the three victim keys moved
    val victimKeys: Set[(Any, Any)] = Set(
      (victims(0).getLong(schema.fieldIndex("l_orderkey")), victims(0).getInt(li)),
      (victims(1).getLong(schema.fieldIndex("l_orderkey")), victims(1).getInt(li) + 1000),
      k2)
    val changed = (before -- got) ++ (got -- before)
    assert(changed.nonEmpty)
    val offenders = changed.filterNot(r => victimKeys.contains(
      (r(schema.fieldIndex("l_orderkey")), r(li))))
    assert(offenders.isEmpty,
      s"rows outside the delta changed: ${offenders.take(5).mkString("; ")} vs keys $victimKeys")
  }

  test("a delta holding two versions of one key refreshes to ONE silver row") {
    val root = java.nio.file.Files.createTempDirectory("inc_silver_dup").toString
    val store = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, store, sf0001).ok)
    assert(Pipeline.runSilver(spark, store, "inc-silver-dup").ok)

    val schema = store.table("bronze", "lineitem").schema
    val victim = store.table("bronze", "lineitem")
      .orderBy("l_orderkey", "l_linenumber").limit(1).collect()(0)
    val qi = schema.fieldIndex("l_quantity")
    def patched(f: Int, v: Any): Row = Row.fromSeq(victim.toSeq.updated(f, v))
    // two VALID versions of the SAME composite key in one delta —
    // exactly the case bronze's latest-wins upsert collapses; a swap
    // fed the raw delta would append both and duplicate the fact row
    val delta = spark.createDataFrame(
      java.util.Arrays.asList(
        patched(qi, victim.getDouble(qi) + 1.0),
        patched(qi, victim.getDouble(qi) + 2.0)),
      schema)
    store.upsert("bronze", "lineitem", delta,
      Seq("l_orderkey", "l_linenumber"), "l_orderkey")
    Pipeline.refreshSilverLineitem(spark, store, delta)

    val expected = rows(store.table("bronze", "lineitem")
      .filter(col("l_quantity") > 0))
    val got = rows(store.table("silver", "lineitem"))
    assert(got == expected, "incremental silver diverged on a duplicate-key delta")
    val ki = (schema.fieldIndex("l_orderkey"), schema.fieldIndex("l_linenumber"))
    val nVictim = got.count(r =>
      r(ki._1) == victim.getLong(ki._1) && r(ki._2) == victim.getInt(ki._2))
    assert(nVictim == 1, s"expected exactly one row for the duplicated key, got $nVictim")
  }

  test("stored-delta refresh (landDelta + sidecar sketches) equals the frame form") {
    val root = java.nio.file.Files.createTempDirectory("inc_silver_stored").toString
    val store = new LayerStore(spark, root)
    assert(Pipeline.runBronze(spark, store, sf0001).ok)
    assert(Pipeline.runSilver(spark, store, "inc-silver-stored").ok)
    val schema = store.table("bronze", "lineitem").schema
    val victim = store.table("bronze", "lineitem")
      .orderBy("l_orderkey", "l_linenumber").limit(1).collect()(0)
    val qi = schema.fieldIndex("l_quantity")
    val delta = spark.createDataFrame(
      java.util.Arrays.asList(
        Row.fromSeq(victim.toSeq.updated(qi, victim.getDouble(qi) + 5.0))),
      schema)
    store.upsert("bronze", "lineitem", delta,
      Seq("l_orderkey", "l_linenumber"), "l_orderkey")
    // land the delta as a staging table with per-key-set sketches —
    // the zero-scan path (JoinAdvisorSpec proves zero jobs at the
    // advisor level; here the END state must match the frame form)
    Pipeline.landDelta(store, "bronze", "lineitem_delta", delta,
      Seq(Seq("l_orderkey", "l_linenumber"), Seq("l_suppkey")))
    assert(store.keySketch("bronze", "lineitem_delta",
      Seq("l_orderkey", "l_linenumber")).isDefined, "landDelta wrote no sidecar")
    val n = Pipeline.refreshSilverLineitemStored(spark, store, "bronze", "lineitem_delta")
    assert(n > 0)
    val expected = rows(store.table("bronze", "lineitem")
      .filter(col("l_quantity") > 0))
    assert(rows(store.table("silver", "lineitem")) == expected,
      "stored-delta refresh diverged from a full re-clean")
    // the gold stored twins run on the same staging table
    val (nInv, nSup) = Pipeline.refreshSupplierMartsStored(
      spark, store, "bronze", "lineitem_delta")
    assert(nInv > 0 && nSup > 0)
  }
}
