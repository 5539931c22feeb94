package graft

import graft.operators.{CorpusOps, Eda, TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-11 additions beyond their oracle
  * hashes: q147's Heaps fit on planted all-distinct / fixed-vocab
  * corpora (where β is exactly 1 and exactly 0), q148's √-cap binding
  * on a dominated cell plus partitioning-invariance of the kept set,
  * q149's k-passing-but-homogeneous risk quadrant, and q150 flagging
  * a planted flipped vector without flagging its coherent peers. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q147: Heaps'-law vocabulary growth ---------------------------

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory("r11_docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q147: all-distinct vocabulary fits beta=1 exactly, fixed vocab beta=0") {
    // 'uniq': 1000 globally-distinct tokens over 100 docs -> V(n) = n at
    // every checkpoint, so ln V = ln n pointwise and the OLS slope and
    // r2 are EXACTLY 1 (ys == xs -> num == den == deny).
    val uniq = (0 until 100).map { i =>
      (i.toLong, (0 until 10).map(j => s"u${i}_$j").mkString(" "), "en", "uniq", 1L)
    }
    // 'flat': the same 5 tokens in every doc -> all first occurrences
    // land in checkpoint 1, V is constant, slope exactly 0 and r2 NULL
    // (deny == 0: no y-variance to explain).
    val flat = (100 until 140).map { i =>
      (i.toLong, "t0 t1 t2 t3 t4", "en", "flat", 1L)
    }
    val out = CorpusOps.heapsLawOver(spark, Tables.t(spark, docsDir(uniq ++ flat), "documents"))
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("uniq")
    assert(u.getLong(1) == 1000L && u.getLong(2) == 1000L && u.getLong(3) == 10L)
    assert(u.getDouble(4) == 1.0 && u.getDouble(5) == 1.0)
    val f = out("flat")
    assert(f.getLong(1) == 200L && f.getLong(2) == 5L)
    assert(f.getDouble(4) == 0.0 && f.isNullAt(5))
  }

  // ---- q148: frequency-cap sampling ---------------------------------

  test("q148: the sqrt cap binds on a dominated cell and passes small cells whole") {
    // dominated cell: 100 docs -> quota = 3 * ceil(sqrt(100)) = 30
    val big = (0 until 100).map(i => (i.toLong, "x", "en", "bigsrc", 1L))
    // small cell: 5 docs -> quota = min(5, 3 * ceil(sqrt(5)) = 9) = 5
    val small = (100 until 105).map(i => (i.toLong, "x", "en", "smallsrc", 1L))
    val dir = docsDir(big ++ small)
    val kept = TextOps.freqCapSampleOver(spark, Tables.t(spark, dir, "documents"))
      .collect()
    val byCell = kept.groupBy(_.getString(1))
    assert(byCell("bigsrc").length == 30)
    assert(byCell("bigsrc").forall(r => r.getLong(3) == 100L && r.getLong(4) == 30L))
    assert(byCell("smallsrc").length == 5)
    assert(byCell("smallsrc").forall(r => r.getLong(4) == 5L))
    // the kept SET is a pure function of doc ids — partitioning-invariant
    val rekept = TextOps.freqCapSampleOver(
        spark, Tables.t(spark, dir, "documents").repartition(7))
      .collect().map(_.getLong(0)).toSet
    assert(rekept == kept.map(_.getLong(0)).toSet)
  }

  // ---- q149: l-diversity --------------------------------------------

  test("q149: k-passing homogeneous group is the at-risk quadrant") {
    val d = java.nio.file.Files.createTempDirectory("r11_cust").toString
    val rows =
      // group (1, HOMOG): 20 users, ONE balance band -> passes k, fails l
      (0 until 20).map(i => (i.toLong, 1, "HOMOG", 5000.0 + i)) ++
      // group (2, MIXED): 20 users across 3 bands -> l-diverse
      (20 until 40).map { i =>
        val bal = i % 3 match { case 0 => -10.0; case 1 => 100.0; case _ => 8000.0 }
        (i.toLong, 2, "MIXED", bal)
      } ++
      // group (3, TINY): 5 users, one band -> fails k AND l, but k-gate
      // already suppresses it, so it is NOT the at-risk quadrant
      (40 until 45).map(i => (i.toLong, 3, "TINY", 100.0))
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val out = Eda.lDiversity(spark, d).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r).toMap
    val h = out((1, "HOMOG"))
    assert(h.getLong(2) == 20L && h.getLong(3) == 1L)
    assert(h.getDouble(4) == 1.0 && !h.getBoolean(5) && h.getBoolean(6))
    val m = out((2, "MIXED"))
    assert(m.getLong(3) == 3L && m.getBoolean(5) && !m.getBoolean(6))
    val t = out((3, "TINY"))
    assert(!t.getBoolean(5) && !t.getBoolean(6))
  }

  // ---- q151: UniMax water-filling allocation -------------------------

  test("q151: water level matches the hand fill and spends the budget exactly") {
    // masses 100 / 1000 / 1000 -> B = 4200, caps 400/4000/4000;
    // hand fill: i=1 is the valid breakpoint, theta = (4200-400)/2 = 1900
    val docs =
      (0 until 10).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "aa", "s", 1L)) ++
      (10 until 20).map(i => (i.toLong, Seq.fill(100)("w").mkString(" "), "bb", "s", 1L)) ++
      (20 until 30).map(i => (i.toLong, Seq.fill(100)("w").mkString(" "), "cc", "s", 1L))
    val out = CorpusOps.unimaxAllocOver(spark, Tables.t(spark, docsDir(docs), "documents"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.values.forall(_.getDouble(6) == 1900.0)) // water level
    val a = out("aa")
    assert(a.getLong(1) == 100L && a.getBoolean(3) &&
      a.getDouble(4) == 400.0 && a.getDouble(5) == 4.0)
    val b = out("bb")
    assert(!b.getBoolean(3) && b.getDouble(4) == 1900.0 && b.getDouble(5) == 1.9)
    // the budget is spent exactly: sum alloc == 2 * total mass
    assert(out.values.map(_.getDouble(4)).sum == 4200.0)
  }

  // ---- q152: contamination span excision -----------------------------

  test("q152: consecutive hits coalesce into one span, disjoint hits stay two") {
    // eval doc: "e1 .. e8" (8 tokens -> grams at 1..4) plus a second
    // passage "f1 .. f5" (one gram)
    val eval5 = (1 to 8).map(i => s"e$i").mkString(" ")
    val evalF = (1 to 5).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (100L, eval5 + " " + evalF, "en", "src0", 1L),
      // doc 1: quotes the full e-passage inside filler — grams at
      // positions 3..6 overlap pairwise -> ONE merged span of 12..? no:
      // tokens 3..10 hold e1..e8, hits at st=3,4,5,6, merged [3, 11) = 8 tokens
      (1L, "a b " + eval5 + " c d", "en", "srcT", 1L),
      // doc 2: quotes e1..e5 at the start AND f1..f5 at the end with a
      // gap -> TWO merged spans, 5 tokens each
      (2L, (1 to 5).map(i => s"e$i").mkString(" ") + " x y z " + evalF, "en", "srcT", 1L),
      // doc 3: clean
      (3L, "p q r s t u v w x y", "en", "srcT", 1L))
    val dir = docsDir(docs)
    val out = CorpusOps.spanExcision(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(100L)) // eval docs are not scored
    val d1 = out(1L)
    assert(d1.getLong(1) == 12L && d1.getLong(2) == 4L && d1.getLong(3) == 1L)
    assert(d1.getLong(4) == 8L && d1.getLong(5) == 4L)
    val d2 = out(2L)
    assert(d2.getLong(2) == 2L && d2.getLong(3) == 2L && d2.getLong(4) == 10L)
    assert(d2.getDouble(6) == 10.0 / 13.0)
    val d3 = out(3L)
    assert(d3.getLong(2) == 0L && d3.getLong(4) == 0L &&
      d3.getLong(5) == d3.getLong(1) && d3.getDouble(6) == 0.0)
  }

  // ---- q153/q154: trend test + changepoint ----------------------------

  private def ordersDir(rows: Seq[(Long, Long, String, Double, java.sql.Timestamp, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("r11_orders").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("q153: monotone counts trend, constant series is all ties with z=0") {
    var key = 0L
    val rows =
      // UP: day k has k orders -> S = n(n-1)/2, no ties, z >> 1.96
      (1 to 30).flatMap(k => (1 to k).map { _ =>
        key += 1; (key, 1L, "F", 10.0, ts(k), "UP") }) ++
      // FLAT: 2 orders every day -> S = 0, one big tie group, var_s = 0
      (1 to 30).flatMap(k => (1 to 2).map { _ =>
        key += 1; (key, 1L, "F", 10.0, ts(k), "FLAT") })
    val out = Eda.mannKendall(spark, ordersDir(rows)).collect()
      .map(r => r.getString(0) -> r).toMap
    val up = out("UP")
    assert(up.getLong(1) == 30L && up.getLong(2) == 435L && up.getLong(3) == 0L)
    assert(up.getString(6) == "increasing")
    val flat = out("FLAT")
    assert(flat.getLong(2) == 0L && flat.getDouble(4) == 0.0 &&
      flat.getDouble(5) == 0.0 && flat.getString(6) == "no_trend")
  }

  test("q154: a planted level shift is found at the step day with exact means") {
    var key = 0L
    val rows = (1 to 20).map { k =>
      key += 1; (key, 1L, "F", if (k <= 10) 100.0 else 200.0, ts(k), "STEP")
    }
    val r = Eda.cusumChangepoint(spark, ordersDir(rows)).collect().head
    assert(r.getLong(1) == 20L && r.getDate(2).toString == "2024-01-10" &&
      r.getLong(3) == 10L)
    assert(r.getDouble(4) == 500.0) // max |sum(y - mean)| = 10 * |100 - 150|
    assert(r.getDouble(5) == 100.0 && r.getDouble(6) == 200.0 && r.getDouble(7) == 100.0)
  }

  // ---- q155: weighted sampling ----------------------------------------

  private def snap(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s + 4, BigDecimal.RoundingMode.HALF_UP)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q155: the draw equals an independent A-ES reference and favors weight") {
    // weight column is n_chars: 75 heavy (1e5) vs 75 light (1)
    val docs = (0 until 150).map { i =>
      (i.toLong, "x", "en", "s", if (i % 2 == 0) 100000L else 1L)
    }
    val out = TextOps.weightedSample(spark, docsDir(docs)).collect()
    assert(out.length == 100)
    def md5hex(str: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ref = docs.map { case (id, _, _, _, w) =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(13), 16)
      val u = (h + 1).toDouble / 4503599627370497.0
      (snap(-snap(math.log(u), 6) / w.toDouble, 8), id)
    }.sortBy(identity).take(100)
    assert(out.map(_.getLong(1)).toSeq == ref.map(_._2))
    // the exponential race all but guarantees every heavy doc wins
    assert(out.count(_.getLong(3) == 100000L) == 75)
  }

  // ---- q156: reciprocal-rank fusion ------------------------------------

  test("q156: fusion scores are exactly the sum of per-system rank contributions") {
    val out = TextOps.rrfFusion(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val contribs = Seq(5, 6).flatMap(i =>
        if (r.isNullAt(i)) None else Some(r.getInt(i)))
      assert(r.getLong(4) == contribs.size) // n_systems = present ranks
      val expect = snap(
        contribs.map(k => BigDecimal(snap(1.0 / (k + 60), 8))).sum.toDouble, 8)
      assert(r.getDouble(3) == expect)
    }
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // the bm25_rank column mirrors q134's ranking exactly
    val bm = TextOps.bm25Search(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getInt(1)).toMap
    out.filter(!_.isNullAt(5)).foreach { r =>
      assert(bm((r.getString(0), r.getLong(2))) == r.getInt(5))
    }
  }

  // ---- q157: measured ANN recall --------------------------------------

  test("q157: the recall dial is monotone across the IVF configurations") {
    val rows = VectorOps.annRecall(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 3)
    val p1 = rows("cells08_probe1").getDouble(3)
    val p2 = rows("cells08_probe2").getDouble(3)
    val c32 = rows("cells32_probe4").getDouble(3)
    // more probes (same cells) and finer cells both buy recall — the
    // q52/q80 scaladoc claims, now measured at the oracle surface
    assert(p1 <= p2 && p2 <= c32)
    assert(c32 >= 0.9) // the production point's ScaleSpec floor
    rows.values.foreach { r =>
      assert(r.getLong(2) == 20L)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) <= r.getDouble(3)) // min <= mean
    }
  }

  // ---- q150: embedding outliers -------------------------------------

  test("q150: a flipped vector is the only member flagged in its label") {
    val d = java.nio.file.Files.createTempDirectory("r11_emb").toString
    // label 0: 19 coherent vectors near +x (distinct small second dims
    // so the std is nonzero), 1 flipped vector at -x
    val coherent = (0 until 19).map { i =>
      (i.toLong, Seq(1.0f, 0.01f * i, 0.0f, 0.0f), 0)
    }
    val flipped = Seq((19L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 0))
    (coherent ++ flipped).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = VectorOps.embeddingOutliers(spark, d).collect()
    assert(out.length == 20) // every member emitted, not just outliers
    val flagged = out.filter(_.getBoolean(6)).map(_.getLong(1)).toSeq
    assert(flagged == Seq(19L))
    val z19 = out.find(_.getLong(1) == 19L).get.getDouble(5)
    assert(z19 < -2.0)
  }
}
