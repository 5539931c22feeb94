package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Semantic pins for the corpus-curation operators on handcrafted
  * documents (written to a temp parquet dir so the queries run their
  * real read path): repetition fractions, contamination overlap
  * accounting, vocabulary ranking. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("corpus_spec").toString
    Seq(
      // doc 1: one token repeated 10x -> every trigram identical
      (1L, Seq.fill(10)("spam").mkString(" "), "en", "srcT", 49L),
      // doc 2: 7 distinct tokens -> zero repetition
      (2L, "a b c d e f g", "en", "srcT", 13L),
      // doc 3: two tokens -> no trigrams at all
      (3L, "x y", "en", "srcT", 3L),
      // doc 4: exact copy of eval doc 100 -> fully contaminated
      (4L, "p q r s t u v w", "en", "srcT", 15L),
      // eval doc (the held-out source)
      (100L, "p q r s t u v w", "en", "src0", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition profile: all-same, all-distinct, and too-short docs") {
    val rows = CorpusOps.repetitionProfile(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 10 tokens, 8 trigrams, 1 distinct -> dup frac 1 - 1/8
    assert(rows(1L).getDouble(3) == 1.0 - 1.0 / 8.0)
    assert(rows(1L).getDouble(4) == 1.0) // top token = all tokens
    assert(rows(1L).getBoolean(5))
    // doc 2: everything distinct -> 0 repetition, top share 1/7
    assert(rows(2L).getDouble(3) == 0.0)
    assert(rows(2L).getDouble(4) == 1.0 / 7.0)
    assert(!rows(2L).getBoolean(5))
    // doc 3: no trigrams -> frac defined as 0, not NULL/NaN
    assert(rows(3L).getLong(2) == 0L && rows(3L).getDouble(3) == 0.0)
  }

  test("decontamination: exact eval copy is fully contaminated, rest clean") {
    val rows = CorpusOps.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(100L)) // eval docs are not scored
    val d4 = rows(4L) // 8 tokens -> 4 distinct 5-grams, all matched
    assert(d4.getLong(1) == 4L && d4.getLong(2) == 4L && d4.getLong(3) == 1L)
    assert(d4.getDouble(4) == 1.0 && d4.getBoolean(5))
    assert(rows(1L).getLong(2) == 0L && !rows(1L).getBoolean(5))
    assert(rows(3L).getLong(1) == 0L && rows(3L).getDouble(4) == 0.0)
  }

  test("vocabulary: occurrence-ranked with doc frequencies") {
    val v = CorpusOps.vocabulary(spark, dir).collect()
    assert(v.head match { case Row(1, "spam", 10L, 1L) => true; case _ => false })
    // p..w appear twice (train doc 4 + eval doc 100), 2 docs each
    val p = v.find(_.getString(1) == "p").get
    assert(p.getLong(2) == 2L && p.getLong(3) == 2L)
    // ranks are 1..n dense in order
    assert(v.map(_.getInt(0)).toSeq == (1 to v.length))
  }

  test("DSIR weights: target-like raw docs score positive and are selected") {
    // target (src0) speaks vocabulary A; the raw pool has two docs in
    // vocabulary A (should look target-like) and two in a disjoint
    // vocabulary B (should not); a two-token doc with one bigram and a
    // one-token doc with none pin the degenerate shapes
    val d = java.nio.file.Files.createTempDirectory("dsir_spec").toString
    // texts long enough that feature totals dominate the add-1
    // smoothing mass (D = 256 pseudo-counts): at production scale
    // totals >> D always; the fixture must respect that regime or
    // the smoothing flattens every ratio toward 1
    val vocabA = Seq.fill(50)("alpha beta gamma delta").mkString(" ")   // 200 tokens
    val vocabB = Seq.fill(50)("omega psi chi tau").mkString(" ")
    Seq(
      (100L, vocabA, "en", "src0", 30L), // target
      (101L, vocabA, "en", "src0", 30L), // target
      (1L, vocabA, "en", "srcT", 30L),
      (2L, Seq.fill(50)("beta gamma delta alpha").mkString(" "), "en", "srcT", 30L),
      (3L, vocabB, "en", "srcT", 30L),
      (4L, Seq.fill(50)("psi chi tau omega").mkString(" "), "en", "srcT", 30L),
      (5L, "alpha beta", "en", "srcT", 10L),
      (6L, "solo", "en", "srcT", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = CorpusOps.dsirWeights(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "every raw doc gets a row; target docs none")
    for (id <- Seq(1L, 2L, 5L)) {
      assert(rows(id).getDouble(2) > 0.0, s"target-like doc $id should score positive")
      assert(rows(id).getBoolean(3), s"doc $id should be selected")
    }
    for (id <- Seq(3L, 4L)) {
      assert(rows(id).getDouble(2) < 0.0, s"off-distribution doc $id should score negative")
      assert(!rows(id).getBoolean(3))
    }
    // the zero-bigram doc is present, scoreless, unselected
    assert(rows(6L).getLong(1) == 0L && rows(6L).getDouble(2) == 0.0 && !rows(6L).getBoolean(3))
    // per-occurrence counting: doc 1 has 200 tokens -> 199 bigrams
    assert(rows(1L).getLong(1) == 199L)
  }

  test("pack chunks: offsets, boundary crossing, empty docs, two-level sum composes") {
    // token counts chosen around the PackLen=128 boundary: doc 1 fills
    // 0..99, doc 2 spans 100..227 (crosses chunk 0→1), doc 3 is empty,
    // doc 4 lands exactly on a boundary at 228..355 (crosses 1→2),
    // doc 5 starts at 356
    val counts = Seq(1L -> 100L, 2L -> 128L, 3L -> 0L, 4L -> 128L, 5L -> 10L)
    val dt = counts.toDF("doc_id", "n_toks")
    // tiny group width (2 docs/group) so the group-offset level is
    // genuinely exercised, and the result must equal the width-∞
    // single-group naive cumsum row for row
    val two = CorpusOps.packChunksOver(dt, groupWidth = 2).collect().map(_.toSeq)
    val one = CorpusOps.packChunksOver(dt, groupWidth = 1000000).collect().map(_.toSeq)
    assert(two.toSeq == one.toSeq, "two-level prefix sum diverged from the naive cumsum")
    val byId = two.map(r => r.head -> r).toMap
    assert(byId(1L) == Seq(1L, 100L, 0L, 0L, 0L, 1L, false))
    assert(byId(2L) == Seq(2L, 128L, 100L, 0L, 1L, 2L, true))
    assert(byId(3L) == Seq(3L, 0L, 228L, null, null, 0L, false))
    assert(byId(4L) == Seq(4L, 128L, 228L, 1L, 2L, 2L, true))
    assert(byId(5L) == Seq(5L, 10L, 356L, 2L, 2L, 1L, false))
  }

  test("source JSD: disjoint-vocabulary pairs appear with jsd = ln 2") {
    // three sources: A and B share a token, C is fully disjoint from
    // both — the matrix must still carry (A,C) and (B,C), at exactly
    // the disjoint maximum, or "never compared" and "maximally far"
    // would be indistinguishable downstream
    val d = java.nio.file.Files.createTempDirectory("jsd_spec").toString
    Seq(
      (1L, "alpha beta", "en", "srcA", 10L),
      (2L, "alpha gamma", "en", "srcB", 11L),
      (3L, "omega psi chi", "en", "srcC", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = CorpusOps.sourceJsd(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.keySet == Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    val ab = rows(("srcA", "srcB"))
    assert(ab.getLong(2) == 1L && ab.getDouble(3) < 0.693147)
    for (pair <- Seq(("srcA", "srcC"), ("srcB", "srcC"))) {
      val r = rows(pair)
      assert(r.getLong(2) == 0L, s"$pair should share no terms")
      assert(r.getDouble(3) == 0.693147, s"$pair should sit at ln 2 snapped 6dp")
    }
  }

  test("LR quality classifier: margins separate a planted target vocabulary") {
    // class-balanced fixture (4 eval vs 4 raw) so the 3-epoch margin
    // crosses zero on the target side: eval docs pull shared-bucket
    // weights positive, gibberish-only buckets go negative
    val vocabA = Seq.fill(50)("alpha beta gamma delta").mkString(" ")
    val vocabB = Seq.fill(50)("omega psi chi tau").mkString(" ")
    val docs = Seq(
      (100L, vocabA, "en", "src0", 30L),
      (101L, vocabA, "en", "src0", 30L),
      (102L, vocabA, "en", "src0", 30L),
      (103L, vocabA, "en", "src0", 30L),
      (1L, vocabA, "en", "srcT", 30L), // target-like raw
      (2L, Seq.fill(50)("beta gamma delta alpha").mkString(" "), "en", "srcT", 30L),
      (3L, vocabB, "en", "srcT", 30L), // off-distribution raw
      (4L, Seq.fill(50)("psi chi tau omega").mkString(" "), "en", "srcT", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CorpusOps.lrQualityOver(spark, docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L), "raw docs scored, eval docs not")
    for (id <- Seq(1L, 2L)) {
      assert(rows(id).getDouble(2) > 0.0, s"target-like doc $id should carry a positive margin")
      assert(rows(id).getBoolean(3), s"doc $id should be selected")
    }
    for (id <- Seq(3L, 4L)) {
      assert(rows(id).getDouble(2) < 0.0, s"off-distribution doc $id should score negative")
      assert(!rows(id).getBoolean(3))
    }
    // unigram features: 200 tokens per doc = 200 feature occurrences
    assert(rows(1L).getLong(1) == 200L)
    // determinism: a second training run lands on the identical model
    val again = CorpusOps.lrQualityOver(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.map { case (k, r) => k -> r.getDouble(2) } == again)
  }

  test("data-budget plan: epochs and effective tokens follow the measured masses") {
    // the engine-side snap chain, recomputed independently
    def snap(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s + 4, BigDecimal.RoundingMode.HALF_UP)
        .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def eff(u: Long, epochs: Double): Double =
      snap(u.toDouble * 4.0 * (1.0 - snap(math.exp(-epochs / 4.0), 6)), 2)
    val d = java.nio.file.Files.createTempDirectory("budget_spec").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, words(5), "en", "srcA", 10L),
      (2L, words(5), "en", "srcA", 10L),   // srcA: 10 unique tokens
      (3L, words(20), "en", "srcB", 40L),  // srcB: 20
      (4L, words(100), "en", "srcC", 200L),
      (5L, words(100), "en", "srcC", 200L),
      (6L, words(100), "en", "srcC", 200L)) // srcC: 300
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // T = 330, budget = 2T = 660, uniform over 3 sources -> target 220
    val rows = CorpusOps.dataBudgetPlan(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((src, u, ep, con) <- Seq(
        ("srcA", 10L, 22.0, true),
        ("srcB", 20L, 11.0, true),
        ("srcC", 300L, snap(220.0 / 300.0, 6), false))) {
      val r = rows(src)
      assert(r.getLong(2) == u, s"$src unique mass")
      assert(r.getLong(3) == 220L, s"$src target")
      assert(r.getDouble(4) == ep, s"$src epochs")
      assert(r.getDouble(5) == eff(u, ep), s"$src effective tokens")
      assert(r.getBoolean(6) == con, s"$src constraint flag")
      // the diminishing-returns bound: repetition never buys more than
      // R*·U, and a constrained source's effective mass undershoots
      // its target
      assert(r.getDouble(5) <= 4.0 * u)
      if (con) assert(r.getDouble(5) < 220.0)
    }
  }

  test("training manifest = funnel survivors ∩ train split, packed in id order") {
    import graft.operators.TextOps
    val manifest = CorpusOps.trainingManifest(spark, sf0001).collect()
    assert(manifest.nonEmpty, "sf0.001 must yield a nonempty manifest")
    val ids = manifest.map(_.getLong(0))
    assert(ids.sorted.sameElements(ids), "manifest is doc_id-ordered")
    // membership recomputed from the COMPONENT queries (the frames the
    // manifest claims to compose)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val quality = TextOps.qualityScore(spark, sf0001)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val passQ = docs.keySet.filter(id => quality(id) >= 50.0)
    val exactKeep = passQ.groupBy(id => docs(id)._1).values.map(_.min).toSet
    val canonical = TextOps.dedupClusters(spark, sf0001)
      .filter(col("is_canonical")).select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = CorpusOps.decontaminate(spark, sf0001)
      .filter(col("is_contaminated")).select("doc_id").collect().map(_.getLong(0)).toSet
    val train = TextOps.splitAssign(spark, sf0001)
      .filter(col("split") === "train").select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = exactKeep.filter(id => canonical(id) && !contaminated(id) &&
      train(id) && docs(id)._2 != "src0")
    assert(ids.toSet == expected,
      s"manifest composes the stages: got ${ids.size}, expected ${expected.size}")
    // offsets are the exact running sum of n_toks in doc_id order
    var run = 0L
    for (r <- manifest) {
      assert(r.getLong(2) == run, s"doc ${r.getLong(0)} offset")
      run += r.getLong(1)
    }
  }
}
