package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, TextOps, VectorOps}

/** Behavioral pins for the round-9 curation/mining additions beyond
  * their oracle hashes: the q115 encode against an independent Scala
  * BPE reference (trainer + classic-scan encoder) on a handcrafted
  * corpus, q116/q117 against driver-side brute-force within-cell
  * references (the KmeansSpec q109 pattern), and q118's accounting
  * tie to the q23 verified pairs. */
class CurationMiningSpec extends SparkSpec {
  import spark.implicits._

  private def snap(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s + 4, BigDecimal.RoundingMode.HALF_UP)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- q115 vs an independent BPE implementation -------------------

  /** Classic greedy left-to-right non-overlapping merge scan (the
    * i += 2 rule) — written independently of the production fold. */
  private def refMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer: freq-weighted pair counts over word types,
    * argmax (count DESC, then (a, b) lexicographic), `rounds` rounds. */
  private def refTrainEncode(wordFreq: Map[String, Long],
      rounds: Int): Map[String, Vector[String]] = {
    var enc: Map[String, Vector[String]] =
      wordFreq.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    for (_ <- 1 to rounds) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- enc; i <- 0 until syms.length - 1)
        pc(syms(i) -> syms(i + 1)) =
          pc.getOrElse(syms(i) -> syms(i + 1), 0L) + wordFreq(w)
      val (a, b) = pc.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head._1
      enc = enc.map { case (w, syms) => w -> refMerge(syms, a, b) }
    }
    enc
  }

  test("q115 encode matches an independent BPE trainer+encoder") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_spec").toString
    val docs = Seq(
      (1L, "low low low low low lower lower", "en", "sA", 10L),
      (2L, "newest newest newest newest newest newest", "en", "sA", 10L),
      (3L, "widest widest widest low lower newest", "en", "sB", 10L),
      (4L, "a ab abab lowest", "en", "sB", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val words = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val enc = refTrainEncode(freq, rounds = 5)
    def nSub(w: String): Long = {
      val syms = enc(w)
      (syms.length - (if (syms.last == "</w>") 1 else 0)).toLong
    }
    val bySource = docs.groupBy(_._4).map { case (src, ds) =>
      val ws = ds.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      val cnt = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val nWords = cnt.values.sum
      val nSubTok = cnt.map { case (w, c) => c * nSub(w) }.sum
      val nChars = cnt.map { case (w, c) => c * w.length }.sum
      src -> ((nWords, cnt.size.toLong, nSubTok,
        nSubTok.toDouble / nWords.toDouble, nChars.toDouble / nSubTok.toDouble))
    }
    val out = CorpusOps.bpeEncode(spark, dir).collect()
    assert(out.length == bySource.size)
    for (r <- out) {
      val (nW, nT, nS, fert, cps) = bySource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_words") == nW)
      assert(r.getAs[Long]("n_word_types") == nT)
      assert(r.getAs[Long]("n_subword_tokens") == nS,
        s"${r.getAs[String]("source")}: n_subword_tokens ${r.getAs[Long]("n_subword_tokens")} != $nS")
      assert(r.getAs[Double]("fertility") == fert)
      assert(r.getAs[Double]("chars_per_subword") == cps)
    }
    // the learned-merge compression must actually bite: with zero
    // merges fertility == mean word length (n_sub = len(w)), so a
    // working trainer must push every source's fertility strictly
    // below it (equivalently chars_per_subword > 1)
    for (r <- out) {
      val meanWordLen = r.getAs[Long]("n_subword_tokens") *
        r.getAs[Double]("chars_per_subword") / r.getAs[Long]("n_words")
      assert(r.getAs[Double]("fertility") < meanWordLen,
        s"${r.getAs[String]("source")}: merges compressed nothing")
    }
  }

  // ---- q116 vs a brute-force within-cell reference ------------------

  test("q116 equals a brute-force within-cell decontamination reference") {
    val asg = VectorOps.docKmeansAssignment(spark, sf0001)
      .select(col("vec_id"), col("e"), col("norm2"), col("cell"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Double]]("e").toArray,
        r.getAs[Double]("norm2"), r.getAs[Long]("cell")))
    val src = Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val expected = scala.collection.mutable.Map[Long, (Long, Double, Long)]()
    for {
      (_, members) <- asg.groupBy(_._4)
      p <- members if src(p._1) != "src0"
      q <- members if src(q._1) == "src0"
    } {
      val dot = p._2.indices.foldLeft(0.0)((acc, i) => acc + p._2(i) * q._2(i))
      val cos = dot / (math.sqrt(p._3) * math.sqrt(q._3))
      if (cos >= 0.8) {
        expected.get(p._1) match {
          case Some((bq, bc, n)) =>
            val better = cos > bc || (cos == bc && q._1 < bq)
            expected(p._1) = (if (better) (q._1, cos, n + 1) else (bq, bc, n + 1))
          case None => expected(p._1) = (q._1, cos, 1L)
        }
      }
    }
    assert(expected.nonEmpty, "fixture lost its cross-source near-duplicates")
    val out = VectorOps.semanticDecon(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("eval_doc_id"), r.getAs[Double]("cosine"),
          r.getAs[Long]("n_eval_hits")))).toMap
    assert(out.keySet == expected.keys.toSet,
      s"flag sets differ: extra=${(out.keySet -- expected.keys).toSeq.sorted} " +
        s"missing=${(expected.keys.toSet -- out.keySet).toSeq.sorted}")
    for ((id, (bq, bc, n)) <- expected) {
      assert(out(id)._1 == bq, s"doc $id: witness ${out(id)._1} != $bq")
      assert(out(id)._2 == snap(bc, 6), s"doc $id: cosine mismatch")
      assert(out(id)._3 == n, s"doc $id: n_eval_hits ${out(id)._3} != $n")
    }
    assert(out.keys.forall(src(_) != "src0"), "an eval doc was flagged")
  }

  // ---- q117 vs a brute-force within-cell reference ------------------

  test("q117 equals a brute-force within-cell hard-negative reference") {
    val lab = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val asg = VectorOps.kmeansAssignment(spark, sf0001)
      .select(col("vec_id"), col("e"), col("norm2"), col("cell"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Double]]("e").toArray,
        r.getAs[Double]("norm2"), r.getAs[Long]("cell")))
    val expected = (for {
      (_, members) <- asg.groupBy(_._4).toSeq
      p <- members
    } yield {
      val negs = members
        .filter(q => lab(q._1) != lab(p._1))
        .map { q =>
          val dot = p._2.indices.foldLeft(0.0)((acc, i) => acc + p._2(i) * q._2(i))
          (q._1, dot / (math.sqrt(p._3) * math.sqrt(q._3)))
        }
        .sortBy { case (id, cos) => (-cos, id) }
        .take(3).toSeq
      p._1 -> negs
    }).filter(_._2.nonEmpty).toMap
    val out = VectorOps.hardNegatives(spark, sf0001).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[Long]("neg_id"), r.getAs[Double]("cosine"))).toSeq }
    assert(out.keySet == expected.keySet, "anchor sets differ")
    for ((id, negs) <- expected) {
      assert(out(id).map(_._1) == negs.map(_._1),
        s"anchor $id: negatives ${out(id).map(_._1)} != ${negs.map(_._1)}")
      for (((_, got), (_, want)) <- out(id).zip(negs))
        assert(got == snap(want, 6), s"anchor $id: cosine mismatch")
    }
    // the mined rows must actually be negatives
    val labels = VectorOps.hardNegatives(spark, sf0001).collect()
    assert(labels.forall(r => r.getAs[Int]("label") != r.getAs[Int]("neg_label")),
      "a same-label row leaked into the negatives")
  }

  // ---- q119 split-leakage accounting --------------------------------

  test("q119 reports exactly the straddling verified pairs, oriented eval-side") {
    def bucket(id: Long): Long =
      (((id >>> 31) * 1103515245L) % 1000L + ((id & 2147483647L) * 2654435761L) % 1000L) % 1000L
    def isEval(id: Long): Boolean = bucket(id) < 100
    val straddling = TextOps.ngramJaccard(spark, sf0001)
      .filter(col("jaccard") >= 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .filter { case (a, b) => isEval(a) != isEval(b) }
    assert(straddling.nonEmpty, "fixture/coin lost its straddling pairs")
    val out = TextOps.splitLeakage(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("n_train_dups")).sum == straddling.length,
      "leak mass != straddling pair count")
    assert(out.forall(r => isEval(r.getAs[Long]("eval_doc_id"))),
      "a leak row's subject is not a heldout doc")
    assert(out.forall(r => !isEval(r.getAs[Long]("train_doc_id"))),
      "a leak row's witness is not a training doc")
    assert(out.map(_.getAs[Long]("eval_doc_id")).toSet ==
      straddling.map { case (a, b) => if (isEval(a)) a else b }.toSet,
      "compromised-doc sets differ")
  }

  // ---- q118 accounting ties to the verified pairs -------------------

  test("q118 matrix accounts for exactly the verified >= 0.8 pairs") {
    val out = TextOps.mirrorMatrix(spark, sf0001).collect()
    val verified = TextOps.ngramJaccard(spark, sf0001)
      .filter(col("jaccard") >= 0.8).count()
    assert(verified > 0, "fixture lost its near-duplicate pairs")
    assert(out.map(_.getAs[Long]("n_pairs")).sum == verified,
      "matrix pair mass != verified pair count")
    assert(out.forall(r =>
      r.getAs[String]("source_a") <= r.getAs[String]("source_b")),
      "source pair not canonically ordered")
    assert(out.forall(r => r.getAs[Double]("mean_jaccard") >= 0.799999),
      "mean jaccard below the mirror threshold")
  }
}
