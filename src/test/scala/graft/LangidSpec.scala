package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions.{avg, col, when}

/** q166's reason to exist, as an executable proof: on a corpus whose
  * languages are separable by character structure but share NO word
  * with any stopword list, the q25 heuristic collapses to its fixed
  * tiebreak ('en' for every doc — ~1/3 accuracy) while the trained
  * hashed-bigram classifier learns the separation to 100%. The
  * /root/testdata fixture carries no language signal at all (the text
  * is the same token soup for every lang label), so there BOTH
  * predictors collapse to the majority class and tie — the planted
  * corpus is where learning is observable.
  *
  * Vocabularies use disjoint letter ranges (aa-ff / gg-mm / nn-tt), so
  * the char-bigram distributions are fully separable, and none of the
  * en/es/de stopwords ever appears. */
class LangidSpec extends SparkSpec {
  import spark.implicits._

  private def word(lang: Int, j: Int): String = {
    val alpha = lang match {
      case 0 => "abcdef"
      case 1 => "ghijklm"
      case _ => "nopqrst"
    }
    val c1 = alpha(j % alpha.length)
    val c2 = alpha((j / alpha.length) % alpha.length)
    s"$c1$c2$c1"
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("langid_spec").toString
    val langs = Seq("aa", "gg", "nn")
    (0 until 120).map { i =>
      val l = i % 3
      val text = (0 until 20).map(j => word(l, (i * 7 + j) % 30)).mkString(" ")
      (i.toLong, text, langs(l), "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("trained bigram classifier separates planted languages the stopword heuristic cannot") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val trained = TextOps.langIdTrainedOver(spark, docs)
    val acc = trained.agg(avg(when(col("correct"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0, s"trained accuracy $acc on a fully separable corpus")
    // the heuristic has no stopword hits here: every score ties at 0 and
    // the fixed tiebreak predicts 'en' for all docs -> 0 correct (the
    // planted labels are not in its inventory), so trained > heuristic
    val heur = TextOps.langId(spark, dir)
    val hAcc = heur.agg(avg(when(
      col("predicted_lang") === col("labeled_lang"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(hAcc == 0.0, s"heuristic accuracy $hAcc should be 0 off-inventory")
  }

  test("on the signal-free testdata fixture the trained model never falls below the heuristic") {
    val tdir = "/root/testdata/sf0.001"
    val trained = TextOps.langIdTrained(spark, tdir)
    val tAcc = trained.agg(avg(when(col("correct"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    val heur = TextOps.langId(spark, tdir)
    val hAcc = heur.agg(avg(when(
      col("predicted_lang") === col("labeled_lang"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(tAcc >= hAcc, s"trained $tAcc < heuristic $hAcc")
  }
}
