package graft

import graft.functions.Cleaning._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties over the cleaning library (SURVEY §5):
  * idempotence, sentinel absorption, score bounds — on generated
  * dirty corpora, evaluated through the real Spark expressions. */
class CleaningPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling from a generator (no scalatest-plus
    * bridge in the offline dependency set). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n * 3).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .take(n).toSeq

  private def forAll[T](g: Gen[T])(body: T => Unit): Unit =
    samples(g, 8).foreach(body)

  private val dirtyString: Gen[String] = for {
    core <- Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf(nullSentinels),
      Gen.oneOf("ACME corp", "##x##", "a  b   c", "$1,234.56", "-42", "03/15/2024"),
      // no symbol-only tokens: edge-stripping "## ## ##" peels one
      // layer per pass (single-pass semantics, like the reference) —
      // pinned separately below
      Gen.listOfN(3, Gen.oneOf("WORD", "word", "W0rd", "#x#", "  ")).map(_.mkString(" ")))
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + core + pad

  private def runBatch(inputs: Seq[String], c: org.apache.spark.sql.Column): Seq[Any] =
    inputs.map(Option(_)).toDF("x").select(c.as("y")).collect().toSeq.map(r => r.get(0))

  test("cleanText is idempotent on generated dirt") {
    forAll(Gen.listOfN(20, dirtyString)) { inputs =>
      val once = runBatch(inputs, cleanText(col("x")))
      val twice = once.map(v => Option(v).map(_.toString).orNull)
        .map(Option(_)).toDF("x").select(cleanText(col("x")).as("y"))
        .collect().toSeq.map(_.get(0))
      assert(once == twice)
    }
  }

  test("known non-idempotence: symbol-only tokens peel per pass (single-pass semantics)") {
    val once = runBatch(Seq("## ## ##"), cleanText(col("x")))
    assert(once == Seq("##")) // edges stripped once, inner token remains
    val twice = runBatch(Seq("##"), cleanText(col("x")))
    assert(twice == Seq(null)) // a second application strips it away
  }

  test("sentinel absorption: any casing/padding of a sentinel goes to NULL") {
    val sentinelGen = for {
      s <- Gen.oneOf(nullSentinels.filter(_.nonEmpty))
      f <- Gen.oneOf[String => String](
        (x: String) => x.toLowerCase, (x: String) => x.toUpperCase,
        (x: String) => s" $x ", (x: String) => x)
    } yield f(s)
    forAll(Gen.listOfN(20, sentinelGen)) { inputs =>
      assert(runBatch(inputs, nullifySentinels(col("x"))).forall(_ == null))
    }
  }

  test("quality score stays within [0, 100]") {
    forAll(Gen.listOfN(10, Gen.choose(0, 8))) { issues =>
      val scores = issues.toDF("i")
        .select(qualityScore(col("i"), 8).as("s"))
        .collect().toSeq.map(_.getDouble(0))
      assert(scores.forall(s => s >= 0.0 && s <= 100.0))
    }
  }

  test("cleanInteger output is always non-negative (sign-drop quirk)") {
    forAll(Gen.listOfN(20, Gen.oneOf(
      Gen.numStr, Gen.numStr.map("-" + _), Gen.alphaStr))) { inputs =>
      val out = runBatch(inputs.map(_.take(8)), cleanInteger(col("x")))
      assert(out.forall(v => v == null || v.asInstanceOf[Int] >= 0))
    }
  }
}
