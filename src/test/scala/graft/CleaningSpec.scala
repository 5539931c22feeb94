package graft

import graft.functions.Cleaning._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Table-driven parity tests for the cleaning library, with the dirty
  * corpora from FIXTURES.md §A (semantics lifted from
  * silver/silver_builder.py — see Cleaning's scaladoc for quirk list). */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def run1(c: Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("x")
    df.select(c.as("y")).collect()(0).get(0)
  }

  test("nullifySentinels absorbs all sentinel spellings") {
    for (s <- Seq("NULL", "null", " n/a ", "TBD", "tbd", "", "  ", "None", "NIL", "Not Available"))
      assert(run1(nullifySentinels(col("x")), s) == null, s"sentinel '$s'")
    assert(run1(nullifySentinels(col("x")), "ACME") == "ACME")
  }

  test("cleanText: trim, collapse, edge-strip, conditional title-case") {
    // mixed case (neither isupper nor islower) -> collapse only, no recase
    assert(run1(cleanText(col("x")), "  ACME  corp ") == "ACME corp")
    assert(run1(cleanText(col("x")), "ACME CORP") == "Acme Corp")
    assert(run1(cleanText(col("x")), "###Acme###") == "Acme")
    assert(run1(cleanText(col("x")), "AcMe Corp") == "AcMe Corp") // mixed case kept
    assert(run1(cleanText(col("x")), "###") == null) // empty after strip
  }

  test("cleanEmail validates and lowercases") {
    assert(run1(cleanEmail(col("x")), " John.Doe@X.COM ") == "john.doe@x.com")
    assert(run1(cleanEmail(col("x")), "not-an-email") == null)
    assert(run1(cleanEmail(col("x")), "a@b.c") == null) // TLD < 2
  }

  test("cleanPhone keeps [digits+()-], needs >= 10 digits") {
    assert(run1(cleanPhone(col("x")), "(555) 123-4567 ext9") == "(555)123-45679")
    assert(run1(cleanPhone(col("x")), "12345") == null)
  }

  test("cleanDecimal strips currency/commas, clamps negatives") {
    assert(run1(cleanDecimal(col("x")), "$1,234.56").toString == "1234.5600")
    assert(run1(cleanDecimal(col("x")), "-5").toString == "0.0000")
    assert(run1(cleanDecimal(col("x"), allowNegative = true), "-5").toString == "-5.0000")
    assert(run1(cleanDecimal(col("x")), "garbage") == null)
  }

  test("cleanInteger drops the sign (reference quirk)") {
    assert(run1(cleanInteger(col("x")), "-3") == 3)
    assert(run1(cleanInteger(col("x")), "W 12") == 12)
    assert(run1(cleanInteger(col("x")), "1,250") == 1) // commas break the run, like the reference's \d+
    assert(run1(cleanInteger(col("x")), "abc") == null)
  }

  test("parseDateMulti: US format wins ambiguity (reference precedence)") {
    assert(run1(parseDateMulti(col("x")), "2024-03-15").toString == "2024-03-15")
    assert(run1(parseDateMulti(col("x")), "03/15/2024").toString == "2024-03-15")
    assert(run1(parseDateMulti(col("x")), "15/03/2024").toString == "2024-03-15")
    // ambiguous: both formats match; %m/%d comes first
    assert(run1(parseDateMulti(col("x")), "03/04/2024").toString == "2024-03-04")
    assert(run1(parseDateMulti(col("x")), "15-03-2024").toString == "2024-03-15")
    assert(run1(parseDateMulti(col("x")), "2024/03/15").toString == "2024-03-15")
    assert(run1(parseDateMulti(col("x")), "N/A") == null)
  }

  test("mapStatus canonicalizes variants, unknown->lowercased, null->'unknown'") {
    val c = mapStatus(col("x"), orderStatusMap)
    assert(run1(c, "In Transit") == "shipped")
    assert(run1(c, "Completed") == "delivered")
    assert(run1(c, "VOID") == "cancelled")
    assert(run1(c, "open") == "pending")
    assert(run1(c, "Mystery") == "mystery")
    assert(run1(c, null) == "unknown")
  }

  test("parseCategory: separators, typo fixes, defaults") {
    def parse(s: String): (String, String) = {
      val r = Seq(Option(s)).toDF("x")
        .select(parseCategory(col("x")).as("p"))
        .select(col("p.main_category"), col("p.sub_category")).collect()(0)
      (r.getString(0), r.getString(1))
    }
    assert(parse("Automotive > Tires") == ("Automotive", "Tires"))
    assert(parse("autmootive-battreies") == ("Automotive", "Batteries"))
    assert(parse("safety | high vis") == ("Safety", "High Vis"))
    assert(parse("Tools") == ("Tools", "General"))
    assert(parse("N/A") == ("Uncategorized", "General"))
    assert(parse(null) == ("Uncategorized", "General"))
  }

  test("cleaners are idempotent: clean(clean(x)) == clean(x)") {
    val corpus = Seq("  ACME  corp ", "###Acme###", "ACME CORP", "a b  c", "x")
    val df = corpus.toDF("x")
    val once = df.select(cleanText(col("x")).as("y"))
    val twice = once.select(cleanText(col("y")).as("y"))
    assert(once.collect().map(_.get(0)).toSeq == twice.collect().map(_.get(0)).toSeq)
  }

  test("quality score bounds and value") {
    val df = Seq(0, 1, 2).toDF("issues")
    val scores = df.select(qualityScore(col("issues"), 4).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(scores == Seq(100.0, 75.0, 50.0))
  }

  test("DQ flags: calc-correct tolerance and date logic") {
    val df = Seq((100.0, 10.0, 10.0), (100.02, 10.0, 10.0)).toDF("inv", "qty", "price")
    val flags = df.select(calcCorrect(col("inv"), col("qty"), col("price")).as("f"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(flags == Seq(true, false))
  }
}
