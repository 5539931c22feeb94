package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's cleaning/validation library (SURVEY §2.8;
  * silver/silver_builder.py:29-278 + bronze/data_loader.py extractors)
  * as pure `Column => Column` expression builders — no UDFs, so every
  * rule stays inside whole-stage codegen and is usable at any scale.
  *
  * Deliberately-preserved reference quirks:
  *  - integer extraction drops the sign (`\d+`,
  *    silver/silver_builder.py:146-150): "-3" cleans to 3;
  *  - date-format precedence tries %m/%d/%Y BEFORE %d/%m/%Y
  *    (silver/silver_builder.py:154-185) — ambiguous dates resolve US;
  *  - title-case applies only when the input is all-upper or all-lower
  *    (silver/silver_builder.py:36-57);
  *  - unknown status maps to the lowercased input, null to 'unknown'
  *    (silver/silver_builder.py:187-202).
  *
  * Everything is ANSI-mode-safe (try_cast / try_to_timestamp) — dirty
  * input must never throw, it produces NULL and flows to the
  * rejected-rows channel (P6).
  */
object Cleaning {

  /** P7 — null-sentinel normalization (silver/silver_builder.py:33-34). */
  val nullSentinels: Seq[String] =
    Seq("NULL", "N/A", "NOT AVAILABLE", "TBD", "UNKNOWN", "", "NONE", "NIL")

  def nullifySentinels(c: Column): Column =
    when(upper(trim(c)).isin(nullSentinels: _*), lit(null).cast(StringType))
      .otherwise(c)

  /** Whitespace collapse + edge-symbol strip + conditional title-case
    * (silver/silver_builder.py:36-57). Empty result → NULL. */
  def cleanText(c: Column): Column = {
    val collapsed = trim(regexp_replace(c, "\\s+", " "))
    val stripped = trim(regexp_replace(collapsed, "^[^\\p{L}\\p{N}_\\s]+|[^\\p{L}\\p{N}_\\s]+$", ""))
    val cased = when(stripped === upper(stripped) || stripped === lower(stripped),
      initcap(stripped)).otherwise(stripped)
    when(cased === "", lit(null).cast(StringType)).otherwise(cased)
  }

  /** Email: lowercase, trim, full-pattern validate, invalid → NULL
    * (silver/silver_builder.py:59-73). */
  private val emailPattern = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"
  def cleanEmail(c: Column): Column = {
    val e = lower(trim(c))
    when(e.rlike(emailPattern), e).otherwise(lit(null).cast(StringType))
  }

  /** Phone: keep only [digits + ( ) -], require >= 10 digits, else NULL
    * (silver/silver_builder.py:75-92). */
  def cleanPhone(c: Column): Column = {
    val kept = regexp_replace(trim(c), "[^0-9+()\\-]", "")
    val digits = regexp_replace(kept, "[^0-9]", "")
    when(length(digits) >= 10, kept).otherwise(lit(null).cast(StringType))
  }

  /** Money/decimal from dirty text: strip commas, first numeric match,
    * DECIMAL(15,4), negatives clamped to 0 unless allowed
    * (silver/silver_builder.py:94-132). Unparseable → NULL. */
  def cleanDecimal(c: Column, allowNegative: Boolean = false): Column = {
    val noComma = regexp_replace(trim(c), ",", "")
    val m = regexp_extract(noComma, "[-+]?[0-9]*\\.?[0-9]+", 0)
    val d = m.try_cast(DecimalType(15, 4))
    if (allowNegative) d
    else when(d < 0, lit(0).cast(DecimalType(15, 4))).otherwise(d)
  }

  /** Integer from dirty text via `\d+` — the reference drops the sign
    * (absolute value, silver/silver_builder.py:146-150). '' → NULL. */
  def cleanInteger(c: Column): Column =
    regexp_extract(trim(c), "[0-9]+", 0).try_cast(IntegerType)

  /** Multi-format date parse with the reference's fallback precedence
    * (%Y-%m-%d, %m/%d/%Y, %d/%m/%Y, %d-%m-%Y, %Y/%m/%d —
    * silver/silver_builder.py:154-185). All-fail → NULL.
    *
    * Each format attempt is gated on a cheap separator-shape regex:
    * a dash-shaped string can never satisfy a slash format (the
    * pattern's literal separator must match) and vice versa, so the
    * guards are semantics-preserving — they only skip attempts that
    * were guaranteed to fail. This matters because try_to_timestamp
    * failures raise/catch internally: ungated, every dirty or
    * off-format value costs up to 5 exception rounds (the dominant
    * cost of the silver order/date builders — ~3× their runtime). */
  val dateFormats: Seq[String] =
    Seq("yyyy-MM-dd", "MM/dd/yyyy", "dd/MM/yyyy", "dd-MM-yyyy", "yyyy/MM/dd")
  def parseDateMulti(c: Column): Column = {
    val t = trim(c)
    val dash = t.rlike("^[0-9]+-[0-9]+-[0-9]+$")
    val slash = t.rlike("^[0-9]+/[0-9]+/[0-9]+$")
    def p(f: String) = try_to_timestamp(t, lit(f))
    coalesce(
      when(dash, p("yyyy-MM-dd")),
      when(slash, p("MM/dd/yyyy")),
      when(slash, p("dd/MM/yyyy")),
      when(dash, p("dd-MM-yyyy")),
      when(slash, p("yyyy/MM/dd"))).cast(DateType)
  }

  /** Status canonicalization: variant → standard, unknown → lowercased
    * input, NULL → 'unknown' (silver/silver_builder.py:187-202,949-954). */
  def mapStatus(c: Column, mapping: Map[String, Seq[String]]): Column = {
    val lowered = lower(trim(c))
    val chained = mapping.toSeq.sortBy(_._1).foldLeft(lit(null).cast(StringType)) {
      case (acc, (std, variants)) =>
        when(lowered.isin((variants :+ std).map(_.toLowerCase): _*), lit(std)).otherwise(acc)
    }
    when(c.isNull, lit("unknown")).otherwise(coalesce(chained, lowered))
  }

  /** Order-status dictionary (silver/silver_builder.py:949-954). */
  val orderStatusMap: Map[String, Seq[String]] = Map(
    "pending" -> Seq("open", "in progress", "processing", "new"),
    "shipped" -> Seq("in transit", "dispatched", "sent"),
    "delivered" -> Seq("completed", "complete", "done", "fulfilled"),
    "cancelled" -> Seq("canceled", "void", "cancled", "aborted"))

  /** Category split into (main, sub) on the first separator among
    * > - | / (with or without spaces), typo fixes, word-capitalize,
    * defaults ('Uncategorized','General')
    * (silver/silver_builder.py:209-278). */
  val categoryTypoFixes: Map[String, String] = Map(
    "autmootive" -> "Automotive", "battreies" -> "Batteries",
    "electronis" -> "Electronics", "toools" -> "Tools")
  def parseCategory(c: Column): Column = {
    val cleaned = nullifySentinels(trim(c))
    val sep = "[>\\-|/]"
    val hasSep = cleaned.rlike(sep)
    val rawMain = when(hasSep, regexp_extract(cleaned, s"^([^>\\-|/]*)$sep", 1)).otherwise(cleaned)
    val rawSub = when(hasSep, regexp_extract(cleaned, s"^[^>\\-|/]*$sep(.*)$$", 1)).otherwise(lit(""))
    def fix(x: Column): Column = {
      val t = lower(trim(x))
      val fixed = categoryTypoFixes.foldLeft(lit(null).cast(StringType)) {
        case (acc, (typo, corr)) => when(t === typo, lit(corr)).otherwise(acc)
      }
      coalesce(fixed, initcap(t))
    }
    val main = when(cleaned.isNull || trim(rawMain) === "", lit("Uncategorized")).otherwise(fix(rawMain))
    val sub = when(cleaned.isNull || trim(rawSub) === "", lit("General")).otherwise(fix(rawSub))
    struct(main.as("main_category"), sub.as("sub_category"))
  }

  /** Quality score: (fields - issues) / fields * 100, 2dp
    * (silver/silver_builder.py:518-523). */
  def qualityScore(issueCount: Column, fieldCount: Int): Column =
    graft.util.Parity.snapRound(
      (lit(fieldCount) - issueCount).cast(DoubleType) / lit(fieldCount.toDouble) * lit(100.0))

  /** DQ flag: |invoice - qty*price| <= 0.01
    * (silver/silver_builder.py:964-972). */
  def calcCorrect(invoice: Column, qty: Column, price: Column): Column =
    abs(invoice - qty * price) <= lit(0.01)

  /** DQ flag: shipped >= ordered && delivered >= shipped
    * (silver/silver_builder.py:974-981); null dates pass. */
  def dateLogicValid(ordered: Column, shipped: Column, delivered: Column): Column =
    coalesce(shipped >= ordered, lit(true)) && coalesce(delivered >= shipped, lit(true))
}
