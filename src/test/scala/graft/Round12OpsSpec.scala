package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-12 additions beyond their oracle
  * hashes: q158's C4 line-cleaning rules on planted lines (one line
  * per rule, reason accounting exactly one per dropped line, C4's
  * 3-line page gate), and q160's Gopher repetition battery (exact
  * stats on a planted repeated line, the 0.20 top-2-gram boundary,
  * clean/degenerate docs unflagged). */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory("r12_docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  // a kept line: 10 words, last is a terminal marker
  private val keptLine = "a b c d e f g h i data"
  // blocklist wins over every other rule (priority accounting): this
  // line also ends non-terminal, but must count ONLY as blocklist
  private val blockLine = "a b c d e f g h dup x"
  // ends terminal but fails the word gate at the doc tail (4 words)
  private val shortTail = "a b c data"
  // full-width line that fails only the terminal rule
  private val noTermLine = "a b c d e f g h i x"

  test("q158: each planted line drops for exactly its own reason") {
    val text = Seq(keptLine, blockLine, noTermLine, keptLine).mkString(" ") +
      " " + shortTail // 4 full lines + a 4-token tail line
    val dir = docsDir(Seq((1L, text, "en", "s", 1L)))
    val r = CorpusOps.lineCleanOver(Tables.t(spark, dir, "documents")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_lines")) == 5L)
    assert(row.getLong(row.fieldIndex("kept_lines")) == 2L)
    assert(row.getLong(row.fieldIndex("dropped_blocklist")) == 1L)
    assert(row.getLong(row.fieldIndex("dropped_short")) == 1L)
    assert(row.getLong(row.fieldIndex("dropped_no_terminal")) == 1L)
    assert(row.getLong(row.fieldIndex("n_tokens")) == 44L)
    assert(row.getLong(row.fieldIndex("kept_tokens")) == 20L)
    // C4's >=3-sentence page rule at line grain: 2 kept lines < 3
    assert(!row.getBoolean(row.fieldIndex("doc_kept")))
  }

  test("q158: the page gate keeps a doc at exactly MinDocLines kept lines") {
    val keptDoc = Seq(keptLine, keptLine, keptLine).mkString(" ")
    val dropDoc = Seq(keptLine, keptLine, noTermLine).mkString(" ")
    val dir = docsDir(Seq(
      (1L, keptDoc, "en", "s", 1L), (2L, dropDoc, "en", "s", 1L)))
    val m = CorpusOps.lineCleanOver(Tables.t(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getBoolean(m(1L).fieldIndex("doc_kept")))
    assert(m(1L).getLong(m(1L).fieldIndex("kept_tokens")) == 30L)
    assert(!m(2L).getBoolean(m(2L).fieldIndex("doc_kept")))
  }

  // ---- q160: the Gopher repetition battery -------------------------

  test("q160: a thrice-repeated line trips the battery with exact stats") {
    // 3 identical 10-token lines: dup_line_frac = 2/3; every 5-gram
    // position repeats (period 10 < window span), so the dup-5-gram
    // share clamps to 1; the top 2-gram covers exactly 3*2/30 = 0.2
    // of tokens — NOT strictly over Gopher's 0.20 bound (boundary pin)
    val text = Seq(keptLine, keptLine, keptLine).mkString(" ")
    val dir = docsDir(Seq((1L, text, "en", "s", 1L)))
    val r = CorpusOps.gopherRepetitionOver(Tables.t(spark, dir, "documents")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_tokens")) == 30L)
    assert(row.getLong(row.fieldIndex("n_lines")) == 3L)
    assert(row.getDouble(row.fieldIndex("dup_line_frac")) == 0.666667)
    assert(row.getDouble(row.fieldIndex("top_2gram_frac")) == 0.2)
    assert(row.getDouble(row.fieldIndex("dup_5gram_frac")) == 1.0)
    assert(row.getBoolean(row.fieldIndex("repetitive")))
  }

  test("q160: an all-distinct doc passes clean; a 1-token doc degrades to zeros") {
    val clean = (0 until 50).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq((1L, clean, "en", "s", 1L), (2L, "solo", "en", "s", 1L)))
    val m = CorpusOps.gopherRepetitionOver(Tables.t(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val c = m(1L)
    assert(c.getLong(c.fieldIndex("n_lines")) == 5L)
    assert(c.getDouble(c.fieldIndex("dup_line_frac")) == 0.0)
    assert(c.getDouble(c.fieldIndex("top_4gram_frac")) == 0.08)
    assert(c.getDouble(c.fieldIndex("dup_5gram_frac")) == 0.0)
    assert(!c.getBoolean(c.fieldIndex("repetitive")))
    val s = m(2L) // no n-gram of any order exists: every share is 0
    assert(s.getLong(s.fieldIndex("n_tokens")) == 1L)
    assert(s.getDouble(s.fieldIndex("dup_line_frac")) == 0.0)
    assert(s.getDouble(s.fieldIndex("top_2gram_frac")) == 0.0)
    assert(s.getDouble(s.fieldIndex("dup_5gram_frac")) == 0.0)
    assert(!s.getBoolean(s.fieldIndex("repetitive")))
  }

  // ---- q161: lexical diversity --------------------------------------

  test("q161: entropy/TTR/hapax take their exact closed-form values") {
    val dir = docsDir(Seq(
      (1L, "x y z", "en", "s", 1L), // all-distinct: H = ln 3, TTR = hapax = 1
      (2L, "a a a a", "en", "s", 1L), // one type: H = 0 exactly
      (3L, "a a b b c c d d", "en", "s", 1L))) // 4 types × 2: H = ln 8 − ln 2
    val m = CorpusOps.lexicalDiversityOver(Tables.t(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def d(id: Long, f: String) = m(id).getDouble(m(id).fieldIndex(f))
    assert(d(1L, "entropy") == 1.098612)
    assert(d(1L, "ttr") == 1.0 && d(1L, "hapax_frac") == 1.0)
    assert(d(2L, "entropy") == 0.0)
    assert(d(2L, "ttr") == 0.25 && d(2L, "hapax_frac") == 0.0)
    assert(d(3L, "entropy") == 1.386295) // snapped ln 8 − ln 2 at 6 dp
    assert(d(3L, "ttr") == 0.5 && d(3L, "hapax_frac") == 0.0)
    assert(m(3L).getLong(m(3L).fieldIndex("n_hapax")) == 0L)
  }

  // ---- q162: histogram quality gate ---------------------------------

  test("q162: nearest-rank value cutpoints and tie-safety on planted histograms") {
    val sq = ((1 to 8).map(q => ("a", q.toDouble)) ++
      (1 to 6).map(_ => ("b", 50.0))).toDF("source", "quality")
    val m = graft.operators.TextOps.qualityGateHistOver(sq)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = m("a") // 8 distinct values 1..8: cuts at ranks 2/4/6
    assert(a.getLong(a.fieldIndex("n_docs")) == 8L)
    assert(a.getDouble(a.fieldIndex("v25")) == 2.0)
    assert(a.getDouble(a.fieldIndex("v50")) == 4.0)
    assert(a.getDouble(a.fieldIndex("v75")) == 6.0)
    assert(a.getLong(a.fieldIndex("n_dropped")) == 1L) // only quality 1 < v25
    assert(a.getDouble(a.fieldIndex("drop_frac")) == 0.125)
    val b = m("b") // all-ties source: the gate drops NOTHING (ntile
    // would split the tie across quartiles by doc_id)
    assert(b.getDouble(b.fieldIndex("v25")) == 50.0)
    assert(b.getLong(b.fieldIndex("n_dropped")) == 0L)
    assert(b.getDouble(b.fieldIndex("drop_frac")) == 0.0)
  }
}
