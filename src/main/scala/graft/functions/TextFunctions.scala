package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text primitives for the LLM-training-data operators (dedup,
  * similarity, language-ID, quality): tokenization, shingling, and
  * portable hashing.
  *
  * Hashing is md5-based on purpose: it is identical in Spark, DuckDB,
  * and every other engine (unlike murmur `hash()`, which is
  * engine-specific), so dedup decisions are reproducible across the
  * stack. MinHash uses the *lexicographic* min of salted md5 hex
  * strings — order-preserving, engine-portable, no integer conversion
  * needed.
  */
object TextFunctions {

  /** Whitespace tokens (documents are single-space normalized). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles; fewer than n tokens → empty array.
    * (The guard matters: Spark's sequence(1, 0) DESCENDS, it is not
    * empty like DuckDB's generate_series.) */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val count = size(toks)
    when(count >= n,
      array_distinct(transform(sequence(lit(1), count - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Salted portable hash: md5(seed || '|' || s), lowercase hex. */
  def saltedMd5(c: Column, seed: Int): Column =
    md5(concat(lit(s"$seed|"), c).cast(BinaryType))

  /** One MinHash component: lexicographic min over the shingle set's
    * salted hashes. NULL for docs with no shingles. */
  def minHash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed|"), s).cast(BinaryType))))

  /** 32-bit SimHash bit-count contribution expressions: for a token
    * hash column, the per-bit ±1 weight, bits 0..31 from the first 8
    * md5 hex chars (4 bits per char). */
  def simhashBitWeight(tokenHashHex: Column, bit: Int): Column = {
    val a = ascii(substring(tokenHashHex, bit / 4 + 1, 1))
    // hex digit value: '0'-'9' -> ascii-48, 'a'-'f' -> ascii-87
    val v = when(a >= 97, a - lit(87)).otherwise(a - lit(48)).cast(IntegerType)
    lit(2) * shiftright(v, bit % 4).bitwiseAND(lit(1)) - lit(1)
  }

  /** SQL twin of simhashBitWeight for the DuckDB oracle. */
  def simhashBitWeightSql(tokenHashHex: String, bit: Int): String = {
    val a = s"ascii(substr($tokenHashHex, ${bit / 4 + 1}, 1))"
    val v = s"(CASE WHEN $a >= 97 THEN $a - 87 ELSE $a - 48 END)"
    s"(2 * (($v >> ${bit % 4}) & 1) - 1)"
  }
}
