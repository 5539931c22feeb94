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

  /** Distinct word n-gram shingles from a TOKEN-ARRAY column; fewer
    * than n tokens → empty array. (The guard matters: Spark's
    * sequence(1, 0) DESCENDS, it is not empty like DuckDB's
    * generate_series.)
    *
    * PERF: pass a column that is ALREADY a projected token array
    * (`.select(tokens(col("text")).as("toks"))` in a separate Project),
    * not `tokens(col("text"))` inline. Higher-order functions are
    * interpreted (no codegen) and get no common-subexpression
    * elimination inside the lambda, so an inline `split` re-tokenizes
    * the document once per element_at — ~5·(n_tokens−n+1) splits per
    * row. A pre-projected array is split once per row; Catalyst's
    * CollapseProject keeps the two projections separate exactly
    * because the non-cheap split is referenced many times (measured
    * 13× on the 5-gram explode at sf0.1). */
  def shinglesOf(toks: Column, n: Int = 3): Column = {
    val count = size(toks)
    when(count >= n,
      array_distinct(transform(sequence(lit(1), count - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Inline-from-text form — ONLY for single-use contexts where the
    * shingle array is consumed once per row (e.g. `size(...)` in an
    * already-token-bearing projection). Anything that explodes or
    * repeatedly references the result must use `shinglesOf` over a
    * pre-projected token column instead (see its PERF note). */
  def shingles(text: Column, n: Int = 3): Column = shinglesOf(tokens(text), n)

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

  /** Deterministic per-mille keyed coin over a non-negative BIGINT id
    * (stratified sampling q59, corpus mixing q68): the id splits into
    * 31-bit halves, each Knuth-multiplied and reduced mod 1000 BEFORE
    * the sum — a bare id·2654435761 overflows 64-bit (ANSI error in
    * Spark, BIGINT error in DuckDB) for ids above ~3.5e9, i.e. exactly
    * the corpus sizes samplers are for. Every product here is provably
    * < 2^63 (hi ≤ 2^32 · C1 < 2^31; lo < 2^31 · C2 < 2^32).
    * Reproducible across engines, reruns, and partitionings — the
    * property random() sampling loses — and a narrow map at any
    * scale. ONE definition, with `permilleBucketSql` as its oracle
    * twin: the constants are parity-critical, so they must never be
    * edited in one copy only. */
  def permilleBucket(id: Column): Column = pmod(
    pmod(shiftrightunsigned(id, 31) * lit(1103515245L), lit(1000L)) +
      pmod(id.bitwiseAND(lit(2147483647L)) * lit(2654435761L), lit(1000L)),
    lit(1000L))

  /** SQL twin of permilleBucket for the DuckDB oracle. */
  def permilleBucketSql(id: String): String =
    s"((($id >> 31) * 1103515245) % 1000 + " +
      s"(($id & 2147483647) * 2654435761) % 1000) % 1000"

  /** Hex-digit value of a single lowercase md5 hex char (the simhash
    * decode rule, factored for reuse). */
  private def hexDigit(c: Column): Column = {
    val a = ascii(c)
    when(a >= 97, a - lit(87)).otherwise(a - lit(48)).cast(IntegerType)
  }

  private def hexDigitSql(c: String): String =
    s"(CASE WHEN ascii($c) >= 97 THEN ascii($c) - 87 ELSE ascii($c) - 48 END)"

  /** Feature-hashing (the hashing trick, Weinberger et al. 2009)
    * dimension for a token: first two md5 hex chars -> 0..255, mod
    * `dims`. md5-based like every portable hash here — bit-identical
    * cross-engine. */
  def featureDim(tok: Column, dims: Int): Column =
    (hexDigit(substring(md5(tok.cast(BinaryType)), 1, 1)) * lit(16) +
      hexDigit(substring(md5(tok.cast(BinaryType)), 2, 1))) % lit(dims)

  /** SQL twin of featureDim. Parity-critical pair — never edit one
    * copy only. */
  def featureDimSql(tok: String, dims: Int): String =
    s"((${hexDigitSql(s"substr(md5($tok), 1, 1)")} * 16 + " +
      s"${hexDigitSql(s"substr(md5($tok), 2, 1)")}) % $dims)"

  /** Feature-hashing sign (+1/-1 from md5 hex char 3) — the unbiased
    * signed update of the hashing trick. */
  def featureSign(tok: Column): Column =
    when(hexDigit(substring(md5(tok.cast(BinaryType)), 3, 1)) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** SQL twin of featureSign. Parity-critical pair. */
  def featureSignSql(tok: String): String =
    s"(CASE WHEN ${hexDigitSql(s"substr(md5($tok), 3, 1)")} % 2 = 0 " +
      "THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
}
