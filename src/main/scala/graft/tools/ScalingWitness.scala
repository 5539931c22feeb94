package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale witness for the dedup/ANN family (SCALING.md): runs
  * the candidate-generation stages of q22 (MinHash-LSH), q51
  * (SRP-LSH), q105 (incremental ingest dedup), and q109 (SemDeDup
  * pair scope) on CLUSTERED synthetic corpora at two scales a decade
  * apart — every doc/vector has near-dups, the adversarial shape — and
  * records candidate counts + wall time so the "~linear at 10×" claims
  * carry a measured exponent instead of a small-fixture assert.
  *
  * Not part of the test suite (it is a multi-minute run); invoke:
  *   sbt "runMain graft.tools.ScalingWitness [baseDocs] [baseVecs]"
  * Defaults: 50k docs / 20k vectors at 1×, 10× each at the top scale —
  * 500k docs is 100× the sf0.1 bench corpus. Writes SCALING.md.
  */
object ScalingWitness {

  private def mix(x: Long): Long = {
    var h = x * -7046029254386353131L
    h ^= (h >>> 32); h *= -4417276706812531889L; h ^= (h >>> 29); h
  }

  /** Clustered documents (clusters of 5 near-dups, cluster-private
    * vocabulary — the ScaleSpec fixture shape, at scale). */
  private def docs(s: SparkSession, n: Long): DataFrame = {
    import s.implicits._
    s.range(n).map { i =>
      val c = i / 5
      val text = (0 until 40).map(j =>
        s"t${c}x${if (j == (i % 5) * 7) s"v$i" else j.toString}").mkString(" ")
      (i, text, "en", s"src${(c % 20).toInt}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Clustered embeddings: the ScaleSpec SRP fixture shape at scale —
    * 64-dim (the testdata/plane dimensionality), ~8-dim signed sparse
    * support per cluster, per-doc hair far below any center
    * projection. */
  private def embs(s: SparkSession, n: Long): DataFrame = {
    import s.implicits._
    s.range(n).map { i =>
      val c = i / 5
      val v = (0 until 64).map { d =>
        val m = mix(c * 64 + d)
        val amp = (1.0f + ((m >>> 10) & 3) * 0.25f) *
          (if (((m >>> 13) & 1) == 0) 1.0f else -1.0f)
        val center = if (((m >>> 7) & 7) == 0) amp else 0.0f
        center + (mix(i * 7919 + d) % 1009) * 2e-5f
      }.toArray
      (i, v, (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  case class Cell(op: String, scale: Long, count: Long, wall: Double)

  def main(args: Array[String]): Unit = {
    val baseDocs = args.lift(0).map(_.toLong).getOrElse(50000L)
    val baseVecs = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = collection.mutable.ArrayBuffer.empty[Cell]

    for (mult <- Seq(1L, 10L)) {
      val nd = baseDocs * mult
      val nv = baseVecs * mult
      // materialize the corpora to parquet so every stage reads the
      // real file-scan path (and q105 can run its whole query on a dir)
      val dir = java.nio.file.Files.createTempDirectory(s"scaling_$mult").toString
      docs(spark, nd).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      embs(spark, nv).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      // q22: MinHash-LSH band candidates
      val dtab = spark.read.parquet(s"$dir/documents.parquet")
      val (c22, w22) = timed(graft.operators.TextOps
        .candidatePairsOver(graft.operators.TextOps.bandsOver(
          dtab.select(col("doc_id"), col("text")))).count())
      results += Cell("q22_minhash_lsh_candidates", nd, c22, w22)
      // the r12 scale dial: rows-per-band grow with log₂ n (2 at 1×,
      // 3 at 10× — the q51 band-width path applied to MinHash), so
      // per-band false-collision probability shrinks ~1/n and the
      // bucket join's key populations stay bounded
      val rpb = if (mult == 1L) 2 else 3
      val (c22w, w22w) = timed(graft.operators.TextOps
        .candidatePairsOver(graft.operators.TextOps.bandsOverScaled(
          dtab.select(col("doc_id"), col("text")), rpb)).count())
      results += Cell("q22_minhash_scaled", nd, c22w, w22w)

      // q51: SRP-LSH band candidates over the embeddings — measured at
      // the fixed production band width (16 bits -> 65,536 buckets per
      // band, where birthday cross-collisions grow ~n²/buckets and the
      // exponent drifts above 1 as n outgrows the bucket space) AND at
      // the widened setting the scale path prescribes (buckets ∝ n:
      // 24-bit bands at 10× hold collisions linear)
      val etab = spark.read.parquet(s"$dir/embeddings.parquet")
      val (c51, w51) = timed(graft.operators.VectorOps
        .srpCandidatesOver(graft.operators.VectorOps.srpBandsOver(etab)).count())
      results += Cell("q51_srp_lsh_candidates", nv, c51, w51)
      val rows = if (mult == 1L) 16 else 24
      val (c51w, w51w) = timed(graft.operators.VectorOps
        .srpCandidatesOver(graft.operators.VectorOps.srpBandsOver(etab, rows)).count())
      results += Cell("q51_srp_buckets_scaled", nv, c51w, w51w)

      // q137: containment probe candidates — bottom-k shingle probes
      // vs the full shingle index behind the probe-side df stoplist.
      // Measured twice: on the clustered corpus, and with a planted
      // corpus-wide boilerplate PREFIX on every doc (shingles that
      // sort before every informative shingle AND sit in every doc —
      // without the stoplist they fill all k probe slots and the
      // probe join goes quadratic on those keys)
      def shOf(d: DataFrame) = d
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.shinglesOf(col("toks"))).as("s"))
      val (c137, w137) = timed(graft.operators.TextOps
        .containmentCandidatesOver(shOf(dtab)).count())
      results += Cell("q137_containment_candidates", nd, c137, w137)
      val boiler = dtab.withColumn("text",
        concat(lit("b0 b1 b2 b3 "), col("text")))
      val (c137b, w137b) = timed(graft.operators.TextOps
        .containmentCandidatesOver(shOf(boiler)).count())
      results += Cell("q137_containment_boilerplate", nd, c137b, w137b)

      // q105: the full incremental ingest dedup query on the dir
      // (stored-band probe + exact verify + decisions)
      val (c105, w105) = timed(graft.SparkEntry
        .queries("q105_incremental_dedup")(spark, dir).count())
      results += Cell("q105_incremental_dedup_rows", nd, c105, w105)

      // q109: SemDeDup pair scope with K ∝ N (the paper's recipe —
      // fixed K makes within-cell pairs quadratic BY DESIGN; the scale
      // path grows the cell count with the corpus). Count the actual
      // within-cell candidate pairs the dedup stage would score.
      val k = (64L * mult).toInt
      val (c109, w109) = timed {
        val v = graft.operators.VectorOps.docVectors(spark, dir)
        val (asg, cents) = graft.operators.VectorOps.kmFitFull(v, k, intValued = true)
        val ids = asg.select(col("cell"), col("vec_id"))
        val pairs = ids.as("a").join(ids.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id")).count()
        asg.unpersist()
        pairs
      }
      results += Cell("q109_semdedup_cell_pairs", nd, c109, w109)

      // q109 PRODUCTION fit (the r12 ask): Lloyd on a FIXED-size
      // sample (the base corpus size at both scales), then ONE
      // frozen-centroid assignment pass over the full corpus — the
      // SemDeDup/FAISS deployment recipe. Same K ∝ N cell budget and
      // the same within-cell pair count downstream.
      val (c109s, w109s) = timed {
        val v = graft.operators.VectorOps.docVectors(spark, dir)
        val asg = graft.operators.VectorOps.kmFitSampled(v, k, baseDocs, intValued = true)
        val ids = asg.select(col("cell"), col("vec_id"))
        val pairs = ids.as("a").join(ids.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id")).count()
        asg.unpersist()
        pairs
      }
      results += Cell("q109_semdedup_sampled", nd, c109s, w109s)
      println(s"scale ${mult}x done: " + results.takeRight(8).mkString(", "))
    }

    def exp(a: Cell, b: Cell): Double =
      math.log(b.count.toDouble / a.count) / math.log(b.scale.toDouble / a.scale)
    def wexp(a: Cell, b: Cell): Double =
      math.log(b.wall / a.wall) / math.log(b.scale.toDouble / a.scale)

    val ops = results.map(_.op).distinct
    val lines = ops.map { op =>
      val Seq(a, b) = results.filter(_.op == op).toSeq
      f"| $op | ${a.scale}%,d | ${a.count}%,d | ${a.wall}%.1f | ${b.scale}%,d | ${b.count}%,d | ${b.wall}%.1f | ${exp(a, b)}%.2f | ${wexp(a, b)}%.2f |"
    }
    // table rows are spliced AFTER stripMargin (their leading '|' is
    // markdown, not a margin — stripMargin would eat it)
    val md0 =
      s"""# SCALING — measured 10× witness for the dedup/ANN family
         |
         |Clustered synthetic corpora (every row has near-dups — the
         |adversarial shape for candidate generation), two scales a
         |decade apart, generated and measured by
         |`graft.tools.ScalingWitness` on local[32]. `count exp` /
         |`wall exp` are the measured growth exponents
         |log(big/small)/log(10): ~1 = linear (the 100 TB design
         |claim), ~2 = quadratic (the failure mode the band/bucket
         |designs exist to avoid).
         |
         || stage | N | candidates | wall s | 10N | candidates | wall s | count exp | wall exp |
         ||---|---|---|---|---|---|---|---|---|
         |TABLE_ROWS_PLACEHOLDER
         |
         |Notes:
         |- q22/q51 count the CANDIDATE stage (bands → bucket-local
         |  self-join) — the stage that would go quadratic without
         |  banding; exact verification downstream is candidate-sized.
         |- q22 appears twice: the fixed production setting (K=8,
         |  4 bands × 2 rows — the oracle-pinned q21/q22 surface),
         |  and `q22_minhash_scaled`, the deployment dial where rows
         |  per band grow with log₂ n (2 rows at 1×, 3 at 10×, the
         |  signature widening to keep 4 bands) so per-band
         |  false-collision probability s₀^r shrinks ~1/n and the
         |  bucket join's key populations stay bounded as the corpus
         |  grows — the q51 band-width path applied to MinHash.
         |- q51 appears twice: at the FIXED production band width
         |  (16-bit bands, 65,536 buckets) birthday cross-collisions
         |  grow ~n²/buckets, so its exponent drifts above 1 once n
         |  outgrows the bucket space — a real measured scale property;
         |  `q51_srp_buckets_scaled` applies the scale path (band width
         |  grows with log₂ n: 24-bit bands at 10×, buckets ∝ n) and
         |  the exponent returns to ~1.
         |- q137 counts the containment CANDIDATE stage (bottom-k=8
         |  smallest shingles probing the full shingle index, df >
         |  ContainMaxDf shingles dropped from the probe set). The
         |  `_boilerplate` row prefixes EVERY doc with the same four
         |  tokens — shingles that sort before all informative ones
         |  and sit in every doc, so without the stoplist they would
         |  fill all k probe slots and the probe join would square on
         |  those keys; the stoplist keeps both rows' candidate counts
         |  and exponents at the clean corpus's ~linear values.
         |- q105 is the whole incremental-ingest query (stored-band
         |  probe + exact verify + decisions) at each corpus size; its
         |  delta is the top doc_id decile, so delta and stored index
         |  both scale with N.
         |- q109 follows the SemDeDup recipe of K ∝ N (64 → 640
         |  cells): within-cell pair scope stays ~linear because the
         |  cell population is held constant; at FIXED K the within-cell
         |  pair count is quadratic by design — the exponent here
         |  witnesses the production configuration, not a fixed-K one.
         |- q109's WALL exponent is the flat Lloyd fit at K ∝ N:
         |  assignment work is N·K per round, so the fit itself is
         |  superlinear even though the pair scope (the dedup stage's
         |  real cost driver) measures ~1. `q109_semdedup_sampled` is
         |  the MEASURED production path (the r12 ask): Lloyd trains
         |  on a fixed-size sample (the base corpus size at both
         |  scales) and the frozen centroids assign the full corpus in
         |  ONE pass — the iterative N·K·R cost drops to sample·K·R
         |  plus a single N·K broadcast-assign scan. At K ∝ N that
         |  scan's FLOP count still grows N·K; past this witness's top
         |  scale the assignment itself moves onto the SRP-bucketed
         |  centroid probe (the q52 path) to stay linear.
         |- Walls include each stage's one-time artifact builds
         |  (tokenize, minhash chains, Lloyd fit) — the honest
         |  end-to-end cost at that scale on this host; a contended
         |  host inflates walls, not counts.
         |- Top scale = 500k docs / 200k vectors — 100× the sf0.1
         |  bench corpus documents table.
         |""".stripMargin
    val md = md0.replace("TABLE_ROWS_PLACEHOLDER", lines.mkString("\n"))
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALING.md"),
      md.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(md)
    spark.stop()
  }
}
