package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology (round-2 verdict: n=1 timings were too noisy to gate a
  * 2× threshold):
  *  - one untimed global warmup (JVM + codegen paths);
  *  - an explicit artifact-prepare phase, timed and reported as
  *    "prep_artifacts": the shared LSH signature chain and the stored
  *    gold marts are built ONCE — the 100 TB design — so per-query
  *    numbers measure consumption, not repeated construction;
  *  - each query executes via a noop sink (full materialization of
  *    every output column — count() lets Catalyst prune projections
  *    and skip sorts, under-measuring map-heavy queries);
  *  - 3 timed runs per query, MIN reported (timeit semantics: the
  *    workloads are deterministic, so the fastest run is the best
  *    estimate of machine capability — the host is multi-tenant and
  *    bursty neighbor contention inflated a zero-code-change round-2
  *    snapshot 2.6×; median-of-3 still absorbs that poorly when a
  *    burst spans a query's whole 3-run window);
  *  - a per-core calibration spin before and after the run ("cal0"/
  *    "cal1", seconds for a fixed CPU-bound workload): if those two
  *    numbers disagree with their clean-window value (~0.5 s) the
  *    whole snapshot ran contended and should be discounted, which
  *    per-query statistics cannot reveal on their own;
  *  - the JSON line is also written to bench_out.json so the result
  *    survives log scraping.
  */
object Bench {
  private def min3(a: Double, b: Double, c: Double): Double =
    math.min(a, math.min(b, c))

  /** One spin thread per hardware core, so cal seconds stay comparable
    * to the documented ~0.5 s clean-window value on any host (a fixed
    * 32 would under-subscribe a 64-core box and over-subscribe 8). The
    * count is emitted in the JSON so snapshots from different hosts
    * are never compared blind. */
  val calThreads: Int = Runtime.getRuntime.availableProcessors

  /** Fixed CPU-bound spin on every core: measures the machine's
    * effective parallel throughput at this instant. Deterministic
    * work (integer LCG folds), no allocation in the loop. */
  def calibrationSpin(threads: Int = calThreads): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var x = t.toLong; var i = 0
        while (i < 200000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
        if (x == 42L) println("") // keep the fold observable
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** The shared-artifact prepare stages, by bench label — single
    * registry shared with tools.TimeIt so ad-hoc timing can never
    * drift from what the bench builds. */
  val prepStages: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "prep_text_lsh" -> ((s, d) => graft.operators.TextOps.prepareArtifacts(s, d)),
    "prep_gold_marts" -> ((s, d) => graft.operators.DqChecks.prepareArtifacts(s, d)),
    "prep_demand_series" -> ((s, d) => graft.operators.Forecast.prepareArtifacts(s, d)),
    "prep_srp_bands" -> ((s, d) => graft.operators.VectorOps.prepareArtifacts(s, d)))

  /** The bench's session, shared with TimeIt. */
  def session(): (SparkSession, String) = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside any timed section
    try {
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.groupBy("r_name").count().count()
    } catch { case _: Throwable => () }
    (spark, sfDir)
  }

  /** One query execution through the noop sink (full materialization
    * of every output column — count() would let Catalyst prune). */
  def runQuery(spark: SparkSession, sfDir: String, name: String): Unit =
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = session()
    // ERROR, not WARN, for the whole benchmarked run: the driver keeps
    // only the last ~2000 chars of stdout+stderr, and a WARN burst
    // (e.g. WindowExec's no-partition warning) landing between the
    // last query and the JSON line can crowd the scraped line out of
    // that window — r03's snapshot parsed null for exactly this
    // reason. Diagnostics belong in bench_out.json, not the tail.
    spark.sparkContext.setLogLevel("ERROR")

    // failures are RECORDED, never swallowed: a failed prepare or
    // query would otherwise report a plausible time-to-failure and the
    // benchmark would look clean while measuring the wrong thing
    val failures = collection.mutable.ArrayBuffer.empty[String]
    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch {
        case e: Throwable =>
          failures += label
          System.err.println(s"[bench] $label FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // cal0 runs BEFORE the prepare phase: prep timings feed the
    // headline total too, so a contention burst spanning only the
    // preps must be visible in the bracket
    val cal0 = calibrationSpin()
    // artifact prepare: shared artifacts built once, each timed as its
    // own cost entry (the stored-silver-table builds of a deployment)
    val preps = prepStages.map { case (label, prep) =>
      label -> timed(label)(prep(spark, sfDir))
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      def once(): Double = timed(name)(runQuery(spark, sfDir, name))
      name -> min3(once(), once(), once())
    }
    val cal1 = calibrationSpin()

    // a failed entry's time-to-failure is NOT a timing: report null for
    // it and keep it out of the total, so the headline number only sums
    // real work (its name is in "failed" for diagnosis)
    val all = results ++ preps
    val failedSet = failures.distinct.toSet
    def jsonLine(key: String => String, num: Double => String): String = {
      val qs = all.map { case (k, v) =>
        "\"" + key(k) + "\":" + (if (failedSet(k)) "null" else num(v))
      }.mkString("{", ",", "}")
      val total = all.collect { case (k, v) if !failedSet(k) => v }.sum
      val failed = failures.distinct.map("\"" + key(_) + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"failed":$failed,"cal0":${num(cal0)},"cal1":${num(cal1)},"cal_threads":$calThreads,"sf":"$sfDir"}"""
    }
    // full-precision, full-name record for humans and tools
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (jsonLine(identity, _.toString) + "\n").getBytes)
    catch { case _: Throwable => () }
    // The round harness keeps only the LAST ~2000 characters of stdout;
    // a line longer than that window arrives truncated and parses as
    // null. Shorten query keys to their qNN prefix (unambiguous — every
    // query name starts with a unique qNN) and round to milliseconds so
    // the printed line always fits the window whole.
    def shortKey(k: String): String =
      if (k.matches("q\\d+_.*")) k.substring(0, k.indexOf('_')) else k
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a decimal-comma locale would corrupt the scraped JSON line
    println(jsonLine(shortKey,
      v => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))))
    spark.stop()
  }
}
