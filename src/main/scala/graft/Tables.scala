package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer for the driver-generated TPC-H-ish testdata
  * (TESTDATA.md). Role mapping onto the reference's supply-chain model
  * (FIXTURES.md §B): orders+lineitem = bronze.supply_orders fact,
  * part = bronze.products, supplier = bronze.suppliers,
  * customer+nation+region = bronze.retail_stores + region dims.
  *
  * Reads are plain parquet scans so Catalyst pushes filters/projections
  * into the scan (verified via .explain: PushedFilters/ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables never worth the spread exchange: region/nation are
    * fixed-cardinality dims (5 / 25 rows at every SF), and embeddings
    * is consumed almost exclusively as a broadcast build side (query
    * batches, SRP signatures, IVF centroids) — a repartition ahead of
    * a broadcast only inserts a shuffle stage before every broadcast
    * materialization (measured: q51 median 1.7 s → 6 s with the
    * spread, back under 3 s without). */
  private val noSpread = Set("region", "nation", "embeddings")

  /** Lazy parquet reader — metadata-only until an action runs. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
    if (noSpread(name)) df else spread(spark, df, s"$dir/$name", name)
  }

  /** Spread key per table: the natural primary-key prefix. Keyed (hash)
    * spread instead of round-robin for two reasons (optimization guide
    * §2.4/§2.5):
    *  - round-robin repartition first pays a LOCAL BINARY SORT of every
    *    full row (sortBeforeRepartition, on by default since SPARK-23207
    *    so retried tasks reproduce their row→partition assignment) —
    *    for `documents` that is a memcmp sort over the text payload on
    *    every scan. A deterministic hash key needs no such sort: the
    *    assignment is a pure function of the row's key values;
    *  - the spread exchange becomes REUSABLE: HashPartitioning(pk, n)
    *    satisfies any downstream ClusteredDistribution whose keys
    *    contain pk (joins on the key, groupBy(pk, ...), windows
    *    partitioned by pk), so e.g. lineitem⋈orders on the order key
    *    and every per-doc aggregation skip their own exchange when
    *    shuffle.partitions == the spread width (all sessions here pin
    *    both to the core count). Keys are unique-ish (≤7 rows per
    *    l_orderkey, ≤99 per events user_id — measured), so the hash
    *    spread is as even as round-robin for timing purposes. */
  private val spreadKeys: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey"), "documents" -> Seq("doc_id"),
    "events" -> Seq("user_id"))

  /** The driver-generated testdata ships each table as ONE parquet file
    * with ONE row group, so the scan is a single task no matter how
    * many cores the session has — and every broadcast-join / partial-
    * aggregation / per-row text chain that Catalyst collapses into the
    * scan stage would run single-threaded (measured: the q02 star agg
    * at sf0.1 spent 10 s in one task on a 32-core session). Production
    * data arrives as many multi-row-group files where the scan itself
    * is the parallelism source; this shim restores that property for
    * the single-file fixtures by fanning the scan out to the session's
    * parallelism. Every query is partitioning-independent by
    * construction (Parity rules: order-independent decimal reductions,
    * total output orders), so this changes execution width only.
    *
    * Known limit: the probe counts byte-range splits, which over-count
    * actual parallelism for single-row-group files larger than
    * maxPartitionBytes (all splits but one produce no rows). The
    * fixtures are far below that size; a deployment facing such files
    * should rewrite them with sane row groups rather than shim here.
    *
    * The probe (df.rdd forces physical planning) runs once per
    * (dir, name); the decision is cached — Tables.t is called for
    * every table reference of every query construction. */
  private val spreadDecision =
    collection.concurrent.TrieMap.empty[(String, Int), Boolean]

  private def spread(spark: SparkSession, df: DataFrame, key: String,
      name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val target = spark.sparkContext.defaultParallelism
    val doSpread = spreadDecision.getOrElseUpdate((key, target),
      target > 1 && df.rdd.getNumPartitions < math.min(target, 8))
    if (!doSpread) df
    else spreadKeys.get(name) match {
      case Some(ks) => df.repartition(target, ks.map(col): _*)
      case None => df.repartition(target)
    }
  }

  /** events.ts has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read as raw nanos and floor-divide to micros;
    * integer div, a double division would lose precision at 1.7e18)
    * and plain TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark
    * reads as TIMESTAMP_NTZ). Normalize both to TimestampType: every
    * session here pins spark.sql.session.timeZone=UTC, so the
    * NTZ→instant cast is value-identity and matches DuckDB's naive
    * TIMESTAMP oracle reading of the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long encoding
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType => // micros, not UTC-adjusted; sessions pin UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
      // a THIRD encoding drift (string/int32/...) must fail fast here —
      // a catch-all cast would silently null the column and take down
      // every events query downstream (the r6 failure mode this decoder
      // exists to defend against)
      case other => throw new IllegalStateException(
        s"events.ts arrived as unexpected physical type $other — " +
          "known encodings: TIMESTAMP(NANOS) (legacy nanos-as-long), " +
          "TIMESTAMP(MICROS) instant, TIMESTAMP_NTZ; extend Tables.events deliberately")
    }
  }

  /** Register all tables as temp views so `spark.sql(...)` works —
    * the reference's ad-hoc SQL runner surface (SURVEY §2.1 S13,
    * reference app.py:655-682). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
