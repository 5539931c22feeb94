package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Parquet-backed medallion layer store — the reference's PostgreSQL
  * schema namespaces (bronze./silver./gold./audit.) as managed table
  * paths with catalog registration, reproducing its storage semantics
  * (SURVEY §2.1):
  *  - S4/S5  CTAS + TRUNCATE-reload  -> SaveMode.Overwrite
  *  - S2     ON CONFLICT upsert      -> key-level latest-wins merge
  *  - S7     DDL clone               -> StructType.toDDL
  *  - S8     row-count verification
  *  - S10    table_metadata catalog (TEXT[] lineage column)
  *  - S12    CSV export
  *  - S13    ad-hoc SQL over registered views
  *  - S14    layer teardown + emptiness verification
  *
  * Scale notes: overwrite writes are partitioned by the input's task
  * parallelism (no single-writer bottleneck); upsert is one anti-join
  * shuffle on the key — the row-at-a-time loop the reference runs
  * (bronze/data_loader.py:124-162) becomes a set operation.
  */
class LayerStore(spark: SparkSession, root: String) {

  val layers = Seq("bronze", "silver", "gold", "audit")

  private def path(layer: String, name: String) = s"$root/$layer/$name"
  private def viewName(layer: String, name: String) = s"${layer}_$name"

  /** S4/S5 — full-refresh write (CTAS / TRUNCATE-reload semantics) +
    * catalog registration so spark.sql sees `<layer>_<name>`. */
  def write(layer: String, name: String, df: DataFrame): Long = {
    require(layers.contains(layer), s"unknown layer $layer")
    df.write.mode(SaveMode.Overwrite).parquet(path(layer, name))
    val back = table(layer, name)
    back.createOrReplaceTempView(viewName(layer, name))
    back.count()
  }

  /** Append (audit tables — the reference batches these per run,
    * silver/silver_builder.py:456-516). */
  def append(layer: String, name: String, df: DataFrame): Unit = {
    df.write.mode(SaveMode.Append).parquet(path(layer, name))
    table(layer, name).createOrReplaceTempView(viewName(layer, name))
  }

  /** S2 — key-level latest-wins upsert: incoming rows win over stored
    * rows on `keys`; within the incoming batch the highest `orderCol`
    * wins. Read-modify-overwrite (idempotent, like the reference's
    * re-runnable loads). Returns (inserted, updated) counts like the
    * reference's before/after accounting. */
  def upsert(layer: String, name: String, incoming: DataFrame,
    keys: Seq[String], orderCol: String): (Long, Long) = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    val latest = incoming.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val existing =
      try Some(table(layer, name)) catch { case _: Throwable => None }
    existing match {
      case None =>
        val n = write(layer, name, latest)
        (n, 0L)
      case Some(old) =>
        val oldCount = old.count()
        val kept = old.join(latest.select(keys.map(col): _*).distinct(),
          keys, "left_anti")
        val keptCount = kept.count()
        // writing over the path we read from needs a materialized copy
        val staged = kept.unionByName(latest).persist()
        staged.count()
        val total = write(layer, name, staged)
        staged.unpersist()
        (total - oldCount, oldCount - keptCount) // (inserted, updated)
    }
  }

  /** S9 — run-scoped overwrite: DELETE WHERE run_id = X then append
    * (forecasting.py:86-105) as read-filter-union-overwrite. */
  def overwriteRun(layer: String, name: String, df: DataFrame,
    runCol: String, runId: String): Long = {
    val existing =
      try Some(table(layer, name)) catch { case _: Throwable => None }
    val merged = existing match {
      case None => df
      case Some(old) =>
        val kept = old.filter(col(runCol) =!= runId).persist()
        kept.count()
        kept.unionByName(df)
    }
    val staged = merged.persist()
    staged.count()
    val n = write(layer, name, staged)
    staged.unpersist()
    n
  }

  def table(layer: String, name: String): DataFrame =
    spark.read.parquet(path(layer, name))

  /** S7 — DDL clone from the stored schema. */
  def ddl(layer: String, name: String): String =
    s"CREATE TABLE ${layer}_$name (${table(layer, name).schema.toDDL})"

  /** S8 — source/destination row-count equality, must be > 0. */
  def verifyCounts(src: DataFrame, dstLayer: String, dstName: String): Boolean = {
    val a = src.count(); val b = table(dstLayer, dstName).count()
    a == b && a > 0
  }

  /** S10 — gold.table_metadata with TEXT[] lineage. */
  def writeMetadata(entries: Seq[(String, String, Seq[String], Long)]): Unit = {
    import spark.implicits._
    val df = entries.toDF("table_name", "description", "source_tables", "row_count")
      .withColumn("refreshed_at", current_timestamp())
    write("gold", "table_metadata", df)
  }

  /** Bucketed managed table: pre-shuffles data into `buckets` files
    * per bucket column so equi-joins/aggregations on those keys read
    * co-located and skip the shuffle entirely (the parquet analogue of
    * the reference's FK b-tree indexes, SURVEY §4). Lives in the
    * session catalog (saveAsTable is required for bucket metadata). */
  def writeBucketed(layer: String, name: String, df: DataFrame,
    buckets: Int, cols: Seq[String]): Unit = {
    val view = viewName(layer, name)
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist — drop both or saveAsTable
    // refuses with LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS $view")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$view")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .saveAsTable(view)
  }

  def bucketedTable(layer: String, name: String): DataFrame =
    spark.table(viewName(layer, name))

  /** Partitioned layout: one directory per partition value so
    * predicates on the partition column prune entire directories at
    * planning time (the reference's date-index analogue; SURVEY §4 —
    * e.g. gold dashboard partitioned by order_year_month). */
  def writePartitioned(layer: String, name: String, df: DataFrame,
    partitionCols: Seq[String]): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(s"$root/$layer/$name")
    table(layer, name).createOrReplaceTempView(viewName(layer, name))
  }

  /** S12 — CSV export with header. */
  def exportCsv(df: DataFrame, out: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(out)

  /** S13 — ad-hoc SQL entry point over everything registered. */
  def sql(text: String): DataFrame = spark.sql(text)

  /** S14 — layer teardown in reverse refinement order + emptiness
    * verification (delete_all_data.py semantics). */
  def teardown(): Boolean = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    layers.reverse.foreach(l => fs.delete(new Path(s"$root/$l"), true))
    layers.forall(l => !fs.exists(new Path(s"$root/$l")))
  }
}
