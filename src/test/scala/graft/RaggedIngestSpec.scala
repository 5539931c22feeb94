package graft

import org.apache.spark.sql.types._

/** S1 loader semantics: sheet rows shorter than the header are
  * right-padded with empties/nulls (reference
  * bronze/data_loader.py:74-77), and dirty values survive into
  * permissive string columns for silver-stage typing. */
class RaggedIngestSpec extends SparkSpec {
  import spark.implicits._

  test("ragged CSV rows pad right with nulls under a permissive schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ragged").toString
    val csv =
      """id,name,qty,date
        |1,Acme,10,2024-03-15
        |2,Beta
        |3,"Gamma, Inc",N/A
        |4
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/raw.csv"), csv)
    val schema = StructType(Seq("id", "name", "qty", "date")
      .map(StructField(_, StringType, nullable = true)))
    val df = spark.read.option("header", "true").schema(schema).csv(s"$dir/raw.csv")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows(1).getString(1) == "Beta" && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    assert(rows(2).getString(1) == "Gamma, Inc" && rows(2).getString(2) == "N/A")
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(3))
    // dirty values flow into the cleaning library as usual
    import graft.functions.Cleaning._
    import org.apache.spark.sql.functions._
    val cleaned = df.select(cleanInteger(nullifySentinels(col("qty"))).as("q"))
      .orderBy(col("q").asc_nulls_last).collect()
    assert(cleaned.head.getInt(0) == 10 && cleaned.count(_.isNullAt(0)) == 3)
  }
}
