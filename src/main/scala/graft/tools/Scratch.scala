package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling scratchpad (not product surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"SCRATCH $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.types._
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dec = DecimalType(38, 8)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    timed("warm")(l.agg(sum("l_quantity")).collect())
    timed("dec_sums_16") {
      val aggs = cols.flatMap { c => val x = col(c).cast(DoubleType)
        Seq(sum(x.cast(dec)).as(s"a$c"), sum((x*x).cast(dec)).as(s"b$c"),
            sum((x*x*x).cast(dec)).as(s"c$c"), sum((x*x*x*x).cast(dec)).as(s"d$c")) }
      l.agg(aggs.head, aggs.tail: _*).collect()
    }
    timed("dec_sums_4x4") {
      cols.foreach { c => val x = col(c).cast(DoubleType)
        l.agg(sum(x.cast(dec)).as("a"), sum((x*x).cast(dec)).as("b"),
              sum((x*x*x).cast(dec)).as("c"), sum((x*x*x*x).cast(dec)).as("d")).collect() }
    }
    timed("long_sums_16") {
      val aggs = cols.flatMap { c =>
        val v = round(col(c).cast(DoubleType) * 100).cast(LongType)
        Seq(sum(v).as(s"a$c"), sum(v*v).as(s"b$c"),
            sum(v*v*v).as(s"c$c"), sum(v*v*v*v).as(s"d$c")) }
      l.agg(aggs.head, aggs.tail: _*).collect()
    }
    timed("dec_sums_16_again") {
      val aggs = cols.flatMap { c => val x = col(c).cast(DoubleType)
        Seq(sum(x.cast(dec)).as(s"a$c"), sum((x*x).cast(dec)).as(s"b$c"),
            sum((x*x*x).cast(dec)).as(s"c$c"), sum((x*x*x*x).cast(dec)).as(s"d$c")) }
      l.agg(aggs.head, aggs.tail: _*).collect()
    }
    spark.stop()
  }
}
