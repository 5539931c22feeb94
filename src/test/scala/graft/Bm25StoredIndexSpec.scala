package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The retrieval loop's production shape, proven end to end: the full
  * postings index WRITES to parquet once (ingest time), the BM25
  * scorer probes the STORED table (no tokenize pass anywhere near the
  * query), and the ranking is IDENTICAL to q134's one-pass form —
  * because everything downstream of the index is one code path
  * (TextOps.bm25OverIndex). This is the "at 100 TB the stored q125
  * index replaces the tokenize pass" claim as an executed test, not a
  * scaladoc sentence. */
class Bm25StoredIndexSpec extends SparkSpec {

  test("BM25 over the stored postings index == the one-pass q134 ranking") {
    val tmp = java.nio.file.Files.createTempDirectory("bm25idx").toString
    val (tf, stats) = TextOps.buildPostingsIndex(spark, sf0001)
    // ingest: persist the index the way a deployment stores it —
    // postings bucketable by term, stats a 1-row sidecar
    tf.write.mode("overwrite").parquet(s"$tmp/postings")
    stats.write.mode("overwrite").parquet(s"$tmp/stats")

    val storedTf = spark.read.parquet(s"$tmp/postings")
    val storedStats = spark.read.parquet(s"$tmp/stats")
    val viaStored = TextOps.bm25OverIndex(storedTf, storedStats, TextOps.bm25Queries)
      .collect().map(_.toSeq).toSeq
    val viaOnePass = TextOps.bm25Search(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(viaStored == viaOnePass)
    assert(viaStored.nonEmpty)

    // the stored-path plan never touches documents.parquet: its only
    // file scans are the index tables
    val plan = TextOps.bm25OverIndex(storedTf, storedStats, TextOps.bm25Queries)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"), "query path re-read the corpus")
    assert(plan.contains("postings"))
  }
}
