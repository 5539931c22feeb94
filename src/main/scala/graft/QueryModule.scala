package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One group of SURVEY §2 operators: named DataFrame queries plus their
  * DuckDB oracle SQL (driver correctness gate, see Verify.scala).
  * Every query reads `/ <sfDir> / <table>.parquet` via Tables.t and must
  * produce a deterministic, totally-ordered result whose column names
  * match the oracle exactly. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
