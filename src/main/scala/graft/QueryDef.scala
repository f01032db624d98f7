package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) a DuckDB oracle twin.
  * Column names/aliases MUST match between `fn`'s output and `oracle`'s
  * projection — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def run(s: SparkSession, dir: String): DataFrame = fn(s, dir)
}
