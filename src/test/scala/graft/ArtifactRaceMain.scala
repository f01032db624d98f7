package graft

import graft.operators.IngestArtifacts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-JVM half of ArtifactRaceSpec: a separate process that races
  * `IngestArtifacts.readOrCreate` on the same (corpus, table) as the
  * test JVM. args = (corpusDir, computeDelayMs); the artifact root
  * comes from SPARK_GRAFT_ARTIFACTS like production. Prints one line
  * `[race] rows=N sum=S` the spec asserts on, exits non-zero on any
  * failure (a partial read would throw inside readOrCreate). */
object ArtifactRaceMain {
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val delayMs = args(1).toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-race")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // handshake: the parent delays its own readOrCreate until the child
    // is past Spark startup, so the two computes genuinely overlap
    println("[race] ready")
    Console.flush()
    val df = IngestArtifacts.readOrCreate(spark, corpus, "race.parquet") {
      // slow producer: wide window for the two JVMs to overlap
      Thread.sleep(delayMs)
      spark.read.parquet(s"$corpus/documents.parquet")
        .select(col("id"), (col("id") * 7).as("v")).coalesce(1)
    }
    val row = df.agg(count("*").as("n"), sum("v").as("s")).collect()(0)
    println(s"[race] rows=${row.getLong(0)} sum=${row.getLong(1)}")
    spark.stop()
  }
}
