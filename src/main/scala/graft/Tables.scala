package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * Each loader is a plain `spark.read.parquet` so Catalyst sees a
  * relation it can push filters/column pruning into — never cache or
  * materialize here; at 100 TB the scan must stay prunable.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    * default; read nanos as long and convert in Changelog (micros).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Spread a FEW-FILE scan across the cluster before per-row
    * compute-heavy work (gram hashing, media decode, shingling).
    * Parquet parallelism is bounded by row groups, so a small table
    * written as one file pins the whole downstream pipeline to one
    * task. The guard keeps this adaptive: with many input files
    * (the 100 TB layout) the scan is already parallel and no
    * exchange is added — this only pays one small shuffle when the
    * input couldn't saturate the cluster anyway.
    */
  def parallelized(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < cores) df.repartition(cores) else df
  }
}
