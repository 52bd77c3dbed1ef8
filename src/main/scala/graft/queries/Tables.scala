package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — column pruning and predicate pushdown
  * reach the scan through Catalyst, so callers just select/filter and the
  * scan narrows itself (`PushedFilters`/`ReadSchema` in explain).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** documents/embeddings feed compute-amplifying per-row kernels
    * (tokenize/shingle/hash/dot), and the testdata ships them as
    * single-row-group files — one scan task. `Layout.fanOut` restores
    * core-width parallelism before the kernels; it is a no-op on a
    * properly split production scan, and filters still push through the
    * round-robin exchange to the scan.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    graft.ops.Layout.fanOut(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    graft.ops.Layout.fanOut(load(s, d, "embeddings"))
}
