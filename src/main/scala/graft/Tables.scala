package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read one parquet per
  * table. At production scale these would be partitioned/Z-ordered tables
  * (partition by tenant / date); the loader is the single seam where that
  * layout decision lives.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Shared-scan mode (opt-in): every load of the same (dir, table) returns
  // ONE cached DataFrame, so a family of queries over the same base
  // relation shares a single columnar scan + decode instead of re-reading
  // parquet per query. This is the bench seam for the "materialize the hot
  // relation once" experiment (BENCH_NOTES); in production the equivalent
  // is a cluster cache / Delta caching layer over the hot table.
  private val sharedScan = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val cachedLoads =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def enableSharedScan(): Unit = sharedScan.set(true)
  def disableSharedScan(): Unit = {
    sharedScan.set(false)
    cachedLoads.values.foreach(df => try df.unpersist() catch { case _: Throwable => })
    cachedLoads.clear()
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (sharedScan.get)
      cachedLoads.getOrElseUpdate((dir, name),
        spark.read.parquet(s"$dir/$name.parquet").cache())
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * long under `spark.sql.legacy.parquet.nanosAsLong` (set in Verify/Bench/
    * test sessions). Convert ns → µs timestamps here (integer div — a double
    * division would lose precision at 1e18 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
