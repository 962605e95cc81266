package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main mirroring the driver's smoke check: run
  * `SparkEntry.entry` and print row count + a few rows + the physical plan.
  * Usage: sbt "runMain graft.EntrySmoke". */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry-smoke] rows=${rows.length}")
    rows.take(3).foreach(r => println(s"[entry-smoke] $r"))
    df.explain("formatted")
    spark.stop()
  }
}
