package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of any declared query, plus — when
  * executed — each execution segment it triggers (localCheckpoint segments
  * show up as their own executions; the final DataFrame's explain hides
  * them behind an RDD scan) with PlanAudit's structural counts:
  * sbt "runMain graft.ExplainTool q15_knn_cosine [sfDir]". */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()

    val total = new java.util.concurrent.atomic.AtomicReference(PlanAudit.Zero)
    var segment = 0
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = {
        segment += 1
        val c = PlanAudit.countPlan(qe.executedPlan)
        total.updateAndGet(_ + c)
        println(s"\n===== execution $segment ($fn): $c =====")
        println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val df = SparkEntry.queries(name)(spark, dir)
    val n = df.count()
    org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark)
    spark.listenerManager.unregister(listener)
    println(s"\n===== $name: rows=$n total=${total.get()} =====")
    spark.stop()
  }
}
