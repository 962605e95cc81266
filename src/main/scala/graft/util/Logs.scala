package graft.util

/** Logging hygiene for the engine's sessions. */
object Logs {

  /** Silence WindowExec's "No Partition Defined" warning. Every engine
    * site that runs an unpartitioned window is k-bounded by construction
    * (IVF seed pick after a limit, RRF over top-k candidate lists,
    * per-bucket profiling) and the spam would mask a REAL corpus-sized
    * unpartitioned window the day one appears. The invariant the warning
    * was standing in for is enforced dynamically instead: EntrySpec's
    * execution-listener guard asserts every unpartitioned WindowExec in
    * the full suite processes a bounded row count. */
  def quietKBoundedWindowWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // never let log config kill a job
}
