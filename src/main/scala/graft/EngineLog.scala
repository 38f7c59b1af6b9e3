package graft

/** Targeted log hygiene for the driver-contract mains (round 18). */
object EngineLog {

  /** Silence WindowExec's per-execution "No Partition Defined"
    * WARN — in this engine the ONLY unpartitioned window is c40's Σw
    * over the strata AGGREGATE (dozens of rows by construction;
    * PlanSpec pins structurally that the window consumes
    * post-aggregation rows, and Stratified.mixturePlan documents the
    * measured rejection of both warning-free rewrites). The warning
    * fired six times per Verify/Bench run for a proven-bounded
    * window, drowning real signals. Applied ONLY in the
    * driver-contract mains — tests and dev tools keep the default
    * level, so a future genuinely-unbounded window still warns
    * everywhere development happens. */
  def silenceProvenBoundedWindowWarn(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // log backend absent: keep going
}
