package graft.streaming

/** Dev-only per-stage sample recorder for the streaming sinks'
  * `GRAFT_SINK_PROFILE=1` timers (D10/D16). Round 13's per-stage D16
  * attribution existed only as stderr prose — the numbers a SURVEY
  * table cites must trace to a committed JSON record, so the sinks
  * now RECORD each (stage, seconds) sample here when profiling is on
  * and `graft.StreamBench` folds the aggregates into its output JSON.
  *
  * Process-wide and append-only between resets; recording is gated on
  * the same env flag as the stderr lines, so a production stream
  * (profiling off) never touches it and the buffer cannot grow
  * unboundedly. One lock — samples are a handful per micro-batch.
  */
object SinkProfile {
  private val lock = new Object
  private var samples = Vector.empty[(String, Double)]

  /** True when the sinks' profiling env flag is set. */
  def enabled: Boolean = sys.env.get("GRAFT_SINK_PROFILE").contains("1")

  def record(stage: String, sec: Double): Unit =
    lock.synchronized { samples :+= (stage -> sec) }

  def reset(): Unit = lock.synchronized { samples = Vector.empty }

  /** All samples since the last reset, in record order (stage names
    * repeat — one sample per micro-batch per stage). */
  def snapshot(): Seq[(String, Double)] = lock.synchronized { samples }
}
