package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Batch-scoped pin tracking for the streaming sinks (round 17).
  *
  * The ingest sinks pin batch-scoped frames with eager
  * localCheckpoints; those MEMORY_AND_DISK blocks must be freed at
  * end of batch or they accumulate on disk (73 GB / ENOSPC, SURVEY
  * §6 r14). The r14-r16 reap diffed `getPersistentRDDs` around the
  * batch body — UNSOUND under concurrent streaming queries: sink A's
  * diff sees sink B's in-flight pins and reaps them, and a reaped
  * localCheckpoint has truncated lineage, so B hard-fails on a
  * missing checkpoint block (measured: the r17 two-sink probe died
  * on its 4th arrival pair with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
  * The r16 runtime guard — skip the reap when
  * `spark.streams.active > 1` — never engaged in real wiring:
  * foreachBatch hands the sink a per-query CLONED session whose
  * StreamingQueryManager does not see sibling queries, so the count
  * read 1 with two queries running.
  *
  * Fix: stop inferring ownership from a global diff; RECORD it.
  * Every eager localCheckpoint on a sink-reachable path goes through
  * `checkpoint`, which registers the pinned RDD with the current
  * THREAD's collector — a foreachBatch body is single-threaded
  * driver code, so thread identity is batch identity. The sink's
  * end-of-batch reap unpersists exactly its own pins: correct under
  * any number of concurrent queries, pre-existing pins (frozen model
  * tables) untouched by construction, and no degraded skip mode at
  * all. A sink-path checkpoint NOT routed through here falls back to
  * the gc60 regime (its dead handle is reaped on the next periodic
  * driver GC) — bounded growth, never a reaped sibling.
  */
object Pins {
  private val collector = new ThreadLocal[java.util.ArrayList[RDD[_]]]

  /** Eager localCheckpoint; the pinned RDD is registered with this
    * thread's active collector (no-op without one, e.g. when the
    * operator runs as a plain batch query). */
  def checkpoint(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    val c = collector.get()
    if (c != null) out.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => c.add(lr.rdd)
      case _ => () // unexpected plan shape: leave the pin to gc60
    }
    out
  }

  /** Opens a collector on this thread; the caller MUST `stop()` in a
    * finally. Does not nest — one collector per batch body. */
  private[graft] def start(): java.util.ArrayList[RDD[_]] = {
    require(collector.get() == null, "Pins collector does not nest")
    val c = new java.util.ArrayList[RDD[_]]
    collector.set(c)
    c
  }

  private[graft] def stop(): Unit = collector.remove()
}
