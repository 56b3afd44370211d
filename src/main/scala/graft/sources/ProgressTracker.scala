package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Sync progress counters (SURVEY A5; reference `airbyte/progress.py:
 * 192-312` ProgressTracker + `:893`/`:960` records/s rates).
 *
 * Spark-first: rather than incrementing Python-side counters per
 * record (the reference's hot loop), tallies come FREE from Spark's
 * instrumentation — a `QueryExecutionListener` reads each finished
 * write's `numOutputRows` metric, so tracking adds zero per-record
 * cost at any scale. Rates use the listener's wall-clock window.
 *
 * Counters are concurrent: at cluster scale many streams finalize in
 * parallel on the driver's listener bus.
 */
final class ProgressTracker private (spark: SparkSession) {

  private val recordsWritten = new ConcurrentHashMap[String, AtomicLong]()
  private val totalRecords = new AtomicLong(0)
  private val startedAtNanos = new AtomicReference[java.lang.Long](null)
  private val lastEventNanos = new AtomicLong(0)

  private val listener: QueryExecutionListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      // count only terminal writes (save/saveAsTable/insertInto/noop)
      if (!ProgressTracker.WriteCommands.contains(funcName)) return
      val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
        .getOrElse(qe.observedMetrics.values.headOption.map(_.getLong(0)).getOrElse(0L))
      if (rows <= 0) return
      startedAtNanos.compareAndSet(null, System.nanoTime() - durationNs)
      lastEventNanos.set(System.nanoTime())
      val table = qe.analyzed.collectLeaves().headOption
        .map(_.nodeName).getOrElse(funcName)
      recordsWritten.computeIfAbsent(table, _ => new AtomicLong(0)).addAndGet(rows)
      totalRecords.addAndGet(rows)
    }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  /** Total records landed across tracked writes. */
  def totalRecordsWritten: Long = totalRecords.get()

  /** Delivered records/s over the tracked window (reference logs this
    * per sync: progress.py:960). 0 until the first write completes. */
  def recordsPerSecond: Double = {
    val start = startedAtNanos.get()
    if (start == null || totalRecords.get() == 0) return 0.0
    val elapsed = (lastEventNanos.get() - start.longValue()) / 1e9
    if (elapsed <= 0) 0.0 else totalRecords.get() / elapsed
  }

  def stop(): Unit = spark.listenerManager.unregister(listener)

  private def start(): ProgressTracker = {
    spark.listenerManager.register(listener)
    this
  }
}

object ProgressTracker {
  private val WriteCommands =
    Set("save", "saveAsTable", "insertInto", "command", "foreachBatch")

  /** Register a tracker on the session's listener bus. Callers own the
    * lifecycle (`stop()` to unregister). */
  def attach(spark: SparkSession): ProgressTracker =
    new ProgressTracker(spark).start()
}
