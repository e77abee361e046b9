package graft.pipeline

import graft.CopyConfig
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Batch-mode face of the reference's ticker reporter
  * (`/root/reference/write.go:162-179`: done / fail / cur-per-s /
  * avg-per-s every `--report-frequency`, floor 100 ms at
  * `write.go:126-128`). Counts output rows from task metrics; a daemon
  * ticker thread logs at the configured cadence. Attach around an action:
  *
  * {{{
  * val rep = new BatchProgressListener(cfg); rep.start(spark)
  * try df.write.parquet(out) finally rep.stop()
  * }}}
  */
final class BatchProgressListener(cfg: CopyConfig,
    log: String => Unit = s => Console.err.println(s)) extends SparkListener {

  private val done = new AtomicLong(0)
  private val failed = new AtomicLong(0)
  private val t0 = System.nanoTime()
  @volatile private var lastCount = 0L
  @volatile private var running = false
  private var ticker: Thread = _
  private var sc: org.apache.spark.SparkContext = _

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    if (e.taskMetrics != null)
      done.addAndGet(e.taskMetrics.outputMetrics.recordsWritten)
    if (e.reason != org.apache.spark.Success) failed.incrementAndGet()
  }

  def start(spark: org.apache.spark.sql.SparkSession): Unit = {
    sc = spark.sparkContext
    sc.addSparkListener(this)
    running = true
    val period = cfg.reportFrequencyClamped
    ticker = new Thread(() => {
      while (running) {
        Thread.sleep(period)
        val d = done.get()
        val cur = (d - lastCount) * 1000.0 / period
        lastCount = d
        val avg = d * 1e9 / (System.nanoTime() - t0)
        log(f"[graft] done=$d%d fail=${failed.get()}%d cur=$cur%.0f/s avg=$avg%.0f/s")
      }
    }, "graft-progress")
    ticker.setDaemon(true)
    ticker.start()
  }

  def stop(): Unit = {
    running = false
    if (ticker != null) ticker.join(2 * cfg.reportFrequencyClamped)
    if (sc != null) sc.removeSparkListener(this)
    val d = done.get()
    log(f"[graft] final done=$d%d fail=${failed.get()}%d avg=${d * 1e9 / (System.nanoTime() - t0)}%.0f/s")
  }

  def rowsDone: Long = done.get()
  def tasksFailed: Long = failed.get()
}
