package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.streaming.Sessionize.Event

/** Bounded-memory (ts, event_type) sort for ONE key's event slice.
  *
  * [[Sessionize.sessions]] must feed its state transition time-ordered
  * events, but `flatMapGroupsWithState` hands each key an UNORDERED
  * iterator — and sorting by `it.toSeq` materializes a hot key's whole
  * micro-batch slice in task memory (the r2/r3 verdict carry-item). This
  * sorter is the external-merge answer: buffer at most `maxInMem` events,
  * spill each full buffer to a temp file as a sorted run (compact binary
  * encoding, no JVM object retention), then stream a k-way merge of the
  * in-memory tail plus all runs. Task memory is O(maxInMem + #runs) and a
  * hot key costs sequential disk I/O instead of an OOM — the same
  * bargain WindowExec's spilling sort makes for the batch face
  * ([[Sessionize.sessionsBatch]]).
  *
  * Run files live in `java.io.tmpdir` (Spark points this at executor
  * scratch space on a cluster) and are deleted as soon as each run is
  * exhausted. The failure backstop is a task-completion listener (not
  * `deleteOnExit`, whose JVM-global registry grows unboundedly in a
  * long-lived streaming executor): if the task dies mid-merge, Spark
  * fires the listener and the remaining runs are removed immediately.
  */
final class ExternalEventSorter(maxInMem: Int) {
  require(maxInMem > 0, "maxInMem must be positive")

  private val runs = scala.collection.mutable.ArrayBuffer.empty[Path]

  /** Number of runs spilled to disk (0 = the slice fit in memory). */
  def nSpilledRuns: Int = runs.size

  private val ord: Ordering[Event] =
    Ordering.by((e: Event) => (e.ts.getTime, e.event_type))

  private def spill(buf: scala.collection.mutable.ArrayBuffer[Event]): Unit = {
    val sorted = buf.sorted(ord)
    val path = Files.createTempFile("graft-sess-run", ".bin")
    // failure cleanup: deleteIfExists is idempotent with the happy-path
    // delete at run exhaustion, and the listener itself is O(1) per task
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => Files.deleteIfExists(path)))
    val out = new DataOutputStream(new BufferedOutputStream(
      Files.newOutputStream(path), 1 << 16))
    try sorted.foreach { e =>
      out.writeLong(e.user_id); out.writeLong(e.ts.getTime)
      out.writeUTF(e.event_type); out.writeDouble(e.value)
    } finally out.close()
    runs += path
  }

  private def readRun(path: Path): Iterator[Event] = new Iterator[Event] {
    private val in = new DataInputStream(new BufferedInputStream(
      Files.newInputStream(path), 1 << 16))
    // If the merge iterator is abandoned mid-stream (exception upstream,
    // task kill), the spill-time listener deletes the file but the open
    // stream would leak its fd until GC — a real cost in a long-lived
    // streaming executor. Register close (idempotent) on task completion.
    private var closed = false
    private def closeNow(): Unit = if (!closed) { closed = true; in.close() }
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => closeNow()))
    private var nextEvent: Event = advance()
    private def advance(): Event =
      try Event(in.readLong(), new Timestamp(in.readLong()), in.readUTF(), in.readDouble())
      catch { case _: EOFException => closeNow(); Files.deleteIfExists(path); null }
    def hasNext: Boolean = nextEvent != null
    def next(): Event = { val e = nextEvent; nextEvent = advance(); e }
  }

  /** Consume `events`, return them ordered by (ts, event_type). The
    * result is a streaming iterator: merged lazily, runs deleted as they
    * drain. Single-shot — call once per sorter instance. */
  def sorted(events: Iterator[Event]): Iterator[Event] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Event]
    while (events.hasNext) {
      buf += events.next()
      if (buf.size >= maxInMem) { spill(buf); buf.clear() }
    }
    val tail = buf.sorted(ord).iterator
    if (runs.isEmpty) tail
    else {
      // k-way merge: min-heap of (head, source); ties resolved by the
      // same (ts, event_type) key, so the merge IS the sort order
      val heads = (tail +: runs.map(readRun).toSeq).filter(_.hasNext)
      val pq = new scala.collection.mutable.PriorityQueue[(Event, Iterator[Event])]()(
        Ordering.by[(Event, Iterator[Event]), Event](_._1)(ord.reverse))
      heads.foreach(it => pq.enqueue((it.next(), it)))
      new Iterator[Event] {
        def hasNext: Boolean = pq.nonEmpty
        def next(): Event = {
          val (e, it) = pq.dequeue()
          if (it.hasNext) pq.enqueue((it.next(), it))
          e
        }
      }
    }
  }
}
