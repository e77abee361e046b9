package graft

import graft.pipeline.{Batcher, RetryCommit}
import org.scalatest.funsuite.AnyFunSuite

/** Batch threshold boundaries mirroring `write.go:238-241`, incl. the
  * /1000 integer-division quirk, and the retry loop semantics. */
class BatcherSpec extends AnyFunSuite {

  test("row-count threshold: flush at exactly chunkSize rows") {
    val b = new Batcher[String](1000, 20, _ => 0L)
    for (i <- 1 to 999) assert(b.next(s"r$i").isEmpty)
    assert(b.next("r1000").map(_.size).contains(1000))
    // fresh accumulation after flush
    assert(b.next("x").isEmpty)
    assert(b.flushRemaining() == Seq("x"))
  }

  test("byte threshold with integer-division: 19,999 stays, 20,000 flushes") {
    val b1 = new Batcher[Long](1000, 20, identity)
    assert(b1.next(19999L).isEmpty)          // 19999/1000 = 19 < 20
    val b2 = new Batcher[Long](1000, 20, identity)
    assert(b2.next(20000L).map(_.size).contains(1)) // 20000/1000 = 20 >= 20
    val b3 = new Batcher[Long](1000, 20, identity)
    assert(b3.next(19000L).isEmpty)
    assert(b3.next(999L).isEmpty)            // 19999 total
    assert(b3.next(1L).isDefined)            // 20000 total
  }

  test("tail batch is flushable (reference bug #1 fixed by design)") {
    val b = new Batcher[Int](10, 20, _ => 1L)
    (1 to 7).foreach(i => assert(b.next(i).isEmpty))
    assert(b.flushRemaining() == (1 to 7))
    assert(b.flushRemaining().isEmpty)
  }

  test("retry: succeeds after transient failures within budget") {
    var calls = 0
    val ok = RetryCommit(Seq(1), maxAttempts = 5, backoffMs = 0, (_: Seq[Int]) => {
      calls += 1; if (calls < 3) sys.error("transient")
    })
    assert(ok && calls == 3)
  }

  test("retry: gives up after maxAttempts") {
    var calls = 0
    val ok = RetryCommit(Seq(1), maxAttempts = 4, backoffMs = 0,
      (_: Seq[Int]) => { calls += 1; sys.error("down") })
    assert(!ok && calls == 4)
  }

  test("retry: maxAttempts=0 means infinite (bounded here by success)") {
    var calls = 0
    val ok = RetryCommit(Seq(1), maxAttempts = 0, backoffMs = 0, (_: Seq[Int]) => {
      calls += 1; if (calls < 50) sys.error("flaky")
    })
    assert(ok && calls == 50)
  }
}
