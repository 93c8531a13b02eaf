package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The registry's boundedness contract: a long-lived stream (millions of
  * epochs) must not grow driver heap — records are windowed, totals are
  * exact counters. */
class GraftSinkRegistrySpec extends AnyFunSuite {

  import GraftSinkRegistry._

  test("epoch records are windowed at maxRetained; totals stay exact") {
    val name = "bounded_epochs_test"
    clear(name)
    val n = maxRetained + 500
    var expect = 0L
    for (e <- 0 until n) {
      recordEpoch(name, e.toLong, CommitStats(rows = e + 1, bytes = 10, tasks = 1))
      expect += e + 1
    }
    assert(committedEpochs(name).size === maxRetained,
      "record window must not grow past maxRetained")
    // the oldest epochs were evicted, the newest retained
    assert(!committedEpochs(name).contains(0L))
    assert(committedEpochs(name).contains((n - 1).toLong))
    assert(streamedRows(name) === expect, "totals must survive eviction")
    // in-window replay is idempotent: same epoch, same stats → no change
    recordEpoch(name, (n - 1).toLong, CommitStats(rows = n.toLong, bytes = 10, tasks = 1))
    assert(streamedRows(name) === expect, "replay must not double-count")
    clear(name)
  }

  test("batch commits window the records but count exactly") {
    val name = "bounded_commits_test"
    clear(name)
    val n = maxRetained + 100
    for (i <- 0 until n)
      recordCommit(name, CommitStats(rows = 2, bytes = 1, tasks = 1))
    assert(commitHistory(name).length === maxRetained)
    assert(commitCount(name) === n.toLong)
    assert(batchRows(name) === 2L * n)
    assert(committed(name).exists(_.rows === 2L))
    clear(name)
  }
}
