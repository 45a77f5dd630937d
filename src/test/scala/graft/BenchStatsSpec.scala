package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function stats helpers used by the bench/scaling reporters. */
class BenchStatsSpec extends AnyFunSuite {
  import Bench.PairStat

  private def p(eff: Double, cpuLoUs: Double, cpuHiUs: Double) =
    PairStat(1e6, eff * 4e6, eff, cpuLoUs * 1000, cpuHiUs * 1000)

  test("quietStats keeps pairs within 2x of the series' own CPU floors, both directions") {
    val pairs = Seq(
      p(0.84, 6.4, 6.5), // quiet
      p(1.10, 7.0, 7.2), // quiet, >1.0 — kept (filter is symmetric)
      p(0.28, 8.6, 31.3), // wide leg loaded — dropped
      p(1.85, 18.5, 7.6), // narrow leg loaded — dropped
      p(0.80, 9.9, 10.6)) // quiet
    val (n, med) = Bench.quietStats(pairs)
    assert(n == 3)
    assert(med == 0.84) // median of (0.80, 0.84, 1.10)
  }

  test("quietStats on an empty series is (0, 0)") {
    assert(Bench.quietStats(Nil) == ((0, 0.0)))
  }

  test("summarizePairs best pair maximizes combined throughput") {
    val a = PairStat(1e6, 2e6, 0.5, 1, 1)
    val b = PairStat(2e6, 3e6, 0.375, 1, 1)
    val (_, best, _, _) = Bench.summarizePairs(Seq(a, b))
    assert(best == b)
  }
}
