package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of [[StreamBench]]'s derived-metric arithmetic — the
  * benchmark methodology is itself a correctness surface (a misaligned
  * compaction mask silently includes compaction spikes in a "steady"
  * trend, and the published artifact lies).
  */
class StreamBenchSpec extends AnyFunSuite {

  test("steadyTrend masks by ORIGINAL batch index on short series " +
      "(no warmup drop happened)") {
    // 4 batches, compactEvery = 5: the first compaction fold would land
    // at original index 4, so NO batch here is a compaction batch and
    // nothing may be masked — the genuine upward trend must surface.
    // The pre-fix arithmetic added WarmupBatches to the index even when
    // steady() had not dropped them (series ≤ 4 long), masking innocent
    // batch 2 and flattening the trend to a neutral 1.0.
    val xs = Seq(1.0, 1.0, 100.0, 1.0)
    assert(StreamBench.steadyTrend(xs, compactEvery = 5) > 1.0)
  }

  test("steadyTrend on a long flat series with every-4th compaction " +
      "spikes reports ~1 (spikes masked, warmup dropped)") {
    // 12 batches: warmup (indices 0,1) dropped, compactEvery=4 masks
    // original indices 3,7,11 — all remaining steady batches are 1.0
    val xs = Seq(9.0, 9.0, 1.0, 50.0, 1.0, 1.0, 1.0, 50.0, 1.0, 1.0,
      1.0, 50.0)
    assert(StreamBench.steadyTrend(xs, compactEvery = 4) === 1.0)
  }
}
