package graft

/** The timing/rounding helpers every benchmark main shares. ONE
  * definition for the same reason [[StreamBench.median]] is shared: four
  * private copies of the artifact-feeding rounding (and two of the
  * wall-clock helper) had accreted across the bench mains, and a drifted
  * copy would change published JSON depending on which main produced it.
  */
private[graft] object BenchUtil {
  /** Round to 3 decimals — the artifact-wide seconds precision. */
  def r3(x: Double): Double = math.rint(x * 1000) / 1000

  /** (result, wall seconds) of evaluating `f` once. */
  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
