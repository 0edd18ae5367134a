package graft.ts

/** Banded (Sakoe–Chiba) dynamic-time-warping distance over integer-lattice
  * series — the alignment metric for series that drift in phase, where
  * pointwise distances mis-score (north-star ts extension; no reference
  * counterpart).
  *
  * Scale posture: DTW is inherently a per-pair sequential DP, so the
  * distributed shape is "one bounded pair per task" — series are reduced
  * to bounded per-key arrays first (here: first 64 daily closes), pairs
  * fan out as rows, and each task runs the O(n·band) fold below. The DP
  * never sees corpus-sized data; the corpus-sized work (bar resampling)
  * stays declarative upstream.
  *
  * All arithmetic is exact Long (costs are cents), so the result is
  * bitwise-portable; the DuckDB oracle unrolls the identical row
  * recurrence as generated chained CTEs.
  */
object Dtw {

  private val Inf = 1000000000000000L // min-plus infinity, far above any path

  /** D(n,m) under the band |i−j| ≤ max(r, |n−m|) (the band must admit the
    * corner, the standard Sakoe–Chiba feasibility widening). Boundary
    * D(0,0)=0, D(i,0)=D(0,j)=∞ for i,j>0; moves right/down/diagonal.
    */
  def banded(a: Array[Long], b: Array[Long], r: Int): Long = {
    val n = a.length
    val m = b.length
    require(n > 0 && m > 0, "DTW over empty series")
    val rr = math.max(r, math.abs(n - m))
    val prev = Array.fill(m + 1)(Inf)
    val cur = Array.fill(m + 1)(Inf)
    prev(0) = 0L
    for (i <- 1 to n) {
      java.util.Arrays.fill(cur, Inf)
      val jlo = math.max(1, i - rr)
      val jhi = math.min(m, i + rr)
      for (j <- jlo to jhi) {
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        if (best < Inf) cur(j) = math.abs(a(i - 1) - b(j - 1)) + best
      }
      Array.copy(cur, 0, prev, 0, m + 1)
    }
    prev(m)
  }
}
