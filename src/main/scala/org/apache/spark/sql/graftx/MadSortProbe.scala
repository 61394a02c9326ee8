package org.apache.spark.sql.graftx

import org.apache.spark.util.collection.OpenHashMap

/** Dev-only microbench backing `ScaleProbe madsort15` — the round-14
  * ADVICE #2 measurement that gated replacing the eval-time boxed
  * tuple sort in [[MadOutliersAgg.sortedPairs]]. The measurement came
  * back material (boxed 1.29 s vs primitive 0.44 s per 2 M-entry sort,
  * ×2 sorts per group against an ~8 s fused pass — SCALE.md madsort15),
  * so the primitive spelling SHIPPED; this probe keeps the superseded
  * boxed spelling as the A/B reference and element-wise asserts order
  * equality, so the record stays reproducible. Lives in this package
  * only for `private[graftx]` access; nothing here runs in any query
  * path.
  */
object MadSortProbe {

  /** nd distinct lognormal-ish doubles (the outlier8 value shape),
    * count 1 each — the worst case for the sort (map size == n). */
  def mkCounts(nd: Int): OpenHashMap[Long, Long] = {
    val m = new OpenHashMap[Long, Long](nd)
    var i = 0
    while (i < nd) {
      val v = math.exp((i % 1000000) / 250000.0) * (i / 1e12 + 1.0)
      m.changeValue(java.lang.Double.doubleToLongBits(v), 1L, _ + 1L)
      i += 1
    }
    m
  }

  /** The SUPERSEDED boxed spelling (pre-round-15 sortedPairs), kept
    * verbatim as the A/B reference. */
  def boxedSorted(counts: OpenHashMap[Long, Long]): Array[(Double, Long)] = {
    val pairs = counts.iterator
      .map { case (bits, c) => (java.lang.Double.longBitsToDouble(bits), c) }
      .toArray
    java.util.Arrays.sort(pairs, (a: (Double, Long), b: (Double, Long)) =>
      java.lang.Double.compare(a._1, b._1))
    pairs
  }

  /** (median boxed-sort sec, median shipped-primitive-sort sec) over
    * `reps` timed repetitions each, outputs cross-checked element-wise
    * (bits-level, so NaN/−0.0 order parity is asserted too). */
  def ab(nd: Int, reps: Int): (Double, Double) = {
    val counts = mkCounts(nd)
    // order-parity edge keys alongside the bulk: −0.0 / +0.0 / NaN /
    // ±extremes must land where Double.compare puts them
    for (v <- Seq(-0.0, 0.0, Double.NaN, Double.MaxValue, -Double.MaxValue,
                  Double.MinPositiveValue, -Double.MinPositiveValue))
      counts.changeValue(java.lang.Double.doubleToLongBits(v), 3L, _ + 3L)
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    // one untimed warmup each for JIT, plus the element-wise order check
    val warmB = boxedSorted(counts)
    val (warmV, warmC) = MadOutliersAgg.sortedPairs(counts)
    require(warmB.length == warmV.length)
    var i = 0
    while (i < warmB.length) {
      require(java.lang.Double.doubleToLongBits(warmB(i)._1) ==
        java.lang.Double.doubleToLongBits(warmV(i)) && warmB(i)._2 == warmC(i),
        s"order/count mismatch at $i")
      i += 1
    }
    val boxed = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val p = boxedSorted(counts)
      val s = (System.nanoTime() - t0) / 1e9
      require(p.length == warmB.length); s
    }
    val prim = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val (v, _) = MadOutliersAgg.sortedPairs(counts)
      val s = (System.nanoTime() - t0) / 1e9
      require(v.length == warmB.length); s
    }
    (med(boxed), med(prim))
  }
}
