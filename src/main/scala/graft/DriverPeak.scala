package graft

/** Driver-memory high-water gauge (round-12 verdict ask #3): at 100 TB
  * the classic driver failure is a "bounded" driver structure that in
  * fact grows with corpus cardinality — a vocabulary that isn't
  * Heaps-bounded on adversarial data, a collect()ed aggregate whose
  * group count tracks rows, a sink's version listing. The lint
  * classifies every driver-action site as bounded; this gauge MEASURES
  * the claim: [[Verify]] and [[Bench]] emit the values per run, and
  * `tools/driver_memory.py` asserts the envelope stays flat
  * sf0.01 → sf0.1 (10× data, ~1× driver).
  *
  * Three numbers, because each alone misleads on a JVM:
  *  - `peakHeapMb` — sum of per-pool JVM high-water marks
  *    (MemoryPoolMXBean.getPeakUsage over HEAP pools). Catches
  *    transient mid-run spikes (a large collect) but includes
  *    not-yet-collected garbage, so it scales with allocation churn up
  *    to the GC trigger point, not only with live state.
  *  - `rssHwmMb` — kernel-tracked process high-water RSS (VmHWM in
  *    /proc/self/status). The "would the container OOM" number; capped
  *    by -Xmx + native overhead.
  *  - `liveHeapMb` — used heap after an explicit System.gc() at end of
  *    run: the RETAINED driver state (broadcast values, accumulated
  *    listings, interned metadata). This is the number that must stay
  *    flat across scales for the cardinality-bounded claim to hold.
  */
object DriverPeak {
  private val MB = 1024L * 1024L

  def peakHeapMb: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
      .sum / MB
  }

  /** Kernel high-water RSS in MB; -1 where /proc is unavailable. */
  def rssHwmMb: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/status")
      try src.getLines()
        .collectFirst { case l if l.startsWith("VmHWM:") =>
          l.split("\\s+")(1).toLong / 1024 }
        .getOrElse(-1L)
      finally src.close()
    } catch { case _: Exception => -1L }

  /** Used heap after an explicit full GC — retained driver state. Two
    * gc() calls: the first may only queue reference processing;
    * finalizable/weak-cleared memory drops on the second. */
  def liveHeapMb: Long = {
    System.gc(); System.gc()
    val u = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage
    u.getUsed / MB
  }

  /** JSON fields (no braces) for inline inclusion in Bench/Verify
    * artifact lines. Computes liveHeapMb LAST so its GC does not
    * deflate the peak readings. */
  def jsonFields: String = {
    val peak = peakHeapMb
    val rss = rssHwmMb
    val live = liveHeapMb
    s""""driver_peak_heap_mb":$peak,"driver_rss_hwm_mb":$rss,""" +
      s""""driver_live_heap_mb":$live"""
  }
}
