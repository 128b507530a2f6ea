package graft.tools

/** Env-gated phase timer (SPARK_GRAFT_TIMING=1): prints `[t] tag ms` to
  * stderr. Zero-cost when off; used to attribute wall time inside
  * multi-commit operators (store mutations, streaming sinks) where job
  * callsites are masked by the micro-batch job group. */
object Timing {
  val on: Boolean = sys.env.get("SPARK_GRAFT_TIMING").contains("1")
  @inline def apply[A](tag: String)(f: => A): A =
    if (!on) f
    else {
      val t0 = System.nanoTime()
      try f finally
        System.err.println(f"[t] $tag ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
}
