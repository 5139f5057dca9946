package graft.streaming

/** Dev-profiler hook shared by the ingest gates' phase timers (active
  * only under GRAFT_INGEST_PROF=1): a profiler that counts Spark jobs
  * with its own listener (graft.IngestJobProfile) plugs the cumulative
  * counter in here, and each gate phase prints its job delta alongside
  * its wall time. Default `() => -1` = no counter plugged, phases print
  * wall only. Never consulted on the production path. */
private[graft] object IngestProf {
  @volatile var jobCount: () => Int = () => -1

  private[graft] val enabled = sys.env.get("GRAFT_INGEST_PROF").contains("1")

  /** Phase timer shared by all three gates (r15 — previously private to
    * SimilarityIngest; IngestDedup now reports the same phase lines). */
  private[graft] def timed[T](label: String)(f: => T): T =
    if (!enabled) f else {
      val jc = jobCount
      // drain the listener bus ONLY when a job counter is actually
      // plugged (r14 review): wall-only profiling (GRAFT_INGEST_PROF=1
      // without IngestJobProfile) must not stall on the shared async
      // bus twice per phase just to read the default -1
      val plugged = jc() >= 0
      def jobsNow(): Int = {
        if (plugged)
          org.apache.spark.sql.SparkSession.getActiveSession.foreach(s =>
            org.apache.spark.graft.ListenerBridge
              .waitUntilEmpty(s.sparkContext))
        jc()
      }
      val j0 = jobsNow()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val j1 = jobsNow()
      if (j0 >= 0)
        println(f"[ingest-prof] $label: $dt%.3f s jobs=${j1 - j0}")
      else println(f"[ingest-prof] $label: $dt%.3f s")
      r
    }
}
