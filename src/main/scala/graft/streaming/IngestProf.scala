package graft.streaming

/** Dev-profiler hook shared by the ingest gates' phase timers (active
  * only under GRAFT_INGEST_PROF=1): a profiler that counts Spark jobs
  * with its own listener (graft.IngestJobProfile) plugs the cumulative
  * counter in here, and each gate phase prints its job delta alongside
  * its wall time. Default `() => -1` = no counter plugged, phases print
  * wall only. Never consulted on the production path. */
private[graft] object IngestProf {
  @volatile var jobCount: () => Int = () => -1
}
