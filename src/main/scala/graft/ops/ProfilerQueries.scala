package graft.ops

import graft.SparkEntry.Q

/** SparkEntry registration for the profiler family (SURVEY.md §2.4). */
object ProfilerQueries {
  val queries: Map[String, Q] = Map(
    "profile_histogram" -> ((s, dir) => Profiler.profileHistogram(s, dir)),
    "profile_histogram_asbuilt" -> ((s, dir) => Profiler.profileHistogramAsBuilt(s, dir)),
    "schema_information" -> ((s, dir) => Profiler.schemaInformation(s, dir)),
    "profile_summary" -> ((s, dir) => Profiler.profileSummary(s, dir)),
    "profile_entropy" -> ((s, dir) => Profiler.profileEntropy(s, dir)),
    "agg_stats" -> ((s, dir) => Profiler.columnStats(s, dir))
  )

  val oracles: Map[String, String] = Map(
    "profile_histogram" -> Profiler.profileHistogramOracle(),
    "profile_histogram_asbuilt" -> Profiler.profileHistogramAsBuiltOracle(),
    "schema_information" -> Profiler.schemaInformationOracle(),
    "profile_summary" -> Profiler.profileSummaryOracle(),
    "profile_entropy" -> Profiler.profileEntropyOracle(),
    "agg_stats" -> Profiler.columnStatsOracle
  )
}
