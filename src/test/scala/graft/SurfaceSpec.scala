package graft

/** Machine-checked migration table: EVERY public function of the
  * reference (`/root/reference/src/mhealth`, underscore-private and
  * dispatch-shim defs excluded) must map to an engine counterpart that
  * actually exists — a kernel/facade method (checked reflectively
  * against the Scala module class) or a driver-gate query (checked
  * against SparkEntry.queries). A reference symbol missing from the
  * map, a mapped method that was renamed away, or a mapped query that
  * was dropped each fail this suite. `na:` entries are the documented
  * non-goals (reference stubs / Scala-native equivalents) and carry
  * their justification inline.
  */
class SurfaceSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** The reference's public surface, by module file (enumerated from
    * `grep '^def' src/mhealth`, commit per BASELINE.md). */
  private val referenceSurface: Map[String, Seq[String]] = Map(
    "util/windows.py" -> Seq("view", "rolling_apply", "get_indices",
      "indices_rolling_apply", "nonuniform_rolling_apply"),
    "util/functional.py" -> Seq("singledispatchjit", "array_shape"),
    "generic/filters.py" -> Seq("butterworth", "bandpass"),
    "generic/timedom.py" -> Seq("gradient", "zero_crossings",
      "zero_crossing_count", "line_length", "hjorth_activity",
      "hjorth_mobility", "hjorth_mobility_derivative", "hjorth_complexity",
      "hjorth_complexity_derivatives", "hjorth_parameters", "find_peaks",
      "nb_find_peaks", "moving_average", "slope_sum", "pt_differentiate"),
    "generic/stats.py" -> Seq("minmax", "drange", "interquartile_range",
      "coeff_var", "mode", "entropy", "skewness", "kurtosis",
      "kurtosis_excess", "o1fit", "o1fit_multiple"),
    "generic/information.py" -> Seq("sampen"),
    "generic/rqa.py" -> Seq("rq", "rq2", "recurrence_rate", "determinism",
      "diagonal_lengths", "vertical_lengths", "laminarity",
      "length_entropy"),
    "generic/frequency" -> Seq("hurst", "dfa"),
    "fft/_fft.py" -> Seq("fft", "ifft"),
    "heart/hrv.py" -> Seq("nni_to_ms", "td_factor", "nni_cumulative",
      "sdnn", "rmssd", "ssd", "sdsd", "pnnx", "pnn50", "csi_sd1",
      "csi_sd2", "lorenz_csi", "lorenz_cvi", "lorenz_mcsi", "sdann",
      "sdnni", "power_band", "peak_frequency", "relative_power_band",
      "frequency_domain"),
    "heart/qrs.py" -> Seq("filter_pan_tompkins", "filter_hamilton_tompkins",
      "decision_rule_hamilton_tompkins", "rpeaks_hamilton_tompkins"),
    "heart/ppg.py" -> Seq("physionet_decision_rule",
      "pulse_onset_physionet"),
    "heart/quality.py" -> Seq("beat_correlation", "beat_correlation_bi"),
    "inertial/accelerometer.py" -> Seq("roll", "pitch", "magnitude",
      "magnitude_dot", "linear_filter", "gravity_filter"),
    "location/distance.py" -> Seq("haversine", "haversine_elementwise",
      "haversine_vector", "haversine_outer_product", "successive_distance",
      "arr_successive_distance"),
    "location/features.py" -> Seq("determine_home_coords",
      "distance_from_home", "arr_distance_from_home",
      "proportion_home_stay", "arr_proportion_home_stay"),
    "location/distribution.py" -> Seq("location_variance",
      "arr_location_variance", "cluster_locations", "num_clusters",
      "cluster_totals", "cluster_entropy", "normalized_cluster_entropy"))

  /** symbol → engine counterpart. Forms:
    *  - "<scala module fqcn>#<method>"  (reflection check)
    *  - "query:<q_name>"                (SparkEntry.queries check)
    *  - "na:<why>"                      (documented non-goal)
    */
  private val counterpart: Map[String, String] = Map(
    "view" -> "query:q_count_windows",
    "rolling_apply" -> "query:q_rolling_stats",
    "get_indices" -> "graft.operators.Windows#anchoredWindows",
    "indices_rolling_apply" -> "graft.operators.Windows#anchoredWindowsWith",
    "nonuniform_rolling_apply" -> "query:q_anchored_windows",
    "singledispatchjit" -> "na:Scala overloading is the dispatch",
    "array_shape" -> "na:numba shim; Spark schemas carry shape",
    "butterworth" -> "graft.api.MHealth$Filters#butterworth",
    "bandpass" -> "graft.signal.Butterworth#design",
    "gradient" -> "graft.functions.TimeDomain#gradient",
    "zero_crossings" -> "graft.functions.TimeDomain#zeroCrossing",
    "zero_crossing_count" -> "query:q_timedom",
    "line_length" -> "query:q_timedom",
    "hjorth_activity" -> "graft.functions.TimeDomain#hjorthActivity",
    "hjorth_mobility" -> "graft.functions.TimeDomain#hjorthMobility",
    "hjorth_mobility_derivative" -> "query:q_timedom",
    "hjorth_complexity" -> "graft.functions.TimeDomain#hjorthComplexity",
    "hjorth_complexity_derivatives" -> "query:q_timedom",
    "hjorth_parameters" -> "query:q_timedom",
    "find_peaks" -> "graft.signal.Qrs#findPeaks",
    "nb_find_peaks" -> "graft.signal.Qrs#findPeaks",
    "moving_average" -> "graft.signal.Qrs#movingAverage",
    "slope_sum" -> "graft.functions.TimeDomain#slopeSum",
    "pt_differentiate" -> "graft.functions.TimeDomain#ptDifferentiate",
    "minmax" -> "query:q_stats_profile",
    "drange" -> "graft.functions.Stats#drange",
    "interquartile_range" -> "graft.functions.Stats#iqr",
    "coeff_var" -> "graft.functions.Stats#coeffVar",
    "mode" -> "query:q_mode",
    "entropy" -> "graft.functions.Stats#entropyTerm",
    "skewness" -> "graft.functions.Stats#skewnessPop",
    "kurtosis" -> "graft.functions.Stats#kurtosisNonExcess",
    "kurtosis_excess" -> "graft.functions.Stats#kurtosisExcess",
    "o1fit" -> "query:q_o1fit",
    "o1fit_multiple" -> "query:q_o1fit",
    "sampen" -> "graft.signal.SampEn#sampen",
    "rq" -> "query:q_rqa",
    "rq2" -> "query:q_rqa",
    "recurrence_rate" -> "query:q_rqa",
    "determinism" -> "query:q_rqa",
    "diagonal_lengths" -> "query:q_rqa_lengths",
    "vertical_lengths" -> "query:q_rqa_lengths",
    "laminarity" -> "query:q_rqa_lengths",
    "length_entropy" -> "query:q_rqa_lengths",
    "hurst" -> "graft.operators.Fractal#hurst",
    "dfa" -> "graft.operators.Dfa#exponent",
    "fft" -> "graft.signal.Spectral#fft",
    "ifft" -> "graft.signal.Spectral#ifft",
    "nni_to_ms" -> "query:q_sdann",
    "td_factor" -> "query:q_sdann",
    "nni_cumulative" -> "query:q_sdann",
    "sdnn" -> "graft.functions.Hrv#sdnn",
    "rmssd" -> "graft.functions.Hrv#rmssd",
    "ssd" -> "graft.functions.Hrv#ssd",
    "sdsd" -> "graft.functions.Hrv#sdsd",
    "pnnx" -> "graft.functions.Hrv#pnnx",
    "pnn50" -> "graft.functions.Hrv#pnnx",
    "csi_sd1" -> "graft.functions.Hrv#csiSd1",
    "csi_sd2" -> "graft.functions.Hrv#csiSd2",
    "lorenz_csi" -> "graft.functions.Hrv#lorenzCsi",
    "lorenz_cvi" -> "graft.functions.Hrv#lorenzCvi",
    "lorenz_mcsi" -> "graft.functions.Hrv#lorenzMcsi",
    "sdann" -> "query:q_sdann",
    "sdnni" -> "query:q_sdann",
    "power_band" -> "graft.signal.Spectral#powerBand",
    "peak_frequency" -> "graft.signal.Spectral#peakFrequency",
    "relative_power_band" -> "graft.signal.Spectral#relativePowerBand",
    "frequency_domain" -> "na:reference stub (hrv.py:201-203, `pass`)",
    "filter_pan_tompkins" -> "graft.signal.Qrs#filterPanTompkins",
    "filter_hamilton_tompkins" -> "graft.signal.Qrs#filterHamiltonTompkins",
    "decision_rule_hamilton_tompkins" ->
      "graft.signal.Qrs#decisionRuleHamiltonTompkins",
    "rpeaks_hamilton_tompkins" ->
      "graft.api.MHealth$QrsApi#rpeaksHamiltonTompkins",
    "physionet_decision_rule" -> "graft.signal.Ppg#physionetDecisionRule",
    "pulse_onset_physionet" -> "graft.signal.Ppg#pulseOnsetPhysionet",
    "beat_correlation" -> "graft.signal.Quality#beatCorrelation",
    "beat_correlation_bi" -> "graft.signal.Quality#beatCorrelationBi",
    "roll" -> "graft.functions.Accel#roll",
    "pitch" -> "graft.functions.Accel#pitch",
    "magnitude" -> "graft.functions.Accel#magnitude",
    "magnitude_dot" -> "graft.functions.Accel#magnitudeDot",
    "linear_filter" -> "graft.api.MHealth$AccelApi#linearFilter",
    "gravity_filter" -> "graft.api.MHealth$AccelApi#gravityFilter",
    "haversine" -> "graft.functions.Geo#haversine",
    "haversine_elementwise" -> "graft.functions.Geo#haversine",
    "haversine_vector" -> "graft.functions.Geo#haversine",
    "haversine_outer_product" -> "query:q_geo_pairs",
    "successive_distance" -> "graft.functions.Geo#successiveDistance",
    "arr_successive_distance" -> "graft.functions.Geo#successiveDistance",
    "determine_home_coords" -> "query:q_home_stay",
    "distance_from_home" -> "graft.api.MHealth$LocationApi#distanceFromHome",
    "arr_distance_from_home" ->
      "graft.api.MHealth$LocationApi#distanceFromHome",
    "proportion_home_stay" -> "query:q_home_stay",
    "arr_proportion_home_stay" -> "query:q_home_stay",
    "location_variance" -> "graft.functions.Geo#locationVariance",
    "arr_location_variance" -> "graft.functions.Geo#locationVariance",
    "cluster_locations" -> "graft.operators.GridDbscan#label",
    "num_clusters" -> "query:q_location_clusters",
    "cluster_totals" -> "query:q_location_clusters",
    "cluster_entropy" -> "query:q_location_clusters",
    "normalized_cluster_entropy" -> "query:q_location_clusters")

  /** Scala object => module class "<fqcn>$"; nested objects use the
    * enclosing-class $ separator already present in the map entries. */
  private def moduleHasMethod(ref: String): Boolean = {
    val Array(fqcn, method) = ref.split("#")
    Class.forName(fqcn + "$").getMethods.exists(_.getName == method)
  }

  test("every public reference symbol has a mapped, existing engine " +
    "counterpart (kernel method, facade method, or gate query)") {
    val allSymbols = referenceSurface.values.flatten.toSeq
    val unmapped = allSymbols.filterNot(counterpart.contains)
    assert(unmapped.isEmpty, s"unmapped reference symbols: $unmapped")
    val stale = counterpart.keySet -- allSymbols.toSet
    assert(stale.isEmpty, s"mapped symbols not in the reference: $stale")
    val failures = allSymbols.flatMap { sym =>
      counterpart(sym) match {
        case q if q.startsWith("query:") =>
          val name = q.stripPrefix("query:")
          if (SparkEntry.queries.contains(name) &&
            SparkEntry.oracleSql.contains(name)) None
          else Some(s"$sym -> $q (query or oracle missing)")
        case na if na.startsWith("na:") => None
        case ref =>
          val ok = try moduleHasMethod(ref)
          catch { case _: ClassNotFoundException => false }
          if (ok) None else Some(s"$sym -> $ref (method missing)")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    info(s"${allSymbols.size} reference symbols verified " +
      s"(${counterpart.values.count(_.startsWith("query:"))} via gate " +
      s"queries, ${counterpart.values.count(_.startsWith("na:"))} " +
      "documented non-goals)")
  }

  test("the pandas-adapter fs inference exists on the facade (qrs.py:102)") {
    assert(Class.forName("graft.api.MHealth$QrsApi$")
      .getMethods.exists(_.getName == "inferFs"))
  }
}
