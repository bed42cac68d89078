package graft.queries

import graft.core.Tables
import graft.signal.{Butterworth, Ppg, Qrs, SampEn, PerEntity, Spectral}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stateful signal-processing queries (SURVEY.md §2.6) over `events`,
  * treating each user's value series as a 32 Hz signal. These operators
  * are sequential per-entity scans (IIR filtering, adaptive-threshold
  * decision rules, O(n²) entropy) — not SQL-expressible, so the driver
  * records rows-only checks (no oracleSql entries); their numeric
  * semantics are covered by SignalSpec's analytic/property fixtures.
  */
object SignalQueries {

  private val Fs = 128.0

  /** events as a per-user series at row-number positions (fs-agnostic). */
  private def series(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("user_id").cast("string").as("entity_id"),
        col("rn").as("t"), col("value"))
  }

  /** Longer deterministic series (up to 2048 samples @128 Hz) from the
    * synthetic tokens table — the QRS/PPG pipelines need fs ≥ 2·25 Hz
    * for their filter bands and >10 s of signal for the PPG warm-up,
    * which the sparse events series cannot supply. */
  private def tokenSeries(spark: SparkSession): DataFrame =
    graft.core.TokenGen.points(graft.core.TokenGen.docs(spark, 64))
      .select(col("entity_id"), col("ts").as("t"), col("value"))

  /** Zero-phase Butterworth lowpass (0.2·Nyquist, order 4) per user —
    * the reference's `butterworth`/`linear_filter`/`gravity_filter`
    * family (filters.py:8-35, accelerometer.py:77-195). */
  def qFiltfilt(spark: SparkSession, dir: String): DataFrame = {
    val c = Butterworth.design(4, Seq(0.2), Butterworth.Lowpass)
    PerEntity.transform(spark, series(spark, dir),
      "entity_id", "t", "value") { (ts, vs) =>
      if (vs.length <= 3 * (c.a.length max c.b.length))
        Iterator.empty // shorter than filtfilt padlen: no output
      else Butterworth.filtfilt(c, vs).iterator.zip(ts.iterator)
        .map { case (v, t) => (t, v) }
    }.select(col("entity_id"), col("t"),
      round(col("out"), 6).as("filtered"))
      .orderBy(col("entity_id"), col("t"))
  }

  /** Hamilton–Tompkins R-peak pipeline per doc series (qrs.py:59-197). */
  def qRpeaks(spark: SparkSession, dir: String): DataFrame = {
    PerEntity.selectIndices(spark, tokenSeries(spark),
      "entity_id", "t", "value") { vs =>
      if (vs.length <= 120) Array.empty
      else Qrs.rpeaksHamiltonTompkins(vs, Fs)
    }.select(col("entity_id"), col("t").as("peak_pos"),
      round(col("out"), 6).as("value"))
      .orderBy(col("entity_id"), col("peak_pos"))
  }

  /** Physionet PPG pulse-onset pipeline per doc series (ppg.py:11-93). */
  def qPulseOnsets(spark: SparkSession, dir: String): DataFrame = {
    PerEntity.selectIndices(spark, tokenSeries(spark),
      "entity_id", "t", "value") { vs =>
      if (vs.length <= Fs.toInt * 10) Array.empty
      else Ppg.pulseOnsetPhysionet(vs, Fs.toInt)
    }.select(col("entity_id"), col("t").as("onset_pos"),
      round(col("out"), 6).as("value"))
      .orderBy(col("entity_id"), col("onset_pos"))
  }

  /** Sample entropy per user (information.py:23-113): one O(n²) scan
    * over each bounded series. */
  def qSampen(spark: SparkSession, dir: String): DataFrame = {
    PerEntity.transform(spark, series(spark, dir),
      "entity_id", "t", "value") { (_, vs) =>
      Iterator.single((0L, SampEn.sampen(vs)))
    }.select(col("entity_id"),
      round(Tables.nanToNull(col("out")), 6).as("sampen"))
      .orderBy(col("entity_id"))
  }

  /** Frequency-domain HRV features per doc series (hrv.py:173-198 over
    * a Breeze FFT; SURVEY.md §2.8): band power 5–15 Hz, peak frequency,
    * relative band power, total |spectrum|. */
  def qPowerBand(spark: SparkSession, dir: String): DataFrame = {
    val fs = Fs
    PerEntity.transform(spark, tokenSeries(spark),
      "entity_id", "t", "value") { (_, vs) =>
      if (vs.length < 64) Iterator.empty
      else {
        val mean = vs.sum / vs.length
        val f = Spectral.fft(vs.map(_ - mean))
        val half = vs.length / 2
        val freqs = Array.tabulate(half)(i => i * fs / vs.length)
        val psd = f.take(half).map(_.abs)
        Iterator(
          (0L, Spectral.powerBand(psd, freqs, 5, 15)),
          (1L, Spectral.peakFrequency(psd, freqs, 5, 15)),
          (2L, Spectral.relativePowerBand(psd, freqs, 5, 15)),
          (3L, psd.sum))
      }
    }.groupBy(col("entity_id")).pivot("t", Seq(0L, 1L, 2L, 3L))
      .agg(first(round(col("out"), 6)))
      .withColumnsRenamed(Map("0" -> "band_power", "1" -> "peak_freq",
        "2" -> "rel_power", "3" -> "total_power"))
      .orderBy(col("entity_id"))
  }

  /** Multimodal plumbing: binary media column → fake decode → frame
    * sample → per-frame features (rows-only; MultimodalSpec carries the
    * numeric verification). */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    graft.functions.Multimodal.frameFeatures(
      graft.functions.Multimodal.mediaTable(spark, 200), frameStride = 2)
      .toDF()
      .select(col("doc_id"), col("frame"), col("width"), col("height"),
        round(col("mean_px"), 6).as("mean_px"), col("max_px"),
        col("frame_hash"))
      .orderBy(col("doc_id"), col("frame"))
  }

  /** Frequency-domain HRV over NON-UNIFORM samples (the reference's
    * NUFFT use case, SURVEY.md §2.8: PSD of an irregularly-timed nni
    * series): per user, event times map to [0, 2π), the type-1 NUFFT
    * gives the spectrum on a 32-bin grid (frequencies in cycles per
    * observation span), then band power / peak / relative features. */
  def qHrvFreq(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("string").as("entity_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("value"))
    PerEntity.transform(spark, ev, "entity_id", "t", "value") { (ts, vs) =>
      if (vs.length < 16) Iterator.empty
      else {
        val t0 = ts.head
        val span = (ts.last - t0).toDouble
        val x = ts.map(t => (t - t0) / span * 2 * math.Pi)
        val mean = vs.sum / vs.length
        val c = vs.map(_ - mean)
        val m = 32
        val spec = Spectral.nufft1d1(x, c, m)
        // positive-frequency half of the centered grid
        val freqs = Spectral.nufftFreqs(m).drop(m / 2)
        val psd = spec.drop(m / 2).map(_.abs)
        Iterator(
          (0L, Spectral.powerBand(psd, freqs, 1, 4)),
          (1L, Spectral.peakFrequency(psd, freqs, 1, 8)),
          (2L, Spectral.relativePowerBand(psd, freqs, 1, 4)))
      }
    }.groupBy(col("entity_id")).pivot("t", Seq(0L, 1L, 2L))
      .agg(first(round(col("out"), 6)))
      .withColumnsRenamed(Map("0" -> "band_power_1_4",
        "1" -> "peak_freq_1_8", "2" -> "rel_power_1_4"))
      .orderBy(col("entity_id"))
  }

  val all: Map[String, CoreQueries.Q] = Map(
    "q_filtfilt" -> (qFiltfilt _),
    "q_rpeaks" -> (qRpeaks _),
    "q_pulse_onsets" -> (qPulseOnsets _),
    "q_sampen" -> (qSampen _),
    "q_power_band" -> (qPowerBand _),
    "q_hrv_freq" -> (qHrvFreq _),
    "q_media_features" -> (qMediaFeatures _)
  )

  /** Intentionally empty: sequential IIR recursions and adaptive decision
    * rules have no ANSI-SQL equivalent; the driver applies rows-only
    * checks and SignalSpec carries the numeric verification. */
  val oracle: Map[String, String] = Map.empty
}
