package graft.queries

import graft.core.Tables
import graft.functions.{Accel, Stats}
import graft.signal.{Butterworth, PerEntity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accelerometer + location-distribution operator queries (reference:
  * pymhealth src/mhealth/inertial/accelerometer.py,
  * src/mhealth/location/distribution.py — SURVEY.md §2.2/2.3).
  * Tri-axial signals and coordinates are derived deterministically from
  * `events` integer columns, so both engines compute identical inputs.
  * HDBSCAN clustering is substituted by a deterministic 5°-grid label
  * (SURVEY.md §7.6 substitution register) — the downstream cluster
  * features (count, totals, entropy) are the reference semantics.
  */
object InertialQueries {

  /** roll / pitch / row magnitude + per-user magnitude_dot. */
  def qAccel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"),
      ((col("event_id") * 31 % 2001) / 1000.0 - 1.0).as("ax"),
      ((col("event_id") * 57 % 2001) / 1000.0 - 1.0).as("ay"),
      ((col("event_id") * 89 % 2001) / 1000.0 - 1.0).as("az"))
    // + 0.0 normalizes IEEE negative zero: Spark round() drops the sign
    // (BigDecimal) but DuckDB keeps it, and atan2(-0.0, y) IS -0.0 when
    // ax == 0 — the strings "0.0" vs "-0.0" would hash-mismatch
    val perRow = ev.select(col("user_id"), col("event_id"),
      (round(Accel.roll(col("ay"), col("az")), 6) + 0.0).as("roll"),
      (round(Accel.pitch(col("ax"), col("ay"), col("az")), 6) + 0.0)
        .as("pitch"),
      round(Accel.magnitude(col("ax"), col("ay"), col("az")), 6)
        .as("magnitude"))
      .where(col("event_id") % 7 === 0)
    val perUser = ev.groupBy(col("user_id")).agg(
      round(Accel.magnitudeDot(col("ax"), col("ay"), col("az")), 6)
        .as("magnitude_dot"))
    perRow.join(perUser, Seq("user_id"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** location_variance + grid-cluster features: num_clusters,
    * cluster entropy (epsilon-inside form), normalized entropy. */
  def qLocationClusters(spark: SparkSession, dir: String): DataFrame = {
    // integer-lattice coordinates (lat = li/100 − 85): variance is
    // computed on EXACT integer sums so both engines agree bitwise
    // (float var_pop summation order differs between engines)
    val pts = Tables.events(spark, dir).select(
      col("user_id"),
      (col("event_id") * 37 % 17000).as("li"),
      (col("event_id") * 73 % 36000).as("lo"))
      .withColumn("cl",
        floor((col("li") / 100.0 - 85.0) / 5) * 100 +
          floor((col("lo") / 100.0 - 180.0) / 5))
    val n = count(lit(1))
    def varInt(c: org.apache.spark.sql.Column) =
      (sum(c * c) / n - (sum(c) / n) * (sum(c) / n)) / 10000.0
    val locVar = pts.groupBy(col("user_id")).agg(
      round(varInt(col("li")) + varInt(col("lo")), 6)
        .as("location_variance"),
      count(lit(1)).as("n_points"))
    val counts = pts.groupBy(col("user_id"), col("cl"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("user_id")).agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("n_clusters"))
    val ent = counts.join(totals, Seq("user_id"))
      .select(col("user_id"), col("n_clusters"),
        Stats.entropyTerm(col("cnt").cast("double"),
          col("total").cast("double")).as("term"))
      .groupBy(col("user_id"), col("n_clusters"))
      .agg(round(sum(col("term")), 6).as("cluster_entropy"),
        round(sum(col("term")) /
          log(col("n_clusters").cast("double")), 6)
          .as("norm_cluster_entropy"))
    locVar.join(ent, Seq("user_id"))
      .select(col("user_id"), col("location_variance"), col("n_points"),
        col("n_clusters"), col("cluster_entropy"),
        col("norm_cluster_entropy"))
      .orderBy(col("user_id"))
  }

  /** The tri-axial series in stacked long format — (user:axis) is the
    * scan entity, so ONE per-entity pass filters all three axes (the
    * reference's per-column loop, accelerometer.py:116-124, re-expressed
    * as more parallelism instead of a wider kernel). */
  private def axisSeries(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("user_id").cast("string").as("uid"), col("rn"),
        ((col("event_id") * 31 % 2001) / 1000.0 - 1.0).as("x"),
        ((col("event_id") * 57 % 2001) / 1000.0 - 1.0).as("y"),
        ((col("event_id") * 89 % 2001) / 1000.0 - 1.0).as("z"))
      .select(col("uid"), col("rn"), explode(array(
        struct(lit("x").as("axis"), col("x").as("v")),
        struct(lit("y").as("axis"), col("y").as("v")),
        struct(lit("z").as("axis"), col("z").as("v")))).as("a"))
      .select(concat(col("uid"), lit(":"), col("a.axis")).as("entity_id"),
        col("rn").as("t"), col("a.v").as("value"))
  }

  private def axisFiltfilt(spark: SparkSession, dir: String,
                           c: Butterworth.Coeffs,
                           outCol: String): DataFrame = {
    PerEntity.transform(spark, axisSeries(spark, dir),
      "entity_id", "t", "value") { (ts, vs) =>
      if (vs.length <= 3 * (c.a.length max c.b.length)) Iterator.empty
      else Butterworth.filtfilt(c, vs).iterator.zip(ts.iterator)
        .map { case (v, t) => (t, v) }
    }.select(
      split(col("entity_id"), ":").getItem(0).as("entity_id"),
      split(col("entity_id"), ":").getItem(1).as("axis"),
      // + 0.0 after round: filtered values cross zero, and a y in
      // (−5e-7, 0) rounds to "−0.0" in DuckDB but "0.0" in Spark
      col("t"), (round(col("out"), 6) + 0.0).as(outCol))
      .orderBy(col("entity_id"), col("axis"), col("t"))
  }

  /** linear_filter (accelerometer.py:77-124): per-axis HIGHPASS
    * filtfilt, default cutoff 0.5 Hz, order 5, at fs = 128 — the
    * non-gravitational component. Hash-checked against the recursive-CTE
    * filtfilt replay over the same stacked series (bit-exact). */
  def qLinearFilter(spark: SparkSession, dir: String): DataFrame =
    axisFiltfilt(spark, dir,
      Butterworth.design(5, Seq(0.5 / 64), Butterworth.Highpass), "linear")

  /** gravity_filter (accelerometer.py:142-185): per-axis LOWPASS
    * filtfilt, cutoff 0.5 Hz, order 5 — the gravitational component. */
  def qGravityFilter(spark: SparkSession, dir: String): DataFrame =
    axisFiltfilt(spark, dir,
      Butterworth.design(5, Seq(0.5 / 64), Butterworth.Lowpass), "gravity")

  val all: Map[String, CoreQueries.Q] = Map(
    "q_accel" -> (qAccel _),
    "q_location_clusters" -> (qLocationClusters _),
    "q_linear_filter" -> (qLinearFilter _),
    "q_gravity_filter" -> (qGravityFilter _)
  )

  /** The stacked tri-axial series as the filtfilt chain's sig contract:
    * (user:axis) entities, 0-based position i, deterministic axis values
    * — identical expressions to [[axisSeries]]. */
  private def axisSig: String =
    """sig AS (
      |  SELECT e.user_id::VARCHAR || ':' || ax.axis AS user_id,
      |    row_number() OVER (PARTITION BY e.user_id, ax.axis
      |      ORDER BY e.ts, e.event_id) - 1 AS i,
      |    CASE ax.axis
      |      WHEN 'x' THEN ((e.event_id * 31) % 2001) / 1000.0 - 1.0
      |      WHEN 'y' THEN ((e.event_id * 57) % 2001) / 1000.0 - 1.0
      |      ELSE ((e.event_id * 89) % 2001) / 1000.0 - 1.0 END AS x,
      |    count(*) OVER (PARTITION BY e.user_id, ax.axis) AS n
      |  FROM events e, (SELECT unnest(['x','y','z']) AS axis) ax)"""
      .stripMargin

  private def axisFilterOracle(c: Butterworth.Coeffs,
                               outCol: String): String =
    SqlGen.filtfiltChain(c, axisSig) + s"""
      |SELECT split_part(user_id, ':', 1) AS entity_id,
      |  split_part(user_id, ':', 2) AS axis,
      |  idx0 + 1 AS t, round(y, 6) + 0.0 AS $outCol
      |FROM ff ORDER BY entity_id, axis, t""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_linear_filter" -> axisFilterOracle(
      Butterworth.design(5, Seq(0.5 / 64), Butterworth.Highpass), "linear"),
    "q_gravity_filter" -> axisFilterOracle(
      Butterworth.design(5, Seq(0.5 / 64), Butterworth.Lowpass), "gravity"),
    "q_accel" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    ((event_id * 31) % 2001) / 1000.0 - 1.0 AS ax,
        |    ((event_id * 57) % 2001) / 1000.0 - 1.0 AS ay,
        |    ((event_id * 89) % 2001) / 1000.0 - 1.0 AS az
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |    round(sqrt(sum(ax*ax) + sum(ay*ay) + sum(az*az)), 6)
        |      AS magnitude_dot
        |  FROM ev GROUP BY user_id)
        |SELECT ev.user_id, event_id,
        |  round(atan2(ay, az) * 180 / pi(), 6) + 0.0 AS roll,
        |  round(atan2(-ax, sqrt(ay*ay + az*az)) * 180 / pi(), 6) + 0.0
        |    AS pitch,
        |  round(sqrt(ax*ax + ay*ay + az*az), 6) AS magnitude,
        |  pu.magnitude_dot
        |FROM ev JOIN pu ON pu.user_id = ev.user_id
        |WHERE event_id % 7 = 0
        |ORDER BY ev.user_id, event_id""".stripMargin,
    "q_location_clusters" ->
      """WITH p AS (
        |  SELECT user_id,
        |    (event_id * 37) % 17000 AS li,
        |    (event_id * 73) % 36000 AS lo
        |  FROM events),
        |pc AS (
        |  SELECT user_id, li, lo,
        |    floor((li / 100.0 - 85.0) / 5) * 100
        |      + floor((lo / 100.0 - 180.0) / 5) AS cl
        |  FROM p),
        |lv AS (
        |  SELECT user_id,
        |    round(((sum(li*li)/count(*)
        |        - (sum(li)/count(*))*(sum(li)/count(*))) / 10000.0)
        |      + ((sum(lo*lo)/count(*)
        |        - (sum(lo)/count(*))*(sum(lo)/count(*))) / 10000.0), 6)
        |      AS location_variance,
        |    count(*) AS n_points
        |  FROM pc GROUP BY user_id),
        |c AS (
        |  SELECT user_id, cl, count(*) AS cnt
        |  FROM pc GROUP BY user_id, cl),
        |t AS (
        |  SELECT user_id, sum(cnt) AS total, count(*) AS n_clusters
        |  FROM c GROUP BY user_id),
        |e AS (
        |  SELECT c.user_id, t.n_clusters,
        |    round(sum(-(c.cnt::DOUBLE / t.total + 1e-30)
        |      * ln(c.cnt::DOUBLE / t.total + 1e-30)), 6) AS cluster_entropy,
        |    round(sum(-(c.cnt::DOUBLE / t.total + 1e-30)
        |      * ln(c.cnt::DOUBLE / t.total + 1e-30))
        |      / ln(t.n_clusters::DOUBLE), 6) AS norm_cluster_entropy
        |  FROM c JOIN t ON t.user_id = c.user_id
        |  GROUP BY c.user_id, t.n_clusters)
        |SELECT lv.user_id, location_variance, n_points, e.n_clusters,
        |  cluster_entropy, norm_cluster_entropy
        |FROM lv JOIN e ON e.user_id = lv.user_id
        |ORDER BY lv.user_id""".stripMargin
  )
}
