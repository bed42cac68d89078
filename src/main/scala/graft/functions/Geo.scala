package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Geospatial features (reference: pymhealth src/mhealth/location/ —
  * SURVEY.md §2.2/2.3). Pure `Column` expressions (codegen'd, no UDFs).
  */
object Geo {

  /** Code-parity Earth diameter (distance.py:18): 2r = 12742.018 km.
    *
    * Reference inconsistency, preserved and documented: the reference's
    * own test goldens (tests/location/test_distance.py:22 "assumes
    * r=6371") were computed with 2r = 12742.0, so the shipped test suite
    * diverges from the shipped code by a factor 12742.018/12742
    * (≈1.4e-6 relative — outside pytest.approx). We default to the CODE
    * constant; GeoSpec ports the goldens under the TEST constant. */
  val TwoR: Double = 12742.018
  val TwoRTestGoldens: Double = 12742.0

  /** Haversine distance in km (distance.py:4-19). */
  def haversine(lat1: Column, lon1: Column,
                lat2: Column, lon2: Column,
                twoR: Double = TwoR): Column = {
    val dLat = radians(lat2) - radians(lat1)
    val dLon = radians(lon2) - radians(lon1)
    lit(twoR) * asin(sqrt(
      pow(sin(dLat / 2.0), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2.0), 2)))
  }

  /** Distance to the previous point per entity, first row = 0
    * (features.py:87-113). */
  def successiveDistance(lat: Column, lon: Column, w: WindowSpec): Column =
    coalesce(
      haversine(lag(lat, 1).over(w), lag(lon, 1).over(w), lat, lon),
      lit(0.0))

  /** location_variance = var_pop(lat) + var_pop(lon) — the reference code
    * does NOT take the log its docstring claims (distribution.py:16-39). */
  def locationVariance(lat: Column, lon: Column): Column =
    var_pop(lat) + var_pop(lon)
}
