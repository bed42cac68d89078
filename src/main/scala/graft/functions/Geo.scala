package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Geospatial features (reference: pymhealth src/mhealth/location/ —
  * SURVEY.md §2.2/2.3). Pure `Column` expressions (codegen'd, no UDFs).
  */
object Geo {

  /** Haversine distance in km (distance.py:4-19). Uses the code constant
    * 2r = 12742.018 (r = 6371.009 — the docstring's 6371 is wrong). */
  def haversine(lat1: Column, lon1: Column,
                lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2) - radians(lat1)
    val dLon = radians(lon2) - radians(lon1)
    lit(12742.018) * asin(sqrt(
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
