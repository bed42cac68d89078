package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Accelerometer scalar/aggregate features (reference: pymhealth
  * src/mhealth/inertial/accelerometer.py — SURVEY.md §2.2/2.3).
  * Pure codegen `Column` expressions. */
object Accel {

  private val Rad2Deg = 180.0 / math.Pi

  /** roll = atan2(y, z)·180/π (accelerometer.py:13-41). */
  def roll(y: Column, z: Column): Column = atan2(y, z) * Rad2Deg

  /** pitch = atan2(−x, √(y²+z²))·180/π (accelerometer.py:44-74). */
  def pitch(x: Column, y: Column, z: Column): Column =
    atan2(-x, sqrt(y * y + z * z)) * Rad2Deg

  /** Row-wise magnitude √(x²+y²+z²) (accelerometer.py:198-233). */
  def magnitude(x: Column, y: Column, z: Column): Column =
    sqrt(x * x + y * y + z * z)

  /** Whole-series magnitude_dot = √(Σx²+Σy²+Σz²)
    * (accelerometer.py:236-265). Aggregate. */
  def magnitudeDot(x: Column, y: Column, z: Column): Column =
    sqrt(sum(x * x) + sum(y * y) + sum(z * z))
}
