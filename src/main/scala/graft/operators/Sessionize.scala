package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
/** Gap-threshold sessionization + gap-aware backfill (north-rule ops).
  *
  * Sessionize = the gaps-and-islands pattern: a new session starts when the
  * time since the previous row of the same entity exceeds `gap`; the
  * session id is the running count of such breaks (cumulative sum over the
  * entity window). Identical machinery to the reference's run-length
  * islands in RQA (pymhealth src/mhealth/generic/rqa.py:115-164) — see
  * SURVEY.md §2.7.
  *
  * Backfill = last-observation-carried-forward, gated by the session so a
  * fill never crosses a gap (no value bleeds across a session boundary).
  *
  * Both are single-window-spec column expressions: one shuffle on the
  * entity key, then streaming sorted-window evaluation — no joins, no
  * state collection, skew bounded by per-entity sequence length.
  */
object Sessionize {

  /** Add a `session_id` column (0-based per entity, ordered by ts).
    * `gap` is in ts units (micros for timestamp types). `tieCols` break
    * ties between rows sharing (entity, ts) — without them the running
    * sum's row order (and thus which tied row starts a session) is
    * nondeterministic across runs/retries. The break predicate itself
    * only reads ts, so ties never change session VALUES, only make the
    * scan order stable. */
  def withSessionId(df: DataFrame, entityCol: String, tsCol: String,
                    gap: Long, out: String = "session_id",
                    tieCols: Seq[String] = Nil): DataFrame = {
    val dt = df.schema(tsCol).dataType
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    val delta = graft.core.Tables.tsMicros(col(tsCol), dt) -
      graft.core.Tables.tsMicros(lag(col(tsCol), 1).over(w), dt)
    val break_ = when(delta.isNull || delta <= gap, 0L).otherwise(1L)
    df.withColumn(out,
      sum(break_).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Backfill `valueCol` with the last non-null value of the same entity
    * AND session (never crosses a gap). Requires `session_id` present —
    * compose with [[withSessionId]]. */
  def backfillWithinSession(df: DataFrame, entityCol: String, tsCol: String,
                            valueCol: String, sessionCol: String = "session_id",
                            out: String = "value_filled",
                            tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(entityCol), col(sessionCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(out, last(col(valueCol), ignoreNulls = true).over(w))
  }
}
