package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Gap-threshold sessionize + gap-aware backfill (north-rule ops;
  * gaps-and-islands machinery shared with RQA run lengths, SURVEY.md §2.7). */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  test("session ids: new session when gap > threshold") {
    val df = Seq(
      ("e", 0L), ("e", 1L), ("e", 2L), ("e", 50L), ("e", 51L), ("e", 200L),
      ("f", 10L), ("f", 25L)).toDF("entity_id", "ts")
    val out = Sessionize.withSessionId(df, "entity_id", "ts", gap = 10L)
      .orderBy($"entity_id", $"ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("e", 0L, 0L), ("e", 1L, 0L), ("e", 2L, 0L),
      ("e", 50L, 1L), ("e", 51L, 1L), ("e", 200L, 2L),
      ("f", 10L, 0L), ("f", 25L, 1L)))
  }

  test("gap boundary: delta == gap stays in the same session") {
    val df = Seq(("e", 0L), ("e", 10L), ("e", 21L)).toDF("entity_id", "ts")
    val out = Sessionize.withSessionId(df, "entity_id", "ts", gap = 10L)
      .orderBy($"ts").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(0L, 0L, 1L))
  }

  test("backfill carries last non-null forward but never across a gap") {
    val df = Seq(
      ("e", 0L, Some(1.0)), ("e", 1L, None), ("e", 2L, None),
      ("e", 50L, Some(5.0)), ("e", 51L, None),
      ("e", 200L, None) // new session with no value: stays null
    ).toDF("entity_id", "ts", "value")
    val out = Sessionize.backfillWithinSession(
      Sessionize.withSessionId(df, "entity_id", "ts", gap = 10L),
      "entity_id", "ts", "value")
      .orderBy($"ts")
      .collect().map(r => if (r.isNullAt(r.fieldIndex("value_filled"))) None
        else Some(r.getDouble(r.fieldIndex("value_filled"))))
    assert(out.toSeq == Seq(Some(1.0), Some(1.0), Some(1.0),
      Some(5.0), Some(5.0), None))
  }
}
