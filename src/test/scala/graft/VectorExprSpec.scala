package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Native DotProductExpr vs the higher-order aggregate(zip_with) form:
  * bit-identical results (same widen-then-multiply, ascending fold),
  * NULL on length mismatch / null element, float and double inputs. */
class VectorExprSpec extends SparkSpec {

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("dot == HOF fold bitwise on float arrays (codegen path)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), Vectors.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
    val bad = df.where(col("native") =!= col("hof")).count()
    assert(bad == 0, s"$bad rows differ bitwise")
    assert(df.where(col("native").isNull).count() == 0)
  }

  test("l2DistSq == HOF fold bitwise; NULL on mismatch") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    def hofD2(a: org.apache.spark.sql.Column,
              b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), Vectors.l2DistSq(col("a"), col("b")).as("native"),
        hofD2(col("a"), col("b")).as("hof"))
    assert(df.where(col("native") =!= col("hof")).count() == 0,
      "native l2 differs bitwise from the HOF fold")
    // float inputs widen per element, like dot
    val fdf = Seq((Array(1.0f, 2.0f), Array(3.0f, 0.5f))).toDF("a", "b")
    assertClose(fdf.select(Vectors.l2DistSq(col("a"), col("b")))
      .head().getDouble(0), 4.0 + 2.25, "float l2")
    val mdf = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(mdf.select(Vectors.l2DistSq(col("a"), col("b")))
      .head().isNullAt(0), "length mismatch must be NULL")
  }

  test("dot handles double arrays and float x double mixes") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0)))
      .toDF("f", "d")
    val got = df.select(
      Vectors.dot(col("f"), col("d")).as("fd"),
      Vectors.dot(col("d"), col("d")).as("dd"))
      .head()
    assertClose(got.getDouble(0), 1.0 * 0.5 - 2.0 + 6.0, "float x double")
    assertClose(got.getDouble(1), 0.25 + 1.0 + 4.0, "double x double")
  }

  test("dot is NULL on length mismatch and on null elements") {
    val df = Seq(
      (1, Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](1.0f)),
      (2, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), Vectors.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1 -> true, 2 -> true))
  }
}
