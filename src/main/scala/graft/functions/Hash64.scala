package graft.functions

import graft.core.TokenGen
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit integer hashing for the dedup battery (round-5 rework of the
  * md5-hex-string scheme): signatures, band keys and shingle ids are
  * signed BIGINTs instead of 32-char hex strings, cutting the battery's
  * dominant shuffle width ~4× while staying bit-replayable in DuckDB —
  * the base hash is the big-endian first 16 hex chars of md5 (DuckDB:
  * `('0x' || substr(md5(x),1,16))::UBIGINT`), and the per-plane
  * rehashes are the splitmix64 finalizer (public domain, Steele et al.
  * 2014 — same constants as [[graft.core.TokenGen.mix]]), which the
  * oracles replay in HUGEINT arithmetic via [[graft.queries.SqlGen.mixCols]].
  */
object Hash64 {

  /** Signed-long view of the first 64 bits of md5(c) (big-endian hex):
    * two 32-bit `conv` parses composed with shift/or — `conv` of the
    * full 16 chars would render unsigned decimals above Long range.
    * Catalyst CSEs the duplicated md5. */
  def md5_64(c: Column): Column = {
    val m = md5(c)
    val hi = conv(substring(m, 1, 8), 16, 10).cast(LongType)
    val lo = conv(substring(m, 9, 8), 16, 10).cast(LongType)
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Codegen'd splitmix64 finalizer over a LongType column. Java long
    * arithmetic wraps mod 2^64 regardless of ANSI mode — a `Column`
    * multiply would overflow-throw under ANSI SQL, so this tiny native
    * expression is both the fast path and the correct one. */
  def smix(c: Column): Column =
    GraftBridge.column(Smix64Expr(GraftBridge.expression(c)))

  /** smix(x XOR mix(plane)) — the per-plane rehash family used by the
    * MinHash signatures; `mix(plane)` is a compile-time literal. */
  def planeHash(c: Column, plane: Int): Column =
    smix(c.bitwiseXOR(lit(TokenGen.mix(plane.toLong))))

  /** The unsigned decimal rendering of mix(plane) for DuckDB literals. */
  def planeSeedU(plane: Int): BigInt =
    BigInt(TokenGen.mix(plane.toLong)) & BigInt("FFFFFFFFFFFFFFFF", 16)
}

/** splitmix64 finalizer as a native unary expression (wrapping Long
  * arithmetic; whole-stage-codegen'd). */
case class Smix64Expr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"smix64 needs BIGINT, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TokenGen.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val fn = ctx.freshName("smix64")
    val fnName = ctx.addNewFunction(fn,
      s"""
         |private long $fn(long z0) {
         |  long z = z0 + 0x9e3779b97f4a7c15L;
         |  z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |  z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL;
         |  return z ^ (z >>> 31);
         |}
       """.stripMargin)
    defineCodeGen(ctx, ev, c => s"$fnName($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Smix64Expr = copy(child = newChild)
}
