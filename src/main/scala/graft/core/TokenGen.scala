package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A row of the north-rule input table (BASELINE.json `input_hint`):
  * an Iceberg/Parquet table of pre-tokenized training sequences. */
final case class TokenDoc(doc_id: String, tokens: Array[Int],
                          n_tok: Int, source: String)

/** One exploded sequence point — the engine-internal long-format contract
  * (FIXTURES.md §2): `posexplode(tokens)` with value = token as double. */
final case class SeqPoint(entity_id: String, ts: Long, value: Double,
                          source: String)

/** Deterministic synthetic tokens-table generator (FIXTURES.md §1).
  *
  * No external data: every cell is a pure function of (seed, docIndex,
  * pos) through the splitmix64 finalizer, so the identical table can be
  * regenerated in numpy (tools/gen_fixtures.py) for golden fixtures, in
  * tests, and at any scale for the bench — bit-for-bit.
  *
  * Scale posture: built from `spark.range(nDocs)` → `map`, i.e. generated
  * IN PARALLEL on executors with zero shuffle and zero driver memory; at
  * 10^12 sequences this is exactly how a synthetic load would be laid
  * down (one task per range slice, each writing its own files).
  */
object TokenGen {

  final val Vocab = 50257
  final val MinTok = 64
  final val TokSpan = 1985 // n_tok in [64, 64+1985) = [64, 2049)
  final val Seed = 42L

  /** splitmix64 finalizer (public-domain PRNG mix; Steele et al. 2014). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hash2(seed: Long, a: Long): Long = mix(seed ^ mix(a))
  def hash3(seed: Long, a: Long, b: Long): Long =
    mix(mix(seed ^ mix(a)) ^ mix(b))

  /** Unsigned mod — matches numpy uint64 `%` (signed floorMod would not). */
  private def umod(x: Long, m: Long): Long =
    java.lang.Long.remainderUnsigned(x, m)

  def nTok(docIndex: Long, skewed: Boolean): Int = {
    val base = MinTok + umod(hash2(Seed, docIndex), TokSpan).toInt
    // Skew knob: 1% of docs are 32x longer — exercises AQE skew handling.
    if (skewed && umod(hash2(99L, docIndex), 100L) == 0L) base * 32
    else base
  }

  def token(docIndex: Long, pos: Long): Int =
    umod(hash3(Seed, docIndex, pos) >>> 33, Vocab).toInt

  /** Zipf(1..4)-weighted source label: web .48, chat .24, code .16, wiki .12. */
  def source(docIndex: Long): String = {
    val r = umod(hash2(1337L, docIndex), 100L)
    if (r < 48) "web" else if (r < 72) "chat"
    else if (r < 88) "code" else "wiki"
  }

  def docId(docIndex: Long): String = f"doc_$docIndex%08d"

  /** Pure-Scala row materialization (shared by the Spark map and tests). */
  def makeDoc(i: Long, skewed: Boolean): TokenDoc = {
    val n = nTok(i, skewed)
    val toks = new Array[Int](n)
    var p = 0
    while (p < n) { toks(p) = token(i, p); p += 1 }
    TokenDoc(docId(i), toks, n, source(i))
  }

  /** The tokens table, generated distributed. */
  def docs(spark: SparkSession, nDocs: Long,
           skewed: Boolean = false,
           numPartitions: Int = 0): Dataset[TokenDoc] = {
    import spark.implicits._
    val base =
      if (numPartitions > 0) spark.range(0L, nDocs, 1L, numPartitions)
      else spark.range(nDocs)
    base.map(i => makeDoc(i, skewed))
  }

  /** Exploded long-format view: one row per (doc, position) with ts = pos.
    * This is the tokens→SeqPoint contract every windowed/as-of operator
    * consumes (FIXTURES.md §2). */
  def points(docs: Dataset[TokenDoc]): DataFrame =
    docs.select(col("doc_id").as("entity_id"),
      posexplode(col("tokens")).as(Seq("ts", "tok")),
      col("source"))
      .select(col("entity_id"), col("ts").cast("long").as("ts"),
        col("tok").cast("double").as("value"), col("source"))
}
