package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-training step of a corpus pipeline, as k deterministic
  * merge rounds over a WORD-FREQUENCY table.
  *
  * Scale shape: the only corpus-scale stage is the word-frequency
  * aggregation the caller supplies (one shuffle, map-side combinable).
  * Every round after that operates on the VOCAB table — bounded by
  * distinct words, not corpus size — so k rounds are k cheap jobs:
  * a pair-count agg (exact BIGINT, tf-weighted), a top-1
  * (TakeOrdered, no full sort), and a map-only rewrite with the 1-row
  * winner BROADCAST onto the vocab (no driver collect). Per-round
  * `localCheckpoint` keeps the loop's lineage flat (k is a parameter).
  *
  * Greedy left-to-right non-overlapping merging — the BPE rule — is
  * implemented as a string `replace` over a delimiter-wrapped symbol
  * encoding: symbols render as `|s|` concatenated (`|a||b||c|`), the
  * winning pair (a,b) replaces `|a||b|` with `|ab|`. Both engines'
  * replace() scans left-to-right and continues AFTER each replacement,
  * which reproduces greedy BPE exactly, including the overlapping-run
  * case (`aaa` under pair (a,a) → `aa`,`a`); the double delimiter
  * keeps a match from ever splitting a symbol (`xa|b` cannot match
  * `|a||b|`). Symbols never contain `|` (words come from
  * whitespace-split text; merged symbols concatenate them).
  */
object Bpe {

  /** syms array from the wrapped encoding (strip outer pipes, split on
    * the double delimiter). */
  private def symsOf(str: Column): Column =
    split(str.substr(lit(2), length(str) - 2), "\\|\\|")

  /** tf-weighted adjacent-pair counts of a (tf, syms) vocab table. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.where(size(col("syms")) >= 2)
      .select(col("tf"), explode(transform(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        (s, i) => struct(s.as("a"),
          element_at(col("syms"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("tf")).as("cnt"))

  /** The k training rounds: per-round winner rows and the final
    * merged-symbol vocab. */
  private def train(wf: DataFrame, k: Int)
  : (Seq[DataFrame], DataFrame) = {
    val chars = filter(split(col("w"), ""), s => length(s) > 0)
    var vocab = wf.select(col("w"), col("tf"),
      concat(lit("|"), array_join(chars, "||"), lit("|")).as("str"),
      chars.as("syms"))
      .localCheckpoint(true)
    val rounds = (1 to k).map { r =>
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .localCheckpoint(true)
      val rewritten = vocab.crossJoin(broadcast(best))
        .withColumn("str", replace(col("str"),
          concat(lit("|"), col("a"), lit("||"), col("b"), lit("|")),
          concat(lit("|"), col("a"), col("b"), lit("|"))))
      vocab = rewritten
        .select(col("w"), col("tf"), col("str"), symsOf(col("str")).as("syms"))
        .localCheckpoint(true)
      best.select(lit(r).as("round"), col("a"), col("b"), col("cnt"),
        concat(col("a"), col("b")).as("merged"))
    }
    (rounds, vocab)
  }

  /** Runs `k` merge rounds over a word-frequency table `wf(w, tf)`.
    * Returns one row per round: (round, a, b, cnt, merged) — the
    * winning pair (tie → smallest (a, b) at max count) and its
    * tf-weighted corpus count at merge time. */
  def mergeRounds(wf: DataFrame, k: Int): DataFrame =
    train(wf, k)._1.reduce(_.union(_)).orderBy(col("round"))

  /** The trained vocab after `k` rounds: (w, tf, syms) — the table a
    * tokenizer-APPLICATION pass joins against (vocab-sized, so the
    * join broadcasts; the corpus side never re-tokenizes a word). */
  def trainedVocab(wf: DataFrame, k: Int): DataFrame =
    train(wf, k)._2.select(col("w"), col("tf"), col("syms"))
}
