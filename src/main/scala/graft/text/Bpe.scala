package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE vocabulary induction — the tokenizer-TRAINING step of an LLM data
  * pipeline (Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016): repeatedly find the most frequent adjacent
  * symbol pair over the corpus and merge it into a new symbol.
  *
  * Scale shape: the corpus is reduced ONCE to a distinct-word frequency
  * table (bounded by |vocabulary|, not corpus size — that reduction is the
  * only corpus-sized shuffle). Each round is then a pair-count aggregate
  * over the word table plus a single-row argmax collect (the same bounded
  * driver action as k-means|| centroid steps), and the merge itself is a
  * pure column fold — no UDFs, no driver-side loops over data. At 100 TB
  * the per-round working set is |vocab| rows regardless of corpus size.
  *
  * Symbol sequences travel as `§`-prefixed, `§`-joined strings
  * (`"key" → "§k§e§y"`), so "last symbol equals a" is exactly
  * `endswith(acc, "§" + a)` — a representation every engine folds the same
  * way, which is what lets the DuckDB oracle replay the full induction.
  * The argmax tie-breaks on (count DESC, a ASC, b ASC): a deterministic
  * total order, so any partitioning learns the same merges.
  */
object Bpe {

  /** One learned merge: `a`+`b` won round `round` with corpus-weighted
    * adjacent-pair frequency `pairFreq`. */
  case class Merge(round: Int, a: String, b: String, pairFreq: Long)

  private val Sep = "§"

  /** Symbol list of a `§`-prefixed seq string (drops the leading empty). */
  private def syms(seq: Column): Column =
    filter(split(seq, Sep), x => x =!= "")

  /** Greedy leftmost application of merge (a,b) — the standard BPE merge
    * order: `[b b b] → [bb b]`, `[a b a b] → [ab ab]` — as a string fold.
    * `endswith(acc, "§a")` tests the PREVIOUS symbol exactly (the `§`
    * delimiter cannot occur inside a symbol), and a just-merged symbol
    * ending in `a` does not re-match because its trailing `§` boundary is
    * consumed by the merge. */
  def applyMerge(seq: Column, a: String, b: String): Column =
    aggregate(syms(seq), lit(""),
      (acc, x) => when(acc.endsWith(Sep + a) && x === b, concat(acc, lit(b)))
        .otherwise(concat(acc, lit(Sep), x)))

  /** Distinct-word frequency table with character-level initial symbol
    * sequences: `(word, freq, seq)`. The one corpus-sized pass. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seq", regexp_replace(col("word"), "(.)", Sep + "$1"))

  /** Corpus-weighted adjacent-pair counts over the current sequences:
    * `(a, b, cnt)`. Pairs come from zipping a symbol list with its own
    * tail — single-symbol words contribute nothing (empty zip). */
  def pairCounts(words: DataFrame): DataFrame = {
    val ss = syms(col("seq"))
    val heads = slice(ss, lit(1), size(ss) - 1).as("a")
    val tails = slice(ss, lit(2), size(ss) - 1).as("b")
    words.select(col("freq"), explode(arrays_zip(heads, tails)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Run `rounds` merge rounds over `docs(textCol)`. Returns the learned
    * merges in order plus the final word table (word, freq, seq) with all
    * merges applied. Each round localCheckpoints the (vocab-sized) word
    * table so the iterative lineage stays flat — on a cluster this would
    * be a reliable checkpoint. */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()(0)
      val (a, b) = (top.getString(0), top.getString(1))
      merges += Merge(r, a, b, top.getLong(2))
      words = words.withColumn("seq", applyMerge(col("seq"), a, b))
        .localCheckpoint()
    }
    (merges.result(), words)
  }

  /** Corpus token count under the current sequences: Σ freq · |syms| —
    * an aggregate over the standard (word, freq, seq) table. */
  def tokenCount: Column =
    sum(col("freq") * size(syms(col("seq")))).cast("long")
}
