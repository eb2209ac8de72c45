package graft.curation

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus screening for training-data curation: benchmark-contamination
  * detection and PII scrubbing.
  *
  * Contamination: a training document sharing a large fraction of its
  * k-shingles with an evaluation benchmark leaks the benchmark into
  * training. The screen reuses the dedup shingle machinery — the
  * benchmark's distinct shingle set is small and broadcasts, the corpus
  * side stays a scan + one groupBy, so the whole check is
  * O(corpus shingles) with no corpus-side self-join. Flagging is integer
  * arithmetic (`n_hit · denom ≥ n · num`), no float thresholds.
  *
  * PII scrub: conservative email and IPv4 patterns (no lookarounds, no
  * backreferences — the subset where Java regex and RE2 agree), applied
  * as codegen'd `regexp_replace` column algebra at scan speed.
  */
object Screening {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Replace emails with `<EMAIL>` and IPv4 literals with `<IP>`. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  /** Within-document repetition (the Gopher-style boilerplate signal):
    * per doc, total k-shingle occurrences and the count of the most
    * repeated shingle — `max_rep / n_shingles` is the repeated-fraction
    * heuristic, but both are returned as exact integers so callers (and
    * the oracle) threshold without floats. Two partial-aggregating
    * groupBys over the exploded shingle stream; nothing shuffles wider
    * than (doc, shingle, count). */
  def repetition(df: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(lower(col(textCol)))
    val sh = expr(
      s"""transform(sequence(0, size(__toks) - $k),
         |  i -> concat_ws(' ', slice(__toks, i + 1, $k)))""".stripMargin)
    df.select(col(idCol).as("id"), toks.as("__toks"))
      .where(size(col("__toks")) >= k)
      .select(col("id"), explode(sh).as("sh"))
      .groupBy(col("id"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).cast("long").as("n_shingles"),
        max(col("c")).cast("long").as("max_rep"))
  }

  /** Per-corpus-document shingle overlap against the benchmark:
    * (id, n_shingles, n_hit). Callers flag with an integer threshold,
    * e.g. `n_hit * 2 >= n_shingles` for ≥ 50 % overlap. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bs = Dedup.shingles(benchmark, k, idCol, textCol)
      .select(col("sh")).distinct()
    val cs = Dedup.shingles(corpus, k, idCol, textCol)
    val tot = cs.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    val hits = cs.join(broadcast(bs), "sh")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hit"))
    tot.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
  }
}
