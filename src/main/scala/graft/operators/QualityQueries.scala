package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based corpus quality selection — the three public filtering shapes
  * every large pretraining pipeline runs between crawl and tokenizer, built
  * integer-exact so the DuckDB oracle hash-matches bit for bit:
  *
  *  - q204: reference-LM scoring (CCNet, Wenzek et al. 2020 — train a LM on
  *    a trusted corpus, score every document, keep the low-perplexity head).
  *  - q205: hashed-n-gram importance resampling (DSIR, Xie et al. 2023 —
  *    weight documents by a target/raw log-likelihood ratio over hashed
  *    features, resample the top of the weighted distribution).
  *  - q203: the Gopher rule battery (Rae et al. 2021 — per-document
  *    structural quality rules applied before any model-based filter).
  *  - q206: bigram LM with stupid backoff (Brants et al. 2007 — the step
  *    from unigram toward CCNet's real n-gram scorer; alpha = 0.5 is
  *    exactly +1 bit in floor-log2 space, keeping backoff integer-exact).
  *
  * Log-space perplexities are IEEE-double territory (Spark's Math.log and
  * DuckDB's libm log differ in ulps, and a hash gate amplifies one ulp into
  * a mismatch), so both q204 and q205 quantize the log to FLOOR-LOG2 BITS
  * computed exactly in both engines as length(bin(x)) - 1 over integer
  * ratios — coarse (whole bits per word TYPE), but deterministic, ordered,
  * and scale-independent. The real-valued refinement is a one-line swap
  * (log2 of the same rational) that no longer hash-gates.
  */
object QualityQueries {

  /** floor(log2(x)) for x >= 1, engine-exact: the bit length of x minus 1.
    * DuckDB mirror: len(bin(x)) - 1. */
  private def ilog2(c: Column): Column = (length(bin(c)) - lit(1)).cast("long")

  /** q25's tokenization convention: single-space split of trimmed text
    * (the fixture is single-spaced; both engines split identically). */
  private def toks(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(col("doc_id"), col("lang"), col("source"),
      explode(split(trim(col("text")), " ")).as("w"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Reference-LM surprisal scoring (CCNet shape): an add-one-smoothed
    // unigram LM trained on the English slice scores every document in
    // bits/token; per-language stats + a fixed-threshold flag count give
    // the keep/drop split a CCNet-style head filter would apply.
    //   surprisal(w) = floor(log2((N + V) div (cnt(w) + 1)))  [whole bits]
    // Scale shape: the model build is ONE token-stream groupBy(w) with
    // map-side combine collapsing to vocab size (lexicon-bounded, so the
    // scored join BROADCASTS the model — no token-stream shuffle there);
    // scoring is then one groupBy(doc_id) whose partial agg pre-sums
    // surprisal within each scan partition, and the per-language rollup
    // aggregates 1 row per doc. No shuffle ever carries the token stream
    // keyed by anything but doc_id, and that one is partial-aggregated.
    "q204_lm_surprisal" -> ((s, d) => {
      val tk = toks(s, d)
      val model = tk.where(col("lang") === "en")
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // N (reference token count) and V (vocab size) fall out of the
      // vocab-sized model frame — no second pass over the token stream.
      // coalesce: with an empty reference slice SUM is NULL but the
      // oracle's COUNT-based n is 0 — both sides must see (0, 0)
      val st = model.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"),
        count(lit(1)).as("v"))
      val scored = tk
        .join(broadcast(model), Seq("w"), "left")
        .crossJoin(broadcast(st))
        .select(col("doc_id"), col("lang"),
          ilog2(expr("(n + v) div (coalesce(cnt, 0) + 1)")).as("sbits"))
      val perDoc = scored.groupBy(col("doc_id"))
        .agg(max(col("lang")).as("lang"),
          expr("sum(sbits) * 1000 div count(*)").as("mb"))
      perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(mb) div count(*)").as("avg_millibits"),
          min(col("mb")).as("min_millibits"),
          max(col("mb")).as("max_millibits"),
          sum(when(col("mb") >= 4500, 1L).otherwise(0L)).as("n_flagged"))
        .orderBy(col("lang"))
    }),

    // DSIR importance resampling: hashed unigram features (16 buckets —
    // the first md5 hex nibble, a hash both engines compute identically),
    // per-bucket importance weight = the floor-log2 bits of the smoothed
    // target/raw probability ratio, per-document weight = the sum of its
    // tokens' bucket weights (DSIR's log-likelihood ratio under the
    // hashed bag-of-words model), then a deterministic top-100 resample
    // by (weight, doc_id). The target slice is source = 'src0' standing
    // in for the trusted domain. Scale shape: both distribution builds
    // are token-stream groupBys onto 16 rows (map-side combine does all
    // the work); the 16-row weight table broadcasts into the scoring
    // join; per-doc weights partial-aggregate on doc_id; the top-100 is
    // TakeOrdered (per-partition heaps + driver merge of 100-row heads),
    // never a global sort.
    "q205_dsir_resample" -> ((s, d) => {
      val tk = toks(s, d).select(col("doc_id"), col("source"),
        substring(md5(col("w")), 1, 1).as("b"))
      // ONE token-stream pass builds BOTH distributions (per-bucket raw
      // count + conditional target count, map-side combine onto 16 rows);
      // the corpus totals then derive from the 16-row frame instead of a
      // third and fourth corpus scan — the scoring join below is the only
      // other pass over the tokens.
      val dist = tk.groupBy(col("b")).agg(count(lit(1)).as("rc"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("tc"))
      val st = dist.agg(sum(col("rc")).as("rn"), sum(col("tc")).as("tn"))
      val wt = dist.crossJoin(broadcast(st))
        .select(col("b"),
          (ilog2(expr("(tc + 1) * (rn + 16)")) -
            ilog2(expr("(rc + 1) * (tn + 16)"))).as("wbits"))
      val perDoc = tk.join(broadcast(wt), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(max(col("source")).as("source"), sum(col("wbits")).as("dwt"))
      val sel = perDoc.orderBy(col("dwt").desc, col("doc_id")).limit(100)
      sel.groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"), sum(col("dwt")).as("sum_weight"))
        .orderBy(col("source"))
    }),

    // Bigram LM with stupid backoff (the step from q204's unigram toward
    // CCNet's real n-gram scorer): p(b|a) from the reference bigram
    // counts where the bigram was seen, else back off to the smoothed
    // unigram p(b) with a fixed penalty. Stupid backoff's alpha = 0.5 is
    // EXACTLY +1 bit in floor-log2 space, so the whole scorer stays
    // integer-exact:
    //   seen:    floor(log2((cu(a) + V) div cb(a,b)))
    //   backoff: floor(log2((N + V) div (cu(b) + 1))) + 1
    // Bigrams come from per-row array algebra (no positional self-join —
    // the token list pairs with itself map-side), the two count tables
    // are vocab-/vocab²-bounded and broadcast into the scoring pass, and
    // per-doc scores partial-aggregate on doc_id exactly like q204. The
    // short-doc guard keeps sequence() ascending (the q178 hazard class).
    "q206_bigram_backoff" -> ((s, d) => {
      val bi = T.documents(s, d)
        .select(col("doc_id"), col("lang"),
          split(trim(col("text")), " ").as("ws"))
        .select(col("doc_id"), col("lang"),
          explode(when(size(col("ws")) >= 2,
            expr("transform(sequence(2, size(ws)), i -> " +
              "struct(element_at(ws, i - 1) AS a, element_at(ws, i) AS b))"))
            .otherwise(expr("CAST(array() AS " +
              "ARRAY<STRUCT<a: STRING, b: STRING>>)"))).as("g"))
        .select(col("doc_id"), col("lang"), col("g.a"), col("g.b"))
      val ref = bi.where(col("lang") === "en")
      val biModel = ref.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cb"))
      val uniModel = toks(s, d).where(col("lang") === "en")
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      // coalesce: empty 'en' slice ⇒ SUM NULL vs the oracle's 0 (q204)
      val st = uniModel.agg(coalesce(sum(col("cu")), lit(0L)).as("n"),
        count(lit(1)).as("v"))
      val scored = bi
        .join(broadcast(biModel), Seq("a", "b"), "left")
        .join(broadcast(uniModel.select(col("w").as("a"),
          col("cu").as("cu_a"))), Seq("a"), "left")
        .join(broadcast(uniModel.select(col("w").as("b"),
          col("cu").as("cu_b"))), Seq("b"), "left")
        .crossJoin(broadcast(st))
        .select(col("doc_id"), col("lang"),
          when(col("cb").isNotNull,
            ilog2(expr("(cu_a + v) div cb")))
            .otherwise(ilog2(expr("(n + v) div (coalesce(cu_b, 0) + 1)")) +
              lit(1L)).as("sbits"),
          col("cb").isNull.cast("long").as("backoff"))
      val perDoc = scored.groupBy(col("doc_id"))
        .agg(max(col("lang")).as("lang"),
          expr("sum(sbits) * 1000 div count(*)").as("mb"),
          sum(col("backoff")).as("nbk"), count(lit(1)).as("nbi"))
      perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(mb) div count(*)").as("avg_millibits"),
          min(col("mb")).as("min_millibits"),
          max(col("mb")).as("max_millibits"),
          expr("sum(nbk) * 1000 div sum(nbi)").as("backoff_permille"))
        .orderBy(col("lang"))
    }),

    // The training-data pipeline end-to-end in ONE query: ingest → exact
    // dedup (canonical-whitespace md5, min-id survivor — q29's rule) →
    // structural quality screen (q203's word-count rule) → GPT-style
    // concat-and-chunk packing (all surviving tokens concatenated and cut
    // into 2048-token blocks, so the sequence count is exactly
    // ceil(tokens/2048) — no per-doc window, no first-fit state). One
    // accounting row out: the funnel a pipeline report prints after every
    // run. Scale: one groupBy on the 16-byte fingerprint (min-id partial
    // agg), one id semi-join back for survivor texts, then pure
    // aggregates — nothing wider than (id, fp) ever shuffles.
    "q208_pipeline_e2e" -> ((s, d) => {
      val docs = T.documents(s, d)
      val canon = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      val survivors = docs.select(canon.as("fp"), col("doc_id"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      val s1 = docs.join(survivors.select(col("doc_id")), "doc_id")
        .select(col("doc_id"),
          size(split(trim(col("text")), " ")).cast("long").as("nw"))
      val kept = s1.where(col("nw") >= 50 && col("nw") <= 100000)
      val tot = docs.agg(count(lit(1)).as("n_ingested"))
      val st1 = s1.agg(count(lit(1)).as("n_exact_survivors"))
      val st2 = kept.agg(count(lit(1)).as("n_after_rules"),
        sum(col("nw")).as("total_tokens"))
      tot.crossJoin(broadcast(st1)).crossJoin(broadcast(st2))
        .select(col("n_ingested"), col("n_exact_survivors"),
          col("n_after_rules"), col("total_tokens"),
          expr("(total_tokens + 2047) div 2048").as("n_sequences"))
    }),

    // Gopher structural quality rules: word count in [50, 100000], mean
    // word length in [3, 10], >= 90% of words starting alphabetic,
    // >= 2 stopwords, and a distinct-word ratio above 30% (the paper's
    // repetition screen, type-level form). All five rules are per-row
    // array algebra on the document's own token list — zero joins, zero
    // shuffles until the single global count — and all thresholds are
    // cross-multiplied integer comparisons (3*nw <= sumlen, never a
    // double ratio), so the oracle is exact. One row out: per-rule
    // failure counts + the pass-everything count a pipeline would keep.
    "q203_gopher_rules" -> ((s, d) => {
      val m = T.documents(s, d)
        .select(split(trim(col("text")), " ").as("ws"))
        .select(size(col("ws")).cast("long").as("nw"),
          expr("aggregate(ws, CAST(0 AS BIGINT), (a, x) -> a + length(x))")
            .as("sumlen"),
          expr("CAST(size(filter(ws, x -> x rlike '^[a-z]')) AS BIGINT)")
            .as("nalpha"),
          expr("CAST(size(filter(ws, x -> array_contains(" +
            "array('the', 'a', 'of', 'and', 'to', 'in', 'is'), x))) " +
            "AS BIGINT)").as("nstop"),
          size(array_distinct(col("ws"))).cast("long").as("nd"))
      m.agg(count(lit(1)).as("n_docs"),
        sum(when(col("nw") < 50 || col("nw") > 100000, 1L).otherwise(0L))
          .as("fail_word_count"),
        sum(when(col("sumlen") < lit(3) * col("nw") ||
            col("sumlen") > lit(10) * col("nw"), 1L).otherwise(0L))
          .as("fail_mean_word_len"),
        sum(when(lit(10) * col("nalpha") < lit(9) * col("nw"), 1L)
          .otherwise(0L)).as("fail_alpha_ratio"),
        sum(when(col("nstop") < 2, 1L).otherwise(0L)).as("fail_stopwords"),
        sum(when(lit(10) * col("nd") < lit(3) * col("nw"), 1L).otherwise(0L))
          .as("fail_repetition"),
        sum(when(
          col("nw") >= 50 && col("nw") <= 100000 &&
            col("sumlen") >= lit(3) * col("nw") &&
            col("sumlen") <= lit(10) * col("nw") &&
            lit(10) * col("nalpha") >= lit(9) * col("nw") &&
            col("nstop") >= 2 &&
            lit(10) * col("nd") >= lit(3) * col("nw"), 1L).otherwise(0L))
          .as("n_pass_all"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q204_lm_surprisal" ->
      """WITH raw AS (
        |  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS w
        |  FROM documents),
        |ref AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |  FROM raw WHERE lang = 'en' GROUP BY w),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(DISTINCT w) AS BIGINT) AS v
        |  FROM raw WHERE lang = 'en'),
        |scored AS (
        |  SELECT t.doc_id, t.lang,
        |    CAST(len(bin((st.n + st.v) // (COALESCE(r.cnt, 0) + 1))) - 1
        |      AS BIGINT) AS sbits
        |  FROM raw t CROSS JOIN st LEFT JOIN ref r USING (w)),
        |per_doc AS (
        |  SELECT doc_id, max(lang) AS lang,
        |    CAST(SUM(sbits) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT)
        |      AS mb
        |  FROM scored GROUP BY doc_id)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(mb) // count(*) AS BIGINT) AS avg_millibits,
        |  CAST(MIN(mb) AS BIGINT) AS min_millibits,
        |  CAST(MAX(mb) AS BIGINT) AS max_millibits,
        |  CAST(SUM(CASE WHEN mb >= 4500 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged
        |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin,

    "q205_dsir_resample" ->
      """WITH raw AS (
        |  SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS w
        |  FROM documents),
        |tk AS (SELECT doc_id, source, substr(md5(w), 1, 1) AS b FROM raw),
        |tgt AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS tc
        |  FROM tk WHERE source = 'src0' GROUP BY b),
        |alls AS (SELECT b, CAST(count(*) AS BIGINT) AS rc FROM tk GROUP BY b),
        |st AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tn,
        |    CAST(count(*) AS BIGINT) AS rn
        |  FROM tk),
        |wt AS (
        |  SELECT a.b,
        |    CAST(len(bin((COALESCE(t.tc, 0) + 1) * (st.rn + 16))) -
        |         len(bin((a.rc + 1) * (st.tn + 16))) AS BIGINT) AS wbits
        |  FROM alls a LEFT JOIN tgt t USING (b) CROSS JOIN st),
        |per_doc AS (
        |  SELECT t.doc_id, max(t.source) AS source,
        |    CAST(SUM(w.wbits) AS BIGINT) AS dwt
        |  FROM tk t JOIN wt w USING (b) GROUP BY t.doc_id),
        |sel AS (
        |  SELECT * FROM per_doc ORDER BY dwt DESC, doc_id LIMIT 100)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_selected,
        |  CAST(SUM(dwt) AS BIGINT) AS sum_weight
        |FROM sel GROUP BY source ORDER BY source""".stripMargin,

    "q208_pipeline_e2e" ->
      """WITH surv AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT doc_id,
        |          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |            AS fp
        |        FROM documents)
        |  GROUP BY fp),
        |s1 AS (
        |  SELECT d.doc_id,
        |    CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS nw
        |  FROM documents d JOIN surv USING (doc_id)),
        |kept AS (SELECT * FROM s1 WHERE nw >= 50 AND nw <= 100000)
        |SELECT
        |  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_ingested,
        |  CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_exact_survivors,
        |  CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_after_rules,
        |  CAST((SELECT SUM(nw) FROM kept) AS BIGINT) AS total_tokens,
        |  CAST(((SELECT SUM(nw) FROM kept) + 2047) // 2048 AS BIGINT)
        |    AS n_sequences""".stripMargin,

    "q206_bigram_backoff" ->
      """WITH raw AS (
        |  SELECT doc_id, lang, string_split(trim(text), ' ') AS ws
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, lang, ws[i - 1] AS a, ws[i] AS b
        |  FROM raw, UNNEST(generate_series(2, len(ws))) AS t(i)),
        |toks AS (
        |  SELECT lang, unnest(ws) AS w FROM raw),
        |bim AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS cb
        |  FROM bi WHERE lang = 'en' GROUP BY a, b),
        |unim AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cu
        |  FROM toks WHERE lang = 'en' GROUP BY w),
        |st AS (
        |  SELECT CAST(SUM(cu) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS v FROM unim),
        |scored AS (
        |  SELECT g.doc_id, g.lang,
        |    CASE WHEN m.cb IS NOT NULL THEN
        |      len(bin((ua.cu + st.v) // m.cb)) - 1
        |    ELSE
        |      len(bin((st.n + st.v) // (COALESCE(ub.cu, 0) + 1))) - 1 + 1
        |    END AS sbits,
        |    CASE WHEN m.cb IS NULL THEN 1 ELSE 0 END AS backoff
        |  FROM bi g
        |  LEFT JOIN bim m ON g.a = m.a AND g.b = m.b
        |  LEFT JOIN unim ua ON g.a = ua.w
        |  LEFT JOIN unim ub ON g.b = ub.w
        |  CROSS JOIN st),
        |per_doc AS (
        |  SELECT doc_id, max(lang) AS lang,
        |    CAST(SUM(sbits) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT)
        |      AS mb,
        |    CAST(SUM(backoff) AS BIGINT) AS nbk,
        |    CAST(count(*) AS BIGINT) AS nbi
        |  FROM scored GROUP BY doc_id)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(mb) // count(*) AS BIGINT) AS avg_millibits,
        |  CAST(MIN(mb) AS BIGINT) AS min_millibits,
        |  CAST(MAX(mb) AS BIGINT) AS max_millibits,
        |  CAST(SUM(nbk) * 1000 // SUM(nbi) AS BIGINT) AS backoff_permille
        |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin,

    "q203_gopher_rules" ->
      """WITH d AS (
        |  SELECT string_split(trim(text), ' ') AS ws FROM documents),
        |m AS (
        |  SELECT CAST(len(ws) AS BIGINT) AS nw,
        |    CAST(list_sum(list_transform(ws, x -> len(x))) AS BIGINT)
        |      AS sumlen,
        |    CAST(len(list_filter(ws, x -> regexp_matches(x, '^[a-z]')))
        |      AS BIGINT) AS nalpha,
        |    CAST(len(list_filter(ws, x -> list_contains(
        |      ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x))) AS BIGINT)
        |      AS nstop,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS nd
        |  FROM d)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN nw < 50 OR nw > 100000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS fail_word_count,
        |  CAST(SUM(CASE WHEN sumlen < 3 * nw OR sumlen > 10 * nw
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
        |  CAST(SUM(CASE WHEN 10 * nalpha < 9 * nw THEN 1 ELSE 0 END)
        |    AS BIGINT) AS fail_alpha_ratio,
        |  CAST(SUM(CASE WHEN nstop < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS fail_stopwords,
        |  CAST(SUM(CASE WHEN 10 * nd < 3 * nw THEN 1 ELSE 0 END) AS BIGINT)
        |    AS fail_repetition,
        |  CAST(SUM(CASE WHEN nw >= 50 AND nw <= 100000
        |    AND sumlen >= 3 * nw AND sumlen <= 10 * nw
        |    AND 10 * nalpha >= 9 * nw AND nstop >= 2
        |    AND 10 * nd >= 3 * nw THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pass_all
        |FROM m""".stripMargin
  )
}
