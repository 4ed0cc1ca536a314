package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline primitives (token counting, quality scoring, language ID,
  * fingerprinting, exact dedup). Everything is Catalyst `Column` expressions
  * (incl. higher-order array functions) — no UDFs, so the whole pipeline
  * stays inside WholeStageCodegen and runs embarrassingly parallel over
  * document partitions at any scale.
  *
  * Float policy: ratios are single IEEE divisions of integer-valued doubles
  * and score formulas use the identical operation order in the DuckDB
  * oracles, so results compare bitwise.
  */
object TextOps {

  private def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ", ", ")")

  /** SINGLE source of the language stopword profiles — q22's stopword ratio,
    * q23's scorer, scoredDocs (q51), and every oracle derive from this list,
    * so a profile tweak cannot silently diverge one query from another. */
  private[ops] val langProfiles = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"))
  private val stopEn = langProfiles.toMap.apply("en")

  /** Shared DuckDB formula fragments — the SINGLE source for the language
    * profiles, stat expressions, quality formula and language tie-break used
    * by the q22/q23/q51 oracles (what [[scoredDocs]] is for the Spark side):
    * a tweak to any formula lands in every oracle at once. */
  private[ops] def hitsSql(lang: String): String =
    s"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), " +
      s"x -> x IN ${inList(langProfiles.toMap.apply(lang))}))"
  private[ops] val predLangCaseSql: String =
    "CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en' " +
      "WHEN s_es >= s_de THEN 'es' ELSE 'de' END"
  private[ops] val nTokensSql: String =
    "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)"
  private[ops] val nCharsSql: String = "CAST(length(text) AS DOUBLE)"
  private[ops] val nPunctSql: String =
    "CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
  private[ops] val qualityFromStatsSql: String =
    "n_stop / n_tokens * 2.0 + " +
      "(CASE WHEN n_chars_m >= 200.0 THEN 1.0 ELSE 0.0 END) - " +
      "n_punct / n_chars_m * 4.0"

  /** Doc-level (doc_id, text, pred_lang, quality_score) — the q22/q23
    * formulas over an arbitrary documents frame, for pipelines (corpus
    * curation) that compose filtering on both. Formula parity with the
    * q22/q23 oracles is preserved exactly (same operation order). */
  private[ops] def scoredDocs(df: DataFrame): DataFrame = {
    val base = df
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
    val scored = langProfiles.foldLeft(base) { case (d, (lang, words)) =>
      d.withColumn(s"s_$lang", expr(s"size(filter(toks, x -> x IN ${inList(words)}))"))
    }
    scored
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
      .withColumn("n_chars_m", length(col("text")).cast("double"))
      .withColumn("n_tokens", expr("size(toks)").cast("double"))
      .withColumn("n_stop", col("s_en").cast("double"))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double"))
      .withColumn("quality_score",
        col("n_stop") / col("n_tokens") * lit(2.0) +
          when(col("n_chars_m") >= 200.0, 1.0).otherwise(0.0) -
          col("n_punct") / col("n_chars_m") * lit(4.0))
      .drop("toks", "s_en", "s_es", "s_de", "n_chars_m", "n_tokens", "n_stop", "n_punct")
  }

  /** Token counting: whitespace tokens and BPE-ish regex tokens (letter runs,
    * digit runs, single punctuation marks — a rough byte-pair-style
    * pre-tokenizer). */
  def q21TokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_measured"),
        expr("""size(split(trim(text), '\\s+'))""").as("n_ws_tokens"),
        expr("""size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))""")
          .as("n_bpe_tokens"))

  val q21TokenStatsSql: String = """
    SELECT doc_id,
      CAST(length(text) AS INTEGER) AS n_chars_measured,
      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens
    FROM documents
  """

  /** Adds the corpus-quality statistic columns (`n_chars_m`, `n_tokens`,
    * `n_stop`, `n_punct`) and the blended `quality_score` — shared by q22
    * (which reports the ratios) and q90 (which ranks on the score). Pure
    * per-row codegen projections; mirrors `qualityFromStatsSql`. */
  private[ops] def withQualityStats(df: DataFrame): DataFrame =
    df.withColumn("n_chars_m", length(col("text")).cast("double"))
      .withColumn("n_tokens",
        expr("""size(split(trim(text), '\\s+'))""").cast("double"))
      .withColumn("n_stop",
        expr(s"""size(filter(split(trim(text), '\\\\s+'), x -> x IN ${inList(stopEn)}))""")
          .cast("double"))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double"))
      .withColumn("quality_score",
        col("n_stop") / col("n_tokens") * lit(2.0) +
          when(col("n_chars_m") >= 200.0, 1.0).otherwise(0.0) -
          col("n_punct") / col("n_chars_m") * lit(4.0))

  /** The ONE canonical scored-documents plan the quality family derives
    * from (r17): [[withQualityStats]] over the parallelized raw table,
    * TRACKED, so that within a runner pass (Bench's "quality" shared
    * group; concurrent Verify threads) every consumer reuses a single
    * materialization of the regex/stopword kernel instead of re-running
    * it per query. Full column set on purpose: each consumer slices its
    * own projection, and those slice plans all EMBED this subtree — the
    * structural identity CacheManager substitution matches on. At 100 TB
    * this is the "score once, read the scored artifact" contract; solo
    * runs just compute it inline as before. */
  private[graft] def qualityScored(spark: SparkSession,
      sfDir: String): DataFrame =
    graft.CachedFrames.track(withQualityStats(
      Tables.parallelized(Tables(spark, sfDir, "documents"))))

  /** The canonical scored+digested projection (doc_id, dg, q) the
    * exact-dup family (q167/q176/q185/q239/q241) shares — one md5 pass
    * over [[qualityScored]]. */
  private[graft] def qualityDigested(spark: SparkSession,
      sfDir: String): DataFrame =
    graft.CachedFrames.track(qualityScored(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("dg"),
        col("quality_score").as("q")))

  /** The canonical per-digest rollup (dg, cnt, q = min score — identical
    * texts share the score, so min IS the group's score) — q167/q185
    * consume it as their digest-counts frame and q176/q239/q241's dup
    * label joins its cnt column, so ONE digest exchange serves all five. */
  private[graft] def qualityDigestCounts(spark: SparkSession,
      sfDir: String): DataFrame =
    graft.CachedFrames.track(qualityDigested(spark, sfDir)
      .groupBy(col("dg"))
      .agg(count(lit(1)).as("cnt"), min(col("q")).as("q")))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length, and a blended score — the standard pre-training corpus filters. */
  def q22QualityScore(spark: SparkSession, sfDir: String): DataFrame =
    qualityScored(spark, sfDir)
      .select(
        col("doc_id"),
        (col("n_chars_m") / col("n_tokens")).as("mean_token_span"),
        (col("n_stop") / col("n_tokens")).as("stopword_ratio"),
        (col("n_punct") / col("n_chars_m")).as("punct_ratio"),
        col("quality_score"))

  val q22QualityScoreSql: String = s"""
    WITH x AS (
      SELECT doc_id,
        $nCharsSql AS n_chars_m,
        $nTokensSql AS n_tokens,
        CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
        $nPunctSql AS n_punct
      FROM documents)
    SELECT doc_id,
      n_chars_m / n_tokens AS mean_token_span,
      n_stop / n_tokens AS stopword_ratio,
      n_punct / n_chars_m AS punct_ratio,
      $qualityFromStatsSql AS quality_score
    FROM x
  """

  /** q103: quality-threshold TRADEOFF CURVE — for each candidate cut in
    * [[QualityCutGrid]], how many documents and tokens survive `score ≥ t`,
    * absolute and as fractions. The calibration table a curation run
    * computes BEFORE fixing q51's threshold: the data between "keep 90% of
    * tokens" and "keep the top quartile" is exactly this curve. Scores are
    * q22's (single-sourced via the shared stats/formula fragments).
    *
    * Scale shape: ONE corpus scan into one 1-row aggregate — per
    * threshold, a pair of conditional map-side-combinable count/sum
    * columns — then a driver-trivial `stack` unpivots the row to
    * |grid| rows and the fractions are single divisions against the
    * same row's totals. No join, no second scan, no per-threshold pass;
    * at 100 TB this costs what one groupBy-less scan costs. */
  val QualityCutGrid: Seq[Double] = Seq(-2.0, -1.0, 0.0, 1.0, 2.0, 3.0)

  def q103QualityTradeoff(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = qualityScored(spark, sfDir)
      .select(col("quality_score").as("q"), col("n_tokens").cast("long").as("nt"))
    val perCut = QualityCutGrid.zipWithIndex.flatMap { case (t, i) =>
      Seq(count(when(col("q") >= t, lit(1))).as(s"d_$i"),
        coalesce(sum(when(col("q") >= t, col("nt"))), lit(0L)).as(s"t_$i"))
    }
    val aggCols = perCut ++ Seq(
      count(lit(1)).as("tot_docs"),
      coalesce(sum(col("nt")), lit(0L)).as("tot_tokens"))
    val row = scored.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = QualityCutGrid.zipWithIndex
      .map { case (t, i) => s"CAST($t AS DOUBLE), d_$i, t_$i" }
      .mkString(", ")
    row.select(
      expr(s"stack(${QualityCutGrid.size}, $stackArgs) AS (threshold, kept_docs, kept_tokens)"),
      col("tot_docs"), col("tot_tokens"))
      .select(col("threshold"), col("kept_docs"), col("kept_tokens"),
        (col("kept_docs").cast("double") / col("tot_docs").cast("double"))
          .as("frac_docs"),
        (col("kept_tokens").cast("double") / col("tot_tokens").cast("double"))
          .as("frac_tokens"))
  }

  val q103QualityTradeoffSql: String = {
    val grid = QualityCutGrid.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""
    WITH x AS (
      SELECT $qualityFromStatsSql AS q, CAST(n_tokens AS BIGINT) AS nt
      FROM (SELECT doc_id,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS tot_docs,
        CAST(coalesce(sum(nt), 0) AS BIGINT) AS tot_tokens FROM x),
    grid(threshold) AS (VALUES $grid)
    SELECT g.threshold,
      CAST(count(CASE WHEN x.q >= g.threshold THEN 1 END) AS BIGINT) AS kept_docs,
      CAST(coalesce(sum(CASE WHEN x.q >= g.threshold THEN x.nt END), 0) AS BIGINT)
        AS kept_tokens,
      CAST(count(CASE WHEN x.q >= g.threshold THEN 1 END) AS DOUBLE)
        / CAST(tot.tot_docs AS DOUBLE) AS frac_docs,
      CAST(coalesce(sum(CASE WHEN x.q >= g.threshold THEN x.nt END), 0) AS DOUBLE)
        / CAST(tot.tot_tokens AS DOUBLE) AS frac_tokens
    FROM grid g CROSS JOIN x CROSS JOIN tot
    GROUP BY g.threshold, tot.tot_docs, tot.tot_tokens
  """
  }

  /** Language ID via stopword-profile scoring (n-gram heuristic): count
    * profile hits per language, argmax with a fixed tie order. */
  def q23LangId(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables(spark, sfDir, "documents")
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
    val scored = langProfiles.foldLeft(base) { case (df, (lang, words)) =>
      df.withColumn(s"s_$lang",
        expr(s"size(filter(toks, x -> x IN ${inList(words)}))"))
    }
    scored.select(
      col("doc_id"), col("lang").as("tagged_lang"),
      col("s_en"), col("s_es"), col("s_de"),
      when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
        .when(col("s_es") >= col("s_de"), "es")
        .otherwise("de").as("pred_lang"))
  }

  val q23LangIdSql: String = s"""
    WITH s AS (
      SELECT doc_id, lang AS tagged_lang,
        ${hitsSql("en")} AS s_en,
        ${hitsSql("es")} AS s_es,
        ${hitsSql("de")} AS s_de
      FROM documents)
    SELECT doc_id, tagged_lang, CAST(s_en AS INTEGER) AS s_en,
      CAST(s_es AS INTEGER) AS s_es, CAST(s_de AS INTEGER) AS s_de,
      $predLangCaseSql AS pred_lang
    FROM s
  """

  /** Document fingerprinting: a polynomial rolling hash over the characters
    * (mod 1e9+7) plus an md5 content digest — both portable expressions. */
  def q24Fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        expr("""aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                          CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 1000000007)""")
          .as("rolling_hash"),
        md5(col("text")).as("content_md5"))

  val q24FingerprintSql: String = """
    SELECT doc_id,
      list_reduce(
        list_prepend(0::BIGINT,
          list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        (a, b) -> (a * 31 + b) % 1000000007) AS rolling_hash,
      md5(text) AS content_md5
    FROM documents
  """

  /** Exact near-duplicate removal: hash-groupBy on normalized content, keep
    * the smallest doc_id as canonical. At 100 TB this is one shuffle on the
    * 128-bit digest (uniform keys — no skew), with map-side partial agg. */
  def q25ExactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .groupBy(md5(lower(trim(col("text")))).as("content_key"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_copies"))

  val q25ExactDedupSql: String = """
    SELECT md5(lower(trim(text))) AS content_key,
      min(doc_id) AS canonical_doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY 1
  """

  /** Corpus vocabulary: top-50 tokens by frequency (explode → count →
    * top-k; ties broken lexically so the cut is deterministic). */
  def q43VocabTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(explode(expr("""split(trim(text), '\\s+')""")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(50)

  val q43VocabTopKSql: String = """
    SELECT token, count(*) AS freq
    FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token ASC
    LIMIT 50
  """

  /** Term weighting: per-document term frequency × inverse document
    * frequency as the exact ratio (N+1)/(df+1) — a single double division,
    * bit-identical across engines (ln() can differ in the last ulp between
    * libm implementations, so the log form is deliberately avoided in the
    * oracle-checked weight). Top-3 terms per document. */
  def q44TfDf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, sfDir, "documents")
    val tokens = docs
      .select(col("doc_id"), explode(expr("""split(trim(text), '\\s+')""")).as("token"))
    val tf = tokens.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // count(CASE WHEN tf >= 1 ...) ≡ count(*) (a group's count is ≥ 1 by
    // construction) — but the value-dependent predicate is one Catalyst can't
    // fold away (plain count(tf) gets rewritten to count(1) and the tf count
    // pruned out of this branch), so both consumers keep a canonically-equal
    // (doc_id, token) exchange subtree: AQE reuses the shuffle and the corpus
    // is scanned+exploded ONCE (pinned in PlanSpec).
    val df_ = tf.groupBy(col("token"))
      .agg(count(when(col("tf") >= 1, lit(1))).as("df"))
    val nDocs = docs.count().toDouble
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("weight").desc, col("token").asc)
    tf.join(df_, "token")
      .withColumn("weight",
        col("tf").cast("double") * (lit(nDocs + 1.0) / (col("df").cast("double") + lit(1.0))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("weight"), col("rk"))
  }

  val q44TfDfSql: String = """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    wt AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
        CAST(tf.tf AS DOUBLE) * ((n.n_docs + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)) AS weight
      FROM tf JOIN df USING (token) CROSS JOIN n),
    rk AS (
      SELECT doc_id, token, tf, df, weight,
        row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, token ASC) AS rk
      FROM wt)
    SELECT doc_id, token, tf, df, weight, CAST(rk AS INTEGER) AS rk FROM rk WHERE rk <= 3
  """

  /** Document-length histogram — 100-char buckets capped at 10 (DuckDB has
    * no width_bucket, so the bucketing is explicit floor/least arithmetic
    * identical in both engines). */
  def q45LengthHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(expr("least(CAST(floor(length(text) / 100.0) AS BIGINT), CAST(10 AS BIGINT))")
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))

  val q45LengthHistogramSql: String = """
    SELECT least(CAST(floor(length(text) / 100.0) AS BIGINT), 10::BIGINT) AS bucket,
      count(*) AS n
    FROM documents
    GROUP BY 1
  """

  /** SINGLE source of the word n-gram constructors (Spark + DuckDB forms,
    * over a `toks`/`tk` array column) — q56 and q58 both derive from these,
    * so a gram-formula tweak cannot diverge one from the other. */
  private def ngramsExpr(n: Int, distinct: Boolean): String = {
    val core =
      s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"
    if (distinct) s"array_distinct($core)" else core
  }
  private def ngramsSqlExpr(n: Int, distinct: Boolean): String = {
    val core = s"list_transform(range(len(tk) - ${n - 1}), " +
      s"i -> array_to_string(list_slice(tk, i + 1, i + $n), ' '))"
    if (distinct) s"list_distinct($core)" else core
  }

  /** q56: repeated n-gram fraction (the Gopher/C4-style repetition quality
    * filter): fraction of a document's word 3-grams that are duplicates of
    * an earlier gram in the same document. Pure codegen projection — one
    * scan, no shuffle; the ratio is a single IEEE division so the oracle
    * matches bitwise. */
  def q56Repetition(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .filter(expr("size(toks) >= 3"))
      .withColumn("grams", expr(ngramsExpr(3, distinct = false)))
      .select(col("doc_id"),
        expr("size(grams)").as("n_grams"),
        expr("size(array_distinct(grams))").as("n_distinct"),
        (lit(1.0) - expr("size(array_distinct(grams))").cast("double")
          / expr("size(grams)").cast("double")).as("rep_ratio"))

  val q56RepetitionSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    g AS (
      SELECT doc_id, ${ngramsSqlExpr(3, distinct = false)} AS grams
      FROM t WHERE len(tk) >= 3)
    SELECT doc_id, CAST(len(grams) AS INTEGER) AS n_grams,
      CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
      1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
        AS rep_ratio
    FROM g
  """

  /** q57: out-of-vocabulary rate — fraction of a document's tokens outside
    * the corpus's top-`OovVocabSize` vocabulary (a standard corpus-quality /
    * tokenizer-coverage signal). Two-level shape: the corpus vocabulary is
    * a tiny aggregate (top-k by frequency, deterministic tie-break) that
    * BROADCASTS back against the exploded token stream — the per-doc pass
    * never shuffles the corpus, only the token counts. */
  val OovVocabSize = 10

  def q57OovRate(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.parallelized(Tables(spark, sfDir, "documents"))
      .select(col("doc_id"),
        explode(expr("""split(trim(text), '\\s+')""")).as("token"))
    // top-k via orderBy+limit plans as a distributed TakeOrderedAndProject
    // (per-partition heaps, no single-partition global window); the
    // (freq desc, token asc) tie-break is total, so the k rows are unique
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(OovVocabSize)
      .select(col("token"), lit(1).as("iv"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  val q57OovRateSql: String = s"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents),
    v AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
    vocab AS (
      SELECT token FROM (
        SELECT token, row_number() OVER (ORDER BY freq DESC, token ASC) AS rk FROM v)
      WHERE rk <= $OovVocabSize)
    SELECT t.doc_id, count(*) AS n_tokens,
      CAST(sum(CASE WHEN vb.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      CAST(CAST(sum(CASE WHEN vb.token IS NULL THEN 1 ELSE 0 END) AS VARCHAR) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab vb ON t.token = vb.token
    GROUP BY t.doc_id
  """

  /** q58: benchmark decontamination — flag corpus documents sharing any
    * word `DecontamGram`-gram with a held-out benchmark set (here the
    * deterministic doc_id % 100 = 0 slice; in production, the eval suites).
    * Shape at 100 TB: benchmark gram sets are tiny next to the corpus, so
    * the overlap test is one explode + BROADCAST semi-join-with-count —
    * the corpus is scanned once and never shuffled on text. */
  val DecontamGram = 4

  def q58Decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val n = DecontamGram
    // cached: the gram frame feeds BOTH the benchmark-set branch and the
    // corpus branch — without it the scan + gram construction run twice
    val g = graft.CachedFrames.track(
      Tables.parallelized(Tables(spark, sfDir, "documents"))
        .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
        .filter(expr(s"size(toks) >= $n"))
        .select(col("doc_id"), expr(ngramsExpr(n, distinct = true)).as("grams")))
    val bench = g.filter(col("doc_id") % 100 === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    g.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  val q58DecontaminateSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    g AS (
      SELECT doc_id, ${ngramsSqlExpr(DecontamGram, distinct = true)} AS grams
      FROM t WHERE len(tk) >= $DecontamGram),
    bench AS (
      SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 100 = 0),
    corpus AS (
      SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 100 <> 0)
    SELECT c.doc_id, count(*) AS n_hits
    FROM corpus c JOIN bench b ON c.gram = b.gram
    GROUP BY c.doc_id
  """

  /** q59: greedy sequence packing — assign documents to fixed-budget
    * training sequences (`PackSeqTokens` whitespace tokens) by a running
    * token count in deterministic doc_id order WITHIN each source shard.
    * seq_id = the sequence the document starts in; offset = its token
    * position there (documents longer than the budget span sequences, the
    * standard greedy-concat approximation).
    *
    * Scale shape: the running sum is [[distributedRunningSum]]'s two-phase
    * prefix sum — range-bucketed on doc_id WITHIN each source, so a corpus
    * dominated by one source (web crawl ≫ everything else) still packs
    * [[PrefixSumBuckets]]-way parallel instead of funneling the whole
    * source through one window task. Output is byte-identical to the
    * single per-source window (same total order). */
  val PackSeqTokens = 2048

  def q59PackSequences(spark: SparkSession, sfDir: String): DataFrame =
    packSequencesOn(Tables(spark, sfDir, "documents"))

  /** The packing core over ANY (source, doc_id, text) frame —
    * fixture-testable (q245's audit composes on it). */
  private[graft] def packSequencesOn(docs: DataFrame): DataFrame = {
    val t = docs
      .withColumn("n_tokens", expr("""size(split(trim(text), '\\s+'))""").cast("long"))
    distributedRunningSum(t, "n_tokens", Seq("doc_id"), t)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr(s"(running - n_tokens) DIV $PackSeqTokens").as("seq_id"),
        ((col("running") - col("n_tokens")) % PackSeqTokens).as("offset"))
  }

  /** Range buckets per source for [[distributedRunningSum]]'s two-phase
    * prefix sum — the per-source parallelism of the running-sum stage. */
  private[graft] val PrefixSumBuckets = 32

  /** Two-phase distributed prefix sum: per-`source` running sum of `value`
    * in `orderCols` order — the same result as
    * `sum(value) OVER (PARTITION BY source ORDER BY orderCols)` but WITHOUT
    * the one-task-per-source serialization that kills a skewed corpus at
    * scale (one dominant source = terabytes through a single window task).
    *
    * Phase 0 computes per-source `doc_id` bounds from `boundsFrom` (an
    * aggregate of |sources| rows, broadcast; pass a thinner frame than `df`
    * when `df`'s lineage is expensive — bounds from a SUPERSET of `df`'s
    * (source, doc_id) pairs only shifts bucket balance, never correctness,
    * but every source in `df` MUST appear in `boundsFrom`: the bounds join
    * is inner, so an uncovered source would drop rows). Both internal joins
    * are null-safe on `source`, so a NULL source forms its own group —
    * exactly like `PARTITION BY source` — instead of vanishing through an
    * equi-join. Rows are RANGE-bucketed on
    * the leading order column: the bucket index is monotonic in `doc_id`
    * within each source, so buckets are contiguous slices of the total
    * order and the result is byte-identical to the single window. Phase 1
    * runs the running sum within `(source, _bkt)` — up to
    * [[PrefixSumBuckets]]-way parallel per source. Phase 2 reduces each
    * bucket to its last running value (`max_by` over the order key, so no
    * sign assumption on `value`) — a B·|sources|-row table whose exchange
    * REUSES phase 1's shuffle — takes the exclusive cumulative sum over
    * buckets with a driver-trivial window, and broadcasts the offsets back
    * for the final projection.
    *
    * Requires a numeric `doc_id` leading order column and `(source,
    * orderCols)` unique per row. */
  private[graft] def distributedRunningSum(df: DataFrame, value: String,
      orderCols: Seq[String], boundsFrom: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = boundsFrom.groupBy("source")
      .agg(min(col("doc_id")).as("_lo"), max(col("doc_id")).as("_hi"))
      .withColumnRenamed("source", "_bsrc")
    // _bkt is wrapped non-nullable ON PURPOSE: the final offsets join's
    // `_bkt === _obkt` would otherwise infer an `isnotnull(_bkt)` filter
    // into the LEFT branch only, making the two (source, _bkt) exchange
    // subtrees canonically unequal — AQE then re-scans and re-shuffles the
    // full corpus for the offsets branch instead of reusing phase 1's
    // shuffle (PlanSpec pins the ReusedExchange).
    val bucketed = df.join(broadcast(bounds), col("source") <=> col("_bsrc"))
      .withColumn("_bkt", coalesce(
        expr(s"(doc_id - _lo) DIV (((_hi - _lo) DIV $PrefixSumBuckets) + 1)"),
        lit(0L)))
      .drop("_bsrc", "_lo", "_hi")
    val w = Window.partitionBy(col("source"), col("_bkt"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("_local", sum(col(value)).over(w))
    val wOff = Window.partitionBy(col("source")).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("source"), col("_bkt"))
      .agg(max_by(col("_local"), struct(orderCols.map(col): _*)).as("_tot"))
      .withColumn("_off", coalesce(sum(col("_tot")).over(wOff), lit(0L)))
      .select(col("source").as("_osrc"), col("_bkt").as("_obkt"), col("_off"))
    local.join(broadcast(offsets),
        col("source") <=> col("_osrc") && col("_bkt") === col("_obkt"))
      .withColumn("running", col("_local") + col("_off"))
      .drop("_osrc", "_obkt", "_bkt", "_local", "_off")
  }

  val q59PackSequencesSql: String = s"""
    WITH t AS (
      SELECT source, doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents),
    r AS (
      SELECT source, doc_id, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
      FROM t)
    SELECT source, doc_id, n_tokens,
      (running - n_tokens) // $PackSeqTokens AS seq_id,
      (running - n_tokens) % $PackSeqTokens AS offset
    FROM r
  """

  /** q245: PACKING AUDIT of q59's greedy sequence plan — the two numbers
    * a pretraining data loader owner actually tunes the sequence budget
    * on, per source: STRADDLE (documents whose tokens cross a sequence
    * boundary — each one trains with cross-document attention
    * contamination or gets truncated, so the rate prices the greedy-
    * concat approximation against padded no-split packing) and TAIL
    * WASTE (the padding the source's final partial sequence burns —
    * greedy-concat's only padding). A 2048-budget plan whose straddle
    * rate is 40% says the corpus's docs are too long for the budget; a
    * big tail says the source is too small to amortize its last
    * sequence.
    *
    * Exactness: all counts/tokens exact BIGINT off q59's own columns
    * (straddle ⟺ offset + n_tokens > budget; n_seqs = ⌈Σtokens/L⌉;
    * waste = n_seqs·L − Σtokens); one division per source.
    *
    * Scale shape: q59's declared two-phase prefix sum (B-way parallel
    * per source, PlanSpec-pinned there), then ONE per-source rollup —
    * |sources| rows out. */
  def q245PackingAudit(spark: SparkSession, sfDir: String): DataFrame =
    packingAuditOn(Tables(spark, sfDir, "documents"))

  /** The audit core over ANY (source, doc_id, text) frame —
    * fixture-testable. */
  private[graft] def packingAuditOn(docs: DataFrame): DataFrame = {
    val L = PackSeqTokens
    packSequencesOn(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("offset") + col("n_tokens") > L, 1L).otherwise(0L))
          .as("n_straddling"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${L - 1}) DIV $L").as("n_seqs"),
        (expr(s"(total_tokens + ${L - 1}) DIV $L") * L - col("total_tokens"))
          .as("tail_waste"),
        col("n_straddling"),
        when(col("n_docs") > 0, col("n_straddling").cast("double")
          / col("n_docs").cast("double")).as("straddle_rate"))
  }

  val q245PackingAuditSql: String = s"""
    WITH p AS (SELECT * FROM ($q59PackSequencesSql)),
    s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        CAST(sum(CASE WHEN "offset" + n_tokens > $PackSeqTokens
          THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
      FROM p GROUP BY 1)
    SELECT source, n_docs, total_tokens,
      (total_tokens + ${PackSeqTokens - 1}) // $PackSeqTokens AS n_seqs,
      (total_tokens + ${PackSeqTokens - 1}) // $PackSeqTokens
        * $PackSeqTokens - total_tokens AS tail_waste,
      n_straddling,
      CASE WHEN n_docs > 0 THEN
        CAST(n_straddling AS DOUBLE) / CAST(n_docs AS DOUBLE)
      END AS straddle_rate
    FROM s
  """

  /** q65 tuning: chunk width / stride in tokens (50% overlap). */
  private[ops] val ChunkWidth = 32
  private[ops] val ChunkStride = 16

  /** q65: sliding-window chunking with overlap — the RAG / long-context
    * pretraining shape (q53's spans are the disjoint special case). Each
    * document explodes into windows of [[ChunkWidth]] tokens every
    * [[ChunkStride]] tokens, so consecutive chunks share half their
    * tokens and no boundary sentence is ever lost to a hard cut; the last
    * chunk is the remainder. A pure Generate + projection — data-parallel,
    * no shuffle, no state — so it pipelines into the scan at any scale. */
  def q65ChunkOverlap(spark: SparkSession, sfDir: String): DataFrame =
    Tables.parallelized(Tables(spark, sfDir, "documents"))
      .select(col("doc_id"), expr("""split(trim(text), '\\s+')""").as("tk"))
      .withColumn("n_tokens", size(col("tk")))
      .filter(col("n_tokens") > 0)
      .withColumn("chunk_idx", explode(expr(
        s"sequence(0, CAST(ceil(greatest(n_tokens - $ChunkWidth, 0) / $ChunkStride.0) AS INT))")))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(ChunkWidth), col("n_tokens") - col("chunk_idx") * lit(ChunkStride))
          .as("n_chunk_tokens"),
        expr(s"concat_ws(' ', slice(tk, chunk_idx * $ChunkStride + 1, $ChunkWidth))")
          .as("chunk_text"))

  val q65ChunkOverlapSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    n AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM t WHERE len(tk) > 0),
    c AS (
      SELECT doc_id, tk, n_tokens,
        unnest(range(CAST(ceil(greatest(n_tokens - $ChunkWidth, 0) / $ChunkStride.0) AS BIGINT) + 1)) AS chunk_idx
      FROM n)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      CAST(least($ChunkWidth, n_tokens - chunk_idx * $ChunkStride) AS INTEGER) AS n_chunk_tokens,
      array_to_string(list_slice(tk, chunk_idx * $ChunkStride + 1,
        chunk_idx * $ChunkStride + $ChunkWidth), ' ') AS chunk_text
    FROM c
  """

  /** q69: dataset mixture statistics + resampling weights — the
    * data-mixing step of pretraining corpus assembly: per source, document
    * and token counts, the source's share of total tokens, and the
    * resampling weight that would flatten the mixture to uniform
    * (weight = target_share / actual_share; a weight > 1 means upsample).
    * Exact-ratio doubles, one global aggregation over per-source partials —
    * the output is |sources| rows no matter the corpus size. The grand
    * total arrives as a broadcast cross-join of a one-row aggregate over
    * the CACHED per-source frame (the oracle's own CTE shape) rather than
    * an empty-partition window, so a 100×-scale run's logs don't emit
    * `WindowExec: No Partition Defined` on every mixture query. */
  def q69MixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val perSource = graft.CachedFrames.track(
      Tables.parallelized(Tables(spark, sfDir, "documents"))
        .select(col("source"),
          expr("""size(split(trim(text), '\\s+'))""").cast("long").as("n_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens")))
    val totals = perSource.agg(sum(col("tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tokens"),
        (col("tokens").cast("double") / col("total_tokens").cast("double"))
          .as("token_share"),
        ((lit(1.0) / col("n_sources").cast("double"))
          / (col("tokens").cast("double") / col("total_tokens").cast("double")))
          .as("uniform_weight"))
  }

  val q69MixtureWeightsSql: String = """
    WITH s AS (
      SELECT source, count(*) AS n_docs,
        CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
      FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                 count(*) AS n_sources FROM s)
    SELECT s.source, s.n_docs, s.tokens,
      CAST(s.tokens AS DOUBLE) / CAST(t.total_tokens AS DOUBLE) AS token_share,
      (1.0 / CAST(t.n_sources AS DOUBLE))
        / (CAST(s.tokens AS DOUBLE) / CAST(t.total_tokens AS DOUBLE)) AS uniform_weight
    FROM s CROSS JOIN t
  """

  /** q67 tuning: gram size k and winnowing window w (guarantee: any shared
    * run of w + k - 1 tokens between two documents yields a shared
    * fingerprint). */
  private[ops] val WinnowK = 3
  private[ops] val WinnowW = 4

  /** q67: winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * scheme): hash every word k-gram, slide a window of w hashes, keep each
    * window's minimum, dedup — a robust LOCAL fingerprint set with the
    * guarantee that any sufficiently long shared token run between two
    * documents produces a shared fingerprint, which whole-document hashing
    * (q24) and random sampling both miss. Hashes use the portable 56-bit
    * md5 prefix so both engines derive identical integers.
    *
    * Scale shape: pure per-row HOF projection + explode — no shuffle
    * before the (doc_id, fp) output; the fingerprint index downstream
    * joins on uniform 56-bit keys. Documents shorter than k tokens emit
    * nothing; with fewer than w grams the single window is the whole gram
    * list (standard winnowing edge). */
  def q67Winnowing(spark: SparkSession, sfDir: String): DataFrame =
    // tracked: this IS the graph family's shared postings artifact (the
    // same canonical plan containmentOn tracks), so when q67 runs inside
    // the bench's shared-artifact group it materializes the winnow ONCE
    // as the family's generator instead of paying a private pass
    graft.CachedFrames.track(
      winnowingOn(Tables.parallelized(Tables(spark, sfDir, "documents"))))

  /** Winnowing over any (doc_id, text) frame — the spec drives this with
    * crafted documents to pin the shared-run guarantee. */
  private[ops] def winnowingOn(docs: DataFrame): DataFrame = {
    // the sliding-window minima run in the native codegen window_mins
    // expression: one primitive pass, and — unlike a computed array column
    // fed to nested HOF lambdas — its gram-hash child is evaluated exactly
    // once per row (the interpreted transform/slice/array_min chain this
    // replaces re-ran every md5 per window after projection collapse:
    // measured 170 s instead of ~2 s at sf0.1)
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .filter(expr(s"size(toks) >= $WinnowK"))
      .withColumn("fps", expr(
        s"""array_sort(array_distinct(window_mins(
              transform(${ngramsExpr(WinnowK, distinct = false)},
                g -> md5_prefix56(g)),
              $WinnowW)))"""))
      .select(col("doc_id"), explode(col("fps")).as("fp"))
  }

  val q67WinnowingSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    g AS (
      SELECT doc_id, ${ngramsSqlExpr(WinnowK, distinct = false)} AS grams
      FROM t WHERE len(tk) >= $WinnowK),
    h AS (
      SELECT doc_id, list_transform(grams,
        gr -> ('0x' || substr(md5(gr), 1, 14))::BIGINT) AS h
      FROM g),
    f AS (
      SELECT doc_id, list_sort(list_distinct(list_transform(
        range(greatest(len(h) - $WinnowW, 0) + 1),
        i -> list_min(list_slice(h, i + 1, i + $WinnowW))))) AS fps
      FROM h)
    SELECT doc_id, unnest(fps) AS fp FROM f
  """

  /** q68 tuning: stop-fingerprint document-frequency cap and the minimum
    * shared-fingerprint count for a reported pair. */
  private[graft] val ContainDfCap = 50
  private[graft] val ContainMinShared = 2

  /** q68: asymmetric containment via the winnowing index — "how much of
    * document A's fingerprint set appears in B" (quote / excerpt detection;
    * Jaccard misses containment when sizes differ wildly). Pairs come from
    * an equi-join on fingerprint — the posting-list shape, sub-quadratic —
    * after dropping stop-fingerprints seen in more than [[ContainDfCap]]
    * documents (MOSS's noise filter, and the bound that keeps every posting
    * list short at corpus scale). Containment is computed against each
    * doc's CAPPED fingerprint set so both engines and both ratio directions
    * use the same denominator. */
  def q68Containment(spark: SparkSession, sfDir: String): DataFrame =
    containmentOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The containment core over ANY (doc_id, text) frame — the shared edge
    * generator for the graph family (q121/q127/q145/q149/q153/q156 and the
    * GraphReport CLI bundle, which materializes it ONCE as an artifact). */
  private[graft] def containmentOn(docs: DataFrame): DataFrame =
    containmentFromPostings(graft.CachedFrames.track(winnowingOn(docs)))

  /** The containment edge computation from an ALREADY-WINNOWED postings
    * frame (doc_id, fp) — split out so a PERSISTED fingerprint index
    * ([[graphIndexFps]] / [[graft.cli.BuildGraphIndex]]) can feed the
    * whole graph family without re-winnowing the corpus text: at 100 TB
    * the text scan + per-gram md5s dominate the generator, while this
    * path is one df rollup plus the posting join over the compact index.
    * `dfCap`/`minShared` default to the production constants; fixtures
    * narrow them to pin the cap-crossing laws with few documents. */
  private[graft] def containmentFromPostings(fps: DataFrame,
      dfCap: Int = ContainDfCap, minShared: Int = ContainMinShared): DataFrame = {
    val kept = graft.CachedFrames.track(
      fps.join(
        fps.groupBy(col("fp")).agg(count(lit(1)).as("fdf"))
          .filter(col("fdf") <= dfCap)
          .select(col("fp")),
        "fp"))
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    // the OUTPUT is tracked too: q121 symmetrizes it (two union branches)
    // and q127 iterates on it, so without the cache the posting join runs
    // twice inside each consumer — and concurrent Verify threads building
    // q68/q121/q127 share one materialization through the refcounted entry
    graft.CachedFrames.track(
      kept.select(col("doc_id").as("id1"), col("fp"))
        .join(kept.select(col("doc_id").as("id2"), col("fp")), "fp")
        .filter(col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .join(sizes.select(col("doc_id").as("id1"), col("n_fp").as("n1")), "id1")
        .join(sizes.select(col("doc_id").as("id2"), col("n_fp").as("n2")), "id2")
        .select(col("id1"), col("id2"), col("n_shared"),
          (col("n_shared").cast("double") / col("n1").cast("double")).as("contain1"),
          (col("n_shared").cast("double") / col("n2").cast("double")).as("contain2")))
  }

  // --- incremental face of the containment graph (the substr-index
  // pattern: Build/Admit/Extend with a grown ≡ from-scratch law) ---

  /** The three tables of the persisted GRAPH INDEX of a standing corpus:
    *
    *   fps    (doc_id, fp)   — its winnowed fingerprint postings,
    *   df     (fp, fdf)      — fingerprint document frequencies,
    *   sizes  (doc_id, n_fp) — per-doc capped fingerprint-set size
    *                           (docs with zero kept fps are ABSENT,
    *                           matching the from-scratch rollup).
    *
    * `fps` alone determines the other two (and the full edge list, via
    * [[containmentFromPostings]]); `df` and `sizes` are persisted so an
    * ADMISSION touches only the batch's own fingerprints plus two slim
    * lookups, never the full postings. Rebuilding `fps` from a 100 TB
    * base is the expensive winnowing pass this index exists to avoid;
    * extension after an admitted batch is postings-append + count-merge
    * ([[graphIndexExtend]]), never a re-scan of base text. Unlike the
    * substring index there is NO canonical-order contract — containment
    * is symmetric in document order — only DISJOINT doc_ids between base
    * and batch. */
  private[graft] def graphIndexFps(docs: DataFrame): DataFrame =
    winnowingOn(docs)

  private[graft] def graphIndexDfOf(fps: DataFrame): DataFrame =
    fps.groupBy(col("fp")).agg(count(lit(1)).as("fdf"))

  private[graft] def graphIndexSizesOf(fps: DataFrame,
      dfCap: Int = ContainDfCap): DataFrame =
    fps.join(graphIndexDfOf(fps).filter(col("fdf") <= dfCap).select(col("fp")),
        "fp")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))

  /** Admit a document batch against a persisted graph index: the batch's
    * INCIDENT containment edges (batch↔base and batch↔batch) under the
    * GROWN corpus — exactly `containmentOn(base ∪ batch)` restricted to
    * pairs touching a batch doc (the GraphIndexSpec law), while reading
    * only |batch| text plus index lookups bounded by the batch's own
    * fingerprint set.
    *
    * The df-cap subtlety the index tables exist for: adding the batch
    * GROWS document frequencies, so a fingerprint kept under the base df
    * can cross [[ContainDfCap]] and must be dropped from EVERY doc it
    * appears in — but only fingerprints PRESENT IN THE BATCH can grow, so
    * the affected posting set is the index semi-joined to the batch's
    * fingerprints, and an incident base doc's denominator is its stored
    * `n_fp` minus its crossings. Base↔base edges whose support shrinks
    * the same way are the FULL-REFRESH face's job
    * ([[graft.cli.GraphReport]] `--index`, which recomputes every edge
    * from the grown postings without touching text).
    *
    * Scale shape: winnow |batch| text; ONE semi-join of the postings on
    * the batch's ≤|batch fps| distinct fingerprints (an index lookup when
    * the postings are bucketed by fp); df/sizes joins on the same bounded
    * keys; the pair join runs over relevant postings only. */
  private[graft] def graphAdmitAgainstIndex(batch: DataFrame, fps: DataFrame,
      df: DataFrame, sizes: DataFrame, dfCap: Int = ContainDfCap,
      minShared: Int = ContainMinShared): DataFrame =
    graphAdmitFromPostings(winnowingOn(batch), fps, df, sizes, dfCap,
      minShared)

  /** [[graphAdmitAgainstIndex]] with the batch's POSTINGS precomputed —
    * winnowing is per-document (a doc's fingerprints depend on its text
    * alone), so a caller that already holds the batch's (doc_id, fp) rows
    * (a split of a standing artifact, as in the q238/q251 gate splits)
    * must not pay a second text winnow to admit. Production admissions
    * (CLI/stream) keep entering through the text form above — a real new
    * batch is in no artifact yet. */
  private[graft] def graphAdmitFromPostings(batchFps: DataFrame,
      fps: DataFrame, df: DataFrame, sizes: DataFrame,
      dfCap: Int = ContainDfCap, minShared: Int = ContainMinShared)
      : DataFrame = {
    val bfps = graft.CachedFrames.track(batchFps)
    val bdf = bfps.groupBy(col("fp")).agg(count(lit(1)).as("bdf"))
    // grown df for every fingerprint the batch carries (others unchanged);
    // the df table is first SEMI-JOINED to the batch's fingerprint set so
    // the lookup touches only index rows the batch can affect. NO explicit
    // broadcast hint: a production admission batch can carry a fp set far
    // beyond driver/broadcast limits, and AQE picks broadcast from runtime
    // stats when the set IS small — the semi-join shape is preserved
    // either way, so the hint only added a failure mode
    val dfRel = df.join(bfps.select(col("fp")).distinct(),
      Seq("fp"), "left_semi")
    val grown = graft.CachedFrames.track(
      bdf.join(dfRel, Seq("fp"), "left")
        .select(col("fp"), col("bdf"),
          (coalesce(col("fdf"), lit(0L)) + col("bdf")).as("gdf")))
    val keptFp = grown.filter(col("gdf") <= dfCap).select(col("fp"))
    val bKept = graft.CachedFrames.track(bfps.join(keptFp, "fp"))
    val baseRel = graft.CachedFrames.track(
      fps.join(bfps.select(col("fp")).distinct(), Seq("fp"),
        "left_semi"))
    val baseKept = baseRel.join(keptFp, "fp")
    // denominators under the grown df: batch docs from their kept counts;
    // base docs from stored sizes minus cap-crossings (df only grows, so
    // no fingerprint un-drops)
    val crossings = baseRel
      .join(grown.filter(col("gdf") > dfCap && col("gdf") - col("bdf") <= dfCap)
        .select(col("fp")), "fp")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cross"))
    val nB = bKept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val nBase = sizes.join(baseRel.select(col("doc_id")).distinct(), "doc_id")
      .join(crossings, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_fp") - coalesce(col("n_cross"), lit(0L))).as("n_fp"))
    val n = graft.CachedFrames.track(nB.union(nBase))
    // incident pairs: batch↔base (both orders of the id sort) ∪ batch↔batch
    val others = baseKept.union(bKept)
    val pairs = bKept.select(col("doc_id").as("ida"), col("fp"))
      .join(others.select(col("doc_id").as("idb"), col("fp")), "fp")
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("fp"))
      .distinct() // batch↔batch pairs arrive once per ORDER, not per side
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(n.select(col("doc_id").as("id1"), col("n_fp").as("n1")), "id1")
      .join(n.select(col("doc_id").as("id2"), col("n_fp").as("n2")), "id2")
      .select(col("id1"), col("id2"), col("n_shared"),
        (col("n_shared").cast("double") / col("n1").cast("double")).as("contain1"),
        (col("n_shared").cast("double") / col("n2").cast("double")).as("contain2"))
  }

  /** Extend a persisted graph index with an admitted batch — postings
    * append + count merge + size adjustment, NEVER a re-scan of base
    * text. The law (GraphIndexSpec + CliSpec): for doc_id-disjoint base
    * and batch, every table of extend(build(base), batch) equals the
    * from-scratch build(base ∪ batch). */
  private[graft] def graphIndexExtend(fps: DataFrame, df: DataFrame,
      sizes: DataFrame, batch: DataFrame, dfCap: Int = ContainDfCap)
      : (DataFrame, DataFrame, DataFrame) = {
    val bfps = graft.CachedFrames.track(winnowingOn(batch))
    val bdf = graft.CachedFrames.track(
      bfps.groupBy(col("fp")).agg(count(lit(1)).as("bdf")))
    val fps2 = fps.union(bfps)
    val df2 = df.join(bdf, Seq("fp"), "full_outer")
      .select(col("fp"),
        (coalesce(col("fdf"), lit(0L)) + coalesce(col("bdf"), lit(0L)))
          .as("fdf"))
    // batch docs: kept counts under the grown df; base docs: stored size
    // minus crossings (fingerprints the batch pushed over the cap); df is
    // semi-joined to the batch fingerprints first, as in the admit path
    // (unhinted for the same reason — a large batch's fp set must not be
    // forced through the driver; AQE broadcasts it when it is small)
    val grown = bdf.join(
        df.join(bfps.select(col("fp")).distinct(), Seq("fp"),
          "left_semi"),
        Seq("fp"), "left")
      .select(col("fp"), col("bdf"),
        (coalesce(col("fdf"), lit(0L)) + col("bdf")).as("gdf"))
    val sizesB = bfps.join(grown.filter(col("gdf") <= dfCap).select(col("fp")),
        "fp")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val crossings = fps
      .join(
        grown.filter(col("gdf") > dfCap && col("gdf") - col("bdf") <= dfCap)
          .select(col("fp")), Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cross"))
    val sizes2 = sizes.join(crossings, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_fp") - coalesce(col("n_cross"), lit(0L))).as("n_fp"))
      .filter(col("n_fp") > 0)
      .union(sizesB)
    (fps2, df2, sizes2)
  }

  /** The BASE↔BASE edge patch an admission implies — the piece
    * [[graphAdmitAgainstIndex]] deliberately leaves to the full-refresh
    * report: when the batch pushes a standing fingerprint over the df cap,
    * that fingerprint drops from EVERY base doc, so standing base↔base
    * edges lose shared fingerprints (possibly below `minShared` —
    * retirement) and every affected doc's denominator shrinks (its
    * surviving edges' contain values all change). This computes the exact
    * patch from the index tables alone, so a persisted edge artifact can
    * be kept current per admission without `GraphReport --index`
    * recomputing every edge.
    *
    * Returns (id1, id2, n_shared, contain1, contain2, op): `op = "update"`
    * rows REPLACE the standing edge with post-admission values; `op =
    * "retire"` rows (new shared count < `minShared` — n_shared carries it,
    * contains are null) DELETE it. Every standing edge not in the patch is
    * untouched, and an admission can never CREATE a base↔base edge
    * (document frequencies only grow, kept sets only shrink), so
    * anti-join + union-updates is a complete application
    * ([[applyGraphEdgePatch]]; the GraphIndexSpec law pins patched ≡
    * full-refresh on the crossing fixture and an organic sf split).
    *
    * Scale shape: the batch's fingerprint set bounds everything — the
    * crossing set is its subset; affected docs are the postings holding a
    * crossing fingerprint; candidate pairs re-derive from affected docs'
    * kept postings joined against relevant partner postings only (the
    * posting lists of the affected docs' OWN fingerprints — never the full
    * posting join). No batch text is even winnowed beyond the df probe. */
  private[graft] def graphRetireOnAdmit(batch: DataFrame, fps: DataFrame,
      df: DataFrame, sizes: DataFrame, dfCap: Int = ContainDfCap,
      minShared: Int = ContainMinShared): DataFrame =
    graphRetireFromPostings(winnowingOn(batch), fps, df, sizes, dfCap,
      minShared)

  /** [[graphRetireOnAdmit]] with the batch's POSTINGS precomputed — the
    * per-document-locality shortcut [[graphAdmitFromPostings]] documents. */
  private[graft] def graphRetireFromPostings(batchFps: DataFrame,
      fps: DataFrame, df: DataFrame, sizes: DataFrame,
      dfCap: Int = ContainDfCap, minShared: Int = ContainMinShared)
      : DataFrame = {
    val bfps = graft.CachedFrames.track(batchFps)
    val bdf = bfps.groupBy(col("fp")).agg(count(lit(1)).as("bdf"))
    // fingerprints the batch pushes over the cap that were KEPT before
    // (fdf ≤ cap < fdf + bdf) — only these change any base-side number
    val crossingFp = graft.CachedFrames.track(
      bdf.join(df, Seq("fp"))
        .filter(col("fdf") <= dfCap && col("fdf") + col("bdf") > dfCap)
        .select(col("fp")))
    // affected docs and their per-doc crossing counts (denominator deltas)
    val dcross = graft.CachedFrames.track(
      fps.join(crossingFp, "fp")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cross")))
    // pre-admission kept postings of the affected docs; their partners'
    // postings come from the SAME fingerprints, so the probe is bounded
    // by the affected docs' own posting lists
    val oldKeptFp = df.filter(col("fdf") <= dfCap).select(col("fp"))
    val aPost = graft.CachedFrames.track(
      fps.join(dcross.select(col("doc_id")), "doc_id").join(oldKeptFp, "fp"))
    val partnerPost = fps
      .join(aPost.select(col("fp")).distinct(), Seq("fp"), "left_semi")
      .join(oldKeptFp, "fp")
    // shared-fp inventory of every standing edge incident to an affected
    // doc, each fp tagged with whether the admission drops it
    val pairFp = aPost.select(col("doc_id").as("ida"), col("fp"))
      .join(partnerPost.select(col("doc_id").as("idb"), col("fp")), "fp")
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("fp"))
      .distinct() // both-affected pairs arrive once per ORDER, not per side
      .join(crossingFp.withColumn("xc", lit(1L)), Seq("fp"), "left")
    val n2 = sizes.join(dcross, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_fp") - coalesce(col("n_cross"), lit(0L))).as("n_fp"))
    pairFp.groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("old_shared"),
        coalesce(sum(col("xc")), lit(0L)).as("x_shared"))
      // standing edges only; every one of them changes — an affected
      // endpoint's denominator shrank even when x_shared = 0
      .filter(col("old_shared") >= minShared)
      .withColumn("new_shared", col("old_shared") - col("x_shared"))
      .join(n2.select(col("doc_id").as("id1"), col("n_fp").as("n1")), "id1")
      .join(n2.select(col("doc_id").as("id2"), col("n_fp").as("n2")), "id2")
      .select(col("id1"), col("id2"), col("new_shared").as("n_shared"),
        when(col("new_shared") >= minShared,
          col("new_shared").cast("double") / col("n1").cast("double"))
          .as("contain1"),
        when(col("new_shared") >= minShared,
          col("new_shared").cast("double") / col("n2").cast("double"))
          .as("contain2"),
        when(col("new_shared") >= minShared, lit("update"))
          .otherwise(lit("retire")).as("op"))
  }

  /** Apply a [[graphRetireOnAdmit]] patch to a standing base↔base edge
    * artifact: drop every patched pair, add back the `update` rows. The
    * shared application semantics of the CLI flow and the spec law. */
  private[graft] def applyGraphEdgePatch(standing: DataFrame,
      patch: DataFrame): DataFrame =
    standing.join(patch.select(col("id1"), col("id2")), Seq("id1", "id2"),
        "left_anti")
      .unionByName(patch.filter(col("op") === "update")
        .select(col("id1"), col("id2"), col("n_shared"), col("contain1"),
          col("contain2")))

  /** The SURVIVOR-EDGE patch a deletion implies — [[graphRetireOnAdmit]]'s
    * mirror with the sign flipped: forgetting documents SHRINKS document
    * frequencies, so fingerprints the deleted docs had pushed over the df
    * cap can UN-drop for every surviving doc. Survivor edges gain shared
    * fingerprints (support can cross `minShared` — edges are CREATED,
    * which an admission can never do base-side), and every affected
    * survivor's denominator GROWS (its contains all shrink).
    *
    * Returns (id1, id2, n_shared, contain1, contain2, op) over SURVIVOR
    * pairs only: `op = "update"` rows replace a standing edge; `op =
    * "add"` rows are new edges (old support < minShared ≤ new). Nothing
    * retires here — kept sets only grow under deletion — and edges
    * incident to a DELETED doc are the application's plain anti-join, not
    * the patch's job ([[applyGraphForgetPatch]]).
    *
    * Scale shape: bounded by the DELETED docs' postings — the un-dropping
    * fingerprint set is a subset of their fingerprints; affected docs are
    * the survivors holding one; candidate pairs re-derive from those
    * docs' post-deletion kept postings joined against partner postings on
    * the same fingerprints. Never a full edge recompute, never a text
    * re-scan. */
  private[graft] def graphForgetEdgePatch(ids: DataFrame, fps: DataFrame,
      df: DataFrame, sizes: DataFrame, dfCap: Int = ContainDfCap,
      minShared: Int = ContainMinShared): DataFrame = {
    val del = ids.select(col("doc_id"))
    // per-fp deleted-posting counts: df after forget = fdf − ddf
    val ddf = graft.CachedFrames.track(
      fps.join(del, Seq("doc_id"), "left_semi")
        .groupBy(col("fp")).agg(count(lit(1)).as("ddf")))
    // fingerprints the deletion pulls back under the cap
    val undropFp = graft.CachedFrames.track(
      df.join(ddf, Seq("fp"))
        .filter(col("fdf") > dfCap && col("fdf") - col("ddf") <= dfCap)
        .select(col("fp")))
    val sPost = graft.CachedFrames.track(
      fps.join(del, Seq("doc_id"), "left_anti"))
    // post-deletion kept fingerprints: old kept ∪ un-dropped (kept sets
    // only grow — df shrinks monotonically under deletion)
    val newKeptFp = df.join(ddf, Seq("fp"), "left")
      .filter(col("fdf") - coalesce(col("ddf"), lit(0L)) <= dfCap)
      .select(col("fp"))
    // affected survivors and their denominator growth
    val dundrop = graft.CachedFrames.track(
      sPost.join(undropFp, "fp")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_undrop")))
    val aPost = graft.CachedFrames.track(
      sPost.join(dundrop.select(col("doc_id")), "doc_id")
        .join(newKeptFp, "fp"))
    val partnerPost = sPost
      .join(aPost.select(col("fp")).distinct(), Seq("fp"), "left_semi")
      .join(newKeptFp, "fp")
    val pairFp = aPost.select(col("doc_id").as("ida"), col("fp"))
      .join(partnerPost.select(col("doc_id").as("idb"), col("fp")), "fp")
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("fp"))
      .distinct() // both-affected pairs arrive once per ORDER, not per side
      .join(undropFp.withColumn("xc", lit(1L)), Seq("fp"), "left")
    // FULL outer: a survivor with zero previously-kept fps is absent from
    // the sizes table but can gain kept fps through un-drops (and then
    // form brand-new edges) — its denominator is its un-drop count alone
    val n2 = sizes.join(dundrop, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("n_fp"), lit(0L)) + coalesce(col("n_undrop"), lit(0L)))
          .as("n_fp"))
    pairFp.groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("new_shared"),
        coalesce(sum(col("xc")), lit(0L)).as("x_shared"))
      // every emitted pair changed: an affected endpoint's denominator
      // grew even when x_shared = 0; pairs below minShared after the
      // growth were not edges and still are not
      .filter(col("new_shared") >= minShared)
      .withColumn("old_shared", col("new_shared") - col("x_shared"))
      .join(n2.select(col("doc_id").as("id1"), col("n_fp").as("n1")), "id1")
      .join(n2.select(col("doc_id").as("id2"), col("n_fp").as("n2")), "id2")
      .select(col("id1"), col("id2"), col("new_shared").as("n_shared"),
        (col("new_shared").cast("double") / col("n1").cast("double"))
          .as("contain1"),
        (col("new_shared").cast("double") / col("n2").cast("double"))
          .as("contain2"),
        when(col("old_shared") >= minShared, lit("update"))
          .otherwise(lit("add")).as("op"))
  }

  /** Apply a [[graphForgetEdgePatch]] to a standing edge artifact: drop
    * every edge touching a deleted doc, drop the patched survivor pairs,
    * add back the patch rows (update AND add both carry final values). */
  private[graft] def applyGraphForgetPatch(standing: DataFrame,
      ids: DataFrame, patch: DataFrame): DataFrame = {
    val del = ids.select(col("doc_id"))
    standing
      .join(del.select(col("doc_id").as("id1")), Seq("id1"), "left_anti")
      .join(del.select(col("doc_id").as("id2")), Seq("id2"), "left_anti")
      .join(patch.select(col("id1"), col("id2")), Seq("id1", "id2"),
        "left_anti")
      .unionByName(patch.select(col("id1"), col("id2"), col("n_shared"),
        col("contain1"), col("contain2")))
  }

  /** q238: the graph-index ADMISSION as an oracle-gated query — a fixed
    * deterministic split of the corpus (batch = doc_id % 5 = 0, base =
    * the rest) run through the production build→admit path, compared to
    * the from-scratch grown-corpus edges restricted to batch-incident
    * pairs. The oracle recomputes the whole thing from raw text (q68's
    * SQL + the incident filter), so a hash match proves the incremental
    * path reproduces the from-scratch generator exactly — including the
    * df-cap-crossing bookkeeping. */
  def q238GraphAdmit(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, bfps, fps, df, sizes) = q238IndexTables(spark, sfDir)
    graphAdmitFromPostings(bfps, fps, df, sizes)
  }

  /** The q238 deterministic split and its TRACKED index tables, shared by
    * q238/q240/q253: identical logical plans mean `CachedFrames.track`
    * dedups the materializations across the three queries, so the bench
    * bills the one-time winnow/index BUILD to the family's generator rows
    * and the admission rows price admission — the production cost split
    * (BuildGraphIndex once, AdmitDocs per batch).
    *
    * The postings derive from ONE full-corpus winnow, filtered per side:
    * winnowing is per-document, so `fps(base) = fps(all) WHERE base` —
    * the oracle's own formulation (q253/q240's SQL filters
    * `q67WinnowingSql`), now the Spark plan's too. The full winnow is
    * winnowed over the UNPROJECTED table, keeping its plan canonically
    * EQUAL to the graph bench group's (containmentOn tracks winnowingOn
    * over the same table — Catalyst prunes columns at the scan either
    * way), so in the shared-artifact group the corpus text is winnowed
    * ONCE for the whole containment family instead of once per split.
    * Production admissions still winnow their own new text
    * ([[graphAdmitAgainstIndex]]); only the gate split, whose "batch" is
    * a carve-out of the same table, can take the filter shortcut. */
  private[ops] def q238IndexTables(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val all = graft.CachedFrames.track(graphIndexFps(docs))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val bfps = all.filter(col("doc_id") % 5 === 0)
    val fps = graft.CachedFrames.track(all.filter(col("doc_id") % 5 =!= 0))
    val df = graft.CachedFrames.track(graphIndexDfOf(fps))
    (batch, bfps, fps, df, graphIndexSizesOf(fps))
  }

  /** q253: the q238 base split's document-frequency table as its own gate
    * entry — the GENERATOR row of the bench's graphidx group, so the
    * one-time index build (winnowing the base text + the df rollup) is
    * billed HERE and q238/q240's rows price the admission alone. The
    * oracle recomputes the table from raw text, which doubles as the law
    * that the standing artifact equals the in-row build. */
  def q253GraphIndexDf(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, _, _, df, _) = q238IndexTables(spark, sfDir)
    df
  }

  lazy val q253GraphIndexDfSql: String = s"""
    SELECT fp, CAST(count(*) AS BIGINT) AS fdf
    FROM ($q67WinnowingSql)
    WHERE doc_id % 5 <> 0
    GROUP BY 1
  """

  // lazy: q68ContainmentSql is declared LATER in this object; a strict val
  // here would interpolate null at object-init time
  lazy val q238GraphAdmitSql: String = s"""
    SELECT id1, id2, n_shared, contain1, contain2
    FROM ($q68ContainmentSql)
    WHERE id1 % 5 = 0 OR id2 % 5 = 0
  """

  /** q262: CROSS-SOURCE CONTAINMENT MATRIX — which sources quote which:
    * q68's containment edges rolled up by DIRECTED source pair
    * (contained-side source → container-side source; an edge contributes
    * both directions with its own ratio, since containment is
    * asymmetric). The provenance question behind dedup policy: a source
    * pair with many high-containment edges is a syndication/scrape
    * relationship — dedup should keep the canonical source's copy, and
    * q259's mixture shift shows what that choice does to composition.
    *
    * Exactness: counts and shared-fp sums exact; max of one-division
    * doubles is order-insensitive — no double means anywhere.
    *
    * Scale shape: the edge list is the graph bench group's shared
    * artifact (identical tracked plan — built once per rep); this adds
    * two broadcast-sized doc→source joins and one |sources|² rollup. */
  def q262SourceContainment(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val edges = containmentOn(docs)
    val src = docs.select(col("doc_id"), col("source"))
    val joined = graft.CachedFrames.track(edges
      .join(src.select(col("doc_id").as("id1"), col("source").as("s1")), "id1")
      .join(src.select(col("doc_id").as("id2"), col("source").as("s2")), "id2"))
    joined.select(col("s1").as("contained_src"), col("s2").as("container_src"),
        col("n_shared"), col("contain1").as("containment"))
      .unionByName(joined.select(col("s2").as("contained_src"),
        col("s1").as("container_src"), col("n_shared"),
        col("contain2").as("containment")))
      .groupBy(col("contained_src"), col("container_src"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("n_shared")).as("sum_shared"),
        max(col("containment")).as("max_containment"))
  }

  lazy val q262SourceContainmentSql: String = s"""
    WITH e AS (SELECT * FROM ($q68ContainmentSql)),
    s AS (SELECT doc_id, source FROM documents),
    d AS (
      SELECT s1.source AS contained_src, s2.source AS container_src,
        e.n_shared, e.contain1 AS containment
      FROM e JOIN s s1 ON e.id1 = s1.doc_id JOIN s s2 ON e.id2 = s2.doc_id
      UNION ALL
      SELECT s2.source, s1.source, e.n_shared, e.contain2
      FROM e JOIN s s1 ON e.id1 = s1.doc_id JOIN s s2 ON e.id2 = s2.doc_id)
    SELECT contained_src, container_src,
      CAST(count(*) AS BIGINT) AS n_pairs,
      CAST(sum(n_shared) AS BIGINT) AS sum_shared,
      max(containment) AS max_containment
    FROM d GROUP BY 1, 2
  """

  /** q251/q252 tuning: a stop-fingerprint cap the CURRENT sf tables
    * actually cross under a half-corpus admission (sf0.01: 119 base-kept
    * fingerprints cross at cap 3 when the even-id half lands; the
    * production cap of [[ContainDfCap]] is a no-op there — q249 prices
    * the levels, these two entries RUN the crossing branches on organic
    * data every round, because the branch that guards 100 TB correctness
    * must not live only in hand fixtures). */
  private[ops] val BindingDfCap = 3

  /** q251: the graph-index ADMISSION at a BINDING df cap — the q238
    * pipeline (build on the base half, admit the other half) with
    * `dfCap = ` [[BindingDfCap]], where the batch genuinely pushes
    * standing fingerprints over the cap, so every crossing branch of
    * [[graphAdmitAgainstIndex]] (grown-df drop, denominator adjustment,
    * both-sides bookkeeping) executes against the oracle's from-scratch
    * recompute. Split is doc_id % 2 (a LARGER batch than q238's fifth —
    * more df growth, more crossings). */
  def q251BindingCapAdmit(spark: SparkSession, sfDir: String): DataFrame = {
    val (bfps, fps, df, sizes) = bindingCapIndexTables(spark, sfDir)
    graphAdmitFromPostings(bfps, fps, df, sizes, dfCap = BindingDfCap)
  }

  /** The q251/q252 half split and its tracked index tables at the binding
    * cap — shared (identical plans) so the bench materializes the build
    * once across both rows. Like [[q238IndexTables]], both sides' postings
    * are FILTERS of the one full-corpus winnow (per-document locality —
    * the q252 oracle's own `fp WHERE doc_id % 2 ...` formulation), and the
    * winnow plan is canonically equal to the graph bench group's, so the
    * half-corpus text winnow this pair used to pay twice per rep rides
    * the family's shared artifact instead. */
  private[ops] def bindingCapIndexTables(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val all = graft.CachedFrames.track(graphIndexFps(docs))
    val bfps = all.filter(col("doc_id") % 2 === 0)
    val fps = graft.CachedFrames.track(all.filter(col("doc_id") % 2 =!= 0))
    val df = graft.CachedFrames.track(graphIndexDfOf(fps))
    (bfps, fps, df, graphIndexSizesOf(fps, dfCap = BindingDfCap))
  }

  lazy val q251BindingCapAdmitSql: String = s"""
    SELECT id1, id2, n_shared, contain1, contain2
    FROM (${containmentSqlAt(BindingDfCap, ContainMinShared)})
    WHERE id1 % 2 = 0 OR id2 % 2 = 0
  """

  /** q252: the BASE-EDGE PATCH at the same binding cap —
    * [[graphRetireOnAdmit]] run on organic data where retirements and
    * denominator updates actually occur, oracle-checked against a full
    * from-scratch derivation (standing edges incident to affected docs,
    * re-valued under the grown document frequencies). Together with q251
    * this puts BOTH faces of an admission (incident new edges + standing
    * edge maintenance) under the driver gate at a cap that binds. */
  def q252BindingCapPatch(spark: SparkSession, sfDir: String): DataFrame = {
    val (bfps, fps, df, sizes) = bindingCapIndexTables(spark, sfDir)
    graphRetireFromPostings(bfps, fps, df, sizes, dfCap = BindingDfCap)
  }

  lazy val q252BindingCapPatchSql: String = s"""
    WITH fp AS (SELECT * FROM ($q67WinnowingSql)),
    bfp AS (SELECT * FROM fp WHERE doc_id % 2 != 0),
    tfp AS (SELECT * FROM fp WHERE doc_id % 2 = 0),
    bd AS (SELECT fp, CAST(count(*) AS BIGINT) AS fdf FROM bfp GROUP BY 1),
    td AS (SELECT fp, CAST(count(*) AS BIGINT) AS bdf FROM tfp GROUP BY 1),
    xfp AS (
      SELECT bd.fp FROM bd JOIN td USING (fp)
      WHERE bd.fdf <= $BindingDfCap AND bd.fdf + td.bdf > $BindingDfCap),
    bkept AS (
      SELECT bfp.doc_id, bfp.fp FROM bfp
      JOIN bd USING (fp) WHERE bd.fdf <= $BindingDfCap),
    bsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM bkept GROUP BY 1),
    sedge AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
        CAST(count(*) AS BIGINT) AS ons
      FROM bkept a JOIN bkept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= $ContainMinShared),
    adocs AS (SELECT DISTINCT bfp.doc_id FROM bfp JOIN xfp USING (fp)),
    gkept AS (
      SELECT bk.doc_id, bk.fp FROM bkept bk
      LEFT JOIN xfp x ON bk.fp = x.fp WHERE x.fp IS NULL),
    gpair AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
        CAST(count(*) AS BIGINT) AS ns
      FROM gkept a JOIN gkept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    xcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nc
             FROM bfp JOIN xfp USING (fp) GROUP BY 1),
    nsz AS (
      SELECT b.doc_id, b.n - coalesce(x.nc, CAST(0 AS BIGINT)) AS n
      FROM bsz b LEFT JOIN xcnt x USING (doc_id))
    SELECT s.id1, s.id2,
      coalesce(g.ns, CAST(0 AS BIGINT)) AS n_shared,
      CASE WHEN coalesce(g.ns, 0) >= $ContainMinShared
        THEN CAST(g.ns AS DOUBLE) / CAST(n1.n AS DOUBLE) END AS contain1,
      CASE WHEN coalesce(g.ns, 0) >= $ContainMinShared
        THEN CAST(g.ns AS DOUBLE) / CAST(n2.n AS DOUBLE) END AS contain2,
      CASE WHEN coalesce(g.ns, 0) >= $ContainMinShared
        THEN 'update' ELSE 'retire' END AS op
    FROM sedge s
    LEFT JOIN gpair g ON s.id1 = g.id1 AND s.id2 = g.id2
    JOIN nsz n1 ON s.id1 = n1.doc_id
    JOIN nsz n2 ON s.id2 = n2.doc_id
    WHERE s.id1 IN (SELECT doc_id FROM adocs)
       OR s.id2 IN (SELECT doc_id FROM adocs)
  """

  /** q249 tuning: the candidate stop-fingerprint caps priced. */
  private[ops] val DfCapCandidates = Seq(10, 25, 50, 100)

  /** q249: STOP-FINGERPRINT CAP TRADEOFF — the tuning table for
    * [[ContainDfCap]] itself: for each candidate cap, how many
    * fingerprints the cap drops, what share of the postings they carry,
    * and the CANDIDATE PAIRS the drop avoids (Σ fdf·(fdf−1)/2 over
    * dropped fingerprints — the quadratic posting-join work a hot
    * fingerprint would generate, THE number that justifies the cap at
    * corpus scale: one fingerprint in 10⁶ documents is 5·10¹¹ pairs on
    * its own). Read next to q240's crossings: this prices the cap's
    * levels, q240 watches one level's churn per batch.
    *
    * Exactness: all counts exact; pair sums ride DECIMAL(38,0)/HUGEINT;
    * the share is one exact-cast division per row.
    *
    * Scale shape: ONE winnowing pass + ONE df rollup (cached), then a
    * ≤|caps| literal explode over the ≤|fps| count table — the caps
    * grid is label-space, the corpus is touched once. */
  def q249DfCapTradeoff(spark: SparkSession, sfDir: String): DataFrame =
    // UNPROJECTED table (the q260 pattern): keeps the winnow plan
    // canonically equal to the graph bench group's shared artifact, so
    // the cap-tuning table prices its rollup, not a third corpus winnow
    dfCapTradeoffOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The cap-tradeoff core over ANY (doc_id, text) frame —
    * fixture-testable. */
  private[graft] def dfCapTradeoffOn(docs: DataFrame): DataFrame = {
    val fps = graft.CachedFrames.track(graphIndexFps(docs))
    val df = graft.CachedFrames.track(graphIndexDfOf(fps))
    val tot = df.agg(count(lit(1)).as("n_fps"),
      sum(col("fdf")).as("n_postings"))
    df.select(col("fdf"),
        explode(typedLit(DfCapCandidates.map(_.toLong))).as("cap"))
      .groupBy(col("cap"))
      .agg(sum(when(col("fdf") > col("cap"), 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("fdf") > col("cap"), col("fdf")).otherwise(0L))
          .as("postings_dropped"),
        // fdf·(fdf−1)/2 exactly, halving the EVEN factor on the integer
        // side first (a DECIMAL division would introduce scale)
        coalesce(sum(when(col("fdf") > col("cap"), expr(
            """CASE WHEN fdf % 2 = 0
              |THEN CAST(fdf DIV 2 AS DECIMAL(38,0))
              |  * CAST(fdf - 1 AS DECIMAL(38,0))
              |ELSE CAST(fdf AS DECIMAL(38,0))
              |  * CAST((fdf - 1) DIV 2 AS DECIMAL(38,0)) END"""
              .stripMargin))
            .otherwise(lit(0).cast("decimal(38,0)"))),
          lit(0).cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("pairs_avoided_dec"))
      .crossJoin(broadcast(tot))
      .select(col("cap"), col("n_fps"), col("n_dropped"),
        col("postings_dropped"),
        when(col("n_postings") > 0, col("postings_dropped").cast("double")
          / col("n_postings").cast("double")).as("posting_share_dropped"),
        col("pairs_avoided_dec").cast("double").as("pairs_avoided"))
  }

  lazy val q249DfCapTradeoffSql: String = s"""
    WITH fp AS (SELECT * FROM ($q67WinnowingSql)),
    d AS (SELECT fp, CAST(count(*) AS BIGINT) AS fdf FROM fp GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_fps,
              CAST(sum(fdf) AS BIGINT) AS n_postings FROM d),
    caps AS (SELECT CAST(unnest([${DfCapCandidates.mkString(", ")}])
               AS BIGINT) AS cap),
    g AS (
      SELECT c.cap,
        CAST(sum(CASE WHEN d.fdf > c.cap THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dropped,
        CAST(sum(CASE WHEN d.fdf > c.cap THEN d.fdf ELSE 0 END) AS BIGINT)
          AS postings_dropped,
        coalesce(sum(CASE WHEN d.fdf > c.cap -- guard:ok internal HUGEINT; output below is exact-cast via VARCHAR
          THEN CAST(d.fdf AS HUGEINT) * (d.fdf - 1) // 2
          ELSE CAST(0 AS HUGEINT) END), 0) AS pairs_avoided_h
      FROM d, caps c GROUP BY 1)
    SELECT g.cap, tot.n_fps, g.n_dropped, g.postings_dropped,
      CASE WHEN tot.n_postings > 0 THEN
        CAST(g.postings_dropped AS DOUBLE) / CAST(tot.n_postings AS DOUBLE)
      END AS posting_share_dropped,
      CAST(CAST(g.pairs_avoided_h AS VARCHAR) AS DOUBLE) AS pairs_avoided
    FROM g, tot
  """

  /** q260: the FORGET-side edge patch at the binding cap —
    * [[graphForgetEdgePatch]] run on organic data where un-drops actually
    * occur (deleting the even half of the corpus pulls hot fingerprints
    * back under cap [[BindingDfCap]]), oracle-checked against a full
    * from-scratch derivation. Completes the incremental containment-graph
    * story under the driver gate: ADMIT new edges (q238/q251), RETIRE and
    * re-price standing edges on admission crossings (q252), and now
    * CREATE and re-price survivor edges on deletion un-drops — all three
    * without recomputing the artifact or re-scanning text. */
  def q260ForgetEdgePatch(spark: SparkSession, sfDir: String): DataFrame = {
    // NO projection before winnowing: this keeps the postings plan
    // canonically EQUAL to the graph bench group's (containmentOn tracks
    // winnowingOn over the same unprojected table), so the corpus winnow
    // is billed once to the group's generator; Catalyst prunes the
    // columns at the scan either way
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val fps = graft.CachedFrames.track(graphIndexFps(docs))
    val df = graft.CachedFrames.track(graphIndexDfOf(fps))
    val sizes = graphIndexSizesOf(fps, dfCap = BindingDfCap)
    graphForgetEdgePatch(docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id")),
      fps, df, sizes, dfCap = BindingDfCap)
  }

  lazy val q260ForgetEdgePatchSql: String = s"""
    WITH fp AS (SELECT * FROM ($q67WinnowingSql)),
    sfp AS (SELECT * FROM fp WHERE doc_id % 2 != 0),
    dfp AS (SELECT * FROM fp WHERE doc_id % 2 = 0),
    ad AS (SELECT fp, CAST(count(*) AS BIGINT) AS fdf FROM fp GROUP BY 1),
    dd AS (SELECT fp, CAST(count(*) AS BIGINT) AS ddf FROM dfp GROUP BY 1),
    xfp AS (
      SELECT ad.fp FROM ad JOIN dd USING (fp)
      WHERE ad.fdf > $BindingDfCap AND ad.fdf - dd.ddf <= $BindingDfCap),
    nkeptfp AS (
      SELECT ad.fp FROM ad LEFT JOIN dd USING (fp)
      WHERE ad.fdf - coalesce(dd.ddf, CAST(0 AS BIGINT)) <= $BindingDfCap),
    skept AS (SELECT sfp.doc_id, sfp.fp FROM sfp JOIN nkeptfp USING (fp)),
    dund AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nu
             FROM sfp JOIN xfp USING (fp) GROUP BY 1),
    osz AS (
      SELECT sfp.doc_id, CAST(count(*) AS BIGINT) AS n
      FROM sfp JOIN ad USING (fp) WHERE ad.fdf <= $BindingDfCap
      GROUP BY 1),
    nsz AS (
      SELECT coalesce(o.doc_id, u.doc_id) AS doc_id,
        coalesce(o.n, CAST(0 AS BIGINT))
          + coalesce(u.nu, CAST(0 AS BIGINT)) AS n
      FROM osz o FULL OUTER JOIN dund u ON o.doc_id = u.doc_id),
    pr AS (
      SELECT DISTINCT least(a.doc_id, b.doc_id) AS id1,
        greatest(a.doc_id, b.doc_id) AS id2, a.fp
      FROM skept a JOIN skept b
        ON a.fp = b.fp AND a.doc_id <> b.doc_id),
    g AS (
      SELECT pr.id1, pr.id2, CAST(count(*) AS BIGINT) AS new_shared,
        CAST(sum(CASE WHEN x.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS x_shared
      FROM pr LEFT JOIN xfp x ON pr.fp = x.fp
      GROUP BY 1, 2)
    SELECT g.id1, g.id2, g.new_shared AS n_shared,
      CAST(g.new_shared AS DOUBLE) / CAST(n1.n AS DOUBLE) AS contain1,
      CAST(g.new_shared AS DOUBLE) / CAST(n2.n AS DOUBLE) AS contain2,
      CASE WHEN g.new_shared - g.x_shared >= $ContainMinShared
        THEN 'update' ELSE 'add' END AS op
    FROM g
    JOIN nsz n1 ON g.id1 = n1.doc_id
    JOIN nsz n2 ON g.id2 = n2.doc_id
    WHERE g.new_shared >= $ContainMinShared
      AND (g.id1 IN (SELECT doc_id FROM dund)
        OR g.id2 IN (SELECT doc_id FROM dund))
  """

  /** q240: GRAPH-INDEX ADMISSION ECONOMICS — the cost/novelty readout of
    * the q238 admission, the number an ingestion owner watches per batch:
    * how many postings the batch adds, what fraction of its fingerprints
    * the standing index had never seen (novelty — q154's question at the
    * index level: is this source still buying new content?), how many
    * standing fingerprints the batch pushed over the df cap (index CHURN —
    * each crossing invalidates postings corpus-wide and is exactly what
    * the full-refresh report re-prices), and the incident-edge yield per
    * admitted document (duplication pressure of the batch against the
    * corpus). Same deterministic corpus split as q238.
    *
    * Exactness: six exact counts + two single divisions. Scale shape: the
    * q238 admission shapes plus two fp-keyed anti/equi joins bounded by
    * the batch's fingerprint set; 1 row out. */
  def q240GraphAdmitEconomics(spark: SparkSession, sfDir: String): DataFrame = {
    val (batch, bfpsSplit, fps, df, sizes) = q238IndexTables(spark, sfDir)
    val bfps = graft.CachedFrames.track(bfpsSplit)
    val bdf = graft.CachedFrames.track(
      bfps.groupBy(col("fp")).agg(count(lit(1)).as("bdf")))
    val nDocs = batch.agg(count(lit(1)).as("n_batch_docs"))
    val bstats = bfps.agg(count(lit(1)).as("n_batch_postings"))
    val bDistinct = bdf.agg(count(lit(1)).as("n_batch_fps"))
    val novel = bdf.join(df, Seq("fp"), "left_anti")
      .agg(count(lit(1)).as("n_novel_fps"))
    val crossing = df.join(bdf, "fp")
      .filter(col("fdf") <= ContainDfCap &&
        col("fdf") + col("bdf") > ContainDfCap)
      .agg(count(lit(1)).as("n_crossing_fps"))
    val edges = graphAdmitFromPostings(bfpsSplit, fps, df, sizes)
      .agg(count(lit(1)).as("n_incident_edges"))
    nDocs.crossJoin(broadcast(bstats)).crossJoin(broadcast(bDistinct))
      .crossJoin(broadcast(novel)).crossJoin(broadcast(crossing))
      .crossJoin(broadcast(edges))
      .select(col("n_batch_docs"), col("n_batch_postings"),
        col("n_batch_fps"), col("n_novel_fps"), col("n_crossing_fps"),
        col("n_incident_edges"),
        when(col("n_batch_fps") > 0, col("n_novel_fps").cast("double")
          / col("n_batch_fps").cast("double")).as("novelty_rate"),
        when(col("n_batch_docs") > 0, col("n_incident_edges").cast("double")
          / col("n_batch_docs").cast("double")).as("edges_per_doc"))
  }

  // lazy: interpolates q67WinnowingSql and q238GraphAdmitSql, declared later
  lazy val q240GraphAdmitEconomicsSql: String = s"""
    WITH fpall AS (SELECT * FROM ($q67WinnowingSql)),
    bf AS (SELECT doc_id, fp FROM fpall WHERE doc_id % 5 = 0),
    basef AS (SELECT doc_id, fp FROM fpall WHERE doc_id % 5 <> 0),
    bd AS (SELECT fp, CAST(count(*) AS BIGINT) AS bdf FROM bf GROUP BY 1),
    sd AS (SELECT fp, CAST(count(*) AS BIGINT) AS fdf FROM basef GROUP BY 1),
    ndocs AS (SELECT CAST(count(*) AS BIGINT) AS n_batch_docs
              FROM documents WHERE doc_id % 5 = 0),
    bstats AS (SELECT CAST(count(*) AS BIGINT) AS n_batch_postings FROM bf),
    bdist AS (SELECT CAST(count(*) AS BIGINT) AS n_batch_fps FROM bd),
    novel AS (SELECT CAST(count(*) AS BIGINT) AS n_novel_fps
              FROM bd ANTI JOIN sd USING (fp)),
    crossing AS (SELECT CAST(count(*) AS BIGINT) AS n_crossing_fps
                 FROM sd JOIN bd USING (fp)
                 WHERE sd.fdf <= $ContainDfCap
                   AND sd.fdf + bd.bdf > $ContainDfCap),
    edges AS (SELECT CAST(count(*) AS BIGINT) AS n_incident_edges
              FROM ($q238GraphAdmitSql))
    SELECT n_batch_docs, n_batch_postings, n_batch_fps, n_novel_fps,
      n_crossing_fps, n_incident_edges,
      CASE WHEN n_batch_fps > 0 THEN
        CAST(n_novel_fps AS DOUBLE) / CAST(n_batch_fps AS DOUBLE)
      END AS novelty_rate,
      CASE WHEN n_batch_docs > 0 THEN
        CAST(n_incident_edges AS DOUBLE) / CAST(n_batch_docs AS DOUBLE)
      END AS edges_per_doc
    FROM ndocs, bstats, bdist, novel, crossing, edges
  """

  /** The q68 containment SQL parameterized by cap and support — q251 runs
    * the identical pipeline at a cap the current tables actually BIND. */
  private[graft] def containmentSqlAt(dfCap: Int, minShared: Int): String = s"""
    WITH fp AS (SELECT * FROM ($q67WinnowingSql)),
    kept AS (
      SELECT fp.doc_id, fp.fp FROM fp
      JOIN (SELECT fp, count(*) AS fdf FROM fp GROUP BY fp
            HAVING count(*) <= $dfCap) ok ON fp.fp = ok.fp),
    sizes AS (SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= $minShared)
    SELECT p.id1, p.id2, p.n_shared,
      CAST(p.n_shared AS DOUBLE) / CAST(s1.n_fp AS DOUBLE) AS contain1,
      CAST(p.n_shared AS DOUBLE) / CAST(s2.n_fp AS DOUBLE) AS contain2
    FROM pairs p
    JOIN sizes s1 ON p.id1 = s1.doc_id
    JOIN sizes s2 ON p.id2 = s2.doc_id
  """

  val q68ContainmentSql: String =
    containmentSqlAt(ContainDfCap, ContainMinShared)

  /** q61 tuning: signature width (top terms per doc) / query batch bound /
    * neighbours kept. */
  private[ops] val SimSigTerms = 10
  private[ops] val SimQueryIds = 100
  private[ops] val SimTopK = 5

  /** q61: sparse TF-IDF cosine similarity through a token inverted index —
    * the classic sub-quadratic document-similarity join (near-dup / search
    * both use it). Each document is reduced to its top-[[SimSigTerms]]
    * TF-IDF terms (per-doc pruning bounds every posting list regardless of
    * how hot a token is — THE trick that keeps postings joins from
    * exploding on stopword-like terms at corpus scale); a bounded query
    * batch joins the postings on token, partial dot products aggregate per
    * (qid, did) pair, and cosine normalizes by the pruned-vector norms.
    *
    * Scale shape (100 TB): the signature stage is one (doc, token)
    * aggregation + one top-k window per doc; the tiny df frame broadcasts
    * back; the query batch's postings (|queries| × SimSigTerms rows)
    * BROADCAST against the corpus postings, so the corpus index is touched
    * by exactly one shuffle (by token) no matter how many query batches
    * run. Dot products and norms use the fixed-point DECIMAL fold (floor
    * at 1e12), so the result is shuffle-order-proof and matches DuckDB
    * bitwise.
    *
    * Magnitude bound: the raw-ratio IDF (N+1)/(df+1) — chosen over log IDF
    * for bitwise oracle parity, see [[q44TfDf]] — grows with corpus size,
    * and squared weights × 1e12 must stay inside DECIMAL(38,0). That holds
    * to ~1e13 per weight (≈ trillion-doc corpora with small tf); past it,
    * swap in log IDF with a tolerance-checked double fold, or split the
    * fixed point across two DECIMAL columns.
    */
  def q61TfidfCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    // cached: feeds both the weight projection and the df aggregation —
    // without it Catalyst re-explodes and re-aggregates the whole scan for df
    val tf = graft.CachedFrames.track(docs
      .select(col("doc_id"), explode(expr("""split(trim(text), '\\s+')""")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
    val dfFrame = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // counted on the BARE scan (metadata-cheap), not the parallelized
    // frame — counting the latter executes its repartition shuffle just to
    // obtain N (same pattern as q44)
    val nDocs = Tables(spark, sfDir, "documents").count().toDouble
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("weight").desc, col("token").asc)
    // top-K signature terms per document (the pruned sparse vector)
    val sig = graft.CachedFrames.track(
      tf.join(broadcast(dfFrame), "token")
        .withColumn("weight",
          col("tf").cast("double") * (lit(nDocs + 1.0) / (col("df").cast("double") + lit(1.0))))
        .withColumn("trk", row_number().over(wDoc))
        .filter(col("trk") <= SimSigTerms)
        .select(col("doc_id"), col("token"), col("weight")))
    def fixedSum(c: org.apache.spark.sql.Column) =
      sum(floor(c * lit(1e12)).cast("decimal(38,0)")).cast("double") / lit(1e12)
    val norms = sig.groupBy(col("doc_id"))
      .agg(sqrt(fixedSum(col("weight") * col("weight"))).as("nrm"))
    val qSide = sig.filter(col("doc_id") < SimQueryIds)
      .select(col("doc_id").as("qid"), col("token"), col("weight").as("qw"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("did").asc)
    broadcast(qSide)
      .join(sig.select(col("doc_id").as("did"), col("token"), col("weight").as("dw")),
        "token")
      .filter(col("qid") =!= col("did"))
      .groupBy(col("qid"), col("did"))
      .agg(fixedSum(col("qw") * col("dw")).as("dot"))
      // query norms are batch-bounded -> safe to broadcast; candidate norms
      // are CORPUS-sized, so that join carries no hint (AQE broadcasts it
      // locally; at scale it is a shuffle join on did, never a broadcast of
      // one row per document)
      .join(broadcast(norms.filter(col("doc_id") < SimQueryIds)
        .select(col("doc_id").as("qid"), col("nrm").as("qn"))), "qid")
      .join(norms.select(col("doc_id").as("did"), col("nrm").as("dn")), "did")
      .withColumn("cos", col("dot") / (col("qn") * col("dn")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= SimTopK)
      .select(col("qid"), col("did"), col("rk"), col("cos"))
  }

  val q61TfidfCosineSql: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    sig AS (
      SELECT doc_id, token, weight FROM (
        SELECT tf.doc_id, tf.token,
          CAST(tf.tf AS DOUBLE) * ((n.n_docs + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)) AS weight,
          row_number() OVER (PARTITION BY tf.doc_id
                             ORDER BY CAST(tf.tf AS DOUBLE) * ((n.n_docs + 1.0)
                               / (CAST(df.df AS DOUBLE) + 1.0)) DESC, tf.token ASC) AS trk
        FROM tf JOIN df USING (token) CROSS JOIN n)
      WHERE trk <= $SimSigTerms),
    nrm AS (
      SELECT doc_id,
        sqrt(CAST(CAST(sum(CAST(floor(weight * weight * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12) AS nrm
      FROM sig GROUP BY doc_id),
    dots AS (
      SELECT q.doc_id AS qid, d.doc_id AS did,
        CAST(CAST(sum(CAST(floor(q.weight * d.weight * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12 AS dot
      FROM sig q JOIN sig d USING (token)
      WHERE q.doc_id < $SimQueryIds AND q.doc_id <> d.doc_id
      GROUP BY 1, 2)
    SELECT qid, did, CAST(rk AS INTEGER) AS rk, cos FROM (
      SELECT qid, did, dots.dot / (nq.nrm * nd.nrm) AS cos,
        row_number() OVER (PARTITION BY qid
                           ORDER BY dots.dot / (nq.nrm * nd.nrm) DESC, did ASC) AS rk
      FROM dots
      JOIN nrm nq ON dots.qid = nq.doc_id
      JOIN nrm nd ON dots.did = nd.doc_id)
    WHERE rk <= $SimTopK
  """

  /** q73: temperature-scaled mixture weights — the standard multilingual /
    * multi-source rebalancing: sample source s with probability
    * share_s^α / Σ share^α, flattening the mixture toward uniform as α→0.
    * α is PINNED at 0.5 because sqrt is IEEE-exact in both engines while a
    * general pow differs in the last ulp (same reason the quality score
    * avoids ln); the Σ over sources folds floor-based fixed-point DECIMAL
    * so normalization is shuffle-order-proof. Output: per source, its
    * token share, temperature share, and the upsample factor
    * (temp_share / share — > 1 means the source is over-sampled).
    *
    * Scale shape: identical to q69 — per-source partials reduce the corpus
    * to |sources| rows; both scalars (total, z) arrive as broadcast
    * cross-joins of one-row aggregates over the cached per-source frame
    * (the oracle's CTE shape; avoids the empty-partition window and its
    * `No Partition Defined` log noise). */
  def q73TemperatureMix(spark: SparkSession, sfDir: String): DataFrame =
    temperatureMixOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** [[q73TemperatureMix]]'s core over ANY (source, text) frame. */
  private[ops] def temperatureMixOn(docs: DataFrame): DataFrame = {
    val perSource = graft.CachedFrames.track(docs
      .select(col("source"),
        expr("""size(split(trim(text), '\\s+'))""").cast("long").as("n_tokens"))
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("tokens")))
    // x is |sources| rows off the cached frame — recomputing its lineage
    // for the z aggregate below costs nothing corpus-sized
    val x = perSource
      .crossJoin(broadcast(perSource.agg(sum(col("tokens")).as("total"))))
      .withColumn("share", col("tokens").cast("double") / col("total").cast("double"))
      .withColumn("sq", sqrt(col("share")))
    val z = x.agg((sum(expr("CAST(floor(sq * 1e15) AS DECIMAL(38,0))"))
      .cast("double") / lit(1e15)).as("z"))
    x.crossJoin(broadcast(z))
      .select(col("source"), col("tokens"), col("share"),
        (col("sq") / col("z")).as("temp_share"),
        ((col("sq") / col("z")) / col("share")).as("upsample"))
  }

  val q73TemperatureMixSql: String = """
    WITH s AS (
      SELECT source,
        CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
      FROM documents GROUP BY 1),
    t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM s),
    x AS (
      SELECT source, tokens,
        CAST(tokens AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        sqrt(CAST(tokens AS DOUBLE) / CAST(t.total AS DOUBLE)) AS sq
      FROM s CROSS JOIN t),
    z AS (SELECT CAST(CAST(sum(CAST(floor(sq * 1e15) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e15 AS z
          FROM x)
    SELECT source, tokens, share, sq / z.z AS temp_share,
      (sq / z.z) / share AS upsample
    FROM x CROSS JOIN z
  """

  /** q72: per-source token-distribution drift — the shift monitor a mixed
    * training corpus runs per snapshot: for every source s, the L1 (total
    * variation ×2) distance between s's token distribution p and the
    * rest-of-corpus distribution q. Computed over s's own vocabulary only,
    * using L1 = 1 + Σ_{t∈Vs} (|p_t − q_t| − q_t) — tokens the source never
    * emits contribute exactly their q mass, which the constant 1 absorbs —
    * so no outer join over the union vocabulary is needed.
    *
    * Float parity: per-token terms are pure rational double arithmetic
    * (bitwise portable — no ln/exp, which differ in the last ulp between
    * engines); the cross-token sum folds floor-based fixed-point DECIMAL
    * (the q31/q61 trick) so it is exact and shuffle-order-proof.
    *
    * Scale shape: one explode→(source, token) aggregation, a token-keyed
    * join against the global counts (linear, both sides shuffle once on
    * token), broadcast-sized per-source totals, and a broadcast one-row
    * grand total. Vocabulary never concentrates on one node.
    *
    * Degenerate case: a single-source corpus has no rest-of-corpus, so
    * `t - n_tokens = 0` and the guarded division yields `l1_drift = NULL`
    * (both engines agree) — callers monitoring drift should treat NULL as
    * "no comparison population", not zero drift. */
  def q72SourceDrift(spark: SparkSession, sfDir: String): DataFrame =
    sourceDriftOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** [[q72SourceDrift]]'s core over ANY (source, text) frame — the spec
    * drives it with crafted sources pinning the L1 boundary cases
    * (identical distribution → 0, disjoint vocabulary → 2). */
  private[ops] def sourceDriftOn(docs: DataFrame): DataFrame = {
    val st = graft.CachedFrames.track(docs
        .select(col("source"), explode(expr("""split(trim(text), '\\s+')""")).as("token"))
        .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c")))
    val g = st.groupBy(col("token")).agg(sum(col("c")).as("g"))
    // per-source totals are |sources| rows — cached so the one-row grand
    // total below folds them instead of re-aggregating the token frame
    val totBase = graft.CachedFrames.track(st.groupBy(col("source")).agg(
        sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab")))
    val tot = totBase
      .crossJoin(broadcast(totBase.agg(sum(col("n_tokens")).as("t"))))
    st.join(g, "token")
      .join(broadcast(tot), "source")
      .withColumn("term", expr("""
        CAST(floor((abs(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            - CAST(g - c AS DOUBLE) / CAST(nullif(t - n_tokens, 0) AS DOUBLE))
          - CAST(g - c AS DOUBLE) / CAST(nullif(t - n_tokens, 0) AS DOUBLE)) * 1e15)
          AS DECIMAL(38,0))"""))
      .groupBy(col("source"))
      .agg(max(col("n_tokens")).as("n_tokens"), max(col("vocab")).as("vocab"),
        (lit(1.0) + sum(col("term")).cast("double") / lit(1e15)).as("l1_drift"))
  }

  val q72SourceDriftSql: String = """
    WITH st AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents),
    c AS (SELECT source, token, count(*) AS c FROM st GROUP BY 1, 2),
    g AS (SELECT token, CAST(sum(c) AS BIGINT) AS g FROM c GROUP BY 1),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS vocab FROM c GROUP BY 1),
    grand AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM tot),
    terms AS (
      SELECT c.source,
        CAST(floor((abs(CAST(c.c AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE)
            - CAST(g.g - c.c AS DOUBLE) / CAST(nullif(grand.t - tot.n_tokens, 0) AS DOUBLE))
          - CAST(g.g - c.c AS DOUBLE) / CAST(nullif(grand.t - tot.n_tokens, 0) AS DOUBLE)) * 1e15)
          AS DECIMAL(38,0)) AS term,
        tot.n_tokens, tot.vocab
      FROM c JOIN g USING (token) JOIN tot USING (source) CROSS JOIN grand)
    SELECT source, max(n_tokens) AS n_tokens, max(vocab) AS vocab,
      1.0 + CAST(sum(term) AS DOUBLE) / 1e15 AS l1_drift
    FROM terms GROUP BY source
  """

  /** q84: the first BPE merge round — adjacent character-pair frequencies
    * over the whitespace vocabulary, the statistic a byte-pair-encoding
    * tokenizer trainer maximizes at every merge step. Counting over the
    * (token, freq) vocabulary instead of raw text makes each merge round
    * a |vocab|-sized job rather than a corpus scan — exactly how BPE
    * trainers iterate (apply the winning merge to the vocab, recount);
    * the corpus is touched once, for the vocab itself. Top-50 pairs by
    * (n DESC, pair ASC) — a total order, so the cut is deterministic.
    *
    * Scale shape: corpus → vocab is q43's explode + map-side-combinable
    * count; vocab → pairs is a bounded explode (token length) + one more
    * combinable aggregation; the cut is TakeOrderedAndProject. */
  def q84BpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(explode(expr("""split(trim(text), '\\s+')""")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(length(col("token")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(token) - 1), i -> substring(token, i, 2))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(50)

  val q84BpeMergesSql: String = """
    WITH vocab AS (
      SELECT token, count(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents)
      GROUP BY token),
    pairs AS (
      SELECT substr(v.token, i.i, 2) AS pair, v.freq
      FROM vocab v, LATERAL (SELECT unnest(generate_series(1, len(v.token) - 1)) AS i) i
      WHERE len(v.token) >= 2)
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair ASC
    LIMIT 50
  """

  /** q90: per-domain quality cap — keep the best [[DomainCap]] documents per
    * source by blended quality score (ties broken by doc_id), the domain-
    * balancing step a curation pipeline runs so one crawl domain cannot
    * dominate the training mixture.
    *
    * Scale shape: a naive per-source `row_number` would buffer whole sources,
    * but because the rank is immediately filtered to `<= DomainCap` Spark
    * plans a `WindowGroupLimit` — each map task keeps only its local top-K
    * per source BEFORE the shuffle, so the exchange carries at most
    * K × tasks rows per source (never the corpus) and the final per-source
    * pass ranks those survivors only. Pinned in PlanSpec. */
  val DomainCap = 10
  def q90DomainCap(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    qualityScored(spark, sfDir)
      .select(col("source"), col("doc_id"), col("quality_score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= DomainCap)
  }

  val q90DomainCapSql: String = s"""
    WITH x AS (
      SELECT doc_id, source,
        $nCharsSql AS n_chars_m,
        $nTokensSql AS n_tokens,
        CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
        $nPunctSql AS n_punct
      FROM documents),
    s AS (
      SELECT source, doc_id, $qualityFromStatsSql AS quality_score FROM x),
    r AS (
      SELECT source, doc_id, quality_score,
        row_number() OVER (PARTITION BY source
                           ORDER BY quality_score DESC, doc_id ASC) AS rk
      FROM s)
    SELECT source, doc_id, quality_score, CAST(rk AS INTEGER) AS rk
    FROM r WHERE rk <= $DomainCap
  """

  /** q92: CCNet-style language-model quality scoring — an add-one-smoothed
    * bigram LM is trained on a deterministic reference slice of the corpus
    * (doc_id % [[LmRefMod]] = 0, standing in for the curated target domain)
    * and every document is scored by its per-token cross-entropy under
    * that LM. The filter a CCNet pipeline thresholds on.
    *
    * Float policy: ln()/exp() differ in the last ulp across libm
    * implementations (the q44 scaladoc's rule), so the oracle-checked score
    * is the INTEGER-QUANTIZED cross-entropy in bits: each token costs
    * `length(bin(floor(1/p)))` — the bit length of its integer inverse
    * probability, i.e. ceil-to-1-bit of −log2 p — where floor(1/p) is a
    * single double division of integer-valued counts (bitwise portable) and
    * bin() is the exact binary rendering both engines share. avg_bits is
    * then one exact division; callers wanting true perplexity compute
    * 2^avg_bits downstream (one non-gated projection). Token costs are
    * integers, so the per-document sum is order-insensitive by construction.
    *
    * Model: p(t₁) = (c(t₁)+1)/(N+V+1); p(tᵢ|tᵢ₋₁) =
    * (c(tᵢ₋₁,tᵢ)+1)/(c(tᵢ₋₁)+V+1) — unseen tokens/bigrams fall back to
    * the smoothing mass, so every document scores. The symbol inventory is
    * VOCAB-CUT (below): V counts mapped symbols, never raw token diversity.
    *
    * Vocab cut: the LM's symbol set is the top-[[LmVocabV]] reference-slice
    * unigrams by (count desc, token asc — a deterministic total order);
    * every other token maps to the reserved [[LmOov]] symbol, whose unigram
    * row carries the residual out-of-vocab mass (the row exists even at
    * count 0, exactly as a tokenizer reserves `<unk>`). Bigram counts are
    * taken over the MAPPED token stream, so both tables are bounded by
    * construction — uni ≤ V+1 rows, big ≤ (V+1)² rows — no matter the
    * corpus's raw token diversity. Scoring maps each token the same way:
    * a probe that misses the capped unigram table is out-of-vocab and
    * falls back to the `<oov>` count (and the `<oov>` bigram key). This is
    * what keeps the broadcast LM a fixed-size artifact at 100 TB, where
    * the raw whitespace vocabulary of a reference slice is unbounded.
    *
    * Scale shape: the LM tables are V-bounded aggregates of the reference
    * slice (map-side-combinable counts; the top-V cut plans as a
    * per-partition partial top-V + V-row merge, not a full vocabulary
    * sort), broadcast against the position-exploded corpus — the corpus
    * itself is scanned ONCE and never shuffled; the per-doc rollup is a
    * combinable sum on doc_id. N, V and the `<oov>` count ride along as a
    * broadcast 1-row aggregate, not driver-side actions. */
  val LmRefMod = 10

  /** The LM's vocabulary budget: symbols beyond the top-V unigrams map to
    * [[LmOov]]. 16 is deliberately below the synthetic corpus's 31-token
    * whitespace vocabulary so every test scale exercises the cut. */
  val LmVocabV = 16

  /** Reserved out-of-vocab symbol. A corpus token spelled identically
    * merges into this row's count (both engines aggregate by the mapped
    * key, so the merge is bitwise-consistent — quirky but harmless). */
  val LmOov = "<oov>"

  def q92LmBits(spark: SparkSession, sfDir: String): DataFrame =
    lmBitsOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The vocab-cut add-one bigram LM tables behind q92, built from any
    * (doc_id, text) frame's reference slice: (uni, big, nv) = mapped
    * unigram counts (≤ V+1 rows, `<oov>` always present), mapped bigram
    * counts (≤ (V+1)² rows), and the 1-row (lm_n, lm_v, c_oov) totals.
    * Shared by the batch scorer and the streaming quality gate (which
    * collapses them to maps). The reference token slice is cached (it
    * feeds both tables — untracked, the corpus filter+split would run
    * twice), as are the raw and mapped unigram tables; the caller's
    * thread drains all three. */
  private[graft] def lmTables(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val ref = graft.CachedFrames.track(
      docs.filter(col("doc_id") % LmRefMod === 0)
        .select(expr("""split(trim(text), '\\s+')""").as("toks")))
    val rawUni = graft.CachedFrames.track(
      ref.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c")))
    // the vocab cut: top-V by (count desc, token asc) — Spark plans
    // orderBy+limit as TakeOrderedAndProject (per-partition partial top-V,
    // then a V-row merge), so no full sort of the raw vocabulary happens
    // even when that vocabulary is corpus-sized
    val vocab = rawUni.orderBy(col("c").desc, col("w").asc).limit(LmVocabV)
      .select(col("w").as("vw"))
    // mapped unigram LM table: out-of-vocab mass collapses into the one
    // reserved <oov> row, injected unconditionally so lm_v always counts
    // the reserved symbol (a tokenizer's <unk> slot) and an empty slice
    // still yields a well-formed 1-row LM
    val uni = graft.CachedFrames.track(
      rawUni.join(broadcast(vocab), col("w") === col("vw"), "left")
        .select(when(col("vw").isNull, lit(LmOov)).otherwise(col("w")).as("w"),
          col("c"))
        .unionByName(docs.sparkSession.range(1)
          .select(lit(LmOov).as("w"), lit(0L).as("c")))
        .groupBy(col("w")).agg(sum(col("c")).as("c")))
    // coalesce: an EMPTY reference slice (no doc_id hits the mod) must
    // degrade to the all-smoothing-mass LM, not propagate a NULL total
    val nv = uni.agg(coalesce(sum(col("c")), lit(0L)).cast("double").as("lm_n"),
      count(lit(1)).cast("double").as("lm_v"),
      coalesce(max(when(col("w") === LmOov, col("c"))), lit(0L))
        .cast("double").as("c_oov"))
    // bigram table over the MAPPED stream: both sides remapped through the
    // broadcast vocab before counting, so the key space is (V+1)²-bounded
    val v1 = vocab.select(col("vw").as("v1w"))
    val v2 = vocab.select(col("vw").as("v2w"))
    val big = ref.filter(expr("size(toks) >= 2"))
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("p"))
      .join(broadcast(v1), col("p.w1") === col("v1w"), "left")
      .join(broadcast(v2), col("p.w2") === col("v2w"), "left")
      .groupBy(
        when(col("v1w").isNull, lit(LmOov)).otherwise(col("p.w1")).as("w1"),
        when(col("v2w").isNull, lit(LmOov)).otherwise(col("p.w2")).as("w2"))
      .agg(count(lit(1)).as("cb"))
    (uni, big, nv)
  }

  private[graft] def lmBitsOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), expr("""split(trim(text), '\\s+')""").as("toks"))
    val (uni, big, nv) = lmTables(docs)
    val stream = toks
      .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("i", "w")))
      .withColumn("prev", expr("CASE WHEN i >= 1 THEN toks[i - 1] END"))
      .drop("toks")
    stream
      .join(broadcast(uni.select(col("w"), col("c").as("c_cur"))), Seq("w"), "left")
      .join(broadcast(uni.select(col("w").as("prev"), col("c").as("c_prev"))),
        Seq("prev"), "left")
      // vocab mapping at scoring time: a token that missed the capped
      // unigram table IS out-of-vocab — remap it to <oov> before the
      // bigram probe so the probe key matches the mapped table (prev_m
      // stays NULL for the document-initial token: a NULL key never
      // matches, and that row takes the unigram branch anyway)
      .withColumn("w_m",
        expr(s"CASE WHEN c_cur IS NULL THEN '$LmOov' ELSE w END"))
      .withColumn("prev_m", expr(
        s"CASE WHEN prev IS NOT NULL AND c_prev IS NULL THEN '$LmOov' ELSE prev END"))
      .join(broadcast(big.select(col("w1").as("prev_m"), col("w2").as("w_m"),
        col("cb"))), Seq("prev_m", "w_m"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("inv", expr(
        """CASE WHEN prev IS NULL
             THEN CAST(floor((lm_n + lm_v + 1.0)
                    / (coalesce(CAST(c_cur AS DOUBLE), c_oov) + 1.0)) AS BIGINT)
             ELSE CAST(floor((coalesce(CAST(c_prev AS DOUBLE), c_oov) + lm_v + 1.0)
                    / (CAST(coalesce(cb, 0) AS DOUBLE) + 1.0)) AS BIGINT) END"""))
      .withColumn("bits", length(bin(col("inv"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
      .withColumn("avg_bits",
        col("sum_bits").cast("double") / col("n_tokens").cast("double"))
  }

  val q92LmBitsSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    ref AS (SELECT * FROM t WHERE doc_id % $LmRefMod = 0),
    rawuni AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(tk) AS w FROM ref) GROUP BY 1),
    vocab AS (
      SELECT w FROM rawuni ORDER BY c DESC, w ASC LIMIT $LmVocabV),
    uni AS (
      SELECT w, CAST(sum(c) AS BIGINT) AS c FROM (
        SELECT CASE WHEN v.w IS NULL THEN '$LmOov' ELSE r.w END AS w, r.c
        FROM rawuni r LEFT JOIN vocab v ON r.w = v.w
        UNION ALL SELECT '$LmOov' AS w, 0 AS c)
      GROUP BY 1),
    nv AS (
      SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS lm_n,
        CAST(count(*) AS DOUBLE) AS lm_v,
        CAST(coalesce(max(CASE WHEN w = '$LmOov' THEN c END), 0) AS DOUBLE) AS c_oov
      FROM uni),
    big AS (
      SELECT w1, w2, count(*) AS cb FROM (
        SELECT CASE WHEN v1.w IS NULL THEN '$LmOov' ELSE p.w1 END AS w1,
               CASE WHEN v2.w IS NULL THEN '$LmOov' ELSE p.w2 END AS w2
        FROM (SELECT tk[i.idx] AS w1, tk[i.idx + 1] AS w2
              FROM ref, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS idx) i
              WHERE len(tk) >= 2) p
        LEFT JOIN vocab v1 ON p.w1 = v1.w
        LEFT JOIN vocab v2 ON p.w2 = v2.w)
      GROUP BY 1, 2),
    s AS (
      SELECT doc_id, tk[i.idx] AS w,
        CASE WHEN i.idx > 1 THEN tk[i.idx - 1] END AS prev
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS idx) i),
    j AS (
      SELECT s.doc_id,
        CASE WHEN s.prev IS NULL
          THEN CAST(floor((nv.lm_n + nv.lm_v + 1.0)
                 / (coalesce(CAST(u1.c AS DOUBLE), nv.c_oov) + 1.0)) AS BIGINT)
          ELSE CAST(floor((coalesce(CAST(u2.c AS DOUBLE), nv.c_oov) + nv.lm_v + 1.0)
                 / (CAST(coalesce(b.cb, 0) AS DOUBLE) + 1.0)) AS BIGINT) END AS inv
      FROM s CROSS JOIN nv
      LEFT JOIN uni u1 ON s.w = u1.w
      LEFT JOIN uni u2 ON s.prev = u2.w
      LEFT JOIN big b
        ON b.w1 = (CASE WHEN s.prev IS NULL THEN NULL
                        WHEN u2.c IS NULL THEN '$LmOov' ELSE s.prev END)
       AND b.w2 = (CASE WHEN u1.c IS NULL THEN '$LmOov' ELSE s.w END))
    SELECT doc_id, count(*) AS n_tokens,
      CAST(sum(length(bin(inv))) AS BIGINT) AS sum_bits,
      CAST(sum(length(bin(inv))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bits
    FROM j GROUP BY 1
  """

  /** q97: BPE vocabulary training — [[BpeRounds]] actual merge rounds on
    * top of q84's pair statistics, i.e. the loop a byte-pair-encoding
    * trainer runs: count adjacent symbol pairs over the weighted
    * vocabulary, MERGE the most frequent pair (ties: pair ascending —
    * a total order), respell the vocabulary, recount. Emits the learned
    * merge table (rank, pair, n) — the artifact a tokenizer ships.
    *
    * Merge application contract: each round applies the winning pair as
    * [[BpeReplacePasses]] passes of space-padded literal `replace` —
    * left-to-right, non-overlapping, identical semantics in Spark and
    * DuckDB — so runs of repeated symbols converge deterministically (a
    * run of L pattern repeats resolves within log2 passes; words here are
    * far below the 2^passes bound). The contract is the fixed-pass
    * function itself, applied identically in both engines.
    *
    * Scale shape: the corpus is touched ONCE (q43's explode + combinable
    * count → the weighted vocabulary, cached); every round after that is
    * a |vocab|-sized job — a bounded explode, a combinable sum, a 1-row
    * TakeOrderedAndProject collect (the argmax is the only driver scalar,
    * like q44's corpus count), and a pure respell projection. K rounds
    * cost K vocab-local jobs, never K corpus scans — exactly how BPE
    * trainers iterate (q84's scaladoc promise, now implemented). */
  val BpeRounds = 5
  private[graft] val BpeReplacePasses = 4

  def q97BpeTrain(spark: SparkSession, sfDir: String): DataFrame =
    bpeTrainOn(Tables.parallelized(Tables(spark, sfDir, "documents")), BpeRounds)

  private[graft] def bpeTrainOn(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainMerges(docs, rounds).toDF("rank", "pair", "n")
      .select(col("rank").cast("int").as("rank"), col("pair"), col("n"))
  }

  /** The trained merge list as driver values — (rank, "a b" pair, count)
    * in merge order. This IS the tokenizer artifact: [[bpeTrainOn]] wraps
    * it as q97's result frame, and [[bpeEncodeOn]] folds it into the
    * encode projection. K driver scalars total (the per-round 1-row
    * argmax), exactly how BPE trainers iterate. */
  private[graft] def bpeTrainMerges(docs: DataFrame,
      rounds: Int): Seq[(Int, String, Long)] = {
    // weighted vocabulary, spelled as space-separated characters
    var vocab = graft.CachedFrames.track(
      docs.select(explode(expr("""split(trim(text), '\\s+')""")).as("token"))
        .filter(length(col("token")) >= 1)
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .withColumn("s", expr(
          "concat_ws(' ', transform(sequence(1, length(token)), i -> substring(token, i, 1)))"))
        .select(col("s"), col("freq")))
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = vocab
        .withColumn("syms", split(col("s"), " "))
        .filter(expr("size(syms) >= 2"))
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> concat(syms[i], ' ', syms[i + 1]))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        merges += ((r, pair, best(0).getLong(1)))
        val merged = pair.replace(" ", "")
        val respelled = (1 to BpeReplacePasses).foldLeft(
          concat(lit(" "), col("s"), lit(" "))) { (c, _) =>
          replace(c, lit(s" $pair "), lit(s" $merged "))
        }
        vocab = graft.CachedFrames.track(
          vocab.withColumn("s", trim(respelled)).select(col("s"), col("freq")))
        r += 1
      }
    }
    merges.toSeq
  }

  val q97BpeTrainSql: String = {
    def pairsCte(v: String, p: String) = s"""$p AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
        SELECT v.freq, sy[i.i + 1] || ' ' || sy[i.i + 2] AS pair
        FROM (SELECT freq, string_split(s, ' ') AS sy FROM $v) v,
             LATERAL (SELECT unnest(generate_series(0, len(sy) - 2)) AS i) i
        WHERE len(sy) >= 2)
      GROUP BY pair)"""
    def bestCte(p: String, b: String) =
      s"$b AS (SELECT pair, n FROM $p ORDER BY n DESC, pair ASC LIMIT 1)"
    def respellCte(v: String, b: String, nv: String) = {
      val padded = (1 to BpeReplacePasses).foldLeft("' ' || v.s || ' '") { (c, _) =>
        s"replace($c, ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ')"
      }
      s"$nv AS (SELECT trim($padded) AS s, v.freq FROM $v v CROSS JOIN $b b)"
    }
    val rounds = (1 to BpeRounds).map { r =>
      Seq(pairsCte(s"v${r - 1}", s"p$r"), bestCte(s"p$r", s"b$r")) ++
        (if (r < BpeRounds) Seq(respellCte(s"v${r - 1}", s"b$r", s"v$r")) else Nil)
    }.flatten
    val union = (1 to BpeRounds).map(r =>
      s"SELECT CAST($r AS INTEGER) AS rank, pair, n FROM b$r").mkString("\n    UNION ALL ")
    s"""
    WITH v0 AS (
      SELECT array_to_string(list_transform(range(len(token)),
               i -> substr(token, i + 1, 1)), ' ') AS s,
             count(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents)
      WHERE len(token) >= 1
      GROUP BY 1),
    ${rounds.mkString(",\n    ")}
    $union
  """
  }

  /** q98: BPE ENCODE — apply the q97-trained merge list to every document
    * and report its token count under the real tokenizer: (doc_id,
    * n_tokens whitespace words, n_chars characters entering the encoder,
    * n_bpe symbols after all merges). n_bpe is THE number a training-data
    * pipeline budgets by — sequence packing, token quotas, and cost
    * estimates all count tokenizer tokens, not whitespace words, and
    * n_chars/n_bpe is the tokenizer's compression ratio.
    *
    * Train + apply in one operator: the merge list is re-derived by
    * [[bpeTrainMerges]] (same [[BpeRounds]] rounds, same argmax
    * tie-break), then folded into ONE codegen projection — per token,
    * spell into characters and apply each merge in rank order as the same
    * [[BpeReplacePasses]] space-padded literal replaces the trainer used,
    * so encode is bitwise-faithful to training's respell function (the
    * fixed-pass contract, identical in both engines).
    *
    * Scale shape: training costs what q97 costs (one corpus pass + K
    * vocab-local rounds); encode is ONE more corpus scan with a pure
    * per-row projection — the K merge pairs ride into the plan as string
    * literals, so there is no join, no shuffle before the per-doc counts
    * (which are per-row `aggregate`s over the token array, not a groupBy).
    * At 100 TB the encode pass is scan-bound, exactly like q21. */
  def q98BpeEncode(spark: SparkSession, sfDir: String): DataFrame =
    bpeEncodeOn(Tables.parallelized(Tables(spark, sfDir, "documents")), BpeRounds)

  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** The per-token respell expression for a trained merge list: spell the
    * token (`t`) as space-separated characters, then apply each merge in
    * rank order with the trainer's exact fixed-pass padded replace. */
  private def bpeApplyExpr(merges: Seq[(Int, String, Long)]): String = {
    val spelled =
      "concat(' ', concat_ws(' ', transform(sequence(1, length(t)), i -> substring(t, i, 1))), ' ')"
    merges.sortBy(_._1).foldLeft(spelled) { case (c, (_, pair, _)) =>
      val merged = pair.replace(" ", "")
      (1 to BpeReplacePasses).foldLeft(c) { (c2, _) =>
        s"replace($c2, ' ${sqlLit(pair)} ', ' ${sqlLit(merged)} ')"
      }
    }
  }

  private[graft] def bpeEncodeOn(docs: DataFrame, rounds: Int): DataFrame = {
    val applied = bpeApplyExpr(bpeTrainMerges(docs, rounds))
    docs
      .select(col("doc_id"), expr(
        """filter(split(trim(text), '\\s+'), t -> length(t) >= 1)""").as("toks"))
      .select(col("doc_id"),
        expr("CAST(size(toks) AS BIGINT)").as("n_tokens"),
        expr("CAST(aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x) AS BIGINT)")
          .as("n_chars"),
        expr(s"CAST(aggregate(transform(toks, t -> size(split(trim($applied), ' '))), 0, (a, x) -> a + x) AS BIGINT)")
          .as("n_bpe"))
  }

  /** Append `n_bpe` under an ALREADY-TRAINED merge list — q98's encode
    * pass decoupled from training, so `cli.EncodeCorpus` can apply a
    * persisted tokenizer artifact without retraining. Appends ONLY the
    * tokenizer count (whitespace/char stats are one-expression scans any
    * caller can add) and keeps every input column untouched — the
    * corpus-rewrite shape, like MaskCorpus. */
  private[graft] def bpeWithNBpe(docs: DataFrame,
      merges: Seq[(Int, String, Long)]): DataFrame = {
    val applied = bpeApplyExpr(merges)
    docs.withColumn("n_bpe", expr(
      s"""CAST(aggregate(transform(
            filter(split(trim(text), '\\\\s+'), t0 -> length(t0) >= 1),
            t -> size(split(trim($applied), ' '))), 0, (a, x) -> a + x) AS BIGINT)"""))
  }

  // ---- shared DuckDB fragments for the BPE trainer's merge chain ----
  // (object-level so q98's encode oracle and q113's fertility oracle fold
  // the IDENTICAL train CTEs — a trainer tweak lands in both at once)
  private def bpePairsCteSql(v: String, p: String) = s"""$p AS (
      SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
        SELECT v.freq, sy[i.i + 1] || ' ' || sy[i.i + 2] AS pair
        FROM (SELECT freq, string_split(s, ' ') AS sy FROM $v) v,
             LATERAL (SELECT unnest(generate_series(0, len(sy) - 2)) AS i) i
        WHERE len(sy) >= 2)
      GROUP BY pair)"""
  private def bpeBestCteSql(p: String, b: String) =
    s"$b AS (SELECT pair, n FROM $p ORDER BY n DESC, pair ASC LIMIT 1)"
  private def bpeRespellCteSql(v: String, b: String, nv: String) = {
    val padded = (1 to BpeReplacePasses).foldLeft("' ' || v.s || ' '") { (c, _) =>
      s"replace($c, ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ')"
    }
    s"$nv AS (SELECT trim($padded) AS s, v.freq FROM $v v CROSS JOIN $b b)"
  }
  /** The v0 weighted-vocabulary CTE + K merge-round CTEs (p_r/b_r/v_r). */
  private def bpeTrainCtesSql: String = {
    val trainCtes = (1 to BpeRounds).map { r =>
      Seq(bpePairsCteSql(s"v${r - 1}", s"p$r"), bpeBestCteSql(s"p$r", s"b$r")) ++
        (if (r < BpeRounds) Seq(bpeRespellCteSql(s"v${r - 1}", s"b$r", s"v$r")) else Nil)
    }.flatten
    s"""v0 AS (
      SELECT array_to_string(list_transform(range(len(token)),
               i -> substr(token, i + 1, 1)), ' ') AS s,
             count(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents)
      WHERE len(token) >= 1
      GROUP BY 1),
    ${trainCtes.mkString(",\n    ")}"""
  }
  /** The per-token encode fold over `tok.t` against the trained b_r rows. */
  private def bpeAppliedDocSql: String =
    (1 to BpeRounds).foldLeft(
      "' ' || array_to_string(list_transform(range(len(tok.t)), i -> substr(tok.t, i + 1, 1)), ' ') || ' '") {
      (c, r) =>
        (1 to BpeReplacePasses).foldLeft(c) { (c2, _) =>
          s"replace($c2, ' ' || b$r.pair || ' ', ' ' || replace(b$r.pair, ' ', '') || ' ')"
        }
    }
  private def bpeCrossJoinsSql: String =
    (1 to BpeRounds).map(r => s"CROSS JOIN b$r").mkString(" ")

  val q98BpeEncodeSql: String = {
    // re-derive the same merge CTEs as q97, then fold them over each
    // document token with the identical fixed-pass padded replace
    val appliedDoc = bpeAppliedDocSql
    s"""
    WITH ${bpeTrainCtesSql},
    tok AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        FROM documents)
      WHERE len(t) >= 1),
    enc AS (
      SELECT tok.doc_id,
        len(tok.t) AS nc,
        len(string_split(trim($appliedDoc), ' ')) AS nb
      FROM tok $bpeCrossJoinsSql),
    perdoc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(nc) AS BIGINT) AS n_chars, CAST(sum(nb) AS BIGINT) AS n_bpe
      FROM enc GROUP BY 1)
    SELECT d.doc_id,
      coalesce(p.n_tokens, 0) AS n_tokens,
      coalesce(p.n_chars, 0) AS n_chars,
      coalesce(p.n_bpe, 0) AS n_bpe
    FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
  """
  }

  /** q100: TRAINED language ID — a hashed-bigram Naive Bayes classifier,
    * the supervised counterpart of q23's stopword heuristic and the shape
    * of the fastText-style LID models CCNet-class pipelines actually run.
    * Trains on the corpus's own `lang` labels (add-one smoothing over
    * B = [[NbBuckets]] hashed bigram buckets per class, add-one class
    * priors) and scores every document; q23's heuristic only knows the
    * three stopword-profile languages, while this learns all five label
    * classes from data.
    *
    * Scoring is argmin of integer COST, the q92/q93 trick that keeps a
    * log-likelihood oracle-portable: cost_c(doc) = prior_c + Σ_grams
    * bits(floor((N_c + B)/(k(b,c) + 1))) where bits = length(bin(·)) —
    * the bit length of the inverse conditional probability — and prior_c
    * = bits(floor((D + |C|)/(d_c + 1))). Integer terms → order-insensitive
    * sums; ties break class-ascending (a total order, CASE-encoded
    * identically in both engines).
    *
    * Scale shape: ONE cached gram explode feeds the per-class bucket
    * counts (map-side-combinable to ≤ B rows), the 1-row gram totals, and
    * the scoring join; the B-row cost table and the 1-row priors broadcast
    * back, and the per-doc rollup is a combinable 5-way sum — the only
    * corpus-sized exchange, exactly q93's shape. explode_outer carries
    * gram-less docs through the same pass (prior-only argmin, no roster
    * join-back). The cost table carries a sentinel bucket = −1 row (the
    * k = 0 smoothing cost) so the STREAMING twin scores corpus-unseen
    * buckets by the same formula — the q93 OOV lesson applied from the
    * start. */
  val NbBuckets = 256

  /** The label inventory, ascending (the argmin tie-break order). A
    * compile-time config exactly like [[langProfiles]]: the cost plan
    * wants a KNOWN class list (fixed cost columns, fixed argmin CASE);
    * deriving the inventory from data is one distinct-scan away when a
    * deployment's labels differ. */
  val NbClasses = Seq("de", "en", "es", "fr", "zh")
  private val NbSalt = "nb:"

  def q100NbLangid(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    nbOn(Tables.parallelized(Tables(spark, sfDir, "documents")))
  }

  /** The per-row ARRAY of hashed bigram buckets for NB features (empty for
    * < 2 tokens), over a `toks` column — single source for the batch gram
    * stream and the streaming twin's row-local scorer. */
  private[graft] val nbBucketArrayExpr: String =
    s"""CASE WHEN size(toks) >= 2
         THEN transform(${ngramsExpr(2, distinct = false)},
           g -> md5_prefix56(concat('$NbSalt', g)) % $NbBuckets)
         ELSE CAST(array() AS ARRAY<BIGINT>) END"""

  private def nbGramsOf(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .select(col("doc_id"), col("lang"),
        explode_outer(expr(nbBucketArrayExpr)).as("bucket"))

  /** The (bucket, cost_<class>...) table: per-gram class costs under
    * add-one smoothing, PLUS the sentinel bucket = −1 row carrying the
    * k = 0 cost a corpus-unseen bucket pays. ≤ B+1 rows, broadcastable
    * regardless of corpus size. */
  private def nbCostTable(grams: DataFrame): DataFrame = {
    val ks = NbClasses.map(c =>
      count(when(col("lang") === c, lit(1))).as(s"k_$c"))
    val cnt = grams.filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(ks.head, ks.tail: _*)
    val sentinel = grams.sparkSession.range(1)
      .select(lit(-1L).as("bucket") +: NbClasses.map(c => lit(0L).as(s"k_$c")): _*)
    val ns = NbClasses.map(c => count(when(col("lang") === c, col("bucket")))
      .cast("double").as(s"n_$c"))
    val totals = grams.agg(ns.head, ns.tail: _*)
    cnt.unionByName(sentinel)
      .crossJoin(broadcast(totals))
      .select(col("bucket") +: NbClasses.map(c =>
        length(bin(expr(s"CAST(floor((n_$c + $NbBuckets.0) " +
          s"/ (CAST(k_$c AS DOUBLE) + 1.0)) AS BIGINT)"))).cast("long")
          .as(s"cost_$c")): _*)
  }

  /** The 1-row class-prior cost table: prior_c = bits(floor((D + |C|) /
    * (d_c + 1))), doc counts from the labeled corpus. */
  private def nbPriors(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).cast("double").as("d_all"),
        NbClasses.map(c => count(when(col("lang") === c, lit(1)))
          .cast("double").as(s"d_$c")): _*)
      .select(NbClasses.map(c =>
        length(bin(expr(s"CAST(floor((d_all + ${NbClasses.size}.0) " +
          s"/ (d_$c + 1.0)) AS BIGINT)"))).cast("long").as(s"p_$c")): _*)

  /** The trained NB model as two bounded frames — the ≤ B+1-row cost
    * table (incl. the bucket = −1 sentinel) and the 1-row priors — built
    * from any (doc_id, text, lang) labeled corpus. Shared by the batch
    * scorer and the streaming twin; the cached gram stream is drained by
    * the caller's thread. */
  private[graft] def nbTables(corpus: DataFrame): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val grams = graft.CachedFrames.track(nbGramsOf(corpus))
    (nbCostTable(grams), nbPriors(corpus))
  }

  private[graft] def nbOn(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = graft.CachedFrames.track(nbGramsOf(docs))
    val sums = NbClasses.map(c =>
      coalesce(sum(col(s"cost_$c")), lit(0L)).as(s"s_$c"))
    val perDoc = grams
      .join(broadcast(nbCostTable(grams)), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("bucket")).as("n_grams"),
        (max(col("lang")).as("lang") +: sums): _*)
    val m = least(NbClasses.map(c => col(s"t_$c")): _*)
    val pred = NbClasses.foldLeft(when(lit(false), lit(""))) { (w, c) =>
      w.when(col(s"t_$c") === m, lit(c))
    }
    perDoc.crossJoin(broadcast(nbPriors(docs)))
      .select(Seq(col("doc_id"), col("n_grams"), col("lang")) ++
        NbClasses.map(c => (col(s"s_$c") + col(s"p_$c")).as(s"t_$c")): _*)
      .select(col("doc_id"), col("n_grams"), col("lang"), pred.as("pred_lang"))
      .withColumn("correct", col("pred_lang") === col("lang"))
  }

  val q100NbLangidSql: String = {
    val kCols = NbClasses.map(c =>
      s"count(CASE WHEN lang = '$c' THEN 1 END) AS k_$c").mkString(", ")
    val nCols = NbClasses.map(c =>
      s"CAST(count(CASE WHEN lang = '$c' THEN 1 END) AS DOUBLE) AS n_$c").mkString(", ")
    val costCols = NbClasses.map(c =>
      s"CAST(length(bin(CAST(floor((tot.n_$c + $NbBuckets.0) " +
        s"/ (CAST(cnt.k_$c AS DOUBLE) + 1.0)) AS BIGINT))) AS BIGINT) AS cost_$c")
      .mkString(",\n        ")
    val dCols = NbClasses.map(c =>
      s"CAST(count(CASE WHEN lang = '$c' THEN 1 END) AS DOUBLE) AS d_$c").mkString(", ")
    val pCols = NbClasses.map(c =>
      s"CAST(length(bin(CAST(floor((d_all + ${NbClasses.size}.0) " +
        s"/ (d_$c + 1.0)) AS BIGINT))) AS BIGINT) AS p_$c").mkString(",\n        ")
    val sCols = NbClasses.map(c =>
      s"CAST(sum(c.cost_$c) AS BIGINT) AS s_$c").mkString(", ")
    val tCols = NbClasses.map(c =>
      s"coalesce(p.s_$c, 0) + pr.p_$c AS t_$c").mkString(",\n        ")
    val leastExpr = s"least(${NbClasses.map(c => s"t_$c").mkString(", ")})"
    val predCase = "CASE " + NbClasses.map(c =>
      s"WHEN t_$c = $leastExpr THEN '$c'").mkString(" ") + " END"
    s"""
    WITH t AS (
      SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tk
      FROM documents),
    grams AS (
      SELECT doc_id, lang,
        ('0x' || substr(md5('$NbSalt' || g.g), 1, 14))::BIGINT % $NbBuckets AS bucket
      FROM t, LATERAL (
        SELECT unnest(${ngramsSqlExpr(2, distinct = false)}) AS g) g
      WHERE len(tk) >= 2),
    cnt AS (SELECT bucket, $kCols FROM grams GROUP BY 1),
    tot AS (SELECT $nCols FROM grams),
    costs AS (
      SELECT cnt.bucket,
        $costCols
      FROM cnt CROSS JOIN tot),
    priors AS (
      SELECT
        $pCols
      FROM (SELECT CAST(count(*) AS DOUBLE) AS d_all, $dCols FROM documents)),
    perdoc AS (
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams, $sCols
      FROM grams g JOIN costs c ON g.bucket = c.bucket
      GROUP BY 1),
    scored AS (
      SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams, d.lang,
        $tCols
      FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
      CROSS JOIN priors pr)
    SELECT doc_id, n_grams, lang,
      $predCase AS pred_lang,
      ($predCase) = lang AS correct
    FROM scored
  """
  }

  /** q95: count-min-sketch heavy hitters — the streaming-friendly
    * frequent-token sketch (Cormode & Muthukrishnan) next to its exact
    * answer, as a gate number: estimate ≥ exact always (CMS never
    * undercounts), and the overcount column shows what [[CmsDepth]]×
    * [[CmsWidth]] counters buy at this corpus size. The sketch is fully
    * deterministic (md5-salted row hashes, integer counters), so the
    * oracle reproduces it exactly — same contract as the q38/q50 sketch
    * pair.
    *
    * Scale shape: the sketch is a d×w-cell aggregate (map-side-combinable
    * counts — the whole sketch is ~768 integers regardless of corpus
    * size, THE point of CMS at 100 TB); the exact top-k exists to score
    * the sketch and is the same shape as q43. The probe joins are
    * k·d rows against the broadcast sketch. The exploded token stream is
    * computed once (cached) and feeds both. */
  val CmsDepth = 3
  val CmsWidth = 256
  val CmsTopK = 20

  def q95HeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    heavyHittersOn(Tables.parallelized(Tables(spark, sfDir, "documents")))
  }

  private def cmsBucketsExpr: String =
    (0 until CmsDepth).map(r =>
      s"md5_prefix56(concat('cms$r:', token)) % $CmsWidth").mkString("array(", ", ", ")")

  /** SINGLE source of the sketch aggregation over a (token) frame —
    * [[cmsSketchOn]] and [[heavyHittersOn]] both derive from this, so a
    * salt/shape tweak cannot diverge the spec-pinned batch ≡ streaming
    * sketch contract. */
  private def cmsSketchOfTokens(toks: DataFrame): DataFrame =
    toks.select(col("token"), posexplode(expr(cmsBucketsExpr)).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))

  /** The d×w CMS counter table for any (text) frame — (r, bucket, c).
    * Works identically on a STREAMING frame (an unbounded-state-free
    * aggregation: the state is the sketch itself, d×w counters by
    * construction), which is how [[graft.streaming.EventStreams.cmsSketchStream]]
    * maintains the sketch incrementally. */
  private[graft] def cmsSketchOn(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    cmsSketchOfTokens(
      docs.select(explode(expr("""split(trim(text), '\\s+')""")).as("token")))
  }

  private[graft] def heavyHittersOn(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = graft.CachedFrames.track(
      docs.select(explode(expr("""split(trim(text), '\\s+')""")).as("token")))
    val sketch = cmsSketchOfTokens(toks)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("token").asc).limit(CmsTopK)
    exact
      .select(col("token"), col("exact"),
        posexplode(expr(cmsBucketsExpr)).as(Seq("r", "bucket")))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("token"))
      .agg(max(col("exact")).as("exact"), min(col("c")).as("cms_est"))
      .select(col("token"), col("exact"), col("cms_est"),
        (col("cms_est") - col("exact")).as("overcount"))
  }

  val q95HeavyHittersSql: String = {
    val bucketSql = (r: String) =>
      s"('0x' || substr(md5('cms' || $r || ':' || token), 1, 14))::BIGINT % $CmsWidth"
    s"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents),
    b AS (
      SELECT token, r.r AS r, ${bucketSql("r.r")} AS bucket
      FROM tok, LATERAL (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS r) r),
    sketch AS (SELECT r, bucket, count(*) AS c FROM b GROUP BY 1, 2),
    exact AS (
      SELECT token, count(*) AS exact FROM tok GROUP BY 1
      ORDER BY exact DESC, token ASC LIMIT $CmsTopK),
    eb AS (
      SELECT e.token, e.exact, r.r AS r, ${bucketSql("r.r")} AS bucket
      FROM exact e, LATERAL (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS r) r),
    est AS (
      SELECT eb.token, max(eb.exact) AS exact, min(s.c) AS est
      FROM eb JOIN sketch s ON eb.r = s.r AND eb.bucket = s.bucket
      GROUP BY 1)
    SELECT token, CAST(exact AS BIGINT) AS exact, CAST(est AS BIGINT) AS cms_est,
      CAST(est - exact AS BIGINT) AS overcount
    FROM est
  """
  }

  /** q96: PII detection + masking scan — the release-hygiene pass a text
    * corpus runs before publication (emails, SSN-shaped ids, phone-shaped
    * numbers, long digit runs), counting matches per document and emitting
    * the masked text with typed placeholders. The documents-table
    * counterpart of q81's column-level anonymization.
    *
    * Masking order is part of the contract (email → ssn → phone → id):
    * each rule runs on the previous rule's output, so a digit run inside
    * an already-masked match is never double-masked; counts come from the
    * ORIGINAL text per rule. Patterns are the conservative lowercase
    * forms; both engines get the IDENTICAL regex (RE2 and java.util.regex
    * agree on this class-and-boundary subset), the Spark side just
    * SQL-escapes its backslashes.
    *
    * Scale shape: a pure per-row codegen projection — no shuffle, no
    * state; at 100 TB it pipelines directly into the parquet scan
    * (q81's plan shape, pinned). */
  private[graft] val PiiRules: Seq[(String, String, String)] = Seq(
    // (name, regex — single-backslash form, placeholder)
    ("email", """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""", "<email>"),
    ("ssn", """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b""", "<ssn>"),
    ("phone", """\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b""", "<phone>"),
    ("id", """\b[0-9]{9,}\b""", "<id>"))

  /** The regex as a Spark SQL single-quoted literal body: the parser
    * processes backslash escapes, so each backslash doubles. */
  private def sqlEscaped(re: String): String = re.replace("\\", "\\\\")

  def q96PiiScan(spark: SparkSession, sfDir: String): DataFrame =
    piiScanOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** Adds the per-rule count columns and the `masked` text to any frame
    * with a `text` column, keeping every other column — all pure per-row
    * projections. [[q96PiiScan]] projects the gate shape;
    * `cli.MaskCorpus` rewrites `text` in place over the full row. */
  private[graft] def withPiiColumns(docs: DataFrame): DataFrame = {
    val counted = PiiRules.foldLeft(docs) {
      case (d, (name, re, _)) =>
        d.withColumn(s"n_${name}s",
          expr(s"size(regexp_extract_all(text, '${sqlEscaped(re)}', 0))").cast("long"))
    }
    // functions.regexp_replace takes the pattern directly (no SQL-literal
    // escape pass), unlike the expr() strings above
    PiiRules.foldLeft(counted.withColumn("masked", col("text"))) {
      case (d, (_, re, tok)) =>
        d.withColumn("masked", regexp_replace(col("masked"), re, tok))
    }
  }

  private[graft] def piiScanOn(docs: DataFrame): DataFrame =
    withPiiColumns(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id") +: PiiRules.map { case (n, _, _) => col(s"n_${n}s") }
        :+ col("masked"): _*)

  val q96PiiScanSql: String = {
    val counts = PiiRules.map { case (name, re, _) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_${name}s"
    }.mkString(",\n      ")
    val maskedExpr = PiiRules.foldLeft("text") { case (acc, (_, re, tok)) =>
      s"regexp_replace($acc, '$re', '$tok', 'g')"
    }
    s"""
    SELECT doc_id,
      $counts,
      $maskedExpr AS masked
    FROM documents
  """
  }

  /** q93: DSIR importance weighting (Xie et al. 2023) — score every
    * document by how much more likely its hashed-bigram features are under
    * the TARGET distribution (here: documents the q23 language scorer
    * calls 'en', the curated domain) than under the RAW corpus
    * distribution, then select the documents the target up-weights. The
    * data-selection step before pre-training.
    *
    * w(x) = Σ_gram [bits_raw(bucket) − bits_target(bucket)], the same
    * integer-bits quantization of log(p_target/p_raw) as q92 (ln() is not
    * oracle-portable): bits_X = length(bin(floor((N_X + B)/(c_X + 1)))),
    * add-one smoothing over B = [[DsirBuckets]] hashed buckets
    * (md5_prefix56, the library's salted content hash). Integer terms →
    * the per-doc sum is order-insensitive.
    *
    * Scale shape: the exploded gram stream is computed ONCE (cached; the
    * 1-row totals aggregate and the two bucket-count aggregates are all
    * map-side-combinable to B rows); the B-row delta table broadcasts back
    * against the stream, and the per-doc rollup is a combinable sum whose
    * partials collapse to one row per document BEFORE the doc_id exchange
    * — the only corpus-sized shuffle in the plan. Gram-less documents
    * (< 2 tokens) ride the same pass as explode_outer NULL rows (no
    * roster join-back) and surface with n_grams = 0, w_bits = 0,
    * selected = false. */
  val DsirBuckets = 512
  private val DsirSalt = "dsir:"

  def q93Dsir(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    dsirOn(Tables.parallelized(Tables(spark, sfDir, "documents")))
  }

  /** The hashed-bucket bits-delta table behind q93, built from any
    * (doc_id, text) corpus — shared by the batch scorer and the streaming
    * twin (which collapses it to a map). The gram stream is cached; the
    * caller's thread drains it.
    *
    * Besides the ≤ B occupied-bucket rows, the table carries ONE sentinel
    * row (bucket = [[DsirUnseenBucket]]) holding the delta the smoothing
    * formula assigns a bucket the corpus never produced (cr = ct = 0):
    * bits(floor(n_raw + B)) − bits(floor(n_tgt + B)). The batch scorer
    * never probes it (its grams and its delta table come from the same
    * corpus), but the streaming gate's out-of-corpus documents must fall
    * back to it so stream and batch score by the SAME formula — without
    * it, corpus-unseen features would be scored 0 while the formula says
    * they carry the (typically positive, since n_raw ≥ n_tgt) smoothing
    * delta. Real buckets are md5 % B ∈ [0, B), so −1 can never collide. */
  private[graft] val DsirUnseenBucket = -1L

  private[graft] def dsirDeltaTable(corpus: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val grams = graft.CachedFrames.track(dsirGramsOf(corpus))
    val unseen = grams.agg(
        count(col("bucket")).cast("double").as("n_raw"),
        count(when(col("pred_lang") === "en", col("bucket"))).cast("double")
          .as("n_tgt"))
      .select(lit(DsirUnseenBucket).as("bucket"), (
        length(bin(expr(s"CAST(floor(n_raw + $DsirBuckets.0) AS BIGINT)"))) -
        length(bin(expr(s"CAST(floor(n_tgt + $DsirBuckets.0) AS BIGINT)")))
      ).as("d_bits"))
    dsirDeltaOf(grams).unionByName(unseen)
  }

  /** SINGLE source of the bucket bits-delta aggregation over a gram
    * stream — the batch scorer and the streaming twin both derive from
    * this. */
  private def dsirDeltaOf(grams: DataFrame): DataFrame = {
    val totals = grams.agg(
      count(col("bucket")).cast("double").as("n_raw"),
      count(when(col("pred_lang") === "en", col("bucket"))).cast("double").as("n_tgt"))
    val cRaw = grams.filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val cTgt = grams.filter(col("bucket").isNotNull && col("pred_lang") === "en")
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    cRaw.join(cTgt, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"), (
        length(bin(expr(s"CAST(floor((n_raw + $DsirBuckets.0) " +
          "/ (CAST(coalesce(cr, 0) AS DOUBLE) + 1.0)) AS BIGINT)"))) -
        length(bin(expr(s"CAST(floor((n_tgt + $DsirBuckets.0) " +
          "/ (CAST(coalesce(ct, 0) AS DOUBLE) + 1.0)) AS BIGINT)")))
      ).as("d_bits"))
  }

  /** The per-row ARRAY of hashed bigram buckets (empty for < 2 tokens),
    * over a `toks` column — the SINGLE source of the salt+hash formula,
    * shared by the batch gram stream and the streaming gate's row-local
    * scorer. */
  private[graft] val dsirBucketArrayExpr: String =
    s"""CASE WHEN size(toks) >= 2
         THEN transform(${ngramsExpr(2, distinct = false)},
           g -> md5_prefix56(concat('$DsirSalt', g)) % $DsirBuckets)
         ELSE CAST(array() AS ARRAY<BIGINT>) END"""

  /** The per-doc (doc_id, pred_lang, bucket) gram stream — explode_outer
    * keeps gram-less docs as a NULL-bucket row. */
  private def dsirGramsOf(docs: DataFrame): DataFrame = {
    val base = docs.withColumn("toks", expr("""split(trim(text), '\\s+')"""))
    langProfiles.foldLeft(base) { case (d, (lang, words)) =>
      d.withColumn(s"s_$lang", expr(s"size(filter(toks, x -> x IN ${inList(words)}))"))
    }
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
      .select(col("doc_id"), col("pred_lang"),
        explode_outer(expr(dsirBucketArrayExpr)).as("bucket"))
  }

  private[graft] def dsirOn(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // one exploded pass; four consumers (totals, raw counts, target counts,
    // the scoring join) — cached so the corpus expansion runs once.
    // explode_outer keeps gram-less docs as a NULL-bucket row, so the final
    // per-doc rollup covers the whole roster without a corpus join-back.
    val grams = graft.CachedFrames.track(dsirGramsOf(docs))
    grams.join(broadcast(dsirDeltaOf(grams)), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("bucket")).as("n_grams"),
        coalesce(sum(col("d_bits")), lit(0L)).as("w_bits"))
      .withColumn("selected", col("w_bits") > 0)
  }

  val q93DsirSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    lang AS (
      SELECT doc_id, tk,
        ${hitsSql("en")} AS s_en, ${hitsSql("es")} AS s_es, ${hitsSql("de")} AS s_de
      FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS tk
            FROM documents)),
    grams AS (
      SELECT doc_id,
        CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
             WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS pred_lang,
        ('0x' || substr(md5('$DsirSalt' || g.g), 1, 14))::BIGINT % $DsirBuckets AS bucket
      FROM lang, LATERAL (
        SELECT unnest(${ngramsSqlExpr(2, distinct = false)}) AS g) g
      WHERE len(tk) >= 2),
    totals AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_raw,
        CAST(count(CASE WHEN pred_lang = 'en' THEN 1 END) AS DOUBLE) AS n_tgt
      FROM grams),
    craw AS (SELECT bucket, count(*) AS cr FROM grams GROUP BY 1),
    ctgt AS (SELECT bucket, count(*) AS ct FROM grams WHERE pred_lang = 'en' GROUP BY 1),
    delta AS (
      SELECT coalesce(craw.bucket, ctgt.bucket) AS bucket,
        CAST(length(bin(CAST(floor((totals.n_raw + $DsirBuckets.0)
            / (CAST(coalesce(craw.cr, 0) AS DOUBLE) + 1.0)) AS BIGINT)))
          - length(bin(CAST(floor((totals.n_tgt + $DsirBuckets.0)
            / (CAST(coalesce(ctgt.ct, 0) AS DOUBLE) + 1.0)) AS BIGINT))) AS INTEGER)
          AS d_bits
      FROM craw FULL OUTER JOIN ctgt ON craw.bucket = ctgt.bucket
      CROSS JOIN totals),
    perdoc AS (
      SELECT g.doc_id, count(*) AS n_grams, CAST(sum(d.d_bits) AS BIGINT) AS w_bits
      FROM grams g JOIN delta d ON g.bucket = d.bucket
      GROUP BY 1)
    SELECT d.doc_id,
      coalesce(p.n_grams, 0) AS n_grams,
      coalesce(p.w_bits, 0) AS w_bits,
      coalesce(p.w_bits, 0) > 0 AS selected
    FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
  """

  /** q112 tuning — the composite rule thresholds (Gopher-style repetition/
    * format filters, Rae et al. 2021 §A1.1 re-parameterized for the test
    * corpus). Single-sourced: the Spark projection and the DuckDB oracle
    * both read exactly these values. */
  val RuleMinWords = 10
  val RuleMaxWords = 100000
  val RuleMinMeanWordLen = 2.0
  val RuleMaxMeanWordLen = 12.0
  val RuleMaxSymbolRatio = 0.3
  val RuleMinStopHits = 1
  val RuleMaxDigitRatio = 0.2
  val RuleMaxWordLen = 30

  /** q112: composite quality-RULE filter — the Gopher-style boolean rule
    * battery every production pretraining pipeline runs before any learned
    * scorer: word-count bounds, mean-word-length band, symbol ratio, digit
    * ratio, stopword evidence (any language profile), and a max-word-length
    * cap. Emits the per-rule verdicts (not just the conjunction) so a
    * curation run can attribute WHY documents died — the per-rule failure
    * accounting the release report needs.
    *
    * Scale shape: a pure per-row codegen projection over one corpus scan —
    * no shuffle, no join, no state; pipelines into the scan at any corpus
    * size (q76's shape). Ratios are single IEEE divisions of integer-valued
    * doubles compared against literal thresholds, so the oracle matches
    * bitwise. [[graft.streaming.EventStreams.gopherGateStream]] runs this
    * projection verbatim as a stateless stream gate. */
  def q112GopherRules(spark: SparkSession, sfDir: String): DataFrame =
    gopherRulesOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  private[graft] def gopherRulesOn(docs: DataFrame): DataFrame = {
    val base = docs.withColumn("toks", expr("""split(trim(text), '\\s+')"""))
    val scored = langProfiles.foldLeft(base) { case (d, (lang, words)) =>
      d.withColumn(s"s_$lang", expr(s"size(filter(toks, x -> x IN ${inList(words)}))"))
    }
    scored
      .withColumn("nt", expr("CAST(size(toks) AS DOUBLE)"))
      .withColumn("nc", length(col("text")).cast("double"))
      .withColumn("sum_wl", expr(
        "CAST(aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x) AS DOUBLE)"))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double"))
      .withColumn("n_digit",
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("double"))
      .withColumn("max_wl", expr("array_max(transform(toks, t -> length(t)))"))
      .withColumn("r_word_count",
        col("nt") >= RuleMinWords && col("nt") <= RuleMaxWords)
      .withColumn("r_mean_word_len",
        col("sum_wl") / col("nt") >= RuleMinMeanWordLen &&
          col("sum_wl") / col("nt") <= RuleMaxMeanWordLen)
      .withColumn("r_symbol_ratio", col("n_punct") / col("nc") <= RuleMaxSymbolRatio)
      .withColumn("r_stopwords",
        greatest(col("s_en"), col("s_es"), col("s_de")) >= RuleMinStopHits)
      .withColumn("r_digit_ratio", col("n_digit") / col("nc") <= RuleMaxDigitRatio)
      .withColumn("r_max_word_len", col("max_wl") <= RuleMaxWordLen)
      .withColumn("n_failed", expr(
        """CAST((CASE WHEN r_word_count THEN 0 ELSE 1 END)
          | + (CASE WHEN r_mean_word_len THEN 0 ELSE 1 END)
          | + (CASE WHEN r_symbol_ratio THEN 0 ELSE 1 END)
          | + (CASE WHEN r_stopwords THEN 0 ELSE 1 END)
          | + (CASE WHEN r_digit_ratio THEN 0 ELSE 1 END)
          | + (CASE WHEN r_max_word_len THEN 0 ELSE 1 END) AS INT)""".stripMargin))
      .withColumn("admit", col("n_failed") === 0)
      .select(col("doc_id"), col("r_word_count"), col("r_mean_word_len"),
        col("r_symbol_ratio"), col("r_stopwords"), col("r_digit_ratio"),
        col("r_max_word_len"), col("n_failed"), col("admit"))
  }

  val q112GopherRulesSql: String = s"""
    WITH s AS (
      SELECT doc_id,
        CAST(len(tk) AS DOUBLE) AS nt,
        CAST(length(text) AS DOUBLE) AS nc,
        CAST(list_reduce(list_prepend(0, list_transform(tk, x -> len(x))),
          (a, x) -> a + x) AS DOUBLE) AS sum_wl,
        CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS n_punct,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit,
        list_max(list_transform(tk, x -> len(x))) AS max_wl,
        ${hitsSql("en")} AS s_en, ${hitsSql("es")} AS s_es, ${hitsSql("de")} AS s_de
      FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS tk
            FROM documents)),
    r AS (
      SELECT doc_id,
        (nt >= $RuleMinWords AND nt <= $RuleMaxWords) AS r_word_count,
        (sum_wl / nt >= $RuleMinMeanWordLen AND sum_wl / nt <= $RuleMaxMeanWordLen)
          AS r_mean_word_len,
        (n_punct / nc <= $RuleMaxSymbolRatio) AS r_symbol_ratio,
        (greatest(s_en, s_es, s_de) >= $RuleMinStopHits) AS r_stopwords,
        (n_digit / nc <= $RuleMaxDigitRatio) AS r_digit_ratio,
        (max_wl <= $RuleMaxWordLen) AS r_max_word_len
      FROM s)
    SELECT doc_id, r_word_count, r_mean_word_len, r_symbol_ratio, r_stopwords,
      r_digit_ratio, r_max_word_len,
      CAST((CASE WHEN r_word_count THEN 0 ELSE 1 END)
        + (CASE WHEN r_mean_word_len THEN 0 ELSE 1 END)
        + (CASE WHEN r_symbol_ratio THEN 0 ELSE 1 END)
        + (CASE WHEN r_stopwords THEN 0 ELSE 1 END)
        + (CASE WHEN r_digit_ratio THEN 0 ELSE 1 END)
        + (CASE WHEN r_max_word_len THEN 0 ELSE 1 END) AS INTEGER) AS n_failed,
      ((CASE WHEN r_word_count THEN 0 ELSE 1 END)
        + (CASE WHEN r_mean_word_len THEN 0 ELSE 1 END)
        + (CASE WHEN r_symbol_ratio THEN 0 ELSE 1 END)
        + (CASE WHEN r_stopwords THEN 0 ELSE 1 END)
        + (CASE WHEN r_digit_ratio THEN 0 ELSE 1 END)
        + (CASE WHEN r_max_word_len THEN 0 ELSE 1 END)) = 0 AS admit
    FROM r
  """

  /** q113: tokenizer FERTILITY by language — how many trained-BPE symbols
    * the q97 tokenizer spends per word and how many characters each symbol
    * buys, split by the corpus's tagged `lang`. THE metric a multilingual
    * pretraining team watches when choosing a tokenizer: a vocabulary
    * trained on an English-heavy corpus over-fragments the other languages
    * (higher bpe_per_word, lower chars_per_bpe), silently shrinking their
    * effective token budget in the mixture.
    *
    * Scale shape: training costs what q97 costs (one corpus pass + K
    * vocab-local merge rounds); the measurement is then ONE corpus scan —
    * the merge list rides in as string literals (q98's encode projection)
    * — feeding a |languages|-sized map-side-combined rollup. The ratios
    * divide the already-aggregated BIGINTs once, so the oracle matches
    * bitwise. */
  def q113TokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val applied = bpeApplyExpr(bpeTrainMerges(docs, BpeRounds))
    docs
      .withColumn("toks", expr(
        """filter(split(trim(text), '\\s+'), t -> length(t) >= 1)"""))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CAST(size(toks) AS BIGINT)")).as("n_words"),
        sum(expr(
          "CAST(aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x) AS BIGINT)"))
          .as("n_chars"),
        sum(expr(
          s"CAST(aggregate(transform(toks, t -> size(split(trim($applied), ' '))), 0, (a, x) -> a + x) AS BIGINT)"))
          .as("n_bpe"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_bpe"),
        (col("n_chars").cast("double") / col("n_bpe").cast("double"))
          .as("chars_per_bpe"),
        (col("n_bpe").cast("double") / col("n_words").cast("double"))
          .as("bpe_per_word"))
  }

  val q113TokenizerFertilitySql: String = s"""
    WITH ${bpeTrainCtesSql},
    lang AS (
      SELECT doc_id, lang FROM documents),
    tok AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        FROM documents)
      WHERE len(t) >= 1),
    enc AS (
      SELECT tok.doc_id,
        len(tok.t) AS nc,
        len(string_split(trim($bpeAppliedDocSql), ' ')) AS nb
      FROM tok $bpeCrossJoinsSql),
    perdoc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
        CAST(sum(nc) AS BIGINT) AS nchars, CAST(sum(nb) AS BIGINT) AS nbpe
      FROM enc GROUP BY 1),
    bylang AS (
      SELECT l.lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(coalesce(sum(p.nw), 0) AS BIGINT) AS n_words,
        CAST(coalesce(sum(p.nchars), 0) AS BIGINT) AS n_chars,
        CAST(coalesce(sum(p.nbpe), 0) AS BIGINT) AS n_bpe
      FROM lang l LEFT JOIN perdoc p ON l.doc_id = p.doc_id
      GROUP BY 1)
    SELECT lang, n_docs, n_words, n_chars, n_bpe,
      CAST(n_chars AS DOUBLE) / CAST(n_bpe AS DOUBLE) AS chars_per_bpe,
      CAST(n_bpe AS DOUBLE) / CAST(n_words AS DOUBLE) AS bpe_per_word
    FROM bylang
  """

  /** q114 tuning — Bloom filter geometry. [[BloomBits]] bits packed as
    * [[BloomBuckets]] = bits/32 BIGINT words (32 live bits per word keeps
    * every shift < 2^32 — no sign-bit edge in either engine), probed by
    * [[BloomHashes]] salted md5 hash functions. Demo-scale m; production
    * sizes m to the benchmark suite's gram count (m ≈ 1.44·k·n for the
    * target FP rate) — the geometry, not the shape, is what changes. */
  val BloomBits = 65536
  val BloomWordBits = 32
  val BloomBuckets: Int = BloomBits / BloomWordBits
  val BloomHashes = 3
  private[graft] val BloomSalt = "bloom:"

  /** The k salted probe positions of one gram, as a row-local array. */
  private[graft] val bloomProbesExpr: String =
    s"""transform(sequence(0, ${BloomHashes - 1}),
        i -> md5_prefix56(concat('$BloomSalt', CAST(i AS STRING), ':', g)) % $BloomBits)"""

  /** Row-local membership test of gram `g` against a `bloom_m` map column
    * (bucket → 32-bit word): all k probe bits set. */
  private[graft] val bloomHitExpr: String =
    s"""forall($bloomProbesExpr,
        p -> (coalesce(bloom_m[p DIV $BloomWordBits], CAST(0 AS BIGINT))
              & shiftleft(CAST(1 AS BIGINT), CAST(p % $BloomWordBits AS INT))) != 0)"""

  /** q58/q114's gram construction over a `toks` column, as a row-local
    * expression string — shared with the streaming Bloom gate. */
  private[graft] def decontamGramsExpr: String =
    ngramsExpr(DecontamGram, distinct = true)

  /** ALL distinct [[DecontamGram]]-grams of a (doc_id, text) frame — the
    * gram-set builder behind the benchmark slice, the Bloom CLI jobs, and
    * the streaming gate. */
  private[graft] def gramSetOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .filter(expr(s"size(toks) >= $DecontamGram"))
      .select(explode(expr(decontamGramsExpr)).as("gram")).distinct()

  /** The benchmark slice's distinct [[DecontamGram]]-gram set from a
    * (doc_id, text) corpus — q58/q114's held-out side, shared with the
    * streaming Bloom gate so batch and stream build the SAME filter. */
  private[graft] def decontamBenchGrams(corpus: DataFrame): DataFrame =
    gramSetOf(corpus.filter(col("doc_id") % 100 === 0))

  /** The Bloom probe pass over ANY (doc_id, text) frame against a
    * persisted (bucket, bits) bitmap frame: per doc, its distinct gram
    * count, how many grams the filter claims, and the contamination flag.
    * The bitmap collapses to ONE broadcast map row (cached — a streaming
    * caller re-executes the static side per micro-batch) and the probe is
    * a pure row-local filter+forall — shared verbatim by
    * [[graft.streaming.EventStreams.bloomGateStream]] and `cli.ProbeBloom`. */
  private[graft] def bloomProbeOn(docs: DataFrame, bits: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val bm = graft.CachedFrames.track(
      bits.agg(map_from_entries(collect_list(struct(col("bucket"), col("bits"))))
        .as("bloom_m")))
    // a front-door gate must emit a verdict for EVERY arriving row — a doc
    // too short to form a gram is trivially clean (n_grams = 0), never
    // silently dropped (q114's gate output keeps the >= n roster because
    // its oracle does; the probe face covers the full input)
    // every input column except the text itself rides through (the
    // MaskCorpus convention) — per-source monitoring and CLI verdict
    // consumers keep their context columns; (doc_id, text)-only callers
    // see the documented 4-column shape
    val keep = docs.columns.filter(c => c != "text" && c != "doc_id")
      .map(col).toSeq
    docs.crossJoin(broadcast(bm))
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .withColumn("grams", expr(
        s"""CASE WHEN size(toks) >= $DecontamGram THEN $decontamGramsExpr
            ELSE CAST(array() AS ARRAY<STRING>) END"""))
      .select(keep ++ Seq(col("doc_id"),
        expr("CAST(size(grams) AS BIGINT)").as("n_grams"),
        expr(s"CAST(size(filter(grams, g -> $bloomHitExpr)) AS BIGINT)")
          .as("n_bloom_hits")): _*)
      .withColumn("bloom_flag", col("n_bloom_hits") > 0)
  }

  /** The ≤[[BloomBuckets]]-row (bucket, bits) filter built from the
    * benchmark slice's distinct [[DecontamGram]]-grams. */
  private[graft] def bloomBitsOf(benchGrams: DataFrame): DataFrame =
    benchGrams.select(col("gram").as("g"))
      .select(explode(expr(bloomProbesExpr)).as("pos"))
      .groupBy(expr(s"pos DIV $BloomWordBits").as("bucket"))
      .agg(expr(
        s"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % $BloomWordBits AS INT)))")
        .as("bits"))

  /** q114: BLOOM-FILTER decontamination — q58's benchmark-overlap scan with
    * the benchmark gram set compressed into a [[BloomBits]]-bit Bloom
    * filter, PLUS the exact verdict alongside so the false-positive cost of
    * the compression is measured, not guessed. This is the constant-space
    * decontamination shape (Dolma-style): at 100 TB the eval-suite gram set
    * can be millions of entries — the broadcast SET is what stops scaling,
    * while the Bloom bitmap is a fixed 8 KB here (m/8 bytes in general)
    * regardless of how many grams it absorbs, and the probe is a pure
    * row-local map lookup. No false negatives by construction (per-doc
    * n_bloom_hits ≥ n_exact_hits, spec-pinned); the FP columns quantify
    * the recall/space trade a release signs off on.
    *
    * Scale shape: ONE corpus gram pass — crossJoin against the 1-row
    * bitmap map (broadcast), a broadcast left join against the exact set
    * (the measurement twin only; production drops it), and a per-doc
    * combinable rollup. The bitmap build itself is benchmark-sized, never
    * corpus-sized, and collapses to ≤[[BloomBuckets]] rows by
    * construction. */
  def q114BloomDecontam(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val n = DecontamGram
    val g = graft.CachedFrames.track(
      Tables.parallelized(Tables(spark, sfDir, "documents"))
        .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
        .filter(expr(s"size(toks) >= $n"))
        .select(col("doc_id"), expr(ngramsExpr(n, distinct = true)).as("grams")))
    val bench = graft.CachedFrames.track(
      g.filter(col("doc_id") % 100 === 0)
        .select(explode(col("grams")).as("gram")).distinct())
    val bm = graft.CachedFrames.track(
      bloomBitsOf(bench)
        .agg(map_from_entries(collect_list(struct(col("bucket"), col("bits"))))
          .as("bloom_m")))
    g.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .crossJoin(broadcast(bm))
      .withColumn("bloom_hit", expr(bloomHitExpr))
      .join(broadcast(bench.withColumn("bhit", lit(1))),
        col("g") === col("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("bhit").isNotNull, 1L).otherwise(0L)).as("n_exact_hits"))
      .withColumn("bloom_flag", col("n_bloom_hits") > 0)
      .withColumn("exact_flag", col("n_exact_hits") > 0)
      .withColumn("false_pos", col("bloom_flag") && !col("exact_flag"))
  }

  val q114BloomDecontamSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    g AS (
      SELECT doc_id, ${ngramsSqlExpr(DecontamGram, distinct = true)} AS grams
      FROM t WHERE len(tk) >= $DecontamGram),
    bench AS (
      SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 100 = 0),
    bprobes AS (
      SELECT ('0x' || substr(md5('$BloomSalt' || i.i::VARCHAR || ':' || gram), 1, 14))::BIGINT
          % $BloomBits AS pos
      FROM bench, LATERAL (SELECT unnest(generate_series(0, ${BloomHashes - 1})) AS i) i),
    bm AS (
      SELECT pos // $BloomWordBits AS bucket,
        bit_or(1::BIGINT << CAST(pos % $BloomWordBits AS INTEGER)) AS bits
      FROM bprobes GROUP BY 1),
    corpus AS (
      SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 100 <> 0),
    ph AS (
      SELECT doc_id, gram,
        ('0x' || substr(md5('$BloomSalt' || i.i::VARCHAR || ':' || gram), 1, 14))::BIGINT
          % $BloomBits AS pos
      FROM corpus, LATERAL (SELECT unnest(generate_series(0, ${BloomHashes - 1})) AS i) i),
    pg AS (
      SELECT doc_id, gram, min(CASE WHEN (coalesce(b.bits, 0)
          & (1::BIGINT << CAST(ph.pos % $BloomWordBits AS INTEGER))) <> 0
        THEN 1 ELSE 0 END) AS bloom_hit
      FROM ph LEFT JOIN bm b ON ph.pos // $BloomWordBits = b.bucket
      GROUP BY 1, 2),
    pd1 AS (
      SELECT doc_id, count(*) AS n_grams,
        CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits
      FROM pg GROUP BY 1),
    pd2 AS (
      SELECT c.doc_id,
        CAST(sum(CASE WHEN be.gram IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS n_exact_hits
      FROM corpus c LEFT JOIN bench be ON c.gram = be.gram
      GROUP BY 1)
    SELECT pd1.doc_id, pd1.n_grams, pd1.n_bloom_hits, pd2.n_exact_hits,
      pd1.n_bloom_hits > 0 AS bloom_flag,
      pd2.n_exact_hits > 0 AS exact_flag,
      (pd1.n_bloom_hits > 0 AND NOT pd2.n_exact_hits > 0) AS false_pos
    FROM pd1 JOIN pd2 ON pd1.doc_id = pd2.doc_id
  """

  /** q116 tuning — band cuts calibrated to the corpus's observed q22 score
    * range (q103's tradeoff curve is how a run picks these; the corpus
    * spans ≈ [0, 1.31] with quartiles ≈ 0.22 / 0.55 / 1.14), and the
    * annealing schedule over the bands: stage 1 trains on bands ≥
    * [[CurriculumStage1Band]], stage 2 widens to ≥
    * [[CurriculumStage2Band]], stage 3 admits everything. */
  val CurriculumBandGrid: Seq[Double] = Seq(0.25, 0.5, 0.75, 1.0, 1.15)
  val CurriculumStage1Band = 4
  val CurriculumStage2Band = 2

  /** q116: CURRICULUM banding — every document's quality band (how many
    * [[CurriculumBandGrid]] thresholds its q22 score clears, 0..|grid|) and the
    * first annealing stage that admits it. The data-loader artifact of
    * quality-ascending curriculum training: stage 1 sees only the top
    * bands, later stages widen (each stage's corpus is a superset of the
    * previous — pinned in the spec), so "order by quality" never needs a
    * global sort of the corpus.
    *
    * Scale shape: a pure per-row codegen projection (band = a sum of
    * threshold CASEs against the SAME shared quality formula q22/q103
    * use) — no shuffle, no window, no percentile pass; banding by fixed
    * cuts is precisely what replaces the untenable corpus-wide
    * ntile/sort at 100 TB, and q103's tradeoff curve is how those cuts
    * get calibrated beforehand. */
  def q116Curriculum(spark: SparkSession, sfDir: String): DataFrame = {
    val bandExpr = CurriculumBandGrid
      .map(t => s"(CASE WHEN quality_score >= CAST($t AS DOUBLE) THEN 1 ELSE 0 END)")
      .mkString("CAST(", " + ", " AS INT)")
    qualityScored(spark, sfDir)
      .withColumn("band", expr(bandExpr))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("band"),
        when(col("band") >= CurriculumStage1Band, 1)
          .when(col("band") >= CurriculumStage2Band, 2)
          .otherwise(3).cast("int").as("first_stage"))
  }

  val q116CurriculumSql: String = {
    val bandSql = CurriculumBandGrid
      .map(t => s"(CASE WHEN q >= CAST($t AS DOUBLE) THEN 1 ELSE 0 END)")
      .mkString("CAST(", " + ", " AS INTEGER)")
    s"""
    WITH x AS (
      SELECT doc_id, $qualityFromStatsSql AS q, CAST(n_tokens AS BIGINT) AS n_tokens
      FROM (SELECT doc_id,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    r AS (
      SELECT doc_id, n_tokens, $bandSql AS band FROM x)
    SELECT doc_id, n_tokens, band,
      CAST(CASE WHEN band >= $CurriculumStage1Band THEN 1
                WHEN band >= $CurriculumStage2Band THEN 2
                ELSE 3 END AS INTEGER) AS first_stage
    FROM r
  """
  }

  /** q118 tuning: gram width for the cross-document duplication scan. */
  val CrossDupGram = 3

  /** q118: CROSS-document duplication scan — per document, the fraction of
    * its distinct word [[CrossDupGram]]-grams that also occur in at least
    * one OTHER document. The memorization-risk metric (Lee et al. 2022's
    * "deduplicating training data" lens): q56 measures repetition WITHIN a
    * document and q53 dedups exact spans, but a document whose grams are
    * individually common across the corpus is boilerplate even when no
    * single span matches — this is the per-doc score that catches it.
    *
    * Scale shape: ONE cached gram explode feeds both sides — the gram
    * doc-frequency aggregate (map-side-combinable: grams are distinct per
    * doc, so count(*) IS df) and the probe stream — and they meet on a
    * gram-keyed equi-join whose two subtrees share the SAME exchange
    * (q44's exchange-reuse shape). The per-doc rollup is combinable. No
    * pairwise document comparison at any scale. */
  def q118CrossDupScan(spark: SparkSession, sfDir: String): DataFrame = {
    val n = CrossDupGram
    val g = graft.CachedFrames.track(
      Tables.parallelized(Tables(spark, sfDir, "documents"))
        .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
        .filter(expr(s"size(toks) >= $n"))
        .select(col("doc_id"), explode(expr(ngramsExpr(n, distinct = true))).as("gram")))
    val df = g.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    g.join(df, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        col("n_shared").cast("double") / col("n_grams").cast("double"))
  }

  val q118CrossDupScanSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    g AS (
      SELECT doc_id, unnest(${ngramsSqlExpr(CrossDupGram, distinct = true)}) AS gram
      FROM t WHERE len(tk) >= $CrossDupGram),
    f AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS gdf FROM g GROUP BY 1)
    SELECT g.doc_id,
      CAST(count(*) AS BIGINT) AS n_grams,
      CAST(sum(CASE WHEN f.gdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      CAST(sum(CASE WHEN f.gdf >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS shared_frac
    FROM g JOIN f ON g.gram = f.gram
    GROUP BY 1
  """

  /** q122: CONTAMINATION-BY-SOURCE report — q58's benchmark-overlap verdict
    * rolled up per source: how many of each ingest's documents (and tokens)
    * share a [[DecontamGram]]-gram with the held-out benchmark slice. The
    * release table next to q117's dedup savings: before shipping a corpus,
    * per-source contamination rates tell you which crawl needs the
    * decontamination pass — and after it, that the rates went to zero.
    *
    * Scale shape: the q58 shape exactly — one corpus gram pass against the
    * broadcast benchmark set (or q114's bitmap at suite scale), a per-doc
    * combinable rollup, then a |sources|-row aggregate. Token counts ride
    * the same scan; fractions divide already-aggregated BIGINTs once. */
  def q122ContaminationReport(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables(spark, sfDir, "documents")
    contaminationOn(
      Tables.parallelized(all).filter(col("doc_id") % 100 =!= 0)
        .select(col("source"), col("doc_id"), col("text")),
      decontamBenchGrams(all.select(col("doc_id"), col("text"))))
  }

  /** The per-source contamination rollup over ANY (source, doc_id, text)
    * corpus frame and (gram) benchmark set — the q122 core, reused by
    * `cli.ReleaseReport` with a real benchmark suite. */
  private[graft] def contaminationOn(corpus: DataFrame,
      benchGrams: DataFrame): DataFrame = {
    val n = DecontamGram
    val docs = graft.CachedFrames.track(
      corpus
        .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
        .select(col("source"), col("doc_id"),
          expr("CAST(size(toks) AS BIGINT)").as("n_tokens"),
          expr(s"CASE WHEN size(toks) >= $n THEN $decontamGramsExpr " +
            "ELSE CAST(array() AS ARRAY<STRING>) END").as("grams")))
    // flagged keys carry (source, doc_id) so a generic drop whose id
    // spaces repeat across sources can never cross-attribute a hit; the
    // source leg is null-safe so an unattributed row keeps its verdict
    // (the distributedRunningSum convention)
    val flagged = docs.select(col("source").as("fsrc"),
        col("doc_id").as("fid"), explode(col("grams")).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .select(col("fsrc"), col("fid")).distinct()
      .withColumn("hit", lit(1))
    docs.join(flagged,
        col("source") <=> col("fsrc") && col("doc_id") === col("fid"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("hit").isNotNull, col("n_tokens")).otherwise(0L))
          .as("contaminated_tokens"))
      .withColumn("doc_rate",
        col("n_contaminated").cast("double") / col("n_docs").cast("double"))
      .withColumn("token_rate",
        col("contaminated_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  val q122ContaminationReportSql: String = s"""
    WITH t AS (
      SELECT source, doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
      FROM documents),
    d AS (
      SELECT source, doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        CASE WHEN len(tk) >= $DecontamGram
          THEN ${ngramsSqlExpr(DecontamGram, distinct = true)}
          ELSE [] END AS grams
      FROM t WHERE doc_id % 100 <> 0),
    bench AS (
      SELECT DISTINCT unnest(${ngramsSqlExpr(DecontamGram, distinct = true)}) AS gram
      FROM t WHERE doc_id % 100 = 0 AND len(tk) >= $DecontamGram),
    flagged AS (
      SELECT DISTINCT g.doc_id FROM (
        SELECT doc_id, unnest(grams) AS gram FROM d) g
      JOIN bench b ON g.gram = b.gram)
    SELECT d.source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN f.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        AS n_contaminated,
      CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens,
      CAST(sum(CASE WHEN f.doc_id IS NULL THEN 0 ELSE d.n_tokens END) AS BIGINT)
        AS contaminated_tokens,
      CAST(sum(CASE WHEN f.doc_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS doc_rate,
      CAST(sum(CASE WHEN f.doc_id IS NULL THEN 0 ELSE d.n_tokens END) AS DOUBLE)
        / CAST(sum(d.n_tokens) AS DOUBLE) AS token_rate
    FROM d LEFT JOIN flagged f ON d.doc_id = f.doc_id
    GROUP BY 1
  """

  /** q121 tuning: which docs play "unlabeled" in the semi-supervised
    * simulation (deterministic slice, like q58's benchmark split). */
  val PropagateUnlabeledMod = 5

  /** q121: LABEL PROPAGATION over the near-dup graph — one majority-vote
    * round pushing the `lang` label from labeled documents onto their
    * unlabeled winnowing-containment neighbors (q68's edges). The
    * label-spreading move curation pipelines use for any doc-level
    * attribute that is expensive to compute but stable within near-dup
    * clusters (language, toxicity, license, quality tier): score a seed
    * set, propagate to lookalikes. The deterministic `% PropagateUnlabeledMod`
    * slice plays the unlabeled set so the vote has visible ground truth
    * (`correct` per row — on THIS synthetic corpus near-dup neighbors
    * barely correlate with `lang`, the q100 finding, so the column is a
    * diagnostic, not a benchmark); ties break by label ascending — a
    * total order. TextOpsSpec pins the vote mechanics on a crafted graph.
    *
    * Scale shape: everything is bounded by the NEAR-DUP GRAPH, not the
    * corpus — the vote stream is 2|edges| rows, the per-(doc, label)
    * count combines map-side, and the winner is one WindowGroupLimit pass
    * over ≤ |unlabeled docs| × |labels| rows. The edge generator is q68's
    * DF-capped posting join, already sub-quadratic. */
  def q121LabelPropagation(spark: SparkSession, sfDir: String): DataFrame =
    labelPropagationOn(
      q68Containment(spark, sfDir).select(col("id1"), col("id2")),
      Tables(spark, sfDir, "documents").select(col("doc_id"), col("lang")))

  /** The propagation core over ANY undirected (id1, id2) edge frame and
    * (doc_id, lang) label frame — fixture-testable. */
  private[graft] def labelPropagationOn(edges: DataFrame,
      labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = PropagateUnlabeledMod
    val votes = edges.select(col("id1").as("dst"), col("id2").as("src"))
      .unionByName(edges.select(col("id2").as("dst"), col("id1").as("src")))
      .filter(col("dst") % m === 0 && col("src") % m =!= 0)
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("votes").desc, col("src_lang").asc)
    votes
      .join(labels.select(col("doc_id").as("src"), col("lang").as("src_lang")),
        Seq("src"))
      .groupBy(col("dst"), col("src_lang"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(labels.select(col("doc_id").as("dst"), col("lang").as("true_lang")),
        Seq("dst"))
      .select(col("dst").as("doc_id"), col("true_lang"),
        col("src_lang").as("pred_lang"), col("votes").as("n_votes"),
        (col("src_lang") === col("true_lang")).as("correct"))
  }

  val q121LabelPropagationSql: String = s"""
    WITH edges AS (
      SELECT id1, id2 FROM ($q68ContainmentSql)),
    votes AS (
      SELECT dst, src FROM (
        SELECT id1 AS dst, id2 AS src FROM edges
        UNION ALL
        SELECT id2 AS dst, id1 AS src FROM edges)
      WHERE dst % $PropagateUnlabeledMod = 0 AND src % $PropagateUnlabeledMod <> 0),
    tallied AS (
      SELECT v.dst, d.lang AS src_lang, CAST(count(*) AS BIGINT) AS votes
      FROM votes v JOIN documents d ON v.src = d.doc_id
      GROUP BY 1, 2),
    winner AS (
      SELECT dst, src_lang, votes FROM (
        SELECT dst, src_lang, votes,
          row_number() OVER (PARTITION BY dst ORDER BY votes DESC, src_lang ASC)
            AS rk
        FROM tallied) WHERE rk = 1)
    SELECT w.dst AS doc_id, d.lang AS true_lang, w.src_lang AS pred_lang,
      w.votes AS n_votes, w.src_lang = d.lang AS correct
    FROM winner w JOIN documents d ON w.dst = d.doc_id
  """

  /** q127 tuning: fixed-point rank scale and iteration count. Three damped
    * rounds on a near-dup graph is past the knee — the graph's components
    * are tiny (near-dup clusters), so ranks stabilize almost immediately. */
  val PageRankScale = 1000000000000L
  val PageRankRounds = 3

  /** q127: PAGERANK centrality over the winnowing-containment near-dup
    * graph (q68's edges, symmetrized) — [[PageRankRounds]] damped rounds
    * (d = 0.85). On a dedup graph the stationary mass concentrates on the
    * TEMPLATES: the documents many others partially contain — exactly the
    * boilerplate/mirror hubs a curation run wants surfaced (removing the
    * hub kills the most duplication per deletion; q121 votes along the same
    * edges, this ranks them).
    *
    * Exactness contract: ranks are fixed-point BIGINTs at [[PageRankScale]];
    * every step is integer floor arithmetic (contribution = rank DIV degree,
    * damping = (85·Σ) DIV 100, teleport = 15·S DIV (100·N)) over
    * non-negative values, so Spark's `DIV` and DuckDB's `//` agree bitwise
    * and no float ever accumulates. The one reported double is a single
    * exact-cast division at output.
    *
    * Scale shape: each round is one broadcast-eligible degree join + one
    * edge-keyed aggregation with map-side combine — the canonical
    * iterate-on-the-edge-list plan, Σ work = rounds × |edges|, never
    * corpus-quadratic (the edge generator is q68's DF-capped posting join).
    * The node count rides a 1-row broadcast; no driver-side loop state. */
  def q127Pagerank(spark: SparkSession, sfDir: String): DataFrame =
    pagerankOn(q68Containment(spark, sfDir).select(col("id1"), col("id2")))

  /** The iteration core over ANY undirected (id1, id2) edge frame —
    * fixture-testable. */
  private[graft] def pagerankOn(pairs: DataFrame): DataFrame = {
    val s = PageRankScale
    val edges = graft.CachedFrames.track(
      pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst"))))
    val deg = graft.CachedFrames.track(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nn = deg.agg(count(lit(1)).as("nn"))
    // deg rides the (cached) edge artifact: each round then needs ONE
    // src-keyed join + one dst rollup instead of re-attaching deg to the
    // rank frame per round — same integer contribution r DIV deg per edge,
    // same order-insensitive sum, so the rounds are value-identical
    // (r18 negative result, measured: repartitioning this to graph size +
    // localCheckpoint LOST ~0.4 s — the rounds' BHJ scans of the cached
    // frame are cheaper than the extra eager exchange; kCore wins from
    // the same move only because its frame was already checkpointed)
    val edgesD = graft.CachedFrames.track(edges.join(deg, Seq("src")))
    var rk = deg.select(col("src").as("node")).crossJoin(broadcast(nn))
      .select(col("node"), col("nn"), expr(s"$s DIV nn").as("r"))
    for (_ <- 1 to PageRankRounds) {
      val inSum = edgesD
        .join(rk.select(col("node").as("src"), col("r")), Seq("src"))
        .groupBy(col("dst")).agg(sum(expr("r DIV deg")).as("in_c"))
        .select(col("dst").as("node"), col("in_c"))
      // r18: no join-back to the previous rank frame — the edges are
      // SYMMETRIZED, so every ranked node (deg key) has ≥1 incoming edge
      // and inSum's node set IS rk's node set every round; re-attaching
      // nn via the 1-row broadcast replaces a node-keyed join + exchange
      // per round with zero extra shuffles (value-identical rows)
      rk = inSum.crossJoin(broadcast(nn))
        .select(col("node"), col("nn"),
          expr(s"(15 * $s) DIV (100 * nn) + (85 * in_c) DIV 100").as("r"))
    }
    rk.select(col("node").as("doc_id"), col("r").as("rank_i"),
      (col("r").cast("double") / lit(1.0e12)).as("rank"))
  }

  /** The q127 oracle unrolls the identical integer rounds. */
  val q127PagerankSql: String = {
    val s = PageRankScale
    val rounds = (1 to PageRankRounds).map { k =>
      s"""c$k AS (
         |  SELECT r.node AS src, r.r // d.deg AS c
         |  FROM r${k - 1} r JOIN deg d ON r.node = d.src),
         |r$k AS (
         |  SELECT e.dst AS node, nn.nn,
         |    (15 * $s) // (100 * nn.nn) + (85 * sum(c.c)) // 100 AS r -- guard:ok internal round rank, CAST AS BIGINT at output
         |  FROM e JOIN c$k c ON e.src = c.src, nn
         |  GROUP BY e.dst, nn.nn)""".stripMargin
    }.mkString(",\n")
    s"""
    WITH pairs AS (SELECT id1, id2 FROM ($q68ContainmentSql)),
    e AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL
      SELECT id2 AS src, id1 AS dst FROM pairs),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    nn AS (SELECT count(*) AS nn FROM deg),
    r0 AS (SELECT d.src AS node, nn.nn, $s // nn.nn AS r FROM deg d, nn),
    $rounds
    SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_i,
      CAST(r AS DOUBLE) / 1e12 AS rank
    FROM r$PageRankRounds
    """
  }

  /** q129: per-source QUANTILE NORMALIZATION of the quality score — each
    * document's score replaced by its percentile WITHIN ITS SOURCE
    * ((rank−1)/(n−1); a single-doc source pins to 0.5). The cross-source
    * calibration move: raw quality scores are not comparable across sources
    * (different length/punctuation priors — visible in q72's drift table),
    * so a global "keep the top X%" threshold over raw scores silently
    * over-prunes some sources; rank-normalize first and one global cut
    * means the same thing everywhere. Ranks are integers and the percentile
    * is one exact-cast IEEE division, so the oracle matches bitwise.
    *
    * Scale shape: the rank is the q59 TWO-PHASE BUCKETED RANK
    * ([[DistRank.withBucketedRank]] grouped by source) — rows rank within
    * (source, range-bucket) and per-bucket offsets broadcast back, so a
    * dominant source (half the corpus from one web crawl) ranks B-way
    * parallel instead of sorting on ONE task the way a bare
    * `Window.partitionBy(source)` would (the skew q110's report flags).
    * The per-source sizes ride a |sources|-row broadcast join. */
  def q129QuantileNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    // cached: feeds the bucketed rank (bounds + rank passes) and the
    // |sources|-row size aggregate
    val scored = graft.CachedFrames.track(
      qualityScored(spark, sfDir)
        .select(col("doc_id"), col("source"), col("quality_score")))
    val sizes = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source"))
      .select(col("source").as("_ssrc"), col("n_source"))
    DistRank.withBucketedRank(scored, Seq("source"), "quality_score",
        Seq("doc_id"), "_qr")
      .join(broadcast(sizes), col("source") <=> col("_ssrc"))
      .withColumn("q_rank", col("_qr").cast("int"))
      .withColumn("qnorm",
        when(col("n_source") === 1, 0.5)
          .otherwise((col("q_rank") - 1).cast("double")
            / (col("n_source") - 1).cast("double")))
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("q_rank"), col("n_source"), col("qnorm"))
  }

  val q129QuantileNormalizeSql: String = s"""
    WITH x AS (
      SELECT doc_id, source,
        $nCharsSql AS n_chars_m,
        $nTokensSql AS n_tokens,
        CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
        $nPunctSql AS n_punct
      FROM documents),
    s AS (
      SELECT doc_id, source, $qualityFromStatsSql AS quality_score FROM x),
    r AS (
      SELECT doc_id, source, quality_score,
        row_number() OVER (PARTITION BY source
          ORDER BY quality_score ASC, doc_id ASC) AS q_rank,
        count(*) OVER (PARTITION BY source) AS n_source
      FROM s)
    SELECT doc_id, source, quality_score, CAST(q_rank AS INTEGER) AS q_rank,
      n_source,
      CASE WHEN n_source = 1 THEN 0.5
           ELSE CAST(q_rank - 1 AS DOUBLE) / CAST(n_source - 1 AS DOUBLE) END
        AS qnorm
    FROM r
  """

  /** q133 tuning: minimum bigram support and the leaderboard depth. */
  val PmiMinSupport = 5L
  val PmiTopK = 20

  /** q133: PMI COLLOCATIONS — the [[PmiTopK]] adjacent token pairs with the
    * highest pointwise-mutual-information LIFT, p(xy)/(p(x)·p(y)) =
    * n_xy·N² / (B·n_x·n_y), at support ≥ [[PmiMinSupport]]. The classic
    * collocation miner (Church & Hanks 1990): pairs that co-occur far more
    * than their unigram frequencies predict — multi-word entities, fixed
    * phrases, segmentation candidates for a tokenizer. Reporting LIFT
    * instead of log-PMI keeps the score one division of exactly-derived
    * doubles (same fixed operation order in both engines) — the q92 ln-free
    * move; log is monotone, so the ranking is PMI's ranking.
    *
    * Scale shape: ONE cached tokens frame feeds the unigram counts, the
    * totals and the bigram counts (all map-side-combinable); the
    * min-support filter runs BEFORE the two unigram join-backs, so the
    * joins carry only surviving pairs, and the totals ride a 1-row
    * broadcast. The leaderboard is a TakeOrderedAndProject. */
  def q133PmiPairs(spark: SparkSession, sfDir: String): DataFrame =
    pmiPairsOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  private[graft] def pmiPairsOn(docs: DataFrame): DataFrame = {
    val toks = graft.CachedFrames.track(
      docs.select(expr("""split(trim(text), '\\s+')""").as("toks")))
    val stream = toks.select(col("toks"), posexplode(col("toks")).as(Seq("i", "w")))
    val uni = stream.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = stream.agg(count(lit(1)).as("n_tok"),
      sum(when(col("i") >= 1, 1L).otherwise(0L)).as("n_big"))
    stream.filter(col("i") >= 1)
      .select(expr("toks[i - 1]").as("w1"), col("w").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= PmiMinSupport)
      .join(uni.select(col("w").as("w1"), col("c").as("n_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("n_y")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        col("n_xy").cast("double") * col("n_tok").cast("double")
          * col("n_tok").cast("double")
          / (col("n_big").cast("double") * col("n_x").cast("double")
            * col("n_y").cast("double")))
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
        col("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(PmiTopK)
  }

  val q133PmiPairsSql: String = s"""
    WITH t AS (
      SELECT regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    st AS (
      SELECT tk, i.idx - 1 AS i, tk[i.idx] AS w
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS idx) i),
    uni AS (SELECT w, count(*) AS c FROM st GROUP BY 1),
    tot AS (
      SELECT count(*) AS n_tok,
        CAST(sum(CASE WHEN i >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
      FROM st),
    big AS (
      SELECT tk[i] AS w1, w AS w2, count(*) AS n_xy
      FROM st WHERE i >= 1 GROUP BY 1, 2
      HAVING count(*) >= $PmiMinSupport)
    SELECT b.w1, b.w2, b.n_xy, x.c AS n_x, y.c AS n_y,
      CAST(b.n_xy AS DOUBLE) * CAST(t2.n_tok AS DOUBLE) * CAST(t2.n_tok AS DOUBLE)
        / (CAST(t2.n_big AS DOUBLE) * CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE))
        AS lift
    FROM big b
    JOIN uni x ON b.w1 = x.w
    JOIN uni y ON b.w2 = y.w, tot t2
    ORDER BY lift DESC, w1 ASC, w2 ASC
    LIMIT $PmiTopK
  """

  /** q139: LEXICAL-HEALTH REPORT per source — token count, type (distinct
    * token) count, hapax-legomenon count (types seen exactly once), the
    * type-token ratio and the hapax fraction. The corpus-comparison
    * diagnostic a curation run reads next to q72's drift: a source whose
    * TTR collapses is template spam (the same tokens over and over); one
    * whose hapax fraction explodes is OCR noise or encoding damage — both
    * invisible to per-document scores like q22. Ratios are single
    * divisions of exact BIGINTs, bitwise-portable.
    *
    * Scale shape: one (source, token)-keyed map-side-combinable count —
    * vocabulary-sized output, never broadcast (the q92 lesson) — then a
    * |sources|-row rollup whose hapax test rides the same pass. Two
    * exchanges total, both on compact keys; the text shuffles never. */
  def q139HapaxTtr(spark: SparkSession, sfDir: String): DataFrame =
    hapaxTtrOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  private[graft] def hapaxTtrOn(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(expr("""split(trim(text), '\\s+')""")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("hapax_frac",
        col("n_hapax").cast("double") / col("n_types").cast("double"))

  val q139HapaxTtrSql: String = """
    WITH st AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      FROM documents),
    c AS (SELECT source, w, count(*) AS c FROM st GROUP BY 1, 2)
    SELECT source,
      CAST(sum(c) AS BIGINT) AS n_tokens,
      count(*) AS n_types,
      CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr,
      CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS hapax_frac
    FROM c GROUP BY 1
  """

  /** q145: TRIANGLE COUNT + local clustering coefficient over the
    * winnowing-containment near-dup graph (q68's edges) — per node: degree,
    * triangles through it, and lcc = 2·tri/(deg·(deg−1)). The STRUCTURE
    * diagnostic next to q127's centrality: true near-dup clusters are
    * near-cliques (lcc → 1); a high-degree node with lcc → 0 is a CHAIN
    * hub — the signature of LSH false-positive chaining, where transitive
    * closure (q49/q131) would glue unrelated documents into one cluster.
    * Read this before trusting any consolidation verdict. Counts are exact
    * integers; lcc is one fixed-order division chain — bitwise in both
    * engines.
    *
    * Scale shape: everything is bounded by the NEAR-DUP GRAPH (the
    * similarity gate's OUTPUT, orders smaller than the corpus — the q121/
    * q127 contract). Edges are re-oriented DEGREE-FIRST (low-degree →
    * high-degree endpoint, ties by id — the Chiba-Nishizeki / MR
    * "node-iterator++" orientation): every triangle still appears exactly
    * once as a directed path a→b→c closed by a→c, but wedge work drops
    * from Σ deg(v)² under the id ordering to Σ outdeg(v)² = O(|E|^1.5),
    * because a hub's edges almost all point INTO it — the r12 verdict's
    * watch item, closed. One wedge equi-join + one closing equi-join;
    * per-node tallies combine map-side; per-node triangle counts are
    * orientation-invariant, so the oracle keeps the simpler a<b<c form
    * and the fixture spec pins equality. */
  def q145TriangleCount(spark: SparkSession, sfDir: String): DataFrame =
    triangleCountOn(q68Containment(spark, sfDir).select(col("id1"), col("id2")))

  /** The counting core over ANY oriented (id1 < id2) edge frame —
    * fixture-testable. */
  private[graft] def triangleCountOn(pairs: DataFrame): DataFrame = {
    val deg = graft.CachedFrames.track(
      pairs.select(col("id1").as("node"))
        .unionByName(pairs.select(col("id2").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg")))
    // degree-first orientation: src = the (deg, id)-smaller endpoint
    val dir = graft.CachedFrames.track(pairs
      .join(deg.select(col("node").as("id1"), col("deg").as("d1")), "id1")
      .join(deg.select(col("node").as("id2"), col("deg").as("d2")), "id2")
      .select(
        when(col("d1") < col("d2")
            || (col("d1") === col("d2") && col("id1") < col("id2")),
          col("id1")).otherwise(col("id2")).as("src"),
        when(col("d1") < col("d2")
            || (col("d1") === col("d2") && col("id1") < col("id2")),
          col("id2")).otherwise(col("id1")).as("dst")))
    val tri = dir.select(col("src").as("a"), col("dst").as("b"))
      .join(dir.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
      .join(dir.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .withColumn("lcc", when(col("deg") >= 2,
        lit(2.0) * col("n_tri").cast("double")
          / (col("deg").cast("double") * (col("deg") - 1).cast("double"))))
      .select(col("node").as("doc_id"), col("deg"), col("n_tri"), col("lcc"))
  }

  val q145TriangleCountSql: String = s"""
    WITH pairs AS (SELECT id1, id2 FROM ($q68ContainmentSql)),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT id1 AS node FROM pairs UNION ALL SELECT id2 FROM pairs)
      GROUP BY 1),
    tri AS (
      SELECT ab.id1 AS a, ab.id2 AS b, bc.id2 AS c
      FROM pairs ab
      JOIN pairs bc ON ab.id2 = bc.id1
      JOIN pairs ac ON ac.id1 = ab.id1 AND ac.id2 = bc.id2),
    pn AS (
      SELECT node, count(*) AS n_tri FROM (
        SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY 1)
    SELECT d.node AS doc_id, d.deg,
      CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
      CASE WHEN d.deg >= 2 THEN
        2.0 * CAST(coalesce(p.n_tri, 0) AS DOUBLE)
          / (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE))
      END AS lcc
    FROM deg d LEFT JOIN pn p ON d.node = p.node
  """

  /** q140 tuning: reported percentile levels as exact fractions a/b. */
  val LengthPercentiles: Seq[(String, Int, Int)] =
    Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  /** q140: EXACT length percentiles per source — p50/p90/p99 of the
    * token-count distribution, defined rank-exactly as the value at rank
    * ⌈q·n⌉ of the (n_tokens, doc_id) order (no interpolation, no sketch:
    * the number a sequence-length budget is actually set from). The
    * sibling of q110's skew report on the LENGTH axis: a source whose p99
    * explodes needs chunking (q65) before packing (q59); one whose p50
    * collapses is fragment spam.
    *
    * Scale shape: percentiles-by-sorting is the textbook global-sort
    * trap — here the rank is the q59 two-phase bucketed rank
    * ([[DistRank.withBucketedRank]] grouped by source, B-way parallel
    * inside a dominant source, no bare per-source window), target ranks
    * ⌈a·n/b⌉ are integer arithmetic on the broadcast per-source sizes, and
    * the three values fall out of ONE map-side-combinable conditional-max
    * rollup — |sources| rows out, nothing corpus-sized sorts on one task.
    * All outputs are exact BIGINTs. */
  def q140LengthPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    lengthPercentilesOn(graft.CachedFrames.track(
      // cached: feeds the bucketed rank (bounds + rank) and the sizes rollup
      Tables.parallelized(Tables(spark, sfDir, "documents"))
        .select(col("doc_id"), col("source"),
          expr("""CAST(size(split(trim(text), '\\s+')) AS BIGINT)""")
            .as("n_tokens"))))

  /** The percentile core over ANY (doc_id, source, n_tokens) frame —
    * fixture-testable. */
  private[graft] def lengthPercentilesOn(t: DataFrame): DataFrame = {
    val sizes = t.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
      .select(col("source").as("_ssrc"), col("n_source"))
    val aggs = LengthPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_source + ${b - 1}) DIV $b"), col("n_tokens"))).as(name)
    }
    DistRank.withBucketedRank(t, Seq("source"), "n_tokens", Seq("doc_id"), "_r")
      .join(broadcast(sizes), col("source") <=> col("_ssrc"))
      .groupBy(col("source"), col("n_source"))
      .agg(aggs.head, aggs.tail: _*)
  }

  val q140LengthPercentilesSql: String = {
    val cases = LengthPercentiles.map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_source + ${b - 1}) // $b THEN n_tokens END) AS $name"
    }.mkString(",\n      ")
    s"""
    WITH t AS (
      SELECT doc_id, source,
        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents),
    r AS (
      SELECT source, n_tokens,
        row_number() OVER (PARTITION BY source ORDER BY n_tokens ASC, doc_id ASC)
          AS rk,
        count(*) OVER (PARTITION BY source) AS n_source
      FROM t)
    SELECT source, n_source,
      $cases
    FROM r GROUP BY 1, 2
  """
  }

  /** q142: LEXICAL CONCENTRATION per source — Simpson index Σ(c/N)² (the
    * probability two random tokens coincide), its Gini-diversity
    * complement 1−Simpson, and the head share max(c)/N. The concentration
    * axis q139's TTR misses: TTR counts the vocabulary, Simpson weighs it —
    * a source can keep a huge tail vocabulary (healthy TTR) while one
    * template token takes half the mass (head_share → 0.5, Simpson
    * explodes), the signature of boilerplate injection. Σc² accumulates in
    * DECIMAL(38,0) (oracle: HUGEINT) so the sum is exact far past BIGINT
    * (q126's lesson: Σc² wraps at c ≳ 3e9); the reported doubles are one
    * exact-value cast + a fixed division chain, bitwise in both engines.
    *
    * Scale shape: identical to q139 — one (source, token) map-side count
    * (vocabulary-sized output, never broadcast), then a |sources|-row
    * rollup carrying the decimal Σc² and max on the same pass. Two
    * compact-key exchanges; text never shuffles. */
  def q142TokenGini(spark: SparkSession, sfDir: String): DataFrame =
    tokenGiniOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  private[graft] def tokenGiniOn(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(expr("""split(trim(text), '\\s+')""")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .as("sc2"),
        max(col("c")).as("c_max"))
      .withColumn("simpson", col("sc2").cast("double")
        / (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
      .withColumn("gini", lit(1.0) - col("simpson"))
      .withColumn("head_share",
        col("c_max").cast("double") / col("n_tokens").cast("double"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("c_max"),
        col("simpson"), col("gini"), col("head_share"))

  val q142TokenGiniSql: String = """
    WITH st AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      FROM documents),
    c AS (SELECT source, w, count(*) AS c FROM st GROUP BY 1, 2),
    s AS (
      SELECT source,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        count(*) AS n_types,
        sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sc2, -- guard:ok internal HUGEINT sum, output only as exact-cast DOUBLE
        CAST(max(c) AS BIGINT) AS c_max
      FROM c GROUP BY 1)
    SELECT source, n_tokens, n_types, c_max,
      CAST(CAST(sc2 AS VARCHAR) AS DOUBLE)
        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS simpson,
      1.0 - CAST(CAST(sc2 AS VARCHAR) AS DOUBLE)
        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS gini,
      CAST(c_max AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS head_share
    FROM s
  """

  /** q146 tuning: co-occurrence support cut / damped rounds / fixed-point
    * scale / keywords kept. */
  private[ops] val TextRankMinSupport = 3
  private[graft] val TextRankRounds = 3
  private[ops] val TextRankScale = 1000000000000L
  private[ops] val TextRankTopK = 50

  /** q146: TEXTRANK keyword extraction (Mihalcea-Tarau) — PageRank over
    * the word CO-OCCURRENCE graph (adjacent-token pairs with corpus count
    * >= [[TextRankMinSupport]], edge weight = that count), the unsupervised
    * keyword ranker: a word matters when it co-occurs with words that
    * themselves matter, which plain frequency (q43) and TF-IDF (q61) both
    * miss (they score hub words and rare words respectively; TextRank
    * scores CONNECTED words). Same damped fixed-point engine as q127 but
    * WEIGHTED: a node's mass splits across neighbours proportional to edge
    * weight (contribution = (r·w_uv) DIV W_u with W_u = Σ_v w_uv).
    *
    * Exactness contract: ranks are fixed-point BIGINTs at
    * [[TextRankScale]]; every step is integer floor arithmetic so both
    * engines agree bitwise; the only double is the final display division.
    * Headroom bound (the q130 discipline): the per-edge product r·w_uv
    * needs w_uv·Scale < 2^63, i.e. a single bigram repeated < 9.2e6 times
    * at Scale=1e12 — far above the gate corpora; at web scale drop Scale
    * to 1e9 (the rank resolution trade, not a correctness cliff).
    *
    * Scale shape: the co-occurrence graph is built by one map-side-combined
    * (wa, wb) count with the support cut applied BEFORE symmetrization, so
    * the iterated edge list is vocabulary-graph-sized, never corpus-sized;
    * each round is q127's iterate-on-the-edge-list plan (broadcast-eligible
    * weighted-degree join + edge-keyed aggregation, Σ work =
    * rounds × |edges|). The final top-k is TakeOrderedAndProject. */
  def q146Textrank(spark: SparkSession, sfDir: String): DataFrame =
    textrankOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The weighted iteration core over ANY document frame —
    * fixture-testable. */
  private[graft] def textrankOn(docs: DataFrame): DataFrame = {
    val s = TextRankScale
    val stream = docs.select(expr("""split(trim(text), '\\s+')""").as("toks"))
      .select(col("toks"), posexplode(col("toks")).as(Seq("i", "w")))
    val und = stream.filter(col("i") >= 1)
      .select(least(expr("toks[i - 1]"), col("w")).as("wa"),
        greatest(expr("toks[i - 1]"), col("w")).as("wb"))
      .filter(col("wa") =!= col("wb")) // a repeated token is not an edge
      .groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("w_uv"))
      .filter(col("w_uv") >= TextRankMinSupport)
    val edges = graft.CachedFrames.track(
      und.select(col("wa").as("src"), col("wb").as("dst"), col("w_uv"))
        .unionByName(
          und.select(col("wb").as("src"), col("wa").as("dst"), col("w_uv"))))
    val wdeg = graft.CachedFrames.track(
      edges.groupBy(col("src")).agg(sum(col("w_uv")).as("wsum")))
    val nn = wdeg.agg(count(lit(1)).as("nn"))
    // wsum rides the (cached) edge artifact — the q127 deg-carry: one
    // src-keyed join + one dst rollup per round, value-identical
    // contributions (r * w_uv) DIV wsum (r18 negative result: the
    // graph-sized checkpoint variant lost ~1.5 s here — see pagerankOn)
    val edgesW = graft.CachedFrames.track(edges.join(wdeg, Seq("src")))
    var rk = wdeg.select(col("src").as("node")).crossJoin(broadcast(nn))
      .select(col("node"), col("nn"), expr(s"$s DIV nn").as("r"))
    for (_ <- 1 to TextRankRounds) {
      val inSum = edgesW
        .join(rk.select(col("node").as("src"), col("r")), Seq("src"))
        .select(col("dst"), expr("(r * w_uv) DIV wsum").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_c"))
        .select(col("dst").as("node"), col("in_c"))
      // r18: same as q127 — symmetric edges make inSum's node set equal
      // rk's, so the per-round node-keyed join-back is replaced by the
      // 1-row nn broadcast (value-identical rows, one less join/round)
      rk = inSum.crossJoin(broadcast(nn))
        .select(col("node"), col("nn"),
          expr(s"(15 * $s) DIV (100 * nn) + (85 * in_c) DIV 100").as("r"))
    }
    rk.select(col("node").as("word"), col("r").as("rank_i"),
        (col("r").cast("double") / lit(1.0e12)).as("rank"))
      .orderBy(col("rank_i").desc, col("word").asc)
      .limit(TextRankTopK)
  }

  /** The q146 oracle unrolls the identical weighted integer rounds. */
  val q146TextrankSql: String = {
    val s = TextRankScale
    val rounds = (1 to TextRankRounds).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS dst, (r.r * e.w_uv) // d.wsum AS c
         |  FROM e JOIN r${k - 1} r ON e.src = r.node
         |  JOIN wdeg d ON e.src = d.src),
         |r$k AS (
         |  SELECT c.dst AS node, nn.nn,
         |    (15 * $s) // (100 * nn.nn)
         |      + (85 * CAST(sum(c.c) AS BIGINT)) // 100 AS r
         |  FROM c$k c, nn GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""
    WITH t AS (
      SELECT regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
    st AS (
      SELECT tk, i.idx - 1 AS i, tk[i.idx] AS w
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS idx) i),
    p AS (
      SELECT least(tk[i], w) AS wa, greatest(tk[i], w) AS wb,
        count(*) AS w_uv
      FROM st WHERE i >= 1 AND tk[i] <> w
      GROUP BY 1, 2 HAVING count(*) >= $TextRankMinSupport),
    e AS (
      SELECT wa AS src, wb AS dst, w_uv FROM p
      UNION ALL
      SELECT wb AS src, wa AS dst, w_uv FROM p),
    wdeg AS (SELECT src, CAST(sum(w_uv) AS BIGINT) AS wsum FROM e GROUP BY 1),
    nn AS (SELECT count(*) AS nn FROM wdeg),
    r0 AS (SELECT d.src AS node, nn.nn, $s // nn.nn AS r FROM wdeg d, nn),
    $rounds
    SELECT node AS word, CAST(r AS BIGINT) AS rank_i,
      CAST(r AS DOUBLE) / 1e12 AS rank
    FROM r$TextRankRounds
    ORDER BY rank_i DESC, word ASC
    LIMIT $TextRankTopK
    """
  }

  /** q147 tuning: query phrases auto-selected (top trigrams). */
  private[ops] val PhraseTopQ = 3

  /** q147: PHRASE SEARCH over a POSITIONAL INVERTED INDEX — the postings
    * table (word, doc_id, pos) probed three times with position-adjacency
    * equi-joins (p2.pos = p1.pos+1, p3.pos = p1.pos+2), the way a search
    * engine answers "exact phrase" queries WITHOUT rescanning raw text.
    * The query set is self-derived for determinism: the corpus's top
    * [[PhraseTopQ]] trigrams (count desc, then lexicographic). The output
    * carries BOTH the scan-side trigram count (n_corpus) and the
    * index-side hit count (n_hits) — equal by construction, so the row
    * itself witnesses that the index lookup loses nothing.
    *
    * Scale shape: the phrase table is [[PhraseTopQ]] rows and rides a
    * broadcast into every probe, so each postings probe is a
    * broadcast-filtered scan of ONE posting list, and the two adjacency
    * probes are (doc_id, pos)-keyed equi-joins — work is
    * Σ posting-list lengths of the query terms, never corpus-quadratic.
    * Phrase selection itself is one map-side-combined trigram count +
    * TakeOrderedAndProject. */
  def q147PhraseSearch(spark: SparkSession, sfDir: String): DataFrame =
    phraseSearchOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  private[graft] def phraseSearchOn(docs: DataFrame): DataFrame = {
    val toks = graft.CachedFrames.track(
      docs.select(col("doc_id"), expr("""split(trim(text), '\\s+')""").as("toks")))
    val postings = graft.CachedFrames.track(
      toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w"))))
    val phrases = toks
      .select(col("toks"), posexplode(col("toks")).as(Seq("i", "w")))
      .filter(col("i") >= 2)
      .select(expr("toks[i - 2]").as("pw1"), expr("toks[i - 1]").as("pw2"),
        col("w").as("pw3"))
      .groupBy(col("pw1"), col("pw2"), col("pw3"))
      .agg(count(lit(1)).as("n_corpus"))
      .orderBy(col("n_corpus").desc, col("pw1").asc, col("pw2").asc,
        col("pw3").asc)
      .limit(PhraseTopQ)
    val p1 = postings.join(broadcast(phrases), col("w") === col("pw1"))
      .select(col("doc_id").as("d1"), col("pos"),
        col("pw1"), col("pw2"), col("pw3"), col("n_corpus"))
    val p2 = postings
      .select(col("doc_id").as("d2"), col("pos").as("pos2"), col("w").as("w2"))
    val p3 = postings
      .select(col("doc_id").as("d3"), col("pos").as("pos3"), col("w").as("w3"))
    p1.join(p2, col("d2") === col("d1") && col("pos2") === col("pos") + 1
        && col("w2") === col("pw2"))
      .join(p3, col("d3") === col("d1") && col("pos3") === col("pos") + 2
        && col("w3") === col("pw3"))
      .groupBy(col("pw1"), col("pw2"), col("pw3"), col("n_corpus"))
      .agg(count(lit(1)).as("n_hits"), countDistinct(col("d1")).as("n_docs"))
      .select(concat_ws(" ", col("pw1"), col("pw2"), col("pw3")).as("phrase"),
        col("n_corpus"), col("n_hits"), col("n_docs"))
      .orderBy(col("phrase").asc)
  }

  val q147PhraseSearchSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
      FROM documents),
    post AS (
      SELECT doc_id, i.idx - 1 AS pos, tk[i.idx] AS w
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS idx) i),
    tri AS (
      SELECT tk[i.idx - 2] AS pw1, tk[i.idx - 1] AS pw2, tk[i.idx] AS pw3,
        count(*) AS n_corpus
      FROM t, LATERAL (SELECT unnest(generate_series(3, len(tk))) AS idx) i
      GROUP BY 1, 2, 3),
    ph AS (
      SELECT * FROM tri
      ORDER BY n_corpus DESC, pw1 ASC, pw2 ASC, pw3 ASC LIMIT $PhraseTopQ),
    hit AS (
      SELECT ph.pw1, ph.pw2, ph.pw3, ph.n_corpus, p1.doc_id
      FROM ph
      JOIN post p1 ON p1.w = ph.pw1
      JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
        AND p2.w = ph.pw2
      JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
        AND p3.w = ph.pw3)
    SELECT concat_ws(' ', pw1, pw2, pw3) AS phrase, n_corpus,
      count(*) AS n_hits, count(DISTINCT doc_id) AS n_docs
    FROM hit GROUP BY 1, 2
    ORDER BY phrase ASC
  """

  /** q149: HITS hub/authority scores over the DIRECTED containment graph —
    * an edge points excerpt → original (the endpoint MORE contained in the
    * other is the quoting side; ties carry no direction and are dropped).
    * Two unnormalized rounds, which keeps every score an EXACT path count:
    * auth1 = in-degree, hub1 = Σ auth1 over out-neighbours, auth2 = Σ hub1
    * over in-neighbours — "how much quoting flows INTO this doc through
    * two hops". PageRank (q127) finds the mixing hubs of the undirected
    * graph; HITS separates the two roles the direction encodes: templates
    * that GET quoted (authorities) vs digest docs that quote widely
    * (hubs). Normalized shares are one exact-integer division each at
    * display. Growth bound (the q146 discipline): scores multiply by at
    * most max-degree per round, so 2 rounds need maxdeg⁴ < 2^63 —
    * maxdeg < 54k, orders past the DF-capped edge generator's bound.
    *
    * Scale shape: each round is one edge-keyed equi-join + map-side
    * combined aggregation over the CACHED DF-capped edge list (q127's
    * iterate-on-the-edge-list plan); node scores re-attach through
    * node-keyed joins, never a cross join; the share denominators ride a
    * 1-row broadcast. */
  def q149Hits(spark: SparkSession, sfDir: String): DataFrame =
    hitsOn(q68Containment(spark, sfDir)
      .select(col("id1"), col("id2"), col("contain1"), col("contain2")))

  /** The two-round core over ANY (id1, id2, contain1, contain2) frame —
    * fixture-testable. */
  private[graft] def hitsOn(pairs: DataFrame): DataFrame = {
    val edges = graft.CachedFrames.track(
      pairs.filter(col("contain1") > col("contain2"))
        .select(col("id1").as("src"), col("id2").as("dst"))
        .unionByName(pairs.filter(col("contain2") > col("contain1"))
          .select(col("id2").as("src"), col("id1").as("dst"))))
    val nodes = graft.CachedFrames.track(
      edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct())
    val auth1 = edges.groupBy(col("dst")).agg(count(lit(1)).as("a1"))
    val hub1 = graft.CachedFrames.track(
      edges.join(auth1, Seq("dst"))
        .groupBy(col("src")).agg(sum(col("a1")).as("h1")))
    val auth2 = edges.join(hub1, Seq("src"))
      .groupBy(col("dst")).agg(sum(col("h1")).as("a2"))
    val scored = graft.CachedFrames.track(
      nodes.join(hub1.select(col("src").as("node"), col("h1")), Seq("node"), "left")
        .join(auth2.select(col("dst").as("node"), col("a2")), Seq("node"), "left")
        .select(col("node"), coalesce(col("h1"), lit(0L)).as("hub_i"),
          coalesce(col("a2"), lit(0L)).as("auth_i")))
    val tot = scored.agg(sum(col("hub_i")).as("ht"), sum(col("auth_i")).as("at"))
    scored.crossJoin(broadcast(tot))
      .select(col("node").as("doc_id"), col("hub_i"), col("auth_i"),
        when(col("ht") > 0,
          col("hub_i").cast("double") / col("ht").cast("double"))
          .otherwise(lit(0.0)).as("hub_share"),
        when(col("at") > 0,
          col("auth_i").cast("double") / col("at").cast("double"))
          .otherwise(lit(0.0)).as("auth_share"))
  }

  val q149HitsSql: String = s"""
    WITH pairs AS (
      SELECT id1, id2, contain1, contain2 FROM ($q68ContainmentSql)),
    e AS (
      SELECT id1 AS src, id2 AS dst FROM pairs WHERE contain1 > contain2
      UNION ALL
      SELECT id2 AS src, id1 AS dst FROM pairs WHERE contain2 > contain1),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    a1 AS (SELECT dst, count(*) AS a1 FROM e GROUP BY 1),
    h1 AS (
      SELECT e.src, CAST(sum(a1.a1) AS BIGINT) AS h1
      FROM e JOIN a1 ON e.dst = a1.dst GROUP BY 1),
    a2 AS (
      SELECT e.dst, CAST(sum(h1.h1) AS BIGINT) AS a2
      FROM e JOIN h1 ON e.src = h1.src GROUP BY 1),
    sc AS (
      SELECT n.node, COALESCE(h1.h1, 0) AS hub_i, COALESCE(a2.a2, 0) AS auth_i
      FROM nodes n
      LEFT JOIN h1 ON n.node = h1.src
      LEFT JOIN a2 ON n.node = a2.dst),
    tot AS (
      SELECT CAST(sum(hub_i) AS BIGINT) AS ht,
        CAST(sum(auth_i) AS BIGINT) AS at FROM sc)
    SELECT node AS doc_id, hub_i, auth_i,
      CASE WHEN ht > 0 THEN CAST(hub_i AS DOUBLE) / CAST(ht AS DOUBLE)
        ELSE 0.0 END AS hub_share,
      CASE WHEN at > 0 THEN CAST(auth_i AS DOUBLE) / CAST(at AS DOUBLE)
        ELSE 0.0 END AS auth_share
    FROM sc, tot
  """

  /** q153: DEGREE ASSORTATIVITY of the near-dup graph — the Pearson
    * correlation of endpoint degrees over the (symmetrized) edge list.
    * Positive: duplicates cluster among other heavily-duplicated docs
    * (mirror farms); negative: hub-and-spoke (one template quoted by many
    * otherwise-clean docs — q145's chaining signature, summarized to a
    * single corpus-level number). All five moments are exact BIGINT sums
    * (degrees are DF-cap-bounded, so Σdeg² over edges stays far inside
    * 2^63); the final expression is one fixed-order double formula whose
    * only non-arithmetic op is sqrt — IEEE-correctly-rounded in both
    * engines, unlike ln (the SCALE.md float contract).
    *
    * Scale shape: degree count + one node-keyed join back to edges + one
    * map-side-combined 1-row moment rollup — work is O(|edges|), output
    * is ONE row. */
  def q153Assortativity(spark: SparkSession, sfDir: String): DataFrame =
    assortativityOn(q68Containment(spark, sfDir).select(col("id1"), col("id2")))

  private[graft] def assortativityOn(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
    val deg = graft.CachedFrames.track(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val m = edges
      .join(deg.select(col("src"), col("deg").as("dx")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("dy")), Seq("dst"))
      .agg(count(lit(1)).as("m_edges"), sum(col("dx")).as("sx"),
        sum(col("dy")).as("sy"), sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
    m.crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .select(col("n_nodes"), col("m_edges"),
        when((col("m_edges") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("m_edges") * col("syy") - col("sy") * col("sy")) > 0,
          (col("m_edges") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("m_edges") * col("sxx") - col("sx") * col("sx"))
                .cast("double"))
              * sqrt((col("m_edges") * col("syy") - col("sy") * col("sy"))
                .cast("double")))).as("assortativity"))
  }

  val q153AssortativitySql: String = s"""
    WITH pairs AS (SELECT id1, id2 FROM ($q68ContainmentSql)),
    e AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL
      SELECT id2 AS src, id1 AS dst FROM pairs),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    mm AS (
      SELECT count(*) AS m_edges,
        CAST(sum(dx.deg) AS BIGINT) AS sx, CAST(sum(dy.deg) AS BIGINT) AS sy,
        CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy,
        CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx,
        CAST(sum(dy.deg * dy.deg) AS BIGINT) AS syy
      FROM e JOIN deg dx ON e.src = dx.src JOIN deg dy ON e.dst = dy.src),
    nn AS (SELECT count(*) AS n_nodes FROM deg)
    SELECT n_nodes, m_edges,
      CASE WHEN (m_edges * sxx - sx * sx) > 0 AND (m_edges * syy - sy * sy) > 0
        THEN CAST(m_edges * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(m_edges * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(m_edges * syy - sy * sy AS DOUBLE)))
      END AS assortativity
    FROM mm, nn
  """

  /** q186: NEWMAN MODULARITY of the q121 label assignment over the
    * containment graph — the graph family measures structure
    * (q127/q145/q149/q153/q156) but never graded the one CLUSTERING it
    * produces. Communities are q121's propagated labels where a vote
    * landed, each node's own `lang` otherwise (the seed set), and
    * Q = Σ_c (e_c/m − (d_c/2m)²) says whether label propagation carved
    * the near-dup graph into label-coherent regions (Q → 1) or the labels
    * cut across the graph's real cluster structure (Q ≈ 0 — the q100
    * finding, quantified at the graph level: near-dup neighborhoods on
    * this corpus barely correlate with `lang`).
    *
    * Exactness: with E_in = within-community edges and D2 = Σ_c d_c²,
    * Q = (4m·E_in − D2) / (4m²) — numerator and denominator exact in
    * DECIMAL(38,0)/HUGEINT (both ≤ 4m², exact to m ≈ 1.5e18 edges), ONE
    * exact-cast division. Pinned bitwise against a plain-Scala BigInt
    * oracle on a crafted two-cluster graph.
    *
    * Scale shape: q121's propagation (bounded by the near-dup graph) +
    * one degree rollup, one label coalesce join, a ≤|labels| d_c rollup,
    * and ONE edge-keyed membership join pass for E_in — O(|edges|) total,
    * 1 row out. Joins the Bench graph group / GraphReport bundle (shares
    * the cached q68 edge materialization). */
  def q186Modularity(spark: SparkSession, sfDir: String): DataFrame =
    modularityOn(q68Containment(spark, sfDir).select(col("id1"), col("id2")),
      Tables(spark, sfDir, "documents").select(col("doc_id"), col("lang")))

  /** The modularity core over ANY undirected (id1, id2) edge frame and
    * (doc_id, lang) seed-label frame — fixture-testable. */
  private[graft] def modularityOn(pairs: DataFrame,
      labels: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val prop = labelPropagationOn(pairs, labels)
      .select(col("doc_id").as("node"), col("pred_lang"))
    val sym = pairs.select(col("id1").as("v"), col("id2").as("u"))
      .unionByName(pairs.select(col("id2").as("v"), col("id1").as("u")))
    val deg = sym.groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // community per graph node: the propagated label where q121 voted,
    // the node's own seed label otherwise
    val comm = graft.CachedFrames.track(deg
      .join(labels.select(col("doc_id").as("v"), col("lang")), Seq("v"))
      .join(prop.withColumnRenamed("node", "v"), Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("pred_lang"), col("lang")).as("c")))
    val d2 = comm.groupBy(col("c")).agg(sum(col("deg")).as("dc"))
      .agg(sum(d38(col("dc")) * d38(col("dc"))).as("sdc2"),
        count(lit(1)).as("n_comm"))
    val ein = pairs
      .join(comm.select(col("v").as("id1"), col("c").as("c1")), Seq("id1"))
      .join(comm.select(col("v").as("id2"), col("c").as("c2")), Seq("id2"))
      .agg(count(lit(1)).as("m_edges"),
        sum(when(col("c1") === col("c2"), 1L).otherwise(0L)).as("e_in"))
    ein.crossJoin(broadcast(d2))
      .select(col("m_edges"), col("n_comm").as("n_communities"), col("e_in"),
        when(col("m_edges") > 0,
          (lit(4) * d38(col("m_edges")) * d38(col("e_in")) - col("sdc2"))
            .cast("double")
            / (lit(4) * d38(col("m_edges")) * d38(col("m_edges")))
              .cast("double")).as("modularity"))
  }

  val q186ModularitySql: String = s"""
    WITH pairs AS (SELECT id1, id2 FROM ($q68ContainmentSql)),
    e AS (
      SELECT id1 AS v, id2 AS u FROM pairs
      UNION ALL
      SELECT id2 AS v, id1 AS u FROM pairs),
    deg AS (SELECT v, count(*) AS deg FROM e GROUP BY 1),
    prop AS (SELECT doc_id, pred_lang FROM ($q121LabelPropagationSql)),
    comm AS (
      SELECT deg.v, deg.deg, coalesce(p.pred_lang, d.lang) AS c
      FROM deg JOIN documents d ON deg.v = d.doc_id
      LEFT JOIN prop p ON deg.v = p.doc_id),
    d2 AS (
      SELECT sum(dc * dc) AS sdc2, CAST(count(*) AS BIGINT) AS n_comm -- guard:ok internal HUGEINT; output below is exact-cast DOUBLE
      FROM (SELECT CAST(sum(deg) AS HUGEINT) AS dc FROM comm GROUP BY c)),
    ein AS (
      SELECT CAST(count(*) AS BIGINT) AS m_edges,
        CAST(sum(CASE WHEN c1.c = c2.c THEN 1 ELSE 0 END) AS BIGINT) AS e_in
      FROM pairs JOIN comm c1 ON pairs.id1 = c1.v
        JOIN comm c2 ON pairs.id2 = c2.v)
    SELECT m_edges, n_comm AS n_communities, e_in,
      CASE WHEN m_edges > 0 THEN
        CAST(CAST(4 * CAST(m_edges AS HUGEINT) * e_in - sdc2 AS VARCHAR) AS DOUBLE)
          / CAST(CAST(4 * CAST(m_edges AS HUGEINT) * m_edges AS VARCHAR) AS DOUBLE)
      END AS modularity
    FROM ein, d2
  """

  /** q196: TRAIN/VAL/TEST SPLIT-LEAKAGE AUDIT over the near-dup graph —
    * documents are assigned to splits by the deterministic hash
    * pmod(md5_prefix56('sp:' ∥ doc_id), 10) (0-7 train, 8 val, 9 test),
    * and every q68 near-dup edge is classified by the unordered split
    * pair of its endpoints. A near-duplicate pair straddling train and
    * test IS eval contamination (the model saw the answer's twin), so the
    * observed share of each pair class is reported against its
    * independence expectation (2·p_a·p_b, p_a² on the diagonal) with the
    * exact lift — lift ≈ 1 everywhere says hash-splitting is safe for
    * this corpus; a depressed cross-split lift only happens when someone
    * split by a near-dup-correlated key and is the audit's alarm.
    *
    * vs q86_split_leakage (Curation.scala): q86 counts the raw CROSS-split
    * SimHash near-dup pairs under q76's split (off-diagonal counts only,
    * the regression gate for dedup-before-split ordering); q196 classifies
    * EVERY q68 containment edge — diagonal included — and normalizes each
    * class by its independence expectation. Same phrase, different graph
    * and different statistic; both stay registered.
    *
    * Exactness: all counts exact; share, expected_share and lift are
    * single divisions of exact DECIMAL(38,0)/HUGEINT products
    * (n·N² and total·k·c_a·c_b — exact to ~1e12 edges over ~1e9 docs).
    * Split names order alphabetically (ASCII — both engines agree).
    *
    * Scale shape: the split tag is a per-row codegen hash; the edge
    * classification is two broadcast-eligible doc-keyed joins against the
    * 2-column split frame; the rollup is ≤6 rows; sizes and totals ride
    * 1-row/3-row broadcasts. Joins the Bench graph group / GraphReport
    * bundle (shares the cached q68 edge artifact). */
  def q196SplitLeakage(spark: SparkSession, sfDir: String): DataFrame =
    splitLeakageOn(q68Containment(spark, sfDir).select(col("id1"), col("id2")),
      Tables(spark, sfDir, "documents").select(col("doc_id")))

  /** The deterministic 80/10/10 split tag over a (doc_id) roster — the
    * assignment q196 audits, single-sourced with its streaming twin. */
  private[graft] def splitTagOf(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), expr(
      "CASE WHEN pmod(md5_prefix56(concat('sp:', CAST(doc_id AS STRING))), 10) < 8 " +
        "THEN 'train' WHEN pmod(md5_prefix56(concat('sp:', " +
        "CAST(doc_id AS STRING))), 10) = 8 THEN 'val' ELSE 'test' END")
      .as("split"))
  }

  /** q196's COUNTING stage — unordered split-pair class counts of an edge
    * frame against a tagged roster. Also the live surface of
    * [[graft.streaming.EventStreams.splitLeakageStream]]: per-class counts
    * are the mergeable digest (the refresh law), so this works unchanged
    * over a streaming edge frame with ≤6 counters of state. */
  private[graft] def splitClassCounts(pairs: DataFrame,
      dsplit: DataFrame): DataFrame =
    pairs
      .join(dsplit.select(col("doc_id").as("id1"), col("split").as("sp1")),
        Seq("id1"))
      .join(dsplit.select(col("doc_id").as("id2"), col("split").as("sp2")),
        Seq("id2"))
      .select(least(col("sp1"), col("sp2")).as("split_a"),
        greatest(col("sp1"), col("sp2")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_edges"))

  /** The audit core over ANY undirected (id1, id2) edge frame and
    * (doc_id) roster — fixture-testable. */
  private[graft] def splitLeakageOn(pairs: DataFrame,
      docs: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val dsplit = graft.CachedFrames.track(splitTagOf(docs))
    val sizes = dsplit.groupBy(col("split")).agg(count(lit(1)).as("c"))
    val nTot = dsplit.agg(count(lit(1)).as("n_docs"))
    val byPair = splitClassCounts(pairs, dsplit)
    val totEdges = byPair.agg(sum(col("n_edges")).as("total_edges"))
    byPair
      .join(broadcast(sizes.select(col("split").as("split_a"),
        col("c").as("ca"))), Seq("split_a"))
      .join(broadcast(sizes.select(col("split").as("split_b"),
        col("c").as("cb"))), Seq("split_b"))
      .crossJoin(broadcast(totEdges)).crossJoin(broadcast(nTot))
      .withColumn("k", when(col("split_a") === col("split_b"), 1L)
        .otherwise(2L))
      .select(col("split_a"), col("split_b"), col("n_edges"),
        (col("n_edges").cast("double") / col("total_edges").cast("double"))
          .as("share"),
        ((d38(col("k")) * d38(col("ca")) * d38(col("cb"))).cast("double")
          / (d38(col("n_docs")) * d38(col("n_docs"))).cast("double"))
          .as("expected_share"),
        ((d38(col("n_edges")) * d38(col("n_docs")) * d38(col("n_docs")))
          .cast("double")
          / (d38(col("total_edges")) * d38(col("k")) * d38(col("ca"))
            * d38(col("cb"))).cast("double")).as("lift"))
  }

  val q196SplitLeakageSql: String = s"""
    WITH ds AS (
      SELECT doc_id,
        CASE WHEN ('0x' || substr(md5('sp:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 10 < 8
          THEN 'train'
          WHEN ('0x' || substr(md5('sp:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 10 = 8
          THEN 'val' ELSE 'test' END AS split
      FROM documents),
    sz AS (SELECT split, CAST(count(*) AS BIGINT) AS c FROM ds GROUP BY 1),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM ds),
    e AS (SELECT id1, id2 FROM ($q68ContainmentSql)),
    tagged AS (
      SELECT least(a.split, b.split) AS split_a,
        greatest(a.split, b.split) AS split_b
      FROM e JOIN ds a ON e.id1 = a.doc_id JOIN ds b ON e.id2 = b.doc_id),
    bp AS (
      SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_edges
      FROM tagged GROUP BY 1, 2),
    te AS (SELECT CAST(sum(n_edges) AS BIGINT) AS total_edges FROM bp)
    SELECT bp.split_a, bp.split_b, bp.n_edges,
      CAST(bp.n_edges AS DOUBLE) / CAST(te.total_edges AS DOUBLE) AS share,
      CAST(CAST((CASE WHEN bp.split_a = bp.split_b THEN 1 ELSE 2 END)
          * CAST(ca.c AS HUGEINT) * cb.c AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(nt.n_docs AS HUGEINT) * nt.n_docs AS VARCHAR) AS DOUBLE)
        AS expected_share,
      CAST(CAST(CAST(bp.n_edges AS HUGEINT) * nt.n_docs * nt.n_docs AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(te.total_edges AS HUGEINT)
          * (CASE WHEN bp.split_a = bp.split_b THEN 1 ELSE 2 END)
          * ca.c * cb.c AS VARCHAR) AS DOUBLE) AS lift
    FROM bp
      JOIN sz ca ON bp.split_a = ca.split
      JOIN sz cb ON bp.split_b = cb.split, te, nt
  """

  /** q154: per-document BIGRAM NOVELTY — the fraction of a doc's distinct
    * bigrams whose FIRST corpus occurrence (minimum doc_id, the ingestion
    * order) is this doc. The memorization-risk lens inverted: q118 asks
    * "which grams repeat across docs", this asks "how much of each doc is
    * new when it arrives" — boilerplate re-ingestion scores near 0, fresh
    * content near 1, and the per-source average of this is the marginal
    * value of continuing to crawl a source. Counts are exact; the ratio is
    * one exact-cast division.
    *
    * Scale shape: ONE distinct (bigram, doc) collapse feeds both sides:
    * the min-doc-per-bigram rollup is map-side combinable, and the
    * join back is bigram-keyed equi — never doc×doc. Nothing
    * vocabulary-sized broadcasts (the q92 lesson). */
  def q154BigramNovelty(spark: SparkSession, sfDir: String): DataFrame =
    bigramNoveltyOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  private[graft] def bigramNoveltyOn(docs: DataFrame): DataFrame = {
    val bg = graft.CachedFrames.track(
      docs.select(col("doc_id"), expr("""split(trim(text), '\\s+')""").as("toks"))
        .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("i", "w")))
        .filter(col("i") >= 1)
        .select(col("doc_id"), expr("toks[i - 1]").as("w1"), col("w").as("w2"))
        .distinct())
    val first = bg.groupBy(col("w1"), col("w2"))
      .agg(min(col("doc_id")).as("first_doc"))
    bg.join(first, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_bigrams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_bigrams").cast("double"))
          .as("novelty"))
  }

  val q154BigramNoveltySql: String = """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
      FROM documents),
    bg AS (
      SELECT DISTINCT doc_id, tk[i.idx - 1] AS w1, tk[i.idx] AS w2
      FROM t, LATERAL (SELECT unnest(generate_series(2, len(tk))) AS idx) i),
    first AS (
      SELECT w1, w2, min(doc_id) AS first_doc FROM bg GROUP BY 1, 2)
    SELECT bg.doc_id, count(*) AS n_bigrams,
      CAST(sum(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        AS n_novel,
      CAST(sum(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS novelty
    FROM bg JOIN first f ON bg.w1 = f.w1 AND bg.w2 = f.w2
    GROUP BY 1
  """

  /** q156 tuning: core degree threshold / peeling rounds. */
  private[ops] val KCoreK = 2
  private[ops] val KCoreRounds = 4

  /** q156: K-CORE PEELING of the near-dup graph — [[KCoreRounds]] rounds of
    * "drop every node with degree < [[KCoreK]], drop edges touching it,
    * recount". What survives is the densely-duplicated CORE: template farms
    * and mirror clusters whose members corroborate each other, with the
    * incidental one-off matches (the chains q145's lcc flags) peeled away.
    * Fixed-round by design — the declared contract is "the R-round peel",
    * deterministic and oracle-checkable; full convergence is the R → ∞
    * limit and each extra round is the same plan shape (at the gate graph
    * 4 rounds is already stationary, which the oracle would catch drifting).
    *
    * Scale shape: each round is one map-side-combined degree count + two
    * node-keyed semi-join prunes over the current edge list — work is
    * Σ_r |e_r|, monotonically shrinking, never corpus-sized (edges are
    * the similarity gate's output, the q121/q127/q145 contract). Each
    * round's survivors are `localCheckpoint`ed — the canonical lineage cut
    * for derive-from-previous-round iteration (each round references its
    * predecessor THREE times, so an uncut logical plan grows 3^R-fold; the
    * checkpoint keeps both the optimizer input and the replay cost
    * constant per round). On a multi-executor cluster swap in
    * `checkpoint()` against a reliable dir if executor loss matters —
    * same shape, durability trade only. */
  def q156KCore(spark: SparkSession, sfDir: String): DataFrame =
    kCoreOn(q68Containment(spark, sfDir).select(col("id1"), col("id2")))

  /** The peeling core over ANY oriented (id1, id2) edge frame —
    * fixture-testable. */
  private[graft] def kCoreOn(pairs: DataFrame): DataFrame = {
    var edges = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .localCheckpoint()
    // size the peeling rounds to the GRAPH, not the session default (the
    // connectedComponents precedent): the edge list is far smaller than
    // the corpus that produced it, and per-round scheduling of
    // default-parallelism tasks dominates once partitions are tiny.
    // count() is a cheap scan of the just-checkpointed frame; the peel is
    // partitioning-invariant, so rows are identical.
    val parallelism = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (edges.count() / 500000L).toInt + 1))
    edges = edges.repartition(parallelism, col("src")).localCheckpoint()
    for (_ <- 1 to KCoreRounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= KCoreK)
      edges = edges
        .join(keep.select(col("src")), Seq("src"), "leftsemi")
        .join(keep.select(col("src").as("dst")), Seq("dst"), "leftsemi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
    }
    edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("doc_id"), col("deg"))
  }

  /** The q156 oracle unrolls the identical peeling rounds. */
  val q156KCoreSql: String = {
    val rounds = (1 to KCoreRounds).map { r =>
      s"""k$r AS (
         |  SELECT src FROM e${r - 1} GROUP BY 1 HAVING count(*) >= $KCoreK),
         |e$r AS (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r a ON e.src = a.src
         |  JOIN k$r b ON e.dst = b.src)""".stripMargin
    }.mkString(",\n")
    s"""
    WITH pairs AS (SELECT id1, id2 FROM ($q68ContainmentSql)),
    e0 AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL
      SELECT id2 AS src, id1 AS dst FROM pairs),
    $rounds
    SELECT src AS doc_id, count(*) AS deg
    FROM e$KCoreRounds GROUP BY 1
    """
  }

  /** q163 tuning: draws in the table / weight fixed-point scale. */
  private[ops] val NegTableK = 64L

  /** q163's smoothed weight ⌊1000·√√(c³)⌋ over a BIGINT count column.
    * The cube runs in DECIMAL(19,0)² products (Spark caps the widened
    * result at DECIMAL(38,0), scale 0 — still exact for c³ < 10³⁸, i.e.
    * c < 4.6e12) so it never wraps like BIGINT c·c·c does past c = 2²¹−1;
    * the exact decimal is then correctly-rounded to DOUBLE and passed
    * through two IEEE sqrts, matching the DuckDB HUGEINT oracle bitwise.
    * private[graft]: TextOpsSpec pins it against a plain-Scala BigInt
    * oracle on a c > 2²¹ fixture. */
  private[graft] def smoothedWeight(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val cube = c.cast("decimal(19,0)") * c.cast("decimal(19,0)") *
      c.cast("decimal(19,0)")
    floor(lit(1000.0d) * sqrt(sqrt(cube.cast("double")))).cast("bigint")
  }

  /** q163: word2vec NEGATIVE-SAMPLING table — unigram counts smoothed by
    * Mikolov's c^(3/4) and drawn with q150's deterministic systematic rule
    * (K equally-spaced boundaries over the smoothed-weight layout, token
    * multiplicity = boundaries crossed). The 3/4 power is THE published
    * constant that keeps stopwords from swamping the negatives without
    * flattening to uniform; the systematic draw replaces the RNG table so
    * re-runs and both engines produce the identical table. Smoothed
    * weight = ⌊1000·√√(c³)⌋: c³ is EXACT in DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB) — the q142 ladder, because BIGINT c·c·c WRAPS
    * silently past c = 2,097,151 and every common token in a large corpus
    * exceeds that — then exact-cast (correctly rounded) to DOUBLE, and √√
    * is two IEEE-correctly-rounded sqrts (the documented float contract —
    * no pow/ln), so the weight is bitwise identical cross-engine up to the
    * DECIMAL(38,0) ceiling c < 4.6e12 (beyond any single token's count in
    * a 100 TB corpus). TextOpsSpec pins a c > 2²¹ fixture against a
    * plain-Scala BigInt oracle — the old BIGINT cube wraps on exactly
    * that fixture.
    *
    * Scale shape: one map-side unigram count; the layout order
    * (c ASC, token ASC) is [[DistRank.withBucketedRank]] ungrouped (B-way
    * parallel), the prefix sum is [[distributedRunningSum]] over the rank
    * (its monotone numeric order column), and the crossing test is a pure
    * projection — the q150 engine, vocabulary-sized throughout, nothing
    * broadcast but bounds and the 1-row step. */
  def q163NegativeTable(spark: SparkSession, sfDir: String): DataFrame =
    negativeTableOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  private[graft] def negativeTableOn(docs: DataFrame): DataFrame =
    negativeTableOfCounts(unigramCounts(docs))

  /** q163's count stage: one map-side unigram rollup. Split out as the
    * REFRESH seam — a streaming corpus invalidates the table, and the
    * cheap rebuild is merging per-wave counts (sum per token, the q101
    * diff shape) and re-running [[negativeTableOfCounts]]; the refresh law
    * (counts(base) ⊕ counts(delta) → same table as a full rebuild over
    * base ∪ delta) is pinned in TextOpsSpec. */
  private[graft] def unigramCounts(docs: DataFrame): DataFrame = docs
    .select(explode(expr("""split(trim(text), '\\s+')""")).as("w"))
    .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** The table from ANY (w, c) unigram-counts frame — deterministic (no
    * RNG), so incremental refresh is exact, not approximate. */
  private[graft] def negativeTableOfCounts(counts: DataFrame): DataFrame = {
    // cached: the rank engine's bounds/rank/offsets branches all re-derive
    // their input — one vocabulary-sized materialization serves them all
    val uni = graft.CachedFrames.track(
      counts.withColumn("wgt", smoothedWeight(col("c"))))
    // cached: the ranked layout feeds the prefix sum's bounds + both phases
    val ranked = graft.CachedFrames.track(
      DistRank.withBucketedRank(uni, Seq(), "c", Seq("w"), "_pos")
        .select(expr("substring(w, 1, 0)").as("source"),
          col("_pos").as("doc_id"), col("w"), col("c"), col("wgt")))
    val run = distributedRunningSum(ranked, "wgt", Seq("doc_id"), ranked)
    val tot = ranked.agg(greatest(
      expr(s"sum(wgt) DIV $NegTableK"), lit(1L)).as("step"))
    run.crossJoin(broadcast(tot))
      .withColumn("multiplicity",
        expr("running DIV step - (running - wgt) DIV step"))
      .filter(col("multiplicity") > 0)
      .select(col("w").as("token"), col("c"), col("wgt"), col("running"),
        col("multiplicity"))
  }

  val q163NegativeTableSql: String = s"""
    WITH st AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents),
    u AS (SELECT w, count(*) AS c FROM st GROUP BY 1),
    g AS (
      SELECT w, c,
        CAST(floor(1000.0 * sqrt(sqrt(CAST(CAST(
          CAST(c AS HUGEINT) * c * c AS VARCHAR) AS DOUBLE)))) AS BIGINT) AS wgt
      FROM u),
    r AS (
      SELECT w, c, wgt,
        CAST(sum(wgt) OVER (ORDER BY c ASC, w ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS running
      FROM g),
    tot AS (
      SELECT greatest(CAST(sum(wgt) AS BIGINT) // $NegTableK, 1) AS step
      FROM g)
    SELECT w AS token, c, wgt, running,
      running // step - (running - wgt) // step AS multiplicity
    FROM r, tot
    WHERE running // step - (running - wgt) // step > 0
  """

  /** q167: ROC-AUC of the quality score as a DUPLICATE detector — the
    * Mann-Whitney U statistic of `quality_score` (q22's deterministic
    * formula) ranking documents for the binary label "text is exactly
    * duplicated" (md5-digest group size ≥ 2, every member labelled). The
    * ML stage's first VALUE-LEVEL gate: AUC is a pure rank statistic, so
    * unlike the GBT's dup_score (q33, band-checked only) it is exactly
    * reproducible in both engines. Reading: AUC far from 0.5 means the
    * quality filter is CORRELATED with duplication — q51's threshold cut
    * then shifts the dedup workload (q25/q26) in a way a curation run
    * must budget for; AUC ≈ 0.5 means the two gates are independent.
    *
    * Exactness: exact duplicates share identical text, hence identical
    * score — so the corpus collapses per DIGEST, then per SCORE, and AUC
    * comes from the tie-aware pair count U = Σ_s pos_s·(cumneg_<s) +
    * pos_s·neg_s/2. Everything accumulates at 2× scale in DECIMAL(38,0)/
    * HUGEINT (np·nn at corpus scale overflows BIGINT — the q142 ladder),
    * and the single final division of two exact-cast doubles is bitwise
    * in both engines. np = 0 or nn = 0 reports NULL, never NaN.
    *
    * Scale shape: one map-side md5 rollup (q25's shape), one map-side
    * per-score rollup (|digests| → |distinct scores| rows), then the
    * ungrouped [[DistRank]] layout + the q59 two-phase prefix sum over
    * score positions — NO single-partition window anywhere (PlanSpec
    * pins it); the payload (pos counts) re-attaches by a position-keyed
    * equi-join, keeping the prefix-sum input slim (the ReusedExchange
    * contract). Final AUC is a 1-row aggregate. */
  def q167ScoreAuc(spark: SparkSession, sfDir: String): DataFrame =
    aucOfDigestCounts(qualityDigestCounts(spark, sfDir))

  /** q167's count stage — the REFRESH seam (the q163 pattern): per-wave
    * digest counts merge by summing `cnt` per digest (min of q — identical
    * texts share the score), and the table stage reruns on the merged
    * frame. The boundary is the DIGEST level on purpose: a delta adding a
    * copy of a base doc FLIPS that digest's whole group to positive, so
    * per-score class counts do NOT merge — TextOpsSpec pins the law. */
  private[graft] def digestCounts(docs: DataFrame): DataFrame =
    withQualityStats(docs)
      .select(md5(col("text")).as("dg"), col("quality_score").as("q"))
      .groupBy(col("dg"))
      .agg(count(lit(1)).as("cnt"), min(col("q")).as("q"))

  /** AUC from ANY (dg, cnt, q) digest-counts frame. */
  private[graft] def aucOfDigestCounts(byDigest: DataFrame): DataFrame = {
    val perScore = byDigest.groupBy(col("q")).agg(
      sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("pos"),
      sum(when(col("cnt") === 1, col("cnt")).otherwise(0L)).as("neg"))
    aucOfCounts(perScore)
  }

  /** The tie-aware Mann-Whitney engine over ANY (q, pos, neg) per-score
    * counts frame — fixture-testable against a plain-Scala pair count.
    * perScore stays UNCACHED on purpose: its upstream is a pair of
    * map-side rollups whose exchanges AQE already reuses across the rank
    * engine's branches — measured, adding a cache here was a net loss
    * (3.6 → 4.4 s), unlike q173's window-heavy first pass. */
  private[graft] def aucOfCounts(perScore: DataFrame): DataFrame = {
    val ranked = graft.CachedFrames.track(
      DistRank.withBucketedRank(perScore, Seq(), "q", Seq(), "_pos"))
    // slim prefix-sum input: (source, order, value) ONLY — the pos payload
    // would make the offsets branch's pruned subtree canonically different
    // and forfeit the ReusedExchange (the q150 lesson); it joins back below
    val slim = ranked.select(
      expr("substring(CAST(q AS STRING), 1, 0)").as("source"),
      col("_pos").as("doc_id"), col("neg"))
    val run = distributedRunningSum(slim, "neg", Seq("doc_id"), slim)
      .select(col("doc_id").as("_rpos"),
        (col("running") - col("neg")).as("cumneg"))
    val tot = ranked.join(run, col("_pos") === col("_rpos"))
      .agg(sum(col("pos")).as("np"), sum(col("neg")).as("nn"),
        sum(col("pos").cast("decimal(19,0)")
          * (col("cumneg") * 2 + col("neg")).cast("decimal(19,0)")).as("u2"))
    tot.select(col("np").as("n_pos"), col("nn").as("n_neg"),
      when(col("np") > 0 && col("nn") > 0,
        col("u2").cast("double")
          / (col("np").cast("decimal(19,0)")
            * col("nn").cast("decimal(19,0)") * lit(2)).cast("double"))
        .as("auc"))
  }

  val q167ScoreAucSql: String = s"""
    WITH x AS (
      SELECT md5(text) AS dg, $qualityFromStatsSql AS q
      FROM (SELECT doc_id, text,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    g AS (SELECT dg, count(*) AS cnt, min(q) AS q FROM x GROUP BY 1),
    s AS (
      SELECT q,
        sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS pos, -- guard:ok internal; final outputs are CAST
        sum(CASE WHEN cnt = 1 THEN cnt ELSE 0 END) AS neg -- guard:ok internal; final outputs are CAST
      FROM g GROUP BY 1),
    c AS (
      SELECT q, pos, neg,
        coalesce(CAST(sum(neg) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
          AS cumneg
      FROM s),
    t AS (
      SELECT CAST(sum(pos) AS BIGINT) AS np, CAST(sum(neg) AS BIGINT) AS nn,
        sum(CAST(pos AS HUGEINT) * (cumneg * 2 + neg)) AS u2 -- guard:ok internal HUGEINT; output below is exact-cast DOUBLE
      FROM c)
    SELECT np AS n_pos, nn AS n_neg,
      CASE WHEN np > 0 AND nn > 0 THEN
        CAST(CAST(u2 AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(np AS HUGEINT) * nn * 2 AS VARCHAR) AS DOUBLE)
      END AS auc
    FROM t
  """

  /** q185 fixed-point scale: AP accumulates per-block terms as exact
    * integers ⌊Δtp·cumtp·10¹²/k⌋, so the only float op is the final
    * division — the q168/q175 idiom. Truncation error is < B·10⁻¹²/np
    * (B = distinct score blocks). The Spark `div` result is a BIGINT, so
    * a single block's positives must stay ≤ 9.2e6 at this scale; a corpus
    * with heavier score ties drops a precision decade per 10× (the
    * documented ladder — DuckDB's HUGEINT side has no such bound). */
  private[ops] val ApFixedPoint = 1000000000000L

  /** q185: AVERAGE PRECISION (area under the precision-recall curve) of
    * the quality score as a duplicate detector — the companion q167's
    * ROC-AUC needs at high class imbalance: duplicates are the RARE class,
    * ROC-AUC is inflated by the abundant true negatives, and AP (baseline
    * = prevalence, not 0.5) is what a curation gate actually budgets on.
    * Ranking is LOW-QUALITY-FIRST (ascending q — the direction a bottom-up
    * quality cut flags documents), threshold-block (tie-aware) AP:
    * AP = Σ_b (Δtp_b/np) · cumtp_b/k_b over distinct-score blocks b in
    * rank order, cumtp/k the precision after admitting block b whole —
    * sklearn's average_precision_score convention. Same positive/negative
    * definition as q167 (md5-digest groups: cnt ≥ 2 → all copies positive)
    * — and the q167 digest-seam REFRESH LAW carries verbatim, since the
    * metric consumes the same [[digestCounts]] frame.
    *
    * Exactness: per-block terms are exact integers
    * ⌊Δtp·cumtp·[[ApFixedPoint]]/k⌋ (positive operands — Spark's
    * truncating `div` and DuckDB's flooring `//` agree), summed exactly in
    * DECIMAL(38,0)/HUGEINT; ONE final division by np·10¹². Bitwise across
    * engines, pinned against a plain-Scala BigInt oracle on a tie-heavy
    * fixture.
    *
    * Scale shape: q167's — one scored+digested map-side rollup to
    * per-score counts, the ungrouped [[DistRank]] layout, then ONE
    * bucketed q59 prefix sum carrying BOTH class counters packed into a
    * single BIGINT ([[ClassPairPack]] — cumulative positives unpack by
    * DIV, negatives by mod; halved the measured cost vs two engines),
    * one rank-keyed join back, 1-row rollup. No SinglePartition window
    * (PlanSpec pin). */
  def q185ScoreAp(spark: SparkSession, sfDir: String): DataFrame =
    apOfDigestCounts(qualityDigestCounts(spark, sfDir))

  /** AP from ANY (dg, cnt, q) digest-counts frame (the refresh seam). */
  private[graft] def apOfDigestCounts(byDigest: DataFrame): DataFrame =
    apOfCounts(byDigest.groupBy(col("q")).agg(
      sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("pos"),
      sum(when(col("cnt") === 1, col("cnt")).otherwise(0L)).as("neg")))

  /** Packing base for running BOTH class counters through ONE prefix-sum
    * engine (q185/q188): the combined value pos·2³¹ + neg prefix-sums to
    * cumpos·2³¹ + cumneg because the low half never carries (cumneg is
    * monotone and < 2³¹). Exact while each class total stays < 2³¹ AND
    * total·2³¹ < 2⁶³ (≈ 2.1e9 docs per class) — the [[SubstrPosPack]]
    * ladder: a bigger corpus swaps the pack to DECIMAL(38,0) or back to
    * two passes. Halved q185 from 6.9 s to one engine's cost. */
  private[ops] val ClassPairPack = 2147483648L // 2^31

  /** The tie-aware AP engine over ANY (q, pos, neg) per-score counts
    * frame — fixture-testable against a plain-Scala BigInt fold. */
  private[graft] def apOfCounts(perScore: DataFrame): DataFrame = {
    val ranked = graft.CachedFrames.track(
      DistRank.withBucketedRank(perScore, Seq(), "q", Seq(), "_pos"))
    // ONE slim prefix-sum input — (source, order, value) ONLY (the q150
    // ReusedExchange contract) — carrying BOTH class counters packed into
    // one BIGINT ([[ClassPairPack]]); the cumulative unpacks by DIV/mod
    val slim = ranked.select(
      expr("substring(CAST(q AS STRING), 1, 0)").as("source"),
      col("_pos").as("doc_id"),
      (col("pos") * lit(ClassPairPack) + col("neg")).as("pn"))
    val run = distributedRunningSum(slim, "pn", Seq("doc_id"), slim)
      .select(col("doc_id").as("_p1"),
        expr(s"running DIV $ClassPairPack").as("cumtp"),
        expr(s"running % $ClassPairPack").as("cumneg"))
    val terms = ranked
      .join(run, col("_pos") === col("_p1"))
      .select(col("pos"), col("neg"), expr(
        // ⌊Δtp·cumtp·FP / (cumtp+cumneg)⌋ — exact integer, 0 when Δtp = 0
        // (k = cumtp+cumneg ≥ 1 on every block: a block exists only if
        // pos+neg ≥ 1 and the sums are inclusive)
        s"""CAST(pos AS DECIMAL(38,0)) * CAST(cumtp AS DECIMAL(38,0))
            * $ApFixedPoint div (CAST(cumtp AS DECIMAL(38,0)) + cumneg)
         """.stripMargin).as("term_fp"))
    val tot = terms.agg(sum(col("pos")).as("np"), sum(col("neg")).as("nn"),
      sum(col("term_fp").cast("decimal(38,0)")).as("ap_fp"))
    tot.select(col("np").as("n_pos"), col("nn").as("n_neg"),
      (col("np").cast("double") / (col("np") + col("nn")).cast("double"))
        .as("prevalence"),
      when(col("np") > 0,
        col("ap_fp").cast("double")
          / (col("np").cast("decimal(38,0)") * lit(ApFixedPoint))
            .cast("double")).as("ap"))
  }

  val q185ScoreApSql: String = s"""
    WITH x AS (
      SELECT md5(text) AS dg, $qualityFromStatsSql AS q
      FROM (SELECT doc_id, text,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    g AS (SELECT dg, count(*) AS cnt, min(q) AS q FROM x GROUP BY 1),
    s AS (
      SELECT q,
        sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS pos, -- guard:ok internal; final outputs are CAST
        sum(CASE WHEN cnt = 1 THEN cnt ELSE 0 END) AS neg -- guard:ok internal; final outputs are CAST
      FROM g GROUP BY 1),
    c AS (
      SELECT q, pos, neg,
        CAST(sum(pos) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
          AS cumtp,
        CAST(sum(neg) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
          AS cumneg
      FROM s),
    t AS (
      SELECT CAST(sum(pos) AS BIGINT) AS np, CAST(sum(neg) AS BIGINT) AS nn,
        sum(CAST(pos AS HUGEINT) * cumtp * $ApFixedPoint -- guard:ok internal HUGEINT; output below is exact-cast DOUBLE
          // (cumtp + cumneg)) AS ap_fp
      FROM c)
    SELECT np AS n_pos, nn AS n_neg,
      CAST(np AS DOUBLE) / CAST(np + nn AS DOUBLE) AS prevalence,
      CASE WHEN np > 0 THEN
        CAST(ap_fp AS DOUBLE)
          / CAST(CAST(CAST(np AS HUGEINT) * $ApFixedPoint AS VARCHAR) AS DOUBLE)
      END AS ap
    FROM t
  """

  /** q170 tuning: minimum shared neighbours for a predicted link. */
  private[ops] val LinkPredMinCn = 2

  /** q170: COMMON-NEIGHBOUR LINK PREDICTION over the winnowing-containment
    * near-dup graph — for every NON-adjacent document pair sharing at
    * least [[LinkPredMinCn]] neighbours: the common-neighbour count and
    * neighbourhood Jaccard cn/(deg1+deg2−cn) (Liben-Nowell & Kleinberg's
    * strongest simple predictors). THE dedup-recall auditor: the
    * similarity gate (q68's threshold) inevitably misses edges, and a
    * non-edge whose endpoints share most of their neighbourhoods is
    * almost certainly a missed near-duplicate — these pairs are exactly
    * what a human review queue or a second, tighter comparator pass
    * (q131's consolidation) should re-examine first. Counts are exact
    * integers; Jaccard is one fixed-order division — bitwise both engines.
    *
    * Scale shape: the wedge join on the shared middle node is the q145
    * bound (Σ deg(v)² over the DF-capped similarity graph — never
    * corpus-sized); candidate pairs collapse map-side per (a, b); the
    * existing-edge anti-join and both degree joins are key-equi on the
    * edge/node tables. Shares the cached containment edge list with the
    * rest of the graph family (one materialization per Bench group rep /
    * GraphReport run). */
  def q170LinkPredict(spark: SparkSession, sfDir: String): DataFrame =
    linkPredictOn(q68Containment(spark, sfDir).select(col("id1"), col("id2")))

  /** The prediction core over ANY oriented (id1 < id2) edge frame. */
  private[graft] def linkPredictOn(pairs: DataFrame): DataFrame = {
    // cached: the symmetrized adjacency feeds the wedge self-join (twice)
    // and the degree rollup
    val sym = graft.CachedFrames.track(
      pairs.select(col("id1").as("v"), col("id2").as("u"))
        .unionByName(pairs.select(col("id2").as("v"), col("id1").as("u"))))
    val deg = sym.groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val cand = sym.select(col("v"), col("u").as("a"))
      .join(sym.select(col("v"), col("u").as("b")), "v")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= LinkPredMinCn)
      .join(pairs.select(col("id1").as("a"), col("id2").as("b")),
        Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("v").as("a"), col("deg").as("deg1")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("deg2")), "b")
      .select(col("a").as("id1"), col("b").as("id2"), col("cn"),
        col("deg1"), col("deg2"),
        (col("cn").cast("double")
          / (col("deg1") + col("deg2") - col("cn")).cast("double"))
          .as("jaccard"))
  }

  val q170LinkPredictSql: String = s"""
    WITH pairs AS (SELECT id1, id2 FROM ($q68ContainmentSql)),
    sym AS (
      SELECT id1 AS v, id2 AS u FROM pairs
      UNION ALL
      SELECT id2 AS v, id1 AS u FROM pairs),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
    w AS (
      SELECT s1.u AS a, s2.u AS b, CAST(count(*) AS BIGINT) AS cn
      FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
      GROUP BY 1, 2 HAVING count(*) >= $LinkPredMinCn),
    ne AS (
      SELECT w.a, w.b, w.cn FROM w
      LEFT JOIN pairs p ON w.a = p.id1 AND w.b = p.id2
      WHERE p.id1 IS NULL)
    SELECT ne.a AS id1, ne.b AS id2, ne.cn,
      da.deg AS deg1, db.deg AS deg2,
      CAST(ne.cn AS DOUBLE) / CAST(da.deg + db.deg - ne.cn AS DOUBLE)
        AS jaccard
    FROM ne
    JOIN deg da ON ne.a = da.v
    JOIN deg db ON ne.b = db.v
  """

  /** q172 tuning: gate B's quality threshold — q51's curation cut, so the
    * agreement measured is between the TWO admission rules the pipeline
    * actually runs. */
  private[ops] val KappaQualityTau = 1.0

  /** q172: COHEN'S KAPPA between the corpus's two admission gates — the
    * Gopher rule bundle (q112's `admit`) and the quality-score cut
    * (q51's `quality_score ≥ 1.0`). Raw agreement flatters any pair of
    * gates that both admit (or both reject) almost everything; kappa
    * subtracts the agreement expected from the marginals alone, which is
    * the honest answer to "do these two filters measure the same thing?"
    * — κ near 1 means one gate is redundant (drop the expensive one);
    * κ near 0 means they prune DIFFERENT documents and the curation DAG
    * needs both (q104's joint-admission accounting).
    *
    * Exactness: the 2×2 confusion matrix is exact integers from one
    * rollup; po and pe cross-products run in DECIMAL(38,0)/HUGEINT (n²
    * overflows BIGINT past ~3e9 docs — the q142 ladder); κ =
    * (n·(n11+n00) − pe_num)/(n² − pe_num) is ONE division of exact-cast
    * doubles. A degenerate pe = 1 (both gates constant) reports NULL.
    *
    * Scale shape: both gate columns are per-row codegen projections of
    * the same documents scan (single-sourced via [[gopherRulesOn]] /
    * [[scoredDocs]] so neither formula can drift from its own gate
    * query); the doc-keyed equi-join of the two projections collapses
    * immediately into a 1-row conditional rollup — nothing after the
    * join scales with the corpus, and the join itself is the price of
    * formula single-sourcing (adjudicated in SCALE.md). */
  def q172GateKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val a = gopherRulesOn(docs).select(col("doc_id"), col("admit").as("ga"))
    val b = scoredDocs(docs).select(col("doc_id"),
      (col("quality_score") >= KappaQualityTau).as("gb"))
    val m = a.join(b, "doc_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("ga") && col("gb"), 1L).otherwise(0L)).as("n11"),
      sum(when(col("ga") && !col("gb"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("ga") && col("gb"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("ga") && !col("gb"), 1L).otherwise(0L)).as("n00"))
    val d = (c: String) => col(c).cast("decimal(19,0)")
    val peNum = (d("n11") + d("n10")) * (d("n11") + d("n01")) +
      (d("n01") + d("n00")) * (d("n10") + d("n00"))
    val kNum = d("n") * (d("n11") + d("n00")) - peNum
    val kDen = d("n") * d("n") - peNum
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      ((col("n11") + col("n00")).cast("double") / col("n").cast("double"))
        .as("agree"),
      when(kDen =!= 0,
        kNum.cast("double") / kDen.cast("double")).as("kappa"))
  }

  val q172GateKappaSql: String = s"""
    WITH a AS (
      SELECT doc_id, admit AS ga FROM ($q112GopherRulesSql)),
    b AS (
      SELECT doc_id, quality_score >= $KappaQualityTau AS gb
      FROM ($q22QualityScoreSql)),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(sum(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(sum(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(sum(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT)
          AS n00
      FROM a JOIN b USING (doc_id)),
    k AS (
      SELECT n, n11, n10, n01, n00,
        (CAST(n11 AS HUGEINT) + n10) * (CAST(n11 AS HUGEINT) + n01)
          + (CAST(n01 AS HUGEINT) + n00) * (CAST(n10 AS HUGEINT) + n00)
          AS pe_num
      FROM m)
    SELECT n, n11, n10, n01, n00,
      CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS agree,
      CASE WHEN CAST(n AS HUGEINT) * n - pe_num <> 0 THEN
        CAST(CAST(CAST(n AS HUGEINT) * (n11 + n00) - pe_num AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(n AS HUGEINT) * n - pe_num AS VARCHAR) AS DOUBLE)
      END AS kappa
    FROM k
  """

  /** q173: SPEARMAN RANK CORRELATION between quality score and document
    * length — "is the quality gate secretly a length gate?" The question
    * every heuristic-filter pipeline must answer before trusting q51's
    * cut (Gopher's own ablations found several quality rules reduce to
    * length proxies). Pearson on the raw values is hostage to the score's
    * scale and outliers; Spearman on RANKS is the standard robust answer:
    * ρ = 1 − 6·Σd²/(n·(n²−1)) over per-document rank differences.
    *
    * Convention: ranks are over the TOTAL orders (value ASC, doc_id ASC)
    * — the deterministic tie-break both engines share, pinned instead of
    * midrank averaging (identical texts DO tie; the doc_id tie-break
    * makes the statistic exactly reproducible, and the midrank variant
    * differs only by the tie correction, which the scaladoc'd formula
    * makes explicit rather than hiding in float noise).
    *
    * Exactness: both rank layouts are the ungrouped [[DistRank]] (B-way
    * parallel, no one-task sort); Σd² and n·(n²−1) accumulate in
    * DECIMAL(38,0)/HUGEINT (Σd² ~ n³/3 overflows BIGINT past n ≈ 3e6 —
    * the q142 ladder); ρ is 1.0 minus ONE division of exact-cast
    * doubles, the identical chain in both engines.
    *
    * Scale shape: one scored corpus projection (cached — both rank
    * passes and the rollup consume it), two bucketed rank passes, one
    * 1-row rollup. Nothing is ever single-partition (PlanSpec pins the
    * q167 contract). */
  def q173SpearmanQualityLength(spark: SparkSession, sfDir: String)
      : DataFrame =
    spearmanOfPairs(graft.CachedFrames.track(qualityScored(spark, sfDir)
      .select(col("doc_id").as("pid"), col("quality_score").as("q"),
        col("n_tokens").cast("long").as("nt"))))

  /** Spearman ρ over ANY (pid, q, nt) pairs frame — q173's engine
    * factored series-generic (q217 reuses it on acctbal-vs-spend). The
    * input should arrive CACHED: the rank engine's bounds/rank/counts
    * branches each re-derive their input — uncached, the upstream plan
    * re-ran ~3× inside the layout (bench: 9.3 s → 3.0 s before the r17
    * single-layout merge; the caching argument is unchanged). */
  private[graft] def spearmanOfPairs(pairs: DataFrame): DataFrame = {
    // r17: ONE grouped layout over the 2-axis unpivot replaces the two
    // sequential ungrouped layouts (each paid its own bounds/offsets
    // barriers and rank exchange). Per-axis ranks are unchanged: the
    // group key IS the axis, and within an axis the order key is the
    // axis's own value. When both axes are exact BIGINTs (q217's
    // cents-vs-cents) the stacked column stays BIGINT — the integral
    // bucket path; otherwise both cast to DOUBLE, exact while the long
    // axis stays under 2⁵³ (q173's nt is an INT-ranged token count).
    val bothLong = Seq("q", "nt").forall(c =>
      pairs.schema(c).dataType == org.apache.spark.sql.types.LongType)
    val axes =
      if (bothLong)
        pairs.select(col("pid"), expr("stack(2, 0, q, 1, nt) AS (_axis, _v)"))
      else pairs.select(col("pid"), expr(
        "stack(2, 0, CAST(q AS DOUBLE), 1, CAST(nt AS DOUBLE)) AS (_axis, _v)"))
    val r2 = DistRank.withBucketedRank(axes, Seq("_axis"), "_v",
        Seq("pid"), "_r")
      .groupBy(col("pid"))
      .agg(max(when(col("_axis") === 0, col("_r"))).as("rq"),
        max(when(col("_axis") === 1, col("_r"))).as("rl"))
    val d = col("rq") - col("rl")
    val m = r2.agg(count(lit(1)).as("n"),
      sum(d.cast("decimal(19,0)") * d.cast("decimal(19,0)")).as("sd2"))
    m.select(col("n"), col("sd2").cast("double").as("sum_d2"),
      when(col("n") >= 2,
        lit(1.0) - (lit(6).cast("decimal(19,0)") * col("sd2")).cast("double")
          / (col("n").cast("decimal(38,0)")
            * (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)")
              - 1)).cast("double")).as("rho"))
  }

  val q173SpearmanQualityLengthSql: String = s"""
    WITH x AS (
      SELECT doc_id, $qualityFromStatsSql AS q, CAST(n_tokens AS BIGINT) AS nt
      FROM (SELECT doc_id,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    r AS (
      SELECT doc_id,
        row_number() OVER (ORDER BY q ASC, doc_id ASC) AS rq,
        row_number() OVER (ORDER BY nt ASC, doc_id ASC) AS rl
      FROM x),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        sum(CAST(rq - rl AS HUGEINT) * CAST(rq - rl AS HUGEINT)) AS sd2 -- guard:ok internal HUGEINT; outputs below are exact-cast
      FROM r)
    SELECT n, CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) AS sum_d2,
      CASE WHEN n >= 2 THEN
        1.0 - CAST(CAST(6 * sd2 AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1) AS VARCHAR) AS DOUBLE)
      END AS rho
    FROM s
  """

  /** q176 tuning: calibration buckets (score deciles). */
  private[ops] val CalibrationBuckets = 10

  /** q176: SCORE-DECILE CALIBRATION of the duplicate rate — q167's AUC in
    * curve form: bucket documents into quality-score deciles (rank-exact
    * ntile over the (score, doc_id) total order) and report each decile's
    * exact-duplicate rate with its score range. The AUC says the gates
    * correlate; THIS says where — a dup rate concentrated in the bottom
    * two deciles means the quality cut already removes most duplicates
    * (cheap dedup budget), a flat curve means dedup work is independent
    * of the cut. Counts are exact; rates are single divisions.
    *
    * Scale shape: one scored+digested corpus projection (cached), one
    * map-side digest rollup, one digest-keyed join back, then the
    * ungrouped [[DistRank]] layout with the decile cut as integer rank
    * arithmetic ([[DistRank.ntileOfRank]], byte-identical to the window
    * ntile) — no single-partition sort; the rollup is 10 rows. */
  def q176ScoreCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    // r17: rides the canonical [[dupLabeledRanked]] layout (o is the 0/1
    // dup label, so sum(o) IS the old sum(when(is_dup, 1L)))
    val ranked = dupLabeledRanked(spark, sfDir)
    val n = ranked.agg(count(lit(1)).as("_n"))
    ranked
      .crossJoin(broadcast(n))
      .withColumn("decile",
        DistRank.ntileOfRank("_rank", "_n", CalibrationBuckets))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("o")).as("n_dups"),
        min(col("q")).as("q_lo"), max(col("q")).as("q_hi"))
      .withColumn("dup_rate",
        col("n_dups").cast("double") / col("n_docs").cast("double"))
  }

  val q176ScoreCalibrationSql: String = s"""
    WITH x AS (
      SELECT doc_id, md5(text) AS dg, $qualityFromStatsSql AS q
      FROM (SELECT doc_id, text,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    d AS (SELECT dg, count(*) AS cnt FROM x GROUP BY 1),
    j AS (
      SELECT x.doc_id, x.q, d.cnt >= 2 AS is_dup
      FROM x JOIN d USING (dg)),
    r AS (
      SELECT q, is_dup,
        ntile($CalibrationBuckets) OVER (ORDER BY q, doc_id) AS decile
      FROM j)
    SELECT CAST(decile AS INTEGER) AS decile,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
      min(q) AS q_lo, max(q) AS q_hi,
      CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS dup_rate
    FROM r GROUP BY 1
  """

  /** q239 tuning: the forecast lattice scale (2²⁴ — float-mantissa exact,
    * the [[Embeddings.CentroidQuantScale]] convention). */
  private[ops] val BrierScale = 16777216L

  /** q239: RELIABILITY TABLE + BRIER DECOMPOSITION — the calibration
    * companion q185/q167 lack: AP and AUC say the score RANKS duplicates
    * well; this says whether the score's probability reading is honest
    * ("is 0.8 actually 80%?"). The forecast is the quality score squashed
    * onto the open unit interval by the RATIONAL sigmoid p = 0.5 +
    * 0.5·q/(1+|q|) — pure +,|·|,/,· (exactly-rounded IEEE ops; no
    * in-engine exp, per the shared-literal discipline) — then floored to
    * the 2²⁴ lattice, WHICH IS the forecast by definition (the q192
    * quantize-then-measure contract). The outcome is the exact-duplicate
    * label (digest group ≥ 2, q167's). Per forecast-decile: size, mean
    * forecast, observed dup rate, gap; plus the corpus-constant Murphy
    * terms on every row (the q207 convention): brier = (1/N)Σ(p−o)²,
    * reliability = (1/N)Σₖnₖ(p̄ₖ−ōₖ)², resolution = (1/N)Σₖnₖ(ōₖ−ō)²,
    * uncertainty = ō(1−ō). (With non-constant forecasts inside a bin,
    * brier = rel − res + unc + within-bin forecast variance — the
    * residual is the reader's, not hidden.)
    *
    * Exactness: per-bin Σ(P−oS)², (A−DS)² and (DN−Onk)² are exact
    * DECIMAL(38,0)/HUGEINT integers (bounds: N·S² ≤ 1e38 holds past
    * 1e22 docs; the REL/RES numerators square N·S-sized terms, exact to
    * N ≈ 1e12 at this lattice — the q185 bound discipline); each bin
    * contributes ONE double division, and the ≤10-term cross-bin sums
    * fold decile-ascending in both engines (the q231 ordered-fold
    * idiom). All remaining outputs are single divisions of exact-cast
    * integers.
    *
    * Scale shape: q176's exactly — one scored+digested projection
    * (cached), one map-side digest rollup, one digest-keyed join back,
    * the ungrouped bucketed [[DistRank]] layout with
    * [[DistRank.ntileOfRank]] integer rank arithmetic (NO global-ORDER
    * window — PlanSpec pins it), a 10-row bin rollup, and two broadcast
    * 1-row summaries. */
  def q239BrierCalibration(spark: SparkSession, sfDir: String): DataFrame =
    brierCalibrationOfRanked(dupLabeledRanked(spark, sfDir))

  /** The (doc_id, quality q, exact-dup label o ∈ {0,1}) frame q239/q241
    * share — q176's scored+digested layout with the label made a column. */
  private[graft] def dupLabeled(spark: SparkSession, sfDir: String): DataFrame = {
    // r17: both sides ride the canonical digest artifacts ([[qualityDigested]]
    // joined to [[qualityDigestCounts]]'s cnt), so q167/q185's digest rollup
    // and this label's dup side are ONE exchange within a shared-group rep
    val scored = qualityDigested(spark, sfDir)
    val dups = qualityDigestCounts(spark, sfDir).select(col("dg"), col("cnt"))
    graft.CachedFrames.track(scored.join(dups, "dg")
      .select(col("doc_id"), col("q"),
        when(col("cnt") >= 2, 1L).otherwise(0L).as("o")))
  }

  /** The canonical rank layout over [[dupLabeled]] — q176/q239/q241 all
    * cut deciles of the SAME (q ASC, doc_id ASC) total order, so the one
    * bucketed window pass is tracked and shared (r17: previously each
    * query ranked its own private projection of the same rows). */
  private[graft] def dupLabeledRanked(spark: SparkSession,
      sfDir: String): DataFrame =
    graft.CachedFrames.track(DistRank.withBucketedRank(
      dupLabeled(spark, sfDir), Nil, "q", Seq("doc_id"), "_rank"))

  /** The calibration core over ANY (doc_id, q, o ∈ {0,1}) frame —
    * fixture-testable against a plain-Scala mirror. */
  private[graft] def brierCalibrationOn(labeled: DataFrame): DataFrame =
    brierCalibrationOfRanked(graft.CachedFrames.track(
      DistRank.withBucketedRank(labeled, Nil, "q", Seq("doc_id"), "_rank")))

  /** The same core over an already-RANKED (doc_id, q, o, _rank) frame —
    * the q239 entry point rides the canonical [[dupLabeledRanked]] layout
    * (r17), and the forecast lattice pf is a per-row function of q so it
    * computes AFTER the rank without changing any value. */
  private[graft] def brierCalibrationOfRanked(ranked: DataFrame): DataFrame = {
    val S = BrierScale
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val docs2 = ranked.withColumn("pf",
      expr(s"CAST(floor((0.5D + 0.5D * (q / (1.0D + abs(q)))) * $S.0D) " +
        "AS BIGINT)"))
    val n = ranked.agg(count(lit(1)).as("_n"))
    val bins = graft.CachedFrames.track(
      docs2
        .crossJoin(broadcast(n))
        .withColumn("decile",
          DistRank.ntileOfRank("_rank", "_n", CalibrationBuckets))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pf")).as("a"),
          sum(col("o")).as("dd"),
          sum(d38(col("pf") - col("o") * S)
            * d38(col("pf") - col("o") * S)).as("sq")))
    val tot = bins.agg(sum(col("n_docs")).as("nn"), sum(col("dd")).as("oo"),
      sum(col("sq")).as("sqs"))
    val terms = bins.crossJoin(broadcast(tot))
      .select(col("decile"),
        (d38(col("a") - col("dd") * S) * d38(col("a") - col("dd") * S))
          .cast("double")./(col("n_docs").cast("double")).as("relterm"),
        ((d38(col("dd")) * d38(col("nn")) - d38(col("oo")) * d38(col("n_docs")))
          * (d38(col("dd")) * d38(col("nn")) - d38(col("oo")) * d38(col("n_docs"))))
          .cast("double")./(col("n_docs").cast("double")).as("resterm"))
    val folded = terms.agg(
      expr("""aggregate(transform(sort_array(collect_list(struct(decile,
        | relterm))), x -> x.relterm), 0.0D, (acc, x) -> acc + x)"""
        .stripMargin).as("rels"),
      expr("""aggregate(transform(sort_array(collect_list(struct(decile,
        | resterm))), x -> x.resterm), 0.0D, (acc, x) -> acc + x)"""
        .stripMargin).as("ress"))
    val summary = tot.crossJoin(broadcast(folded)).select(
      (col("sqs").cast("double")
        / (d38(col("nn")) * S * S).cast("double")).as("brier"),
      (col("rels") / (d38(col("nn")) * S * S).cast("double"))
        .as("reliability"),
      (col("ress") / (d38(col("nn")) * d38(col("nn")) * d38(col("nn")))
        .cast("double")).as("resolution"),
      ((d38(col("oo")) * d38(col("nn") - col("oo"))).cast("double")
        / (d38(col("nn")) * d38(col("nn"))).cast("double"))
        .as("uncertainty"))
    bins.select(col("decile"), col("n_docs"),
        (col("a").cast("double") / (col("n_docs") * S).cast("double"))
          .as("mean_forecast"),
        (col("dd").cast("double") / col("n_docs").cast("double"))
          .as("obs_rate"),
        (col("a").cast("double") / (col("n_docs") * S).cast("double")
          - col("dd").cast("double") / col("n_docs").cast("double"))
          .as("gap"))
      .crossJoin(broadcast(summary))
  }

  val q239BrierCalibrationSql: String = {
    val S = BrierScale
    s"""
    WITH x AS (
      SELECT doc_id, md5(text) AS dg, $qualityFromStatsSql AS q
      FROM (SELECT doc_id, text,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    dct AS (SELECT dg, count(*) AS cnt FROM x GROUP BY 1),
    j AS (
      SELECT x.doc_id, x.q,
        CAST(floor((0.5 + 0.5 * (x.q / (1.0 + abs(x.q)))) * $S) AS BIGINT)
          AS pf,
        CASE WHEN dct.cnt >= 2 THEN CAST(1 AS BIGINT)
          ELSE CAST(0 AS BIGINT) END AS o
      FROM x JOIN dct USING (dg)),
    r AS (
      SELECT q, pf, o,
        ntile($CalibrationBuckets) OVER (ORDER BY q, doc_id) AS decile
      FROM j),
    b AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(pf) AS BIGINT) AS a, CAST(sum(o) AS BIGINT) AS dd,
        sum(CAST(pf - o * $S AS HUGEINT) * (pf - o * $S)) AS sq -- guard:ok internal HUGEINT; outputs below are exact-cast via VARCHAR
      FROM r GROUP BY 1),
    t AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS nn, CAST(sum(dd) AS BIGINT) AS oo,
        sum(sq) AS sqs -- guard:ok internal HUGEINT; output below is exact-cast via VARCHAR
      FROM b),
    terms AS (
      SELECT decile,
        CAST(CAST(CAST(a - dd * $S AS HUGEINT) * (a - dd * $S) AS VARCHAR)
          AS DOUBLE) / CAST(n_docs AS DOUBLE) AS relterm,
        CAST(CAST((CAST(dd AS HUGEINT) * nn - CAST(oo AS HUGEINT) * n_docs)
            * (CAST(dd AS HUGEINT) * nn - CAST(oo AS HUGEINT) * n_docs)
          AS VARCHAR) AS DOUBLE) / CAST(n_docs AS DOUBLE) AS resterm
      FROM b, t),
    f AS (
      SELECT
        list_reduce(list_prepend(0.0::DOUBLE, list(relterm ORDER BY decile)),
          (acc, x) -> acc + x) AS rels,
        list_reduce(list_prepend(0.0::DOUBLE, list(resterm ORDER BY decile)),
          (acc, x) -> acc + x) AS ress
      FROM terms),
    s AS (
      SELECT
        CAST(CAST(t.sqs AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(t.nn AS HUGEINT) * $S * $S AS VARCHAR) AS DOUBLE)
          AS brier,
        f.rels
          / CAST(CAST(CAST(t.nn AS HUGEINT) * $S * $S AS VARCHAR) AS DOUBLE)
          AS reliability,
        f.ress
          / CAST(CAST(CAST(t.nn AS HUGEINT) * t.nn * t.nn AS VARCHAR)
            AS DOUBLE) AS resolution,
        CAST(CAST(CAST(t.oo AS HUGEINT) * (t.nn - t.oo) AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(t.nn AS HUGEINT) * t.nn AS VARCHAR) AS DOUBLE)
          AS uncertainty
      FROM t, f)
    SELECT CAST(b.decile AS INTEGER) AS decile, b.n_docs,
      CAST(CAST(b.a AS VARCHAR) AS DOUBLE)
        / CAST(b.n_docs * $S AS DOUBLE) AS mean_forecast,
      CAST(b.dd AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS obs_rate,
      CAST(CAST(b.a AS VARCHAR) AS DOUBLE) / CAST(b.n_docs * $S AS DOUBLE)
        - CAST(b.dd AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS gap,
      s.brier, s.reliability, s.resolution, s.uncertainty
    FROM b, s
  """
  }

  /** q241: COCHRAN-ARMITAGE TREND TEST of the duplicate rate across
    * quality-score deciles — the significance companion to q176's curve
    * and q239's calibration: q176 SHOWS the per-decile dup rates, this
    * says whether their monotone trend is real or noise. Scores are the
    * decile indexes 1..10 (the standard equally-spaced choice); the
    * statistic is the textbook
    * Z² = N·(N·T − O·S1)² / (O·(N−O)·(N·S2 − S1²)) with T = Σ sᵢdᵢ,
    * S1 = Σ sᵢnᵢ, S2 = Σ sᵢ²nᵢ — Z² ~ χ²₁ under no-trend. trend_num
    * (= N·T − O·S1) carries the DIRECTION: positive means dup rate rises
    * with quality.
    *
    * Exactness: every sum is an exact BIGINT/DECIMAL(38,0) integer
    * (deciles from the same rank-exact [[DistRank.ntileOfRank]] layout as
    * q176/q239); numerator and denominator cross-multiply in
    * DECIMAL(38,0)/HUGEINT (exact to N ≈ 1e8 docs at 10 deciles — the
    * q185 bound discipline; past that, drop a score decade), and Z² is
    * ONE division of exact-cast doubles. Degenerate corpora (no dups,
    * all dups, zero denominator) report NULL, never NaN.
    *
    * Scale shape: q176's exactly — the bucketed rank layout, a 10-row
    * bin rollup, a 1-row rollup of the bins. */
  def q241DupTrend(spark: SparkSession, sfDir: String): DataFrame =
    caTrendOfRanked(dupLabeledRanked(spark, sfDir))

  /** The trend core over ANY (doc_id, q, o ∈ {0,1}) frame —
    * fixture-testable against a plain-Scala mirror. */
  private[graft] def caTrendOn(labeled: DataFrame): DataFrame =
    caTrendOfRanked(DistRank.withBucketedRank(labeled, Nil, "q",
      Seq("doc_id"), "_rank"))

  /** The same core over an already-RANKED (doc_id, q, o, _rank) frame —
    * the q241 entry point rides the canonical [[dupLabeledRanked]]
    * layout (r17). */
  private[graft] def caTrendOfRanked(ranked: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val n = ranked.agg(count(lit(1)).as("_n"))
    val bins = ranked
      .crossJoin(broadcast(n))
      .withColumn("decile",
        DistRank.ntileOfRank("_rank", "_n", CalibrationBuckets))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("nk"), sum(col("o")).as("dk"))
    val m = bins.agg(sum(col("nk")).as("nn"), sum(col("dk")).as("oo"),
      sum(col("decile").cast("bigint") * col("nk")).as("s1"),
      sum(col("decile").cast("bigint") * col("decile") * col("nk")).as("s2"),
      sum(col("decile").cast("bigint") * col("dk")).as("t"))
    val num = d38(col("nn")) * d38(col("t")) - d38(col("oo")) * d38(col("s1"))
    val den = d38(col("oo")) * d38(col("nn") - col("oo")) *
      (d38(col("nn")) * d38(col("s2")) - d38(col("s1")) * d38(col("s1")))
    m.select(col("nn").as("n_docs"), col("oo").as("n_dups"),
      col("s1"), col("s2"), col("t"),
      num.cast("double").as("trend_num"),
      when(den =!= 0,
        (d38(col("nn")) * num * num).cast("double") / den.cast("double"))
        .as("ca_z2"))
  }

  val q241DupTrendSql: String = s"""
    WITH x AS (
      SELECT doc_id, md5(text) AS dg, $qualityFromStatsSql AS q
      FROM (SELECT doc_id, text,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    dct AS (SELECT dg, count(*) AS cnt FROM x GROUP BY 1),
    j AS (
      SELECT x.doc_id, x.q,
        CASE WHEN dct.cnt >= 2 THEN CAST(1 AS BIGINT)
          ELSE CAST(0 AS BIGINT) END AS o
      FROM x JOIN dct USING (dg)),
    r AS (
      SELECT o,
        ntile($CalibrationBuckets) OVER (ORDER BY q, doc_id) AS decile
      FROM j),
    b AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS nk,
        CAST(sum(o) AS BIGINT) AS dk
      FROM r GROUP BY 1),
    m AS (
      SELECT CAST(sum(nk) AS BIGINT) AS nn, CAST(sum(dk) AS BIGINT) AS oo,
        CAST(sum(decile * nk) AS BIGINT) AS s1,
        CAST(sum(decile * decile * nk) AS BIGINT) AS s2,
        CAST(sum(decile * dk) AS BIGINT) AS t
      FROM b),
    k AS (
      SELECT nn, oo, s1, s2, t,
        CAST(nn AS HUGEINT) * t - CAST(oo AS HUGEINT) * s1 AS num, -- guard:ok internal HUGEINT; outputs below are exact-cast via VARCHAR
        CAST(oo AS HUGEINT) * (nn - oo)
          * (CAST(nn AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) AS den -- guard:ok internal HUGEINT; outputs below are exact-cast via VARCHAR
      FROM m)
    SELECT nn AS n_docs, oo AS n_dups, s1, s2, t,
      CAST(CAST(num AS VARCHAR) AS DOUBLE) AS trend_num,
      CASE WHEN den <> 0 THEN
        CAST(CAST(CAST(nn AS HUGEINT) * num * num AS VARCHAR) AS DOUBLE)
          / CAST(CAST(den AS VARCHAR) AS DOUBLE)
      END AS ca_z2
    FROM k
  """

  /** q242 tuning: how many top-document-frequency terms to report. */
  private[ops] val TopBurstTerms = 20

  /** q242: TERM BURSTINESS — the variance-to-mean ratio (VMR, Church &
    * Gale's burstiness) of per-document counts for the corpus's top-
    * [[TopBurstTerms]] terms by document frequency. VMR ≈ 1 means the
    * term arrives Poisson-like (function words — safe stopword
    * candidates, the q23 profile-list growth input); VMR ≫ 1 means the
    * term CLUMPS into few documents (content/topic words — the terms
    * TF-IDF (q61) and the LM gate (q92) actually discriminate on).
    * Zero-count documents are in the population: mean = n_occ/D and
    * Σc² over occurrences only is exact because zeros contribute zero.
    *
    * Exactness: df/n_occ/Σc² exact BIGINT/DECIMAL(38,0) (exact to
    * D·Σc² ≤ 1e38); VMR = (D·Σc² − n_occ²)/(D·n_occ) and the mean are
    * single divisions of exact-cast integers. Top-K selection is the
    * rank-exact bucketed [[DistRank]] under (df DESC, term ASC) — no
    * global-ORDER window.
    *
    * Scale shape: one token explode → (doc, term) rollup (map-side
    * combinable), one |vocab|-row term rollup, the ungrouped bucketed
    * rank layout, [[TopBurstTerms]] rows out. */
  def q242TermBurstiness(spark: SparkSession, sfDir: String): DataFrame =
    termBurstinessOn(Tables.parallelized(Tables(spark, sfDir, "documents"))
      .select(col("doc_id"), col("text")))

  /** The burstiness core over ANY (doc_id, text) frame —
    * fixture-testable. */
  private[graft] def termBurstinessOn(docs: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val perDocTerm = docs
      .select(col("doc_id"),
        explode(expr("""split(trim(text), '\\s+')""")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    val terms = perDocTerm.groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs"), sum(col("c")).as("n_occ"),
        sum(d38(col("c")) * d38(col("c"))).as("sq"))
      .withColumn("negdf", -col("df_docs"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    DistRank.withBucketedRank(terms, Nil, "negdf", Seq("term"), "_r")
      .filter(col("_r") <= TopBurstTerms)
      .crossJoin(broadcast(nd))
      .select(col("term"), col("df_docs"), col("n_occ"),
        (col("n_occ").cast("double") / col("nd").cast("double"))
          .as("mean_per_doc"),
        ((d38(col("nd")) * col("sq") - d38(col("n_occ")) * d38(col("n_occ")))
          .cast("double")
          / (d38(col("nd")) * d38(col("n_occ"))).cast("double")).as("vmr"))
  }

  val q242TermBurstinessSql: String = s"""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents),
    pc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
           FROM w GROUP BY 1, 2),
    t AS (SELECT term, CAST(count(*) AS BIGINT) AS df_docs,
            CAST(sum(c) AS BIGINT) AS n_occ,
            sum(CAST(c AS HUGEINT) * c) AS sq -- guard:ok internal HUGEINT; output below is exact-cast via VARCHAR
          FROM pc GROUP BY 1),
    r AS (SELECT *, row_number() OVER (ORDER BY df_docs DESC, term ASC)
            AS rk FROM t),
    d AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
    SELECT term, df_docs, n_occ,
      CAST(n_occ AS DOUBLE) / CAST(nd AS DOUBLE) AS mean_per_doc,
      CAST(CAST(CAST(nd AS HUGEINT) * sq - CAST(n_occ AS HUGEINT) * n_occ
        AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(nd AS HUGEINT) * n_occ AS VARCHAR) AS DOUBLE) AS vmr
    FROM r, d WHERE rk <= $TopBurstTerms
  """

  /** q182: FLEISS' KAPPA across the corpus's THREE admission gates —
    * Gopher rules (q112), the quality cut (q51's threshold) and the
    * language gate (pred_lang = 'en', q51's other half): q172's pairwise
    * kappa generalized to the full rater panel. Fleiss' form treats each
    * document as an item rated by 3 "annotators" voting admit/reject;
    * κ = (P̄ − P̄e)/(1 − P̄e) with P̄ the mean within-item agreement and
    * P̄e the marginal chance agreement. One number answering "does the
    * admission STACK act as one gate or three": κ → 1 means the stack is
    * redundant, κ → 0 means each gate prunes independently (the q104
    * joint-admission accounting is then mandatory reading).
    *
    * Exactness: with r = 3 raters everything reduces to two exact BIGINT
    * sums — S1 = Σ votes, S2 = Σ [n_y(n_y−1) + (r−n_y)(r−1−n_y)] — and
    * κ = (S2·(rN)² − 2rN·(S1² + (rN−S1)²))
    *     / (2rN·(rN)² − 2rN·(S1² + (rN−S1)²))
    * (the 6N = 2rN item normalizer cross-multiplied away): numerator and
    * denominator are exact DECIMAL(38,0)/HUGEINT (≈ r³N³ ≤ 1e38 holds to
    * N ≈ 1.5e12 docs), ONE double division at the end. Degenerate
    * unanimous corpora (P̄e = 1) report NULL.
    *
    * Scale shape: the q172 contract — two per-row gate projections of the
    * same scan joined doc-keyed (formula single-sourcing, adjudicated in
    * SCALE.md), collapsing immediately into a 1-row conditional rollup. */
  def q182FleissKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val a = gopherRulesOn(docs).select(col("doc_id"), col("admit").as("ga"))
    val b = scoredDocs(docs).select(col("doc_id"),
      (col("quality_score") >= KappaQualityTau).as("gb"),
      (col("pred_lang") === "en").as("gc"))
    val votes = a.join(b, "doc_id").select(
      (when(col("ga"), 1L).otherwise(0L) + when(col("gb"), 1L).otherwise(0L)
        + when(col("gc"), 1L).otherwise(0L)).as("ny"))
    val m = votes.agg(count(lit(1)).as("n"), sum(col("ny")).as("s1"),
      sum(col("ny") * (col("ny") - 1)
        + (lit(3L) - col("ny")) * (lit(2L) - col("ny"))).as("s2"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val rn = d(col("n") * 3)
    val pe2 = (d(col("s1")) * d(col("s1"))) +
      ((rn - d(col("s1"))) * (rn - d(col("s1")))) // (rN)²·P̄e
    val num = d(col("s2")) * rn * rn - lit(2) * rn * pe2
    val den = lit(2) * rn * rn * rn - lit(2) * rn * pe2
    m.select(col("n").as("n_docs"),
      (col("s1").cast("double") / (col("n") * 3).cast("double"))
        .as("p_admit"),
      when(den =!= 0, num.cast("double") / den.cast("double"))
        .as("fleiss_kappa"))
  }

  val q182FleissKappaSql: String = s"""
    WITH a AS (
      SELECT doc_id, admit AS ga FROM ($q112GopherRulesSql)),
    b AS (
      SELECT doc_id, quality_score >= $KappaQualityTau AS gb
      FROM ($q22QualityScoreSql)),
    c AS (
      SELECT doc_id, pred_lang = 'en' AS gc FROM ($q23LangIdSql)),
    v AS (
      SELECT (CASE WHEN ga THEN 1 ELSE 0 END)
        + (CASE WHEN gb THEN 1 ELSE 0 END)
        + (CASE WHEN gc THEN 1 ELSE 0 END) AS ny
      FROM a JOIN b USING (doc_id) JOIN c USING (doc_id)),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(ny) AS BIGINT) AS s1,
        CAST(sum(ny * (ny - 1) + (3 - ny) * (2 - ny)) AS BIGINT) AS s2
      FROM v),
    k AS (
      SELECT n, s1, s2, CAST(n AS HUGEINT) * 3 AS rn,
        CAST(s1 AS HUGEINT) * s1
          + (CAST(n AS HUGEINT) * 3 - s1) * (CAST(n AS HUGEINT) * 3 - s1)
          AS pe2
      FROM m)
    SELECT n AS n_docs,
      CAST(s1 AS DOUBLE) / CAST(n * 3 AS DOUBLE) AS p_admit,
      CASE WHEN 2 * rn * rn * rn - 2 * rn * pe2 <> 0 THEN
        CAST(CAST(CAST(s2 AS HUGEINT) * rn * rn - 2 * rn * pe2 AS VARCHAR) AS DOUBLE)
          / CAST(CAST(2 * rn * rn * rn - 2 * rn * pe2 AS VARCHAR) AS DOUBLE)
      END AS fleiss_kappa
    FROM k
  """

  /** q183: SUBSTRING-DEDUP SAVINGS per source — q166's accounting face
    * (what q117 is to q25): per source, total tokens, tokens removed by
    * repeated-span dedup, spans, docs touched, and the surviving-token
    * fraction. The number a curation budget actually consumes: q166 says
    * WHERE the spans are, this says WHAT substring dedup is worth per
    * corpus slice — a source whose keep_fraction is low is boilerplate-
    * heavy (licence blocks, templates) and its q69 mixture weight is
    * overstated unless this discount is applied.
    *
    * Scale shape: exactly q166's pipeline (shared core — the removal plan
    * is computed once by [[substrDedupOn]]) plus one doc-keyed join to
    * recover the source column and one map-side |sources|-row rollup. */
  def q183SubstrSavings(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    substrDedupOn(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_removed")).as("n_removed"),
        sum(col("n_spans")).as("n_spans"),
        sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("docs_touched"))
      .withColumn("keep_fraction",
        (col("n_tokens") - col("n_removed")).cast("double")
          / col("n_tokens").cast("double"))
  }

  lazy val q183SubstrSavingsSql: String = s"""
    WITH plan AS (SELECT * FROM ($q166SubstrDedupSql)),
    j AS (
      SELECT d.source, p.n_tokens, p.n_removed, p.n_spans
      FROM plan p JOIN documents d USING (doc_id))
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      CAST(sum(n_removed) AS BIGINT) AS n_removed,
      CAST(sum(n_spans) AS BIGINT) AS n_spans,
      CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS docs_touched,
      CAST(sum(n_tokens) - sum(n_removed) AS DOUBLE)
        / CAST(sum(n_tokens) AS DOUBLE) AS keep_fraction
    FROM j GROUP BY 1
  """

  /** q166 tuning: minimum repeated-span length in tokens. Lee et al. use
    * 50 on web corpora; 8 matches the gate documents' ~60-token texts the
    * same way the winnowing window does. */
  private[ops] val SubstrW = 8

  /** q166 tuning: positions-per-document bound for the packed
    * (doc_id, pos) site key — min combines map-side on ONE BIGINT.
    * doc_id·2³⁰+pos is exact while doc_id < 2³³ and docs are < 2³⁰ tokens;
    * a corpus with wider ids swaps the key to DECIMAL(38,0) (the q142
    * ladder) at the cost of the decimal min. */
  private[ops] val SubstrPosPack = 1073741824L

  /** q166: SUBSTRING-LEVEL EXACT DEDUP (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better") — any span of
    * [[SubstrW]]+ consecutive tokens that occurs at more than one
    * (document, position) site is removed from every site EXCEPT the
    * canonical first (minimum (doc_id, pos)). This is the dedup modality
    * between q53's paragraph dedup (which only catches spans aligned to
    * paragraph boundaries) and q25's whole-document dedup: boilerplate,
    * quoted excerpts and licence blocks repeat mid-document at arbitrary
    * offsets, and substring dedup is what production LLM corpora run to
    * kill them. Per document it reports the REMOVAL PLAN — tokens covered
    * by redundant spans, merged span count, and the keep ratio — the mask
    * a curation pass applies before packing (q59).
    *
    * Semantics, exactly: every W-token gram of every document is a SITE
    * (doc, pos). A site is REDUNDANT when its gram occurs elsewhere and
    * the site is not the gram's minimum (doc_id, pos). A token position is
    * removed iff some redundant site [p, p+W−1] covers it; maximal runs of
    * covered positions are the spans. (Because anchors at every offset of
    * a repeated passage are redundant, a repeated run of L ≥ W tokens is
    * covered END-TO-END — overlapping anchors chain.) Canonical-first
    * keeps one copy deterministically; unlike the paper's suffix-array
    * sweep, a passage shared by 3+ docs keeps its copy in the globally
    * first doc — a deliberate, documented tie-break, not an approximation.
    *
    * Scale shape: grams are built per-row with array HOFs (no self-join,
    * no window — one `transform` over the token array, codegen'd), so the
    * exploded sites frame is Σ tokens rows. The gram rollup is ONE
    * map-side-combinable min+count on the gram key (the min rides the
    * packed BIGINT site, [[SubstrPosPack]]); the join back is the q147
    * postings shape — gram-keyed equi-join, skew handled by AQE, never
    * doc×doc. Coverage merge is the q123 run-compression idiom: one lag
    * window PER DOCUMENT over redundant anchors only (orders of magnitude
    * smaller than the corpus), then a map-side rollup. At 100 TB the gram
    * payload in the shuffle swaps to the 16-byte md5 digest — WIRED as
    * `substrDedupOn(docs, hashedGrams = true)` (collision odds ~n²/2¹²⁹;
    * equality vs the raw plan is spec-pinned on the gate corpus) — while
    * the gate default keeps raw grams because the operator's contract is
    * EXACT. */
  def q166SubstrDedup(spark: SparkSession, sfDir: String): DataFrame =
    substrDedupOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** Shared core of the substring-dedup family (q166 plan / q183 savings /
    * q184 apply): the sized-token frame (cached — it feeds the gram explode
    * AND the per-doc roster) and the redundant-anchor frame (doc_id, pos of
    * every non-canonical site of a repeated gram). Splitting the core out
    * keeps the REMOVAL SEMANTICS single-sourced: the q184 rewrite removes
    * exactly the positions q166 counts, by construction. */
  private def substrCoreOn(docs: DataFrame, cache: Boolean,
      hashedGrams: Boolean = false): (DataFrame, DataFrame) = {
    val sized = substrSized(docs, cache)
    val sites = substrSitesOf(sized, hashedGrams)
    val firsts = sites.groupBy(col("gram"))
      .agg(min(col("site")).as("first_site"), count(lit(1)).as("n_sites"))
      .filter(col("n_sites") >= 2)
      .select(col("gram"), col("first_site"))
    val red = sites.join(firsts, "gram")
      .filter(col("site") =!= col("first_site"))
      .select(col("doc_id"), col("pos"))
    (sized, red)
  }

  /** Sized token arrays (cached — they feed the gram explode AND the
    * per-doc roster). */
  private def substrSized(docs: DataFrame, cache: Boolean): DataFrame = {
    val sizedRaw = docs.select(col("doc_id"),
      expr("""split(trim(text), '\\s+')""").as("arr"))
      .withColumn("n_tokens", size(col("arr")))
    if (cache) graft.CachedFrames.track(sizedRaw) else sizedRaw
  }

  /** Every W-token gram SITE (doc_id, 1-based pos, gram, packed site key)
    * of a sized frame — built per-row with array HOFs, no self-join.
    * `hashed` swaps the gram payload for its 16-byte md5 digest BEFORE the
    * explode leaves the row — the 100 TB shuffle-width variant: the gram
    * rollup and the postings join then move a fixed 16 bytes per site
    * instead of the raw W-token string (~3× narrower on the gate corpus).
    * The swap trades the contract's absolute exactness for a ~n²/2¹²⁹
    * md5-collision chance, so the GATE default stays raw; the equality
    * spec (TextOpsSpec) pins hashed ≡ raw on the gate corpus. */
  private def substrSitesOf(sized: DataFrame,
      hashed: Boolean = false): DataFrame = {
    val W = SubstrW
    val gramExpr = s"array_join(slice(arr, i, $W), char(1))"
    val payload = if (hashed) s"unhex(md5($gramExpr))" else gramExpr
    sized.filter(col("n_tokens") >= W)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, n_tokens - ${W - 1}), i -> $payload)")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
      .withColumn("site", col("doc_id") * SubstrPosPack + col("pos"))
  }

  /** The removal-plan core over ANY (doc_id, text) frame — fixture-testable.
    * `cache = false` is the PlanSpec seam: a tracked frame's InMemoryRelation
    * truncates executedPlan text at its nested AdaptiveSparkPlan, hiding the
    * whole rollup subtree from the pin. */
  private[graft] def substrDedupOn(docs: DataFrame, cache: Boolean = true,
      hashedGrams: Boolean = false): DataFrame = {
    val (sized, red) = substrCoreOn(docs, cache, hashedGrams)
    substrPlanOf(sized, red)
  }

  /** q166's per-doc rollup tail over ANY (sized, redundant-anchor) pair —
    * shared by the batch plan and the incremental admission face, so both
    * report the identical (n_tokens, n_removed, n_spans, keep_ratio)
    * schema from the identical coverage-merge semantics. */
  private def substrPlanOf(sized: DataFrame, red: DataFrame): DataFrame = {
    val W = SubstrW
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = red.withColumn("prev", lag(col("pos"), 1).over(wd))
      .select(col("doc_id"),
        when(col("prev").isNull, lit(W.toLong))
          .otherwise(least(lit(W.toLong), col("pos") - col("prev"))).as("cov"),
        when(col("prev").isNull || col("pos") - col("prev") > W, 1L)
          .otherwise(0L).as("ns"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cov")).as("n_removed"), sum(col("ns")).as("n_spans"))
    sized.select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        ((col("n_tokens") - coalesce(col("n_removed"), lit(0L))).cast("double")
          / col("n_tokens").cast("double")).as("keep_ratio"))
  }

  val q166SubstrDedupSql: String = q166SubstrDedupSqlFrom("documents")

  /** q166's oracle parameterized by the source relation — the q191
    * waterfall composes it over the span-dedup rewrite CTE. */
  private[graft] def q166SubstrDedupSqlFrom(from: String): String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM $from),
    s AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens, arr FROM t),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
        array_to_string(arr[i:i + ${SubstrW - 1}], chr(1)) AS gram,
        doc_id * $SubstrPosPack + CAST(i AS BIGINT) AS site
      FROM s, UNNEST(generate_series(1, len(arr) - ${SubstrW - 1})) AS u(i)
      WHERE n_tokens >= $SubstrW),
    f AS (
      SELECT gram, min(site) AS first_site
      FROM g GROUP BY 1 HAVING count(*) >= 2),
    r AS (
      SELECT g.doc_id, g.pos FROM g JOIN f USING (gram)
      WHERE g.site <> f.first_site),
    c AS (
      SELECT doc_id, pos,
        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM r),
    a AS (
      SELECT doc_id,
        sum(CASE WHEN prev IS NULL THEN $SubstrW -- guard:ok internal; output below is CAST
            ELSE least($SubstrW, pos - prev) END) AS n_removed,
        sum(CASE WHEN prev IS NULL OR pos - prev > $SubstrW -- guard:ok internal; output below is CAST
            THEN 1 ELSE 0 END) AS n_spans
      FROM c GROUP BY 1)
    SELECT s.doc_id, s.n_tokens,
      CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
      CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
      CAST(s.n_tokens - coalesce(a.n_removed, 0) AS DOUBLE)
        / CAST(s.n_tokens AS DOUBLE) AS keep_ratio
    FROM s LEFT JOIN a USING (doc_id)
  """

  /** q261: SUBSTRING-ADMISSION ECONOMICS — the per-batch readout of the
    * gram-index admission (the substr twin of q240's graph economics,
    * same deterministic %5 split): how many of the batch's tokens the
    * standing corpus makes redundant (the dedup bill the admission saves
    * downstream), how many removal spans that is, and how much of the
    * batch's gram vocabulary the index has never seen (novelty — is this
    * source still buying new long-form content, at the GRAM level where
    * q154 asks it at the bigram level). Under the immutable-base contract
    * the admission plan ≡ the q166 plan on base ∪ batch restricted to
    * batch docs (the TextOpsSpec law), which is exactly what the oracle
    * recomputes from raw text.
    *
    * The split is the TOP FIFTH BY doc_id (ids ≥ ((max+1)·4) DIV 5), NOT
    * the %5 interleave the graph entries use: the immutable-base contract
    * requires batch ids to FOLLOW all base ids (monotone ingest order —
    * the packed site key's precondition), and an interleaved batch would
    * let union-canonical sites land batch-side, where admission rightly
    * counts the base as canonical (verified: %5 here diverges 740 vs 350
    * removed tokens at sf0.01 — the law's precondition is load-bearing).
    *
    * Exactness: all counts exact BIGINT sums; the two shares are one
    * division each. Scale shape: the q166 shapes over |batch| text plus
    * one gram-keyed anti-join bounded by the batch's distinct grams;
    * 1 row out. */
  def q261SubstrAdmitEconomics(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
      .crossJoin(broadcast(
        Tables.parallelized(Tables(spark, sfDir, "documents"))
          .agg(expr("(max(doc_id) + 1) * 4 DIV 5").as("thr"))))
    val base = docs.filter(col("doc_id") < col("thr")).drop("thr")
    val batch = docs.filter(col("doc_id") >= col("thr")).drop("thr")
    val index = graft.CachedFrames.track(substrIndexFrame(base))
    val plan = substrAdmitAgainstIndex(batch, index)
      .agg(count(lit(1)).as("n_batch_docs"),
        sum(col("n_tokens")).as("n_batch_tokens"),
        sum(col("n_removed")).as("n_removed_tokens"),
        sum(col("n_spans")).as("n_spans"))
    val bgrams = graft.CachedFrames.track(substrIndexFrame(batch))
    val ng = bgrams.agg(count(lit(1)).as("n_batch_grams"))
    val novel = bgrams.join(index, Seq("gram"), "left_anti")
      .agg(count(lit(1)).as("n_novel_grams"))
    plan.crossJoin(broadcast(ng)).crossJoin(broadcast(novel))
      .select(col("n_batch_docs"), col("n_batch_tokens"),
        col("n_removed_tokens"), col("n_spans"),
        when(col("n_batch_tokens") > 0,
          col("n_removed_tokens").cast("double")
            / col("n_batch_tokens").cast("double")).as("removed_share"),
        col("n_batch_grams"), col("n_novel_grams"),
        when(col("n_batch_grams") > 0, col("n_novel_grams").cast("double")
          / col("n_batch_grams").cast("double")).as("novelty_rate"))
  }

  lazy val q261SubstrAdmitEconomicsSql: String = s"""
    WITH thr AS (
      SELECT (max(doc_id) + 1) * 4 // 5 AS thr FROM documents),
    plan AS (
      SELECT p.* FROM ($q166SubstrDedupSql) p, thr
      WHERE p.doc_id >= thr.thr),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_batch_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_batch_tokens,
        CAST(sum(n_removed) AS BIGINT) AS n_removed_tokens,
        CAST(sum(n_spans) AS BIGINT) AS n_spans
      FROM plan),
    t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents),
    g AS (
      SELECT doc_id,
        array_to_string(arr[i:i + ${SubstrW - 1}], chr(1)) AS gram
      FROM t, UNNEST(generate_series(1, len(arr) - ${SubstrW - 1})) AS u(i)
      WHERE len(arr) >= $SubstrW),
    bg AS (SELECT DISTINCT gram FROM g, thr WHERE doc_id >= thr.thr),
    sg AS (SELECT DISTINCT gram FROM g, thr WHERE doc_id < thr.thr),
    ng AS (SELECT CAST(count(*) AS BIGINT) AS n_batch_grams FROM bg),
    nov AS (
      SELECT CAST(count(*) AS BIGINT) AS n_novel_grams
      FROM bg LEFT JOIN sg ON bg.gram = sg.gram WHERE sg.gram IS NULL)
    SELECT a.n_batch_docs, a.n_batch_tokens, a.n_removed_tokens, a.n_spans,
      CASE WHEN a.n_batch_tokens > 0 THEN
        CAST(a.n_removed_tokens AS DOUBLE) / CAST(a.n_batch_tokens AS DOUBLE)
      END AS removed_share,
      ng.n_batch_grams, nov.n_novel_grams,
      CASE WHEN ng.n_batch_grams > 0 THEN
        CAST(nov.n_novel_grams AS DOUBLE) / CAST(ng.n_batch_grams AS DOUBLE)
      END AS novelty_rate
    FROM a, ng, nov
  """

  /** q263: SUBSTRING-FORGET ECONOMICS — the readout of exact deletion over
    * the writer-attributed gram postings ([[substrIndexPostingsFrame]], the
    * substr family's artifact): for the deterministic %7 deletion set, how
    * many postings rows the anti-join drops, how many grams disappear
    * outright (only forgotten docs held them), and — the load-bearing
    * number — how many grams a forgotten doc held that SURVIVE because
    * another writer still holds them (`n_shared_kept`). Those are exactly
    * the rows an unattributed existence index would wrongly un-index for
    * every surviving doc, i.e. the reason the artifact pays
    * `attribution_overhead` (= postings / distinct grams) to be
    * forgettable at all. The forget ≡ surviving-rebuild LAW is pinned in
    * IndexFamilySpec; this query prices it on organic data under DuckDB
    * parity.
    *
    * Exactness: all counts exact BIGINT rollups over the postings frame;
    * the one ratio is a single division. Scale shape: one postings build
    * (q166's explode + a per-doc distinct), one per-gram two-flag rollup
    * (map-side combinable), two 1-row aggregates broadcast together;
    * 1 row out — the deletion set never materializes as a frame and no
    * text is re-scanned to price the deletion. */
  def q263SubstrForget(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
    val postings = graft.CachedFrames.track(substrIndexPostingsFrame(docs))
      .withColumn("forgotten", col("doc_id") % 7 === 0)
    val perGram = postings.groupBy(col("gram"))
      .agg(max(when(col("forgotten"), 1).otherwise(0)).as("hf"),
        max(when(col("forgotten"), 0).otherwise(1)).as("hs"))
    val g = perGram.agg(count(lit(1)).as("n_grams"),
      sum(col("hs")).cast("bigint").as("n_grams_after"),
      sum(when(col("hf") === 1 && col("hs") === 1, 1L).otherwise(0L))
        .as("n_shared_kept"),
      sum(when(col("hs") === 0, 1L).otherwise(0L)).as("n_grams_gone"))
    val p = postings.agg(count(lit(1)).as("n_postings"),
      sum(when(col("forgotten"), 1L).otherwise(0L)).as("n_postings_dropped"),
      countDistinct(when(col("forgotten"), col("doc_id")))
        .as("n_forgotten_docs"))
    p.crossJoin(broadcast(g))
      .select(col("n_postings"), col("n_postings_dropped"),
        col("n_forgotten_docs"), col("n_grams"), col("n_grams_after"),
        col("n_shared_kept"), col("n_grams_gone"),
        (col("n_postings").cast("double") / col("n_grams").cast("double"))
          .as("attribution_overhead"))
  }

  lazy val q263SubstrForgetSql: String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
        array_to_string(arr[i:i + ${SubstrW - 1}], chr(1)) AS gram
      FROM t, UNNEST(generate_series(1, len(arr) - ${SubstrW - 1})) AS u(i)
      WHERE len(arr) >= $SubstrW),
    fl AS (SELECT doc_id, gram, doc_id % 7 = 0 AS forgotten FROM g),
    pg AS (
      SELECT gram,
        max(CASE WHEN forgotten THEN 1 ELSE 0 END) AS hf,
        max(CASE WHEN forgotten THEN 0 ELSE 1 END) AS hs
      FROM fl GROUP BY 1),
    ga AS (
      SELECT CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(hs) AS BIGINT) AS n_grams_after,
        CAST(sum(CASE WHEN hf = 1 AND hs = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_shared_kept,
        CAST(sum(CASE WHEN hs = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_grams_gone
      FROM pg),
    pa AS (
      SELECT CAST(count(*) AS BIGINT) AS n_postings,
        CAST(sum(CASE WHEN forgotten THEN 1 ELSE 0 END) AS BIGINT)
          AS n_postings_dropped,
        CAST(count(DISTINCT CASE WHEN forgotten THEN doc_id END) AS BIGINT)
          AS n_forgotten_docs
      FROM fl)
    SELECT pa.n_postings, pa.n_postings_dropped, pa.n_forgotten_docs,
      ga.n_grams, ga.n_grams_after, ga.n_shared_kept, ga.n_grams_gone,
      CAST(pa.n_postings AS DOUBLE) / CAST(ga.n_grams AS DOUBLE)
        AS attribution_overhead
    FROM pa, ga
  """

  /** q184: SUBSTRING-DEDUP APPLY — materialize the cleaned corpus q166
    * only PLANS. q166 reports per-doc tokens-to-remove/spans/keep-ratio;
    * this operator performs the rewrite: tokens covered by redundant spans
    * are dropped and the surviving tokens are rejoined into `cleaned_text`
    * (single-space separated — whitespace is normalized by the same
    * `split(trim(text))` tokenization the plan counts on). This is the
    * artifact the packing pass (q59) and the shard writer actually
    * consume; without it the dedup family computed a plan nothing applied
    * (contrast: PII masking has MaskCorpus). The CLI face is
    * [[graft.cli.DedupSubstrings]].
    *
    * Self-consistency is IN THE GATE: the Spark side reports `n_kept` as
    * the SIZE OF THE REBUILT ARRAY while the oracle derives it
    * arithmetically as n_tokens − n_removed — the hash compare proves the
    * rewrite drops exactly the tokens the plan counts, doc by doc, and
    * the cleaned strings themselves are compared verbatim.
    *
    * Scale shape: q166's shared core ([[substrCoreOn]] — grams per-row,
    * one map-side min+count on the packed site key, postings join, never
    * doc×doc), then spans merge per doc over redundant anchors only (two
    * per-doc windows + one ≤|spans| rollup), one left join of the
    * |spans|-bearing docs back onto the corpus, and a codegen'd per-row
    * array `filter` against the doc's own merged span list (|spans| per
    * doc is small — boilerplate runs merge). One corpus rewrite, no
    * second corpus-wide shuffle beyond q166's own. */
  def q184SubstrApply(spark: SparkSession, sfDir: String): DataFrame =
    substrApplyOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The rewrite core over ANY (doc_id, text) frame — fixture-testable;
    * `cache` is the PlanSpec seam (q166's). */
  private[graft] def substrApplyOn(docs: DataFrame,
      cache: Boolean = true): DataFrame = {
    val W = SubstrW
    val (sized, red) = substrCoreOn(docs, cache)
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // merged covered spans per doc (q123 run-compression, as q166, but
    // keeping the interval bounds instead of only counting coverage)
    val flagged = red.withColumn("prev", lag(col("pos"), 1).over(wd))
      .withColumn("new_span",
        when(col("prev").isNull || col("pos") - col("prev") > W, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = flagged.groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(W - 1)).as("e"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"),
        sum(col("e") - col("s") + 1).as("n_removed"),
        count(lit(1)).as("n_spans"))
    sized.join(perDoc, Seq("doc_id"), "left")
      // span order in the collected list is shuffle-arrival order — the
      // membership test below is order-insensitive and spans are not output
      .withColumn("kept", expr("CASE WHEN spans IS NULL THEN arr ELSE " +
        "filter(arr, (t, i) -> NOT exists(spans, " +
        "x -> i + 1 >= x.s AND i + 1 <= x.e)) END"))
      .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).cast("bigint").as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).cast("bigint").as("n_spans"),
        size(col("kept")).cast("bigint").as("n_kept"),
        array_join(col("kept"), " ").as("cleaned_text"))
  }

  val q184SubstrApplySql: String = q184SubstrApplySqlFrom("documents")

  /** q184's oracle parameterized by the source relation — the q191
    * waterfall composes it over the span-dedup survivors CTE. */
  private[graft] def q184SubstrApplySqlFrom(from: String): String = s"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM $from),
    s AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens, arr FROM t),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
        array_to_string(arr[i:i + ${SubstrW - 1}], chr(1)) AS gram,
        doc_id * $SubstrPosPack + CAST(i AS BIGINT) AS site
      FROM s, UNNEST(generate_series(1, len(arr) - ${SubstrW - 1})) AS u(i)
      WHERE n_tokens >= $SubstrW),
    f AS (
      SELECT gram, min(site) AS first_site
      FROM g GROUP BY 1 HAVING count(*) >= 2),
    r AS (
      SELECT g.doc_id, g.pos FROM g JOIN f USING (gram)
      WHERE g.site <> f.first_site),
    c AS (
      SELECT doc_id, pos,
        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM r),
    sid AS (
      SELECT doc_id, pos,
        sum(CASE WHEN prev IS NULL OR pos - prev > $SubstrW -- guard:ok internal span numbering; outputs below are CAST
            THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
      FROM c),
    sp AS (
      SELECT doc_id, min(pos) AS sps, max(pos) + ${SubstrW - 1} AS spe
      FROM sid GROUP BY doc_id, span_id),
    pd AS (
      SELECT doc_id,
        list(struct_pack(s := sps, e := spe)) AS spans,
        CAST(sum(spe - sps + 1) AS BIGINT) AS n_removed,
        CAST(count(*) AS BIGINT) AS n_spans
      FROM sp GROUP BY doc_id)
    SELECT s.doc_id, s.n_tokens,
      CAST(coalesce(pd.n_removed, 0) AS BIGINT) AS n_removed,
      CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
      CAST(s.n_tokens - coalesce(pd.n_removed, 0) AS BIGINT) AS n_kept,
      CASE WHEN pd.spans IS NULL THEN array_to_string(s.arr, ' ')
        -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
        -- array_join([]) is '' — an all-removed doc must agree
        ELSE coalesce(array_to_string(list_transform(
          list_filter(generate_series(1, len(s.arr)),
            i -> len(list_filter(pd.spans,
              x -> i >= x.s AND i <= x.e)) = 0),
          i -> s.arr[i]), ' '), '')
      END AS cleaned_text
    FROM s LEFT JOIN pd USING (doc_id)
  """

  // --- incremental face of substring dedup (the q71/AdmitBatch pattern) ---

  /** The persisted GRAM INDEX of a standing corpus: its distinct W-token
    * grams. Existence is all admission needs — under the immutable-base
    * contract (below) a batch site whose gram the base contains is
    * redundant regardless of base multiplicity or position, so the index
    * stores no counts and no sites: |distinct grams| rows of one string
    * column, the cheapest index that makes admission exact. Rebuilding
    * this from a 100 TB base is the expensive pass [[substrAdmitAgainstIndex]]
    * exists to avoid; extension after an admitted batch is a union-distinct
    * ([[graft.cli.ExtendSubstrIndex]]), never a re-scan of the base. */
  private[graft] def substrIndexFrame(docs: DataFrame): DataFrame =
    substrSitesOf(substrSized(docs, cache = false))
      .select(col("gram")).distinct()

  /** The WRITER-ATTRIBUTED gram POSTINGS of a corpus — the substr index
    * family's persisted artifact ([[graft.ops.SubstrIndexFamily]]) and what
    * the streaming ingest loop appends
    * ([[graft.streaming.EventStreams.substrIngestStream]]): one
    * (doc_id, gram) row per DISTINCT gram of each doc. Existence remains
    * the only admission signal (the probe dedups to grams), but full
    * attribution buys the two things the bare [[substrIndexFrame]] cannot
    * do:
    *
    *   - EXACT FORGET: a gram survives a deletion iff any surviving writer
    *     still holds it — one doc_id anti-join, and since the frame is a
    *     per-doc derivation the forgotten artifact EQUALS the from-scratch
    *     build of the surviving corpus (the IndexFamilySpec law). The
    *     unattributed index could only rebuild.
    *   - REPLAY REPAIR: an at-least-once retry anti-joins out every row
    *     its own failed append wrote — without attribution, a replayed
    *     batch probes an index already containing its own grams and marks
    *     every replayed site redundant against itself. A gram shared by
    *     base and batch keeps its base-attributed rows through the
    *     exclusion, so genuine base matches survive replay.
    *
    * The honest price: Σ per-doc distinct grams rows instead of |distinct
    * grams| (the attribution overhead q263 MEASURES on the gate corpus —
    * ~the corpus's gram-sharing rate). Extension stays a pure row union
    * (id-disjoint batches can't collide on (doc_id, gram)), and the
    * admission probe's one distinct() folds the overhead back out before
    * the gram-keyed join. */
  private[graft] def substrIndexPostingsFrame(docs: DataFrame): DataFrame =
    substrSitesOf(substrSized(docs, cache = false))
      .select(col("doc_id"), col("gram")).distinct()

  /** Admit a document batch against a persisted gram index: per batch doc,
    * the q166 removal plan (same schema) counting the base as canonical.
    *
    * IMMUTABLE-BASE CONTRACT (the canonical-first subtlety, adjudicated in
    * SCALE.md): the base corpus is already deduplicated and is NEVER
    * rewritten by an admission; batch doc_ids FOLLOW all base doc_ids in
    * the canonical (doc_id, pos) order (monotone ingest ids — the same
    * precondition the packed site key already imposes). A batch site is
    * therefore redundant iff its gram exists in the base AT ALL (the
    * base's earliest site out-ranks every batch site), or the gram repeats
    * within the batch and the site is not the batch's own minimum. Under
    * that contract this is EXACTLY the batch plan on base ∪ batch
    * restricted to batch docs (the TextOpsSpec law), while reading only
    * |batch| text plus the gram index.
    *
    * Scale shape: the batch explodes per-row as q166; the index probe is
    * one gram-keyed LEFT join against the index deduped HERE (so
    * append-shaped index maintenance — the ingestion loop's at-least-once
    * gram appends — can leave duplicate rows without multiplying sites;
    * the q71 index carries the same tolerance); the within-batch pass is
    * q166's min+count rollup over batch sites only. Nothing touches base
    * text. */
  private[graft] def substrAdmitAgainstIndex(batch: DataFrame,
      index: DataFrame): DataFrame = {
    val sized = substrSized(batch, cache = true)
    val sites = substrSitesOf(sized)
    val batchFirsts = sites.groupBy(col("gram"))
      .agg(min(col("site")).as("first_site"), count(lit(1)).as("n_sites"))
      .filter(col("n_sites") >= 2)
      .select(col("gram"), col("first_site"))
    val red = sites
      .join(index.select(col("gram")).distinct()
        .withColumn("in_base", lit(true)), Seq("gram"), "left")
      .join(batchFirsts, Seq("gram"), "left")
      .filter(col("in_base").isNotNull ||
        (col("first_site").isNotNull && col("site") =!= col("first_site")))
      .select(col("doc_id"), col("pos"))
    substrPlanOf(sized, red)
  }

  /** q187: VOCABULARY RICHNESS — Chao1 species-richness estimate and the
    * Good-Turing unseen-probability mass of the corpus's unigram
    * vocabulary. The crawl-planning numbers: Chao1 ≈ how many token types
    * the corpus WOULD have at exhaustive sampling (V + f1²/2f2, the
    * abundance-based lower bound; the bias-corrected f1(f1−1)/2 form when
    * no doubletons exist), and f1/N is Good-Turing's estimate of the
    * probability that the NEXT token drawn is a previously-unseen type —
    * together they say whether continued crawling still buys vocabulary
    * or the source is lexically exhausted (q154's novelty, corpus-level).
    *
    * Exactness: V, N, f1, f2 are exact integers; f1² rides DECIMAL(38,0)/
    * HUGEINT (exact to f1 ≈ 1e19); chao1 is ONE division plus one double
    * add, gt_unseen_mass ONE division — bitwise both engines.
    *
    * Scale shape: one token explode (Σ tokens rows), one map-side
    * combinable type count, one ≤|vocab| count-of-counts rollup, 1 row
    * out. Nothing vocabulary-sized broadcasts or collects. */
  def q187VocabRichness(spark: SparkSession, sfDir: String): DataFrame =
    vocabRichnessOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The richness core over ANY (text) frame — fixture-testable. */
  private[graft] def vocabRichnessOn(docs: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val counts = docs
      .select(explode(expr("""split(trim(text), '\\s+')""")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    counts
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        (col("vocab").cast("double") +
          when(col("f2") > 0,
            (d38(col("f1")) * d38(col("f1"))).cast("double")
              / (col("f2") * 2).cast("double"))
          .otherwise((d38(col("f1")) * (d38(col("f1")) - 1)).cast("double")
            / lit(2))).as("chao1"),
        (col("f1").cast("double") / col("n_tokens").cast("double"))
          .as("gt_unseen_mass"))
  }

  val q187VocabRichnessSql: String = s"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents),
    c AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
    m AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS vocab,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM c)
    SELECT n_tokens, vocab, f1, f2,
      CAST(vocab AS DOUBLE) +
        CASE WHEN f2 > 0 THEN
          CAST(CAST(CAST(f1 AS HUGEINT) * f1 AS VARCHAR) AS DOUBLE) / CAST(f2 * 2 AS DOUBLE)
        ELSE CAST(CAST(CAST(f1 AS HUGEINT) * (f1 - 1) AS VARCHAR) AS DOUBLE) / 2 END AS chao1,
      CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS gt_unseen_mass
    FROM m
  """

  /** q188: EXACT TWO-SAMPLE KOLMOGOROV-SMIRNOV distance between the
    * quality-score distributions of the English and non-English slices —
    * "is the quality scorer language-biased" as one number with its
    * witness threshold. KS = sup_x |F_en(x) − F_rest(x)|; a large value
    * means a single quality cut (q51's τ) admits the two slices at very
    * different rates, and the mixture weights (q69) inherit that bias.
    *
    * Exactness: the sup over thresholds is attained at a jump, i.e. at a
    * distinct score — per block, |cum_en·n_rest − cum_rest·n_en| is an
    * exact DECIMAL(38,0)/HUGEINT integer (exact to ~1e19 docs per slice);
    * the max is an integer max, the reported ks ONE division, and the
    * witness threshold `ks_at` is the SMALLEST score attaining the max
    * (a total order — deterministic). Bitwise both engines.
    *
    * Scale shape: q185's — one scored map-side rollup to per-score
    * (en, all) counts, the ungrouped [[DistRank]] layout, ONE packed
    * bucketed q59 prefix sum ([[ClassPairPack]]), a rank-keyed join back,
    * ONE 1-row max rollup. No SinglePartition window. */
  def q188QualityKs(spark: SparkSession, sfDir: String): DataFrame =
    ksOfFlags(qualityScored(spark, sfDir)
      .select(col("quality_score").as("q"), (col("lang") === "en").as("en")))

  /** The exact two-sample KS engine over ANY (q, en) flagged-sample frame —
    * fixture-testable against a plain-Scala brute sup. */
  private[graft] def ksOfFlags(flagged: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val perScore = flagged
      .groupBy(col("q"))
      .agg(sum(when(col("en"), 1L).otherwise(0L)).as("en"),
        count(lit(1)).as("all"))
    val ranked = graft.CachedFrames.track(
      DistRank.withBucketedRank(perScore, Seq(), "q", Seq(), "_pos"))
    // one packed prefix-sum engine for both counters (the q185 idiom —
    // [[ClassPairPack]] bound documented there)
    val slim = ranked.select(
      expr("substring(CAST(q AS STRING), 1, 0)").as("source"),
      col("_pos").as("doc_id"),
      (col("en") * lit(ClassPairPack) + col("all")).as("ea"))
    val run = distributedRunningSum(slim, "ea", Seq("doc_id"), slim)
      .select(col("doc_id").as("_p1"),
        expr(s"running DIV $ClassPairPack").as("cum_en"),
        expr(s"running % $ClassPairPack").as("cum_all"))
    val tot = perScore.agg(sum(col("en")).as("n_en"),
      (sum(col("all")) - sum(col("en"))).as("n_rest"))
    val blocks = ranked
      .join(run, col("_pos") === col("_p1"))
      .crossJoin(broadcast(tot))
      .select(col("q"), col("n_en"), col("n_rest"),
        abs(d38(col("cum_en")) * d38(col("n_rest"))
          - (d38(col("cum_all")) - d38(col("cum_en"))) * d38(col("n_en")))
          .as("num"))
    blocks.groupBy(col("n_en"), col("n_rest"))
      // lexicographic struct max = (largest num, then largest −q = SMALLEST
      // witness threshold) — one deterministic pass, no second max join
      .agg(max(struct(col("num"), (col("q") * lit(-1)).as("negq"))).as("mx"))
      .select(col("n_en"), col("n_rest"),
        col("mx.num").cast("bigint").as("ks_num"),
        (col("mx.negq") * lit(-1)).as("ks_at"),
        when(col("n_en") > 0 && col("n_rest") > 0,
          col("mx.num").cast("double")
            / (d38(col("n_en")) * d38(col("n_rest"))).cast("double"))
          .as("ks"))
  }

  val q188QualityKsSql: String = s"""
    WITH x AS (
      SELECT $qualityFromStatsSql AS q, lang = 'en' AS en
      FROM (SELECT doc_id, text, lang,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    s AS (
      SELECT q,
        CAST(sum(CASE WHEN en THEN 1 ELSE 0 END) AS BIGINT) AS en,
        CAST(count(*) AS BIGINT) AS alln
      FROM x GROUP BY 1),
    c AS (
      SELECT q,
        CAST(sum(en) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_en,
        CAST(sum(alln) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_all
      FROM s),
    t AS (
      SELECT CAST(sum(en) AS BIGINT) AS n_en,
        CAST(sum(alln) - sum(en) AS BIGINT) AS n_rest
      FROM s),
    b AS (
      SELECT q, n_en, n_rest,
        abs(CAST(cum_en AS HUGEINT) * n_rest
          - (CAST(cum_all AS HUGEINT) - cum_en) * n_en) AS num
      FROM c, t)
    SELECT n_en, n_rest, CAST(num AS BIGINT) AS ks_num, q AS ks_at,
      CASE WHEN n_en > 0 AND n_rest > 0 THEN
        CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(CAST(CAST(n_en AS HUGEINT) * n_rest AS VARCHAR) AS DOUBLE)
      END AS ks
    FROM b ORDER BY num DESC, q ASC LIMIT 1
  """

  /** q189: GINI CONCENTRATION of the corpus's tokens over documents — the
    * Lorenz-curve answer to "how unevenly is the training budget spread":
    * Gini ≈ 0 means documents contribute tokens evenly, Gini → 1 means a
    * few giant documents dominate (and q59's packing / q150's PPS sampling
    * decisions matter enormously). `top1pct_share` is the Lorenz point a
    * budget meeting actually asks for: the token share held by the top 1%
    * largest documents (max(1, n DIV 100) of them).
    *
    * Exactness: with documents ranked ascending by (n_tokens, doc_id),
    * Gini = (2·Σ rank·xᵢ − (n+1)·Σx) / (n·Σx) — the rank-weighted sum is
    * invariant to tie order (equal values × consecutive ranks), so the
    * tie-break only makes the RANKS deterministic, not the result. All
    * sums exact DECIMAL(38,0)/HUGEINT; two single divisions. Bitwise both
    * engines, pinned against a plain-Scala BigInt oracle.
    *
    * Scale shape: one sized projection, the ungrouped [[DistRank]] rank
    * (B-way parallel, no SinglePartition sort), a 1-row broadcast count,
    * ONE map-side-combinable moment rollup. */
  def q189TokenGini(spark: SparkSession, sfDir: String): DataFrame =
    docGiniOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The concentration core over ANY (doc_id, text) frame. (Named apart
    * from q142's `tokenGiniOn`, the Gini–SIMPSON diversity of the token
    * distribution — this is the Lorenz/Gini COEFFICIENT over document
    * sizes; the two share a name in the literature but not a formula.) */
  private[graft] def docGiniOn(docs: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val sized = docs.select(col("doc_id"),
      size(expr("""split(trim(text), '\\s+')""")).cast("bigint").as("x"))
    val ranked = DistRank.withBucketedRank(sized, Seq(), "x", Seq("doc_id"),
      "_rank")
    val tot = sized.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(tot))
      .select(col("x"), col("_rank"), col("n"),
        expr("CASE WHEN n DIV 100 < 1 THEN 1 ELSE n DIV 100 END").as("k"))
      .groupBy(col("n"), col("k"))
      .agg(sum(col("x")).as("s"),
        sum(d38(col("_rank")) * d38(col("x"))).as("w"),
        sum(when(col("_rank") > col("n") - col("k"), col("x"))
          .otherwise(0L)).as("top_x"))
      .select(col("n").as("n_docs"), col("s").as("total_tokens"),
        col("k").as("top_docs"),
        when(col("s") > 0,
          (lit(2) * col("w") - (d38(col("n")) + 1) * d38(col("s")))
            .cast("double")
            / (d38(col("n")) * d38(col("s"))).cast("double")).as("gini"),
        when(col("s") > 0,
          col("top_x").cast("double") / col("s").cast("double"))
          .as("top1pct_share"))
  }

  val q189TokenGiniSql: String = s"""
    WITH sized AS (
      SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS x
      FROM documents),
    r AS (
      SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rk FROM sized),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sized),
    k AS (
      SELECT n, CASE WHEN n // 100 < 1 THEN 1 ELSE n // 100 END AS k FROM t),
    m AS (
      SELECT CAST(sum(x) AS BIGINT) AS s,
        sum(CAST(rk AS HUGEINT) * x) AS w, -- guard:ok internal HUGEINT; outputs below are exact-cast
        CAST(sum(CASE WHEN rk > n - k.k THEN x ELSE 0 END) AS BIGINT)
          AS top_x,
        max(n) AS n, max(k.k) AS k
      FROM r, k)
    SELECT n AS n_docs, s AS total_tokens, k AS top_docs,
      CASE WHEN s > 0 THEN
        CAST(CAST(2 * w - (CAST(n AS HUGEINT) + 1) * s AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(n AS HUGEINT) * s AS VARCHAR) AS DOUBLE)
      END AS gini,
      CASE WHEN s > 0 THEN CAST(top_x AS DOUBLE) / CAST(s AS DOUBLE) END
        AS top1pct_share
    FROM m
  """

  /** q204: QUALITY Q-Q DECILE TABLE between the English and non-English
    * slices — the rank-exact decile boundary of each slice's quality-score
    * distribution (value at rank ⌈d·n_s/10⌉, d = 1..9, the q140
    * convention) side by side, with the per-decile gap. q188's KS collapses
    * the distributional mismatch to one number at one witness point; this
    * localizes it across the whole range: a gap concentrated in the LOW
    * deciles means the scorer penalizes non-English tails (q51's single
    * cut τ rejects non-English disproportionately exactly there), a
    * uniform vertical offset means a per-language recalibration (q129's
    * within-group percentile) fixes it outright.
    *
    * Exactness: every boundary is a rank-exact order-statistic PICK (no
    * interpolation), so both engines agree bitwise by the q140 argument;
    * the gap is one double subtraction in the same order.
    *
    * Scale shape: one scored projection, ONE grouped bucketed [[DistRank]]
    * layout (group = slice — no per-slice global sort), slice sizes on a
    * broadcast, 18 conditional-max columns folded map-side into a 1-row
    * frame, then a driver-trivial stack to 9 rows. */
  def q204QualityQq(spark: SparkSession, sfDir: String): DataFrame =
    qualityQqOn(graft.CachedFrames.track(qualityScored(spark, sfDir)
      .select(col("doc_id"), col("quality_score").as("q"),
        when(col("lang") === "en", "en").otherwise("rest").as("slice"))))

  /** The Q-Q core over ANY (doc_id, q, slice) frame — fixture-testable. */
  private[graft] def qualityQqOn(flagged: DataFrame): DataFrame = {
    val sizes = flagged.groupBy(col("slice")).agg(count(lit(1)).as("n_s"))
      .select(col("slice").as("_sl"), col("n_s"))
    val ranked = DistRank
      .withBucketedRank(flagged, Seq("slice"), "q", Seq("doc_id"), "_r")
      .join(broadcast(sizes), col("slice") <=> col("_sl"))
    val aggs = (1 to 9).flatMap(d => Seq(
      max(when(col("slice") === "en" &&
        col("_r") === expr(s"($d * n_s + 9) DIV 10"), col("q")))
        .as(s"e_$d"),
      max(when(col("slice") === "rest" &&
        col("_r") === expr(s"($d * n_s + 9) DIV 10"), col("q")))
        .as(s"r_$d")))
    val picks = (1 to 9).map(d => s"$d, e_$d, r_$d").mkString(", ")
    ranked.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(9, $picks) AS (decile, q_en, q_rest)"))
      .select(col("decile"), col("q_en"), col("q_rest"),
        (col("q_en") - col("q_rest")).as("gap"))
  }

  /** q213 tuning: head cuts for the coverage curve. */
  private[graft] val CoverageCuts = Seq(10L, 100L, 1000L)

  /** q213: HEAD-COVERAGE CURVE of the unigram distribution — what share
    * of ALL corpus tokens is covered by the top-10 / top-100 / top-1000
    * most frequent types. The corpus-level repetitiveness lens between
    * q43's raw leaderboard and q142's one-number Simpson index: a corpus
    * whose top-1000 types cover 95% of tokens is template/boilerplate
    * text a tokenizer (q97) will spend its merges on, while a flat curve
    * says the vocabulary budget must be spent wide. Cuts past the
    * vocabulary clamp to V (share then = 1 by construction, surfaced,
    * not dropped). Ranking order is (count DESC, token ASC) — total and
    * engine-identical.
    *
    * Exactness: counts exact; the covered mass at each cut is a
    * rank-exact PREFIX SUM pick (no sampling); shares single divisions.
    *
    * Scale shape: one vocabulary-sized (token) map-side count (never
    * broadcast — the q92 lesson), ONE ungrouped bucketed [[DistRank]]
    * layout + the q59 two-phase prefix sum over the vocabulary frame,
    * three conditional picks, 3 rows out. */
  def q213GramCoverage(spark: SparkSession, sfDir: String): DataFrame =
    gramCoverageOn(Tables.parallelized(Tables(spark, sfDir, "documents"))
      .select(col("text")))

  /** The curve core over ANY (text) frame — fixture-testable. */
  private[graft] def gramCoverageOn(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(explode(expr("""split(trim(text), '\\s+')""")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("negc", -col("c"))
    val ranked = graft.CachedFrames.track(
      DistRank.withBucketedRank(counts, Seq(), "negc", Seq("w"), "_r"))
    val slim = ranked.select(
      expr("substring(w, 1, 0)").as("source"),
      col("_r").as("doc_id"), col("c"))
    val run = distributedRunningSum(slim, "c", Seq("doc_id"), slim)
      .select(col("doc_id").as("_r2"), col("running"))
    val tot = ranked.agg(count(lit(1)).as("v_types"), sum(col("c")).as("t"))
    val picks = CoverageCuts.map(k =>
      max(when(col("_r") === least(lit(k), col("v_types")), col("running")))
        .as(s"cov_$k"))
    val row = ranked.join(run, col("_r") === col("_r2"))
      .crossJoin(broadcast(tot))
      .groupBy(col("v_types"), col("t"))
      .agg(picks.head, picks.tail: _*)
    val stackArgs = CoverageCuts.map(k => s"${k}L, cov_$k").mkString(", ")
    row.select(col("v_types"), col("t").as("total_tokens"),
        expr(s"stack(${CoverageCuts.size}, $stackArgs) AS (k_cut, covered)"))
      .select(col("k_cut"), col("v_types"), col("total_tokens"),
        col("covered"),
        (col("covered").cast("double") / col("total_tokens").cast("double"))
          .as("coverage_share"))
  }

  val q213GramCoverageSql: String = {
    val picks = CoverageCuts.map(k =>
      s"max(CASE WHEN rk = CASE WHEN v_types < $k THEN v_types ELSE $k END" +
        s" THEN running END) AS cov_$k").mkString(",\n      ")
    val rows = CoverageCuts.map(k => s"($k, cov_$k)").mkString(", ")
    s"""
    WITH w AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents),
    cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1),
    r AS (
      SELECT c,
        row_number() OVER (ORDER BY c DESC, w ASC) AS rk,
        CAST(sum(c) OVER (ORDER BY c DESC, w ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS running,
        count(*) OVER () AS v_types,
        CAST(sum(c) OVER () AS BIGINT) AS t
      FROM cnt),
    p AS (SELECT CAST(max(v_types) AS BIGINT) AS v_types,
        CAST(max(t) AS BIGINT) AS total_tokens,
      $picks
    FROM r)
    SELECT CAST(u.k_cut AS BIGINT) AS k_cut, p.v_types, p.total_tokens,
      u.covered,
      CAST(u.covered AS DOUBLE) / CAST(p.total_tokens AS DOUBLE)
        AS coverage_share
    FROM p, LATERAL (VALUES $rows) AS u(k_cut, covered)
  """
  }

  /** q207: LANGUAGE CONFUSION GRID — the full tagged-lang × predicted-lang
    * (q23's stopword heuristic) contingency table through the q197 grid
    * core: observed, expected-under-independence, Pearson residual and
    * lift per cell, EMPTY cells included. Lift normalization is what a
    * raw confusion matrix lacks: a diagonal cell's lift says how far the
    * scorer beats chance GIVEN the marginals (a 90%-English corpus gets
    * 81% of the (en, en) cell for free), and the largest off-diagonal
    * lift names the systematic confusion pair — the place to grow q23's
    * profile lists or to send to q100's trained scorer. The label-noise
    * audit to run before q51 gates on `pred_lang` or q121 propagates
    * `lang` seeds.
    *
    * DEGENERACY READOUT (in-row since round 15): the synthetic gate
    * corpus has no profile-stopword hits, so q23's tie rule collapses
    * every prediction to 'en' — the grid SHAPE is exercised but not a
    * real confusion matrix (the multi-class shape lives in CurationSpec
    * fixtures). Rather than leave that a SCALE.md footnote, every row
    * now carries the predicted-marginal degeneracy as data:
    * `n_pred_classes` (distinct predicted labels observed) and
    * `pred_top_share` (largest predicted-class share — 1.0 IS the
    * collapse). Both are exact (a count and one exact-cast division) —
    * no in-engine entropy/log, per the shared-literal discipline.
    *
    * Exactness and scale shape: [[Curation.contingencyGridOn]] — ONE
    * corpus scan into cached cells, label-space-bounded broadcast grid;
    * the prediction is q23's single-sourced formula ([[scoredDocs]] /
    * the shared SQL fragments), so this grid can never drift from the
    * gate it audits. The degeneracy rollup is one ≤|labels|-row agg
    * broadcast onto the grid. */
  def q207LangConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.CachedFrames.track(
      scoredDocs(Tables.parallelized(Tables(spark, sfDir, "documents")))
        .select(col("lang"), col("pred_lang")))
    val deg = base.groupBy(col("pred_lang")).agg(count(lit(1)).as("cs"))
      .agg(count(lit(1)).as("n_pred_classes"), max(col("cs")).as("mx"),
        sum(col("cs")).as("nn"))
      .select(col("n_pred_classes"),
        (col("mx").cast("double") / col("nn").cast("double"))
          .as("pred_top_share"))
    Curation.contingencyGridOn(base, "lang", "pred_lang")
      .crossJoin(broadcast(deg))
  }

  val q207LangConfusionSql: String = s"""
    WITH base AS (
      SELECT lang, $predLangCaseSql AS pred_lang
      FROM (SELECT lang,
          ${hitsSql("en")} AS s_en,
          ${hitsSql("es")} AS s_es,
          ${hitsSql("de")} AS s_de
        FROM documents)),
    cells AS (
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS o
      FROM base GROUP BY 1, 2),
    r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rl FROM cells GROUP BY 1),
    c AS (SELECT pred_lang, CAST(sum(o) AS BIGINT) AS cs
          FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
    deg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pred_classes,
        CAST(max(cs) AS DOUBLE) / CAST(sum(cs) AS DOUBLE) AS pred_top_share
      FROM c)
    SELECT r.lang, c.pred_lang,
      coalesce(cells.o, CAST(0 AS BIGINT)) AS n_obs,
      CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / CAST(n.nn AS DOUBLE) AS expected,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          - CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / sqrt(CAST(CAST(CAST(n.nn AS HUGEINT) * r.rl * c.cs AS VARCHAR)
          AS DOUBLE)) AS residual,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        AS lift,
      deg.n_pred_classes, deg.pred_top_share
    FROM r CROSS JOIN c CROSS JOIN n CROSS JOIN deg
      LEFT JOIN cells ON cells.lang = r.lang
        AND cells.pred_lang = c.pred_lang
  """

  val q204QualityQqSql: String = {
    val picks = (1 to 9).map(d =>
      s"""max(CASE WHEN slice = 'en' AND rk = ($d * n_s + 9) // 10
        THEN q END) AS e_$d,
      max(CASE WHEN slice = 'rest' AND rk = ($d * n_s + 9) // 10
        THEN q END) AS r_$d""").mkString(",\n      ")
    val rows = (1 to 9).map(d => s"($d, e_$d, r_$d)").mkString(", ")
    s"""
    WITH x AS (
      SELECT doc_id, $qualityFromStatsSql AS q,
        CASE WHEN lang = 'en' THEN 'en' ELSE 'rest' END AS slice
      FROM (SELECT doc_id, lang,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    r AS (
      SELECT slice, q,
        row_number() OVER (PARTITION BY slice ORDER BY q ASC, doc_id ASC)
          AS rk,
        count(*) OVER (PARTITION BY slice) AS n_s
      FROM x),
    p AS (SELECT
      $picks
    FROM r)
    SELECT u.decile, u.q_en, u.q_rest, u.q_en - u.q_rest AS gap
    FROM p, LATERAL (VALUES $rows) AS u(decile, q_en, q_rest)
  """
  }

  /** q201 tuning: copula grid resolution (deciles on both axes). */
  private[ops] val CopulaBuckets = 10

  /** q201: RANK-COPULA GRID of quality vs length — the 10×10 joint decile
    * table (quality-score decile × token-length decile) with each cell's
    * independence expectation, Pearson residual and lift. q173's Spearman
    * ρ compresses the quality–length dependence to ONE number; this
    * localizes it: lift > 1 in the (low-quality, short-doc) corner is the
    * classic boilerplate signature, a ridge along the diagonal says the
    * quality gate is secretly a length gate (so q51's threshold double-
    * counts what q112's length rule already removes), and an L-shaped
    * structure says the dependence is tail-only — none of which ρ can
    * distinguish. Deciles are rank-exact ntile cuts (the q176 engine) so
    * the margins are front-loaded-equal by LAW, making expected/lift
    * exact rationals, not estimates.
    *
    * Exactness: cell counts exact; expected, residual and lift are the
    * q197 grid core's single divisions of exact DECIMAL(38,0)/HUGEINT
    * products (o·N, s_q·s_l, N·s_q·s_l — exact to N ≈ 1e12 docs); sqrt is
    * IEEE-portable. Decile assignment is [[DistRank.ntileOfRank]], byte-
    * identical to ANSI ntile (the front-loaded remainder law, q176-pinned).
    *
    * Scale shape: ONE scored corpus projection (cached), ONE grouped
    * bucketed [[DistRank]] layout over the 2-axis unpivot (no
    * single-partition sort — r17: the q173 two-layout idiom merged into
    * a single window pass, group = axis; per-axis ranks are unchanged,
    * and nt casts to DOUBLE exactly because it is an INT-ranged token
    * count), one doc_id pivot rollup, one map-side 100-cell rollup, then
    * the label-space-bounded broadcast grid of
    * [[Curation.contingencyGridOn]]. */
  def q201RankCopula(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = graft.CachedFrames.track(qualityScored(spark, sfDir)
      .select(col("doc_id"), col("quality_score").as("q"),
        col("n_tokens").cast("long").as("nt")))
    val axes = scored.select(col("doc_id"), expr(
      "stack(2, 0, q, 1, CAST(nt AS DOUBLE)) AS (_axis, _v)"))
    val r2 = DistRank.withBucketedRank(axes, Seq("_axis"), "_v",
        Seq("doc_id"), "_r")
      .groupBy(col("doc_id"))
      .agg(max(when(col("_axis") === 0, col("_r"))).as("rq"),
        max(when(col("_axis") === 1, col("_r"))).as("rl"))
    val n = scored.agg(count(lit(1)).as("n"))
    val deciled = r2.crossJoin(broadcast(n))
      .select(DistRank.ntileOfRank("rq", "n", CopulaBuckets).as("q_decile"),
        DistRank.ntileOfRank("rl", "n", CopulaBuckets).as("len_decile"))
    Curation.contingencyGridOn(deciled, "q_decile", "len_decile")
  }

  val q201RankCopulaSql: String = s"""
    WITH x AS (
      SELECT doc_id, $qualityFromStatsSql AS q, CAST(n_tokens AS BIGINT) AS nt
      FROM (SELECT doc_id,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    dec AS (
      SELECT CAST(ntile($CopulaBuckets) OVER (ORDER BY q, doc_id)
          AS INTEGER) AS q_decile,
        CAST(ntile($CopulaBuckets) OVER (ORDER BY nt, doc_id)
          AS INTEGER) AS len_decile
      FROM x),
    cells AS (
      SELECT q_decile, len_decile, CAST(count(*) AS BIGINT) AS o
      FROM dec GROUP BY 1, 2),
    r AS (SELECT q_decile, CAST(sum(o) AS BIGINT) AS rl
          FROM cells GROUP BY 1),
    c AS (SELECT len_decile, CAST(sum(o) AS BIGINT) AS cs
          FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells)
    SELECT r.q_decile, c.len_decile,
      coalesce(cells.o, CAST(0 AS BIGINT)) AS n_obs,
      CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE) / CAST(n.nn AS DOUBLE)
        AS expected,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          - CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / sqrt(CAST(CAST(CAST(n.nn AS HUGEINT) * r.rl * c.cs AS VARCHAR) AS DOUBLE))
        AS residual,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE) AS lift
    FROM r CROSS JOIN c CROSS JOIN n
      LEFT JOIN cells ON cells.q_decile = r.q_decile
        AND cells.len_decile = c.len_decile
  """

  /** q227: PEARSON r of quality vs length — the LINEAR-correlation leg of
    * the dependence triptych: q173's Spearman ρ (monotone), q201's copula
    * grid (local), and now the moment correlation on the same axes. The
    * ρ-vs-r GAP is itself the diagnostic — ρ high with r low says the
    * relation is monotone but curved (a length-normalized quality gate
    * needs a transform, not a linear correction); r ≈ ρ says a linear
    * deskew is enough. Quality enters quantized at 1e-9 (⌊q·10⁹+½⌋ of the
    * bitwise-portable score — exactly representable, so both engines
    * quantize identically), length as exact token counts.
    *
    * Exactness: [[Ols.coreOn]] — one map-side pass into exact
    * DECIMAL(38,0)/HUGEINT moments (x ≤ 1e9, y ≤ 1e6 keep nΣxy inside 38
    * digits past 1e12 docs); r = num/√(den·deny) is one IEEE sqrt and one
    * division on exact-cast doubles, identical op order in both engines.
    * A constant column (den or deny 0) reports NULL r, never ±Inf.
    *
    * Scale shape: ONE scored-corpus pass, a 6-counter funnel, 1 row. */
  def q227QualityLengthPearson(spark: SparkSession,
      sfDir: String): DataFrame =
    Ols.coreOn(qualityScored(spark, sfDir)
      .select(
        expr("CAST(floor(quality_score * 1000000000.0D + 0.5D) AS BIGINT)")
          .as("x"),
        col("n_tokens").cast("long").as("y")))
      .select(col("n").as("n_docs"),
        when(col("den") > 0 && col("deny") > 0,
          col("num").cast("double")
            / sqrt(col("den").cast("double") * col("deny").cast("double")))
          .as("pearson_r"))

  val q227QualityLengthPearsonSql: String = s"""
    WITH p AS (
      SELECT CAST(floor(($qualityFromStatsSql) * 1000000000.0 + 0.5)
          AS BIGINT) AS x,
        CAST(n_tokens AS BIGINT) AS y
      FROM (SELECT doc_id,
          $nCharsSql AS n_chars_m,
          $nTokensSql AS n_tokens,
          CAST(${hitsSql("en")} AS DOUBLE) AS n_stop,
          $nPunctSql AS n_punct
        FROM documents)),
    ${Ols.CoreSqlFromP}
    SELECT n AS n_docs,
      CASE WHEN den > 0 AND deny > 0 THEN
        CAST(CAST(num AS VARCHAR) AS DOUBLE)
          / sqrt(CAST(CAST(den AS VARCHAR) AS DOUBLE)
            * CAST(CAST(deny AS VARCHAR) AS DOUBLE)) END AS pearson_r
    FROM d
  """

  /** q232: VOCABULARY-GROWTH CURVE — the empirical Heaps curve with NO
    * fitted exponent: distinct token types seen after each decile of the
    * corpus, ingested in doc_id order (the declared deterministic
    * ingestion ordering), plus the NEW types each decile contributes. The
    * crawl-planning readout q187's Chao1 compresses to one asymptote: a
    * last-decile new_types still near the first decile's says the corpus
    * is nowhere near vocabulary saturation (more crawl buys more types —
    * and the q97 BPE budget is being trained on an unsaturated sample);
    * a collapsed tail says new data buys only frequency mass. Exact set
    * counting, not an estimator — every number is a distinct-count over
    * a prefix.
    *
    * Exactness: all counts exact BIGINT; decile cuts are ceil(k·D/10)
    * (first-decile-heavy, non-decreasing, covering D exactly at k = 10);
    * a type's decile is the integer (10·r − 9 + D − 1) DIV D of its
    * FIRST-appearance rank r — no window over deciles, no floats.
    *
    * Scale shape: one ungrouped bucketed [[DistRank]] layout to rank docs
    * (no single-partition sort), one token explode into a doc-keyed join
    * + per-type min rollup (map-side combinable — |vocab| rows), a
    * ≤10-row decile rollup and the tiny ≤10×10 triangular cum join. */
  def q232VocabGrowth(spark: SparkSession, sfDir: String): DataFrame =
    vocabGrowthOn(Tables.parallelized(Tables(spark, sfDir, "documents")))

  /** The growth core over ANY (doc_id, text) frame — fixture-testable. */
  private[graft] def vocabGrowthOn(docs: DataFrame): DataFrame = {
    val ids = graft.CachedFrames.track(docs.select(col("doc_id")))
    val ranked = DistRank.withBucketedRank(ids, Seq(), "doc_id", Seq(), "r")
    val dd = ids.agg(count(lit(1)).as("dd"))
    val tok = docs
      .select(col("doc_id"),
        explode(expr("""split(trim(text), '\\s+')""")).as("token"))
      .join(ranked, "doc_id")
      .groupBy(col("token")).agg(min(col("r")).as("fr"))
    val nw = tok.crossJoin(broadcast(dd))
      .select(expr("(10 * fr - 9 + dd - 1) DIV dd").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("new_types"))
    val grid = docs.sparkSession.range(1, 11).select(col("id").as("k"))
    val cum = grid
      .join(broadcast(nw.select(col("k").as("j"), col("new_types").as("nt"))),
        col("j") <= col("k"), "left")
      .groupBy(col("k")).agg(coalesce(sum(col("nt")), lit(0L))
        .as("vocab_size"))
    grid.join(broadcast(nw), Seq("k"), "left").join(broadcast(cum), Seq("k"))
      .crossJoin(broadcast(dd))
      .select(col("k").as("decile"),
        expr("(k * dd + 9) DIV 10").as("n_docs_prefix"),
        col("vocab_size"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
  }

  val q232VocabGrowthSql: String = """
    WITH dr AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS r
      FROM documents),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS dd FROM documents),
    tok AS (
      SELECT t.token, CAST(min(dr.r) AS BIGINT) AS fr
      FROM (SELECT doc_id,
              unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents) t
      JOIN dr USING (doc_id) GROUP BY 1),
    kk AS (SELECT (10 * fr - 9 + nd.dd - 1) // nd.dd AS k FROM tok, nd),
    nw AS (SELECT k, CAST(count(*) AS BIGINT) AS new_types
           FROM kk GROUP BY 1),
    g AS (SELECT unnest(generate_series(1, 10)) AS k)
    SELECT g.k AS decile,
      CAST((g.k * nd.dd + 9) // 10 AS BIGINT) AS n_docs_prefix,
      CAST(coalesce(
        (SELECT sum(n2.new_types) FROM nw n2 WHERE n2.k <= g.k), 0)
        AS BIGINT) AS vocab_size,
      coalesce(nw.new_types, CAST(0 AS BIGINT)) AS new_types
    FROM g CROSS JOIN nd LEFT JOIN nw ON nw.k = g.k
  """
}
