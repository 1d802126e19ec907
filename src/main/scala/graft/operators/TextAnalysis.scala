package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis suite — language ID, quality scoring, token
  * counting, fingerprinting. All built-in expressions (no UDFs):
  * every operator runs inside whole-stage codegen and the only
  * aggregation shuffles are small grouped summaries.
  */
object TextAnalysis {

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("text_langid", langid, Some(langidSql)),
    QueryDef("text_quality", quality, Some(qualitySql)),
    QueryDef("text_tokens", tokens, Some(tokensSql)),
    QueryDef("text_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("text_commonness", commonness, Some(commonnessSql))
  )

  // ---------------------------------------------------------------
  // text_langid: stopword-ratio n-gram heuristic. Scores per
  // language = |tokens ∩ stopwords| / |tokens|; zh via non-ascii
  // char ratio; argmax with alphabetical tiebreak.
  // ---------------------------------------------------------------
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "on"),
    "es" -> Seq("el", "los", "y", "es", "una", "por", "para", "como", "más", "pero"),
    "fr" -> Seq("le", "les", "et", "est", "une", "pour", "dans", "ce", "pas", "sur"))

  private def langid(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val scores = stopwords.map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      (size(array_intersect(array_distinct(toks), arr)).cast("double") /
        size(array_distinct(toks))).as(s"score_$lang")
    }
    val nonAscii = (length(col("text")) -
      length(regexp_replace(col("text"), "[ -~]", ""))).cast("double") / length(col("text"))
    val scored = Tables.documents(s, dir)
      .select((col("doc_id") +: col("lang").as("lang_actual") +:
        nonAscii.as("ascii_ratio") +: scores): _*)
    // argmax with deterministic tiebreak: zh if mostly non-ascii,
    // else greatest score, ties broken alphabetically (de<en<es<fr)
    val best = stopwords.map(_._1).foldLeft((lit("und"), lit(-1.0))) {
      case ((bl, bs), lang) =>
        val sc = col(s"score_$lang")
        (when(sc > bs, lit(lang)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
    }
    scored
      .withColumn("lang_pred",
        when(col("ascii_ratio") < 0.5, best._1).otherwise(lit("zh")))
      .groupBy("lang_actual", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang_actual", "lang_pred")
  }

  private val langidSql = {
    val scoreExprs = stopwords.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_intersect(list_distinct(toks), $arr)) AS DOUBLE) / len(list_distinct(toks)) AS score_$lang"
    }.mkString(",\n  ")
    // same fold order as the Scala side: strictly-greater replaces
    val best = stopwords.map(_._1).foldLeft(("'und'", "-1.0")) {
      case ((bl, bs), lang) =>
        (s"(CASE WHEN score_$lang > $bs THEN '$lang' ELSE $bl END)",
         s"(CASE WHEN score_$lang > $bs THEN score_$lang ELSE $bs END)")
    }._1
    s"""SELECT lang_actual, lang_pred, COUNT(*) AS n FROM (
       |  SELECT lang_actual,
       |         CASE WHEN ascii_ratio < 0.5 THEN $best ELSE 'zh' END AS lang_pred
       |  FROM (
       |    SELECT doc_id, lang AS lang_actual,
       |      CAST(length(text) - length(regexp_replace(text, '[ -~]', '', 'g')) AS DOUBLE) / length(text) AS ascii_ratio,
       |      $scoreExprs
       |    FROM (SELECT *, string_split_regex(text, '\\s+') AS toks FROM documents)))
       |GROUP BY lang_actual, lang_pred ORDER BY lang_actual, lang_pred""".stripMargin
  }

  // ---------------------------------------------------------------
  // text_quality: length / punctuation / stopword / digit ratios
  // folded into a 0-100 score. Per-doc row output (no FP agg).
  // ---------------------------------------------------------------
  private def quality(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val nTok = size(toks)
    val stopArr = array(stopwords.flatMap(_._2).distinct.map(lit): _*)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("punct_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[\\.,;:!\\?]", "")))
          .cast("double") / length(col("text")))
      .withColumn("stopword_ratio",
        size(array_intersect(array_distinct(toks), stopArr)).cast("double") / nTok)
      .withColumn("digit_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("double") / length(col("text")))
      .withColumn("quality_score",
        round(lit(100.0) *
          least(lit(1.0), col("n_tokens").cast("double") / 20) *
          (lit(1.0) - col("punct_ratio")) *
          (lit(1.0) - col("digit_ratio")), 4))
      .drop("text")
      .orderBy("doc_id")
  }

  private val qualitySql = {
    val stopArr = stopwords.flatMap(_._2).distinct.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |  CAST(len(list_intersect(list_distinct(toks), $stopArr)) AS DOUBLE) / len(toks) AS stopword_ratio,
       |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
       |  ROUND(100.0 *
       |    LEAST(1.0, CAST(len(toks) AS DOUBLE) / 20) *
       |    (1.0 - CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)) *
       |    (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text)), 4) AS quality_score
       |FROM (SELECT *, string_split_regex(text, '\\s+') AS toks FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // text_tokens: whitespace tokens + BPE-ish regex tokens.
  // ---------------------------------------------------------------
  private val bpeish = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit(bpeish)).cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  private val tokensSql =
    s"""SELECT doc_id,
       |  CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$bpeish')) AS BIGINT) AS n_bpe_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // text_fingerprint: (a) canonical fingerprint = md5 of the sorted
  // distinct token set (order-insensitive duplicate detector);
  // (b) rolling min-hash = lexicographic min md5 over sliding char
  // 8-grams (winnowing-style content marker).
  // ---------------------------------------------------------------
  private def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("w", array_sort(array_distinct(split(col("text"), "\\s+"))))
      .withColumn("canonical_fp", md5(concat_ws(" ", col("w"))))
    val rolling = d
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))")).as("gram"))
      .groupBy("doc_id")
      .agg(min(md5(col("gram"))).as("rolling_fp"))
    d.select(col("doc_id"), col("canonical_fp"))
      .join(rolling, Seq("doc_id"), "left")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // text_commonness: corpus-LM-style fluency signal. A document's
  // score = fraction of its bigram OCCURRENCES whose bigram appears
  // ≥ 5 times in the whole corpus — the counts-only analog of bigram
  // log-likelihood (integer arithmetic + one division → exact
  // cross-engine). Two shuffles: corpus bigram counts, then the
  // doc-bigram ⨝ counts join re-aggregated per doc.
  // ---------------------------------------------------------------
  private val CommonMin = 5

  private def commonness(s: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.documents(s, dir)
      .withColumn("w", split(col("text"), "\\s+"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))")).as("bg"))
    val counts = bigrams.groupBy("bg").agg(count(lit(1)).as("n_corpus"))
    bigrams.join(counts, "bg")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("n_corpus") >= CommonMin, 1L).otherwise(0L)).as("n_common"))
      .withColumn("commonness",
        col("n_common").cast("double") / col("n_bigrams"))
      .orderBy("doc_id")
  }

  private val commonnessSql =
    s"""WITH bigrams AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
       |           i -> w[i] || ' ' || w[i+1])) AS bg
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents)
       |  WHERE len(w) >= 2),
       |counts AS (SELECT bg, COUNT(*) AS n_corpus FROM bigrams GROUP BY bg)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(CASE WHEN n_corpus >= $CommonMin THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       |  CAST(SUM(CASE WHEN n_corpus >= $CommonMin THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS commonness
       |FROM bigrams JOIN counts USING (bg)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val fingerprintSql =
    s"""SELECT d.doc_id, d.canonical_fp, r.rolling_fp FROM
       |  (SELECT doc_id, md5(list_aggregate(list_sort(list_distinct(string_split_regex(text, '\\s+'))), 'string_agg', ' ')) AS canonical_fp
       |   FROM documents) d
       |LEFT JOIN
       |  (SELECT doc_id, MIN(md5(gram)) AS rolling_fp FROM (
       |     SELECT doc_id, unnest(list_transform(range(1, length(text) - 6), i -> substring(text, i, 8))) AS gram
       |     FROM documents WHERE length(text) >= 8)
       |   GROUP BY doc_id) r
       |USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
