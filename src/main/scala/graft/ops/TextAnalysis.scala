package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data pipelines: language ID
  * (stopword-hit heuristic), quality scoring, token counting, document
  * fingerprinting. All pure `functions._` expressions — codegen'd,
  * shuffle-free (per-row), and identical in the SQL oracle. */
object TextAnalysis {

  /** Marker stopword sets per language (tiny n-gram-free heuristic;
    * deterministic argmax with fixed tie-break order en>es>de>fr>zh). */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "or", "in"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ein"),
    "fr" -> Seq("le", "les", "des", "une", "est", "dans"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4"))

  private def hits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, w => w.isin(words: _*)))

  /** (id, lang_guess, <lang>_hits...) — argmax of marker hits. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), split(col(textCol), " ").as("t"))
    val withHits = Markers.foldLeft(tok) { case (df, (lang, words)) =>
      df.withColumn(s"${lang}_hits", hits(col("t"), words))
    }
    // deterministic argmax: strictly-greater beats earlier languages
    val guess = Markers.map(_._1).foldRight(lit("und"): Column) {
      case (lang, acc) =>
        val beatsLater = Markers.map(_._1).dropWhile(_ != lang).drop(1)
          .map(o => col(s"${lang}_hits") >= col(s"${o}_hits"))
        val beatsEarlier = Markers.map(_._1).takeWhile(_ != lang)
          .map(o => col(s"${lang}_hits") > col(s"${o}_hits"))
        val isMax = (beatsLater ++ beatsEarlier :+ (col(s"${lang}_hits") > 0))
          .reduce(_ && _)
        when(isMax, lit(lang)).otherwise(acc)
    }
    withHits.select(col(idCol) +: guess.as("lang_guess") +:
      Markers.map { case (l, _) => col(s"${l}_hits") }: _*)
  }

  /** Deterministic 4-decimal truncation (see Similarity.trunc4). */
  private def trunc4(c: Column): Column = floor(c * 1e4) / 1e4

  /** Quality signals: token count, punct count, stopword ratio, mean
    * token length, composite score in [0,1]. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = Markers.head._2
    docs.select(col(idCol), split(col(textCol), " ").as("t"), col(textCol).as("txt"))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("n_punct", size(expr("regexp_extract_all(txt, '[.,!?;:]', 0)")))
      .withColumn("n_stop", hitsEn(col("t")))
      .withColumn("stop_ratio", trunc4(col("n_stop").cast("double") / col("n_tokens")))
      .withColumn("mean_token_len",
        trunc4((length(col("txt")) - (col("n_tokens") - 1)).cast("double") / col("n_tokens")))
      .withColumn("quality", trunc4(
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5 +
          col("stop_ratio") * 0.3 +
          greatest(lit(0.0),
            lit(0.2) - col("n_punct").cast("double") / greatest(col("n_tokens"), lit(1)) * 0.2)))
      .select(idCol, "n_tokens", "n_punct", "n_stop", "stop_ratio",
        "mean_token_len", "quality")
  }

  private def hitsEn(tokens: Column): Column =
    size(filter(tokens, w => w.isin(Markers.head._2: _*)))

  /** Whitespace + BPE-ish regex token counts. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(split(col(textCol), " ")).as("ws_tokens"),
      size(expr(s"regexp_extract_all(lower($textCol), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
        .as("bpe_tokens"))

  /** Order-free document fingerprint: md5 over the sorted distinct
    * token set (stable under token reordering — catches shuffled dups). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      md5(array_join(array_sort(array_distinct(split(col(textCol), " "))), " "))
        .as("fingerprint"))
}
