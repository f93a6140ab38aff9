package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (driver mandate — beyond the reference surface; SURVEY.md §7.2 step 9).
  *
  * Everything here is pure `functions._` column algebra — codegen'd, no
  * UDFs, fully pushdown/prune-friendly, embarrassingly parallel at 100 TB
  * (per-row, no shuffle).
  */
object Text {

  /** Normalize for fingerprinting: lowercase, collapse whitespace, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact document fingerprint = md5 of the normalized text. Identical
    * semantics exist in every engine (the DuckDB oracle uses md5()). */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word pieces = letter runs, digit runs, or single
    * non-space symbols (a cheap, deterministic proxy for subword counts). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality signals: length, word count, mean word length, punctuation
    * ratio, stopword ratio — the standard cheap text-quality features. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = wsTokenCount(t)
    val chars = length(t)
    val punct = size(regexp_extract_all(t, lit("[\\.,;:!\\?]"), lit(0)))
    val stop = stopwordHits(t, Seq("the", "a", "of", "and", "to", "in"))
    df.withColumn("n_chars_measured", chars)
      .withColumn("n_words", words)
      .withColumn("mean_word_len",
        when(words > 0, (chars - (words - 1)).cast("double") / words))
      .withColumn("punct_ratio",
        when(chars > 0, punct.cast("double") / chars).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(words > 0, stop.cast("double") / words).otherwise(0.0))
  }

  /** Count of whitespace-delimited tokens equal to any of `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    filter(split(trim(lower(text)), "\\s+"),
      tok => words.map(w => tok === lit(w)).reduce(_ || _)).pipe(size)

  private implicit class Pipe[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. Tiny on
    * purpose: language ID at pipeline scale is a per-row scoring pass; the
    * lexicon rides along as a literal in the plan (no broadcast needed). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我"))

  /** Heuristic language ID: score = stopword hits per language, prediction =
    * first language (in `langMarkers` order) achieving the max score;
    * "und" (undetermined) when no marker hits at all. The scoring chain is
    * deterministic and SQL-expressible so the same decision procedure can be
    * replayed by the DuckDB oracle. */
  def langId(df: DataFrame, textCol: String, out: String = "pred_lang"): DataFrame = {
    val t = col(textCol)
    val scored = langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang", stopwordHits(t, markers))
    }
    val scores = langMarkers.map { case (l, _) => col(s"score_$l") }
    val maxScore = greatest(scores: _*)
    val pred = langMarkers.foldLeft(when(maxScore === 0, "und")) {
      case (acc, (lang, _)) => acc.when(col(s"score_$lang") === maxScore, lang)
    }
    scored.withColumn(out, pred)
      .drop(langMarkers.map { case (l, _) => s"score_$l" }: _*)
  }

  /** Rolling polynomial hash fingerprints (winnowing-style): hash every
    * k-gram of the normalized text, keep the minimum per window — a compact
    * near-dup signature. Deterministic, no library dependency. */
  def rollingHashMinSketch(text: String, k: Int = 8, windows: Int = 4): Array[Long] = {
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (s.length < k) return Array(polyHash(s))
    val hashes = new Array[Long](s.length - k + 1)
    var h = 0L
    val B = 1000003L
    var powK = 1L
    for (_ <- 0 until k - 1) powK *= B
    var i = 0
    while (i < s.length) {
      h = if (i < k) h * B + s.charAt(i)
      else (h - s.charAt(i - k) * powK) * B + s.charAt(i)
      if (i >= k - 1) hashes(i - k + 1) = h
      i += 1
    }
    // min per contiguous window chunk
    val chunk = math.max(1, hashes.length / windows)
    hashes.grouped(chunk).map(_.min).take(windows).toArray
  }

  def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 1000003L + s.charAt(i); i += 1 }
    h
  }
}
