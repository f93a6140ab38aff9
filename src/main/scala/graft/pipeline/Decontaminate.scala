package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination + cross-document duplicated-span scoring for
  * training-data pipelines (driver mandate).
  *
  * Both operators work on word n-grams (the published decontamination
  * procedure: GPT-3 appendix C uses 13-gram overlap against evaluation
  * sets; Lee et al. 2021 measure duplicated token spans corpus-wide).
  *
  * Scale notes:
  *  - n-gram generation is per-row codegen'd column algebra (no shuffle).
  *  - joins run on xxhash64 of the n-gram, never the string — an 8-byte
  *    shuffle key instead of ~100 bytes of text (collisions are 2^-64-scale
  *    and only ever overcount a duplicate span — acceptable for a filter
  *    signal; the DuckDB oracle joins raw strings and agrees on the test
  *    corpus, which would expose any collision as a hash mismatch).
  *  - decontaminate: the eval side is distinct-hashed then BROADCAST (eval
  *    benchmarks are tiny vs a 100 TB corpus); the corpus side never
  *    shuffles — explode + broadcast-join + re-aggregate by doc id is
  *    map-side until the final per-doc count.
  *  - crossDocDupScore: two shuffles on the 8-byte n-gram hash (global
  *    doc-frequency aggregate + join back), then one per-doc count.
  */
object Decontaminate {

  /** Lowercased whitespace-token word n-grams of a text column; empty array
    * when the document has fewer than n words. */
  def wordNgrams(text: Column, n: Int): Column = {
    val words = filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word-n-gram hashes per document: (id, ngram_hash) exploded,
    * plus the per-document distinct count carried alongside. */
  private def docNgramHashes(df: DataFrame, textCol: String, idCol: String,
                             n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        array_distinct(wordNgrams(col(textCol), n)).as("__gs"))
      .select(col("id"), size(col("__gs")).as("n_ngrams"),
        explode_outer(col("__gs")).as("__g"))
      .withColumn("__gh", xxhash64(col("__g")))

  /** Decontamination report: for every training document, how many of its
    * distinct word n-grams appear anywhere in the evaluation corpus.
    * Returns (id, n_ngrams, n_overlap, overlap_frac, contaminated) — the
    * standard policy drops (or flags) any document with n_overlap > 0. */
  def overlapReport(train: DataFrame, eval: DataFrame, textCol: String,
                    idCol: String, n: Int = 13): DataFrame = {
    val evalHashes = eval
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("__g"))
      .select(xxhash64(col("__g")).as("__gh"))
      .distinct()
    val marked = docNgramHashes(train, textCol, idCol, n)
      .join(broadcast(evalHashes.withColumn("__hit", lit(1))), Seq("__gh"), "left")
    marked.groupBy("id", "n_ngrams")
      .agg(coalesce(sum("__hit"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        when(col("n_ngrams") > 0,
          col("n_overlap").cast("double") / col("n_ngrams")).otherwise(0.0))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Cross-document duplicated-span score: for every document, the count
    * and fraction of its distinct word n-grams that also occur in at least
    * one OTHER document of the corpus — the per-document signal behind
    * exact-substring dedup (documents past a threshold get their spans
    * cut or are dropped). Returns (id, n_ngrams, n_dup, dup_frac). */
  def crossDocDupScore(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 13): DataFrame = {
    val perDoc = docNgramHashes(df, textCol, idCol, n)
    // global doc-frequency per n-gram (distinct-per-doc input, so count =
    // number of documents containing the n-gram)
    val docFreq = perDoc.filter(col("__gh").isNotNull)
      .groupBy("__gh").agg(count(lit(1)).as("__df"))
    perDoc.join(docFreq, Seq("__gh"), "left")
      .groupBy("id", "n_ngrams")
      .agg(coalesce(sum(when(col("__df") > 1, 1L).otherwise(0L)), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        when(col("n_ngrams") > 0,
          col("n_dup").cast("double") / col("n_ngrams")).otherwise(0.0))
  }
}
