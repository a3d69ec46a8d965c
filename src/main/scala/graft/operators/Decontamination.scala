package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SketchFunctions

/** Benchmark decontamination: flag (or drop) training documents that share
  * any k-word shingle with an evaluation/benchmark corpus — the GPT-3/PaLM
  * procedure (13-gram overlap against the eval suites) that every serious
  * LLM training pipeline runs before tokenization, so leaked test items
  * can't inflate downstream scores.
  *
  * 100 TB shape: eval suites are tiny (≤10⁶ documents ⇒ ≤10⁸ distinct
  * shingles, 8 B each) while the corpus is the 100 TB side — so the
  * benchmark shingle-hash set BROADCASTS and the corpus side is a narrow
  * explode + broadcast semi-join: NO exchange ever touches corpus-derived
  * rows except the per-doc hit aggregate, which shuffles (id, 1) pairs for
  * matched shingles only (rare by construction — contamination is the
  * exception). Shingle identity is the portable 62-bit hash of
  * [[SketchFunctions.word_shingles]] (dialect-exact: DuckDB oracles rebuild
  * the same shingle set from string concatenation).
  */
object Decontamination {

  /** Per-document contamination report: (id, ngrams, hits, contaminated)
    * where `ngrams` counts the doc's distinct k-shingles and `hits` how many
    * of them occur anywhere in `bench`. Callers drop or quarantine rows with
    * `contaminated = true` (or threshold on hits/ngrams for partial-overlap
    * policies). */
  def flag(docs: DataFrame, idCol: String, textCol: String,
           bench: DataFrame, benchTextCol: String, k: Int = 13)
          (implicit spark: SparkSession): DataFrame = {
    val benchGrams = bench
      .select(explode(SketchFunctions.word_shingles(col(benchTextCol), k)).as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    // single corpus pass: the shingle kernel (the dominant cost — split +
    // per-char hashing of every document) runs ONCE; ngrams rides the
    // exploded rows and the broadcast left join marks hits, so the partial
    // aggregate collapses to one (id, ngrams, hits) row per doc before the
    // only exchange. explode_outer keeps short docs (empty shingle arrays).
    docs
      .select(col(idCol).as("id"),
        SketchFunctions.word_shingles(col(textCol), k).as("sh"))
      .select(col("id"), size(col("sh")).as("ngrams"),
        explode_outer(col("sh")).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy("id", "ngrams")
      .agg(count(col("__hit")).as("hits"))
      .select(col("id"), col("ngrams"), col("hits"),
        (col("hits") > 0).as("contaminated"))
  }
}
