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
    val hits = docs
      .select(col(idCol).as("id"),
        explode(SketchFunctions.word_shingles(col(textCol), k)).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy("id").agg(count(lit(1)).as("hits"))
    docs
      .select(col(idCol).as("id"),
        size(SketchFunctions.word_shingles(col(textCol), k)).as("ngrams"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("ngrams"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }
}
