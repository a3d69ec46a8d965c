package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture sampling: deterministic per-source keep rates — the
  * "mixture weights" step that turns a raw crawl plus curated corpora into
  * a training mix (e.g. keep 100% of books, 25% of common crawl).
  *
  * Sampling is a pure narrow filter: hash the stable row id, keep the row
  * iff hash mod 10⁶ falls under the source's weight. No shuffle, no RNG —
  * the same row set reproduces on every run, cluster size, and retry, and
  * a weight bump from 0.25 to 0.30 keeps the old sample a strict subset of
  * the new one (the property ad-hoc `rand()` sampling loses).
  */
object Mixing {

  /** Keep each row with probability `weights(source)` (else
    * `defaultWeight`), decided by `hashCol` — pass `xxhash64(id)` in
    * production, or any oracle-replicable integer hash when cross-engine
    * replay matters. Weights are quantized to millionths. */
  def sampleBySource(docs: DataFrame, sourceCol: String,
                     weights: Map[String, Double], defaultWeight: Double,
                     hashCol: Column): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(w => w >= 0 && w <= 1),
      "weights must be in [0, 1]")
    val w = coalesce(element_at(typedLit(weights), col(sourceCol)),
      lit(defaultWeight))
    // round, don't truncate: 0.3*1e6 is 299999.9999... in IEEE double and a
    // cast would land one millionth below the decimal-arithmetic threshold
    // an oracle (or a human) computes
    docs.filter(pmod(hashCol, lit(1000000L)) < round(w * 1000000.0).cast("long"))
  }
}
