package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer shard planning: give every document its global chunk offset —
  * `chunk_start` = how many `tokensPerChunk`-sized training chunks precede
  * it in id order. A distributed tokenizer job reads this plan and writes
  * each doc's chunks at [chunk_start, chunk_start + chunks) with no
  * cross-task coordination.
  *
  * The naive formulation — `sum(chunks) over (order by id)` with no
  * partitioning — collapses the whole corpus into ONE window task. This
  * implementation keeps every stage distributed: ids are bucketed into P
  * contiguous ranges (deterministically, from the id min/max — no sampled
  * range boundaries, so no caching is needed for stability), per-bucket
  * subtotals aggregate in one small job (P rows to the driver, not the
  * corpus), their prefix sums ride back as a literal map, and the
  * within-bucket cumulative sum is an ordinary partitioned window. Skewed
  * id spaces make uneven buckets (acceptable: a bucket is still ≤ corpus/P
  * for dense ids; pathological sparse ids should pre-map to dense ones).
  */
object Packing {

  def chunkPlan(docs: DataFrame, idCol: String, tokensCol: Column,
                tokensPerChunk: Int, buckets: Int = 0)
               (implicit spark: SparkSession): DataFrame = {
    require(tokensPerChunk > 0, "tokensPerChunk must be positive")
    val p = if (buckets > 0) buckets else spark.sessionState.conf.numShufflePartitions
    // ONE evaluation of the input lineage across the three actions below
    // (min/max, per-bucket totals, final windowed pass): a nondeterministic
    // input would otherwise make the collected bucket offsets disagree with
    // the final pass — the same cross-evaluation divergence Similarity
    // pins with a centroid cache (ADVICE r04). localCheckpoint (not cache):
    // the snapshot is (id, tokens, chunks) — 24 B/row, far smaller than the
    // docs — its lineage is cut so the window plan stays flat, and the
    // executor blocks are released by the ContextCleaner when the returned
    // plan is no longer referenced (a CacheManager entry would pin storage
    // until an explicit unpersist). Caveat: executor-local blocks are not
    // fault-tolerant; a lost executor fails the job instead of recomputing.
    val base = docs.select(col(idCol).cast("long").as("id"),
        tokensCol.cast("long").as("tokens"))
      .withColumn("chunks",
        ceil(col("tokens").cast("double") / tokensPerChunk).cast("long"))
      .localCheckpoint(true)
    val Array(row) = base.agg(min("id"), max("id")).collect()
    if (row.isNullAt(0)) return base.withColumn("chunk_start", lit(0L))
      .select(col("id"), col("tokens"), col("chunks"), col("chunk_start"))
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // `hi - lo + 1` overflows Long for hash-derived ids spanning most of
    // the 64-bit range (the pattern Mixing.sampleBySource recommends) —
    // and the overflowed negative would slip past a naive max(..., 1)
    // guard, scrambling bucket order. Detect overflow driver-side and
    // fall back to bucketing on the top 32 bits: arithmetic shift is
    // monotone in the signed id, the shifted span is ≤ 2^32 so every
    // product fits, and buckets stay contiguous id ranges.
    val spanOpt =
      try Some(math.max(Math.addExact(Math.subtractExact(hi, lo), 1L), 1L))
      catch { case _: ArithmeticException => None }
    val bucket: Column = spanOpt match {
      case Some(span) if span <= Long.MaxValue / p =>
        ((col("id") - lit(lo)) * p / lit(span)).cast("int")
      case _ =>
        val loS = lo >> 32
        val spanS = (hi >> 32) - loS + 1
        ((shiftright(col("id"), 32) - lit(loS)) * p / lit(spanS)).cast("int")
    }
    val withB = base.withColumn("b", bucket)
    val totals = withB.groupBy("b").agg(sum("chunks").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefix = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
    val offsets: Map[Int, Long] =
      totals.map(_._1).zip(prefix.map(_._2)).toMap
    val cum = sum(col("chunks")).over(Window.partitionBy("b").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1))
    withB
      .withColumn("chunk_start",
        coalesce(element_at(typedLit(offsets), col("b")), lit(0L)) +
          coalesce(cum, lit(0L)))
      .select(col("id"), col("tokens"), col("chunks"), col("chunk_start"))
  }
}
