package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-host document caps — the "no single site dominates the corpus" rule
  * every large-scale crawl-derived training set applies (CCNet caps pages
  * per domain; FineWeb and RefinedWeb keep bounded per-host samples so
  * mega-hosts don't drown the mixture).
  *
  * Semantics: keep at most `n` distinct ids per host, preferring the
  * SMALLEST id (= earliest capture on corpora where capture time is
  * monotone in id; pass an INTEGRAL quality rank as `idCol` to prefer
  * best-quality instead — fractional scores must be quantized first, and
  * the id type is validated fail-fast because a silent cast("long") would
  * truncate every fractional rank to the same key). Duplicate id values
  * count once toward the cap ([[capIds]] emits each winning id once);
  * [[cap]] keeps EVERY input row carrying a winning id.
  *
  * Scale shape — the naive formulation is a window
  * `row_number() OVER (PARTITION BY host ORDER BY id)`, which sorts every
  * host inside ONE task: a host owning 30% of a 10^12-document corpus is a
  * multi-terabyte single-task sort, and window operators get no AQE skew
  * split. This implementation bounds it:
  *
  *  1. project to (host, id) — 16-byte rows, the corpus text NEVER moves;
  *  2. per-partition bounded pre-prune: a size-`n` max-heap per host keeps
  *     only each input partition's n smallest ids (mapPartitions, state
  *     O(hosts-in-partition × n) — the map-side-combine shape that a
  *     built-in partial aggregate cannot express for top-n);
  *  3. the per-host window then sees at most n × P survivors per host
  *     (P = input partitions) instead of the host's full row count —
  *     the hot host's window input is bounded by the cluster shape, not
  *     the data;
  *  4. winners join back `left_semi` on id (verdict-side join: broadcast
  *     under threshold, id-hash shuffle beyond — either way the text side
  *     moves at most once).
  *
  * The global n smallest per host is always a subset of the union of
  * per-partition n smallest, so the pre-prune is lossless.
  */
object HostCap {

  /** The winning (host, id) pairs: at most `n` per host, the n smallest
    * ids. Narrow + one (host)-keyed exchange of 16-byte pairs. */
  def capIds(df: DataFrame, idCol: String, urlCol: String, n: Int)
            (spark: SparkSession): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"idCol '$idCol' must be an integral type (got $idType): a fractional " +
        "rank would be truncated by the long cast and a non-numeric id would " +
        "fail mid-job — quantize scores to integers first")
    import spark.implicits._
    val pairs = df.select(
        graft.pipeline.ExtractPipeline.hostCol(col(urlCol)).as("host"),
        col(idCol).cast("long").as("__id"))
      .as[(String, Long)]
    val pruned: Dataset[(String, Long)] = pairs.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.PriorityQueue[Long]]
      it.foreach { case (h, id) =>
        val heap = heaps.getOrElseUpdate(h, scala.collection.mutable.PriorityQueue.empty[Long])
        if (heap.size < n) heap.enqueue(id)
        else if (id < heap.head) { heap.dequeue(); heap.enqueue(id) }
      }
      heaps.iterator.flatMap { case (h, heap) => heap.iterator.map(h -> _) }
    }
    val w = Window.partitionBy("host").orderBy("__id")
    // duplicate id values (same pair surviving the pre-prune in several
    // partitions, or repeated input rows) must not eat cap slots: dedup the
    // already-bounded candidate set (≤ n × partitions rows per host) before
    // ranking, so the cap counts DISTINCT ids
    pruned.toDF("host", "__id").dropDuplicates("host", "__id")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .select(col("host"), col("__id").as(idCol))
  }

  /** Cap applied to the full table: every column of `df`, rows of at most
    * `n` distinct ids per host (the n smallest `idCol`; a duplicated
    * winning id keeps all of its rows). The text side joins the winner id
    * set `left_semi` — it never enters the window or the pre-prune. */
  def cap(df: DataFrame, idCol: String, urlCol: String, n: Int)
         (spark: SparkSession): DataFrame = {
    val winners = capIds(df, idCol, urlCol, n)(spark).select(idCol)
    df.join(winners, Seq(idCol), "left_semi")
  }
}
