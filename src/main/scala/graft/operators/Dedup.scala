package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale notes (100 TB design): exact dedup is one hash-shuffle on a 64-bit
  * digest (never on the full text); MinHash signatures are computed in a
  * single narrow pass, candidates come from LSH band buckets so the shuffle
  * is O(docs × bands) rows of (bucketKey, id), and only same-bucket pairs are
  * verified. Oversized buckets are capped to bound worst-case pair blowup
  * (a degenerate bucket of n docs would otherwise create n² pairs).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical text. One shuffle on the
    * 64-bit text hash + text (hash first keeps comparisons cheap). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("text_hash"), col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("copies"))
      .select(col(idCol), col(textCol), col("copies"))

  /** Word shingles of size k as 64-bit hashes (distinct). */
  def shingles(textCol: Column, k: Int): Column = {
    val words = split(textCol, " ")
    // transform over sliding windows: index i -> hash(words[i..i+k))
    val n = size(words)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(n - k, lit(0))), i =>
          when(i + k <= n, xxhash64(concat_ws("", slice(words, i + lit(1), lit(k)))))),
        c => c.isNotNull))
  }

  /** MinHash signatures, computed by exploding the shingle set once and
    * taking `numHashes` min-aggregates in a single hash-aggregation pass
    * (map-side combine; one shuffle of (id, 64 longs)). A nested
    * `transform(transform(...))` column expression would re-inline the
    * shingle computation per hash function — 64× the work. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleSize: Int): DataFrame = {
    val exploded = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), shingleSize)).as("sh"))
    exploded.groupBy(col("id"))
      .agg(array((0 until numHashes).map(j => min(xxhash64(col("sh"), lit(j)))): _*).as("sig"))
  }

  /** LSH candidate pairs: docs sharing any band bucket. Bucket sizes capped
    * at `maxBucket` to bound the per-bucket pair join. Returns (id1, id2)
    * with id1 < id2, distinct. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 16,
                        shingleSize: Int = 3, maxBucket: Int = 256)
                       (implicit spark: SparkSession): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(docs, idCol, textCol, numHashes, shingleSize)
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val capped = banded
      .withColumn("bn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bucket").orderBy("id")))
      .filter(col("bn") <= maxBucket)
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs. */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, idCol: String,
                    textCol: String, shingleSize: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(sh.withColumnRenamed("id", "id2").withColumnRenamed("sh", "sh2"), "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", size(col("sh1")) + size(col("sh2")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("inter"), col("uni"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → verify. */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
                   threshold: Double = 0.8)(implicit spark: SparkSession): DataFrame =
    jaccardVerify(docs,
      minhashCandidates(docs, idCol, textCol, numHashes, bands, shingleSize),
      idCol, textCol, shingleSize, threshold)

  /** 64-bit SimHash over word features: for each bit j, the sign of
    * Σ_words (bit_j(hash(w)) ? +1 : -1). Single-column expression retained
    * for per-row use (tests, single docs). */
  def simhash(textCol: Column): Column = {
    val hashes = transform(array_distinct(split(textCol, " ")), w => xxhash64(w))
    val bits = transform(sequence(lit(0), lit(63)), j =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0, 1L)
        .otherwise(0L))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, j) => acc.bitwiseOR(call_function("shiftleft", element_at(bits, j + lit(1)), j)))
  }

  /** SimHash for a whole corpus: explode distinct words once, 64 signed-sum
    * aggregates in one hash-agg pass, assemble the bits — the scalable
    * formulation of [[simhash]] (identical output, verified in tests). */
  def simhashAll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val aggs = (0 until 64).map(j =>
      sum(when(call_function("shiftright", col("h"), lit(j)).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"b$j"))
    val sums = words.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val simExpr = (0 until 64).map(j =>
      call_function("shiftleft", when(col(s"b$j") > 0, 1L).otherwise(0L), lit(j)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), simExpr.as("sim"))
  }

  /** SimHash near-dup candidates: split the 64-bit hash into 4 16-bit keys;
    * docs sharing any key are candidates (guarantees recall for hamming
    * distance ≤ 3 by pigeonhole); verify with exact hamming distance.
    * Oversized key buckets are capped like the MinHash path. */
  def simhashDedup(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 256): DataFrame = {
    val withSim = simhashAll(docs, idCol, textCol)
    val keyed = withSim.select(col("id"), col("sim"),
        posexplode(transform(sequence(lit(0), lit(3)), k =>
          call_function("shiftright", col("sim"), k * 16).bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "k").withColumnRenamed("col", "key")
    val capped = keyed
      .withColumn("bn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k", "key").orderBy("id")))
      .filter(col("bn") <= maxBucket)
    val popcount = (c: Column) => bit_count(c)
    capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        popcount(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
