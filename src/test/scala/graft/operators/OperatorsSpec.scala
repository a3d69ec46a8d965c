package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.SparkEnv

/** Unit tests for the training-data operators, including planted-duplicate
  * recall for the sketch-based dedup paths that have no SQL oracle. */
class OperatorsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkEnv.session("local[4]", "graft-ops-test", shufflePartitions = 8)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def docsWithPlantedDups = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "sleepy badgers watch a meteor shower from the hillside meadow near town"
    val rows = Seq(
      (0L, base),
      (1L, base), // exact duplicate of 0
      (2L, base.replace("meteor", "comet")), // near-dup of 0
      (3L, "completely different text about spark catalyst optimizer rules " +
        "and whole stage code generation for columnar execution engines today"),
      (4L, base.replace("seventeen", "nineteen").replace("hillside", "valley")), // near-dup
      (5L, "another unrelated document mentioning minhash signatures locality " +
        "sensitive hashing banding techniques and jaccard similarity estimation")
    )
    rows.toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id and counts copies") {
    import spark.implicits._
    val out = Dedup.exact(docsWithPlantedDups, "doc_id", "text")
      .select($"doc_id", $"copies").as[(Long, Long)].collect().toMap
    assert(out(0L) == 2) // docs 0 and 1 merged
    assert(!out.contains(1L))
    assert(out(2L) == 1 && out(3L) == 1)
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val pairs = Dedup.minhashDedup(docsWithPlantedDups, "doc_id", "text",
        threshold = 0.5)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // exact dup
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("connected components: transitive clusters, min-id canonical label") {
    import spark.implicits._
    // two components: a diameter-4 chain 1-2-3-4-5 (forces several
    // propagation rounds) and a triangle 10-11-12 given with redundant
    // and reversed edges; plus an isolated pair (20, 21)
    val pairs = Seq((1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L),
      (10L, 11L), (12L, 11L), (12L, 10L), (21L, 20L)).toDF("id1", "id2")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(out(_) == 1L))
    assert((10L to 12L).forall(out(_) == 10L))
    assert(out(20L) == 20L && out(21L) == 20L)
    assert(out.size == 10)
    // a component whose diameter exceeds maxRounds must FAIL LOUDLY —
    // early-stopped labels are mutually inconsistent
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxRounds = 2).collect()
    }
  }

  test("minhash bucket cap binds deterministically on oversize clusters") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    // six identical docs share every band bucket; maxBucket=3 keeps the
    // three LOWEST ids per bucket (row_number over id), so candidate
    // pairs are exactly the within-cap pairs — higher ids drop out
    // deterministically rather than arbitrarily
    val docs = (0L until 6L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(docs, "doc_id", "text", maxBucket = 3)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    val uncapped = Dedup.minhashCandidates(docs, "doc_id", "text", maxBucket = 100)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 15) // all C(6,2) pairs
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    import spark.implicits._
    val sims = docsWithPlantedDups
      .select($"doc_id", Dedup.simhash($"text").as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(sims(0L) == sims(1L)) // identical text, identical simhash
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(0L), sims(2L)) <= 8)
    assert(hamming(sims(0L), sims(3L)) > 12)
  }

  test("brute-force ANN returns self-evident nearest neighbor") {
    import spark.implicits._
    // vectors: id 0 and 1 nearly parallel; id 2 orthogonal-ish
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.1)),
      (1L, Seq(0.99, 0.01, 0.0, 0.1)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 0.9, 0.1, 0.0)),
      (4L, Seq(0.5, 0.5, 0.5, 0.5))
    ).toDF("vec_id", "vec")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "vec", 2)
      .select($"rank", $"nid").as[(Int, Long)].collect().toMap
    assert(top(1) == 1L) // closest to 0 is 1
  }

  test("LSH ANN achieves high recall vs brute force on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 500L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "vec")
    val queries = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "vec", 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(vecs, queries, "vec_id", "vec", 5, planes = 8)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall too low: $recall")
  }

  test("IVF ANN achieves reasonable recall vs brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 400L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "vec")
    val queries = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "vec", 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, queries, "vec_id", "vec", 5,
        nCentroids = 8, nProbe = 3, iters = 2)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("language ID picks the right language on real sentences") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy with the sun", "en"),
      (2L, "le chat est sur la table et il regarde les oiseaux dans le jardin", "fr"),
      (3L, "el perro come la comida y los gatos juegan en el jardin con una pelota", "es"),
      (4L, "der hund ist nicht alt und die katze spielt mit einem ball auf der wiese", "de"),
      (5L, "xyzzy plugh qwerty asdf", "und")
    ).toDF("id", "text", "expected")
    val out = samples.select($"expected", TextAnalysis.langId($"text").as("got"))
      .as[(String, String)].collect()
    out.foreach { case (exp, got) => assert(exp == got, s"expected $exp got $got") }
  }

  test("fingerprint is deterministic and winnowing is order-sensitive") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "theta eta zeta epsilon delta gamma beta alpha")).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("simhashAll matches the per-row simhash expression") {
    import spark.implicits._
    val df = docsWithPlantedDups
    val perRow = df.select($"doc_id", Dedup.simhash($"text").as("sim"))
      .as[(Long, Long)].collect().toMap
    val bulk = Dedup.simhashAll(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(perRow == bulk)
  }

  test("multimodal decode stage preserves batch shape and determinism") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val media = (0L until 100L).map(i =>
      (i, Array.fill((i % 50 + 1).toInt)((i % 251).toByte))).toDF("id", "media")
    val out = Multimodal.features(media, "id", "media", "image")
    val rows = out.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.frames == r.byte_len % 30 + 1)
      assert(r.feature.length == 8)
    }
    // determinism
    val again = Multimodal.features(media, "id", "media", "image").collect()
    assert(rows.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("duplicate n-gram fraction flags planted dups, clears unique docs") {
    import spark.implicits._
    val out = Dedup.dupNgramStats(docsWithPlantedDups, "doc_id", "text")
      .select($"id", $"dup_frac_x10000").as[(Long, Long)].collect().toMap
    // docs 0 and 1 are identical → every shingle shared → fraction 10000
    assert(out(0L) == 10000 && out(1L) == 10000)
    // near-dups share most but not all shingles
    assert(out(2L) > 5000 && out(2L) < 10000)
    // unrelated docs share nothing
    assert(out(3L) == 0 && out(5L) == 0)
  }

  test("native LSH signature is bit-identical to the higher-order formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("vec"))
      .limit(200)
    val both = emb.select(
        Similarity.lshSignature(col("vec"), 12).as("native"),
        Similarity.lshSignatureHof(col("vec"), 12).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} hof=${r.getLong(1)}"))
  }

  test("minhash LSH output equals the exact-Jaccard pair set (100% recall)") {
    // the correctness contract behind the dedup_minhash oracle: on corpora
    // whose passing pairs have a healthy margin above the threshold, banded
    // LSH misses nothing, so candidates→verify equals exact all-pairs
    implicit val s: SparkSession = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lsh = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val exact = sh.as("a").join(sh.as("b"), col("b.doc_id") > col("a.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("uni", size(col("a.sh")) + size(col("b.sh")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("line-level dedup drops repeated lines, keeps first occurrence and short lines") {
    import spark.implicits._
    val rows = Seq(
      (0L, "unique opening paragraph\nCopyright Example Corp 2026\nmore body text"),
      (1L, "different article body here\nCopyright Example Corp 2026\nclosing remark"),
      // doc 2 is pure boilerplate: every eligible line already seen
      (2L, "Copyright Example Corp 2026\nmore body text"),
      // short lines (< 4 chars) are exempt even when repeated
      (3L, "ok\nok\nfresh content line"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.lineLevel(rows, "doc_id", "text", minLineChars = 4)
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "unique opening paragraph\nCopyright Example Corp 2026\nmore body text")
    assert(out(0L)._4 == 0)
    assert(out(1L)._2 == "different article body here\nclosing remark")
    assert(out(1L)._4 == 1)
    assert(out(2L)._2 == "" && out(2L)._3 == 0 && out(2L)._4 == 2)
    assert(out(3L)._2 == "ok\nok\nfresh content line" && out(3L)._4 == 0)
    assert(out(4L)._2 == "" && out(4L)._3 == 1 && out(4L)._4 == 0)
  }

  test("decontamination flags docs overlapping the benchmark by k words") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),            // contains bench 5-gram
      (1L, "totally unrelated words about spark plans here"),
      (2L, "prefix words alpha beta gamma delta epsilon more"), // overlap mid-doc
      (3L, "alpha beta gamma different tail words now"),        // only 3-word overlap
      (4L, "tiny doc")                                          // < k words
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val out = Decontamination.flag(corpus, "doc_id", "text", bench, "text", k = 5)
      .as[(Long, Int, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._4 && out(0L)._3 == 1)
    assert(!out(1L)._4 && out(1L)._3 == 0)
    assert(out(2L)._4)
    assert(!out(3L)._4, "3-word overlap must not flag at k=5")
    assert(!out(4L)._4 && out(4L)._2 == 0)
  }

  test("decontamination plan: benchmark grams broadcast, corpus side stays narrow") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val corpus = (0L until 50L).map(i => (i, s"word$i text body alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val plan = Decontamination.flag(corpus, "doc_id", "text", bench, "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"benchmark shingles must ride a broadcast:\n$plan")
  }

  test("gopher filter: each rule independently rejects its violation") {
    import spark.implicits._
    val good = "the quick brown fox jumps over with many plain words that " +
      "keep flowing along nicely through fifty or so ordinary tokens here " +
      "making sure the document easily clears every single quality gate " +
      "from the published battery of rules that we have encoded with care " +
      "and a bit of patience for good measure to finish"
    val rows = Seq(
      (0L, good),                                              // passes all
      (1L, "too short to count"),                              // word count
      (2L, good + (" ####" * 20)),                             // symbol ratio
      // bullets: paper rule is >90% of LINES bulleted (default 900‰) —
      // 12 bullet lines after the one prose line = 12/13 ≈ 923‰
      (3L, good + (1 to 12).map(i => s"\n- b$i").mkString),
      (4L, good + "\nends one…\nends two…\nends three…"),      // ellipses
      (5L, ("12345 " * 60) + "the of and"),                    // alpha ratio
      (6L, good.replace("the", "xx").replace("with", "yy")
             .replace("that", "zz").replace("of", "qq")
             .replace("and", "rr").replace("to", "ss"))        // stop words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(rows, "doc_id", "text")
      .select($"doc_id", $"pass").as[(Long, Boolean)].collect().toMap
    assert(out(0L), "the good doc must pass")
    (1L to 6L).foreach(i => assert(!out(i), s"doc $i should fail"))
    // ASCII "..." counts as ONE symbol occurrence (the paper's ellipsis),
    // not three characters — 60+ occurrences vs ~57 words trips the 10% rule
    val ell = Seq((0L, good + (" word..." * 60))).toDF("doc_id", "text")
    val ellRow = TextAnalysis.gopherFilter(ell, "doc_id", "text")
      .select($"symbol_ratio_x1000", $"pass").head()
    assert(ellRow.getLong(0) >= 500 && !ellRow.getBoolean(1),
      s"ASCII ellipses must count: got ${ellRow.getLong(0)}")
  }

  test("unigram likelihood: exact integer scores, hot/cold split invariant") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    // total 5 tokens; freq a=2,b=2,c=1 → per-token 400000/400000/200000
    def run(hot: Int) = TextAnalysis.unigramLikelihood(docs, "doc_id", "text", hot)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = Seq((1L, 3L, 400000L), (2L, 2L, 300000L)) // doc 3: no tokens, no row
    assert(run(65536) == expected)
    // the frequency split is an execution detail: hotWords=1 must not
    // change a single value (cold path exercised for b and c)
    assert(run(1) == expected)
  }

  test("token counts: empty and whitespace-only text is 0 tokens") {
    import spark.implicits._
    val rows = Seq((0L, ""), (1L, "   \n\t "), (2L, "two words"))
      .toDF("doc_id", "text")
    val out = rows.select($"doc_id",
        TextAnalysis.tokenCount($"text").as("t"),
        TextAnalysis.subwordEstimate($"text").as("s"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0, 0L), (1L, 0, 0L), (2L, 2, 2L)))
  }

  test("minhash LSH rejects non-divisible band configurations") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashCandidates(docs, "doc_id", "text", numHashes = 64, bands = 12)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashCandidates(docs, "doc_id", "text", numHashes = 64, bands = 128)
    }
  }

  test("chunk plan survives hash-wide id spans (64-bit range, no overflow)") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    // ids spread across the whole signed-Long range: hi - lo + 1 overflows
    val rows = Seq(Long.MinValue + 7, -3000000000000000000L, -12L, 0L,
      99L, 4000000000000000000L, Long.MaxValue - 5)
      .zipWithIndex.map { case (id, i) => (id, 64 * (i + 1)) }
    val docs = rows.toDF("doc_id", "tokens")
    val out = Packing.chunkPlan(docs, "doc_id", col("tokens"), tokensPerChunk = 64,
        buckets = 4)
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    val expected = rows.sortBy(_._1).scanLeft((0L, 0L, 0L, 0L)) {
      case ((_, _, pc, ps), (id, t)) =>
        (id, t.toLong, (t + 63) / 64, ps + pc)
    }.drop(1)
    assert(out.toSeq == expected.toSeq)
  }

  test("mixture sampling is deterministic and monotone in the weight") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val h = pmod(col("doc_id") * lit(1103515245L) + lit(12345L), lit(2147483648L))
    def ids(w: Map[String, Double]) =
      Mixing.sampleBySource(docs, "source", w, 0.0, h)
        .select($"doc_id").as[Long].collect().toSet
    val quarter = ids(Map("src1" -> 0.25))
    val half = ids(Map("src1" -> 0.5))
    assert(ids(Map("src1" -> 0.25)) == quarter, "must be deterministic")
    assert(quarter.subsetOf(half), "raising a weight must only add rows")
    assert(half.forall(_ % 4 == 1), "default weight 0 drops other sources")
    assert(ids(Map("src1" -> 1.0)).size == 100, "weight 1.0 keeps all of the source")
    // keep rate lands near the weight (LCG is uniform enough at n=100)
    assert(math.abs(half.size - 50) <= 20, s"got ${half.size}/100 at w=0.5")
  }

  test("chunk plan matches the naive global cumulative sum") {
    import spark.implicits._
    implicit val s: SparkSession = spark
    // sparse, shuffled ids; token counts vary incl. 0-chunk empty docs
    val rows = Seq(907L, 3L, 500L, 41L, 12L, 999L, 77L, 600L, 8L, 250L)
      .zipWithIndex.map { case (id, i) => (id, (i * 37) % 190) }
    val docs = rows.toDF("doc_id", "tokens")
    val out = Packing.chunkPlan(docs, "doc_id", col("tokens"), tokensPerChunk = 64,
        buckets = 4)
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    val expected = rows.sortBy(_._1).scanLeft((0L, 0L, 0L, 0L)) {
      case ((_, _, pc, ps), (id, t)) =>
        (id, t.toLong, (t + 63) / 64, ps + pc)
    }.drop(1).map { case (id, t, c, start) => (id, t, c, start) }
    assert(out.toSeq == expected.toSeq)
  }

  test("line-level dedup works when the caller's id column is named \"id\"") {
    import spark.implicits._
    val rows = Seq((1L, "dup line here\nunique a"), (2L, "dup line here\nunique b"))
      .toDF("id", "text")
    val out = Dedup.lineLevel(rows, "id", "text")
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(out(1L) == "dup line here\nunique a")
    assert(out(2L) == "unique b")
  }

  test("line-level dedup: within-document repeats collapse to the first copy") {
    import spark.implicits._
    val rows = Seq(
      (7L, "chorus line repeats\nverse one\nchorus line repeats\nverse two\nchorus line repeats"))
      .toDF("doc_id", "text")
    val out = Dedup.lineLevel(rows, "doc_id", "text")
      .as[(Long, String, Int, Int)].collect().head
    assert(out._2 == "chorus line repeats\nverse one\nverse two")
    assert(out._3 == 3 && out._4 == 2)
  }

  test("paragraph-level dedup drops repeated paragraphs, keeps first occurrence") {
    import spark.implicits._
    val banner = "subscribe to our newsletter for updates"
    val rows = Seq(
      (1L, s"first article body\n\n$banner\n\nunique tail one"),
      (2L, s"second article body\n\n$banner\n\nunique tail two"),
      (3L, s"$banner"), // banner-only page: everything deduped away
      (4L, "x\n\ny")    // short paragraphs below minParaChars: exempt
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphLevel(rows, "doc_id", "text", minParaChars = 4)
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == s"first article body\n\n$banner\n\nunique tail one")
    assert(out(2L)._2 == "second article body\n\nunique tail two")
    assert(out(2L)._3 == 2 && out(2L)._4 == 1)
    assert(out(3L)._2 == "" && out(3L)._4 == 1)
    assert(out(4L)._2 == "x\n\ny" && out(4L)._4 == 0)
  }

  test("substring dedup removes non-first duplicated spans, keeps first") {
    import spark.implicits._
    // "one two three four" recurs in docs 0 and 1 (k=3 ⇒ grams
    // one-two-three and two-three-four both duplicated): doc 0 keeps the
    // span, doc 1 loses tokens 2..5 (covered by both grams' windows)
    val rows = Seq(
      (0L, "one two three four alpha beta gamma"),
      (1L, "prefix tokens one two three four suffix"),
      (2L, "totally unrelated words without any shared spans"),
      (3L, "tiny doc") // < k tokens: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.substringLevel(rows, "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "one two three four alpha beta gamma" && out(0L)._4 == 0)
    assert(out(1L)._2 == "prefix tokens suffix")
    assert(out(1L)._3 == 3 && out(1L)._4 == 4)
    assert(out(2L)._4 == 0)
    assert(out(3L)._2 == "tiny doc" && out(3L)._3 == 2 && out(3L)._4 == 0)
  }

  test("substring dedup: within-document repeats collapse to the first span") {
    import spark.implicits._
    val rows = Seq(
      (5L, "la la la la different middle part la la la la"))
      .toDF("doc_id", "text")
    // k=4: "la la la la" (positions 0 and 7) — pos 0 survives, pos 7's
    // window [7, 11) is removed; the overlapping gram starting at the
    // SECOND la-run is itself a first occurrence only if its hash differs
    val out = Dedup.substringLevel(rows, "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long)].collect().head
    assert(out._2 == "la la la la different middle part")
    assert(out._4 == 4)
  }

  test("substring dedup: space-shifted spans never alias (joined-span hash)") {
    import spark.implicits._
    // 'ab c d' and 'a bc d' concatenate to the same 'abcd' — a
    // separator-free k-gram hash removes B's span as a phantom duplicate
    // of text that never occurred verbatim. The joined-span pre-image
    // keeps them distinct; only the genuinely shared tail dedupes.
    val rows = Seq(
      (0L, "ab c d shared tail words here"),
      (1L, "a bc d shared tail words here")).toDF("doc_id", "text")
    val out = Dedup.substringLevel(rows, "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "ab c d shared tail words here" && out(0L)._4 == 0)
    // doc 1 keeps its distinct head 'a bc' (under the aliased hash the
    // head gram (a bc d) collided with doc 0's (ab c d) and was phantom-
    // deleted too); the genuinely duplicated tail grams at positions 2-4
    // cover tokens 2..6, which drop
    assert(out(1L)._2 == "a bc" && out(1L)._4 == 5,
      s"distinct head must survive, verbatim tail must drop: ${out(1L)}")
  }

  test("connected components: reliable checkpoint path matches localCheckpoint") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id1", "id2")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    val local = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    assert(reliable(5L) == 1L && reliable(11L) == 10L)
    // the reliable path actually wrote checkpoint data
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, s"no reliable checkpoint files under $dir")
    // ...and reclaimed every intermediate round: the 1-2-3-4-5 chain takes
    // several rounds, but only the edge list and the FINAL labels may
    // remain (intermediate rounds would otherwise accumulate for the
    // application lifetime — Spark never cleans them itself)
    import scala.jdk.CollectionConverters._
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")).toList
    assert(rddDirs.size <= 2,
      s"stale checkpoint rounds not reclaimed: ${rddDirs.mkString(", ")}")
  }

  test("dup n-gram stats: invariant under the hot/cold split point") {
    import spark.implicits._
    val docs = docsWithPlantedDups
    val full = Dedup.dupNgramStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    // hotShingles=1 forces almost everything through the cold tail;
    // hotShingles huge forces everything through the broadcast — results
    // must be identical (the split is an execution detail)
    val cold = Dedup.dupNgramStats(docs, "doc_id", "text", hotShingles = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(full == cold)
    // docs 0 and 1 are exact duplicates: every 3-gram duplicated
    val byId = full.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 == byId(0L)._3, "exact-dup doc must be 100% duplicated grams")
    assert(byId(0L)._4 == 10000L)
  }

  test("line/substring dedup: invariant under the hot/cold split point") {
    import spark.implicits._
    val rows = Seq(
      (1L, "banner here\nbody one\nbanner here"),
      (2L, "banner here\nbody two"),
      (3L, "body one\nbody three\nbanner here"),
      (4L, "unique only")).toDF("doc_id", "text")
    val a = Dedup.lineLevel(rows, "doc_id", "text")
      .as[(Long, String, Int, Int)].collect().toSet
    val b = Dedup.lineLevel(rows, "doc_id", "text", hotKeys = 1)
      .as[(Long, String, Int, Int)].collect().toSet
    val c = Dedup.lineLevel(rows, "doc_id", "text", hotKeys = 0)
      .as[(Long, String, Int, Int)].collect().toSet
    assert(a == b && b == c, s"split changed results:\n$a\n$b\n$c")
    val s1 = Dedup.substringLevel(rows.withColumn("text",
        regexp_replace(col("text"), "\n", " ")), "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long)].collect().toSet
    val s2 = Dedup.substringLevel(rows.withColumn("text",
        regexp_replace(col("text"), "\n", " ")), "doc_id", "text", k = 2,
        hotKeys = 1)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(s1 == s2, s"substring split changed results:\n$s1\n$s2")
  }

  test("snapshot dedup: all four modes agree; prior duplicates collapse") {
    import spark.implicits._
    val docs = docsWithPlantedDups
    // prior snapshot: doc 0's text (twice — distinctness must absorb it)
    // and doc 3's; docs 0, 1 (same text as 0) and 3 are in_prior
    val prior = Seq(
      docs.as[(Long, String)].collect()(0)._2,
      docs.as[(Long, String)].collect()(0)._2,
      docs.as[(Long, String)].collect()(3)._2
    ).toDF("text")
    val expected = Map(0L -> true, 1L -> true, 2L -> false,
      3L -> true, 4L -> false, 5L -> false)
    for (mode <- Seq("auto", "broadcast", "join", "bloom")) {
      val out = Dedup.againstSnapshot(docs, "doc_id", "text", prior, "text",
          mode = mode)
        .as[(Long, Boolean)].collect().toMap
      assert(out == expected, s"mode $mode")
    }
    // row count preserved even with duplicate prior texts
    assert(Dedup.againstSnapshot(docs, "doc_id", "text", prior, "text").count() == 6)
  }

  test("snapshot dedup: null texts match nothing (SQL equality semantics)") {
    import spark.implicits._
    val docs = Seq((1L, "shared text"), (2L, null: String), (3L, "only new"))
      .toDF("doc_id", "text")
    val prior = Seq("shared text", null: String).toDF("text")
    val expected = Map(1L -> true, 2L -> false, 3L -> false)
    for (mode <- Seq("broadcast", "join", "bloom")) {
      val out = Dedup.againstSnapshot(docs, "doc_id", "text", prior, "text",
          mode = mode)
        .as[(Long, Boolean)].collect().toMap
      assert(out == expected, s"mode $mode")
    }
  }

  test("snapshot dedup: empty prior flags nothing; bloom has no false negatives") {
    import spark.implicits._
    val docs = docsWithPlantedDups
    val empty = Seq.empty[String].toDF("text")
    assert(Dedup.againstSnapshot(docs, "doc_id", "text", empty, "text")
      .filter($"in_prior").count() == 0)
    // 200 distinct prior texts, every one re-presented: bloom must flag ALL
    // (mightContain has no false negatives)
    val priorDocs = (0L until 200L).map(i => (i, s"prior document number $i with words"))
    val prior = priorDocs.map(_._2).toDF("text")
    val again = priorDocs.toDF("doc_id", "text")
    val flagged = Dedup.againstSnapshot(again, "doc_id", "text", prior, "text",
        mode = "bloom")
      .filter($"in_prior").count()
    assert(flagged == 200L)
  }

  test("quality score: fixed linear weights, threshold labels") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the cat sat on the mat with some more readable english words " +
        "that have enough alpha content to score well and be kept here"),
      (2L, "#### #### #### #### #### #### #### #### #### ####") // symbol soup
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(rows, "doc_id", "text", threshold = 2000)
      .select($"doc_id", $"quality_score_x1000", $"high_quality")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3, s"readable doc must pass: score=${out(1L)._2}")
    assert(!out(2L)._3, s"symbol soup must fail: score=${out(2L)._2}")
    assert(out(1L)._2 > out(2L)._2)
  }

  test("c4 clean: each line rule and page rule fires independently") {
    import spark.implicits._
    val rows = Seq(
      // 6 sentences across two kept lines; one droppable line each way
      (0L, "This page has one proper sentence. Then another! And a third?\n" +
        "no terminal punctuation on this line\n" +
        "Short one.\n" +
        "A fourth sentence here. A fifth one too. And a sixth."),
      // javascript rule: valid shape, still dropped
      (1L, "Please enable JavaScript to continue reading.\n" +
        "One. Two. Three. Four. Five. Six real sentences follow here."),
      // lorem ipsum: lines keepable, page fails
      (2L, "Lorem ipsum dolor sit amet sentence. Two. Three. Four. Five."),
      // curly bracket page rule, either brace
      (3L, "One. Two. Three. Four. Five. Six good sentences { here."),
      (4L, "One. Two. Three. Four. Five. Six good sentences } here."),
      // end-quote terminal mark is accepted
      (5L, "He said \"one two three four five six sentences. . . . . .\"")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(rows, "doc_id", "text")
      .select($"doc_id", $"text", $"lines_total", $"lines_kept",
        $"sentences", $"page_pass")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(2) == 4 && out(0L).getLong(3) == 2)
    assert(out(0L).getLong(4) == 6 && out(0L).getBoolean(5))
    assert(!out(0L).getString(1).contains("no terminal"))
    assert(!out(0L).getString(1).contains("Short one"))
    assert(out(1L).getLong(3) == 1, "javascript line must drop")
    assert(!out(1L).getString(1).toLowerCase.contains("javascript"))
    assert(!out(2L).getBoolean(5), "lorem ipsum page must fail")
    assert(out(2L).getLong(3) == 1, "lorem line itself is keepable")
    assert(!out(3L).getBoolean(5) && !out(4L).getBoolean(5),
      "curly bracket page must fail")
    assert(out(5L).getLong(3) == 1 && out(5L).getBoolean(5),
      "end-quote terminal line must be kept and page pass")
  }

  test("c4 clean: empty and single-line-no-words edge cases") {
    import spark.implicits._
    val rows = Seq((0L, ""), (1L, "   \n  "), (2L, "One two three four.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(rows, "doc_id", "text", minSentences = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(2) == 1 && out(0L).getLong(3) == 0)
    assert(out(0L).getString(1) == "" && !out(0L).getBoolean(5))
    assert(out(1L).getLong(2) == 2 && out(1L).getLong(3) == 0)
    assert(out(2L).getLong(3) == 1 && out(2L).getBoolean(5))
  }

  test("dup unit stats: excess occurrences and char fractions, lines and paragraphs") {
    import spark.implicits._
    val rows = Seq(
      (0L, "alpha\nbeta\ngamma"),                 // no dups
      (1L, "alpha\nalpha\nbeta"),                 // one excess (c=2)
      (2L, "same\nsame\nsame\nsame"),             // three excess (c=4)
      (3L, ""),                                   // single empty unit
      (4L, "x\ny\nx\nz\ny\nx")                    // x:c=3 (+2), y:c=2 (+1)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupUnitStats(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // columns: id, units, dup_unit_excess, dup_unit_frac, chars, dup_char_excess, dup_char_frac
    assert(out(0L).getLong(1) == 3 && out(0L).getLong(2) == 0)
    assert(out(1L).getLong(2) == 1 &&
      out(1L).getLong(3) == 3333, s"got ${out(1L)}")
    assert(out(1L).getLong(5) == 5 && // one excess "alpha"
      out(1L).getLong(6) == 3571)     // 5 of 14 chars
    assert(out(2L).getLong(2) == 3 && out(2L).getLong(3) == 7500)
    assert(out(3L).getLong(1) == 1 && out(3L).getLong(2) == 0 &&
      out(3L).getLong(4) == 0 && out(3L).getLong(6) == 0)
    assert(out(4L).getLong(2) == 3 && out(4L).getLong(5) == 3)
    // paragraph separator variant over blank-line structure
    val paras = Seq((0L, "para one\n\npara one\n\npara two"))
      .toDF("doc_id", "text")
    val p = TextAnalysis.dupUnitStats(paras, "doc_id", "text",
      sepRegex = "\n\n").head()
    assert(p.getLong(1) == 3 && p.getLong(2) == 1)
  }

  test("dup unit gate: paper cuts drop repetition-heavy pages, char leg trips independently") {
    import spark.implicits._
    val rows = Seq(
      // all-distinct lines: both fractions 0 → pass
      (0L, "alpha\nbeta\ngamma\ndelta"),
      // 10 copies of one line out of 12: unit frac 9/12 = 7500 > 3000 → drop
      (1L, ("Limited time offer act now\n" * 10) + "alpha\nbeta"),
      // unit leg passes (2 excess of 8 = 2500 ≤ 3000) but the duplicated
      // lines are long among short: char frac trips the 2000 cut alone
      (2L, Seq("a", "b", "c", "d", "e",
        "the same very long duplicated boilerplate line",
        "the same very long duplicated boilerplate line",
        "the same very long duplicated boilerplate line").mkString("\n")),
      // a mild dup (1 excess of 10 units, small char share): below both
      // cuts → kept
      (3L, Seq("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "dddd", "dddd", "bbbbbbbbbbbbbbbbbbbbbbbbbbbb",
        "e", "f", "g", "h", "i", "jj").mkString("\n"))
    ).toDF("doc_id", "text")
    val kept = rows.filter(TextAnalysis.dupUnitPass(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L), "distinct-line page must pass")
    assert(!kept.contains(1L), "repetition-planted page must fail the unit cut")
    assert(!kept.contains(2L), "char leg must trip independently of the unit leg")
    // doc 3: units=10, excess=1 ("dddd" c=2) → 1000 ≤ 3000; chars=79,
    // excess=4 → floor(40000/79)=506 ≤ 2000 → kept
    assert(kept.contains(3L), "page at/below both cuts must be kept")
    // stats and gate share one arithmetic: gate verdict == stats-derived verdict
    val stats = TextAnalysis.dupUnitStats(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3) <= 3000 && r.getLong(6) <= 2000)).toMap
    rows.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(stats(id) == kept.contains(id), s"gate/stats drift on doc $id")
    }
  }

  test("host cap: global n smallest per host survive the partition-local pre-prune") {
    import spark.implicits._
    // ids deliberately scattered so every partition holds candidates from
    // every host: the pre-prune is lossless only if the union of
    // per-partition top-n contains the global top-n
    val rows = (0L until 400L).map { i =>
      val host = s"h${i % 7}.example"
      (i, s"https://$host/doc/$i")
    }
    val df = spark.createDataFrame(rows).toDF("doc_id", "url")
      .repartition(8) // round-robin: hosts spread across partitions
    val got = HostCap.capIds(df, "doc_id", "url", n = 3)(spark)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // .toSeq before flatMap: flatMapping a Map with tuple results rebuilds
    // a Map and silently keeps one pair per host
    val want = rows.groupBy(_._2.split("/")(2)).toSeq.flatMap { case (h, rs) =>
      rs.map(_._1).sorted.take(3).map(h -> _)
    }.toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
    // full-table cap keeps every column and exactly the winner rows
    val full = HostCap.cap(df, "doc_id", "url", n = 3)(spark)
    assert(full.columns.toSeq == Seq("doc_id", "url"))
    assert(full.select("doc_id").collect().map(_.getLong(0)).toSet ==
      want.map(_._2))
  }

  test("host cap: a dominating host is capped like any other; cap larger than host size keeps all") {
    import spark.implicits._
    // one host owns 90% of rows (the mega-host case the operator exists for)
    val rows = (0L until 200L).map { i =>
      val host = if (i % 10 < 9) "mega.example" else s"tail${i % 10}.example"
      (i, s"https://$host/p/$i")
    }
    val df = spark.createDataFrame(rows).toDF("doc_id", "url").repartition(6)
    val got = HostCap.capIds(df, "doc_id", "url", n = 4)(spark)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byHost = got.groupBy(_._1)
    assert(byHost("mega.example").map(_._2).sorted.toSeq ==
      rows.filter(_._2.contains("mega")).map(_._1).sorted.take(4))
    // tail9.example has 20 rows → capped at 4; every host respects the cap
    byHost.foreach { case (h, g) => assert(g.length <= 4, s"$h over cap") }
    // cap larger than any host's size keeps everything
    assert(HostCap.capIds(df, "doc_id", "url", n = 1000)(spark).count() == 200)
    intercept[IllegalArgumentException] {
      HostCap.capIds(df, "doc_id", "url", n = 0)(spark)
    }
    // fractional rank columns fail fast instead of silently truncating to 0
    val frac = df.withColumn("score", col("doc_id") / 7.0)
    intercept[IllegalArgumentException] {
      HostCap.capIds(frac, "score", "url", n = 4)(spark)
    }
  }

  test("host cap: duplicate id values count once toward the cap; cap keeps all their rows") {
    import spark.implicits._
    // ids 0..9 on one host, each row TRIPLED and scattered: the cap must
    // still admit ids 0,1,2 (not 0,0,0), and cap() must keep all 3 rows of
    // each winning id
    val rows = (0L until 10L).flatMap(i =>
      Seq.fill(3)((i, s"https://dup.example/p/$i")))
    val df = spark.createDataFrame(rows).toDF("doc_id", "url").repartition(5)
    val winners = HostCap.capIds(df, "doc_id", "url", n = 3)(spark)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(winners == Seq(0L, 1L, 2L), s"got $winners")
    val full = HostCap.cap(df, "doc_id", "url", n = 3)(spark).collect()
    assert(full.length == 9, s"expected 3 rows x 3 winning ids, got ${full.length}")
    assert(full.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
  }
}
