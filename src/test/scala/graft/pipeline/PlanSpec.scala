package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-plan quality gates (SURVEY.md §4.2): filters and column pruning
  * must reach the parquet scan, small joins must broadcast, and the
  * extraction pipeline must contain exactly the one intended shuffle before
  * the parse stage. `.explain` output is asserted, not eyeballed.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkEnv.session("local[4]", "graft-plan-test", shufflePartitions = 8)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private lazy val tmp = {
    val t = Files.createTempDirectory("graft-plan").toString
    SynthCorpusJob.write(spark, 200, s"$t/pages", partitions = 2)
    t
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pre-parse filters are pushed down to the parquet scan") {
    import spark.implicits._
    val df = spark.read.parquet(s"$tmp/pages")
      .select($"url", $"html")
      .filter($"html".isNotNull && length($"url") > 0)
    val plan = planOf(df)
    assert(plan.contains("IsNotNull(html)") && plan.contains("PushedFilters: ["),
      s"no pushdown in:\n$plan")
  }

  test("column pruning: parse-input scan reads only url and html") {
    import spark.implicits._
    val df = spark.read.parquet(s"$tmp/pages").select($"url", $"html")
    val plan = planOf(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("html"))
    assert(!readSchema.contains("warc_ts") && !readSchema.contains("lang"),
      s"scan reads pruned columns: $readSchema")
  }

  test("extraction pipeline has exactly one exchange before the parse stage") {
    import spark.implicits._
    val bucketed = spark.read.parquet(s"$tmp/pages")
      .select($"url", $"html")
      .withColumn("bucket", ExtractPipeline.bucketCol($"url", 16, 8, 0))
      .repartition(16, $"bucket")
    val parsed = ExtractPipeline.parseStage(bucketed)(spark)
    val plan = planOf(parsed.toDF())
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 shuffle, found $exchanges:\n$plan")
    assert(plan.contains("MapPartitions"), "typed parse stage missing")
  }

  test("parse pipelines into the write's result stage (no exchange after it)") {
    // Metrics-accumulator consistency is load-bearing on this shape
    // (ExtractPipeline.BucketMetricsAcc doc): parse must sit in the WRITE
    // job's result stage, i.e. the only exchange is the bucket repartition
    // BELOW the typed stage. The plan tree prints root-first, so
    // MapPartitions appearing before Exchange means the exchange feeds it.
    import spark.implicits._
    val extracted = spark.read.parquet(s"$tmp/pages")
      .select($"url", $"html")
      .withColumn("bucket", ExtractPipeline.bucketCol($"url", 16, 8, 0))
      .repartition(16, $"bucket")
      .select($"bucket", $"url", $"html")
      .as[(Int, String, Array[Byte])]
      .mapPartitions { rows =>
        val engine = new graft.htmlx.HtmlParser.Engine
        rows.map { case (b, url, html) => (b, ExtractPipeline.parseOne(url, html, engine)) }
      }
      .select($"_2.*", $"_1".as("bucket"))
    val plan = planOf(extracted)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly the bucket shuffle, found $exchanges:\n$plan")
    val mpIdx = plan.indexOf("MapPartitions")
    val exIdx = plan.indexOf("Exchange")
    assert(mpIdx >= 0 && exIdx >= 0 && mpIdx < exIdx,
      s"exchange must be BELOW the parse stage (parse in the result stage):\n$plan")
  }

  test("IVF cell assignment never shuffles the corpus (VERDICT r02 #2)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("nid"),
        transform(col("embedding"), _.cast("double")).as("nvec"))
    val cents = emb.filter($"nid" < 16)
      .select($"nid".as("cid"), $"nvec".as("cvec"))
    val assigned = graft.operators.Similarity.assignCells(emb, cents)
    val plan = planOf(assigned)
    assert(plan.contains("vec_argmax_cos"), s"argmax kernel missing:\n$plan")
    assert(!plan.contains("Window"),
      s"r2's window-argmax is back — corpus-wide shuffle:\n$plan")
    assert(!plan.contains("hashpartitioning(nid"),
      s"corpus rows are being hash-shuffled for assignment:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroid array should ride a broadcast:\n$plan")
  }

  test("robots gate never shuffles the corpus (VERDICT r03 #1)") {
    import spark.implicits._
    val pages = spark.read.parquet(s"$tmp/pages").select($"url")
    val robots = Seq(("host-1.example", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    // broadcast path: compiled rules ride the task closure — the corpus
    // plan must contain NO exchange at all (scan → narrow typed filter)
    val plan = planOf(graft.operators.Robots.filterAllowed(pages, robots, "graftbot"))
    assert(!plan.contains("Exchange"),
      s"broadcast robots gate must be a narrow pass:\n$plan")
    assert(!plan.contains("hashpartitioning(__host"),
      s"raw-host hash partitioning is the r03 skew-killer:\n$plan")
    // VERDICT r04 #1: the gate must read ONLY the url column through the
    // native predicate — a typed Row filter deserializes every corpus
    // column (html payload included) and breaks whole-stage codegen
    assert(!plan.contains("DeserializeToObject") && !plan.contains("SerializeFromObject"),
      s"robots gate inserts a serialization boundary on the corpus branch:\n$plan")
    assert(plan.contains("robots_allowed"),
      s"native robots_allowed predicate missing from the plan:\n$plan")
  }

  test("robots join path salts the host key (no raw-host exchange)") {
    import spark.implicits._
    val pages = spark.read.parquet(s"$tmp/pages").select($"url")
    val robots = Seq(("host-1.example", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    val df = graft.operators.Robots.filterAllowedJoin(
      pages, robots, "graftbot", saltBuckets = 8)
    val plan = planOf(df)
    // every hash exchange that involves __host must also carry __salt —
    // a 30%-heavy host then spreads over saltBuckets tasks
    val rawHost = plan.linesIterator.filter(l =>
      l.contains("hashpartitioning(") && l.contains("__host") &&
        !l.contains("__salt"))
    assert(rawHost.isEmpty,
      s"exchange partitions on raw __host without salt:\n$plan")
    df.count() // and it still computes
  }

  test("url blocklist gate: narrow native predicate, zero corpus exchange") {
    import spark.implicits._
    val pages = spark.read.parquet(s"$tmp/pages").select($"url")
    val bl = Seq(("host-1.example", null: String), ("heavy.example", "/doc/4"))
      .toDF("domain", "path_prefix")
    val plan = planOf(graft.operators.UrlFilter.filterBlocked(pages, bl))
    assert(!plan.contains("Exchange"),
      s"blocklist gate must be a narrow pass over the scan:\n$plan")
    assert(!plan.contains("DeserializeToObject") && !plan.contains("SerializeFromObject"),
      s"blocklist gate inserts a serialization boundary on the corpus branch:\n$plan")
    assert(plan.contains("url_allowed"),
      s"native url_allowed predicate missing from the plan:\n$plan")
  }

  test("snapshot dedup: broadcast mode never shuffles the corpus; bloom mode has no join at all") {
    import spark.implicits._
    // parquet-backed docs: a LocalRelation would let the optimizer evaluate
    // the whole narrow probe at plan time and hide the shape under test
    (0L until 40L).map(i => (i, s"document number $i text"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/snapdocs")
    val docs = spark.read.parquet(s"$tmp/snapdocs")
    val prior = (0L until 10L).map(i => s"document number ${i * 2} text").toDF("text")
    val bPlan = planOf(graft.operators.Dedup.againstSnapshot(
      docs, "doc_id", "text", prior, "text", mode = "broadcast"))
    assert(bPlan.contains("BroadcastHashJoin"),
      s"prior digests must ride a broadcast join:\n$bPlan")
    val corpusShuffle = bPlan.linesIterator.filter(l =>
      l.contains("hashpartitioning(") && l.contains("doc_id"))
    assert(corpusShuffle.isEmpty,
      s"broadcast snapshot dedup shuffles the corpus:\n$bPlan")
    val blPlan = planOf(graft.operators.Dedup.againstSnapshot(
      docs, "doc_id", "text", prior, "text", mode = "bloom"))
    assert(!blPlan.contains("Join") && !blPlan.contains("Exchange"),
      s"bloom mode must be a narrow probe with no join or exchange:\n$blPlan")
    assert(blPlan.contains("bloom_might_contain"),
      s"native bloom probe missing from the plan:\n$blPlan")
  }

  test("lm likelihood: hot vocabulary broadcasts, cold tail shuffles") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"the of and w$i common words here"))
      .toDF("doc_id", "text")
    val df = graft.operators.TextAnalysis.unigramLikelihood(docs, "doc_id", "text",
      hotWords = 4)
    val plan = planOf(df)
    // the frequency-split join: heavy (stopword) keys must ride an INNER
    // broadcast join (the anti-join that builds the cold set is also a
    // broadcast — requiring Inner keeps this gate non-vacuous) — a plain
    // equi-join on the word would hand the heaviest word's partition a
    // corpus-scale task
    assert(plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("Inner")),
      s"hot-vocabulary scoring join must broadcast (Inner):\n$plan")
    df.count() // and it computes
  }

  test("q3 join broadcasts the filtered customer dimension") {
    val df = graft.SparkEntry.queriesForPlanCheck("q3_top10")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"no broadcast join in q3 plan:\n$plan")
  }

  test("whole-stage codegen covers the relational queries") {
    val df = graft.SparkEntry.queriesForPlanCheck("q1_agg")(spark, "/root/testdata/sf0.001")
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen spans in:\n$plan")
  }

  test("dedup exact plan uses partial (map-side) aggregation") {
    val df = graft.operators.Dedup.exact(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id", "text")
    val plan = planOf(df)
    // two HashAggregate nodes around one Exchange = partial + final
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate:\n$plan")
  }

  /** Total shuffle-write bytes of `job`, observed via a task-metrics
    * listener (polled until the listener bus drains). */
  private def shuffleWriteBytes(job: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      job
      // listener events are async: poll until the count stabilizes
      var prev = -1L
      var spins = 0
      while (bytes.get() != prev && spins < 50) {
        prev = bytes.get(); Thread.sleep(100); spins += 1
      }
      bytes.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bucketed tables join without a shuffle (co-located join path)") {
    // the write-time bucketing lever for 100 TB joins: two tables bucketed
    // on the join key by the same function sort-merge-join with NO exchange
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    val docs = s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/bk_a").mode("overwrite").saveAsTable("bk_a")
    docs.selectExpr("doc_id", "n_chars").write.bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/bk_b").mode("overwrite").saveAsTable("bk_b")
    val joined = s2.table("bk_a").join(s2.table("bk_b"), "doc_id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    // the runtime half of the skew story (write-time salting is gated
    // above): a 1-hot-key join re-planned by AQE's skew-join handling
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    import s2.implicits._
    // 200k rows on ONE key + 10k spread over 1000 keys, joined to a dim
    val skewed = s2.range(0, 210000).select(
      when($"id" < 200000, lit(7L)).otherwise($"id" % 1000).as("k"),
      concat(lit("payload-payload-payload-"), $"id").as("v"))
    val dim = s2.range(0, 1000).select($"id".as("k"), concat(lit("d"), $"id").as("d"))
    val joined = skewed.join(dim, "k")
    // count()/write would execute a DIFFERENT QueryExecution; collect()
    // materializes this Dataset's own plan so the AQE result is final
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE skew-join split in final plan:\n${plan.take(3000)}")
  }

  test("URL dedup: one hash exchange on the short canon key, partial agg") {
    import spark.implicits._
    val pages = spark.read.parquet(s"$tmp/pages").select($"url", $"warc_ts")
      .withColumn("doc_id", monotonically_increasing_id())
    val df = graft.operators.Dedup.byUrl(pages, "doc_id", "url", "warc_ts")
    val plan = planOf(df)
    val hashEx = plan.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly 1 hash exchange:\n$plan")
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2 ||
      plan.linesIterator.count(_.contains("SortAggregate")) >= 2,
      s"expected partial + final aggregation:\n$plan")
    // the shuffled row carries canon/ts/id only, never html/text
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(!plan.substring(exIdx, math.min(plan.length, exIdx + 400)).contains("html"),
      "page bytes must not reach the URL-dedup shuffle")
  }

  test("exact dedup shuffles digests, not document text (VERDICT r01 #6)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // round-1 formulation: the text column rides along as a group key
    val textCarrying = docs.groupBy(xxhash64(col("text")).as("h"), col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("copies"))
    val oldBytes = shuffleWriteBytes(textCarrying.count())
    val newBytes = shuffleWriteBytes(
      graft.operators.Dedup.exact(docs, "doc_id", "text").count())
    assert(newBytes > 0, "expected at least one shuffle in exact dedup")
    assert(newBytes * 4 < oldBytes,
      s"digest-only grouping should shuffle <1/4 of the text-carrying bytes " +
        s"(old=$oldBytes new=$newBytes)")
  }

  test("chunk plan never runs a global (unpartitioned) window") {
    implicit val s: SparkSession = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val windows =
      try {
        val df = graft.operators.Packing.chunkPlan(docs, "doc_id", col("n_chars"), 64)
        df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(windows.nonEmpty, "expected a window in the chunk plan")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window = whole corpus in ONE task at 100 TB:\n$w")
    }
  }

  test("composed e2e job: corpus text/html crosses at most two exchanges pre-sink (VERDICT r04 #1)") {
    import spark.implicits._
    // tiny deterministic fixture (ids shaped to hit every gate class)
    val docs = (0L until 120L).map { i =>
      (i, (0 until 30).map(j => s"w${(i * 7 + j * 3) % 19}").mkString(" "),
        s"src${i % 4}")
    }.toDF("doc_id", "text", "source")
    val work = Files.createTempDirectory("graft-e2e-plan").toString
    graft.pipeline.E2EPipeline.writeWarcSegments(spark, docs, s"$work/warc", segments = 4)
    def corpusExchanges(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.output.exists(a => a.name == "text" || a.name == "html") => e
      }
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the discipline the composed job exists to prove: corpus bytes cross
      // the wire exactly twice up to the stage-boundary materialization
      // (bucket salt + ONE doc_id partitioning)...
      var boundary = -1
      var dedupBoundary = -1
      // prior-crawl snapshot covering the %13 docs (the extracted-text
      // recipe): the snapshot gate must stay a broadcast verdict stage —
      // (id) rows only — on top of the same doc_id partitioning
      val prior = docs.filter(col("doc_id") % 13 === 0)
        .select(graft.pipeline.E2EPipeline
          .extractedTextOf(col("doc_id"), col("text")).as("text"))
      val surv = graft.pipeline.E2EPipeline.survivors(spark, s"$work/warc",
        graft.pipeline.E2EPipeline.robotsTable(spark),
        docs.select(col("doc_id"), col("source")), lmCut = 1000000000L,
        materialize = df => {
          boundary = corpusExchanges(df).size
          df.localCheckpoint(true)
        },
        materializeDedup = df => {
          dedupBoundary = corpusExchanges(df).size
          df.localCheckpoint(true)
        },
        priorSnapshot = Some(prior),
        keepLangs = Some(Seq("en", "und")))
      assert(boundary >= 0 && boundary <= 2,
        s"extract stage moves corpus text/html through $boundary exchanges (want ≤2)")
      // gate+line-dedup segment (extract snapshot → dedup snapshot): the
      // drop-set join-back reuses the doc_id partitioning, so corpus text
      // crosses ZERO further exchanges inside it
      assert(dedupBoundary == 0,
        s"gate+dedup stage moves corpus text through $dedupBoundary exchanges (want 0)")
      // ...and NEVER again: every id-keyed verdict stage downstream reuses
      // the snapshot's doc_id partitioning, so only verdict/drop-list rows
      // shuffle after the boundary
      val post = corpusExchanges(surv)
      assert(post.isEmpty,
        s"corpus text crosses ${post.size} exchanges after the stage " +
          s"boundary (want 0):\n${post.mkString("\n\n")}")
      assert(surv.count() > 0, "composed job must keep survivors on this fixture")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("host cap: text never enters the window; only 16-byte (host,id) pairs shuffle") {
    import spark.implicits._
    val docs = (0L until 300L).map { i =>
      (i, s"https://h${i % 5}.example/doc/$i", "x" * 200)
    }.toDF("doc_id", "url", "text")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val capped = graft.operators.HostCap.cap(docs, "doc_id", "url", n = 3)(spark)
      val exchanges = capped.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // text/url-bearing rows never shuffle: the winner set is computed
      // over (host, id) pairs and joins back broadcast (small) or id-hash
      val textBearing = exchanges.filter(_.output.exists(a =>
        a.name == "text" || a.name == "url"))
      assert(textBearing.isEmpty,
        s"corpus columns cross an exchange in HostCap:\n${textBearing.mkString("\n")}")
      // the per-host window consumes the PRE-PRUNED stream: a MapPartitions
      // (bounded per-partition top-n) sits below the window's host exchange
      val plan = capped.queryExecution.executedPlan.toString
      assert(plan.contains("Window") && plan.contains("MapPartitions"),
        s"expected pre-prune MapPartitions feeding the window:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("dup n-gram stats: hot duplicated shingles ride a broadcast semi-join (VERDICT r04 #2)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = planOf(graft.operators.Dedup.dupNgramStats(docs, "doc_id", "text"))
    // the Zipf-hot duplicated shingles must match through a BROADCAST
    // LeftSemi (hits) — and the probe side of the cold tail must be
    // broadcast-anti-filtered so hot keys never enter a shuffle
    assert(plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"hot-shingle hits must be a broadcast semi-join:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"cold probe side must be broadcast-anti-filtered of hot keys:\n$plan")
    // the doc-frequency aggregate keeps map-side combine (partial + final)
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation for shingle doc frequency:\n$plan")
    // document text itself never crosses any exchange (hash explode only)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exchanges = graft.operators.Dedup.dupNgramStats(docs, "doc_id", "text")
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      val textBearing = exchanges.filter(_.output.exists(_.name == "text"))
      assert(textBearing.isEmpty,
        s"corpus text crosses an exchange in dupNgramStats:\n${textBearing.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("substring dedup: text crosses at most one exchange, grams shuffle as hashes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges =
      try {
        graft.operators.Dedup.substringLevel(docs, "doc_id", "text", k = 3)
          .queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(exchanges.nonEmpty, "expected shuffles in substring dedup")
    val textBearing = exchanges.filter(_.output.exists(_.name == "text"))
    assert(textBearing.size <= 1,
      s"document text crosses ${textBearing.size} exchanges (want ≤1 — the " +
        s"drop-set join back to intact docs):\n${textBearing.mkString("\n")}")
  }

  test("line-level dedup: exploded lines never shuffle, doc text crosses at most one exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // exchanges are inserted by EnsureRequirements (executedPlan); AQE off
    // so the tree is directly collectible rather than adaptively wrapped
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges =
      try {
        val df = graft.operators.Dedup.lineLevel(docs, "doc_id", "text")
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(exchanges.nonEmpty, "expected shuffles in line dedup")
    // r5: the drop-list join is frequency-split — hot duplicated lines
    // (the 10⁹-occurrence cookie-banner class) match via broadcast
    val plan = graft.operators.Dedup.lineLevel(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hot duplicated-line join must broadcast:\n$plan")
    val lineBearing = exchanges.filter(_.output.exists(_.name == "u"))
    assert(lineBearing.isEmpty,
      s"exploded line text crosses an exchange — the corpus would shuffle " +
        s"line-by-line at 100 TB:\n${lineBearing.mkString("\n")}")
    val textBearing = exchanges.filter(_.output.exists(_.name == "text"))
    assert(textBearing.size <= 1,
      s"document text crosses ${textBearing.size} exchanges (want ≤1 — the " +
        s"drop-set join back to intact docs):\n${textBearing.mkString("\n")}")
  }

  test("c4 clean and dup-unit stats are narrow codegen'd passes (zero exchange)") {
    // parquet-backed so the optimizer can't constant-fold a LocalRelation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val c4Plan = planOf(graft.operators.TextAnalysis.c4Clean(docs, "doc_id", "text"))
    assert(!c4Plan.contains("Exchange"),
      s"c4Clean must be a free rider on the scan:\n$c4Plan")
    assert(!c4Plan.contains("DeserializeToObject") && !c4Plan.contains("SerializeFromObject"),
      s"c4Clean inserts a serialization boundary:\n$c4Plan")
    assert(c4Plan.contains("WholeStageCodegen") || c4Plan.contains("*("),
      s"c4Clean fell out of whole-stage codegen:\n$c4Plan")
    val duPlan = planOf(graft.operators.TextAnalysis.dupUnitStats(docs, "doc_id", "text"))
    assert(!duPlan.contains("Exchange"),
      s"dupUnitStats must be narrow — an explode+groupBy shape would " +
        s"shuffle a row per line at 100 TB:\n$duPlan")
    assert(!duPlan.contains("Generate"),
      s"dupUnitStats exploded the unit array instead of per-row sort-adjacency:\n$duPlan")
    assert(!duPlan.contains("DeserializeToObject") && !duPlan.contains("SerializeFromObject"),
      s"dupUnitStats inserts a serialization boundary:\n$duPlan")
  }
}
