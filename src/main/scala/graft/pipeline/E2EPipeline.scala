package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Decontamination, Dedup, Mixing, Packing, Robots, TextAnalysis, UrlFilter}
import graft.sources.{Warc, WarcSource, WetSink}

/** The COMPOSED end-to-end training-data job (VERDICT r04 "Next round" #1):
  * every operator the library ships, chained the way a production crawl
  * pipeline runs them —
  *
  * {{{
  * WARC segments → WarcSource.read → robots gate → URL blocklist gate
  *   → salted extract → prior-crawl snapshot dedup → language-ID gate
  *   → gopher rule gate → corpus-likelihood gate → line-level dedup
  *   → MinHash-LSH + connected components (survivor selection)
  *   → benchmark decontamination → mixture sampling → PII redaction
  *   → tokenizer chunk plan → WET sink
  * }}}
  *
  * Composition is where column collisions, plan blowup, and shuffle
  * accumulation appear; this job is the proof the 30+ oracle-green parts
  * are a pipeline, not a parts catalog. The `e2e_pipeline` driver query
  * runs it over deterministic WARC fixtures synthesized from the
  * `documents` table and a DuckDB oracle forward-models the ENTIRE chain —
  * surviving doc set, post-dedup text (byte-identical through the WET
  * write/read roundtrip), token counts, and global chunk offsets.
  *
  * 100 TB shuffle discipline — corpus text/html crosses exactly THREE
  * exchanges end-to-end (PlanSpec-gated):
  *   1. the salted bucket repartition feeding the parse stage (html);
  *   2. ONE doc_id repartition of the extracted text, immediately after
  *      extraction — every id-keyed stage downstream (likelihood verdict
  *      semi-join, line-dedup drop-set join-back, near-dup survivor
  *      anti-join, decontamination anti-join, source join for mixing)
  *      REUSES that partitioning: only the small verdict/drop-list sides
  *      shuffle, the text side never moves again;
  *   3. the final write (the WET sink consumes the stream in place).
  * Every verdict stage emits (id)-shaped rows, never text; the dedup
  * internals shuffle 8-byte hashes (their own PlanSpec gates).
  */
object E2EPipeline {

  val agent = "graftbot"

  /** Boilerplate line planted on every synthesized page: line-level dedup
    * must strip it from every document but the first surviving one — the
    * C4-style "same footer on every page of the site" case, exercised on
    * EVERY row instead of the corpus's handful of natural dup pairs. */
  val banner = "Subscribe to the newsletter today"

  /** Intra-document repetition plant: every doc_id % 37 == 3 page carries
    * this line TEN times (each as its own block → its own extracted line).
    * The Gopher duplicate-line gate ([[graft.operators.TextAnalysis
    * .dupUnitPass]], paper cuts 0.30 / 0.20) must drop exactly these pages
    * — 10 copies out of ~13 lines is a ~0.69 dup-line fraction, while
    * unplanted pages have all-distinct lines (fraction 0). The words are
    * outside every language-ID stop profile, so the plant never flips a
    * page's language verdict. */
  val repLine = "Limited time offer act now"
  val repCount = 10

  /** Near-duplicate planting for the fuzzy-dedup stage: docs with
    * doc_id % 101 ∈ {99, 100} become near-copies of the SAME base doc
    * (id − 1 / id − 2, i.e. base % 101 = 98) when the base has ≥ 40
    * space-separated words — a one-word suffix keeps Jaccard ≥ ~0.84 at
    * the 3-shingle level, safely above the 0.8 verify threshold and deep
    * enough into the 16-band LSH's catch zone that candidate recall is
    * exact on these fixed corpora (verified at all three SFs). Triples
    * {base, base+1, base+2} also exercise transitivity in the
    * connected-components stage. Word-count eligibility keeps short bases
    * out of the fuzzy boundary where J would straddle the threshold. */
  def plantNearDups(docs: DataFrame): DataFrame = {
    val bases = docs
      .filter(size(split(col("text"), " ", -1)) >= 40)
      .select(col("doc_id").as("__bid"), col("text").as("__btext"))
    docs
      .withColumn("__base",
        when(col("doc_id") % 101 === 99, col("doc_id") - 1)
          .when(col("doc_id") % 101 === 100, col("doc_id") - 2))
      .join(bases, col("__base") === col("__bid"), "left")
      .select(col("doc_id"),
        when(col("__btext").isNotNull,
          concat(col("__btext"),
            when(col("doc_id") % 101 === 99, lit(" duplicateone"))
              .otherwise(lit(" duplicatetwo"))))
          .otherwise(col("text")).as("text"),
        col("source"))
  }

  /** Per-host robots fixture (rule class keyed on host number, like the
    * robots_filter query): heavy.example throttles URLs ending in 2 via a
    * wildcard anchor (heavy doc ids satisfy id % 10 < 3, so their paths
    * end in 0/1/2 — an anchor digit outside that set would make the rule
    * vacuous and leave wildcard matching unexercised in the composed
    * job); every 4th numbered host denies everything; every 4th+1 serves
    * an allow-all; the rest serve no robots.txt (allowed per RFC 9309
    * §2.3.1). */
  def robotsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = (0 until 97).flatMap { n =>
      val host = s"host-$n.example"
      n % 4 match {
        case 0 => Some((host, "User-agent: *\nDisallow: /\n"))
        case 1 => Some((host, "User-agent: *\nDisallow:\n"))
        case _ => None
      }
    } :+ (("heavy.example", "User-agent: *\nDisallow: /*2$\n"))
    rows.toDF("host", "robots_txt")
  }

  /** PII paragraph planted on every doc_id % 29 == 5 page (one email + one
    * phone, both shaped to the [[graft.operators.TextAnalysis.redactPii]]
    * patterns): the composed job's redaction stage must scrub exactly these
    * and nothing else — exercised on ~3% of rows instead of zero. */
  val piiPrefix = "Contact me at agent"
  val piiSuffix = "@mail.example or 555-123-4567 right away"
  def piiLine(id: Long): String = s"$piiPrefix$id$piiSuffix"

  /** The page recipe's known extracted text, as a column: title line +
    * article text + the %29==5 PII line + banner — what
    * [[writeWarcSegments]]' pages extract to. The prior-snapshot fixtures
    * synthesize "last month's kept set" from THIS helper so the recipe
    * exists once; a recipe change that forgot one copy would silently
    * stop the %13 docs matching the prior and fail the equivalence run
    * with a confusing survivor diff. */
  def extractedTextOf(id: Column, text: Column): Column =
    concat(lit("Synthetic corpus document number "), id, lit("\n"), text,
      when(id % 37 === 3, lit(("\n" + repLine) * repCount)).otherwise(lit("")),
      when(id % 29 === 5,
        concat(lit("\n" + piiPrefix), id, lit(piiSuffix))).otherwise(lit("")),
      lit("\n" + banner))

  /** Bump when [[writeWarcSegments]]' page/record recipe changes — part of
    * the fixture-cache marker name. */
  val fixtureVersion = "v4"

  /** Deterministic WARC fixture segments: docs grouped by doc_id % segments,
    * sorted within a segment, one WARC/1.0 file per segment (member-gzip on
    * odd segments), written via temp + rename so reruns are idempotent.
    * Page bytes and record headers are pure functions of (doc_id, text). */
  def writeWarcSegments(spark: SparkSession, docs: DataFrame, outDir: String,
                        segments: Int = 8): Unit = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // segment content is a pure function of (docs, segments, fixture
    // version): a completed fixture (marker present) is reused across
    // verify/bench invocations. The marker carries a CONTENT fingerprint
    // of the docs input (order-insensitive hash-xor; a sum would overflow
    // Long under ANSI mode) plus a version bumped
    // with the fixture logic — a regenerated corpus at the same path, or a
    // changed banner/page recipe, invalidates the cache instead of
    // silently serving stale WARC bytes to the engine side while the
    // oracle forward-models the new corpus.
    val Array(fpRow) = docs
      .agg(bit_xor(xxhash64(col("doc_id"), col("text"))), count(lit(1))).collect()
    val fp = java.lang.Long.toHexString(
      (if (fpRow.isNullAt(0)) 0L else fpRow.getLong(0)) ^ fpRow.getLong(1))
    val marker = new org.apache.hadoop.fs.Path(
      s"$outDir/_DONE-$fixtureVersion-$segments-$fp")
    val mfs = marker.getFileSystem(conf.value)
    if (mfs.exists(marker)) return
    // marker absent/mismatched: clear the WHOLE fixture dir before
    // regenerating — per-segment rename only replaces residue classes the
    // NEW corpus populates, so a shrunk/re-sharded corpus would leave old
    // segment files (and stale markers) for WarcSource.read to ingest as
    // ghost documents the oracle doesn't model
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    mfs.delete(outPath, true)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 % segments)
      .mapGroups { (seg, it) =>
        val rows = it.toArray.sortBy(_._1)
        val recs = rows.map { case (id, t) =>
          val iso = java.time.format.DateTimeFormatter.ISO_INSTANT
            .format(SynthCorpus.warcTs(id).toInstant)
          // the banner rides as its OWN <p> block inside the article: the
          // extractor emits block boundaries as newlines (inline text
          // newlines are whitespace per HTML), so the extracted text gains
          // a deduplicatable banner LINE on every page; %29==5 pages also
          // carry a PII paragraph the redaction stage must scrub
          val rep = if (id % 37 == 3) s"<p>$repLine</p>" * repCount else ""
          val pii = if (id % 29 == 5) s"<p>${piiLine(id)}</p>" else ""
          val html = SynthCorpus.pageHtml(id, t).replace("</article></main>",
            s"$rep$pii<p>$banner</p></article></main>")
          (SynthCorpus.url(id), iso, html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        val bytes = Warc.buildFile(recs.toSeq, gzipPerRecord = seg % 2 == 1)
        val path = new org.apache.hadoop.fs.Path(f"$outDir/segment-$seg%03d.warc")
        val tmp = new org.apache.hadoop.fs.Path(
          f"$outDir/.segment-$seg%03d.warc.${java.util.UUID.randomUUID()}.tmp")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        fs.delete(path, false)
        if (!fs.rename(tmp, path)) {
          fs.delete(tmp, false)
          throw new java.io.IOException(s"rename $tmp -> $path failed")
        }
        seg
      }
      .collect()
    mfs.create(marker, true).close()
  }

  /** https://host/doc/N from the id — the SynthCorpus.url formula as a
    * column (host_stats oracle model). */
  def urlOf(id: Column): Column =
    concat(lit("https://"),
      when(pmod(id, lit(10)) < 3, lit("heavy.example"))
        .otherwise(concat(lit("host-"), pmod(id, lit(97)), lit(".example"))),
      lit("/doc/"), id)

  /** The production lineage: WARC dir + robots + (doc_id → source) lookup
    * → the final mixed training stream (doc_id, url, text), ready for
    * [[graft.sources.WetSink.write]] / [[graft.operators.Packing.chunkPlan]].
    * `lmCut` bounds the corpus-likelihood score (docs scoring above it are
    * stopword-soup outliers, CCNet-style).
    *
    * `materialize` is the EXTRACT stage-boundary hook, applied exactly
    * once, to the extracted+repartitioned stream: the gate chain
    * downstream branches over that stream many times (every verdict stage
    * joins back to it), so without a boundary the WARC-read+parse lineage
    * would re-execute once per branch — the plan-blowup failure mode
    * composition exists to surface. Production passes a write-then-read
    * of the extracted lake table (exactly [[ExtractPipeline.run]]'s
    * commit point); the default localCheckpoint is the in-session
    * equivalent (executor-local blocks: fast, not fault-tolerant — same
    * caveat as connectedComponents' default). The snapshot preserves the
    * doc_id partitioning, so every id-keyed join downstream still
    * shuffles only its verdict side.
    *
    * `materializeDedup` is the second, SEPARATE boundary hook, applied
    * exactly once to the post-line-dedup stream (production: the dedup
    * stage's lake table). A separate parameter — not a second call to
    * `materialize` — so a hook with applied-once semantics (a fixed
    * lake-table path, a plan-inspection probe) composes correctly. */
  /** `priorSnapshot`, when supplied, is the PRIOR crawl's kept extracted
    * texts (one `text` column): every current doc whose extracted text the
    * prior already holds is dropped immediately after extraction — the
    * monthly-recrawl incremental-dedup rule, the first gate past the
    * extract boundary ([[Dedup.againstSnapshot]] broadcast mode: (id)
    * verdicts, the text side never moves; it must sit AFTER the boundary
    * because its drop side derives from the stream itself — inside one
    * action the self-referential branch would execute the extraction
    * lineage twice). */
  /** `keepLangs`, when supplied, gates on the n-gram language-ID heuristic
    * ([[TextAnalysis.langId]]) — the CCNet/C4 "keep the target languages"
    * rule. Applied BEFORE the extract stage boundary (production writes
    * per-language lake tables at the extraction commit, CCNet-style): the
    * predicate is narrow either way, but between the boundaries it would
    * re-execute once per downstream action — the composed-job lineage-
    * re-execution failure mode this file documents at `materializeDedup`
    * (measured: moving it inside the boundary halved the composed job). */
  def survivors(spark: SparkSession, warcDir: String, robots: DataFrame,
                sources: DataFrame, lmCut: Long,
                materialize: DataFrame => DataFrame = _.localCheckpoint(true),
                materializeDedup: DataFrame => DataFrame = _.localCheckpoint(true),
                blocklist: Option[DataFrame] = None,
                priorSnapshot: Option[DataFrame] = None,
                keepLangs: Option[Seq[String]] = None): DataFrame = {
    val pages = WarcSource.read(spark, warcDir)
    // RFC 9309 gate: broadcast-compiled rules, narrow native predicate;
    // then the UT1-style URL blocklist gate when one is supplied — both
    // are zero-exchange url-column predicates, free riders on the scan
    val robotsAdmitted = Robots.filterAllowed(pages, robots, agent)
    val admitted = blocklist.fold(robotsAdmitted)(bl =>
      UrlFilter.filterBlocked(robotsAdmitted, bl))
    // salted extraction: exchange #1 (html)
    val bucketed = admitted
      .withColumn("bucket", ExtractPipeline.bucketCol(col("url"), 32, 16, 0))
      .repartition(32, col("bucket"))
    val extracted = ExtractPipeline.parseStage(bucketed)(spark)
      .filter(col("ok"))
      .withColumn("doc_id", regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
      .select(col("doc_id"), col("text"))
    // language gate: narrow argmax over stopword profiles, a free rider
    // on the extraction stage — INSIDE the boundary, so it runs once
    val langed = keepLangs.fold(extracted)(ls =>
      extracted.filter(TextAnalysis.langId(col("text")).isin(ls: _*)))
    // exchange #2 (text): ONE doc_id partitioning reused by every id-keyed
    // stage below — their joins only ever shuffle the verdict side
    val stream = materialize(langed.repartition(col("doc_id")))
    // incremental cross-snapshot dedup against the prior crawl's kept
    // texts (when provided) — exact broadcast mode, (id)-shaped verdicts
    val fresh = priorSnapshot.fold(stream) { pr =>
      val drop = Dedup.againstSnapshot(stream, "doc_id", "text", pr, "text",
          mode = "broadcast")
        .filter(col("in_prior")).select(col("doc_id"))
      stream.join(drop, Seq("doc_id"), "left_anti")
    }
    // Gopher rule battery, inline and narrow (no feature join-back);
    // minRequiredStops=0: the synthetic vocabulary carries no stop words.
    // The duplicate-line repetition legs (Gopher Table A1: dup-line
    // fraction ≤ 0.30, dup-line CHAR fraction ≤ 0.20) ride in the same
    // narrow filter — they drop the %37==3 repetition-planted pages.
    val gated = fresh.filter(TextAnalysis.gopherPass(col("text"),
      minWords = 25, minRequiredStops = 0) &&
      TextAnalysis.dupUnitPass(col("text")))
    // corpus-likelihood gate: verdicts are (id) rows, semi-joined back
    val lm = TextAnalysis.unigramLikelihood(gated, "doc_id", "text")
    val lmKeep = lm.filter(col("lm_score_x1e6") <= lmCut)
      .select(col("id").as("doc_id"))
    val lmGated = gated.join(lmKeep, Seq("doc_id"), "left_semi")
    // line-level corpus dedup (strips the banner everywhere but its first
    // surviving occurrence); its join-back reuses the doc_id partitioning.
    // SECOND stage boundary: lineLevel REWRITES the text, and everything
    // downstream (minhash sketch + pair verify self-join, survivor
    // anti-join, decontamination, mixing) branches over the rewritten
    // stream across many separate actions — without a boundary each one
    // re-executes the gate+dedup lineage (exchange reuse only spans ONE
    // action), which measured ~3× the whole job's runtime at sf0.1.
    // Production materializes here too: the post-dedup stream is a lake
    // table (it IS the deliverable of the dedup stage).
    val ld = materializeDedup(Dedup.lineLevel(lmGated, "doc_id", "text")
      .select(col("doc_id"), col("text")))
    // near-dup survivor selection: LSH pairs → components → keep cluster min
    val pairs = Dedup.minhashDedup(ld, "doc_id", "text",
      threshold = 0.8, maxBucket = 1000000)(spark)
    val dupDrop = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("doc_id"))
    val uniq = ld.join(dupDrop, Seq("doc_id"), "left_anti")
    // benchmark decontamination: every 53rd surviving doc stands in for the
    // eval suite; overlapping docs (including the bench docs themselves —
    // self-overlap) are dropped
    val bench = uniq.filter(col("doc_id") % 53 === 0).select(col("text"))
    val decoDrop = Decontamination.flag(uniq, "doc_id", "text", bench, "text", k = 8)(spark)
      .filter(col("contaminated"))
      .select(col("id").as("doc_id"))
    val clean = uniq.join(decoDrop, Seq("doc_id"), "left_anti")
    // per-host anti-domination cap (CCNet/RefinedWeb): heavy.example owns
    // ~30% of every fixture corpus and is the only host the cap bites —
    // the production order is dedup → quality → cap → mix. Winner ids are
    // computed over narrow (host, id) pairs ([[graft.operators.HostCap]]'s
    // bounded pre-prune) and semi-join back on the stream's own doc_id
    // partitioning: corpus text still crosses zero post-boundary exchanges.
    val capped = graft.operators.HostCap.cap(
        clean.withColumn("url", urlOf(col("doc_id"))),
        "doc_id", "url", hostCapN)(spark)
      .drop("url")
    // mixture sampling by source (dims shuffle; the text side is already
    // partitioned on doc_id), oracle-replicable LCG hash
    val withSource = capped.join(sources, Seq("doc_id"))
    val lcg = pmod(col("doc_id") * lit(1103515245L) + lit(12345L), lit(2147483648L))
    // PII redaction is the LAST rewrite before the sink (the standard
    // publish-side rule: emails/phones never reach the training stream) —
    // a codegen'd regexp pair, narrow, identity on clean text
    Mixing.sampleBySource(withSource, "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), 0.125, lcg)
      .select(col("doc_id"), urlOf(col("doc_id")).as("url"),
        TextAnalysis.redactPii(col("text")).as("text"))
  }

  /** The equivalence-harness wrapper for the driver query: synthesize the
    * WARC fixtures, run [[survivors]], SNAPSHOT the surviving stream once
    * (localCheckpoint — the verification wrapper materializes it three
    * times: chunk plan, WET write, final join; production instead writes
    * the stream straight to the sink and is gated by PlanSpec on the pure
    * lineage), write WET segments, read them back, and return one row per
    * surviving doc with the WET-roundtripped text and its global chunk
    * offsets — everything the DuckDB oracle forward-models. */
  /** Default corpus-likelihood cut: ~p85 of the post-gopher score
    * distribution on the synthetic corpora (re-measured after the PII
    * plant and language gate shifted token frequencies: p85 = 27363–27426
    * across the three SFs) — drops the stopword-soup tail without
    * emptying the stream. Any constant is CORRECT (the oracle recomputes
    * it); this one keeps the gate non-vacuous at every SF. */
  val defaultLmCut = 27400L

  /** Per-host cap in the composed job: bites only heavy.example (~30% of
    * every fixture corpus, tail hosts hold ≲25 surviving docs each at
    * sf0.1) — big enough to keep the tail intact, small enough that the
    * anti-domination rule verifiably fires at every SF. */
  val hostCapN = 40

  /** URL blocklist fixture for the composed job: one whole-domain entry
    * (host-42 serves no robots.txt, so only this gate removes it) and a
    * path-prefix entry on the heavy host (/doc/2… ids). Both forward-
    * modeled in the oracle's admission clause. */
  def blocklistTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("host-42.example", null: String), ("heavy.example", "/doc/2"))
      .toDF("domain", "path_prefix")
  }

  def verified(spark: SparkSession, sfDir: String, lmCut: Long = defaultLmCut): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = plantNearDups(docs)
    // the fixture version is part of the PATH, not just the marker name:
    // two builds with different page recipes sharing one directory would
    // otherwise poison each other (build A's marker survives build B's
    // regeneration, so A then trusts B's segment bytes)
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_e2e_${math.abs(sfDir.hashCode)}_$fixtureVersion"
    writeWarcSegments(spark, planted, s"$work/warc")
    // prior-crawl fixture: the %13 docs' extracted texts, synthesized
    // INDEPENDENTLY of the job (title + article + banner line — the page
    // recipe's known extraction), standing in for last month's kept set
    val prior = planted.filter(col("doc_id") % 13 === 0)
      .select(extractedTextOf(col("doc_id"), col("text")).as("text"))
    val surv = survivors(spark, s"$work/warc", robotsTable(spark),
        docs.select(col("doc_id"), col("source")), lmCut,
        blocklist = Some(blocklistTable(spark)),
        priorSnapshot = Some(prior),
        keepLangs = Some(Seq("en")))
      .localCheckpoint(true)
    val plan = Packing.chunkPlan(surv, "doc_id",
        TextAnalysis.tokenCount(col("text")), tokensPerChunk = 64)(spark)
      .withColumnRenamed("id", "doc_id")
    val wetDir = new org.apache.hadoop.fs.Path(s"$work/wet")
    val fs = wetDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(wetDir, true) // stale segments from a wider previous run
    WetSink.write(surv.withColumn("warc_ts", lit(null).cast("timestamp")),
      s"$work/wet")
    val wet = WarcSource.readWet(spark, s"$work/wet")
      .withColumn("doc_id", regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
      .select(col("doc_id"), col("text"))
    plan.join(wet, Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("tokens"), col("chunks"),
        col("chunk_start"))
  }
}
