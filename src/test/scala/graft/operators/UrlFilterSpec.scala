package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** URL blocklist gate: suffix-walk semantics + Spark filter. */
class UrlFilterSpec extends AnyFunSuite {

  private def bl(rows: (String, String)*): UrlFilter.Blocklist =
    UrlFilter.compile(rows)

  test("whole-domain block covers the domain and every subdomain") {
    val b = bl(("ads.example", null))
    assert(b.blocked("https://ads.example/"))
    assert(b.blocked("https://ads.example/x?q=1"))
    assert(b.blocked("https://cdn.ads.example/img.png"))
    assert(b.blocked("https://a.b.cdn.ads.example/"))
    assert(!b.blocked("https://example/"))
  }

  test("label boundary: badads.example is NOT under ads.example") {
    val b = bl(("ads.example", null))
    assert(!b.blocked("https://badads.example/"))
    assert(!b.blocked("https://ads.example.org/"))
  }

  test("trailing root label cannot evade the list (either side)") {
    val b = bl(("ads.example", null))
    assert(b.blocked("https://ads.example./x"))      // FQDN host form
    assert(b.blocked("https://cdn.ads.example./x"))
    assert(b.blocked("https://ads.example../x"))     // degenerate extra dots
    val entryDotted = bl(("ads.example.", null))     // dotted entry normalizes
    assert(entryDotted.blocked("https://ads.example/x"))
  }

  test("path prefix blocks only that subtree, walks subdomains too") {
    val b = bl(("example.com", "/forum/"))
    assert(b.blocked("https://example.com/forum/t/1"))
    assert(b.blocked("https://www.example.com/forum/"))
    assert(!b.blocked("https://example.com/blog/"))
    assert(!b.blocked("https://example.com/forumx")) // prefix is /forum/
    // prefix matches path+query as robots matching input
    assert(b.blocked("https://example.com/forum/?page=2"))
  }

  test("authority ends at '?'/'#': query/fragment slashes are not the path") {
    val b = bl(("example.com", "/forum/"))
    // real path is "/" — the '/forum/' inside query/fragment must not match
    assert(!b.blocked("https://example.com?x=/forum/t"))
    assert(!b.blocked("https://example.com#/forum/"))
    // but a query rides along when there IS a matching path
    assert(b.blocked("https://example.com/forum/x#/sec"))
    // query-only url still matches a query-shaped prefix
    val q = bl(("example.com", "/?session="))
    assert(q.blocked("https://example.com?session=abc"))
    assert(!q.blocked("https://example.com/page?session=abc"))
  }

  test("multiple entries per domain union; whole-domain subsumes prefixes") {
    val b = bl(("e.com", "/a/"), ("e.com", "/b/"))
    assert(b.blocked("https://e.com/a/x") && b.blocked("https://e.com/b/"))
    assert(!b.blocked("https://e.com/c/"))
    val whole = bl(("e.com", "/a/"), ("e.com", null))
    assert(whole.blocked("https://e.com/zzz"))
  }

  test("host normalization: case, port, userinfo; unparseable urls kept") {
    val b = bl(("Ads.Example", null))
    assert(b.blocked("https://ADS.EXAMPLE:8080/x"))
    assert(b.blocked("https://user:pw@ads.example/x"))
    assert(!b.blocked(null))
    assert(!b.blocked("/relative/path"))
    assert(!b.blocked("no scheme at all"))
  }

  test("empty-domain rows ignored; empty prefix means whole domain") {
    val b = bl(("", "/x"), (null, null), ("e.com", ""))
    assert(b.blocked("https://e.com/anything"))
    assert(!b.blocked("https://f.com/x"))
  }

  test("Spark filter: broadcast gate, output schema intact, guard trips") {
    val spark = graft.pipeline.SparkEnv.session("local[2]", "graft-urlfilter-test",
      shufflePartitions = 4)
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      val pages = Seq(
        (1L, "https://keep.example/a"),
        (2L, "https://blocked.example/a"),
        (3L, "https://sub.blocked.example/a"),
        (4L, "https://keep.example/forum/t"),
        (5L, "https://prefix.example/forum/t"),
        (6L, "https://prefix.example/ok"),
        (7L, null: String)
      ).toDF("id", "url")
      val blDf = Seq(("blocked.example", null: String),
        ("prefix.example", "/forum/")).toDF("domain", "path_prefix")
      val kept = UrlFilter.filterBlocked(pages, blDf)
      assert(kept.columns.toSeq == Seq("id", "url"))
      assert(kept.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 6L, 7L))
      val e = intercept[IllegalArgumentException] {
        UrlFilter.filterBlocked(pages, blDf, maxRows = 1)
      }
      assert(e.getMessage.contains("blocklist too large"))
    } finally spark.stop()
  }
}
