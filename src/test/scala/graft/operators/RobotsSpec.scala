package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Robots.{parse, patternMatches}

class RobotsSpec extends AnyFunSuite {

  test("pattern matching: prefix, wildcard, anchor") {
    assert(patternMatches("/", "/anything"))
    assert(patternMatches("/admin", "/admin/panel"))
    assert(!patternMatches("/admin", "/adm"))
    assert(patternMatches("/a*/c", "/a/b/c/d"))
    assert(patternMatches("/*.pdf", "/docs/x.pdf"))
    assert(patternMatches("/*.pdf$", "/docs/x.pdf"))
    assert(!patternMatches("/*.pdf$", "/docs/x.pdf?download=1"))
    assert(patternMatches("*", "/whatever"))
    assert(patternMatches("/a$", "/a"))
    assert(!patternMatches("/a$", "/ab"))
    // empty prefix matches everything — the "empty Disallow matches
    // nothing" rule lives in Rules.allowed, which skips empty patterns
    assert(patternMatches("", "/x"))
  }

  test("robots path input: authority ends at '?'/'#', query rides along") {
    val rules = Map("h.example" ->
      parse("User-agent: *\nDisallow: /forum/\n", "graftbot"))
    // query/fragment slashes are NOT the path — real path is "/"
    assert(Robots.urlAllowed(rules, "https://h.example?x=/forum/t"))
    assert(Robots.urlAllowed(rules, "https://h.example#/forum/"))
    assert(!Robots.urlAllowed(rules, "https://h.example/forum/t"))
    // query participates in matching when a path exists ($-anchored rules)
    val anchored = Map("h.example" ->
      parse("User-agent: *\nDisallow: /*.pdf$\n", "graftbot"))
    assert(!Robots.urlAllowed(anchored, "https://h.example/a.pdf"))
    assert(Robots.urlAllowed(anchored, "https://h.example/a.pdf?dl=1"))
  }

  test("longest match wins; allow wins ties; default allow") {
    val r = parse(
      """User-agent: *
        |Disallow: /private
        |Allow: /private/public
        |Disallow: /tmp/
        |""".stripMargin, "graftbot")
    assert(!r.allowed("/private/x"))
    assert(r.allowed("/private/public/x"))  // longer allow wins
    assert(r.allowed("/open"))
    assert(!r.allowed("/tmp/y"))
    assert(r.allowed("/tmp"))               // /tmp/ needs the slash
  }

  test("empty Disallow allows everything") {
    val r = parse("User-agent: *\nDisallow:\n", "graftbot")
    assert(r.allowed("/anything"))
  }

  test("specific agent group suppresses wildcard groups") {
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /no-bots
        |""".stripMargin
    val mine = parse(txt, "graftbot")
    assert(mine.allowed("/ok") && !mine.allowed("/no-bots/x"))
    val other = parse(txt, "otherbot")
    assert(!other.allowed("/ok"))  // falls to the * group: all disallowed
  }

  test("prefix matches respect product-token boundaries") {
    val txt =
      """User-agent: *
        |Allow: /
        |
        |User-agent: graftbot
        |Disallow: /x
        |""".stripMargin
    // sub-product fallback: graftbot-news matches the graftbot group
    assert(!parse(txt, "graftbot-news").allowed("/x/y"))
    // but a LONGER agent without the '-' boundary is a different token
    val partial = "User-agent: graft\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert(parse(partial, "graftbot").allowed("/anything"),
      "group 'graft' must not capture agent 'graftbot'")
    assert(!parse(partial, "graft").allowed("/anything"))
    assert(!parse(partial, "graft-mobile").allowed("/anything"))
  }

  test("multiple user-agent lines share a group; same-agent groups merge") {
    val txt =
      """User-agent: a
        |User-agent: graftbot
        |Disallow: /one
        |
        |User-agent: graftbot
        |Disallow: /two
        |""".stripMargin
    val r = parse(txt, "graftbot")
    assert(!r.allowed("/one/x") && !r.allowed("/two/y") && r.allowed("/three"))
  }

  test("comments, case-insensitive directives, unknown keys ignored") {
    val r = parse(
      """# robots for example.com
        |USER-AGENT: GraftBot  # our crawler
        |DISALLOW: /a
        |Crawl-delay: 10
        |Sitemap: https://x/sitemap.xml
        |allow: /a/b
        |""".stripMargin, "graftbot")
    assert(!r.allowed("/a/z") && r.allowed("/a/b/z"))
  }

  test("missing or unparseable robots: everything allowed") {
    assert(parse("", "g").allowed("/x"))
    assert(parse("garbage without structure", "g").allowed("/x"))
  }

  test("empty User-agent value matches nothing (ADVICE r03 #5)") {
    // a stray `User-agent:` line must not become a match-everything
    // specific group that suppresses the legitimate `*` groups
    val txt =
      """User-agent:
        |Disallow: /stray
        |
        |User-agent: *
        |Disallow: /blocked
        |""".stripMargin
    val r = parse(txt, "graftbot")
    assert(r.allowed("/stray/x"))     // empty-UA group never selected
    assert(!r.allowed("/blocked/x"))  // the * group still applies
  }

  test("hostOf: bare lowercased host — userinfo and port stripped") {
    import Robots.hostOf
    assert(hostOf("https://A.Example/x?y#z") == "a.example")
    assert(hostOf("http://h.example") == "h.example")
    // port and userinfo variants must hit the same robots row as the bare
    // host — leaving them in the key bypasses the gate for those URLs
    assert(hostOf("https://h.example:8080/p") == "h.example")
    assert(hostOf("https://h.example:443/p") == "h.example")
    assert(hostOf("https://user:pw@H.example/p") == "h.example")
    assert(hostOf("http://u@h.example:80") == "h.example")
    assert(hostOf("http://[2001:DB8::1]:8080/p") == "[2001:db8::1]")
    assert(hostOf("/relative/path") == "")
    assert(hostOf(null) == "")
  }

  test("non-group lines do not split a user-agent run (RFC 9309 grouping)") {
    // a Sitemap line between two User-agent lines must NOT flush a
    // rule-less group for the first agent (which would suppress the '*'
    // groups with an empty rule set → allow-all on a disallowed site)
    val txt =
      """User-agent: graftbot
        |Sitemap: https://x/s.xml
        |User-agent: other
        |Disallow: /
        |""".stripMargin
    val r = parse(txt, "graftbot")
    assert(!r.allowed("/anything"), "graftbot shares the group's Disallow: /")
    // crawl-delay between runs behaves the same way
    val r2 = parse(
      "User-agent: a\nCrawl-delay: 5\nUser-agent: graftbot\nDisallow: /x\n",
      "graftbot")
    assert(!r2.allowed("/x/y") && r2.allowed("/y"))
  }

  private def checkFilter(f: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Unit = {
    val spark = graft.pipeline.SparkEnv.session("local[4]", "robots-spec", 4)
    try {
      import spark.implicits._
      val pages = Seq(
        ("https://a.example/keep", 1L), ("https://a.example/private/x", 2L),
        ("https://A.EXAMPLE/private/public/y", 3L),
        ("https://b.example/anything", 4L),
        ("https://c.example/no-robots", 5L),
        // port/userinfo variants must still hit their host's rules
        ("https://b.example:443/port-variant", 6L),
        ("https://u:pw@b.example/userinfo-variant", 7L),
        // a null url cannot be robots-checked: passes through
        (null: String, 8L),
        // malformed schemes: hostOf and the join regex must agree (both
        // extract b.example and apply its disallow-all; a '/' in the
        // prefix means "not an authority URL" on both paths → kept)
        ("1http://b.example/malformed-scheme", 9L),
        ("a:b://b.example/colon-prefix", 10L),
        ("foo/bar://b.example/path-prefix", 11L)
      ).toDF("url", "id")
      val robots = Seq(
        ("a.example", "User-agent: *\nDisallow: /private\nAllow: /private/public\n"),
        // duplicate host rows: deterministic dedup (greatest text wins),
        // and the join path must not duplicate a.example's pages
        ("a.example", "User-agent: *\nDisallow: /\n"),
        ("b.example", "User-agent: *\nDisallow: /\n")
      ).toDF("host", "robots_txt")
      val kept = f(pages, robots)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L, 5L, 8L, 11L))
      assert(f(pages, robots).columns.toSeq == Seq("url", "id"),
        "helper columns must not leak into the output schema")
    } finally spark.stop()
  }

  test("Spark filter (broadcast path): narrow per-host gate") {
    checkFilter((p, r) => Robots.filterAllowed(p, r, "graftbot"))
  }

  test("Spark filter (salted join path): same results") {
    checkFilter((p, r) => Robots.filterAllowedJoin(p, r, "graftbot", saltBuckets = 4))
  }

  test("Spark filter (size-guard auto-fallback): oversize robots set takes the join path") {
    // 3 robots rows > maxBroadcastHosts=1 → filterAllowed must fall back
    // to the join variant instead of collecting (ADVICE r04 driver-OOM
    // guard) — and produce identical results
    checkFilter((p, r) => Robots.filterAllowed(p, r, "graftbot",
      maxBroadcastHosts = 1))
    // byte guard triggers the same fallback
    checkFilter((p, r) => Robots.filterAllowed(p, r, "graftbot",
      maxBroadcastBytes = 8))
  }

  test("sitemap directives: case-insensitive, comments, dedupe, order, null") {
    assert(Robots.sitemapDirectives(null) == Nil)
    assert(Robots.sitemapDirectives("User-agent: *\nDisallow: /\n") == Nil)
    val txt = "SiteMap: https://a/1.xml\n# Sitemap: https://a/commented.xml\n" +
      "User-agent: *\nDisallow: /\nsitemap: https://a/2.xml # trailing\n" +
      "Sitemap: https://a/1.xml\nSitemap:\nSitemapX: https://a/no.xml\n"
    assert(Robots.sitemapDirectives(txt) ==
      Seq("https://a/1.xml", "https://a/2.xml"))
  }
}
