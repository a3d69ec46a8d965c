package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class SitemapsSpec extends AnyFunSuite {

  test("urlset roundtrip with lastmod") {
    val xml = Sitemaps.build(Seq(
      ("https://a.example/1", "2025-01-01"),
      ("https://a.example/2?x=1&y=2", ""),
      ("https://a.example/3", "2025-03-05")))
    val s = Sitemaps.parse(xml.getBytes("UTF-8"))
    assert(!s.isIndex)
    assert(s.entries.map(_.loc) == Vector(
      "https://a.example/1", "https://a.example/2?x=1&y=2", "https://a.example/3"))
    assert(s.entries.map(_.lastmod) == Vector("2025-01-01", "", "2025-03-05"))
  }

  test("sitemapindex detected; child locs extracted") {
    val xml = Sitemaps.build(Seq(
      ("https://a.example/sitemap-1.xml.gz", "2025-01-01"),
      ("https://a.example/sitemap-2.xml.gz", "")), index = true)
    val s = Sitemaps.parse(xml.getBytes("UTF-8"))
    assert(s.isIndex)
    assert(s.entries.map(_.loc) ==
      Vector("https://a.example/sitemap-1.xml.gz", "https://a.example/sitemap-2.xml.gz"))
  }

  test("gzip transparent") {
    val xml = Sitemaps.build(Seq(("https://z.example/p", "")))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(xml.getBytes("UTF-8")); gz.finish()
    val s = Sitemaps.parse(bos.toByteArray)
    assert(s.entries.map(_.loc) == Vector("https://z.example/p"))
  }

  test("CDATA locs, entity decode, namespace prefixes tolerated") {
    val xml =
      """<ns:urlset xmlns:ns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc><![CDATA[ https://a.example/cdata ]]></loc></url>
        |<url><loc>https://a.example/q?a=1&amp;b=2</loc></url>
        |</ns:urlset>""".stripMargin
    val s = Sitemaps.parse(xml.getBytes("UTF-8"))
    assert(s.entries.map(_.loc) ==
      Vector("https://a.example/cdata", "https://a.example/q?a=1&b=2"))
  }

  test("truncated/garbage input never throws; entries before the cut survive") {
    val xml = Sitemaps.build(Seq(("https://a.example/1", ""), ("https://a.example/2", "")))
    val cut = xml.substring(0, xml.indexOf("/2") + 1)
    val s = Sitemaps.parse(cut.getBytes("UTF-8"))
    assert(s.entries.map(_.loc).contains("https://a.example/1"))
    Sitemaps.parse(Array[Byte](1, 2, 3, 60, 108))
    Sitemaps.parse("<urlset><url><loc></loc></url></urlset>".getBytes("UTF-8"))
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 200)
      Sitemaps.parse(Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte))
  }

  test("unterminated entry does not swallow its neighbor") {
    val xml = "<urlset><url><loc>https://a/one</loc>" + // missing </url>
      "<url><loc>https://a/two</loc></url>" +
      "<url><loc>https://a/three</loc></url></urlset>"
    val sm = Sitemaps.parse(xml.getBytes("UTF-8"))
    assert(sm.entries.map(_.loc) ==
      Vector("https://a/one", "https://a/two", "https://a/three"))
  }

  test("entry cap honored") {
    val many = (0 until 50010).map(i => (s"https://a.example/$i", ""))
    val s = Sitemaps.parse(Sitemaps.build(many).getBytes("UTF-8"))
    assert(s.entries.size == Sitemaps.MaxEntries)
  }
}
