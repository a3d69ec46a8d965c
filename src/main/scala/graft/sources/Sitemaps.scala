package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

/** Sitemap (sitemaps.org protocol) parsing — the URL-discovery side of
  * the crawl pipeline, pairing with the robots.txt gate (whose `Sitemap:`
  * directive points here).
  *
  * Parser: XML-library-free tolerant scanner (crawl sitemaps are full of
  * namespace soup, stray bytes, and truncation): detects `<urlset>` vs
  * `<sitemapindex>` roots, extracts `<loc>` (+ optional `<lastmod>`) per
  * `<url>`/`<sitemap>` entry, handles CDATA locs and the five XML
  * entities, ignores everything else. Per the protocol, at most 50,000
  * entries are taken per file; member gzip is transparent. Never throws.
  */
object Sitemaps {

  val MaxEntries = 50000

  final case class Entry(loc: String, lastmod: String)
  final case class Sitemap(isIndex: Boolean, entries: Vector[Entry])

  private def ungzip(bytes: Array[Byte]): Array[Byte] =
    if (Warc.isGzip(bytes)) {
      try {
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } catch { case _: java.io.IOException => bytes }
    } else bytes

  private def decodeXmlEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  private def unwrapCdata(s: String): String = {
    val t = s.trim
    if (t.startsWith("<![CDATA[") && t.endsWith("]]>"))
      t.substring(9, t.length - 3).trim
    else t
  }

  /** Case-insensitive scan for `<tag ...>` content `</tag>`; returns the
    * inner text of the first occurrence at/after `from`, with the index
    * just past the close tag, or null. */
  private def tagText(lower: String, orig: String, tag: String, from: Int, limit: Int): (String, Int) = {
    val open = lower.indexOf("<" + tag, from)
    if (open < 0 || open >= limit) return (null, -1)
    val gt = lower.indexOf('>', open)
    if (gt < 0 || gt >= limit) return (null, -1)
    val close = lower.indexOf("</" + tag, gt + 1)
    if (close < 0 || close > limit) return (null, -1)
    (orig.substring(gt + 1, close), lower.indexOf('>', close) + 1)
  }

  def parse(bytes: Array[Byte]): Sitemap = {
    val xml = new String(ungzip(bytes), java.nio.charset.StandardCharsets.UTF_8)
    val lower = xml.toLowerCase(java.util.Locale.ROOT)
    val isIndex = {
      val ui = lower.indexOf("<urlset")
      val si = lower.indexOf("<sitemapindex")
      si >= 0 && (ui < 0 || si < ui)
    }
    val entryTag = if (isIndex) "sitemap" else "url"
    val entries = Vector.newBuilder[Entry]
    var pos = 0
    var count = 0
    while (count < MaxEntries) {
      val open = lower.indexOf("<" + entryTag, pos)
      if (open < 0) return Sitemap(isIndex, entries.result())
      // entry block ends at its close tag, bounded by the NEXT entry open:
      // an unterminated entry must not swallow its neighbor (its close
      // search would otherwise bind to the neighbor's close tag)
      val close = lower.indexOf("</" + entryTag, open)
      val nextOpen = lower.indexOf("<" + entryTag, open + 1)
      val blockEnd =
        if (close >= 0 && (nextOpen < 0 || close < nextOpen)) close + entryTag.length + 3
        else if (nextOpen >= 0) nextOpen
        else lower.length
      val (locRaw, _) = tagText(lower, xml, "loc", open, blockEnd)
      if (locRaw != null) {
        val loc = decodeXmlEntities(unwrapCdata(locRaw))
        if (loc.nonEmpty) {
          val (lmRaw, _) = tagText(lower, xml, "lastmod", open, blockEnd)
          val lm = if (lmRaw == null) "" else unwrapCdata(lmRaw).trim
          entries += Entry(loc, lm)
          count += 1
        }
      }
      pos = if (blockEnd > pos) blockEnd else pos + 1
    }
    Sitemap(isIndex, entries.result())
  }

  /** Deterministic writer for tests/oracles. */
  def build(urls: Seq[(String, String)], index: Boolean = false): String = {
    val (root, entry) = if (index) ("sitemapindex", "sitemap") else ("urlset", "url")
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"""<$root xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n""")
    for ((loc, lastmod) <- urls) {
      sb.append(s"  <$entry>\n    <loc>")
      sb.append(loc.replace("&", "&amp;").replace("<", "&lt;"))
      sb.append("</loc>\n")
      if (lastmod.nonEmpty) sb.append(s"    <lastmod>$lastmod</lastmod>\n")
      sb.append(s"  </$entry>\n")
    }
    sb.append(s"</$root>\n")
    sb.toString
  }
}
