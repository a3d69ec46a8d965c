package graft.htmlx

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

/** Opt-in crawl-grade charset handling. The DEFAULT pipeline decode stays
  * hard UTF-8 with U+FFFD replacement — byte-identical to the reference
  * parser's model (SimpleHtmlParser.cs:35 hardcodes UTF-8), which is the
  * north-rule invariant. Real crawls, however, carry ~5% mislabeled or
  * legacy-encoded pages; [[decode]] implements the standard pragmatic
  * ladder for them:
  *
  *   1. UTF-8/UTF-16 BOM wins outright
  *   2. strict UTF-8 (no malformed sequences) — the overwhelming majority
  *   3. a declared `<meta charset>` naming a supported single-byte charset
  *      (windows-1252 / iso-8859-1 / us-ascii family)
  *   4. windows-1252 fallback (total: every byte maps, nothing throws)
  *
  * Returns (text, charsetUsed). Deterministic; never throws.
  */
object CharsetSniff {

  private val Win1252: Charset = Charset.forName("windows-1252")

  private val singleByteAliases: Map[String, Charset] = {
    val w = Win1252
    Map(
      "windows-1252" -> w, "cp1252" -> w, "x-cp1252" -> w,
      // the HTML standard maps iso-8859-1/latin1/ascii labels to windows-1252
      "iso-8859-1" -> w, "iso8859-1" -> w, "latin1" -> w, "l1" -> w,
      "us-ascii" -> w, "ascii" -> w, "iso-ir-100" -> w, "ibm819" -> w)
  }

  def strictUtf8(bytes: Array[Byte]): Option[String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => None }
  }

  /** Scan the first `limit` bytes for `<meta charset=...>` /
    * `http-equiv` content charset, ASCII-case-insensitively — the same
    * prescan the tree builder runs post-decode, but over raw bytes.
    * Only 'charset' occurrences INSIDE a `<meta ...>` tag count: a URL
    * query string or comment mentioning charset before the real meta
    * must not supply the label. Whitespace around '=' follows the HTML
    * definition (space/tab/LF/FF/CR), not just ' '. */
  def declaredCharset(bytes: Array[Byte], limit: Int = 2048): Option[String] = {
    val n = math.min(bytes.length, limit)
    val hay = new String(bytes, 0, n, StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    var metaIdx = hay.indexOf("<meta")
    while (metaIdx >= 0) {
      val tagEnd = { val g = hay.indexOf('>', metaIdx); if (g < 0) hay.length else g }
      val mIdx = hay.indexOf("charset", metaIdx)
      if (mIdx >= 0 && mIdx < tagEnd) {
        var i = mIdx + "charset".length
        while (i < tagEnd && (isWs(hay.charAt(i)) || hay.charAt(i) == '=')) i += 1
        if (i < tagEnd) {
          val quote = hay.charAt(i)
          val (start, endChars) =
            if (quote == '"' || quote == '\'') (i + 1, Set(quote))
            else (i, Set(' ', '\t', '\n', '\f', '\r', '"', '\'', ';', '>', '/'))
          var j = start
          while (j < tagEnd && !endChars.contains(hay.charAt(j))) j += 1
          val name = hay.substring(start, j).trim
          if (name.nonEmpty) return Some(name)
        }
      }
      metaIdx = hay.indexOf("<meta", metaIdx + 5)
    }
    None
  }

  def decode(bytes: Array[Byte]): (String, String) = {
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      return (new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8), "utf-8")
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      return (new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE), "utf-16be")
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      return (new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE), "utf-16le")
    strictUtf8(bytes) match {
      case Some(t) => (t, "utf-8")
      case None =>
        val declared = declaredCharset(bytes)
        declared.flatMap(singleByteAliases.get) match {
          case Some(cs) => (new String(bytes, cs), declared.get)
          case None => (new String(bytes, Win1252), "windows-1252-fallback")
        }
    }
  }
}
