package graft.pdfx

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Minimal born-digital PDF text extraction — the "PDF/layout parse" leg of
  * the extraction pipeline (north_rule pipeline family), from scratch on the
  * public PDF 1.4 syntax. v1 scope, stated plainly:
  *
  *   - unencrypted PDFs; content streams stored raw or FlateDecode
  *     (java.util.zip.Inflater — no external codecs needed);
  *   - text operators Tj, ' (quote), " (double-quote), TJ (array show;
  *     kerning numbers ignored); line structure from Td/TD/T*;
  *   - literal strings with the full escape set (\n \r \t \b \f \( \) \\
  *     \ooo, escaped newlines) and hex strings <...>;
  *   - string bytes taken as Latin-1 text (valid for Standard/WinAnsi
  *     encoded simple fonts — the overwhelmingly common born-digital case;
  *     CID/Type0 composite fonts come out as garbage and are NOT detected
  *     in v1).
  *
  * Robustness over completeness: the xref table is ignored entirely — we
  * scan for `stream ... endstream` spans (tolerant of the broken xrefs
  * rampant in crawled PDFs), decode each, and harvest text operators from
  * any stream containing a BT/ET text block. Like the HTML engine, never
  * throws: malformed input degrades to empty output.
  */
object PdfTextExtractor {

  final case class PdfExtraction(text: String, lines: Seq[String], ok: Boolean)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  def extract(bytes: Array[Byte]): PdfExtraction = {
    try {
      val lines = new ArrayBuffer[String]
      var searchFrom = 0
      var guard = 0
      while (searchFrom < bytes.length && guard < 10000) {
        guard += 1
        val s = indexOf(bytes, "stream", searchFrom)
        if (s < 0) searchFrom = bytes.length
        else {
          // stream keyword is followed by CRLF or LF
          var dataStart = s + 6
          if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
          val e = indexOf(bytes, "endstream", dataStart)
          if (e < 0) searchFrom = bytes.length
          else {
            var dataEnd = e
            // strip one trailing EOL belonging to the keyword
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
            // balance-matched outer dict start: a plain lastIndexOf("<<")
            // lands on a nested sub-dict (/DecodeParms << ... >> is
            // standard), hiding /FlateDecode from the filter check
            val dictStart = {
              val bal = outerDictStart(bytes, s)
              if (bal >= 0) bal else math.max(0, lastIndexOf(bytes, "<<", s))
            }
            val dict = new String(bytes, dictStart, s - dictStart, StandardCharsets.ISO_8859_1)
            val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            val decoded =
              if (dict.contains("/FlateDecode")) inflate(raw)
              else if (dict.contains("/Filter")) null // unsupported filter
              else raw
            if (decoded != null && indexOf(decoded, "BT", 0) >= 0)
              harvestText(decoded, lines)
            searchFrom = e + 9
          }
        }
      }
      val text = lines.mkString("\n")
      PdfExtraction(text, lines.toSeq, ok = true)
    } catch {
      case _: Throwable => PdfExtraction("", Nil, ok = false)
    }
  }

  // ----------------------------------------------------------- inner bits

  /** Backward balance scan from just before the `stream` keyword to the
    * matching outer `<<` of the stream dict; −1 when no balanced dict is
    * found (degenerate input — caller falls back). Bounded to 8 KiB back:
    * stream dicts are tiny, and the bound keeps a pathological file from
    * rescanning megabytes per stream. */
  private def outerDictStart(bytes: Array[Byte], before: Int): Int = {
    var i = before - 2
    val floor = math.max(0, before - 8192)
    var depth = 0
    while (i >= floor) {
      if (bytes(i) == '<' && bytes(i + 1) == '<') {
        depth -= 1
        if (depth <= 0) return i
        i -= 2
      } else if (bytes(i) == '>' && bytes(i + 1) == '>') {
        depth += 1
        i -= 2
      } else i -= 1
    }
    -1
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      var stalled = false
      while (!inf.finished() && !stalled) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else stalled = true // truncated/corrupt: keep what we got
      }
      inf.end()
      out.toByteArray
    } catch { case _: Throwable => null }
  }

  /** Scan a content stream for text-showing operators; append the page's
    * lines to `out`. A "line" accumulates shows until a Td/TD/T*&#47;'/"
    * line advance. */
  private def harvestText(cs: Array[Byte], out: ArrayBuffer[String]): Unit = {
    val n = cs.length
    var i = 0
    val line = new java.lang.StringBuilder
    var pendingShow = new java.lang.StringBuilder // last parsed string(s)
    var inText = false
    // total dict-scan allowance for this stream (see skipDict)
    var dictBudget = math.min(n.toLong * 2 + 8192, Int.MaxValue.toLong).toInt

    def endLine(): Unit = {
      if (line.length > 0) { out += line.toString; line.setLength(0) }
    }

    // non-show strings (dict values, pre-BT strings) parse into a sink so
    // their bytes are consumed correctly but never reach the output
    val sink = new java.lang.StringBuilder

    while (i < n) {
      val c = cs(i).toChar
      if (c == '(') {
        if (inText) i = literalString(cs, i, pendingShow)
        else { sink.setLength(0); i = literalString(cs, i, sink) }
      } else if (c == '<' && i + 1 < n && cs(i + 1) != '<') {
        if (inText) i = hexString(cs, i, pendingShow)
        else { sink.setLength(0); i = hexString(cs, i, sink) }
      } else if (c == '<' && i + 1 < n && cs(i + 1) == '<') {
        // dict inside the stream (BDC property lists, inline image dicts):
        // skip the WHOLE dict including its strings — '/ActualText (fi)'
        // must not leak into the next show
        // per-call window + stream-total budget keep adversarial repeated
        // '<<' (each failing scan costs its window) at O(n) overall
        val window = math.max(0, math.min(dictBudget, 8192))
        val j = skipDict(cs, i, window)
        dictBudget -= (if (j == i + 2) window else j - i)
        i = j
      } else if (c == 'B' && i + 1 < n && cs(i + 1) == 'T' && delim(cs, i + 2)) {
        inText = true; pendingShow.setLength(0); i += 2
      } else if (c == 'E' && i + 1 < n && cs(i + 1) == 'T' && delim(cs, i + 2)) {
        endLine(); inText = false; pendingShow.setLength(0); i += 2
      } else if (inText && c == 'T' && i + 1 < n) {
        val op = cs(i + 1).toChar
        if ((op == 'j' || op == 'J') && delim(cs, i + 2)) {
          line.append(pendingShow); pendingShow.setLength(0); i += 2
        } else if ((op == 'd' || op == 'D' || op == '*') && delim(cs, i + 2)) {
          endLine(); pendingShow.setLength(0); i += 2
        } else i += 1
      } else if (inText && (c == '\'' || c == '"') && delim(cs, i + 1)) {
        // quote operators: next-line THEN show
        endLine()
        line.append(pendingShow); pendingShow.setLength(0)
        i += 1
      } else if (c == '%') { // comment to EOL
        while (i < n && cs(i) != '\n') i += 1
      } else i += 1
    }
    endLine()
  }

  /** Skip a `<< ... >>` dict (nesting + strings); returns index after the
    * closing `>>`. Strings are parsed so a ')' or '>>' inside them cannot
    * end the dict early. An UNBALANCED `<<` within `maxScan` bytes
    * (corrupt/truncated stream, or a dict larger than any sane one) falls
    * back to skipping just the two bytes — consuming to end-of-stream
    * would silently drop every text block after the glitch, and an
    * unbounded scan per stray '<<' would be O(n²) on hostile input. */
  private def skipDict(cs: Array[Byte], start: Int, maxScan: Int): Int = {
    var i = start + 2
    var depth = 1
    val n = math.min(cs.length, start + 2 + maxScan)
    val sink = new java.lang.StringBuilder
    while (i < n && depth > 0) {
      val c = cs(i).toChar
      if (c == '(') { sink.setLength(0); i = literalString(cs, i, sink) }
      else if (c == '<' && i + 1 < n && cs(i + 1) == '<') { depth += 1; i += 2 }
      else if (c == '>' && i + 1 < n && cs(i + 1) == '>') { depth -= 1; i += 2 }
      else if (c == '<') { sink.setLength(0); i = hexString(cs, i, sink) }
      else i += 1
    }
    if (depth > 0) start + 2 else i
  }

  private def delim(cs: Array[Byte], i: Int): Boolean =
    i >= cs.length || {
      val c = cs(i).toChar
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '(' || c == '<' ||
        c == '/' || c == '[' || c == ']'
    }

  /** Parse a `(...)` literal (nesting + escapes); returns index after ')'. */
  private def literalString(cs: Array[Byte], start: Int, out: java.lang.StringBuilder): Int = {
    var i = start + 1
    var depth = 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs(i).toChar
      if (c == '\\' && i + 1 < n) {
        val e = cs(i + 1).toChar
        e match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '(' => out.append('('); i += 2
          case ')' => out.append(')'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '\n' => i += 2 // escaped EOL: line continuation
          case '\r' => i += (if (i + 2 < n && cs(i + 2) == '\n') 3 else 2)
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && cs(i) >= '0' && cs(i) <= '7') {
              v = v * 8 + (cs(i) - '0'); i += 1; k += 1
            }
            out.append((v & 0xFF).toChar)
          case other => out.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) out.append(c); i += 1 }
      else { out.append(c); i += 1 }
    }
    i
  }

  /** Parse `<hex>`; returns index after '>'. */
  private def hexString(cs: Array[Byte], start: Int, out: java.lang.StringBuilder): Int = {
    var i = start + 1
    val n = cs.length
    var hi = -1
    while (i < n && cs(i) != '>') {
      val c = cs(i).toChar
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.append((hi << 4).toChar) // odd count: trailing 0
    if (i < n) i += 1
    i
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nd = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.max(0, from)
    val limit = hay.length - nd.length
    while (i <= limit) {
      var j = 0
      while (j < nd.length && hay(i + j) == nd(j)) j += 1
      if (j == nd.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val nd = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.min(before, hay.length) - nd.length
    while (i >= 0) {
      var j = 0
      while (j < nd.length && hay(i + j) == nd(j)) j += 1
      if (j == nd.length) return i
      i -= 1
    }
    -1
  }
}
