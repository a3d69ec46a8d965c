package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream, PushbackInputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** One parsed WARC record (headers of interest + raw payload). */
final case class WarcRecord(
    warcType: String,
    targetUri: String,
    date: String,
    payload: Array[Byte])

/** From-scratch WARC (ISO 28500) reader/writer — the native Common-Crawl
  * container format, so the pipeline can ingest crawl archives directly
  * instead of requiring a pre-converted page table.
  *
  * Reader: streaming, memory-bounded per record (header lines + one
  * Content-Length-sized payload buffer); tolerates unknown record types,
  * malformed headers, and mid-file corruption by resyncing on the next
  * `WARC/` version line. Handles plain files and the standard
  * member-per-record gzip layout (JDK GZIPInputStream consumes
  * concatenated members transparently).
  *
  * Writer: deterministic (record ids derived from the target URI + date +
  * sequence-number hashes, no clock/randomness) so tests and oracle
  * queries can rebuild files byte-identically.
  *
  * Scale path (100 TB): Common-Crawl ships ~1 GB `.warc.gz` segments with
  * one gzip member per record; the standard Spark pattern is one task per
  * segment file ([[WarcSource.read]] opens each path as a FileSystem
  * stream — no whole-file materialization, no size ceiling). Records
  * stream off the decompressor — a task never holds more than one
  * record's payload (caps below) in memory at once.
  */
object Warc {

  val MaxHeaderBytes = 64 * 1024
  val MaxPayloadBytes = 64 * 1024 * 1024

  // ------------------------------------------------------------- writing

  /** Deterministic record id. ISO 28500 requires ids to be globally
    * unique, so the URI hash alone is not enough (recrawls of one URL in
    * one file would collide — ADVICE r03 #4): the capture date and a
    * caller-supplied sequence number are mixed in, and the id is a full
    * 128-bit name-based UUID — a 64-bit digest would reach birthday
    * collisions (~N²/2⁶⁵) within a 10¹⁰-record crawl. Still clock- and
    * randomness-free, so built files stay byte-reproducible. */
  private def recordId(kind: String, url: String, dateIso: String, seq: Long): String = {
    val u = if (url == null) "" else url
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft:$kind:$u#$dateIso#$seq".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"<urn:uuid:$uuid>"
  }

  /** Deterministic WARC/1.0 response record with an embedded HTTP/1.1
    * response head. `dateIso` example: 2025-01-01T00:00:00Z. `seq` makes
    * the record id unique among records sharing (url, date). */
  def buildResponse(url: String, dateIso: String, body: Array[Byte],
                    seq: Long = 0L): Array[Byte] = {
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
    val payloadLen = http.length + body.length
    val id = recordId("", url, dateIso, seq)
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: $payloadLen\r\n\r\n").getBytes("ISO-8859-1")
    val out = new ByteArrayOutputStream(head.length + payloadLen + 4)
    out.write(head); out.write(http); out.write(body)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** WET-style conversion record: extracted plain text for a page — the
    * Common-Crawl interchange format for exactly this pipeline's output. */
  def buildConversion(url: String, dateIso: String, text: String,
                      seq: Long = 0L): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val id = recordId("conv:", url, dateIso, seq)
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
    val out = new ByteArrayOutputStream(head.length + body.length + 4)
    out.write(head); out.write(body)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** A WET file: warcinfo + one conversion record per (url, dateIso, text). */
  def buildWetFile(records: Seq[(String, String, String)],
                   gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def emit(rec: Array[Byte]): Unit =
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        // close(), not finish(): releases the native Deflater immediately
        // (BAOS close is a no-op, so the member boundary is unaffected)
        gz.write(rec); gz.close()
      } else out.write(rec)
    val date = records.headOption.map(_._2).getOrElse("2025-01-01T00:00:00Z")
    emit(buildWarcinfo(date))
    records.iterator.zipWithIndex.foreach { case ((url, d, text), i) =>
      emit(buildConversion(url, d, text, i.toLong))
    }
    out.toByteArray
  }

  private def buildWarcinfo(dateIso: String): Array[Byte] = {
    val body = "software: graft-extract\r\nformat: WARC File Format 1.0\r\n".getBytes("ISO-8859-1")
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
    val out = new ByteArrayOutputStream()
    out.write(head); out.write(body)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** A whole WARC file: warcinfo + one response per (url, dateIso, html).
    * `gzipPerRecord` writes the standard member-per-record layout. */
  def buildFile(records: Seq[(String, String, Array[Byte])],
                gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def emit(rec: Array[Byte]): Unit =
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(rec); gz.close()
      } else out.write(rec)
    val date = records.headOption.map(_._2).getOrElse("2025-01-01T00:00:00Z")
    emit(buildWarcinfo(date))
    records.iterator.zipWithIndex.foreach { case ((url, d, body), i) =>
      emit(buildResponse(url, d, body, i.toLong))
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- reading

  /** Gzip magic sniff — the ONE home for the 0x1F 0x8B check (Sitemaps
    * and WarcSource's stream probe share the constant semantics). */
  private[sources] def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B

  /** Stream records out of a WARC file's bytes (plain or gzip). */
  def records(fileBytes: Array[Byte]): Iterator[WarcRecord] = {
    val raw = new ByteArrayInputStream(fileBytes)
    val in: InputStream = if (isGzip(fileBytes)) new GZIPInputStream(raw) else raw
    records(in)
  }

  /** Streaming record iterator over an already-decompressed stream. */
  def records(in0: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private val in = new PushbackInputStream(new java.io.BufferedInputStream(in0, 1 << 16), 16)
    private var nextRec: WarcRecord = _
    private var done = false

    private def readLine(max: Int): String = {
      // CRLF (or bare LF, tolerated) terminated, ISO-8859-1
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      while (c != -1 && c != '\n' && sb.length < max) {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      if (sb.length >= max) {
        // over-long line: drain to EOL so the remainder is not re-parsed
        // as further (bogus but ':'-bearing) header lines — the value is
        // truncated, the header stream stays aligned
        while (c != -1 && c != '\n') c = in.read()
      }
      if (c == -1 && sb.length == 0) throw new EOFException
      sb.toString
    }

    /** Skip bytes through the next "WARC/x.y" version line; leaves the
      * stream at the following record's first header line. */
    private def resync(): Boolean = {
      val target = "WARC/"
      var matched = 0
      var c = in.read()
      while (c != -1) {
        if (c == target.charAt(matched)) {
          matched += 1
          if (matched == target.length) {
            readLine(64) // consume the version digits + CRLF
            return true
          }
        } else matched = if (c == 'W') 1 else 0
        c = in.read()
      }
      false
    }

    private def readExact(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException
        off += r
      }
      buf
    }

    // resync() consumes THROUGH the next "WARC/x.y" version line, leaving
    // the stream positioned at that record's first header line; the flag
    // tells parseOne() to skip its own version-line scan once.
    private var pendingHeader = false

    private def parseOne(): WarcRecord = {
      while (true) {
        var haveVersion = pendingHeader
        pendingHeader = false
        while (!haveVersion) {
          var line: String = null
          try line = readLine(MaxHeaderBytes)
          catch { case _: EOFException => return null }
          if (line.startsWith("WARC/")) haveVersion = true
          else if (line.nonEmpty) {
            if (!resyncFrom()) return null
            haveVersion = true
          } // empty line: inter-record padding, keep scanning
        }
        var warcType = ""; var uri = ""; var date = ""; var len = -1L
        var headerOk = true
        var line: String = null
        try {
          line = readLine(MaxHeaderBytes)
          while (line.nonEmpty) {
            val i = line.indexOf(':')
            if (i > 0) {
              val name = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
              val v = line.substring(i + 1).trim
              name match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "warc-date" => date = v
                case "content-length" =>
                  len = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ => ()
              }
            } else headerOk = false
            line = readLine(MaxHeaderBytes)
          }
        } catch { case _: EOFException => return null }
        if (headerOk && len >= 0 && len <= MaxPayloadBytes) {
          val payload = try readExact(len.toInt) catch { case _: EOFException => return null }
          return WarcRecord(warcType, uri, date, payload)
        }
        // unusable record (bad header / oversized): skip to next boundary
        if (!resyncFrom()) return null
        pendingHeader = true
      }
      null // unreachable
    }

    private def resyncFrom(): Boolean =
      try resync() catch { case _: EOFException => false }

    private def advance(): Unit = {
      if (done) return
      nextRec = parseOne()
      if (nextRec == null) { done = true }
    }

    advance()
    override def hasNext: Boolean = !done
    override def next(): WarcRecord = {
      val r = nextRec
      advance()
      if (r == null) throw new NoSuchElementException
      r
    }
  }

  /** Strip the embedded HTTP response head from a response payload. */
  def htmlPayload(r: WarcRecord): Array[Byte] = {
    val p = r.payload
    if (p.length >= 5 && p(0) == 'H' && p(1) == 'T' && p(2) == 'T' && p(3) == 'P' && p(4) == '/') {
      var i = 0
      while (i + 3 < p.length) {
        if (p(i) == '\r' && p(i + 1) == '\n' && p(i + 2) == '\r' && p(i + 3) == '\n')
          return java.util.Arrays.copyOfRange(p, i + 4, p.length)
        i += 1
      }
    }
    p
  }
}
