package graft.pdfx

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic minimal PDF writer (single page, Helvetica, one content
  * stream) — the test/bench generator for the PDF leg of the extraction
  * pipeline. Built from the public PDF 1.4 object syntax: catalog → pages →
  * page → contents(+ optional FlateDecode) → font, a correct xref table and
  * trailer. No dependencies; pure function of its inputs.
  */
object MiniPdf {

  /** Escape a text line for a PDF literal string. */
  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Content stream: one `(line) Tj` per line, `TD`-advanced. */
  def contentStream(lines: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("BT /F1 12 Tf 72 720 Td\n")
    lines.zipWithIndex.foreach { case (l, i) =>
      if (i > 0) sb.append("0 -14 Td\n")
      sb.append('(').append(esc(l)).append(") Tj\n")
    }
    sb.append("ET")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build a complete single-page PDF. `compress` = FlateDecode the content
    * stream (exercises the inflate path in the extractor). */
  def build(lines: Seq[String], compress: Boolean): Array[Byte] = {
    val content = contentStream(lines)
    val body = if (compress) deflate(content) else content
    val filter = if (compress) " /Filter /FlateDecode" else ""

    val out = new ByteArrayOutputStream(body.length + 1024)
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = new Array[Int](6)

    w("%PDF-1.4\n")
    offsets(1) = out.size
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(3) = out.size
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    offsets(4) = out.size
    w(s"4 0 obj << /Length ${body.length}$filter >> stream\n")
    out.write(body)
    w("\nendstream endobj\n")
    offsets(5) = out.size
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val xrefAt = out.size
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Wrap single-line text into lines of `wordsPerLine` words. */
  def wrap(text: String, wordsPerLine: Int = 10): Seq[String] =
    text.split(' ').grouped(wordsPerLine).map(_.mkString(" ")).toSeq
}
