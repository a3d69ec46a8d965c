package graft.pdfx

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** PDF leg of the extraction pipeline: writer↔extractor roundtrip plus
  * hand-built streams exercising every supported operator/escape form. */
class PdfSpec extends AnyFunSuite {

  test("roundtrip: raw and FlateDecode single-page PDFs") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    for (compress <- Seq(false, true)) {
      val pdf = MiniPdf.build(MiniPdf.wrap(text, 7), compress)
      assert(PdfTextExtractor.isPdf(pdf))
      val ex = PdfTextExtractor.extract(pdf)
      assert(ex.ok)
      assert(ex.text.replace('\n', ' ') == text, s"compress=$compress")
    }
  }

  test("string escapes, hex strings, TJ arrays, quote operators") {
    val cs = ("BT /F1 12 Tf 72 720 Td (paren \\( close \\) back\\\\slash \\101) Tj\n" +
      "0 -14 Td [(arr) -120 (ay)] TJ\n" +
      "(next line via quote) '\n" +
      "<48 65 6C 6C 6F> Tj ET").getBytes(StandardCharsets.ISO_8859_1)
    val pdf = buildWith(cs)
    val ex = PdfTextExtractor.extract(pdf)
    assert(ex.lines == Seq(
      "paren ( close ) back\\slash A",
      "array",
      "next line via quoteHello"))
  }

  test("ignores non-text streams and tolerates truncation") {
    val junk = ("%PDF-1.4\n1 0 obj << /Length 5 >> stream\nABCDE\nendstream endobj\n" +
      "2 0 obj << /Length 9999 >> stream\nBT (cut").getBytes(StandardCharsets.ISO_8859_1)
    val ex = PdfTextExtractor.extract(junk)
    assert(ex.ok && ex.text == "") // no complete text stream → empty, no throw
    assert(PdfTextExtractor.extract(Array[Byte]()).text == "")
    assert(!PdfTextExtractor.isPdf("<html>".getBytes))
  }

  test("pipeline parseOne sniffs PDF magic and emits line spans") {
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val pdf = MiniPdf.build(MiniPdf.wrap(text, 5), compress = true)
    val doc = graft.pipeline.ExtractPipeline.parseOne("https://x.example/a.pdf", pdf)
    assert(doc.ok && doc.detected_charset == "pdf")
    assert(doc.text.replace('\n', ' ') == text)
    assert(doc.spans.length == 3) // 12 words / 5 per line
    doc.spans.foreach(s => assert(doc.text.substring(s.start, s.end) == doc.text.split('\n')(doc.spans.indexOf(s))))
  }

  test("nested /DecodeParms sub-dict does not hide /FlateDecode") {
    // stream dict with a nested dict AFTER the filter name: the outer
    // dict must be found by balance-matching, not lastIndexOf("<<")
    val cs = "BT (nested dict ok) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(cs); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val head = ("%PDF-1.4\n4 0 obj << /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 1 /Columns 5 >> " +
      s"/Length ${deflated.length} >> stream\n").getBytes(StandardCharsets.ISO_8859_1)
    val tail = "\nendstream endobj\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream
    out.write(head); out.write(deflated); out.write(tail)
    val ex = PdfTextExtractor.extract(out.toByteArray)
    assert(ex.lines == Seq("nested dict ok"), ex)
  }

  test("dict strings and pre-BT strings never leak into shows") {
    // tagged-PDF shape: /ActualText in a BDC property dict must not ride
    // into the next Tj; a stray string before BT must not prepend either
    val cs = ("(stray before text block)\n" +
      "BT /Span << /ActualText (LEAK) >> BDC (shown) Tj EMC ET")
      .getBytes(StandardCharsets.ISO_8859_1)
    val ex = PdfTextExtractor.extract(buildWith(cs))
    assert(ex.lines == Seq("shown"), ex)
  }

  test("generated PDFs end with the spec EOF marker") {
    val pdf = MiniPdf.build(MiniPdf.wrap("hello world", 5), compress = false)
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    assert(s.endsWith("%%EOF\n") && !s.contains("%%%%EOF"))
  }

  test("stray unbalanced '<<' does not swallow the rest of the stream") {
    val cs = "q << /Corrupt BT (after glitch) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    val ex = PdfTextExtractor.extract(buildWith(cs))
    assert(ex.lines == Seq("after glitch"), ex)
  }

  test("streams of repeated unbalanced '<<' stay linear-time") {
    // 200k stray '<<' with no closers: the per-call window + stream
    // budget must keep this from going quadratic (a naive scan-to-end
    // per occurrence touches ~10^10 bytes)
    val cs = ("<< " * 200000 + "BT (survives) Tj ET").getBytes(StandardCharsets.ISO_8859_1)
    val t0 = System.nanoTime()
    val ex = PdfTextExtractor.extract(buildWith(cs))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(ex.lines == Seq("survives"), ex)
    assert(sec < 10.0, s"hostile dict stream too slow: $sec s")
  }

  test("never throws and is deterministic on arbitrary and mutated bytes") {
    val rnd = new java.util.Random(0xBADF00D)
    // pure random bytes
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      val e1 = PdfTextExtractor.extract(b)
      val e2 = PdfTextExtractor.extract(b)
      assert(e1.text == e2.text)
    }
    // structured-ish: a valid PDF with random byte flips (the crawl shape —
    // truncated/corrupted real documents)
    val base = MiniPdf.build(MiniPdf.wrap("the quick brown fox " * 20, 9),
      compress = true)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(20))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val cut = if (rnd.nextBoolean()) rnd.nextInt(b.length) else b.length
      val mutated = java.util.Arrays.copyOf(b, cut)
      val e1 = PdfTextExtractor.extract(mutated)
      val e2 = PdfTextExtractor.extract(mutated)
      assert(e1.text == e2.text)
    }
  }

  private def buildWith(content: Array[Byte]): Array[Byte] = {
    val head = s"%PDF-1.4\n4 0 obj << /Length ${content.length} >> stream\n"
    val tail = "\nendstream endobj\n%%EOF\n"
    val out = new java.io.ByteArrayOutputStream
    out.write(head.getBytes(StandardCharsets.ISO_8859_1))
    out.write(content)
    out.write(tail.getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }
}
