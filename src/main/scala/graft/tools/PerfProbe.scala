package graft.tools

import graft.htmlx._

/** Quick perf triage: tokenizer-only vs full-parse throughput. */
object PerfProbe {
  final class NullHandler extends TokenHandler {
    var tags = 0
    def doctype(n: String, p: String, s: String, f: Boolean): Unit = ()
    def startTag(name: String, attrs: AttrList, sc: Boolean): Unit = { tags += 1 }
    def endTag(name: String): Unit = ()
    def comment(t: String): Unit = ()
    def characters(s: CharSequence, a: Int, b: Int): Unit = ()
    def zeroChar(): Unit = ()
    def eof(): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val html = HtmlParser.normalize(HtmlParser.decodeUtf8(bytes))
    // warmup
    for (_ <- 1 to 5) { val h = new NullHandler; new Tokenizer(h).tokenize(html); HtmlParser.parseDocument(html) }
    var t0 = System.nanoTime()
    var reps = 20
    for (_ <- 1 to reps) { val h = new NullHandler; new Tokenizer(h).tokenize(html) }
    val tokMs = (System.nanoTime() - t0) / 1e6 / reps
    t0 = System.nanoTime()
    for (_ <- 1 to reps) HtmlParser.parseDocument(html)
    val fullMs = (System.nanoTime() - t0) / 1e6 / reps
    println(f"bytes=${bytes.length} tokenizerOnly=${tokMs}%.2f ms (${bytes.length / tokMs / 1e3}%.1f MB/s)  full=${fullMs}%.2f ms (${bytes.length / fullMs / 1e3}%.1f MB/s)")
  }
}
