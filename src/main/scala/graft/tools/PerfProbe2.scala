package graft.tools

import graft.htmlx._
import graft.tools.PerfProbe.NullHandler

/** Isolate tokenizer cost by input shape. */
object PerfProbe2 {
  def bench(label: String, html: String): Unit = {
    for (_ <- 1 to 5) new Tokenizer(new NullHandler).tokenize(html)
    val reps = 20
    val t0 = System.nanoTime()
    for (_ <- 1 to reps) new Tokenizer(new NullHandler).tokenize(html)
    val ms = (System.nanoTime() - t0) / 1e6 / reps
    println(f"$label%-22s len=${html.length}%8d  ${ms}%8.2f ms  ${html.length / ms / 1e3}%8.1f MB/s")
  }

  def main(args: Array[String]): Unit = {
    val n = 1 << 20
    bench("plain text", "a" * n)
    bench("tags", "<div class=x>text</div>" * (n / 23))
    bench("entities", "&amp;12345678" * (n / 13))
    bench("rawtext-style", "<style>" + ("p { color: red } " * (n / 17)) + "</style>")
    bench("script", "<script>" + ("var x = 1; " * (n / 11)) + "</script>")
    bench("comments", "<!-- comment text -->" * (n / 21))
  }
}
