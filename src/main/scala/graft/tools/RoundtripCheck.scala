package graft.tools

import graft.htmlx._

/** Serializer↔parser coherence probe: for every document-mode conformance
  * case, serialize the parsed tree to HTML, re-parse, re-serialize — the
  * second serialization must equal the first (idempotence after one
  * roundtrip). Prints divergent cases. */
object RoundtripCheck {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("src/test/resources/tree-construction")
    var total = 0
    var bad = 0
    java.nio.file.Files.list(dir).forEach { f =>
      val lines = java.nio.file.Files.readAllLines(f).toArray(Array.empty[String])
      var i = 0
      while (i < lines.length) {
        if (lines(i) == "#data") {
          val data = new StringBuilder
          i += 1
          var first = true
          while (i < lines.length && lines(i) != "#errors") {
            if (!first) data.append('\n')
            data.append(lines(i)); first = false; i += 1
          }
          // skip to #document; fragment cases skipped
          var isFragment = false
          while (i < lines.length && !lines(i).startsWith("#document")) {
            if (lines(i) == "#document-fragment") isFragment = true
            i += 1
          }
          if (!isFragment) {
            total += 1
            val input = data.toString
            try {
              val d1 = HtmlParser.parseDocument(input).doc
              val h1 = Serializer.toHtml(d1)
              val d2 = HtmlParser.parseDocument(h1).doc
              val h2 = Serializer.toHtml(d2)
              if (h1 != h2) {
                bad += 1
                if (bad <= 10) {
                  println(s"DIVERGE [${f.getFileName}]: ${input.take(80).replace("\n", "\\n")}")
                  println(s"  h1: ${h1.take(160).replace("\n", "\\n")}")
                  println(s"  h2: ${h2.take(160).replace("\n", "\\n")}")
                }
              }
            } catch {
              case t: Throwable => bad += 1; println(s"THROW [${f.getFileName}] $t: ${input.take(80)}")
            }
          }
        } else i += 1
      }
    }
    println(s"roundtrip: $total cases, $bad divergent")
  }
}
