package graft.tools

import graft.htmlx._

/** CLI surface for the core engine: parse an HTML file, print tree stats
  * (and optionally the html5lib serialization). Mirrors the reference's
  * Program.cs bench loop shape (reference: HtmlParserSharp/Program.cs:49-97).
  *
  * usage: runMain graft.tools.ParseDemo <file.html> [--tree] [--reps N]
  */
object ParseDemo {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ParseDemo <file.html> [--tree] [--reps N]")
    val path = args(0)
    val showTree = args.contains("--tree")
    val reps = args.sliding(2).collectFirst { case Array("--reps", n) => n.toInt }.getOrElse(1)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    var result: HtmlParser.ParseResult = null
    var best = Long.MaxValue
    var total = 0L
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      result = HtmlParser.parseBytes(bytes)
      val dt = System.nanoTime() - t0
      total += dt
      if (dt < best) best = dt
      if (reps > 1) println(f"rep $i: ${dt / 1e6}%.1f ms")
    }
    var elems, texts, comments, chars = 0L
    def walk(n: HNode): Unit = n match {
      case e: HElement => elems += 1; e.children.foreach(walk)
      case t: HText => texts += 1; chars += t.sb.length
      case _: HComment => comments += 1
      case p: HParent => p.children.foreach(walk)
      case _ => ()
    }
    walk(result.doc)
    println(s"input bytes: ${bytes.length}")
    println(s"elements: $elems  textNodes: $texts  textChars: $chars  comments: $comments")
    println(s"quirksMode: ${result.doc.quirksMode}  detectedCharset: ${result.detectedCharset}")
    val annotated = Locators.annotate(result.errors.take(5).toSeq,
      HtmlParser.normalize(HtmlParser.decodeUtf8(bytes)))
    println(s"parse errors (first ${annotated.length} of ${result.errors.length}): ${annotated.mkString("; ")}")
    if (reps > 1) println(f"best: ${best / 1e6}%.1f ms  avg: ${total / reps / 1e6}%.1f ms  throughput(best): ${bytes.length / (best / 1e9) / 1e6}%.1f MB/s")
    if (showTree) println(Serializer.html5libFormat(result.doc))
  }
}
