package graft.tools

import graft.htmlx._
import java.nio.file.{Files, Paths}

/** Conformance-corpus authoring aid: reads a case file (lines of `#case`
  * followed by raw input lines, optional `#fragment <context>` line), parses
  * each input, and prints html5lib-format `.dat` entries with the engine's
  * tree and error count. Output is REVIEWED case-by-case against the spec
  * before being committed as expectations — the generator bootstraps the
  * transcription, it does not define correctness.
  */
object TreeGen {
  def main(args: Array[String]): Unit = {
    val lines = Files.readAllLines(Paths.get(args(0))).toArray(Array.empty[String])
    val out = new StringBuilder
    var i = 0
    while (i < lines.length) {
      if (lines(i) == "#case") {
        i += 1
        var fragment: Option[String] = None
        if (i < lines.length && lines(i).startsWith("#fragment ")) {
          fragment = Some(lines(i).substring(10).trim); i += 1
        }
        val data = new StringBuilder
        var first = true
        while (i < lines.length && lines(i) != "#case") {
          if (!first) data.append('\n')
          data.append(lines(i)); first = false
          i += 1
        }
        val input = data.toString
        val (tree, nErr) = try {
          fragment match {
            case Some(ctx) =>
              val (name, ns) =
                if (ctx.startsWith("svg ")) (ctx.substring(4), Ns.svg)
                else if (ctx.startsWith("math ")) (ctx.substring(5), Ns.mathml)
                else (ctx, Ns.html)
              val r = HtmlParser.parseFragment(input, name, ns)
              (Serializer.html5libFormat(r.fragment), r.errors.size)
            case None =>
              val r = HtmlParser.parseDocument(input)
              (Serializer.html5libFormat(r.doc), r.errors.size)
          }
        } catch { case t: Throwable => (s"PARSE CRASH: $t", -1) }
        out.append("#data\n").append(input).append('\n')
        out.append("#errors\n")
        if (nErr != 0) out.append(s"($nErr)\n")
        fragment.foreach(f => out.append("#document-fragment\n").append(f).append('\n'))
        out.append("#document\n").append(tree).append('\n')
      } else i += 1
    }
    if (args.length > 1) Files.write(Paths.get(args(1)), out.toString.getBytes("UTF-8"))
    else print(out.toString)
  }
}
