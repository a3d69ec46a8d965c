package graft.tools

import graft.htmlx._
import java.nio.file.{Files, Paths}

/** Conformance-corpus adjudication aid: reads html5lib-format `.dat` files
  * WITH expectations, runs the engine on each case, and prints a pass/fail
  * summary plus unified diffs for failures. Used while transcribing the
  * public html5lib-tests corpus (VERDICT r02 "What's missing" #1): cases are
  * written expectation-first (from the published corpus / spec reasoning),
  * then every mismatch is adjudicated — an engine bug gets fixed, a
  * transcription error gets corrected against the spec, never by silently
  * adopting engine output.
  *
  * Supports the upstream `#script-on` / `#script-off` flags: script-on cases
  * are SKIPPED (this engine parses with scripting disabled, like the
  * reference — /root/reference/HtmlParserSharp/Core/TreeBuilder.cs scripting
  * flag is never enabled by SimpleHtmlParser).
  *
  * Usage: CorpusCheck <file.dat>... [--max-diffs N]
  */
object CorpusCheck {

  case class Case(file: String, idx: Int, data: String, fragment: Option[String],
                  expected: String, scriptOn: Boolean)

  def loadCases(file: String): Seq[Case] = {
    val lines = Files.readAllLines(Paths.get(file)).toArray(Array.empty[String]).toVector
    val cases = scala.collection.mutable.ArrayBuffer[Case]()
    var i = 0
    var idx = 0
    while (i < lines.length) {
      if (lines(i) == "#data") {
        i += 1
        val data = new StringBuilder
        var first = true
        while (i < lines.length && lines(i) != "#errors") {
          if (!first) data.append('\n')
          data.append(lines(i)); first = false
          i += 1
        }
        i += 1 // past #errors
        var fragment: Option[String] = None
        var scriptOn = false
        while (i < lines.length && !lines(i).startsWith("#document")) {
          if (lines(i) == "#document-fragment") { i += 1; fragment = Some(lines(i).trim) }
          else if (lines(i) == "#script-on") scriptOn = true
          i += 1
        }
        if (i < lines.length && lines(i) == "#document-fragment") {
          i += 1; fragment = Some(lines(i).trim); i += 1
          while (i < lines.length && !lines(i).startsWith("#document")) i += 1
        }
        i += 1 // past #document
        val exp = new StringBuilder
        while (i < lines.length && lines(i) != "#data" &&
               !(lines(i).isEmpty && i + 1 < lines.length && lines(i + 1) == "#data")) {
          exp.append(lines(i)).append('\n')
          i += 1
        }
        idx += 1
        cases += Case(file, idx, data.toString, fragment, exp.toString.reverse.dropWhile(_ == '\n').reverse + "\n", scriptOn)
      } else i += 1
    }
    cases.toSeq
  }

  def runOne(c: Case): String =
    c.fragment match {
      case Some(ctx) =>
        val ns = if (ctx.startsWith("svg ")) Ns.svg else if (ctx.startsWith("math ")) Ns.mathml else Ns.html
        val name = ctx.stripPrefix("svg ").stripPrefix("math ")
        Serializer.html5libFormat(HtmlParser.parseFragment(c.data, name, ns).fragment)
      case None =>
        Serializer.html5libFormat(HtmlParser.parseDocument(c.data).doc)
    }

  def main(args: Array[String]): Unit = {
    val maxDiffs = args.sliding(2).collectFirst { case Array("--max-diffs", n) => n.toInt }.getOrElse(20)
    val files = args.filterNot(_.startsWith("--")).filterNot(a => args.indexOf(a) > 0 && args(args.indexOf(a) - 1) == "--max-diffs")
    var pass, fail, skip, crash = 0
    var diffsShown = 0
    files.foreach { f =>
      val cases = loadCases(f)
      var fp, ff, fs = 0
      cases.foreach { c =>
        if (c.scriptOn) { skip += 1; fs += 1 }
        else {
          val actual = try Some(runOne(c)) catch {
            case t: Throwable =>
              crash += 1
              println(s"CRASH ${c.file} #${c.idx}: $t\n  input: ${c.data.take(120)}")
              None
          }
          actual.foreach { a =>
            if (a == c.expected) { pass += 1; fp += 1 }
            else {
              fail += 1; ff += 1
              if (diffsShown < maxDiffs) {
                diffsShown += 1
                println(s"FAIL ${c.file} #${c.idx}")
                println(s"--- input ---\n${c.data}")
                println(s"--- expected ---\n${c.expected}--- actual ---\n$a")
              }
            }
          }
        }
      }
      println(f"$f%-60s pass=$fp fail=$ff skip=$fs (${cases.size} cases)")
    }
    println(s"\nTOTAL pass=$pass fail=$fail skip=$skip crash=$crash")
    if (fail > 0 || crash > 0) sys.exit(1)
  }
}
