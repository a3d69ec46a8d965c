package graft.htmlx

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Token-stream and entity-decoding tests (FIXTURES.md §4). */
class TokenizerSpec extends AnyFunSuite {

  final class Recorder extends TokenHandler {
    val out = new ArrayBuffer[String]
    private val text = new java.lang.StringBuilder
    private def flush(): Unit =
      if (text.length > 0) { out += "chars:" + text.toString; text.setLength(0) }
    def doctype(name: String, p: String, s: String, fq: Boolean): Unit = {
      flush(); out += s"doctype:$name:${Option(p).getOrElse("")}:${Option(s).getOrElse("")}:$fq"
    }
    def startTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit = {
      flush()
      val a = attrs.toSeq.map { case (k, v) => s"$k=$v" }.mkString(",")
      out += s"start:$name[$a]${if (selfClosing) "/" else ""}"
    }
    def endTag(name: String): Unit = { flush(); out += s"end:$name" }
    def comment(t: String): Unit = { flush(); out += s"comment:$t" }
    def characters(s: CharSequence, start: Int, end: Int): Unit =
      text.append(s, start, end)
    def zeroChar(): Unit = { flush(); out += "NUL" }
    def eof(): Unit = { flush(); out += "eof" }
  }

  def tok(input: String): Seq[String] = {
    val r = new Recorder
    new Tokenizer(r).tokenize(HtmlParser.normalize(input))
    r.out.toSeq
  }

  test("basic tag with attributes and entity") {
    assert(tok("""<p class="x">A &amp; B</p>""") ==
      Seq("start:p[class=x]", "chars:A & B", "end:p", "eof"))
  }

  test("self-closing and unquoted attr") {
    assert(tok("<br/><input type=text disabled>") ==
      Seq("start:br[]/", "start:input[type=text,disabled=]", "eof"))
  }

  test("uppercase lowered; duplicate attribute dropped") {
    assert(tok("""<DIV ID=a id=b>""") == Seq("start:div[id=a]", "eof"))
  }

  test("comment variants") {
    assert(tok("<!-- x -->") == Seq("comment: x ", "eof"))
    assert(tok("<!---->") == Seq("comment:", "eof"))
    assert(tok("<!-- a -- b -->") == Seq("comment: a -- b ", "eof"))
    assert(tok("<!-- x --!>y") == Seq("comment: x ", "chars:y", "eof"))
    assert(tok("<!-->y") == Seq("comment:", "chars:y", "eof"))
    assert(tok("<?php ?>x") == Seq("comment:?php ?", "chars:x", "eof"))
  }

  test("doctype") {
    assert(tok("<!DOCTYPE html>") == Seq("doctype:html:::false", "eof"))
    assert(tok("<!doctype HTML public \"a\" 'b'>x") ==
      Seq("doctype:html:a:b:false", "chars:x", "eof"))
    assert(tok("<!DOCTYPE>") == Seq("doctype:null:::true", "eof"))
  }

  test("named entities with and without semicolon") {
    assert(tok("&notin; &not; &not &notx") ==
      Seq("chars:∉ ¬ ¬ ¬x", "eof"))
    assert(tok("&amp &ampx &amp;") == Seq("chars:& &x &", "eof"))
    assert(tok("&unknown; &") == Seq("chars:&unknown; &", "eof"))
  }

  test("attribute entity missing-semicolon rule") {
    // &not followed by alnum/= in attr value must NOT decode
    assert(tok("""<a href="?a=b&notit">x</a>""") ==
      Seq("start:a[href=?a=b&notit]", "chars:x", "end:a", "eof"))
    // but with semicolon it decodes
    assert(tok("""<a href="?a=b&notin;">x</a>""") ==
      Seq("start:a[href=?a=b∉]", "chars:x", "end:a", "eof"))
    // bare &not at value end decodes (legacy)
    assert(tok("""<a href="x&not">y</a>""") ==
      Seq("start:a[href=x¬]", "chars:y", "end:a", "eof"))
    // suppression tests ASCII alphanumeric ONLY (spec; reference
    // Tokenizer.cs:3417-3419): a non-ASCII alphanumeric follower ('é',
    // Arabic-Indic digit '٣') does NOT suppress — the legacy ref decodes
    // (r5 fix: Character.isLetterOrDigit wrongly suppressed these)
    assert(tok("<a href=\"x&noté\">y</a>") ==
      Seq("start:a[href=x¬é]", "chars:y", "end:a", "eof"))
    assert(tok("<a href=\"x&not٣\">y</a>") ==
      Seq("start:a[href=x¬٣]", "chars:y", "end:a", "eof"))
  }

  test("numeric entities") {
    assert(tok("&#65;&#x42;&#X43;") == Seq("chars:ABC", "eof"))
    assert(tok("&#x80;") == Seq("chars:€", "eof")) // Windows-1252 remap
    assert(tok("&#0;") == Seq("chars:�", "eof"))
    assert(tok("&#x110000;") == Seq("chars:�", "eof")) // overflow
    assert(tok("&#xD800;") == Seq("chars:�", "eof")) // surrogate
    assert(tok("&#x1F600;") == Seq("chars:😀", "eof")) // astral
    assert(tok("&#65") == Seq("chars:A", "eof")) // missing semicolon still decodes
    assert(tok("&#;x") == Seq("chars:&#;x", "eof")) // no digits
    // numeric CR is EMITTED VERBATIM (parse error, no remap — 0x0D is not
    // in the C1 table; input-stream CRLF normalization happens BEFORE the
    // tokenizer, so a charref-produced CR survives into the DOM). Pinned
    // here because the line-based .dat harness cannot represent it
    // (tools/gen_charref.py fuzz mode skips decoded-CR payloads).
    assert(tok("a&#xD;b&#13;c") == Seq("chars:a\rb\rc", "eof"))
  }

  test("CR/LF/BOM normalization") {
    assert(tok("﻿a\r\nb\rc") == Seq("chars:a\nb\nc", "eof"))
  }

  test("NUL routed separately in data state") {
    assert(tok("a\u0000b") == Seq("chars:a", "NUL", "chars:b", "eof"))
  }

  test("plain < and invalid tag starts") {
    assert(tok("a < b") == Seq("chars:a < b", "eof"))
    assert(tok("a <3 b") == Seq("chars:a <3 b", "eof"))
    assert(tok("</>x") == Seq("chars:x", "eof"))
  }

  test("EOF in tag discards tag") {
    assert(tok("x<div") == Seq("chars:x", "eof"))
    assert(tok("x<div foo") == Seq("chars:x", "eof"))
  }

  test("attribute edge cases") {
    assert(tok("<div a = b>") == Seq("start:div[a=b]", "eof"))
    assert(tok("<div /foo>") == Seq("start:div[foo=]", "eof"))
    assert(tok("<div a/b>") == Seq("start:div[a=,b=]", "eof"))
    assert(tok("<div a='1' b=\"2\" c=3>") == Seq("start:div[a=1,b=2,c=3]", "eof"))
    assert(tok("<div =oops>") == Seq("start:div[=oops=]", "eof"))
    assert(tok("<div a&b=c>") == Seq("start:div[a&b=c]", "eof"))
    // spec: '/' inside an unquoted value is part of the value (no self-closing)
    assert(tok("<div a=b/>") == Seq("start:div[a=b/]", "eof"))
  }

  test("entity longest match") {
    val (len, v, semi) = Entities.longestMatch("notin;x", 0)
    assert(len == 6 && v == "∉" && semi)
    val (len2, v2, _) = Entities.longestMatch("notit;", 0)
    assert(len2 == 3 && v2 == "¬") // matches "not"
    assert(Entities.longestMatch("zzz", 0)._1 == 0)
  }

  test("entity table size matches spec") {
    // 2231 names in the WHATWG table; spot-check coverage via lookups
    assert(Entities.longestMatch("CounterClockwiseContourIntegral;", 0)._1 == 32)
    assert(Entities.longestMatch("fjlig;", 0)._2 == "fj")
  }
}
