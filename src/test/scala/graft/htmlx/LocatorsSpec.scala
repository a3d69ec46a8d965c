package graft.htmlx

import org.scalatest.funsuite.AnyFunSuite

class LocatorsSpec extends AnyFunSuite {

  test("lineCol maps offsets across line boundaries") {
    val s = "ab\ncdef\n\nxyz"
    assert(Locators.lineCol(s, 0) == (1, 1))
    assert(Locators.lineCol(s, 1) == (1, 2))
    assert(Locators.lineCol(s, 2) == (1, 3)) // the newline itself
    assert(Locators.lineCol(s, 3) == (2, 1))
    assert(Locators.lineCol(s, 7) == (2, 5))
    assert(Locators.lineCol(s, 8) == (3, 1)) // empty line
    assert(Locators.lineCol(s, 9) == (4, 1))
    assert(Locators.lineCol(s, 11) == (4, 3))
    assert(Locators.lineCol(s, 999) == (4, 991)) // clamp-free past-end math
  }

  test("single-line and empty inputs") {
    assert(Locators.lineCol("", 0) == (1, 1))
    assert(Locators.lineCol("abc", 2) == (1, 3))
  }

  test("annotate rewrites @offset suffixes only") {
    val input = "line one\nline two <b"
    val out = Locators.annotate(
      Seq("eof-in-tag @19", "no offset here", "weird @x @9"), input)
    assert(out == Seq("eof-in-tag @2:11", "no offset here", "weird @x @2:1"))
  }

  test("engine errors annotate to the expected position") {
    val html = "<!DOCTYPE html><p>a\n<td>x"
    val r = HtmlParser.parseDocument(html)
    val ann = Locators.annotate(r.errors.toSeq, HtmlParser.normalize(html))
    assert(ann.exists(_.endsWith("@2:5")), s"got $ann")
  }
}
