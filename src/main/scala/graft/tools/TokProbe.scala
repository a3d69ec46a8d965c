package graft.tools
import graft.htmlx._
import scala.collection.mutable.ArrayBuffer
object TokProbe {
  def main(a: Array[String]): Unit = {
    val out = new ArrayBuffer[String]
    val h = new TokenHandler {
      def doctype(n: String, p: String, s: String, f: Boolean): Unit = out += s"doctype:$n"
      def startTag(n: String, at: AttrList, sc: Boolean): Unit = out += s"start:$n"
      def endTag(n: String): Unit = out += s"end:$n"
      def comment(t: String): Unit = out += s"comment:$t"
      def characters(s: CharSequence, st: Int, e: Int): Unit = out += s"chars:${s.subSequence(st, e)}"
      def zeroChar(): Unit = out += "NUL"
      def eof(): Unit = out += "eof"
    }
    new Tokenizer(h).tokenize(HtmlParser.normalize("x<!--a"))
    println(out.mkString(" | "))
  }
}
