package graft.tools
import graft.htmlx._
object TokProbe2 {
  def main(a: Array[String]): Unit = {
    for (in <- Seq("x<!--a", "x<!--a-->", "<body>x<!--a")) {
      val r = HtmlParser.parseDocument(in)
      println(s"INPUT '$in' errors=${r.errors}")
      println(Serializer.html5libFormat(r.doc))
    }
  }
}
