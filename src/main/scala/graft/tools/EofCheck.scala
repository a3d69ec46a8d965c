package graft.tools
import graft.htmlx._
object EofCheck {
  def main(a: Array[String]): Unit = {
    for (in <- Seq("<script>x</script foo", "<script>x</script foo=\"bar", "<body><textarea>x</textarea ", "<title>t</title")) {
      println("INPUT: " + in)
      println(Serializer.html5libFormat(HtmlParser.parseDocument(in).doc))
    }
  }
}
