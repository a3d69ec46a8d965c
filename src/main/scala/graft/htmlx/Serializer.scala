package graft.htmlx

/** Serializers: html5lib-tests tree format (for the conformance corpus) and
  * a plain re-serializer (debugging). Format per the html5lib
  * tree-construction `.dat` convention the north star names (FIXTURES.md §3).
  */
object Serializer {

  def html5libFormat(root: HParent): String = {
    val sb = new java.lang.StringBuilder
    def attrsSorted(e: HElement): Seq[(String, String)] =
      e.attrs.toSeq.sortBy(_._1)
    def prefix(ns: String): String =
      if (ns eq Ns.html) "" else if (ns eq Ns.svg) "svg " else if (ns eq Ns.mathml) "math " else ""
    def walk(n: HNode, depth: Int): Unit = {
      val ind = "| " + ("  " * depth)
      n match {
        case e: HElement =>
          sb.append(ind).append('<').append(prefix(e.ns)).append(e.name).append(">\n")
          attrsSorted(e).foreach { case (k, v) =>
            sb.append("| ").append("  " * (depth + 1)).append(k).append("=\"").append(v).append("\"\n")
          }
          e.children.foreach(walk(_, depth + 1))
        case t: HText =>
          sb.append(ind).append('"').append(t.text).append("\"\n")
        case c: HComment =>
          sb.append(ind).append("<!-- ").append(c.text).append(" -->\n")
        case d: HDoctype =>
          sb.append(ind).append("<!DOCTYPE ").append(d.name)
          if ((d.publicId != null && d.publicId.nonEmpty) || (d.systemId != null && d.systemId.nonEmpty)) {
            sb.append(" \"").append(Option(d.publicId).getOrElse("")).append("\"")
            sb.append(" \"").append(Option(d.systemId).getOrElse("")).append("\"")
          }
          sb.append(">\n")
        case p: HParent =>
          p.children.foreach(walk(_, depth))
      }
    }
    root.children.foreach(walk(_, 0))
    sb.toString
  }

  /** Minimal HTML re-serialization for debugging. */
  def toHtml(n: HNode): String = {
    val sb = new java.lang.StringBuilder
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val voids = Set("area", "base", "basefont", "bgsound", "br", "col", "embed",
      "frame", "hr", "img", "input", "keygen", "link", "meta", "param",
      "source", "track", "wbr")
    def walk(n: HNode): Unit = n match {
      case e: HElement =>
        sb.append('<').append(e.name)
        e.attrs.toSeq.foreach { case (k, v) =>
          sb.append(' ').append(k).append("=\"").append(v.replace("\"", "&quot;")).append('"')
        }
        sb.append('>')
        if (!(e.isHtmlNs && voids.contains(e.name))) {
          e.children.foreach(walk)
          sb.append("</").append(e.name).append('>')
        }
      case t: HText => sb.append(esc(t.text))
      case c: HComment => sb.append("<!--").append(c.text).append("-->")
      case d: HDoctype => sb.append("<!DOCTYPE ").append(d.name).append('>')
      case p: HParent => p.children.foreach(walk)
    }
    walk(n)
    sb.toString
  }
}
