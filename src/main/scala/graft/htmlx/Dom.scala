package graft.htmlx

import scala.collection.mutable.ArrayBuffer

/** Read-side DOM conveniences for users migrating from the reference's
  * `XmlDocument` result (reference: Core/DomTreeBuilder.cs:153-173): the
  * traversals and lookups a typical consumer performs on the parsed tree.
  */
object Dom {

  /** Depth-first pre-order over the whole tree. */
  def descendants(root: HNode): Iterator[HNode] = {
    val stack = new ArrayBuffer[HNode](16)
    stack += root
    new Iterator[HNode] {
      def hasNext: Boolean = stack.nonEmpty
      def next(): HNode = {
        val n = stack.remove(stack.length - 1)
        n match {
          case p: HParent =>
            var i = p.children.length - 1
            while (i >= 0) { stack += p.children(i); i -= 1 }
          case _ => ()
        }
        n
      }
    }
  }

  def elements(root: HNode): Iterator[HElement] =
    descendants(root).collect { case e: HElement => e }

  def getElementsByTagName(root: HNode, name: String): Seq[HElement] =
    elements(root).filter(e => e.name == name && e.isHtmlNs).toSeq

  def getElementById(root: HNode, id: String): Option[HElement] =
    elements(root).find(_.attr("id").contains(id))

  def getElementsByClassName(root: HNode, cls: String): Seq[HElement] =
    elements(root).filter(_.attr("class").exists(
      _.split("[ \\t\\n\\f\\r]+").contains(cls))).toSeq

  /** Concatenated text of all descendant text nodes (raw; no block
    * normalization — use Extractor for rendered text). */
  def textContent(n: HNode): String = {
    val sb = new java.lang.StringBuilder
    def walk(x: HNode): Unit = x match {
      case t: HText => sb.append(t.sb)
      case p: HParent => p.children.foreach(walk)
      case _ => ()
    }
    walk(n)
    sb.toString
  }

  def head(doc: HDocument): Option[HElement] =
    getElementsByTagName(doc, "head").headOption
  def body(doc: HDocument): Option[HElement] =
    getElementsByTagName(doc, "body").headOption
  def title(doc: HDocument): Option[String] =
    getElementsByTagName(doc, "title").headOption.map(t => textContent(t))

  /** All hyperlink (href) values in document order. */
  def links(root: HNode): Seq[String] =
    elements(root).filter(e => e.name == "a" && e.isHtmlNs)
      .flatMap(_.attr("href")).toSeq

  /** meta name/property → content map (first wins). */
  def metaTags(doc: HDocument): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    getElementsByTagName(doc, "meta").foreach { m =>
      val key = m.attr("name").orElse(m.attr("property")).orElse(m.attr("http-equiv"))
      (key, m.attr("content")) match {
        case (Some(k), Some(v)) if !out.contains(k.toLowerCase(java.util.Locale.ROOT)) => out(k.toLowerCase(java.util.Locale.ROOT)) = v
        case _ => ()
      }
    }
    out.toMap
  }
}
