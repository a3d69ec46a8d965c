package graft.htmlx

/** Serializers: html5lib-tests tree format (for the conformance corpus) and
  * a plain re-serializer (debugging). Format per the html5lib
  * tree-construction `.dat` convention the north star names (FIXTURES.md §3).
  */
object Serializer {

  /** Spec "adjust foreign attributes" rendered per the html5lib convention:
    * the DOM keeps the qualified name verbatim (TreeBuilder.adjustAttrs
    * policy), and the conformance format displays the namespace-adjusted
    * form `prefix local` for the 11 fixed names on foreign elements. */
  private val foreignAttrDisplay = Map(
    "xlink:actuate" -> "xlink actuate", "xlink:arcrole" -> "xlink arcrole",
    "xlink:href" -> "xlink href", "xlink:role" -> "xlink role",
    "xlink:show" -> "xlink show", "xlink:title" -> "xlink title",
    "xlink:type" -> "xlink type", "xml:lang" -> "xml lang",
    "xml:space" -> "xml space", "xmlns:xlink" -> "xmlns xlink")

  def html5libFormat(root: HParent): String = {
    val sb = new java.lang.StringBuilder
    def attrsSorted(e: HElement): Seq[(String, String)] = {
      val raw = e.attrs.toSeq
      val shown =
        if (e.isHtmlNs) raw
        else raw.map { case (k, v) => (foreignAttrDisplay.getOrElse(k, k), v) }
      shown.sortBy(_._1)
    }
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
          if (e.templateContents != null) {
            // html5lib format: template contents under a "content" line
            sb.append("| ").append("  " * (depth + 1)).append("content\n")
            e.templateContents.children.foreach(walk(_, depth + 2))
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

  /** HTML re-serialization per the spec's fragment-serialization algorithm,
    * with two fidelity choices: raw-text element content is emitted
    * VERBATIM (escaping it double-escapes on reparse — the spec serializes
    * script/style/xmp/iframe/noembed/noframes/plaintext text unchanged, and
    * content containing its own close tag is inherently unserializable),
    * and doctype public/system ids are KEPT (the spec drops them, which
    * loses quirks-mode semantics on reparse; an extraction library values
    * the roundtrip). Idempotence after one roundtrip is asserted over the
    * whole conformance corpus in DomSpec. */
  private val voids = Set("area", "base", "basefont", "bgsound", "br", "col",
    "embed", "frame", "hr", "img", "input", "keygen", "link", "meta", "param",
    "source", "track", "wbr")
  // NOT "noscript": this engine parses with scripting disabled, so
  // noscript children are real parsed markup whose text nodes hold
  // DECODED text — emitting them verbatim would let "&lt;b&gt;" text
  // reparse as a <b> element (mXSS-shaped parser/serializer split).
  // The spec's verbatim rule for noscript applies only when scripting
  // is enabled and its content was tokenized as raw text.
  private val rawText = Set("script", "style", "xmp", "iframe", "noembed",
    "noframes", "plaintext")

  def toHtml(n: HNode): String = {
    val sb = new java.lang.StringBuilder
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def walk(n: HNode, raw: Boolean): Unit = n match {
      case e: HElement =>
        sb.append('<').append(e.name)
        e.attrs.toSeq.foreach { case (k, v) =>
          sb.append(' ').append(k).append("=\"")
            .append(v.replace("&", "&amp;").replace("\"", "&quot;")).append('"')
        }
        sb.append('>')
        if (!(e.isHtmlNs && voids.contains(e.name))) {
          // spec: pre/textarea/listing whose first text child starts with a
          // newline get an EXTRA one (the parser drops the first on reparse)
          if (e.isHtmlNs &&
              (e.name == "pre" || e.name == "textarea" || e.name == "listing")) {
            e.children.headOption match {
              case Some(t: HText) if t.sb.length > 0 && t.sb.charAt(0) == '\n' =>
                sb.append('\n')
              case _ => ()
            }
          }
          val childRaw = e.isHtmlNs && rawText.contains(e.name)
          // spec: the HTML serialization of a template element is its
          // template CONTENTS (reparsing routes them back into contents)
          if (e.templateContents != null) e.templateContents.children.foreach(walk(_, childRaw))
          else e.children.foreach(walk(_, childRaw))
          sb.append("</").append(e.name).append('>')
        }
      case t: HText => sb.append(if (raw) t.text else esc(t.text))
      case c: HComment => sb.append("<!--").append(c.text).append("-->")
      case d: HDoctype =>
        // ids can contain one quote kind (the tokenizer allows `"` inside a
        // single-quoted id and vice versa) — pick the other quote; an id
        // containing BOTH is unserializable, so fall back to the spec's
        // bare-name serialization (ids dropped) rather than emit a doctype
        // that reparses differently (caught by the h5-doctype01 corpus)
        def quoted(id: String): Option[String] =
          if (!id.contains('"')) Some("\"" + id + "\"")
          else if (!id.contains('\'')) Some("'" + id + "'")
          else None
        val pub = Option(d.publicId).filter(_.nonEmpty)
        val sys = Option(d.systemId).filter(_.nonEmpty)
        val legacy: Option[String] = (pub, sys) match {
          case (Some(p), Some(s)) =>
            for (qp <- quoted(p); qs <- quoted(s)) yield s" PUBLIC $qp $qs"
          case (Some(p), None) => quoted(p).map(qp => s" PUBLIC $qp")
          case (None, Some(s)) => quoted(s).map(qs => s" SYSTEM $qs")
          case (None, None) => Some("")
        }
        sb.append("<!DOCTYPE ").append(d.name)
        legacy.foreach(sb.append(_))
        sb.append('>')
      case p: HParent => p.children.foreach(walk(_, raw = false))
    }
    walk(n, raw = false)
    sb.toString
  }
}
