package graft.htmlx

/** Element/attribute category tables from the WHATWG spec. The reference
  * packs these as flag bits on ~392 interned ElementName objects
  * (Core/ElementName.cs:38-82); here they are plain hash sets — the lookups
  * are a negligible cost next to char scanning, and sets keep the tables
  * auditable against the spec lists.
  */
object SpecNames {

  /** The "special" category (HTML namespace part). */
  val special: Set[String] = Set(
    "address", "applet", "area", "article", "aside", "base", "basefont",
    "bgsound", "blockquote", "body", "br", "button", "caption", "center",
    "col", "colgroup", "dd", "details", "dir", "div", "dl", "dt", "embed",
    "fieldset", "figcaption", "figure", "footer", "form", "frame", "frameset",
    "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hgroup", "hr",
    "html", "iframe", "img", "input", "isindex", "li", "link", "listing",
    "main", "marquee", "menu", "meta", "nav", "noembed", "noframes",
    "noscript", "object", "ol", "p", "param", "plaintext", "pre", "script",
    "search", "section", "select", "source", "style", "summary", "table", "tbody",
    "td", "template", "textarea", "tfoot", "th", "thead", "title", "tr",
    "track", "ul", "wbr", "xmp")

  val specialSvg: Set[String] = Set("foreignObject", "desc", "title")
  val specialMathml: Set[String] = Set("mi", "mo", "mn", "ms", "mtext", "annotation-xml")

  def isSpecial(name: String, ns: String): Boolean =
    if (ns eq Ns.html) special.contains(name)
    else if (ns eq Ns.svg) specialSvg.contains(name)
    else if (ns eq Ns.mathml) specialMathml.contains(name)
    else false

  /** Formatting elements tracked in the active-formatting list. */
  val formatting: Set[String] = Set(
    "a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
    "strike", "strong", "tt", "u")

  val headings: Set[String] = Set("h1", "h2", "h3", "h4", "h5", "h6")

  val impliedEnd: Set[String] = Set("dd", "dt", "li", "option", "optgroup", "p",
    "rb", "rp", "rt", "rtc")

  /** "Generate all implied end tags thoroughly" additions (spec 13.2.6.3:
    * the implied set plus the table-structure names; used by </template>). */
  val impliedEndThorough: Set[String] = impliedEnd ++ Set(
    "caption", "colgroup", "tbody", "td", "tfoot", "th", "thead", "tr")

  /** Default scope barrier (plus foreign integration points). */
  val defaultScope: Set[String] = Set(
    "applet", "caption", "html", "table", "td", "th", "marquee", "object",
    "template")

  /** Foreign-content breakout start tags (spec "in foreign content"). */
  val breakout: Set[String] = Set(
    "b", "big", "blockquote", "body", "br", "center", "code", "dd", "div",
    "dl", "dt", "em", "embed", "h1", "h2", "h3", "h4", "h5", "h6", "head",
    "hr", "i", "img", "li", "listing", "menu", "meta", "nobr", "ol", "p",
    "pre", "ruby", "s", "small", "span", "strong", "strike", "sub", "sup",
    "table", "tt", "u", "ul", "var")

  /** SVG camelCase element-name fixups (spec table). */
  val svgTagFix: Map[String, String] = Seq(
    "altGlyph", "altGlyphDef", "altGlyphItem", "animateColor",
    "animateMotion", "animateTransform", "clipPath", "feBlend",
    "feColorMatrix", "feComponentTransfer", "feComposite",
    "feConvolveMatrix", "feDiffuseLighting", "feDisplacementMap",
    "feDistantLight", "feDropShadow", "feFlood", "feFuncA", "feFuncB",
    "feFuncG", "feFuncR", "feGaussianBlur", "feImage", "feMerge",
    "feMergeNode", "feMorphology", "feOffset", "fePointLight",
    "feSpecularLighting", "feSpotLight", "feTile", "feTurbulence",
    "foreignObject", "glyphRef", "linearGradient", "radialGradient",
    "textPath").map(n => n.toLowerCase(java.util.Locale.ROOT) -> n).toMap

  /** SVG camelCase attribute fixups (spec table). */
  val svgAttrFix: Map[String, String] = Seq(
    "attributeName", "attributeType", "baseFrequency", "baseProfile",
    "calcMode", "clipPathUnits", "diffuseConstant", "edgeMode",
    "externalResourcesRequired", "filterUnits", "glyphRef",
    "gradientTransform", "gradientUnits", "kernelMatrix",
    "kernelUnitLength", "keyPoints", "keySplines", "keyTimes",
    "lengthAdjust", "limitingConeAngle", "markerHeight", "markerUnits",
    "markerWidth", "maskContentUnits", "maskUnits", "numOctaves",
    "pathLength", "patternContentUnits", "patternTransform",
    "patternUnits", "pointsAtX", "pointsAtY", "pointsAtZ",
    "preserveAlpha", "preserveAspectRatio", "primitiveUnits", "refX",
    "refY", "repeatCount", "repeatDur", "requiredExtensions",
    "requiredFeatures", "specularConstant", "specularExponent",
    "spreadMethod", "startOffset", "stdDeviation", "stitchTiles",
    "surfaceScale", "systemLanguage", "tableValues", "targetX",
    "targetY", "textLength", "viewBox", "viewTarget", "xChannelSelector",
    "yChannelSelector", "zoomAndPan").map(n => n.toLowerCase(java.util.Locale.ROOT) -> n).toMap

  /** MathML text integration points. */
  def isMathmlTextIP(name: String, ns: String): Boolean =
    (ns eq Ns.mathml) && (name == "mi" || name == "mo" || name == "mn" ||
      name == "ms" || name == "mtext")

  /** HTML integration points. */
  def isHtmlIP(e: HElement): Boolean =
    if (e.ns eq Ns.svg) e.name == "foreignObject" || e.name == "desc" || e.name == "title"
    else if (e.ns eq Ns.mathml)
      e.name == "annotation-xml" && {
        val enc = e.attr("encoding").map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
        enc == "text/html" || enc == "application/xhtml+xml"
      }
    else false

  /** Quirks-mode public-id prefixes (spec list; reference:
    * Core/TreeBuilderConstants.cs:36-86). */
  val quirkyPublicIdPrefixes: Array[String] = Array(
    "+//silmaril//dtd html pro v0r11 19970101//",
    "-//advasoft ltd//dtd html 3.0 aswedit + extensions//",
    "-//as//dtd html 3.0 aswedit + extensions//",
    "-//ietf//dtd html 2.0 level 1//",
    "-//ietf//dtd html 2.0 level 2//",
    "-//ietf//dtd html 2.0 strict level 1//",
    "-//ietf//dtd html 2.0 strict level 2//",
    "-//ietf//dtd html 2.0 strict//",
    "-//ietf//dtd html 2.0//",
    "-//ietf//dtd html 2.1e//",
    "-//ietf//dtd html 3.0//",
    "-//ietf//dtd html 3.2 final//",
    "-//ietf//dtd html 3.2//",
    "-//ietf//dtd html 3//",
    "-//ietf//dtd html level 0//",
    "-//ietf//dtd html level 1//",
    "-//ietf//dtd html level 2//",
    "-//ietf//dtd html level 3//",
    "-//ietf//dtd html strict level 0//",
    "-//ietf//dtd html strict level 1//",
    "-//ietf//dtd html strict level 2//",
    "-//ietf//dtd html strict level 3//",
    "-//ietf//dtd html strict//",
    "-//ietf//dtd html//",
    "-//metrius//dtd metrius presentational//",
    "-//microsoft//dtd internet explorer 2.0 html strict//",
    "-//microsoft//dtd internet explorer 2.0 html//",
    "-//microsoft//dtd internet explorer 2.0 tables//",
    "-//microsoft//dtd internet explorer 3.0 html strict//",
    "-//microsoft//dtd internet explorer 3.0 html//",
    "-//microsoft//dtd internet explorer 3.0 tables//",
    "-//netscape comm. corp.//dtd html//",
    "-//netscape comm. corp.//dtd strict html//",
    "-//o'reilly and associates//dtd html 2.0//",
    "-//o'reilly and associates//dtd html extended 1.0//",
    "-//o'reilly and associates//dtd html extended relaxed 1.0//",
    "-//softquad software//dtd hotmetal pro 6.0::19990601::extensions to html 4.0//",
    "-//softquad//dtd hotmetal pro 4.0::19971010::extensions to html 4.0//",
    "-//spyglass//dtd html 2.0 extended//",
    "-//sq//dtd html 2.0 hotmetal + extensions//",
    "-//sun microsystems corp.//dtd hotjava html//",
    "-//sun microsystems corp.//dtd hotjava strict html//",
    "-//w3c//dtd html 3 1995-03-24//",
    "-//w3c//dtd html 3.2 draft//",
    "-//w3c//dtd html 3.2 final//",
    "-//w3c//dtd html 3.2//",
    "-//w3c//dtd html 3.2s draft//",
    "-//w3c//dtd html 4.0 frameset//",
    "-//w3c//dtd html 4.0 transitional//",
    "-//w3c//dtd html experimental 19960712//",
    "-//w3c//dtd html experimental 970421//",
    "-//w3c//dtd w3 html//",
    "-//w3o//dtd w3 html 3.0//",
    "-//webtechs//dtd mozilla html 2.0//",
    "-//webtechs//dtd mozilla html//")
}
