package graft.extract

import graft.htmlx._
import scala.collection.mutable.ArrayBuffer

/** One segmented text block with densitometric features.
  * Features follow Kohlschütter et al., "Boilerplate Detection using Shallow
  * Text Features" (WSDM 2010): word count, link density, text density.
  */
final case class TextBlock(
    text: String,
    words: Int,
    linkedWords: Int,
    path: String,
    isHeading: Boolean,
    penalized: Boolean = false) {
  def linkDensity: Double = if (words == 0) 0.0 else linkedWords.toDouble / words
  /** Text density: words per 80-char wrapped line (WSDM 2010 §3.2) —
    * an exposed per-block feature for downstream rankers; classify()
    * itself uses the paper's NumWords/LinkDensity rules only. */
  def textDensity: Double = {
    val lines = math.max(1, (text.length + 79) / 80)
    words.toDouble / lines
  }
}

/** Offsets and charCount are UTF-16 code units (JVM String semantics), NOT
  * code points: supplementary-plane chars (emoji, rare CJK — common in real
  * crawls) count as 2. Any cross-system consumer comparing lengths must use
  * the same unit (SQL engines usually count code points; the test corpus is
  * ASCII where the two coincide). */
final case class Span(start: Int, end: Int, path: String)

final case class Extraction(
    text: String,
    spans: Array[Span],
    charCount: Int,
    nodeCount: Int,
    blockCount: Int,
    contentBlockCount: Int)

/** Main-content extraction over the constructed element tree — the new
  * capability the north star layers on the reference parser (BASELINE.json
  * north_star: "text-density boilerplate stripping, link-density pruning,
  * block-level main-content selection").
  *
  * Pipeline: DOM → block segmentation (block-level elements split; inline
  * elements accumulate) → per-block shallow features → the WSDM-2010
  * number-of-words/link-density decision rules → heading rescue →
  * newline-joined content text + per-block provenance spans (offsets into
  * the extracted text + DOM path of the block anchor).
  */
object Extractor {

  /** Elements whose subtree text is never rendered content. */
  private val ignored: Set[String] = Set(
    "script", "style", "noscript", "template", "iframe", "object", "embed",
    "applet", "select", "datalist", "option", "optgroup", "textarea",
    "button", "frameset", "frame", "noframes", "head", "title", "base",
    "link", "meta", "map", "area", "audio", "video", "source", "track",
    "canvas", "xmp", "plaintext")

  /** Elements that terminate the current block. */
  private val blockLevel: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "center", "dd", "details", "dialog", "dir", "div", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hgroup", "hr", "html", "isindex", "li",
    "listing", "main", "marquee", "menu", "nav", "ol", "p", "pre",
    "section", "summary", "table", "tbody", "td", "tfoot", "th", "thead",
    "tr", "ul")

  private val headings: Set[String] = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** Negative class/id tokens (readability/arc90 "unlikely candidates",
    * public heuristic): a block inside an element whose class or id contains
    * one of these word-tokens is boilerplate unless it is unmistakably long
    * prose (see classify). Token match is on [-_ ] word boundaries so "ad"
    * hits "ad-banner"/"inline_ad" but not "shadow" or "road". */
  private val negativeTokens: Set[String] = Set(
    "comment", "comments", "disqus", "sidebar", "foot", "footer", "advert",
    "advertisement", "ad", "ads", "adslot", "sponsor", "sponsored", "promo",
    "banner", "social", "share", "sharing", "widget", "breadcrumb",
    "breadcrumbs", "crumb", "crumbs", "pagination", "pager", "masthead",
    "menu", "nav", "navigation", "signup", "newsletter", "subscribe",
    "paywall", "related", "recommend", "recommended", "popup", "cookie",
    "consent", "outbrain", "taboola", "shoutbox", "community")

  // Sorted FNV-1a hashes of the tokens: the per-element check runs on the
  // extraction hot path (every element with attributes), so the token scan
  // is allocation-free — hash the lowercased token chars in place and
  // binary-search the 40-entry array. A 64-bit hash collision would
  // penalize one block spuriously (quality, not correctness); odds are
  // ~40·2⁻⁶⁴ per token.
  private val negativeHashes: Array[Long] = {
    val hs = negativeTokens.toArray.map { s =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      h
    }
    java.util.Arrays.sort(hs)
    hs
  }

  /** Does a class/id attribute value contain a negative token? */
  private[extract] def hasNegativeToken(v: String): Boolean = {
    var i = 0
    val n = v.length
    while (i < n) {
      while (i < n && !isTokenChar(v.charAt(i))) i += 1
      val s = i
      var h = 0xcbf29ce484222325L
      while (i < n && isTokenChar(v.charAt(i))) {
        var c = v.charAt(i)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        h ^= c
        h *= 0x100000001b3L
        i += 1
      }
      val len = i - s
      if (len >= 2 && len <= 13 &&
          java.util.Arrays.binarySearch(negativeHashes, h) >= 0) return true
    }
    false
  }
  private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Hot-path form of the class/id negative check: direct AttrList scan,
    * no Option allocation. */
  private def attrsPenalized(e: HElement): Boolean = {
    val as = e.attrs
    val n = as.size
    var i = 0
    while (i < n) {
      val name = as.name(i)
      if ((name == "class" || name == "id") && hasNegativeToken(as.value(i)))
        return true
      i += 1
    }
    false
  }

  // one hash lookup per element instead of three Set.contains
  private final val FlagIgnored = 1
  private final val FlagBlock = 2
  private final val FlagHeading = 4
  private val nameFlags: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    (ignored ++ blockLevel ++ headings).foreach { n =>
      var f = 0
      if (ignored.contains(n)) f |= FlagIgnored
      if (blockLevel.contains(n)) f |= FlagBlock
      if (headings.contains(n)) f |= FlagHeading
      m.put(n, f)
    }
    m
  }

  def extract(doc: HParent): Extraction = {
    val blocks = segment(doc)
    val content = classify(blocks)
    val sb = new java.lang.StringBuilder
    val spans = new ArrayBuffer[Span](content.count(identity))
    var nodeCount = 0
    def countNodes(n: HNode): Unit = n match {
      case p: HParent => nodeCount += 1; p.children.foreach(countNodes)
      case _ => nodeCount += 1
    }
    countNodes(doc)
    var i = 0
    while (i < blocks.length) {
      if (content(i)) {
        val b = blocks(i)
        if (sb.length > 0) sb.append('\n')
        val start = sb.length
        sb.append(b.text)
        spans += Span(start, sb.length, b.path)
      }
      i += 1
    }
    val text = sb.toString
    Extraction(text, spans.toArray, text.length, nodeCount,
      blocks.length, spans.length)
  }

  // ---------------------------------------------------------- segmentation

  /** Walk the DOM splitting text into blocks at block-level boundaries. */
  def segment(root: HParent): Vector[TextBlock] = {
    val out = new ArrayBuffer[TextBlock](32)
    val cur = new java.lang.StringBuilder
    // anchor text accumulates here and is word-counted per contiguous run,
    // not per text node — "<a>New<b>York</b></a>" is ONE linked word; a
    // per-node count would see two and inflate linkDensity
    val linkedBuf = new java.lang.StringBuilder
    var curLinked = 0
    var curPath = "body"
    var curHeading = false
    var curPenalized = false
    var anchorDepth = 0

    def settleLinked(): Unit = {
      if (linkedBuf.length > 0) {
        curLinked += countWords(linkedBuf)
        linkedBuf.setLength(0)
      }
    }

    def flush(): Unit = {
      settleLinked() // a block boundary inside an open <a> splits the run
      // most flushes are empty (flush runs twice per block element): reset
      // and bail before allocating anything
      if (cur.length == 0) { curLinked = 0; curHeading = false; return }
      // single pass over the accumulated chars: collapse whitespace runs,
      // count words
      val n = cur.length
      val sb = new java.lang.StringBuilder(n)
      var words = 0
      var lastWs = true
      var i = 0
      while (i < n) {
        val c = cur.charAt(i)
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == '\u00A0'
        if (ws) { if (!lastWs) sb.append(' '); lastWs = true }
        else { if (lastWs) words += 1; sb.append(c); lastWs = false }
        i += 1
      }
      while (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
      cur.setLength(0)
      if (sb.length > 0) {
        out += TextBlock(sb.toString, words, math.min(curLinked, words), curPath,
          curHeading, curPenalized)
      }
      curLinked = 0
      curHeading = false
    }

    // element index among element-children, computed during iteration
    // (avoids an O(children) scan per block element)
    def walkChildren(p: HParent, path: String, heading: Boolean, pen: Boolean): Unit = {
      var elemIdx = 0
      val cs = p.children
      var i = 0
      while (i < cs.length) {
        cs(i) match {
          case e: HElement =>
            walk(e, elemIdx, path, heading, pen)
            elemIdx += 1
          case t: HText =>
            cur.append(t.sb)
            if (anchorDepth > 0) linkedBuf.append(t.sb)
          case _ => ()
        }
        i += 1
      }
    }

    def walk(e: HElement, elemIdx: Int, path: String, heading: Boolean, pen: Boolean): Unit = {
      if (!(e.ns eq Ns.html)) {
        // foreign (SVG/MathML) subtree: its own text never renders as
        // document text, but HTML-namespace islands inside integration
        // points (foreignObject, annotation-xml, svg desc/title) DO —
        // descend through elements only, skipping foreign text nodes
        var idx = 0
        val cs = e.children
        var i = 0
        while (i < cs.length) {
          cs(i) match {
            case el: HElement => walk(el, idx, path, heading, pen); idx += 1
            case _ => ()
          }
          i += 1
        }
      }
      else {
        val fRef = nameFlags.get(e.name)
        val f = if (fRef == null) 0 else fRef.intValue
        if ((f & FlagIgnored) != 0) return
        val isBlock = (f & FlagBlock) != 0
        val childPath = if (isBlock) s"$path/${e.name}[$elemIdx]" else path
        val childHeading = heading || (f & FlagHeading) != 0
        // negative class/id hint is sticky down the subtree; the element
        // name itself can carry it too (<nav>/<aside>/<footer> are the
        // explicit form of the same signal). Headings are exempt from the
        // attribute check: ids on headings are semantic section anchors
        // ("bogus-comment-state"), not boilerplate markers.
        val childPen = pen || e.name == "nav" || e.name == "aside" ||
          e.name == "footer" ||
          ((f & FlagHeading) == 0 && e.attrs.size > 0 && attrsPenalized(e))
        if (isBlock) { flush(); curPath = childPath; curHeading = childHeading; curPenalized = childPen }
        if (e.name == "a") {
          anchorDepth += 1
          walkChildren(e, childPath, childHeading, childPen)
          anchorDepth -= 1
          if (anchorDepth == 0) settleLinked()
        } else {
          walkChildren(e, childPath, childHeading, childPen)
        }
        if (isBlock) { flush(); curPath = path; curHeading = heading; curPenalized = pen }
      }
    }

    // start from body if present, else whole doc
    findBody(root) match {
      case Some(b) =>
        curPath = "body"
        walkChildren(b, "body", heading = false, pen = false)
      case None =>
        walkChildren(root, "", heading = false, pen = false)
    }
    flush()
    out.toVector
  }

  /** Link-graph edges in DOM (document) order of the anchor START tags:
    * (href, normalized anchor text) for every HTML-namespace `<a>`
    * carrying an href attribute — the edge list a web-graph / PageRank
    * stage consumes. Semantics:
    *   - NESTED anchors (the parser produces `<a>`-in-`<a>` via foster
    *     parenting) each get their own edge; text belongs to the
    *     INNERMOST open anchor, so an inner edge's words never pollute
    *     the outer edge.
    *   - `ignored` subtrees (script/style/select/...) contribute neither
    *     text nor edges — same exclusions as [[segment]].
    *   - foreign (SVG/MathML) text is skipped but HTML-namespace islands
    *     inside integration points (foreignObject etc.) ARE descended:
    *     browsers render their links. Native SVG `<a>` stays excluded.
    *   - href-less anchors pass text through to the enclosing anchor. */
  def links(root: HParent): ArrayBuffer[(String, String)] = {
    val out = new ArrayBuffer[(String, String)](16)
    val hrefs = new ArrayBuffer[String](16)
    val bufs = new ArrayBuffer[java.lang.StringBuilder](4) // open-anchor stack
    def walk(n: HNode): Unit = n match {
      case t: HText =>
        if (bufs.nonEmpty) bufs(bufs.length - 1).append(t.sb)
      case e: HElement if e.ns eq Ns.html =>
        if (!ignored.contains(e.name)) {
          val href = if (e.name == "a") e.attr("href") else None
          href match {
            case Some(h) =>
              val slot = out.length
              out += null // reserve: DOM order of start tags
              hrefs += h
              bufs += new java.lang.StringBuilder
              e.children.foreach(walk)
              val buf = bufs.remove(bufs.length - 1)
              out(slot) = (hrefs.remove(hrefs.length - 1),
                normalizeWs(buf.toString).trim)
            case None => e.children.foreach(walk)
          }
        }
      case e: HElement =>
        // foreign element: no text, no native-SVG links — but descend to
        // reach HTML-namespace islands
        e.children.foreach { case el: HElement => walk(el); case _ => () }
      case p: HParent => p.children.foreach(walk)
      case _ => ()
    }
    walk(root)
    out
  }

  def findBody(root: HParent): Option[HElement] = {
    root.children.collectFirst { case e: HElement if e.isHtmlNs && e.name == "html" => e }
      .flatMap(_.children.collectFirst { case e: HElement if e.isHtmlNs && e.name == "body" => e })
      .orElse(root.children.collectFirst { case e: HElement if e.isHtmlNs && e.name == "body" => e })
  }

  def normalizeWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastWs = true
    while (i < s.length) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == '\u00A0'
      if (ws) { if (!lastWs) sb.append(' '); lastWs = true }
      else { sb.append(c); lastWs = false }
      i += 1
    }
    // trim trailing space
    while (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }

  def countWords(s: CharSequence): Int = {
    var i = 0
    var words = 0
    var inWord = false
    while (i < s.length) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == '\u00A0'
      if (!ws && !inWord) { words += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    words
  }

  // -------------------------------------------------------- classification

  /** WSDM-2010 "NumWords/LinkDensity" decision rules (paper §5, the
    * densitometric classifier also used by the public boilerpipe reference
    * implementation), plus a heading-rescue pass: a heading block is kept
    * when one of the next two blocks is content.
    */
  def classify(blocks: Vector[TextBlock]): Array[Boolean] = {
    val b = blocks.toArray // flat indexing: the loop reads 3 neighbors per i
    val n = b.length
    val empty = TextBlock("", 0, 0, "", isHeading = false)
    val content = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val curr = b(i)
      val prev = if (i > 0) b(i - 1) else empty
      val next = if (i + 1 < n) b(i + 1) else empty
      content(i) =
        if (curr.penalized)
          // negative class/id (or nav/aside/footer) subtree: boilerplate
          // unless unmistakably long low-link prose (class-name misuse)
          curr.words >= 40 && curr.linkDensity <= 0.1
        else if (curr.linkDensity > 0.333333) false
        else if (curr.words >= 25 && curr.linkDensity <= 0.1) true // standalone prose
        else if (prev.linkDensity <= 0.555556) {
          curr.words > 16 || next.words > 15 || prev.words > 4
        } else {
          curr.words > 40 || next.words > 17
        }
      i += 1
    }
    // headings announce what follows: keep a heading iff ANY non-heading
    // block within the next three is content (metadata lines — byline,
    // date — commonly sit between a headline and its first paragraph, so
    // "first non-heading" would orphan real headlines).
    i = 0
    while (i < n) {
      if (b(i).isHeading && !b(i).penalized) {
        var j = i + 1
        var verdict = false
        var looked = 0
        while (j < n && looked < 3) {
          if (!b(j).isHeading && content(j)) { verdict = true; looked = 3 }
          else { j += 1; looked += 1 }
        }
        content(i) = verdict && b(i).linkDensity <= 0.333333
      }
      i += 1
    }
    content
  }
}
