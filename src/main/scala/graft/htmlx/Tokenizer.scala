package graft.htmlx

import scala.collection.mutable.ArrayBuffer

/** Append-only attribute list with duplicate-drop on completion.
  * (reference behavior: Core/HtmlAttributes.cs:47-63 — first occurrence of a
  * name wins, later duplicates are discarded with a parse error.)
  */
final class AttrList {
  private val ns = new ArrayBuffer[String](4)
  private val vs = new ArrayBuffer[String](4)
  def size: Int = ns.length
  def name(i: Int): String = ns(i)
  def value(i: Int): String = vs(i)
  private def idx(n: String): Int = {
    // index loop: ArrayBuffer.contains/indexOf allocate a view + iterator
    // per call, and this runs once per parsed attribute
    var i = 0
    val len = ns.length
    while (i < len) { if (ns(i) == n) return i; i += 1 }
    -1
  }
  def contains(n: String): Boolean = idx(n) >= 0
  /** Add; returns false (dropped) if name already present. */
  def add(n: String, v: String): Boolean =
    if (idx(n) >= 0) false else { ns += n; vs += v; true }
  def get(n: String): Option[String] = {
    val i = idx(n); if (i < 0) None else Some(vs(i))
  }
  def setValue(i: Int, v: String): Unit = vs(i) = v
  def rename(i: Int, n: String): Unit = ns(i) = n
  def clear(): Unit = { ns.clear(); vs.clear() }
  def toSeq: Seq[(String, String)] = ns.zip(vs).toSeq
  override def clone: AttrList = {
    val a = new AttrList
    var i = 0
    while (i < size) { a.add(name(i), value(i)); i += 1 }
    a
  }
}

/** Token sink. Character data arrives as runs free of U+0000 (NULs in the
  * data state are routed through [[zeroChar]] so the tree builder can apply
  * mode-dependent handling; reference:
  * Common/ITokenHandler.cs:95 ZeroOriginatingReplacementCharacter).
  */
trait TokenHandler {
  def doctype(name: String, publicId: String, systemId: String, forceQuirks: Boolean): Unit
  def startTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit
  def endTag(name: String): Unit
  def comment(text: String): Unit
  def characters(s: CharSequence, start: Int, end: Int): Unit
  def zeroChar(): Unit
  def eof(): Unit
  /** CDATA sections legal only in foreign content
    * (reference: Core/TreeBuilder.cs:5786-5800). */
  def cdataAllowed: Boolean = false
  def parseError(msg: String): Unit = ()
}

object ContentModel {
  final val Data = 0
  final val Rcdata = 1
  final val Rawtext = 2
  final val Script = 3
  final val Plaintext = 4
}

/** HTML5 tokenizer over a fully-materialized, CR-normalized input string.
  *
  * A fresh WHATWG-spec implementation (spec section 13.2.5). Unlike the
  * reference's resumable 73-state chunked loop (Core/Tokenizer.cs:1367-6428)
  * this works on the whole document per row, so buffer-boundary bookkeeping
  * disappears; the tokenizer⇄tree-builder content-model handshake
  * (reference: Core/Tokenizer.cs:653-722) is kept via [[setContentModel]].
  */
final class Tokenizer(handler: TokenHandler) {
  import ContentModel._

  private var s: String = ""
  private var n = 0
  private var p = 0

  // content model requested by the tree builder for the *next* text run
  private var cmodel = Data
  private var expectedEndTag: String = null

  /** Called by the tree builder from inside a startTag callback. */
  def setContentModel(model: Int, endTag: String): Unit = {
    cmodel = model
    expectedEndTag = endTag
  }

  private var seededModel = false

  /** Pre-seed the content model BEFORE tokenize() — fragment parsing with a
    * rawtext/RCDATA/script context element starts mid-state (spec 13.4 step
    * 2). Survives exactly one tokenize() call's reset. */
  def seedContentModel(model: Int, endTag: String): Unit = {
    setContentModel(model, endTag)
    seededModel = true
  }

  private val textBuf = new java.lang.StringBuilder(256)

  /** Char offset of the scan head — error locator (the whole-doc model makes
    * this free; the reference needed Locator/TaintableLocator plumbing for
    * line:col across chunk boundaries). */
  def position: Int = p

  private def err(m: String): Unit = handler.parseError(s"$m @$p")

  private def flushText(): Unit = {
    if (textBuf.length > 0) {
      handler.characters(textBuf, 0, textBuf.length)
      textBuf.setLength(0)
    }
  }
  private def emitChars(cs: CharSequence): Unit = textBuf.append(cs)
  private def emitChar(c: Char): Unit = textBuf.append(c)

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f'
  private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Tokenize the whole input. Input must already be CR/BOM normalized. */
  def tokenize(input: String): Unit = {
    s = input; n = input.length; p = 0
    if (!seededModel) { cmodel = Data; expectedEndTag = null }
    seededModel = false
    textBuf.setLength(0) // engine reuse: clear scratch from any aborted parse
    while (p < n) {
      cmodel match {
        case Data      => dataState()
        case Rcdata    => rcdataState()
        case Rawtext   => rawLikeState(script = false)
        case Script    => rawLikeState(script = true)
        case Plaintext => plaintextState()
      }
    }
    flushText()
    handler.eof()
  }

  // ---------------------------------------------------------------- data

  private def dataState(): Unit = {
    while (p < n && cmodel == Data) {
      val c = s.charAt(p)
      if (c == '<') { p += 1; tagOpen() }
      else if (c == '&') { p += 1; charRef(inAttr = false, additionalAllowed = '\u0000') }
      else if (c == '\u0000') {
        err("unexpected-null-character")
        flushText(); handler.zeroChar(); p += 1
      } else {
        // fast run scan
        val start = p
        var q = p
        var cc = c
        while (q < n && cc != '<' && cc != '&' && cc != '\u0000') {
          q += 1
          if (q < n) cc = s.charAt(q)
        }
        textBuf.append(s, start, q)
        p = q
      }
    }
  }

  // -------------------------------------------------------------- rcdata

  private def rcdataState(): Unit = {
    // RCDATA: char refs active, "</expected" closes.
    while (p < n && cmodel == Rcdata) {
      val c = s.charAt(p)
      if (c == '&') { p += 1; charRef(inAttr = false, additionalAllowed = '\u0000') }
      else if (c == '<' && matchesExpectedEndTag(p)) { closeRawEndTag() }
      else if (c == '\u0000') { emitChar('�'); p += 1 }
      else if (c == '<') { emitChar('<'); p += 1 }
      else {
        val start = p
        var q = p
        var cc = c
        while (q < n && cc != '<' && cc != '&' && cc != '\u0000') {
          q += 1
          if (q < n) cc = s.charAt(q)
        }
        textBuf.append(s, start, q)
        p = q
      }
    }
    if (p >= n) cmodel = Data
  }

  /** RAWTEXT and SCRIPT DATA. For script data we honor the escaped /
    * double-escaped comment dance (spec 13.2.5.17-29): inside
    * <!-- ... -->, "<script>...</script>" spans stay text and do NOT close
    * the element.
    */
  private def rawLikeState(script: Boolean): Unit = {
    var escaped = false       // inside <!--  (script only)
    var doubleEscaped = false // inside <!-- <script  (script only)
    val active = if (script) Script else Rawtext
    while (p < n && cmodel == active) {
      val c = s.charAt(p)
      if (c == '\u0000') { emitChar('�'); p += 1 }
      else if (c == '<') {
        if (script && !escaped && p + 3 < n && s.charAt(p + 1) == '!' &&
            s.charAt(p + 2) == '-' && s.charAt(p + 3) == '-') {
          escaped = true; doubleEscaped = false
          textBuf.append("<!--"); p += 4
          // spec: "<!-->"/"<!--->" close the escape immediately
          // (script-data-escaped-dash-dash state)
          while (p < n && s.charAt(p) == '-') { emitChar('-'); p += 1 }
          if (p < n && s.charAt(p) == '>') { emitChar('>'); p += 1; escaped = false }
        } else if (script && escaped && !doubleEscaped && isDoubleEscapeEntry(p)) {
          doubleEscaped = true
          // emit "<script" and continue; chars copied by generic path below
          emitChar('<'); p += 1
        } else if (matchesExpectedEndTag(p) && !(script && doubleEscaped)) {
          closeRawEndTag()
          escaped = false; doubleEscaped = false
        } else if (script && doubleEscaped && matchesExpectedEndTag(p)) {
          // "</script" inside double-escaped: text, leaves double-escape
          doubleEscaped = false
          emitChar('<'); p += 1
        } else { emitChar('<'); p += 1 }
      } else if (script && escaped && c == '-' && p + 2 < n &&
                 s.charAt(p + 1) == '-' && s.charAt(p + 2) == '>') {
        escaped = false; doubleEscaped = false
        textBuf.append("-->"); p += 3
      } else {
        emitChar(c); p += 1
      }
    }
    if (p >= n) cmodel = Data
  }

  /** At '<' in script-data-escaped: does "<scriptWS-or-/-or->" follow? */
  private def isDoubleEscapeEntry(at: Int): Boolean = {
    var q = at + 1
    var i = 0
    val tag = "script"
    while (i < tag.length && q < n && lower(s.charAt(q)) == tag.charAt(i)) { q += 1; i += 1 }
    i == tag.length && q < n && (isWs(s.charAt(q)) || s.charAt(q) == '/' || s.charAt(q) == '>')
  }

  /** Is `</expectedEndTag` followed by ws, '/', or '>' at position `at`?
    * EOF right after the complete name is NOT a match: the end-tag-name
    * state has no EOF entry, so EOF falls to "anything else" — emit "</" +
    * temp buffer as text and reconsume (then EOF in the data-like state).
    * The non-match routes the caller to the plain emitChar('<') path, which
    * replays the same characters as text. */
  private def matchesExpectedEndTag(at: Int): Boolean = {
    if (expectedEndTag == null) return false
    var q = at + 1
    if (q >= n || s.charAt(q) != '/') return false
    q += 1
    var i = 0
    val tag = expectedEndTag
    while (i < tag.length) {
      if (q >= n || lower(s.charAt(q)) != tag.charAt(i)) return false
      q += 1; i += 1
    }
    q < n && (isWs(s.charAt(q)) || s.charAt(q) == '/' || s.charAt(q) == '>')
  }

  /** Consume `</name ...>`, emit the end tag, return to data. */
  private def closeRawEndTag(): Unit = {
    flushText()
    p += 2 + expectedEndTag.length // past "</name"
    // skip attributes-ish junk until '>' (spec parses attrs then drops them)
    val savedName = expectedEndTag
    cmodel = Data
    expectedEndTag = null
    // spec: after the name, ws → before-attribute-name, '/' → self-closing,
    // '>' → emit. Attributes on an end tag are a parse error and dropped.
    var done = false
    while (!done && p < n) {
      val c = s.charAt(p)
      if (c == '>') { p += 1; done = true }
      else if (isWs(c) || c == '/') p += 1
      else { // junk attr content: consume a pseudo-attribute blob
        consumeTagRemainder()
        done = true
      }
    }
    // EOF before '>' (sentinel p = n + 1 from tagAttributes, or the loop ran
    // dry): spec eof-in-tag — the end tag token is dropped, the element stays
    // open, and the consumed "</name ..." chars are not re-emitted as text.
    if (done && p <= n) handler.endTag(savedName)
    else err("eof-in-tag")
  }

  /** Consume remaining attribute soup of a tag up to and incl '>'. */
  private def consumeTagRemainder(): Unit = {
    junkAttrs.clear()
    tagAttributes(junkAttrs)
  }

  private def plaintextState(): Unit = {
    while (p < n) {
      val c = s.charAt(p)
      if (c == '\u0000') { emitChar('�') } else emitChar(c)
      p += 1
    }
    cmodel = Data
  }

  // ------------------------------------------------------------- tag open

  private def tagOpen(): Unit = {
    if (p >= n) { emitChar('<'); return }
    val c = s.charAt(p)
    if (c == '!') { p += 1; markupDeclOpen() }
    else if (c == '/') { p += 1; endTagOpen() }
    else if (isLetter(c)) { startTagName() }
    else if (c == '?') {
      err("unexpected-question-mark-instead-of-tag-name")
      bogusComment(p)
    } else {
      err("invalid-first-character-of-tag-name")
      emitChar('<')
      // reconsume in data
    }
  }

  private def endTagOpen(): Unit = {
    if (p >= n) { emitChars("</"); return }
    val c = s.charAt(p)
    if (isLetter(c)) { endTagName() }
    else if (c == '>') { err("missing-end-tag-name"); p += 1 }
    else { err("invalid-first-character-of-tag-name"); bogusComment(p) }
  }

  private val tagNameBuf = new java.lang.StringBuilder(16)

  private def readTagName(): String = {
    val sb = tagNameBuf
    sb.setLength(0)
    var done = false
    while (!done && p < n) {
      val c = s.charAt(p)
      if (isWs(c) || c == '/' || c == '>') done = true
      else if (c == '\u0000') { sb.append('�'); p += 1 }
      else { sb.append(lower(c)); p += 1 }
    }
    sb.toString
  }

  private val attrs = new AttrList
  private val junkAttrs = new AttrList

  private def startTagName(): Unit = {
    flushText()
    val name = readTagName()
    if (p >= n) { err("eof-in-tag"); return }
    attrs.clear()
    val selfClosing = tagAttributes(attrs)
    if (p > n) { err("eof-in-tag"); return }
    emitStartTag(name, attrs, selfClosing)
  }

  private def emitStartTag(name: String, a: AttrList, selfClosing: Boolean): Unit = {
    // handler may switch the content model (RCDATA/RAWTEXT/script/plaintext)
    cmodel = Data; expectedEndTag = null
    handler.startTag(name, a, selfClosing)
  }

  private def endTagName(): Unit = {
    flushText()
    val name = readTagName()
    if (p >= n) { err("eof-in-tag"); return }
    junkAttrs.clear()
    val selfClosing = tagAttributes(junkAttrs)
    if (p > n) { err("eof-in-tag"); return }
    if (junkAttrs.size > 0) err("end-tag-with-attributes")
    if (selfClosing) err("end-tag-with-trailing-solidus")
    handler.endTag(name)
  }

  /** Parse attribute list; consumes through '>'. Returns selfClosing.
    * On EOF, sets p = n + 1 as a sentinel (caller checks p > n).
    */
  private def tagAttributes(a: AttrList): Boolean = {
    var selfClosing = false
    var done = false
    while (!done) {
      if (p >= n) { p = n + 1; return false }
      val c = s.charAt(p)
      if (isWs(c)) p += 1
      else if (c == '>') { p += 1; done = true }
      else if (c == '/') {
        // self-closing only if immediately followed by '>'
        if (p + 1 < n && s.charAt(p + 1) == '>') { selfClosing = true; p += 2; done = true }
        else { err("unexpected-solidus-in-tag"); p += 1 }
      } else {
        attribute(a)
      }
    }
    selfClosing
  }

  private def attribute(a: AttrList): Unit = {
    // attribute name
    val nb = new java.lang.StringBuilder(8)
    if (p < n && (s.charAt(p) == '=' )) { // "=foo" → name starts with '='
      err("unexpected-equals-sign-before-attribute-name")
      nb.append('='); p += 1
    }
    var nameDone = false
    while (!nameDone && p < n) {
      val c = s.charAt(p)
      if (isWs(c) || c == '/' || c == '>' || c == '=') nameDone = true
      else if (c == '\u0000') { nb.append('�'); p += 1 }
      else if (c == '"' || c == '\'' || c == '<') {
        err("unexpected-character-in-attribute-name"); nb.append(c); p += 1
      } else { nb.append(lower(c)); p += 1 }
    }
    val name = nb.toString
    // after name: ws* then optional = value
    while (p < n && isWs(s.charAt(p))) p += 1
    var value = ""
    if (p < n && s.charAt(p) == '=') {
      p += 1
      while (p < n && isWs(s.charAt(p))) p += 1
      if (p < n) {
        val q = s.charAt(p)
        if (q == '"' || q == '\'') { p += 1; value = quotedAttrValue(q) }
        else if (q == '>') { err("missing-attribute-value") }
        else value = unquotedAttrValue()
      }
    }
    if (p >= n) { /* EOF in tag — attr still recorded, caller sees EOF */ }
    if (!a.add(name, value)) err("duplicate-attribute")
  }

  private val attrValBuf = new java.lang.StringBuilder(16)

  private def quotedAttrValue(quote: Char): String = {
    attrValBuf.setLength(0)
    var done = false
    while (!done && p < n) {
      val c = s.charAt(p)
      if (c == quote) { p += 1; done = true }
      else if (c == '&') { p += 1; charRefToBuf(attrValBuf, inAttr = true, additionalAllowed = quote) }
      else if (c == '\u0000') { attrValBuf.append('�'); p += 1 }
      else { attrValBuf.append(c); p += 1 }
    }
    attrValBuf.toString
  }

  private def unquotedAttrValue(): String = {
    attrValBuf.setLength(0)
    var done = false
    while (!done && p < n) {
      val c = s.charAt(p)
      if (isWs(c) || c == '>') done = true
      else if (c == '&') { p += 1; charRefToBuf(attrValBuf, inAttr = true, additionalAllowed = '>') }
      else if (c == '\u0000') { attrValBuf.append('�'); p += 1 }
      else {
        if (c == '"' || c == '\'' || c == '<' || c == '=' || c == '`')
          err("unexpected-character-in-unquoted-attribute-value")
        attrValBuf.append(c); p += 1
      }
    }
    attrValBuf.toString
  }

  // --------------------------------------------------------- markup decl

  private def markupDeclOpen(): Unit = {
    if (regionMatchesCI(p, "--")) { p += 2; commentStart() }
    else if (regionMatchesCI(p, "doctype")) { p += 7; doctypeState() }
    else if (s.regionMatches(p, "[CDATA[", 0, 7)) {
      if (handler.cdataAllowed) { p += 7; cdataSection() }
      else { err("cdata-in-html-content"); bogusComment(p) }
    } else {
      err("incorrectly-opened-comment")
      bogusComment(p)
    }
  }

  private def regionMatchesCI(at: Int, what: String): Boolean =
    s.regionMatches(true, at, what, 0, what.length)

  private def bogusComment(from: Int): Unit = {
    flushText()
    val sb = new java.lang.StringBuilder
    var q = from
    var done = false
    while (!done && q < n) {
      val c = s.charAt(q)
      if (c == '>') { done = true; q += 1 }
      else { sb.append(if (c == '\u0000') '�' else c); q += 1 }
    }
    p = q
    handler.comment(sb.toString)
  }

  private def commentStart(): Unit = {
    flushText()
    val sb = new java.lang.StringBuilder
    // handle <!--> and <!---> immediate closes
    if (p < n && s.charAt(p) == '>') { err("abrupt-closing-of-empty-comment"); p += 1; handler.comment(""); return }
    if (p + 1 < n && s.charAt(p) == '-' && s.charAt(p + 1) == '>') {
      err("abrupt-closing-of-empty-comment"); p += 2; handler.comment(""); return
    }
    var done = false
    while (!done) {
      if (p >= n) { err("eof-in-comment"); handler.comment(sb.toString); handlerEofAfter(); return }
      val c = s.charAt(p)
      if (c == '-') {
        // count dashes then check close
        if (p + 1 < n && s.charAt(p + 1) == '-') {
          // potential end: --> or --!> or more dashes
          var q = p
          while (q < n && s.charAt(q) == '-') q += 1
          val dashes = q - p
          if (q < n && s.charAt(q) == '>' && dashes >= 2) {
            // emit all but last two dashes as text
            var i = 0
            while (i < dashes - 2) { sb.append('-'); i += 1 }
            p = q + 1
            done = true
          } else if (q + 1 < n && s.charAt(q) == '!' && s.charAt(q + 1) == '>' && dashes >= 2) {
            err("incorrectly-closed-comment")
            var i = 0
            while (i < dashes - 2) { sb.append('-'); i += 1 }
            p = q + 2
            done = true
          } else if (q + 1 >= n && q < n && s.charAt(q) == '!' && dashes >= 2) {
            // EOF right after "--…-!": comment-end-bang state at EOF emits
            // the data as-is — the would-be "--!" is dropped, extra dashes
            // beyond the first two were already folded into the data
            err("eof-in-comment")
            var i = 0
            while (i < dashes - 2) { sb.append('-'); i += 1 }
            p = n
            handler.comment(sb.toString); handlerEofAfter(); return
          } else if (q >= n) {
            // EOF with pending close-dashes: the comment-end(-dash) states
            // only fold dashes into the data when a non-close char follows;
            // at EOF the last two (the would-be "--" of "-->") are dropped
            err("eof-in-comment")
            var i = 0
            while (i < dashes - 2) { sb.append('-'); i += 1 }
            p = q
            handler.comment(sb.toString); handlerEofAfter(); return
          } else {
            var i = 0
            while (i < dashes) { sb.append('-'); i += 1 }
            p = q
          }
        } else if (p + 1 >= n) {
          // lone dash at EOF = comment-end-dash state at EOF: dropped
          err("eof-in-comment")
          p += 1
          handler.comment(sb.toString); handlerEofAfter(); return
        } else { sb.append('-'); p += 1 }
      } else if (c == '\u0000') { sb.append('�'); p += 1 }
      else { sb.append(c); p += 1 }
    }
    handler.comment(sb.toString)
  }

  /** Marks EOF reached mid-construct: force outer loop to end. */
  private def handlerEofAfter(): Unit = { p = n }

  // -------------------------------------------------------------- doctype

  private def doctypeState(): Unit = {
    flushText()
    var name: String = null
    var publicId: String = null
    var systemId: String = null
    var forceQuirks = false

    def emit(): Unit = handler.doctype(name, publicId, systemId, forceQuirks)

    if (p >= n) { err("eof-in-doctype"); forceQuirks = true; emit(); return }
    if (!isWs(s.charAt(p)) && s.charAt(p) != '>') err("missing-whitespace-before-doctype-name")
    while (p < n && isWs(s.charAt(p))) p += 1
    if (p >= n) { err("eof-in-doctype"); forceQuirks = true; emit(); return }
    if (s.charAt(p) == '>') { err("missing-doctype-name"); forceQuirks = true; p += 1; emit(); return }
    // doctype name
    val nb = new java.lang.StringBuilder
    while (p < n && !isWs(s.charAt(p)) && s.charAt(p) != '>') {
      val c = s.charAt(p)
      nb.append(if (c == '\u0000') '�' else lower(c))
      p += 1
    }
    name = nb.toString
    if (p >= n) { err("eof-in-doctype"); forceQuirks = true; emit(); return }
    while (p < n && isWs(s.charAt(p))) p += 1
    if (p >= n) { err("eof-in-doctype"); forceQuirks = true; emit(); return }
    if (s.charAt(p) == '>') { p += 1; emit(); return }
    // PUBLIC or SYSTEM keyword
    if (regionMatchesCI(p, "public")) {
      p += 6
      publicId = doctypeId(() => forceQuirks = true)
      if (publicId != null && p <= n) {
        // optional system id after public
        while (p < n && isWs(s.charAt(p))) p += 1
        if (p < n && s.charAt(p) != '>') {
          val c = s.charAt(p)
          if (c == '"' || c == '\'') systemId = quotedDoctypeId(c, () => forceQuirks = true)
          else { err("bogus-after-public-id"); forceQuirks = true; bogusDoctypeRest() }
        }
      }
    } else if (regionMatchesCI(p, "system")) {
      p += 6
      systemId = doctypeId(() => forceQuirks = true)
    } else {
      err("invalid-character-sequence-after-doctype-name")
      forceQuirks = true
      bogusDoctypeRest()
    }
    if (p >= n) { err("eof-in-doctype"); forceQuirks = true; emit(); return }
    // expect ws* '>' (or bogus)
    while (p < n && isWs(s.charAt(p))) p += 1
    if (p >= n) { err("eof-in-doctype"); forceQuirks = true; emit(); return }
    if (s.charAt(p) == '>') { p += 1 }
    else {
      err("bogus-doctype"); bogusDoctypeRest()
      // unlike the other call sites this one doesn't rejoin the common
      // tail, so consume the terminating '>' here or it re-enters the
      // data state as a stray text character
      if (p < n) p += 1
    }
    emit()
  }

  /** After PUBLIC/SYSTEM keyword: ws* quoted id. Returns id or null. */
  private def doctypeId(quirk: () => Unit): String = {
    if (p < n && !isWs(s.charAt(p)) && s.charAt(p) != '"' && s.charAt(p) != '\'')
      err("missing-whitespace-after-doctype-keyword")
    while (p < n && isWs(s.charAt(p))) p += 1
    if (p >= n) { err("eof-in-doctype"); quirk(); return null }
    val c = s.charAt(p)
    if (c == '"' || c == '\'') quotedDoctypeId(c, quirk)
    else if (c == '>') { err("missing-doctype-id"); quirk(); null }
    else { err("missing-quote-before-doctype-id"); quirk(); bogusDoctypeRest(); null }
  }

  private def quotedDoctypeId(quote: Char, quirk: () => Unit): String = {
    p += 1
    val sb = new java.lang.StringBuilder
    var done = false
    while (!done && p < n) {
      val c = s.charAt(p)
      if (c == quote) { p += 1; done = true }
      else if (c == '>') { err("abrupt-doctype-id"); quirk(); done = true }
      else { sb.append(if (c == '\u0000') '�' else c); p += 1 }
    }
    if (p >= n && !done) { quirk() }
    sb.toString
  }

  /** Consume up to (not incl.) '>' or EOF; leaves p at '>' handled by caller. */
  private def bogusDoctypeRest(): Unit = {
    while (p < n && s.charAt(p) != '>') p += 1
    // leave '>' for caller? No — caller expects us to stop right before emit.
  }

  // ---------------------------------------------------------------- cdata

  private def cdataSection(): Unit = {
    val end = s.indexOf("]]>", p)
    val stop = if (end < 0) n else end
    if (stop > p) textBuf.append(s, p, stop)
    p = if (end < 0) n else end + 3
    if (end < 0) err("eof-in-cdata")
  }

  // ------------------------------------------------------ char references

  private def charRef(inAttr: Boolean, additionalAllowed: Char): Unit =
    charRefToBuf(textBuf, inAttr, additionalAllowed)

  /** `p` is just past '&'. Appends decoded text (or literal) to `out`. */
  private def charRefToBuf(out: java.lang.StringBuilder, inAttr: Boolean, additionalAllowed: Char): Unit = {
    if (p >= n) { out.append('&'); return }
    val c = s.charAt(p)
    if (isWs(c) || c == '<' || c == '&' || c == '\u0000' ||
        (additionalAllowed != '\u0000' && c == additionalAllowed)) {
      out.append('&'); return
    }
    if (c == '#') {
      numericCharRef(out)
      return
    }
    val (len, value, semi) = Entities.longestMatch(s, p)
    if (len == 0) {
      // spec: if chars consumed are alphanumeric + ';' → unknown-named error
      out.append('&')
      return
    }
    if (!semi) {
      err("missing-semicolon-after-character-reference")
      if (inAttr) {
        val nextIdx = p + len
        if (nextIdx < n) {
          val nc = s.charAt(nextIdx)
          // ASCII alphanumeric ONLY (spec "ASCII alphanumeric"; reference
          // Tokenizer.cs:3417-3419 uses the same three ranges) — a
          // Unicode-wide isLetterOrDigit would wrongly suppress the legacy
          // decode before non-ASCII followers like 'é' (found by the
          // non-ASCII char-ref fuzz battery)
          if (nc == '=' || (nc >= '0' && nc <= '9') ||
              (nc >= 'A' && nc <= 'Z') || (nc >= 'a' && nc <= 'z')) {
            // historical: do not decode
            out.append('&')
            return
          }
        }
      }
    }
    out.append(value)
    p += len
  }

  private def numericCharRef(out: java.lang.StringBuilder): Unit = {
    // p at '#'; the digit fold lives in Entities.parseNumeric (shared with
    // the decode_entities scalar function)
    val (consumed, repl, semi) = Entities.parseNumeric(s, p)
    if (consumed == 0) {
      err("absence-of-digits-in-numeric-character-reference")
      out.append('&') // '#' and any 'x' emitted literally by falling through
      return
    }
    if (!semi) err("missing-semicolon-after-character-reference")
    p += consumed
    out.append(repl)
  }
}
