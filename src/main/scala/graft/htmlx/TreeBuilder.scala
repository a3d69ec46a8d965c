package graft.htmlx

import scala.collection.mutable.ArrayBuffer

/** Insertion modes (spec 13.2.4.1; reference: Core/InsertionMode.cs:29-74 —
  * same set PLUS InTemplate, which the reference predates: this engine
  * implements the spec's "in template" mode so template innards parse into
  * a separate contents fragment instead of leaking into the body). */
object Mode {
  final val Initial = 0
  final val BeforeHtml = 1
  final val BeforeHead = 2
  final val InHead = 3
  final val InHeadNoscript = 4
  final val AfterHead = 5
  final val InBody = 6
  final val InTable = 7
  final val InCaption = 8
  final val InColumnGroup = 9
  final val InTableBody = 10
  final val InRow = 11
  final val InCell = 12
  final val InSelect = 13
  final val InSelectInTable = 14
  final val AfterBody = 15
  final val InFrameset = 16
  final val AfterFrameset = 17
  final val AfterAfterBody = 18
  final val AfterAfterFrameset = 19
  final val Text = 20
  final val InTemplate = 21
}

/** HTML5 tree construction (spec 13.2.6), fresh implementation.
  *
  * Matches the reference's architecture decisions where they are semantic:
  * same insertion-mode set (no <template>), scripting disabled (reference:
  * SimpleHtmlParser.cs:85 passes false), adoption agency + foster parenting
  * + active-formatting reconstruction per spec (reference:
  * Core/TreeBuilder.cs:4679,5077,5017), text runs coalesced into single
  * nodes (reference: Core/CoalescingTreeBuilder.cs:33-81).
  */
final class TreeBuilder extends TokenHandler {
  import Mode._
  import SpecNames._

  var tokenizer: Tokenizer = _

  var doc = new HDocument
  private var fragmentRoot: HElement = null
  private var contextName: String = null
  private var contextNs: String = Ns.html
  def isFragment: Boolean = contextName != null

  final class StackEntry(val name: String, val ns: String, val node: HElement)
  private val stack = new ArrayBuffer[StackEntry](32)

  /** Active formatting list entry; element null ⇒ marker. */
  final class AfeEntry(var element: HElement, val name: String, val attrs: AttrList)
  private val afe = new ArrayBuffer[AfeEntry](8)
  private val MarkerEntry: AfeEntry = null // represented by literal null in list

  private var mode = Initial
  private var originalMode = Initial
  private var framesetOk = true
  private var headElem: HElement = null
  private var formElem: HElement = null
  private var needToDropLF = false
  private var fosterEnabled = false
  private var quirks = false

  // pending "in table text"
  private var tableTextPending = false
  private val tableText = new java.lang.StringBuilder

  /** Stack of template insertion modes (spec 13.2.4.1). */
  private val templateModes = new ArrayBuffer[Int](4)
  private def hasTemplateOnStack: Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      if ((stack(i).ns eq Ns.html) && stack(i).name == "template") return true
      i -= 1
    }
    false
  }
  private def popTemplateMode(): Unit =
    if (templateModes.nonEmpty) templateModes.remove(templateModes.length - 1)

  var detectedCharset: String = null
  val errors = new ArrayBuffer[String](8)
  private val maxErrors = 32
  /** Tree-builder errors carry the tokenizer's char offset (position of the
    * token that triggered them); tokenizer errors arrive pre-annotated. */
  private def err(m: String): Unit = if (errors.length < maxErrors) {
    errors += (if (tokenizer != null) s"$m @${tokenizer.position}" else m)
  }
  override def parseError(msg: String): Unit =
    if (errors.length < maxErrors) errors += msg

  // ------------------------------------------------------------- plumbing

  private def current: StackEntry = stack(stack.length - 1)
  private def currentNode: HElement = current.node

  private def adjustedCurrent: StackEntry =
    if (isFragment && stack.length == 1) contextEntry else current
  private var contextEntry: StackEntry = null

  def setFragmentContext(name: String, ns: String = Ns.html): Unit = {
    contextName = name
    contextNs = ns
    fragmentRoot = new HElement("html", Ns.html, new AttrList)
    doc.appendChild(fragmentRoot)
    stack += new StackEntry("html", Ns.html, fragmentRoot)
    contextEntry = new StackEntry(name, ns, new HElement(name, ns, new AttrList))
    // spec 13.4 step 12: the form pointer is the nearest form ancestor of
    // the context (the context itself in this name-only API) — nested
    // <form> start tags inside a form fragment are then ignored
    if ((ns eq Ns.html) && name == "form") formElem = contextEntry.node
    // spec 13.4: a template context seeds the template-modes stack so
    // resetInsertionMode lands in "in template"
    if ((ns eq Ns.html) && name == "template") templateModes += InTemplate
    resetInsertionMode()
    if (ns eq Ns.html) name match {
      case "title" | "textarea" => tokenizer.seedContentModel(ContentModel.Rcdata, name)
      case "style" | "xmp" | "iframe" | "noembed" | "noframes" =>
        tokenizer.seedContentModel(ContentModel.Rawtext, name)
      case "script" => tokenizer.seedContentModel(ContentModel.Script, name)
      case "plaintext" => tokenizer.seedContentModel(ContentModel.Plaintext, null)
      case _ => ()
    }
  }

  def fragmentResult: HFragment = {
    val f = new HFragment
    fragmentRoot.moveChildrenTo(f)
    f
  }

  private def push(name: String, ns: String, node: HElement): Unit =
    stack += new StackEntry(name, ns, node)
  /** Never pops the root html entry: spec-conformant flows never reach it,
    * but the depth-cap degraded mode can (insertElement skips the push at
    * `maxStackDepth` while e.g. select/hr, isindex, and Text-mode handlers
    * pop unconditionally) — without the floor a hostile 512-deep document
    * could drain the stack and crash the next `current` access. */
  private def pop(): StackEntry =
    if (stack.length == 1) current
    else stack.remove(stack.length - 1)

  /** A template element's insertion parent is its contents fragment
    * (spec 13.2.6.1 final step: "if the adjusted insertion location is
    * inside a template element, let it instead be inside the template
    * element's template contents"). */
  private def asInsertionParent(e: HElement): HParent =
    if (e.templateContents != null) e.templateContents else e

  /** Appropriate place for inserting a node (spec 13.2.6.1). Returns
    * (parent, before-or-null). */
  private def insertionPlace(overrideTarget: HElement = null): (HParent, HNode) = {
    val target = if (overrideTarget != null) overrideTarget else currentNode
    val tn = if (overrideTarget != null) null else current.name
    val targetName = if (overrideTarget != null) targetNameOf(overrideTarget) else tn
    if (fosterEnabled && fosterTargets(targetName))
      fosterPlaceForTable()
    else (asInsertionParent(target), null)
  }

  private def targetNameOf(e: HElement): String = if (e.ns eq Ns.html) e.name else ""

  private def insertNodeAt(place: (HParent, HNode), node: HNode): Unit = {
    val (parent, before) = place
    if (before == null) parent.appendChild(node) else parent.insertBefore(node, before)
  }

  /** Open-elements depth cap (Blink uses 512): beyond it new elements are
    * inserted but not pushed, flattening pathological nesting instead of
    * risking unbounded stacks / downstream recursion overflow. */
  private val maxStackDepth = 512

  private def insertElement(name: String, attrs: AttrList, ns: String = Ns.html): HElement = {
    val e = new HElement(name, ns, attrs.clone)
    if ((ns eq Ns.html) && name == "template") e.templateContents = new HFragment
    insertNodeAt(insertionPlace(), e)
    if (stack.length < maxStackDepth) push(name, ns, e)
    else err("tree depth limit reached")
    e
  }

  private def insertVoid(name: String, attrs: AttrList): HElement = {
    val e = new HElement(name, Ns.html, attrs.clone)
    insertNodeAt(insertionPlace(), e)
    e
  }

  private def insertChars(cs: CharSequence, from: Int, to: Int): Unit = {
    if (to <= from) return
    val (parent, before) = insertionPlace()
    if (parent.isInstanceOf[HDocument]) return // dropped (spec)
    if (before == null) {
      val n = parent.children.length
      if (n > 0 && parent.children(n - 1).isInstanceOf[HText])
        parent.children(n - 1).asInstanceOf[HText].sb.append(cs, from, to)
      else {
        val t = new HText("")
        t.sb.append(cs, from, to)
        parent.appendChild(t)
      }
    } else {
      // foster: if node before `before` is text, merge
      val i = parent.children.indexOf(before)
      if (i > 0 && parent.children(i - 1).isInstanceOf[HText])
        parent.children(i - 1).asInstanceOf[HText].sb.append(cs, from, to)
      else {
        val t = new HText("")
        t.sb.append(cs, from, to)
        parent.insertBefore(t, before)
      }
    }
  }

  private def insertComment(text: String): Unit =
    insertNodeAt(insertionPlace(), new HComment(text))

  // --------------------------------------------------------------- scopes

  private def isScopeBarrier(e: StackEntry): Boolean =
    if (e.ns eq Ns.html) defaultScope.contains(e.name)
    else if (e.ns eq Ns.svg) e.name == "foreignObject" || e.name == "desc" || e.name == "title"
    else if (e.ns eq Ns.mathml) specialMathml.contains(e.name)
    else false

  private def hasInScope(name: String): Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      val e = stack(i)
      if ((e.ns eq Ns.html) && e.name == name) return true
      if (isScopeBarrier(e)) return false
      i -= 1
    }
    false
  }

  private def hasInScopeElem(elem: HElement): Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      val e = stack(i)
      if (e.node eq elem) return true
      if (isScopeBarrier(e)) return false
      i -= 1
    }
    false
  }

  private def hasInListItemScope(name: String): Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      val e = stack(i)
      if ((e.ns eq Ns.html) && e.name == name) return true
      if (isScopeBarrier(e) || ((e.ns eq Ns.html) && (e.name == "ol" || e.name == "ul"))) return false
      i -= 1
    }
    false
  }

  private def hasInButtonScope(name: String): Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      val e = stack(i)
      if ((e.ns eq Ns.html) && e.name == name) return true
      if (isScopeBarrier(e) || ((e.ns eq Ns.html) && e.name == "button")) return false
      i -= 1
    }
    false
  }

  private def hasInTableScope(name: String): Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      val e = stack(i)
      if ((e.ns eq Ns.html) && e.name == name) return true
      if ((e.ns eq Ns.html) &&
          (e.name == "html" || e.name == "table" || e.name == "template")) return false
      i -= 1
    }
    false
  }

  private def hasAnyHeadingInScope: Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      val e = stack(i)
      if ((e.ns eq Ns.html) && headings.contains(e.name)) return true
      if (isScopeBarrier(e)) return false
      i -= 1
    }
    false
  }

  private def hasInSelectScope(name: String): Boolean = {
    var i = stack.length - 1
    while (i >= 0) {
      val e = stack(i)
      if ((e.ns eq Ns.html) && e.name == name) return true
      if (!((e.ns eq Ns.html) && (e.name == "option" || e.name == "optgroup"))) return false
      i -= 1
    }
    false
  }

  private def popUntil(name: String): Unit = {
    var done = false
    while (!done && stack.length > 1) {
      val e = pop()
      if ((e.ns eq Ns.html) && e.name == name) done = true
    }
  }

  private def popUntilElem(elem: HElement): Unit = {
    var done = false
    while (!done && stack.length > 1) {
      val e = pop()
      if (e.node eq elem) done = true
    }
  }

  private def generateImpliedEndTags(except: String = null): Unit = {
    var go = true
    while (go && stack.nonEmpty) {
      val e = current
      if ((e.ns eq Ns.html) && impliedEnd.contains(e.name) && e.name != except) pop()
      else go = false
    }
  }

  /** "Generate all implied end tags thoroughly" (spec 13.2.6.3; </template>). */
  private def generateImpliedEndTagsThoroughly(): Unit = {
    var go = true
    while (go && stack.nonEmpty) {
      val e = current
      if ((e.ns eq Ns.html) && impliedEndThorough.contains(e.name)) pop()
      else go = false
    }
  }

  private def closeP(): Unit = {
    generateImpliedEndTags("p")
    if (!((current.ns eq Ns.html) && current.name == "p")) err("unclosed elements on p close")
    popUntil("p")
  }

  private def closePIfInButtonScope(): Unit = if (hasInButtonScope("p")) closeP()

  // ------------------------------------------- active formatting elements

  private def afePushMarker(): Unit = afe += MarkerEntry

  private def afePush(elem: HElement, name: String, attrs: AttrList): Unit = {
    // Noah's ark: at most 3 entries with identical name+attrs after last marker
    // (reference: Core/TreeBuilder.cs:4927 MaybeForgetEarlierDuplicateFormattingElement)
    var count = 0
    var candidate = -1
    var i = afe.length - 1
    var stop = false
    while (i >= 0 && !stop) {
      val e = afe(i)
      if (e == null) stop = true
      else if (e.name == name && sameAttrs(e.attrs, attrs)) { count += 1; candidate = i }
      i -= 1
    }
    if (count >= 3 && candidate >= 0) afe.remove(candidate)
    // cap the list against pathological streams of distinct formatting
    // elements (reconstruction is O(|afe|) per text insertion)
    if (afe.length >= 256) {
      val drop = afe.indexWhere(_ != null)
      if (drop >= 0) afe.remove(drop)
    }
    afe += new AfeEntry(elem, name, attrs.clone)
  }

  private def sameAttrs(a: AttrList, b: AttrList): Boolean = {
    if (a.size != b.size) return false
    var i = 0
    while (i < a.size) {
      b.get(a.name(i)) match {
        case Some(v) if v == a.value(i) => ()
        case _ => return false
      }
      i += 1
    }
    true
  }

  private def afeIndexOfElem(elem: HElement): Int = {
    var i = afe.length - 1
    while (i >= 0) {
      val e = afe(i)
      if (e != null && (e.element eq elem)) return i
      i -= 1
    }
    -1
  }

  private def stackIndexOfElem(elem: HElement): Int = {
    var i = stack.length - 1
    while (i >= 0) {
      if (stack(i).node eq elem) return i
      i -= 1
    }
    -1
  }

  private def clearAfeToMarker(): Unit = {
    var done = false
    while (!done && afe.nonEmpty) {
      val e = afe.remove(afe.length - 1)
      if (e == null) done = true
    }
  }

  private def reconstructAfe(): Unit = {
    if (afe.isEmpty) return
    if (stack.length >= maxStackDepth) return // depth cap (see insertElement)
    val last = afe(afe.length - 1)
    if (last == null || stackIndexOfElem(last.element) >= 0) return
    var i = afe.length - 1
    var rewound = false
    while (!rewound) {
      if (i == 0) rewound = true
      else {
        val prev = afe(i - 1)
        if (prev == null || stackIndexOfElem(prev.element) >= 0) rewound = true
        else i -= 1
      }
    }
    while (i < afe.length) {
      val entry = afe(i)
      val e = new HElement(entry.name, Ns.html, entry.attrs.clone)
      insertNodeAt(insertionPlace(), e)
      push(entry.name, Ns.html, e)
      afe(i) = new AfeEntry(e, entry.name, entry.attrs)
      i += 1
    }
  }

  // ----------------------------------------------------- adoption agency

  /** The adoption agency algorithm (spec 13.2.6.4.7 "in body" formatting end
    * tags; reference: Core/TreeBuilder.cs:4679-4863). Returns true if the
    * token was fully handled; false ⇒ caller runs "any other end tag".
    */
  private def adoptionAgency(subject: String): Boolean = {
    if ((current.ns eq Ns.html) && current.name == subject &&
        afeIndexOfElem(currentNode) < 0) {
      pop()
      return true
    }
    var outer = 0
    while (outer < 8) {
      outer += 1
      // locate formatting element
      var fi = -1
      var i = afe.length - 1
      var stop = false
      while (i >= 0 && !stop) {
        val e = afe(i)
        if (e == null) stop = true
        else if (e.name == subject) { fi = i; stop = true }
        i -= 1
      }
      if (fi < 0) return false
      val fmtEntry = afe(fi)
      val fmtElem = fmtEntry.element
      val si = stackIndexOfElem(fmtElem)
      if (si < 0) { err("formatting element not in stack"); afe.remove(fi); return true }
      if (!hasInScopeElem(fmtElem)) { err("formatting element not in scope"); return true }
      if (!(currentNode eq fmtElem)) err("unclosed elements in adoption agency")
      // furthest block
      var fb = -1
      var j = si + 1
      while (j < stack.length && fb < 0) {
        if (isSpecial(stack(j).name, stack(j).ns)) fb = j
        j += 1
      }
      if (fb < 0) {
        while (stack.length > si) pop()
        afe.remove(fi)
        return true
      }
      val furthestBlock = stack(fb)
      val commonAncestor = stack(si - 1)
      var bookmark = fi
      var nodeIdx = fb
      var lastNode: HElement = furthestBlock.node
      var inner = 0
      var innerDone = false
      while (!innerDone) {
        inner += 1
        nodeIdx -= 1
        var nodeEntry = stack(nodeIdx)
        if (nodeEntry.node eq fmtElem) innerDone = true
        else {
          var nodeAfeIdx = afeIndexOfElem(nodeEntry.node)
          if (inner > 3 && nodeAfeIdx >= 0) {
            afe.remove(nodeAfeIdx)
            if (nodeAfeIdx < bookmark) bookmark -= 1
            nodeAfeIdx = -1
          }
          if (nodeAfeIdx < 0) {
            stack.remove(nodeIdx)
            // fb shifts down
          } else {
            val entry = afe(nodeAfeIdx)
            val clone = new HElement(entry.name, Ns.html, entry.attrs.clone)
            afe(nodeAfeIdx) = new AfeEntry(clone, entry.name, entry.attrs)
            stack(nodeIdx) = new StackEntry(entry.name, Ns.html, clone)
            nodeEntry = stack(nodeIdx)
            if (lastNode eq furthestBlock.node) bookmark = nodeAfeIdx + 1
            lastNode.detach()
            clone.appendChild(lastNode)
            lastNode = clone
          }
        }
      }
      // place lastNode relative to common ancestor (foster-aware)
      lastNode.detach()
      val caName = if (commonAncestor.ns eq Ns.html) commonAncestor.name else ""
      if (fosterTargets(caName)) {
        val place = fosterPlaceForTable()
        insertNodeAt(place, lastNode)
      } else asInsertionParent(commonAncestor.node).appendChild(lastNode)
      // new element cloning formatting element, adopts furthest block children
      val clone2 = new HElement(fmtEntry.name, Ns.html, fmtEntry.attrs.clone)
      furthestBlock.node.moveChildrenTo(clone2)
      furthestBlock.node.appendChild(clone2)
      // AFE: remove old entry, insert clone2 at bookmark
      val oldIdx = afeIndexOfElem(fmtElem)
      if (oldIdx >= 0) {
        afe.remove(oldIdx)
        if (oldIdx < bookmark) bookmark -= 1
      }
      afe.insert(math.min(bookmark, afe.length), new AfeEntry(clone2, fmtEntry.name, fmtEntry.attrs))
      // stack: remove formatting element, insert clone2 after furthest block
      val fmtStackIdx = stackIndexOfElem(fmtElem)
      if (fmtStackIdx >= 0) stack.remove(fmtStackIdx)
      val fbIdx = stackIndexOfElem(furthestBlock.node)
      stack.insert(fbIdx + 1, new StackEntry(fmtEntry.name, Ns.html, clone2))
    }
    true
  }

  private def fosterTargets(name: String): Boolean =
    name == "table" || name == "tbody" || name == "tfoot" || name == "thead" || name == "tr"

  /** Foster-parenting location (spec 13.2.6.1 steps 2.1-2.6): the last
    * template WINS over the last table when it sits lower on the stack —
    * misplaced table content inside a template lands in its contents, not
    * before an outer table. */
  private def fosterPlaceForTable(): (HParent, HNode) = {
    var lastTable = -1
    var lastTemplate = -1
    var i = stack.length - 1
    while (i >= 0 && (lastTable < 0 || lastTemplate < 0)) {
      val e = stack(i)
      if (e.ns eq Ns.html) {
        if (lastTable < 0 && e.name == "table") lastTable = i
        if (lastTemplate < 0 && e.name == "template") lastTemplate = i
      }
      i -= 1
    }
    if (lastTemplate >= 0 && (lastTable < 0 || lastTemplate > lastTable))
      (asInsertionParent(stack(lastTemplate).node), null)
    else if (lastTable < 0) (stack(0).node, null) // fragment: root
    else {
      val table = stack(lastTable).node
      if (table.parent != null) (table.parent, table)
      else (asInsertionParent(stack(lastTable - 1).node), null)
    }
  }

  // --------------------------------------------------- reset insertion mode

  private def resetInsertionMode(): Unit = {
    var i = stack.length - 1
    var done = false
    while (!done) {
      val last = i == 0
      val e = if (last && isFragment) contextEntry else stack(i)
      if (e.ns eq Ns.html) {
        e.name match {
          case "template" =>
            // spec: switch to the CURRENT template insertion mode
            mode = if (templateModes.nonEmpty) templateModes(templateModes.length - 1)
                   else InBody // unreachable when stack/modes are consistent
            done = true
          case "select" =>
            mode = InSelect
            var j = i
            var stopScan = false
            while (j > 0 && !stopScan) {
              j -= 1
              // the ancestor scan walks STACK entries only — the spec's
              // fragment-context substitution applies to the outer reset
              // walk, not this sub-loop (a context table outside the
              // fragment must not force in-select-in-table)
              val a = stack(j)
              // spec: a template between select and table blocks the
              // in-select-in-table variant
              if ((a.ns eq Ns.html) && a.name == "template") stopScan = true
              else if ((a.ns eq Ns.html) && a.name == "table") {
                mode = InSelectInTable; stopScan = true
              }
            }
            done = true
          case "td" | "th" if !last => mode = InCell; done = true
          case "tr" => mode = InRow; done = true
          case "tbody" | "thead" | "tfoot" => mode = InTableBody; done = true
          case "caption" => mode = InCaption; done = true
          case "colgroup" => mode = InColumnGroup; done = true
          case "table" => mode = InTable; done = true
          case "head" if !last => mode = InHead; done = true
          case "body" => mode = InBody; done = true
          case "frameset" => mode = InFrameset; done = true
          case "html" =>
            mode = if (headElem == null) BeforeHead else AfterHead
            done = true
          case _ if last => mode = InBody; done = true
          case _ => ()
        }
      } else if (last) { mode = InBody; done = true }
      i -= 1
    }
  }

  // --------------------------------------------------------- char handling

  override def cdataAllowed: Boolean = {
    if (stack.isEmpty) false
    else {
      val a = adjustedCurrent
      !(a.ns eq Ns.html)
    }
  }

  def zeroChar(): Unit = {
    needToDropLF = false
    if (stack.nonEmpty && inForeignContent) insertChars("�", 0, 1)
    // otherwise dropped (reference: ZeroOriginatingReplacementCharacter)
  }

  private def inForeignContent: Boolean = {
    if (stack.isEmpty) return false
    val a = adjustedCurrent
    if (a.ns eq Ns.html) return false
    if (SpecNames.isMathmlTextIP(a.name, a.ns)) return false
    if (SpecNames.isHtmlIP(a.node)) return false
    true
  }

  def characters(s: CharSequence, start: Int, end: Int): Unit = {
    var from = start
    if (needToDropLF) {
      needToDropLF = false
      if (from < end && s.charAt(from) == '\n') from += 1
    }
    if (from >= end) return
    // Fast path for the dominant modes: in body / text, ws and non-ws chars
    // take the same insertion route (only framesetOk differs), so the whole
    // run can be inserted in one append instead of per-segment calls.
    if ((mode == InBody || mode == InCaption || mode == InCell || mode == Text ||
         mode == InTemplate) &&
        (stack.isEmpty || (adjustedCurrent.ns eq Ns.html))) {
      var hasNonWs = false
      var i = from
      while (i < end && !hasNonWs) { if (!isWsChar(s.charAt(i))) hasNonWs = true; i += 1 }
      if (mode != Text) reconstructAfe()
      insertChars(s, from, end)
      if (hasNonWs && mode != Text) framesetOk = false
      return
    }
    // split into ws / non-ws segments
    var i = from
    while (i < end) {
      val ws = isWsChar(s.charAt(i))
      var j = i + 1
      while (j < end && isWsChar(s.charAt(j)) == ws) j += 1
      charSegment(s, i, j, ws)
      i = j
    }
  }

  private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  private def charSegment(s: CharSequence, from: Int, to: Int, ws: Boolean): Unit = {
    // foreign content dispatch
    if (stack.nonEmpty && !(adjustedCurrent.ns eq Ns.html)) {
      // character tokens at integration points go through normal rules
      val a = adjustedCurrent
      if (!SpecNames.isMathmlTextIP(a.name, a.ns) && !SpecNames.isHtmlIP(a.node)) {
        insertChars(s, from, to)
        if (!ws) framesetOk = false
        return
      }
    }
    mode match {
      case Initial =>
        if (!ws) {
          quirks = true; doc.quirksMode = "quirks"
          err("missing doctype")
          mode = BeforeHtml
          charSegment(s, from, to, ws)
        }
      case BeforeHtml =>
        if (!ws) {
          appendHtmlRoot(new AttrList)
          mode = BeforeHead
          charSegment(s, from, to, ws)
        }
      case BeforeHead =>
        if (!ws) {
          insertElement("head", new AttrList)
          headElem = currentNode
          mode = InHead
          charSegment(s, from, to, ws)
        }
      case InHead | InHeadNoscript | AfterHead =>
        if (ws) insertChars(s, from, to)
        else mode match {
          case InHead =>
            pop(); mode = AfterHead; charSegment(s, from, to, ws)
          case InHeadNoscript =>
            err("non-space in noscript in head"); pop(); mode = InHead
            charSegment(s, from, to, ws)
          case _ =>
            appendBody(new AttrList); mode = InBody; charSegment(s, from, to, ws)
        }
      case InBody | InCaption | InCell | InTemplate => // in-template: per in-body
        reconstructAfe()
        insertChars(s, from, to)
        if (!ws) framesetOk = false
      case Text =>
        insertChars(s, from, to)
      case InTable | InTableBody | InRow =>
        // pend list = foster targets PLUS template (spec 13.2.6.4.9 —
        // template is pended here but is NOT a foster-parenting target)
        if ({ val n = if (current.ns eq Ns.html) current.name else ""
              fosterTargets(n) || n == "template" }) {
          tableTextPending = true
          tableText.append(s, from, to)
        } else {
          // "anything else": process per in-body with fostering
          err("misplaced characters in table")
          fosterEnabled = true
          reconstructAfe()
          insertChars(s, from, to)
          if (!ws) framesetOk = false
          fosterEnabled = false
        }
      case InColumnGroup =>
        if (ws) insertChars(s, from, to)
        else {
          if ((current.ns eq Ns.html) && current.name == "colgroup") {
            pop(); mode = InTable; charSegment(s, from, to, ws)
          } else err("non-space in colgroup")
        }
      case InSelect | InSelectInTable =>
        insertChars(s, from, to)
      case AfterBody =>
        if (ws) { reconstructAfe(); insertChars(s, from, to) }
        else { err("non-space after body"); mode = InBody; charSegment(s, from, to, ws) }
      case InFrameset | AfterFrameset | AfterAfterFrameset =>
        if (ws) insertChars(s, from, to)
        else err("non-space in frameset")
      case AfterAfterBody =>
        if (ws) { reconstructAfe(); insertChars(s, from, to) }
        else { err("non-space after after body"); mode = InBody; charSegment(s, from, to, ws) }
    }
  }

  /** Flush "in table text" pending characters (spec: in-table-text mode). */
  private def flushTableText(): Unit = {
    if (!tableTextPending) return
    tableTextPending = false
    val s = tableText.toString
    tableText.setLength(0)
    var allWs = true
    var i = 0
    while (i < s.length && allWs) { if (!isWsChar(s.charAt(i))) allWs = false; i += 1 }
    if (allWs) insertChars(s, 0, s.length)
    else {
      err("non-space characters in table")
      fosterEnabled = true
      reconstructAfe()
      insertChars(s, 0, s.length)
      framesetOk = false
      fosterEnabled = false
    }
  }

  // -------------------------------------------------------------- doctype

  def doctype(name: String, publicId: String, systemId: String, forceQuirks: Boolean): Unit = {
    needToDropLF = false
    if (mode == Initial) {
      // spec: any name other than exactly "html", or any public id, or a
      // system id other than about:legacy-compat, is a parse error
      if (name != "html" || publicId != null ||
          (systemId != null && systemId != "about:legacy-compat"))
        err("non-conforming doctype")
      doc.appendChild(new HDoctype(if (name == null) "" else name, publicId, systemId))
      val q = computeQuirks(name, publicId, systemId, forceQuirks)
      doc.quirksMode = q
      quirks = q == "quirks"
      mode = BeforeHtml
    } else err("stray doctype")
  }

  private def computeQuirks(name: String, publicId: String, systemId: String, forceQuirks: Boolean): String = {
    if (forceQuirks || name != "html") return "quirks"
    val pub = if (publicId == null) null else publicId.toLowerCase(java.util.Locale.ROOT)
    val sys = if (systemId == null) null else systemId.toLowerCase(java.util.Locale.ROOT)
    if (pub != null) {
      if (quirkyPublicIdPrefixes.exists(pub.startsWith)) return "quirks"
      if (pub == "-//w3o//dtd w3 html strict 3.0//en//" ||
          pub == "-/w3c/dtd html 4.0 transitional/en" || pub == "html") return "quirks"
      if (sys == null && (pub.startsWith("-//w3c//dtd html 4.01 frameset//") ||
          pub.startsWith("-//w3c//dtd html 4.01 transitional//"))) return "quirks"
    }
    if (sys == "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd") return "quirks"
    if (pub != null) {
      if (pub.startsWith("-//w3c//dtd xhtml 1.0 frameset//") ||
          pub.startsWith("-//w3c//dtd xhtml 1.0 transitional//")) return "limited-quirks"
      if (sys != null && (pub.startsWith("-//w3c//dtd html 4.01 frameset//") ||
          pub.startsWith("-//w3c//dtd html 4.01 transitional//"))) return "limited-quirks"
    }
    "no-quirks"
  }

  // -------------------------------------------------------------- comment

  def comment(text: String): Unit = {
    needToDropLF = false
    flushTableText()
    mode match {
      case Initial | BeforeHtml | AfterAfterBody | AfterAfterFrameset =>
        doc.appendChild(new HComment(text))
      case AfterBody =>
        stack(0).node.appendChild(new HComment(text))
      case InTable | InTableBody | InRow =>
        insertComment(text) // current node append (no fostering for comments here per spec? spec: insert)
      case _ =>
        insertComment(text)
    }
  }

  // ------------------------------------------------------------ start tag

  private def appendHtmlRoot(attrs: AttrList): Unit = {
    val e = new HElement("html", Ns.html, attrs.clone)
    doc.appendChild(e)
    push("html", Ns.html, e)
  }

  private def appendBody(attrs: AttrList): Unit = {
    insertElement("body", attrs)
  }

  private def addMissingAttrs(e: HElement, attrs: AttrList): Unit = {
    var i = 0
    while (i < attrs.size) {
      if (e.attrs.get(attrs.name(i)).isEmpty) e.attrs.add(attrs.name(i), attrs.value(i))
      i += 1
    }
  }

  def startTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit = {
    needToDropLF = false
    // foreign content dispatch
    if (stack.nonEmpty) {
      val a = adjustedCurrent
      val html =
        (a.ns eq Ns.html) ||
        (SpecNames.isMathmlTextIP(a.name, a.ns) && name != "mglyph" && name != "malignmark") ||
        ((a.ns eq Ns.mathml) && a.name == "annotation-xml" && name == "svg") ||
        SpecNames.isHtmlIP(a.node)
      if (!html) { foreignStartTag(name, attrs, selfClosing); return }
    }
    flushTableText()
    startTagMode(mode, name, attrs, selfClosing)
  }

  private def foreignStartTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit = {
    val isBreakout = breakout.contains(name) ||
      (name == "font" && (attrs.contains("color") || attrs.contains("face") || attrs.contains("size")))
    if (isBreakout) {
      err("HTML start tag in foreign content")
      // pop until MathML text IP / HTML IP / html namespace
      var done = false
      while (!done) {
        val c = current
        if ((c.ns eq Ns.html) || SpecNames.isMathmlTextIP(c.name, c.ns) || SpecNames.isHtmlIP(c.node)) done = true
        else pop()
      }
      // spec: reprocess "according to the rules given in the section
      // corresponding to the current insertion mode in HTML content" — i.e.
      // WITHOUT redispatching through the foreign-content check. Going back
      // through startTag() instead loops forever in the fragment case (the
      // adjusted current node stays the foreign context element while the
      // stack never shrinks past the root).
      flushTableText()
      startTagMode(mode, name, attrs, selfClosing)
      return
    }
    val curNs = adjustedCurrent.ns
    val (adjName, a) =
      if (curNs eq Ns.svg) {
        val fixed = svgTagFix.getOrElse(name, name)
        (fixed, adjustAttrs(attrs, svg = true))
      } else (name, adjustAttrs(attrs, svg = false))
    val e = new HElement(adjName, curNs, a)
    insertNodeAt(insertionPlace(), e)
    if (!selfClosing && stack.length < maxStackDepth) push(adjName, curNs, e)
  }

  /** Spec "adjust SVG/MathML attributes" (casing, definitionURL). The
    * "adjust foreign attributes" step keeps the qualified name verbatim as
    * the plain attribute name by policy (this DOM has no attr namespaces;
    * the tokenizer already lowercased it and the spec's adjusted local
    * names are all lowercase, so the name needs no rewrite); the html5lib
    * conformance serializer renders the namespace-adjusted `prefix local`
    * display form for those names (Serializer.foreignAttrDisplay). */
  private def adjustAttrs(attrs: AttrList, svg: Boolean): AttrList = {
    val out = new AttrList
    var i = 0
    while (i < attrs.size) {
      var n = attrs.name(i)
      if (svg) n = svgAttrFix.getOrElse(n, n)
      else if (n == "definitionurl") n = "definitionURL"
      out.add(n, attrs.value(i))
      i += 1
    }
    out
  }

  /** start tag dispatch per insertion mode */
  private def startTagMode(m: Int, name: String, attrs: AttrList, selfClosing: Boolean): Unit = m match {
    case Initial =>
      quirks = true; doc.quirksMode = "quirks"; err("missing doctype")
      mode = BeforeHtml
      startTagMode(BeforeHtml, name, attrs, selfClosing)
    case BeforeHtml =>
      if (name == "html") { appendHtmlRoot(attrs); mode = BeforeHead }
      else {
        appendHtmlRoot(new AttrList); mode = BeforeHead
        startTagMode(BeforeHead, name, attrs, selfClosing)
      }
    case BeforeHead => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "head" =>
        insertElement("head", attrs); headElem = currentNode; mode = InHead
      case _ =>
        insertElement("head", new AttrList); headElem = currentNode; mode = InHead
        startTagMode(InHead, name, attrs, selfClosing)
    }
    case InHead => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "base" | "basefont" | "bgsound" | "link" => insertVoid(name, attrs)
      case "meta" =>
        insertVoid(name, attrs)
        maybeDetectCharset(attrs)
      case "title" => genericRcdata(name, attrs)
      case "noscript" => // scripting disabled (reference: SimpleHtmlParser.cs:85)
        insertElement(name, attrs); mode = InHeadNoscript
      case "noframes" | "style" => genericRawText(name, attrs)
      case "script" =>
        insertElement(name, attrs)
        tokenizer.setContentModel(ContentModel.Script, name)
        originalMode = mode; mode = Text
      case "template" =>
        // spec "in head" <template>: insert, AFE marker, frameset not ok,
        // switch to in-template, push it on the template-modes stack
        insertElement(name, attrs)
        afePushMarker()
        framesetOk = false
        mode = InTemplate
        templateModes += InTemplate
      case "head" => err("stray head tag")
      case _ =>
        pop(); mode = AfterHead
        startTagMode(AfterHead, name, attrs, selfClosing)
    }
    case InHeadNoscript => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "basefont" | "bgsound" | "link" | "meta" | "noframes" | "style" =>
        startTagMode(InHead, name, attrs, selfClosing)
      case "head" | "noscript" => err("stray tag in noscript")
      case _ =>
        err("bad content in noscript"); pop(); mode = InHead
        startTagMode(InHead, name, attrs, selfClosing)
    }
    case AfterHead => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "body" => appendBody(attrs); framesetOk = false; mode = InBody
      case "frameset" => insertElement(name, attrs); mode = InFrameset
      case "base" | "basefont" | "bgsound" | "link" | "meta" | "noframes" |
           "script" | "style" | "template" | "title" =>
        err("late head content")
        stack += new StackEntry("head", Ns.html, headElem)
        startTagMode(InHead, name, attrs, selfClosing)
        // spec: remove the head element from the stack wherever it is
        val i = stackIndexOfElem(headElem)
        if (i >= 0) stack.remove(i)
      case "head" => err("stray head tag")
      case _ =>
        appendBody(new AttrList); mode = InBody
        startTagMode(InBody, name, attrs, selfClosing)
    }
    case InBody => inBodyStartTag(name, attrs, selfClosing)
    case Text =>
      err("unexpected tag in text mode") // cannot normally happen
    case InTable => inTableStartTag(name, attrs, selfClosing)
    case InCaption => name match {
      case "caption" | "col" | "colgroup" | "tbody" | "td" | "tfoot" | "th" | "thead" | "tr" =>
        err("misplaced table tag in caption")
        if (hasInTableScope("caption")) {
          generateImpliedEndTags()
          popUntil("caption")
          clearAfeToMarker()
          mode = InTable
          startTagMode(InTable, name, attrs, selfClosing)
        }
      case _ => inBodyStartTag(name, attrs, selfClosing)
    }
    case InColumnGroup => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "col" => insertVoid(name, attrs)
      case "template" => startTagMode(InHead, name, attrs, selfClosing)
      case _ =>
        if ((current.ns eq Ns.html) && current.name == "colgroup") {
          pop(); mode = InTable
          startTagMode(InTable, name, attrs, selfClosing)
        } else err("stray tag in colgroup")
    }
    case InTableBody => name match {
      case "tr" => clearToTableBody(); insertElement(name, attrs); mode = InRow
      case "th" | "td" =>
        err("cell without row")
        clearToTableBody(); insertElement("tr", new AttrList); mode = InRow
        startTagMode(InRow, name, attrs, selfClosing)
      case "caption" | "col" | "colgroup" | "tbody" | "tfoot" | "thead" =>
        if (hasInTableScope("tbody") || hasInTableScope("thead") || hasInTableScope("tfoot")) {
          clearToTableBody(); pop(); mode = InTable
          startTagMode(InTable, name, attrs, selfClosing)
        } else err("stray table section tag")
      case _ => inTableStartTag(name, attrs, selfClosing)
    }
    case InRow => name match {
      case "th" | "td" =>
        clearToTableRow(); insertElement(name, attrs); mode = InCell
        afePushMarker()
      case "caption" | "col" | "colgroup" | "tbody" | "tfoot" | "thead" | "tr" =>
        if (hasInTableScope("tr")) {
          clearToTableRow(); pop(); mode = InTableBody
          startTagMode(InTableBody, name, attrs, selfClosing)
        } else err("stray tag in row")
      case _ => inTableStartTag(name, attrs, selfClosing)
    }
    case InCell => name match {
      case "caption" | "col" | "colgroup" | "tbody" | "td" | "tfoot" | "th" | "thead" | "tr" =>
        if (hasInTableScope("td") || hasInTableScope("th")) {
          closeCell()
          startTagMode(mode, name, attrs, selfClosing)
        } else err("stray table tag in cell")
      case _ => inBodyStartTag(name, attrs, selfClosing)
    }
    case InSelect => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "option" =>
        if ((current.ns eq Ns.html) && current.name == "option") pop()
        insertElement(name, attrs)
      case "optgroup" =>
        if ((current.ns eq Ns.html) && current.name == "option") pop()
        if ((current.ns eq Ns.html) && current.name == "optgroup") pop()
        insertElement(name, attrs)
      case "hr" =>
        // current spec allows hr between options (postdates the reference's
        // validator.nu vintage, like rb/rtc)
        if ((current.ns eq Ns.html) && current.name == "option") pop()
        if ((current.ns eq Ns.html) && current.name == "optgroup") pop()
        insertElement(name, attrs)
        pop()
      case "select" =>
        err("nested select")
        if (hasInSelectScope("select")) { popUntil("select"); resetInsertionMode() }
      case "input" | "keygen" | "textarea" =>
        err("bad tag in select")
        if (hasInSelectScope("select")) {
          popUntil("select"); resetInsertionMode()
          startTagMode(mode, name, attrs, selfClosing)
        }
      case "script" | "template" => startTagMode(InHead, name, attrs, selfClosing)
      case _ => err("stray tag in select")
    }
    case InSelectInTable => name match {
      case "caption" | "table" | "tbody" | "tfoot" | "thead" | "tr" | "td" | "th" =>
        err("table tag in select in table")
        popUntil("select"); resetInsertionMode()
        startTagMode(mode, name, attrs, selfClosing)
      case _ => startTagMode(InSelect, name, attrs, selfClosing)
    }
    case AfterBody =>
      name match {
        case "html" => startTagMode(InBody, name, attrs, selfClosing)
        case _ =>
          err("tag after body"); mode = InBody
          startTagMode(InBody, name, attrs, selfClosing)
      }
    case InFrameset => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "frameset" => insertElement(name, attrs)
      case "frame" => insertVoid(name, attrs)
      case "noframes" => startTagMode(InHead, name, attrs, selfClosing)
      case _ => err("stray tag in frameset")
    }
    case AfterFrameset => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "noframes" => startTagMode(InHead, name, attrs, selfClosing)
      case _ => err("stray tag after frameset")
    }
    case AfterAfterBody =>
      name match {
        case "html" => startTagMode(InBody, name, attrs, selfClosing)
        case _ =>
          err("tag after after body"); mode = InBody
          startTagMode(InBody, name, attrs, selfClosing)
      }
    case AfterAfterFrameset => name match {
      case "html" => startTagMode(InBody, name, attrs, selfClosing)
      case "noframes" => startTagMode(InHead, name, attrs, selfClosing)
      case _ => err("stray tag after after frameset")
    }
    case InTemplate => name match {
      // spec 13.2.6.4.18 "in template"
      case "base" | "basefont" | "bgsound" | "link" | "meta" | "noframes" |
           "script" | "style" | "template" | "title" =>
        startTagMode(InHead, name, attrs, selfClosing)
      case "caption" | "colgroup" | "tbody" | "tfoot" | "thead" =>
        popTemplateMode(); templateModes += InTable
        mode = InTable
        startTagMode(InTable, name, attrs, selfClosing)
      case "col" =>
        popTemplateMode(); templateModes += InColumnGroup
        mode = InColumnGroup
        startTagMode(InColumnGroup, name, attrs, selfClosing)
      case "tr" =>
        popTemplateMode(); templateModes += InTableBody
        mode = InTableBody
        startTagMode(InTableBody, name, attrs, selfClosing)
      case "td" | "th" =>
        popTemplateMode(); templateModes += InRow
        mode = InRow
        startTagMode(InRow, name, attrs, selfClosing)
      case _ =>
        popTemplateMode(); templateModes += InBody
        mode = InBody
        startTagMode(InBody, name, attrs, selfClosing)
    }
    case _ =>
      err("unhandled mode")
  }

  private def clearToTableContext(): Unit = {
    while (!((current.ns eq Ns.html) &&
      (current.name == "table" || current.name == "template" || current.name == "html"))) pop()
  }
  private def clearToTableBody(): Unit = {
    while (!((current.ns eq Ns.html) &&
      (current.name == "tbody" || current.name == "tfoot" || current.name == "thead" ||
       current.name == "template" || current.name == "html"))) pop()
  }
  private def clearToTableRow(): Unit = {
    while (!((current.ns eq Ns.html) &&
      (current.name == "tr" || current.name == "template" || current.name == "html"))) pop()
  }

  private def closeCell(): Unit = {
    if (hasInTableScope("td")) {
      generateImpliedEndTags()
      if (!((current.ns eq Ns.html) && current.name == "td")) err("unclosed elements in cell")
      popUntil("td")
    } else if (hasInTableScope("th")) {
      generateImpliedEndTags()
      if (!((current.ns eq Ns.html) && current.name == "th")) err("unclosed elements in cell")
      popUntil("th")
    }
    clearAfeToMarker()
    mode = InRow
  }

  private def inTableStartTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit = name match {
    case "caption" =>
      clearToTableContext(); afePushMarker(); insertElement(name, attrs); mode = InCaption
    case "colgroup" =>
      clearToTableContext(); insertElement(name, attrs); mode = InColumnGroup
    case "col" =>
      clearToTableContext(); insertElement("colgroup", new AttrList); mode = InColumnGroup
      startTagMode(InColumnGroup, name, attrs, selfClosing)
    case "tbody" | "tfoot" | "thead" =>
      clearToTableContext(); insertElement(name, attrs); mode = InTableBody
    case "td" | "th" | "tr" =>
      clearToTableContext(); insertElement("tbody", new AttrList); mode = InTableBody
      startTagMode(InTableBody, name, attrs, selfClosing)
    case "table" =>
      err("table in table")
      if (hasInTableScope("table")) {
        popUntil("table"); resetInsertionMode()
        startTagMode(mode, name, attrs, selfClosing)
      }
    case "style" | "script" | "template" =>
      startTagMode(InHead, name, attrs, selfClosing)
    case "input" if attrs.get("type").exists(_.equalsIgnoreCase("hidden")) =>
      err("hidden input in table")
      insertVoid(name, attrs)
    case "form" =>
      err("form in table")
      if (formElem == null && !hasTemplateOnStack) {
        val e = insertVoid(name, attrs)
        formElem = e
      }
    case _ =>
      err("stray tag in table: " + name)
      fosterEnabled = true
      inBodyStartTag(name, attrs, selfClosing)
      fosterEnabled = false
  }

  private def genericRcdata(name: String, attrs: AttrList): Unit = {
    insertElement(name, attrs)
    tokenizer.setContentModel(ContentModel.Rcdata, name)
    originalMode = mode
    mode = Text
  }

  private def genericRawText(name: String, attrs: AttrList): Unit = {
    insertElement(name, attrs)
    tokenizer.setContentModel(ContentModel.Rawtext, name)
    originalMode = mode
    mode = Text
  }

  private def maybeDetectCharset(attrs: AttrList): Unit = {
    if (detectedCharset != null) return
    attrs.get("charset") match {
      case Some(cs) if cs.trim.nonEmpty => detectedCharset = cs.trim
      case _ =>
        if (attrs.get("http-equiv").exists(_.equalsIgnoreCase("content-type"))) {
          attrs.get("content").foreach { content =>
            val lc = content.toLowerCase(java.util.Locale.ROOT)
            val i = lc.indexOf("charset=")
            if (i >= 0) {
              var v = content.substring(i + 8).trim
              if (v.startsWith("\"") || v.startsWith("'")) v = v.substring(1)
              val endIdx = v.indexWhere(c => c == ';' || c == '"' || c == '\'' || c == ' ')
              if (endIdx >= 0) v = v.substring(0, endIdx)
              if (v.nonEmpty) detectedCharset = v
            }
          }
        }
    }
  }

  private def inBodyStartTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit = name match {
    case "html" =>
      err("stray html tag")
      // spec: ignored entirely when a template is open — attributes must
      // not leak onto the real root from inside template contents
      if (!hasTemplateOnStack) addMissingAttrs(stack(0).node, attrs)
    case "base" | "basefont" | "bgsound" | "link" | "meta" | "noframes" |
         "script" | "style" | "template" | "title" =>
      startTagMode(InHead, name, attrs, selfClosing)
    case "body" =>
      err("stray body tag")
      if (stack.length >= 2 && stack(1).name == "body" && !hasTemplateOnStack) {
        framesetOk = false
        addMissingAttrs(stack(1).node, attrs)
      }
    case "frameset" =>
      err("stray frameset tag")
      if (stack.length >= 2 && stack(1).name == "body" && framesetOk) {
        val body = stack(1).node
        body.detach()
        while (stack.length > 1) pop()
        insertElement("frameset", attrs)
        mode = InFrameset
      }
    case "address" | "article" | "aside" | "blockquote" | "center" | "details" |
         "dialog" | "dir" | "div" | "dl" | "fieldset" | "figcaption" | "figure" |
         "footer" | "header" | "hgroup" | "main" | "menu" | "nav" | "ol" | "p" |
         "search" | "section" | "summary" | "ul" =>
      closePIfInButtonScope()
      insertElement(name, attrs)
    case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
      closePIfInButtonScope()
      if ((current.ns eq Ns.html) && headings.contains(current.name)) {
        err("heading in heading"); pop()
      }
      insertElement(name, attrs)
    case "pre" | "listing" =>
      closePIfInButtonScope()
      insertElement(name, attrs)
      needToDropLF = true
      framesetOk = false
    case "form" =>
      // spec: with a template on the stack the form pointer is neither
      // consulted nor set (templates get their own form scoping)
      if (formElem != null && !hasTemplateOnStack) err("nested form")
      else {
        closePIfInButtonScope()
        val e = insertElement(name, attrs)
        if (!hasTemplateOnStack) formElem = e
      }
    case "li" =>
      framesetOk = false
      liDdDt(name, Set("li"))
      closePIfInButtonScope()
      insertElement(name, attrs)
    case "dd" | "dt" =>
      framesetOk = false
      liDdDt(name, Set("dd", "dt"))
      closePIfInButtonScope()
      insertElement(name, attrs)
    case "plaintext" =>
      closePIfInButtonScope()
      insertElement(name, attrs)
      tokenizer.setContentModel(ContentModel.Plaintext, null)
    case "button" =>
      if (hasInScope("button")) {
        err("nested button")
        generateImpliedEndTags()
        popUntil("button")
      }
      reconstructAfe()
      insertElement(name, attrs)
      framesetOk = false
    case "a" =>
      var i = afe.length - 1
      var found = -1
      var stop = false
      while (i >= 0 && !stop) {
        val e = afe(i)
        if (e == null) stop = true
        else if (e.name == "a") { found = i; stop = true }
        i -= 1
      }
      if (found >= 0) {
        err("a inside a")
        val elem = afe(found).element
        adoptionAgency("a")
        val ai = afeIndexOfElem(elem)
        if (ai >= 0) afe.remove(ai)
        val si = stackIndexOfElem(elem)
        if (si >= 0) stack.remove(si)
      }
      reconstructAfe()
      val e = insertElement(name, attrs)
      afePush(e, name, attrs)
    case "b" | "big" | "code" | "em" | "font" | "i" | "s" | "small" |
         "strike" | "strong" | "tt" | "u" =>
      reconstructAfe()
      val e = insertElement(name, attrs)
      afePush(e, name, attrs)
    case "nobr" =>
      reconstructAfe()
      if (hasInScope("nobr")) {
        err("nobr in nobr")
        // the in-scope guard is STACK-based but the AAA's formatting-element
        // search is AFE-after-last-marker-based; they disagree when the open
        // nobr's AFE entry sits below a stale marker (e.g. a fostered
        // marquee popped by </table>). AAA then finds no entry and, per
        // spec, acts as "any other end tag" — which pops the open nobr.
        if (!adoptionAgency("nobr")) anyOtherEndTag("nobr")
        reconstructAfe()
      }
      val e = insertElement(name, attrs)
      afePush(e, name, attrs)
    case "applet" | "marquee" | "object" =>
      reconstructAfe()
      insertElement(name, attrs)
      afePushMarker()
      framesetOk = false
    case "table" =>
      if (!quirks) closePIfInButtonScope()
      insertElement(name, attrs)
      framesetOk = false
      mode = InTable
    case "area" | "br" | "embed" | "img" | "keygen" | "wbr" =>
      reconstructAfe()
      insertVoid(name, attrs)
      framesetOk = false
    case "input" =>
      reconstructAfe()
      insertVoid(name, attrs)
      if (!attrs.get("type").exists(_.equalsIgnoreCase("hidden"))) framesetOk = false
    case "param" | "source" | "track" =>
      insertVoid(name, attrs)
    case "hr" =>
      closePIfInButtonScope()
      insertVoid(name, attrs)
      framesetOk = false
    case "image" =>
      err("image instead of img")
      inBodyStartTag("img", attrs, selfClosing)
    case "isindex" =>
      // legacy expansion (reference: Core/TreeBuilder.cs:2106-2186)
      err("isindex seen")
      if (formElem == null) {
        closePIfInButtonScope()
        val formAttrs = new AttrList
        attrs.get("action").foreach(v => formAttrs.add("action", v))
        formElem = insertElement("form", formAttrs)
        insertVoid("hr", new AttrList)
        insertElement("label", new AttrList)
        val prompt = attrs.get("prompt").getOrElse(
          "This is a searchable index. Enter search keywords: ")
        insertChars(prompt, 0, prompt.length)
        val inputAttrs = new AttrList
        inputAttrs.add("name", "isindex")
        var i = 0
        while (i < attrs.size) {
          val an = attrs.name(i)
          if (an != "name" && an != "prompt" && an != "action") inputAttrs.add(an, attrs.value(i))
          i += 1
        }
        insertVoid("input", inputAttrs)
        pop() // label
        insertVoid("hr", new AttrList)
        pop() // form
      }
    case "textarea" =>
      insertElement(name, attrs)
      tokenizer.setContentModel(ContentModel.Rcdata, name)
      needToDropLF = true
      framesetOk = false
      originalMode = mode
      mode = Text
    case "xmp" =>
      closePIfInButtonScope()
      reconstructAfe()
      framesetOk = false
      genericRawText(name, attrs)
    case "iframe" =>
      framesetOk = false
      genericRawText(name, attrs)
    case "noembed" =>
      genericRawText(name, attrs)
    case "select" =>
      reconstructAfe()
      insertElement(name, attrs)
      framesetOk = false
      mode =
        if (mode == InTable || mode == InCaption || mode == InTableBody ||
            mode == InRow || mode == InCell) InSelectInTable
        else InSelect
    case "optgroup" | "option" =>
      if ((current.ns eq Ns.html) && current.name == "option") pop()
      reconstructAfe()
      insertElement(name, attrs)
    case "rb" | "rtc" =>
      // spec: implied end tags close any open rb/rt/rp/rtc back to the ruby
      if (hasInScope("ruby")) {
        generateImpliedEndTags()
        if (!((current.ns eq Ns.html) && current.name == "ruby")) err("unclosed ruby content")
      }
      insertElement(name, attrs)
    case "rp" | "rt" =>
      // spec: like rb/rtc but an open rtc stays (rt/rp nest inside rtc)
      if (hasInScope("ruby")) {
        generateImpliedEndTags(except = "rtc")
        if (!((current.ns eq Ns.html) &&
            (current.name == "ruby" || current.name == "rtc"))) err("unclosed ruby content")
      }
      insertElement(name, attrs)
    case "math" =>
      reconstructAfe()
      val a = adjustAttrs(attrs, svg = false)
      val e = new HElement(name, Ns.mathml, a)
      insertNodeAt(insertionPlace(), e)
      if (!selfClosing) push(name, Ns.mathml, e)
    case "svg" =>
      reconstructAfe()
      val a = adjustAttrs(attrs, svg = true)
      val e = new HElement(name, Ns.svg, a)
      insertNodeAt(insertionPlace(), e)
      if (!selfClosing) push(name, Ns.svg, e)
    case "caption" | "col" | "colgroup" | "frame" | "head" | "tbody" | "td" |
         "tfoot" | "th" | "thead" | "tr" =>
      err("stray table tag in body: " + name)
    case _ =>
      reconstructAfe()
      insertElement(name, attrs)
  }

  /** li/dd/dt opening: close a matching open item first (spec "in body"). */
  private def liDdDt(name: String, closeSet: Set[String]): Unit = {
    var i = stack.length - 1
    var done = false
    while (!done && i >= 0) {
      val e = stack(i)
      if ((e.ns eq Ns.html) && closeSet.contains(e.name)) {
        generateImpliedEndTags(e.name)
        if (!((current.ns eq Ns.html) && current.name == e.name)) err("unclosed elements before " + name)
        popUntil(e.name)
        done = true
      } else if (isSpecial(e.name, e.ns) &&
                 !((e.ns eq Ns.html) && (e.name == "address" || e.name == "div" || e.name == "p"))) {
        done = true
      } else i -= 1
    }
  }

  // -------------------------------------------------------------- end tag

  def endTag(name: String): Unit = {
    needToDropLF = false
    // foreign content dispatch
    if (stack.nonEmpty) {
      val a = adjustedCurrent
      if (!(a.ns eq Ns.html)) { foreignEndTag(name); return }
    }
    flushTableText()
    endTagMode(mode, name)
  }

  private def foreignEndTag(name: String): Unit = {
    // spec: </br> and </p> in foreign content pop out of the foreign
    // subtree entirely (like breakout start tags) and reprocess as HTML
    if (name == "br" || name == "p") {
      err("HTML end tag in foreign content")
      var c = current
      while (!((c.ns eq Ns.html) || SpecNames.isMathmlTextIP(c.name, c.ns) ||
          SpecNames.isHtmlIP(c.node))) {
        pop(); c = current
      }
      flushTableText()
      endTagMode(mode, name)
      return
    }
    if (current.name.toLowerCase(java.util.Locale.ROOT) != name) err("end tag mismatch in foreign content")
    var i = stack.length - 1
    var done = false
    while (!done) {
      if (i == 0) done = true // fragment root
      else {
        val node = stack(i)
        if (node.name.toLowerCase(java.util.Locale.ROOT) == name) {
          while (stack.length > i) pop()
          done = true
        } else {
          i -= 1
          if (stack(i).ns eq Ns.html) {
            flushTableText()
            endTagMode(mode, name)
            done = true
          }
        }
      }
    }
  }

  private def endTagMode(m: Int, name: String): Unit = m match {
    case Initial =>
      quirks = true; doc.quirksMode = "quirks"; err("missing doctype")
      mode = BeforeHtml
      endTagMode(BeforeHtml, name)
    case BeforeHtml => name match {
      case "head" | "body" | "html" | "br" =>
        appendHtmlRoot(new AttrList); mode = BeforeHead
        endTagMode(BeforeHead, name)
      case _ => err("stray end tag")
    }
    case BeforeHead => name match {
      case "head" | "body" | "html" | "br" =>
        insertElement("head", new AttrList); headElem = currentNode; mode = InHead
        endTagMode(InHead, name)
      case _ => err("stray end tag")
    }
    case InHead => name match {
      case "head" => pop(); mode = AfterHead
      case "template" =>
        // spec "in head" </template> — also the shared handler every other
        // mode routes its </template> to
        if (!hasTemplateOnStack) err("stray template end tag")
        else {
          generateImpliedEndTagsThoroughly()
          if (!((current.ns eq Ns.html) && current.name == "template"))
            err("unclosed elements at template end")
          popUntil("template")
          clearAfeToMarker()
          popTemplateMode()
          resetInsertionMode()
        }
      case "body" | "html" | "br" =>
        pop(); mode = AfterHead
        endTagMode(AfterHead, name)
      case _ => err("stray end tag: " + name)
    }
    case InHeadNoscript => name match {
      case "noscript" => pop(); mode = InHead
      case "br" =>
        err("stray br in noscript"); pop(); mode = InHead
        endTagMode(InHead, name)
      case _ => err("stray end tag in noscript")
    }
    case AfterHead => name match {
      case "template" => endTagMode(InHead, name)
      case "body" | "html" | "br" =>
        appendBody(new AttrList); mode = InBody
        endTagMode(InBody, name)
      case _ => err("stray end tag after head")
    }
    case InBody => inBodyEndTag(name)
    case Text =>
      // the tokenizer only emits the matching end tag in raw/rcdata modes
      pop()
      mode = originalMode
    case InTable => inTableEndTag(name)
    case InCaption => name match {
      case "caption" =>
        if (hasInTableScope("caption")) {
          generateImpliedEndTags()
          if (!((current.ns eq Ns.html) && current.name == "caption")) err("unclosed elements in caption")
          popUntil("caption")
          clearAfeToMarker()
          mode = InTable
        } else err("stray caption end tag")
      case "table" =>
        err("table end in caption")
        if (hasInTableScope("caption")) {
          generateImpliedEndTags()
          popUntil("caption")
          clearAfeToMarker()
          mode = InTable
          endTagMode(InTable, name)
        }
      case "body" | "col" | "colgroup" | "html" | "tbody" | "td" | "tfoot" |
           "th" | "thead" | "tr" => err("stray end tag in caption")
      case _ => inBodyEndTag(name)
    }
    case InColumnGroup => name match {
      case "colgroup" =>
        if ((current.ns eq Ns.html) && current.name == "colgroup") { pop(); mode = InTable }
        else err("stray colgroup end")
      case "col" => err("stray col end tag")
      case "template" => endTagMode(InHead, name)
      case _ =>
        if ((current.ns eq Ns.html) && current.name == "colgroup") {
          pop(); mode = InTable
          endTagMode(InTable, name)
        } else err("stray end tag in colgroup")
    }
    case InTableBody => name match {
      case "tbody" | "tfoot" | "thead" =>
        if (hasInTableScope(name)) {
          clearToTableBody(); pop(); mode = InTable
        } else err("stray end tag " + name)
      case "table" =>
        if (hasInTableScope("tbody") || hasInTableScope("thead") || hasInTableScope("tfoot")) {
          clearToTableBody(); pop(); mode = InTable
          endTagMode(InTable, name)
        } else err("stray table end tag")
      case "body" | "caption" | "col" | "colgroup" | "html" | "td" | "th" | "tr" =>
        err("stray end tag in table body")
      case _ => inTableEndTag(name)
    }
    case InRow => name match {
      case "tr" =>
        if (hasInTableScope("tr")) { clearToTableRow(); pop(); mode = InTableBody }
        else err("stray tr end tag")
      case "table" =>
        if (hasInTableScope("tr")) {
          clearToTableRow(); pop(); mode = InTableBody
          endTagMode(InTableBody, name)
        } else err("stray table end tag in row")
      case "tbody" | "tfoot" | "thead" =>
        if (hasInTableScope(name)) {
          if (hasInTableScope("tr")) { clearToTableRow(); pop(); mode = InTableBody }
          endTagMode(InTableBody, name)
        } else err("stray end tag in row")
      case "body" | "caption" | "col" | "colgroup" | "html" | "td" | "th" =>
        err("stray end tag in row")
      case _ => inTableEndTag(name)
    }
    case InCell => name match {
      case "td" | "th" =>
        if (hasInTableScope(name)) {
          generateImpliedEndTags()
          if (!((current.ns eq Ns.html) && current.name == name)) err("unclosed elements in cell")
          popUntil(name)
          clearAfeToMarker()
          mode = InRow
        } else err("stray cell end tag")
      case "body" | "caption" | "col" | "colgroup" | "html" =>
        err("stray end tag in cell")
      case "table" | "tbody" | "tfoot" | "thead" | "tr" =>
        if (hasInTableScope(name)) {
          closeCell()
          endTagMode(mode, name)
        } else err("stray end tag in cell")
      case _ => inBodyEndTag(name)
    }
    case InSelect => name match {
      case "optgroup" =>
        if ((current.ns eq Ns.html) && current.name == "option" &&
            stack.length >= 2 && stack(stack.length - 2).name == "optgroup") pop()
        if ((current.ns eq Ns.html) && current.name == "optgroup") pop()
        else err("stray optgroup end tag")
      case "option" =>
        if ((current.ns eq Ns.html) && current.name == "option") pop()
        else err("stray option end tag")
      case "select" =>
        if (hasInSelectScope("select")) { popUntil("select"); resetInsertionMode() }
        else err("stray select end tag")
      case "template" => endTagMode(InHead, name)
      case _ => err("stray end tag in select")
    }
    case InSelectInTable => name match {
      case "caption" | "table" | "tbody" | "tfoot" | "thead" | "tr" | "td" | "th" =>
        err("table end tag in select in table")
        if (hasInTableScope(name)) {
          popUntil("select"); resetInsertionMode()
          endTagMode(mode, name)
        }
      case _ => endTagMode(InSelect, name)
    }
    case AfterBody => name match {
      case "html" =>
        if (isFragment) err("stray html end tag")
        else mode = AfterAfterBody
      case _ =>
        err("end tag after body"); mode = InBody
        endTagMode(InBody, name)
    }
    case InFrameset => name match {
      case "frameset" =>
        if (stack.length == 1) err("stray frameset end tag")
        else {
          pop()
          if (!isFragment && !((current.ns eq Ns.html) && current.name == "frameset"))
            mode = AfterFrameset
        }
      case _ => err("stray end tag in frameset")
    }
    case AfterFrameset => name match {
      case "html" => mode = AfterAfterFrameset
      case _ => err("stray end tag after frameset")
    }
    case AfterAfterBody =>
      err("end tag after after body"); mode = InBody
      endTagMode(InBody, name)
    case AfterAfterFrameset =>
      err("stray end tag after after frameset")
    case InTemplate => name match {
      case "template" => endTagMode(InHead, name)
      case _ => err("stray end tag in template") // spec: ignore
    }
    case _ => err("unhandled end tag mode")
  }

  private def inTableEndTag(name: String): Unit = name match {
    case "table" =>
      if (hasInTableScope("table")) { popUntil("table"); resetInsertionMode() }
      else err("stray table end tag")
    case "template" =>
      endTagMode(InHead, name) // spec "in table" </template>: in-head rules
    case "body" | "caption" | "col" | "colgroup" | "html" | "tbody" | "td" |
         "tfoot" | "th" | "thead" | "tr" =>
      err("stray end tag in table")
    case _ =>
      err("end tag fostered in table: " + name)
      fosterEnabled = true
      inBodyEndTag(name)
      fosterEnabled = false
  }

  private def inBodyEndTag(name: String): Unit = name match {
    case "body" =>
      if (!hasInScope("body")) err("stray body end tag")
      else mode = AfterBody
    case "html" =>
      if (!hasInScope("body")) err("stray html end tag")
      else {
        mode = AfterBody
        endTagMode(AfterBody, name)
      }
    case "address" | "article" | "aside" | "blockquote" | "button" | "center" |
         "details" | "dialog" | "dir" | "div" | "dl" | "fieldset" |
         "figcaption" | "figure" | "footer" | "header" | "hgroup" | "listing" |
         "main" | "menu" | "nav" | "ol" | "pre" | "search" | "section" |
         "summary" | "ul" =>
      if (!hasInScope(name)) err("stray end tag " + name)
      else {
        generateImpliedEndTags()
        if (!((current.ns eq Ns.html) && current.name == name)) err("unclosed elements at " + name)
        popUntil(name)
      }
    case "form" =>
      if (!hasTemplateOnStack) {
        val f = formElem
        formElem = null
        if (f == null || !hasInScopeElem(f)) err("stray form end tag")
        else {
          generateImpliedEndTags()
          if (!(currentNode eq f)) err("unclosed elements at form end")
          val i = stackIndexOfElem(f)
          if (i >= 0) stack.remove(i)
        }
      } else {
        // spec: with a template on the stack, </form> closes by scope, not
        // via the form pointer
        if (!hasInScope("form")) err("stray form end tag")
        else {
          generateImpliedEndTags()
          if (!((current.ns eq Ns.html) && current.name == "form"))
            err("unclosed elements at form end")
          popUntil("form")
        }
      }
    case "p" =>
      if (!hasInButtonScope("p")) {
        err("no p to close")
        insertElement("p", new AttrList)
        closeP()
      } else closeP()
    case "li" =>
      if (!hasInListItemScope("li")) err("stray li end tag")
      else {
        generateImpliedEndTags("li")
        if (!((current.ns eq Ns.html) && current.name == "li")) err("unclosed elements at li")
        popUntil("li")
      }
    case "dd" | "dt" =>
      if (!hasInScope(name)) err("stray end tag " + name)
      else {
        generateImpliedEndTags(name)
        if (!((current.ns eq Ns.html) && current.name == name)) err("unclosed elements at " + name)
        popUntil(name)
      }
    case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
      if (!hasAnyHeadingInScope) err("stray heading end tag")
      else {
        generateImpliedEndTags()
        if (!((current.ns eq Ns.html) && current.name == name)) err("heading end mismatch")
        while (stack.nonEmpty && !((current.ns eq Ns.html) && headings.contains(current.name))) pop()
        if (stack.nonEmpty) pop()
      }
    case "a" | "b" | "big" | "code" | "em" | "font" | "i" | "nobr" | "s" |
         "small" | "strike" | "strong" | "tt" | "u" =>
      if (!adoptionAgency(name)) anyOtherEndTag(name)
    case "applet" | "marquee" | "object" =>
      if (!hasInScope(name)) err("stray end tag " + name)
      else {
        generateImpliedEndTags()
        if (!((current.ns eq Ns.html) && current.name == name)) err("unclosed elements at " + name)
        popUntil(name)
        clearAfeToMarker()
      }
    case "br" =>
      err("br end tag")
      inBodyStartTag("br", new AttrList, selfClosing = false)
    case "template" => endTagMode(InHead, name)
    case _ => anyOtherEndTag(name)
  }

  private def anyOtherEndTag(name: String): Unit = {
    var i = stack.length - 1
    var done = false
    while (!done && i >= 0) {
      val node = stack(i)
      if ((node.ns eq Ns.html) && node.name == name) {
        generateImpliedEndTags(name)
        if (!((current.ns eq Ns.html) && current.name == name)) err("unclosed elements at " + name)
        while (stack.length > i) pop()
        done = true
      } else if (isSpecial(node.name, node.ns)) {
        err("stray end tag " + name)
        done = true
      } else i -= 1
    }
  }

  // ------------------------------------------------------------------ eof

  def eof(): Unit = {
    flushTableText()
    mode match {
      case Initial =>
        quirks = true; doc.quirksMode = "quirks"; err("missing doctype")
        appendHtmlRoot(new AttrList)
        insertElement("head", new AttrList); headElem = currentNode; pop()
        appendBody(new AttrList)
      case BeforeHtml =>
        appendHtmlRoot(new AttrList)
        insertElement("head", new AttrList); headElem = currentNode; pop()
        appendBody(new AttrList)
      case BeforeHead =>
        insertElement("head", new AttrList); headElem = currentNode; pop()
        appendBody(new AttrList)
      case InHead =>
        err("eof in head")
        pop()
        appendBody(new AttrList)
      case InHeadNoscript =>
        err("eof in noscript"); pop(); pop()
        appendBody(new AttrList)
      case AfterHead =>
        appendBody(new AttrList)
      case Text =>
        err("eof in text element")
        pop()
        mode = originalMode
        eof() // reprocess EOF in the restored mode (spec)
      case _ =>
        // spec "in body"/"in template" EOF: an open template is closed and
        // the EOF reprocessed in the restored mode (popUntil guarantees the
        // recursion terminates); a template-context FRAGMENT has in-template
        // on the template-modes stack but no template element — stop parsing
        if (templateModes.nonEmpty && hasTemplateOnStack) {
          err("eof in template")
          popUntil("template")
          clearAfeToMarker()
          popTemplateMode()
          resetInsertionMode()
          eof()
        } else eofFinal()
    }
  }

  private def eofFinal(): Unit = ()

  // ---------------------------------------------------------------- start

  def startTokenization(t: Tokenizer): Unit = {
    tokenizer = t
  }

  /** Reset all per-document state so one builder instance can be reused
    * across the rows of a partition (reference optimization: scratch
    * structures recycled per parse, Core/Tokenizer.cs:344-364 /
    * SURVEY.md §4.1). Scratch buffers keep their capacity. */
  def reset(): Unit = {
    doc = new HDocument
    fragmentRoot = null
    contextName = null
    contextNs = Ns.html
    contextEntry = null
    stack.clear()
    afe.clear()
    mode = Initial
    originalMode = Initial
    framesetOk = true
    headElem = null
    formElem = null
    needToDropLF = false
    fosterEnabled = false
    quirks = false
    tableTextPending = false
    tableText.setLength(0)
    templateModes.clear()
    detectedCharset = null
    errors.clear()
  }
}
