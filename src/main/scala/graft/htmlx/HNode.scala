package graft.htmlx

import scala.collection.mutable.ArrayBuffer

/** Namespaces used by the tree builder (reference: Core/TreeBuilder.cs:5394-5476). */
object Ns {
  val html = "http://www.w3.org/1999/xhtml"
  val svg = "http://www.w3.org/2000/svg"
  val mathml = "http://www.w3.org/1998/Math/MathML"
}

/** Mutable DOM built by the tree builder. Executor-task-private; never
  * serialized or shuffled — only the extraction result leaves the task
  * (SURVEY.md §1.2). Mutability (parent pointers, detach/append) is required
  * by the adoption agency algorithm.
  */
sealed abstract class HNode {
  var parent: HParent = _
  def detach(): Unit = {
    if (parent != null) {
      val i = parent.children.indexOf(this)
      if (i >= 0) parent.children.remove(i)
      parent = null
    }
  }
}

sealed abstract class HParent extends HNode {
  val children = new ArrayBuffer[HNode](4)
  def appendChild(c: HNode): Unit = {
    if (c.parent != null) c.detach()
    c.parent = this
    children += c
  }
  def insertBefore(c: HNode, ref: HNode): Unit = {
    if (c.parent != null) c.detach()
    val i = children.indexOf(ref)
    c.parent = this
    if (i < 0) children += c else children.insert(i, c)
  }
  /** Move all children of this node onto `to` (adoption agency step;
    * reference primitive AppendChildrenToNewParent, Core/TreeBuilder.cs:5663-5696). */
  def moveChildrenTo(to: HParent): Unit = {
    children.foreach { c => c.parent = to; to.children += c }
    children.clear()
  }
}

final class HDocument extends HParent {
  var quirksMode: String = "no-quirks" // no-quirks | limited-quirks | quirks
}
final class HFragment extends HParent

final class HElement(val name: String, val ns: String, val attrs: AttrList) extends HParent {
  def attr(n: String): Option[String] = attrs.get(n)
  def isHtmlNs: Boolean = ns eq Ns.html
  /** Template contents (spec 4.12.3): non-null iff this is an HTML
    * `<template>` element. Parsed children land HERE, not in `children` —
    * a separate tree, exactly like the DOM's `template.content` fragment.
    * Tree walks over `children` (extraction, Dom.descendants) therefore
    * exclude template innards by construction; the serializers handle the
    * contents explicitly. This diverges from the reference, which predates
    * `<template>` (Core/InsertionMode.cs:29-74 has no template mode) —
    * 2026 crawl HTML is saturated with it, so parsing contents inline (the
    * reference behavior) would leak hidden UI scaffolding into extracted
    * text (VERDICT r03 "What's missing" #2). */
  var templateContents: HFragment = null
}

final class HText(initial: CharSequence) extends HNode {
  val sb = new java.lang.StringBuilder(initial.length + 8)
  sb.append(initial)
  def text: String = sb.toString
}

final class HComment(val text: String) extends HNode
final class HDoctype(val name: String, val publicId: String, val systemId: String) extends HNode
