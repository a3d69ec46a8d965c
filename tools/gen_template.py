#!/usr/bin/env python3
"""Spec-oracle generator: the "in template" insertion mode (WHATWG 13.2.6.4.18).

An independent Python mini tree-builder implementing the template-relevant
subset of HTML tree construction, written from the spec text (NOT from the
Scala engine), covering:

  - template insertion location: children of a template element land in its
    separate *template contents* fragment (13.2.6.1 final step)
  - the in-template start-tag dispatch: head elements via in-head rules;
    caption/colgroup/tbody/tfoot/thead -> in-table; col -> in-column-group;
    tr -> in-table-body; td/th -> in-row; anything else -> in-body; each
    pops the current template insertion mode and pushes the new one
  - </template> (in-head rules): generate all implied end tags THOROUGHLY,
    pop through the template, clear AFE to the last marker, pop the template
    insertion mode, reset the insertion mode
  - the stack of template insertion modes + reset-the-insertion-mode's
    template entry (and the template-blocks-select-in-table scan)
  - foster parenting step 2: the LAST TEMPLATE wins over the last table when
    it is lower on the stack (misplaced table content inside a template goes
    into its contents, never before an outer table)
  - template as a scope barrier (default/button/list-item/table scopes) and
    in clear-to-table/tbody/row-context loops
  - form-pointer suppression when a template is on the stack (both <form>
    and </form> switch to scope-based behavior)
  - EOF with an open template: close it and reprocess the EOF
  - fragment parsing with a template context (template-modes stack seeded)

Inputs are seeded random token sequences over a template-heavy structural
alphabet plus a systematic matrix; documents carry <!DOCTYPE html> so both
sides run in standards mode. Engine-vs-generator disagreement is a real
finding on one side; adjudicate by spec text.
"""
import random
import sys

WS = " \t\n\f\r"

VOID = {"input", "br", "img", "col"}

DEFAULT_SCOPE_BARRIERS = {"applet", "caption", "html", "table", "td", "th",
                          "marquee", "object", "template"}

IMPLIED_END = {"dd", "dt", "li", "optgroup", "option", "p",
               "rb", "rp", "rt", "rtc"}
IMPLIED_END_THOROUGH = IMPLIED_END | {"caption", "colgroup", "tbody", "td",
                                      "tfoot", "th", "thead", "tr"}

# insertion modes
(INITIAL, BEFORE_HTML, BEFORE_HEAD, IN_HEAD, AFTER_HEAD, IN_BODY, TEXT,
 IN_TABLE, IN_TABLE_TEXT, IN_CAPTION, IN_COLGROUP, IN_TBODY, IN_ROW,
 IN_CELL, IN_SELECT, IN_SELECT_TABLE, IN_TEMPLATE, AFTER_BODY) = range(18)

MARKER = "|MARKER|"


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "content")

    def __init__(self, tag, attrs=None):
        self.tag = tag
        self.attrs = attrs or []
        self.children = []
        self.parent = None
        self.content = None  # template contents fragment (a Node "#frag")

    def append(self, child):
        child.parent = self
        self.children.append(child)

    def insert_before(self, child, ref):
        child.parent = self
        self.children.insert(self.children.index(ref), child)


class Text:
    __slots__ = ("s", "parent")

    def __init__(self, s):
        self.s = s
        self.parent = None


def is_ws(s):
    return all(c in WS for c in s)


class Builder:
    """Spec-subset tree builder. Tokens:
    ('start', tag, attrs) / ('end', tag) / ('text', s) / ('doctype',) /
    ('eof',). Raw-text elements are pre-resolved by the tokenizer into a
    start token + text token + end token (generator keeps contents benign).
    """

    def __init__(self, fragment_ctx=None):
        self.doc = Node("#doc")
        self.mode = INITIAL
        self.orig_mode = None
        self.tmodes = []           # stack of template insertion modes
        self.afe = []              # markers only (no formatting els generated)
        self.form_ptr = None
        self.head_ptr = None
        self.foster = False
        self.pending = []          # in-table-text pending character tokens
        self.frag_ctx = fragment_ctx
        if fragment_ctx is not None:
            self.root = Node("#frag")
            self.stack = [self.root]
            self.ctx_node = Node(fragment_ctx)
            if fragment_ctx == "template":
                self.tmodes.append(IN_TEMPLATE)
            self.reset_mode()
        else:
            self.root = None
            self.stack = []

    # ---------------------------------------------------------------- scope
    def current(self):
        return self.stack[-1]

    def has_in_scope(self, tag, barriers=DEFAULT_SCOPE_BARRIERS):
        for node in reversed(self.stack):
            if node.tag == tag:
                return True
            if node.tag in barriers:
                return False
        return False

    def has_in_button_scope(self, tag):
        return self.has_in_scope(tag, DEFAULT_SCOPE_BARRIERS | {"button"})

    def has_in_list_scope(self, tag):
        return self.has_in_scope(tag, DEFAULT_SCOPE_BARRIERS | {"ol", "ul"})

    def has_in_table_scope(self, tag):
        return self.has_in_scope(tag, {"html", "table", "template"})

    def has_elem_in_scope(self, elem):
        for node in reversed(self.stack):
            if node is elem:
                return True
            if node.tag in DEFAULT_SCOPE_BARRIERS:
                return False
        return False

    def has_template(self):
        return any(n.tag == "template" for n in self.stack)

    # ------------------------------------------------------------ insertion
    def insertion_parent(self, node):
        return node.content if node.tag == "template" else node

    def appropriate_place(self):
        target = self.current()
        if self.foster and target.tag in ("table", "tbody", "tfoot",
                                          "thead", "tr"):
            last_table = last_template = -1
            for i in range(len(self.stack) - 1, -1, -1):
                t = self.stack[i].tag
                if t == "table" and last_table < 0:
                    last_table = i
                if t == "template" and last_template < 0:
                    last_template = i
                if last_table >= 0 and last_template >= 0:
                    break
            if last_template >= 0 and (last_table < 0 or
                                       last_template > last_table):
                return (self.stack[last_template].content, None)
            if last_table < 0:
                return (self.insertion_parent(self.stack[0]), None)
            table = self.stack[last_table]
            if table.parent is not None:
                return (table.parent, table)
            return (self.insertion_parent(self.stack[last_table - 1]), None)
        return (self.insertion_parent(target), None)

    def insert_node(self, node):
        parent, before = self.appropriate_place()
        if before is None:
            parent.append(node)
        else:
            parent.insert_before(node, before)

    def insert_element(self, tag, attrs=None):
        n = Node(tag, attrs)
        if tag == "template":
            n.content = Node("#frag")
        self.insert_node(n)
        self.stack.append(n)
        return n

    def insert_void(self, tag, attrs=None):
        n = Node(tag, attrs)
        self.insert_node(n)
        return n

    def insert_text(self, s):
        parent, before = self.appropriate_place()
        sibs = parent.children
        idx = len(sibs) if before is None else sibs.index(before)
        if idx > 0 and isinstance(sibs[idx - 1], Text):
            sibs[idx - 1].s += s
        else:
            t = Text(s)
            t.parent = parent
            sibs.insert(idx, t)

    # ------------------------------------------------------------- stack ops
    def pop_until(self, tag):
        while self.stack:
            if self.stack.pop().tag == tag:
                return

    def generate_implied_ends(self, except_tag=None, thorough=False):
        tags = IMPLIED_END_THOROUGH if thorough else IMPLIED_END
        while (len(self.stack) > 1 and self.current().tag in tags and
               self.current().tag != except_tag):
            self.stack.pop()

    def clear_afe_to_marker(self):
        while self.afe:
            if self.afe.pop() is MARKER:
                return

    def close_p(self):
        self.generate_implied_ends(except_tag="p")
        self.pop_until("p")

    def clear_to_table_context(self):
        while self.current().tag not in ("table", "template", "html",
                                         "#frag"):
            self.stack.pop()

    def clear_to_tbody_context(self):
        while self.current().tag not in ("tbody", "tfoot", "thead",
                                         "template", "html", "#frag"):
            self.stack.pop()

    def clear_to_row_context(self):
        while self.current().tag not in ("tr", "template", "html", "#frag"):
            self.stack.pop()

    # -------------------------------------------------------- reset the mode
    def reset_mode(self):
        for i in range(len(self.stack) - 1, -1, -1):
            last = i == 0
            node = self.stack[i]
            tag = node.tag
            if last and self.frag_ctx is not None:
                tag = self.frag_ctx
            if tag == "template":
                self.mode = self.tmodes[-1] if self.tmodes else IN_BODY
                return
            if tag == "select":
                self.mode = IN_SELECT
                j = i
                while j > 0:
                    j -= 1
                    a = self.stack[j].tag
                    if j == 0 and self.frag_ctx is not None:
                        a = self.frag_ctx
                    if a == "template":
                        break
                    if a == "table":
                        self.mode = IN_SELECT_TABLE
                        break
                return
            if tag in ("td", "th") and not last:
                self.mode = IN_CELL
                return
            if tag == "tr":
                self.mode = IN_ROW
                return
            if tag in ("tbody", "thead", "tfoot"):
                self.mode = IN_TBODY
                return
            if tag == "caption":
                self.mode = IN_CAPTION
                return
            if tag == "colgroup":
                self.mode = IN_COLGROUP
                return
            if tag == "table":
                self.mode = IN_TABLE
                return
            if tag == "head" and not last:
                self.mode = IN_HEAD
                return
            if tag == "body":
                self.mode = IN_BODY
                return
            if tag == "html":
                self.mode = BEFORE_HEAD if self.head_ptr is None \
                    else AFTER_HEAD
                return
            if last:
                self.mode = IN_BODY
                return

    # --------------------------------------------------------------- driver
    def process(self, tok):
        # reprocess loop: handlers return True to reprocess the same token
        for _ in range(64):
            if not self.dispatch(tok):
                return
        raise RuntimeError("reprocess loop did not converge: %r" % (tok,))

    def dispatch(self, tok):
        m = self.mode
        if m == INITIAL:
            return self.m_initial(tok)
        if m == BEFORE_HTML:
            return self.m_before_html(tok)
        if m == BEFORE_HEAD:
            return self.m_before_head(tok)
        if m == IN_HEAD:
            return self.m_in_head(tok)
        if m == AFTER_HEAD:
            return self.m_after_head(tok)
        if m == IN_BODY:
            return self.m_in_body(tok)
        if m == TEXT:
            return self.m_text(tok)
        if m == IN_TABLE:
            return self.m_in_table(tok)
        if m == IN_TABLE_TEXT:
            return self.m_in_table_text(tok)
        if m == IN_CAPTION:
            return self.m_in_caption(tok)
        if m == IN_COLGROUP:
            return self.m_in_colgroup(tok)
        if m == IN_TBODY:
            return self.m_in_tbody(tok)
        if m == IN_ROW:
            return self.m_in_row(tok)
        if m == IN_CELL:
            return self.m_in_cell(tok)
        if m in (IN_SELECT, IN_SELECT_TABLE):
            return self.m_in_select(tok)
        if m == IN_TEMPLATE:
            return self.m_in_template(tok)
        if m == AFTER_BODY:
            return self.m_after_body(tok)
        raise RuntimeError("mode %d" % m)

    # ------------------------------------------------------- pre-body modes
    def m_initial(self, tok):
        if tok[0] == "doctype":
            d = Node("!doctype")
            self.doc.append(d)
            self.mode = BEFORE_HTML
            return False
        if tok[0] == "text" and is_ws(tok[1]):
            return False
        self.mode = BEFORE_HTML  # quirks not modeled (doctype always given)
        return True

    def m_before_html(self, tok):
        if tok[0] == "text" and is_ws(tok[1]):
            return False
        if tok[0] == "end" and tok[1] not in ("head", "body", "html", "br"):
            return False
        html = Node("html")
        self.doc.append(html)
        self.stack.append(html)
        self.mode = BEFORE_HEAD
        return True

    def m_before_head(self, tok):
        if tok[0] == "text" and is_ws(tok[1]):
            return False
        if tok[0] == "end" and tok[1] not in ("head", "body", "html", "br"):
            return False
        if tok == ("start", "head", None) or (tok[0] == "start" and
                                              tok[1] == "head"):
            self.head_ptr = self.insert_element("head")
            self.mode = IN_HEAD
            return False
        self.head_ptr = self.insert_element("head")
        self.mode = IN_HEAD
        return True

    def m_in_head(self, tok):
        kind = tok[0]
        if kind == "text" and is_ws(tok[1]):
            self.insert_text(tok[1])
            return False
        if kind == "start":
            tag = tok[1]
            if tag in ("script", "style", "title"):
                self.insert_element(tag, tok[2])
                self.orig_mode = self.mode
                self.mode = TEXT
                return False
            if tag == "template":
                self.insert_element("template", tok[2])
                self.afe.append(MARKER)
                self.mode = IN_TEMPLATE
                self.tmodes.append(IN_TEMPLATE)
                return False
            if tag == "head":
                return False  # error, ignore
            self.stack.pop()  # head
            self.mode = AFTER_HEAD
            return True
        if kind == "end":
            tag = tok[1]
            if tag == "head":
                self.stack.pop()
                self.mode = AFTER_HEAD
                return False
            if tag == "template":
                self.end_template()
                return False
            if tag in ("body", "html", "br"):
                self.stack.pop()
                self.mode = AFTER_HEAD
                return True
            return False  # error, ignore
        if kind == "eof":
            self.stack.pop()
            self.mode = AFTER_HEAD
            return True
        # non-ws text
        self.stack.pop()
        self.mode = AFTER_HEAD
        return True

    def m_after_head(self, tok):
        kind = tok[0]
        if kind == "text" and is_ws(tok[1]):
            self.insert_text(tok[1])
            return False
        if kind == "start":
            tag = tok[1]
            if tag == "body":
                self.insert_element("body", tok[2])
                self.mode = IN_BODY
                return False
            if tag in ("script", "style", "template", "title"):
                # error: late head content — reprocess in head with the head
                # element re-pushed, then remove it from the stack
                self.stack.append(self.head_ptr)
                self.m_in_head(tok)
                self.stack.remove(self.head_ptr)
                return False
            if tag == "head":
                return False  # error, ignore
        if kind == "end":
            if tok[1] == "template":
                self.end_template()
                return False
            if tok[1] not in ("body", "html", "br"):
                return False  # error, ignore
        self.insert_element("body")
        self.mode = IN_BODY
        return True

    # --------------------------------------------------------------- in body
    def m_in_body(self, tok):
        kind = tok[0]
        if kind == "text":
            self.insert_text(tok[1])
            return False
        if kind == "eof":
            if self.tmodes:
                return self.m_in_template(tok)
            return False  # stop parsing
        if kind == "start":
            tag, attrs = tok[1], tok[2]
            if tag in ("script", "style", "title", "template"):
                return self.m_in_head(tok)
            if tag in ("div", "p", "ul"):
                if self.has_in_button_scope("p"):
                    self.close_p()
                self.insert_element(tag, attrs)
                return False
            if tag == "li":
                for node in reversed(self.stack):
                    if node.tag == "li":
                        self.generate_implied_ends(except_tag="li")
                        self.pop_until("li")
                        break
                    if node.tag in ("div", "p"):
                        continue  # address/div/p exempt from special stop
                    # the SPECIAL category stop (minus address/div/p, exempt
                    # above); option/span are NOT special — the loop walks
                    # past them to a lower li
                    if node.tag in ("table", "td", "th", "caption", "html",
                                    "template", "ul", "body", "button",
                                    "select", "form", "colgroup", "tbody",
                                    "thead", "tfoot", "tr", "head", "#frag",
                                    "script", "style", "input", "br", "img",
                                    "col"):
                        break
                if self.has_in_button_scope("p"):
                    self.close_p()
                self.insert_element("li", attrs)
                return False
            if tag == "span":
                self.insert_element("span", attrs)
                return False
            if tag == "form":
                if self.form_ptr is not None and not self.has_template():
                    return False  # error, ignore
                if self.has_in_button_scope("p"):
                    self.close_p()
                e = self.insert_element("form", attrs)
                if not self.has_template():
                    self.form_ptr = e
                return False
            if tag in ("input", "br", "img"):
                self.insert_void(tag, attrs)
                return False
            if tag == "table":
                # standards mode (doctype always generated): close open p
                if self.has_in_button_scope("p"):
                    self.close_p()
                self.insert_element("table", attrs)
                self.mode = IN_TABLE
                return False
            if tag == "select":
                self.insert_element("select", attrs)
                if self.mode in (IN_TABLE, IN_CAPTION, IN_TBODY, IN_ROW,
                                 IN_CELL):
                    self.mode = IN_SELECT_TABLE
                else:
                    self.mode = IN_SELECT
                return False
            if tag == "option":
                if self.current().tag == "option":
                    self.stack.pop()
                self.insert_element("option", attrs)
                return False
            if tag in ("caption", "col", "colgroup", "tbody", "td", "tfoot",
                       "th", "thead", "tr", "head"):
                return False  # error, ignore
            self.insert_element(tag, attrs)
            return False
        # end tags
        tag = tok[1]
        if tag == "template":
            self.end_template()
            return False
        if tag == "p":
            if not self.has_in_button_scope("p"):
                self.insert_element("p")  # error: manufacture then close
            self.close_p()
            return False
        if tag == "li":
            if not self.has_in_list_scope("li"):
                return False
            self.generate_implied_ends(except_tag="li")
            self.pop_until("li")
            return False
        if tag == "form":
            if not self.has_template():
                node = self.form_ptr
                self.form_ptr = None
                if node is None or not self.has_elem_in_scope(node):
                    return False  # error, ignore
                self.generate_implied_ends()
                if node in self.stack:
                    self.stack.remove(node)
                return False
            if not self.has_in_scope("form"):
                return False
            self.generate_implied_ends()
            self.pop_until("form")
            return False
        if tag == "br":
            self.insert_void("br")  # error: acts as <br>
            return False
        if tag == "body":
            self.mode = AFTER_BODY
            return False
        if tag in ("div", "ul"):
            # the address/article/.../div/.../ul end-tag family: scope check,
            # generate implied end tags, pop THROUGH the element (special
            # elements like an open <li> do NOT block this, unlike the
            # any-other-end-tag algorithm)
            if not self.has_in_scope(tag):
                return False
            self.generate_implied_ends()
            self.pop_until(tag)
            return False
        if tag in ("span", "option", "select", "table",
                   "caption", "colgroup", "tbody", "thead", "tfoot", "tr",
                   "td", "th", "script", "style", "input", "img", "col",
                   "html", "head"):
            if tag in ("table", "caption", "colgroup", "tbody", "thead",
                       "tfoot", "tr", "td", "th", "script", "style", "input",
                       "img", "col", "head", "html", "select"):
                if tag == "html":
                    self.mode = AFTER_BODY
                return False  # any-other-end-tag hits special/absent: ignore
            # any other end tag: span/option
            for i in range(len(self.stack) - 1, -1, -1):
                node = self.stack[i]
                if node.tag == tag:
                    self.generate_implied_ends(except_tag=tag)
                    while len(self.stack) > i:
                        self.stack.pop()
                    return False
                if node.tag not in ("span", "option", "b", "i", "u"):
                    return False  # special: error, ignore
            return False
        return False

    def m_text(self, tok):
        if tok[0] == "text":
            self.insert_text(tok[1])
            return False
        # end tag (or EOF): pop the raw-text element, restore
        self.stack.pop()
        self.mode = self.orig_mode
        return tok[0] == "eof"

    # -------------------------------------------------------------- in table
    def m_in_table(self, tok):
        kind = tok[0]
        # spec 13.2.6.4.9 pend list INCLUDES template (it is not a foster
        # target, but table text with a template current node still pends)
        if kind == "text" and self.current().tag in (
                "table", "tbody", "tfoot", "thead", "tr", "template"):
            self.pending = []
            self.orig_mode = self.mode
            self.mode = IN_TABLE_TEXT
            return True
        if kind == "start":
            tag, attrs = tok[1], tok[2]
            if tag == "caption":
                self.clear_to_table_context()
                self.afe.append(MARKER)
                self.insert_element("caption", attrs)
                self.mode = IN_CAPTION
                return False
            if tag == "colgroup":
                self.clear_to_table_context()
                self.insert_element("colgroup", attrs)
                self.mode = IN_COLGROUP
                return False
            if tag == "col":
                self.clear_to_table_context()
                self.insert_element("colgroup")
                self.mode = IN_COLGROUP
                return True
            if tag in ("tbody", "tfoot", "thead"):
                self.clear_to_table_context()
                self.insert_element(tag, attrs)
                self.mode = IN_TBODY
                return False
            if tag in ("td", "th", "tr"):
                self.clear_to_table_context()
                self.insert_element("tbody")
                self.mode = IN_TBODY
                return True
            if tag == "table":
                if not self.has_in_table_scope("table"):
                    return False  # error, ignore
                self.pop_until("table")
                self.reset_mode()
                return True
            if tag in ("style", "script", "template"):
                return self.m_in_head(tok)
            if tag == "input" and any(k == "type" and v.lower() == "hidden"
                                      for k, v in (attrs or [])):
                self.insert_void("input", attrs)  # error; in place, no foster
                return False
            if tag == "form":
                if self.has_template() or self.form_ptr is not None:
                    return False  # error, ignore
                e = self.insert_element("form", attrs)
                self.form_ptr = e
                self.stack.pop()
                return False
        if kind == "end":
            tag = tok[1]
            if tag == "table":
                if not self.has_in_table_scope("table"):
                    return False
                self.pop_until("table")
                self.reset_mode()
                return False
            if tag == "template":
                self.end_template()
                return False
            if tag in ("body", "caption", "col", "colgroup", "html",
                       "tbody", "td", "tfoot", "th", "thead", "tr"):
                return False  # error, ignore
        if kind == "eof":
            return self.m_in_body(tok)
        # anything else: foster-parented in-body processing
        self.foster = True
        r = self.m_in_body(tok)
        self.foster = False
        return r

    def m_in_table_text(self, tok):
        if tok[0] == "text":
            self.pending.append(tok[1])
            return False
        s = "".join(self.pending)
        self.pending = []
        if s:
            if not is_ws(s):
                self.foster = True
                self.insert_text(s)
                self.foster = False
            else:
                self.insert_text(s)
        self.mode = self.orig_mode
        return True

    def m_in_caption(self, tok):
        kind = tok[0]
        if kind == "end" and tok[1] == "caption":
            if not self.has_in_table_scope("caption"):
                return False
            self.generate_implied_ends()
            self.pop_until("caption")
            self.clear_afe_to_marker()
            self.mode = IN_TABLE
            return False
        if (kind == "start" and tok[1] in ("caption", "col", "colgroup",
                                           "tbody", "td", "tfoot", "th",
                                           "thead", "tr")) or \
           (kind == "end" and tok[1] == "table"):
            if not self.has_in_table_scope("caption"):
                return False
            self.generate_implied_ends()
            self.pop_until("caption")
            self.clear_afe_to_marker()
            self.mode = IN_TABLE
            return True
        if kind == "end" and tok[1] in ("body", "col", "colgroup", "html",
                                        "tbody", "td", "tfoot", "th",
                                        "thead", "tr"):
            return False
        return self.m_in_body(tok)

    def m_in_colgroup(self, tok):
        kind = tok[0]
        if kind == "text":
            # Per spec this mode handles CHARACTER tokens one at a time:
            # whitespace inserts unconditionally; a non-ws char hits
            # "anything else" (ignore unless current node is a colgroup,
            # in which case pop, switch to in-table, reprocess the rest).
            s = tok[1]
            for i, ch in enumerate(s):
                if ch in WS:
                    self.insert_text(ch)
                elif self.current().tag == "colgroup":
                    self.stack.pop()
                    self.mode = IN_TABLE
                    self.process(("text", s[i:]))
                    return False
                # else: parse error, ignore the character
            return False
        if kind == "start":
            if tok[1] == "col":
                self.insert_void("col", tok[2])
                return False
            if tok[1] == "template":
                return self.m_in_head(tok)
        if kind == "end":
            if tok[1] == "colgroup":
                if self.current().tag == "colgroup":
                    self.stack.pop()
                    self.mode = IN_TABLE
                return False
            if tok[1] == "col":
                return False
            if tok[1] == "template":
                self.end_template()
                return False
        if kind == "eof":
            return self.m_in_body(tok)
        if self.current().tag != "colgroup":
            return False  # error, ignore (fragment case)
        self.stack.pop()
        self.mode = IN_TABLE
        return True

    def m_in_tbody(self, tok):
        kind = tok[0]
        if kind == "start":
            tag = tok[1]
            if tag == "tr":
                self.clear_to_tbody_context()
                self.insert_element("tr", tok[2])
                self.mode = IN_ROW
                return False
            if tag in ("td", "th"):
                self.clear_to_tbody_context()
                self.insert_element("tr")
                self.mode = IN_ROW
                return True
            if tag in ("caption", "col", "colgroup", "tbody", "tfoot",
                       "thead"):
                if not (self.has_in_table_scope("tbody") or
                        self.has_in_table_scope("thead") or
                        self.has_in_table_scope("tfoot")):
                    return False
                self.clear_to_tbody_context()
                self.stack.pop()
                self.mode = IN_TABLE
                return True
        if kind == "end":
            tag = tok[1]
            if tag in ("tbody", "tfoot", "thead"):
                if not self.has_in_table_scope(tag):
                    return False
                self.clear_to_tbody_context()
                self.stack.pop()
                self.mode = IN_TABLE
                return False
            if tag == "table":
                if not (self.has_in_table_scope("tbody") or
                        self.has_in_table_scope("thead") or
                        self.has_in_table_scope("tfoot")):
                    return False
                self.clear_to_tbody_context()
                self.stack.pop()
                self.mode = IN_TABLE
                return True
            if tag in ("body", "caption", "col", "colgroup", "html", "td",
                       "th", "tr"):
                return False
        return self.m_in_table(tok)

    def m_in_row(self, tok):
        kind = tok[0]
        if kind == "start" and tok[1] in ("td", "th"):
            self.clear_to_row_context()
            self.insert_element(tok[1], tok[2])
            self.mode = IN_CELL
            self.afe.append(MARKER)
            return False
        if kind == "end" and tok[1] == "tr":
            if not self.has_in_table_scope("tr"):
                return False
            self.clear_to_row_context()
            self.stack.pop()
            self.mode = IN_TBODY
            return False
        if (kind == "start" and tok[1] in ("caption", "col", "colgroup",
                                           "tbody", "tfoot", "thead",
                                           "tr")) or \
           (kind == "end" and tok[1] == "table"):
            if not self.has_in_table_scope("tr"):
                return False
            self.clear_to_row_context()
            self.stack.pop()
            self.mode = IN_TBODY
            return True
        if kind == "end" and tok[1] in ("tbody", "tfoot", "thead"):
            if not self.has_in_table_scope(tok[1]):
                return False
            if not self.has_in_table_scope("tr"):
                return False
            self.clear_to_row_context()
            self.stack.pop()
            self.mode = IN_TBODY
            return True
        if kind == "end" and tok[1] in ("body", "caption", "col", "colgroup",
                                        "html", "td", "th"):
            return False
        return self.m_in_table(tok)

    def m_in_cell(self, tok):
        kind = tok[0]
        if kind == "end" and tok[1] in ("td", "th"):
            if not self.has_in_table_scope(tok[1]):
                return False
            self.generate_implied_ends()
            self.pop_until(tok[1])
            self.clear_afe_to_marker()
            self.mode = IN_ROW
            return False
        if kind == "start" and tok[1] in ("caption", "col", "colgroup",
                                          "tbody", "td", "tfoot", "th",
                                          "thead", "tr"):
            if not (self.has_in_table_scope("td") or
                    self.has_in_table_scope("th")):
                return False
            self.close_cell()
            return True
        if kind == "end" and tok[1] in ("table", "tbody", "tfoot", "thead",
                                        "tr"):
            if not self.has_in_table_scope(tok[1]):
                return False
            self.close_cell()
            return True
        if kind == "end" and tok[1] in ("body", "caption", "col", "colgroup",
                                        "html"):
            return False
        return self.m_in_body(tok)

    def close_cell(self):
        self.generate_implied_ends()
        while self.stack and self.current().tag not in ("td", "th"):
            self.stack.pop()
        if self.stack:
            self.stack.pop()
        self.clear_afe_to_marker()
        self.mode = IN_ROW

    # -------------------------------------------------------------- in select
    def m_in_select(self, tok):
        kind = tok[0]
        if self.mode == IN_SELECT_TABLE:
            if kind == "start" and tok[1] in ("caption", "table", "tbody",
                                              "tfoot", "thead", "tr", "td",
                                              "th"):
                self.pop_until("select")
                self.reset_mode()
                return True
            if kind == "end" and tok[1] in ("caption", "table", "tbody",
                                            "tfoot", "thead", "tr", "td",
                                            "th"):
                if not self.has_in_table_scope(tok[1]):
                    return False
                self.pop_until("select")
                self.reset_mode()
                return True
        if kind == "text":
            self.insert_text(tok[1])
            return False
        if kind == "start":
            tag = tok[1]
            if tag == "option":
                if self.current().tag == "option":
                    self.stack.pop()
                self.insert_element("option", tok[2])
                return False
            if tag == "select":
                if self.has_in_scope("select",
                                     barriers=self.select_barriers()):
                    self.pop_until("select")
                    self.reset_mode()
                return False
            if tag in ("input",):
                if self.has_in_scope("select",
                                     barriers=self.select_barriers()):
                    self.pop_until("select")
                    self.reset_mode()
                    return True
                return False
            if tag in ("script", "template"):
                return self.m_in_head(tok)
            return False  # error, ignore
        if kind == "end":
            tag = tok[1]
            if tag == "option":
                if self.current().tag == "option":
                    self.stack.pop()
                return False
            if tag == "select":
                if self.has_in_scope("select",
                                     barriers=self.select_barriers()):
                    self.pop_until("select")
                    self.reset_mode()
                return False
            if tag == "template":
                self.end_template()
                return False
            return False
        if kind == "eof":
            return self.m_in_body(tok)
        return False

    @staticmethod
    def select_barriers():
        # select scope: EVERYTHING is a barrier except optgroup/option
        class AllBut:
            def __contains__(self, t):
                return t not in ("optgroup", "option")
        return AllBut()

    # ------------------------------------------------------------ in template
    def m_in_template(self, tok):
        kind = tok[0]
        if kind == "text":
            return self.m_in_body(tok)
        if kind == "start":
            tag = tok[1]
            if tag in ("script", "style", "template", "title"):
                return self.m_in_head(tok)
            if tag in ("caption", "colgroup", "tbody", "tfoot", "thead"):
                self.tmodes.pop()
                self.tmodes.append(IN_TABLE)
                self.mode = IN_TABLE
                return True
            if tag == "col":
                self.tmodes.pop()
                self.tmodes.append(IN_COLGROUP)
                self.mode = IN_COLGROUP
                return True
            if tag == "tr":
                self.tmodes.pop()
                self.tmodes.append(IN_TBODY)
                self.mode = IN_TBODY
                return True
            if tag in ("td", "th"):
                self.tmodes.pop()
                self.tmodes.append(IN_ROW)
                self.mode = IN_ROW
                return True
            self.tmodes.pop()
            self.tmodes.append(IN_BODY)
            self.mode = IN_BODY
            return True
        if kind == "end":
            if tok[1] == "template":
                self.end_template()
                return False
            return False  # error, ignore
        if kind == "eof":
            if not self.has_template():
                return False  # stop parsing
            # error; close the open template and reprocess EOF
            self.pop_until("template")
            self.clear_afe_to_marker()
            if self.tmodes:
                self.tmodes.pop()
            self.reset_mode()
            return True
        return False

    def end_template(self):
        """In-head </template> — the shared handler every mode routes to."""
        if not self.has_template():
            return  # error, ignore
        self.generate_implied_ends(thorough=True)
        self.pop_until("template")
        self.clear_afe_to_marker()
        if self.tmodes:
            self.tmodes.pop()
        self.reset_mode()

    def m_after_body(self, tok):
        if tok[0] == "text" and is_ws(tok[1]):
            return self.m_in_body(tok)
        if tok[0] == "eof":
            return False
        if tok[0] == "end" and tok[1] == "html":
            return False
        self.mode = IN_BODY
        return True

    # ----------------------------------------------------------------- output
    def finish(self):
        self.process(("eof",))

    def serialize(self):
        out = []

        def walk(node, depth):
            ind = "| " + "  " * depth
            if isinstance(node, Text):
                out.append('%s"%s"' % (ind, node.s))
                return
            if node.tag == "!doctype":
                out.append("%s<!DOCTYPE html>" % ind)
                return
            out.append("%s<%s>" % (ind, node.tag))
            for k, v in sorted(node.attrs):
                out.append('%s  %s="%s"' % (ind, k, v))
            if node.content is not None:
                out.append("%scontent" % ("| " + "  " * (depth + 1)))
                for c in node.content.children:
                    walk(c, depth + 2)
            for c in node.children:
                walk(c, depth + 1)

        top = self.root if self.frag_ctx is not None else self.doc
        for c in top.children:
            walk(c, 0)
        return "\n".join(out) + "\n"


# ------------------------------------------------------------------ tokenizer
def tokenize(src):
    """Token stream for the generator's restricted inputs: doctype, tags
    without attributes (except input type=hidden), text without '<'.
    Raw-text contents (script/style/title) must not contain '<'."""
    toks = []
    i = 0
    n = len(src)
    while i < n:
        if src.startswith("<!DOCTYPE html>", i):
            toks.append(("doctype",))
            i += len("<!DOCTYPE html>")
        elif src[i] == "<":
            j = src.index(">", i)
            body = src[i + 1:j]
            if body.startswith("/"):
                toks.append(("end", body[1:].strip()))
            else:
                parts = body.split(None, 1)
                tag = parts[0]
                attrs = []
                if len(parts) > 1:
                    for kv in parts[1].split():
                        if "=" in kv:
                            k, v = kv.split("=", 1)
                            attrs.append((k, v.strip('"')))
                        else:
                            attrs.append((kv, ""))
                toks.append(("start", tag, attrs))
            i = j + 1
        else:
            j = src.find("<", i)
            if j < 0:
                j = n
            toks.append(("text", src[i:j]))
            i = j
    return toks


def parse(src, fragment_ctx=None):
    b = Builder(fragment_ctx)
    for tok in tokenize(src):
        b.process(tok)
    b.finish()
    return b.serialize()


# ------------------------------------------------------------------ generator
def random_sequences(seed, count):
    rng = random.Random(seed)
    starts = ["template", "table", "caption", "colgroup", "col", "tbody",
              "thead", "tr", "td", "th", "div", "p", "span", "form", "input",
              "select", "option", "li", "ul"]
    # template-heavy weights
    weights = [8, 4, 2, 2, 2, 2, 2, 3, 4, 2, 4, 3, 2, 2, 2, 2, 2, 2, 2]
    ends = ["template", "table", "caption", "colgroup", "tbody", "tr", "td",
            "th", "div", "p", "span", "form", "select", "option", "li", "ul"]
    texts = ["x", "y", "ab", " ", "z "]
    seqs = []
    for _ in range(count):
        ln = rng.randint(3, 12)
        parts = []
        for _ in range(ln):
            r = rng.random()
            if r < 0.55:
                tag = rng.choices(starts, weights)[0]
                parts.append("<%s>" % tag)
            elif r < 0.8:
                parts.append("</%s>" % rng.choice(ends))
            else:
                parts.append(rng.choice(texts))
        seqs.append("".join(parts))
    return seqs


def main():
    # optional args: seed count — fresh-seed mutual-validation sweeps
    # (systematic matrix always included; defaults reproduce the committed
    # h5-templategen.dat battery)
    seed = int(sys.argv[1], 0) if len(sys.argv) > 1 else 0x7E11
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 260
    cases = []

    def doc_case(body):
        src = "<!DOCTYPE html>" + body
        tree = parse(src)
        cases.append("#data\n%s\n#errors\n#document\n%s" % (src, tree))

    def frag_case(body, ctx):
        tree = parse(body, fragment_ctx=ctx)
        cases.append("#data\n%s\n#errors\n#document-fragment\n%s\n#document\n%s"
                     % (body, ctx, tree))

    # ---- systematic matrix: in-template dispatch, one case per branch
    for probe in ["x", "<div>x</div>", "<p>x", "<span>x</span>",
                  "<caption>x</caption>", "<colgroup><col>", "<col>",
                  "<tbody><tr><td>x", "<thead><tr><th>h",
                  "<tfoot><tr><td>f", "<tr><td>x</td></tr>",
                  "<td>x</td>", "<th>x</th>",
                  "<table><tr><td>x</table>",
                  "<select><option>o</select>",
                  "<form><input>", "<li>item",
                  "<template>nested</template>",
                  "<style>s{}</style>", "<script>var q</script>",
                  "<title>t</title>"]:
        doc_case("<body><template>%s</template><p>after" % probe)
        doc_case("<template>%s</template>z" % probe)

    # ---- template in every table-ish container
    for wrap in ["<table>%s</table>", "<table><caption>%s</caption></table>",
                 "<table><colgroup>%s</colgroup></table>",
                 "<table><tbody>%s</tbody></table>",
                 "<table><tbody><tr>%s</tr></tbody></table>",
                 "<table><tbody><tr><td>%s</td></tr></tbody></table>"]:
        doc_case("<body>a" + wrap % "<template><div>t</div></template>" + "b")
    # select + template
    doc_case("<body><select><template><option>o</option></template></select>x")
    doc_case("<body><table><tr><td><select><template>t</template>"
             "<option>o</select></td></tr></table>x")

    # ---- foster parenting: last template beats last table
    doc_case("<body><table><template><div>in</div><tr><td>c</td></tr>"
             "</template></table>after")
    doc_case("<body><table><tbody><template>t</template>"
             "<tr><td>c</td></tr></tbody></table>x")
    doc_case("<body><template><table>leak<tr><td>c</td></tr></table>"
             "</template>x")
    doc_case("<body><table><tr><template><td>c</td></template></tr></table>x")

    # ---- scope barriers: template blocks p/li/form/table closure
    doc_case("<body><p>a<template><p>b</template>c")
    doc_case("<body><ul><li>a<template><li>b</template></ul>")
    doc_case("<body><table><template></table><div>d</div></template></table>x")
    doc_case("<body><form>f<template><form>g</form></template></form>x")
    doc_case("<body><form>a<template>b</template>c</form>d")
    doc_case("<body><template><form>a</form><form>b</form></template>x")

    # ---- </template> thorough implied end tags
    for inner in ["<td>x", "<tr><td>x", "<tbody><tr><td>x", "<caption>x",
                  "<colgroup>", "<p>x", "<li>x", "<thead><tr><th>x"]:
        doc_case("<body><template>%s</template><div>after</div>" % inner)

    # ---- EOF with open template(s)
    doc_case("<body><template><div>x")
    doc_case("<body><template><template><p>y")
    doc_case("<template><td>x")
    doc_case("<body><table><template><tr><td>x")

    # ---- stray </template>, template-less modes
    doc_case("<body></template><div>x</div>")
    doc_case("<body><table></template><tr><td>c</table>x")

    # ---- fragment parsing with template (and related) contexts
    for body in ["<div>x</div>", "x<table><tr><td>c</table>y",
                 "<td>cell</td>", "<tr><td>c</td></tr>", "<col>",
                 "<caption>c</caption>", "<template><div>n</div></template>",
                 "</template>after", "<p>a<p>b"]:
        frag_case(body, "template")
    frag_case("<template><tr><td>c</td></tr></template>", "table")
    frag_case("<template><td>c</td></template>", "tr")
    frag_case("<template><div>d</div></template>", "td")
    frag_case("<template>t</template>", "select")

    # ---- seeded random sequences over the structural alphabet
    for src in random_sequences(seed, count):
        doc_case("<body>" + src)

    sys.stdout.write("\n".join(cases))
    sys.stderr.write("%d cases\n" % len(cases))


if __name__ == "__main__":
    main()
