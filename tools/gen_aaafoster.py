#!/usr/bin/env python3
"""Spec-oracle generator: adoption agency × table foster parenting.

Extends the gen_aaa mini tree-builder with the table insertion modes
(in-table / in-table-body / in-row / in-cell), implied tbody/tr
structure, clear-to-context pops, reset-insertion-mode, cell AFE
markers, and REAL foster parenting: the in-table anything-else path
processes tokens with the in-body rules under the fostering flag, so
fostered inserts (elements, text with sibling merge, AFE reconstruction
clones, AAA common-ancestor placements) all land before the table.

QUIRKS-mode semantics on purpose (inputs carry no doctype): a <table>
start tag does NOT close an open <p>, matching the engine's quirks
handling for the same inputs.

Random token sequences over formatting ∪ {div,p,span,marquee} ∪
{table,tr,td} explore the AAA-while-fostering space that hand-authored
corpora can barely scratch.
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_aaa import Builder, Node, Text, FORMATTING, MARKER  # noqa: E402

TABLE_CTX = {"table", "html"}
TBODY_CTX = {"tbody", "thead", "tfoot", "html"}
ROW_CTX = {"tr", "html"}


class TableBuilder(Builder):
    def __init__(self):
        super().__init__()
        self.mode = "in_body"
        self.fostering = False

    # ---------------------------------------------------- foster plumbing
    def _foster_insert(self, child):
        table = next(n for n in reversed(self.stack) if n.tag == "table")
        parent = table.parent
        idx = parent.children.index(table)
        if child.parent is not None:
            child.parent.children.remove(child)
        child.parent = parent
        parent.children.insert(idx, child)

    def place_override(self, target, child):
        if self.fostering and target.tag in ("table", "tbody", "thead", "tfoot", "tr"):
            self._foster_insert(child)
        else:
            target.append(child)

    def _place(self, child):
        cur = self.current()
        if self.fostering and cur.tag in ("table", "tbody", "thead", "tfoot", "tr"):
            self._foster_insert(child)
        else:
            cur.append(child)

    def insert_element(self, tag):
        n = Node(tag)
        self._place(n)
        self.stack.append(n)
        return n

    def insert_text(self, s):
        self.reconstruct()
        cur = self.current()
        if self.fostering and cur.tag in ("table", "tbody", "thead", "tfoot", "tr"):
            table = next(n for n in reversed(self.stack) if n.tag == "table")
            parent = table.parent
            idx = parent.children.index(table)
            prev = parent.children[idx - 1] if idx > 0 else None
            if isinstance(prev, Text):
                prev.s += s
            else:
                t = Text(s)
                t.parent = parent
                parent.children.insert(idx, t)
        else:
            if cur.children and isinstance(cur.children[-1], Text):
                cur.children[-1].s += s
            else:
                t = Text(s)
                t.parent = cur
                cur.children.append(t)

    def reconstruct(self):
        # identical to the base class but inserts through _place
        if not self.afe:
            return
        last = self.afe[-1]
        if last is MARKER or last in self.stack:
            return
        i = len(self.afe) - 1
        while True:
            if i == 0:
                break
            i -= 1
            e = self.afe[i]
            if e is MARKER or e in self.stack:
                i += 1
                break
        while i < len(self.afe):
            entry = self.afe[i]
            clone = Node(entry.tag)
            self._place(clone)
            self.stack.append(clone)
            self.afe[i] = clone
            i += 1

    # ------------------------------------------------------ mode helpers
    def in_table_scope(self, tag):
        # "in TABLE scope": barriers are html/table/template only — NOT
        # the full base-scope list (td/th are base barriers but must not
        # hide the enclosing table from </table> etc.)
        for node in reversed(self.stack):
            if node.tag == tag:
                return True
            if node.tag in ("html", "table"):
                return False
        return False

    def clear_to(self, ctx):
        while self.current().tag not in ctx:
            self.stack.pop()

    def reset_mode(self):
        for node in reversed(self.stack):
            if node.tag in ("td", "th"):
                self.mode = "in_cell"
                return
            if node.tag == "tr":
                self.mode = "in_row"
                return
            if node.tag in ("tbody", "thead", "tfoot"):
                self.mode = "in_table_body"
                return
            if node.tag == "caption":
                self.mode = "in_caption"
                return
            if node.tag == "table":
                self.mode = "in_table"
                return
        self.mode = "in_body"

    def close_cell(self):
        self.generate_implied_ends()
        while self.stack:
            if self.stack.pop().tag in ("td", "th"):
                break
        while self.afe:
            if self.afe.pop() is MARKER:
                break
        self.mode = "in_row"

    # ------------------------------------------------------ dispatch
    def token(self, t):
        if t.startswith("</"):
            self.process_end(t[2:-1])
        elif t.startswith("<"):
            self.process_start(t[1:-1])
        else:
            self.process_text(t)

    def foster_in_body(self, fn):
        self.fostering = True
        try:
            fn()
        finally:
            self.fostering = False

    def process_text(self, s):
        if self.mode in ("in_table", "in_table_body", "in_row") and \
           self.current().tag in ("table", "tbody", "thead", "tfoot", "tr"):
            # non-whitespace pending chars (all our texts) are fostered
            self.foster_in_body(lambda: self.insert_text(s))
        else:
            self.insert_text(s)

    def process_start(self, tag):
        m = self.mode
        if m == "in_caption":
            if tag in ("td", "th", "tr", "caption"):
                if self.in_table_scope("caption"):
                    self.close_caption()
                    self.process_start(tag)
                # else ignore
            else:
                self.in_body_start(tag)
        elif m == "in_table":
            if tag == "caption":
                self.clear_to(TABLE_CTX)
                self.afe.append(MARKER)
                self.stack.append(self._child("caption"))
                self.mode = "in_caption"
            elif tag == "tr":
                self.clear_to(TABLE_CTX)
                self.stack.append(self._child("tbody"))
                self.mode = "in_table_body"
                self.process_start("tr")
            elif tag in ("td", "th"):
                self.clear_to(TABLE_CTX)
                self.stack.append(self._child("tbody"))
                self.mode = "in_table_body"
                self.process_start(tag)
            elif tag == "table":
                if self.in_table_scope("table"):
                    while self.stack:
                        if self.stack.pop().tag == "table":
                            break
                    self.reset_mode()
                    self.process_start("table")
                # else ignore
            else:
                self.foster_in_body(lambda: self.start_tag(tag))
        elif m == "in_table_body":
            if tag == "caption":
                # structure tag: close the tbody first, reprocess in-table
                if self.in_table_scope("tbody"):
                    self.clear_to(TBODY_CTX)
                    self.stack.pop()
                    self.mode = "in_table"
                    self.process_start("caption")
                # else ignore
            elif tag == "tr":
                self.clear_to(TBODY_CTX)
                self.stack.append(self._child("tr"))
                self.mode = "in_row"
            elif tag in ("td", "th"):
                self.clear_to(TBODY_CTX)
                self.stack.append(self._child("tr"))
                self.mode = "in_row"
                self.process_start(tag)
            elif tag == "table":
                self.mode = "in_table"
                self.process_start("table")
            else:
                self.foster_in_body(lambda: self.start_tag(tag))
        elif m == "in_row":
            if tag in ("td", "th"):
                self.clear_to(ROW_CTX)
                self.stack.append(self._child(tag))
                self.mode = "in_cell"
                self.afe.append(MARKER)
            elif tag in ("tr", "caption"):
                self.end_row_then(lambda: self.process_start(tag))
            elif tag == "table":
                self.end_row_then(lambda: self.process_start("table"))
            else:
                self.foster_in_body(lambda: self.start_tag(tag))
        elif m == "in_cell":
            if tag in ("td", "th", "tr", "caption"):
                # table-structure start tags close the cell; a <table>
                # start is NOT among them — it falls to the in-body rule
                # and NESTS a new table inside the td/th
                if self.in_table_scope("td") or self.in_table_scope("th"):
                    self.close_cell()
                    self.process_start(tag)
                # else ignore
            else:
                self.in_body_start(tag)
        else:
            self.in_body_start(tag)

    def close_caption(self):
        self.generate_implied_ends()
        while self.stack:
            if self.stack.pop().tag == "caption":
                break
        while self.afe:
            if self.afe.pop() is MARKER:
                break
        self.mode = "in_table"

    def _child(self, tag):
        n = Node(tag)
        self.current().append(n)
        return n

    def in_body_start(self, tag):
        if tag == "table":
            # QUIRKS: no p closing
            self.insert_element("table")
            self.mode = "in_table"
        elif tag in ("td", "th", "tr", "caption"):
            pass  # stray cell/row tags outside a table: ignored in body
        else:
            self.start_tag(tag)

    def end_row_then(self, cont):
        if self.in_table_scope("tr"):
            self.clear_to(ROW_CTX)
            self.stack.pop()  # the tr
            self.mode = "in_table_body"
            cont()
        # else ignore (for </tr>) / ignore reprocess triggers

    def process_end(self, tag):
        m = self.mode
        if m == "in_caption":
            if tag == "caption":
                if self.in_table_scope("caption"):
                    self.close_caption()
            elif tag == "table":
                if self.in_table_scope("caption"):
                    self.close_caption()
                    self.process_end("table")
            elif tag in ("td", "th", "tr"):
                pass  # parse error, ignore
            else:
                self.end_tag(tag)
        elif m == "in_table":
            if tag == "table":
                if self.in_table_scope("table"):
                    while self.stack:
                        if self.stack.pop().tag == "table":
                            break
                    self.reset_mode()
            elif tag in ("td", "th", "tr", "caption", "tbody"):
                pass  # parse error, ignore
            else:
                self.foster_in_body(lambda: self.end_tag(tag))
        elif m == "in_table_body":
            if tag == "table":
                if self.in_table_scope("tbody"):
                    self.clear_to(TBODY_CTX)
                    self.stack.pop()
                    self.mode = "in_table"
                    self.process_end("table")
            elif tag in ("td", "th", "tr", "caption"):
                pass
            else:
                self.foster_in_body(lambda: self.end_tag(tag))
        elif m == "in_row":
            if tag == "tr":
                self.end_row_then(lambda: None)
            elif tag == "table":
                self.end_row_then(lambda: self.process_end("table"))
            elif tag in ("td", "th", "caption", "tbody"):
                pass  # parse error, ignore
            else:
                self.foster_in_body(lambda: self.end_tag(tag))
        elif m == "in_cell":
            if tag in ("td", "th"):
                if self.in_table_scope(tag):
                    self.close_cell()
            elif tag in ("table", "tr", "tbody"):
                if self.in_table_scope(tag):
                    self.close_cell()
                    self.process_end(tag)
            elif tag == "caption":
                pass  # parse error, ignore
            else:
                self.end_tag(tag)
        else:
            if tag in ("td", "th", "tr", "table", "caption"):
                pass  # stray table end tags in body: ignored
            else:
                self.end_tag(tag)


def run(tokens):
    b = TableBuilder()
    for t in tokens:
        b.token(t)
    return b.serialize()


def main():
    rnd = random.Random(424242)
    fmt_small = ["b", "i", "a", "nobr", "em", "u", "font"]
    tags = fmt_small + ["div", "p", "span", "marquee", "table", "tr", "td",
                        "th", "caption"]
    texts = ["1", "2", "3"]
    alphabet = ([f"<{t}>" for t in tags] + [f"</{t}>" for t in tags] + texts)
    seen = set()
    cases = []
    trials = 0
    while len(cases) < 500 and trials < 60000:
        trials += 1
        k = rnd.randint(4, 14)
        toks = [rnd.choice(alphabet) for _ in range(k)]
        # bias toward sequences that actually open a table
        if rnd.random() < 0.7 and "<table>" not in toks:
            toks.insert(rnd.randint(0, len(toks)), "<table>")
        started = [t[1:-1] for t in toks if t.startswith("<") and not t.startswith("</")]
        for i, t in enumerate(toks):
            if t.startswith("</") and started and rnd.random() < 0.7:
                toks[i] = "</" + rnd.choice(started) + ">"
        if toks[0].startswith("</"):
            toks = ["0"] + toks
        data = "".join(toks)
        if data in seen:
            continue
        seen.add(data)
        try:
            tree = run(toks)
        except Exception:
            continue
        cases.append("#data\n" + data + "\n#errors\n#document\n" + tree)
    for toks in [  # canonical anchors
        ["<table>", "<b>", "1", "<tr>", "<td>", "2", "</table>", "3"],
        ["<b>", "<table>", "<td>", "1", "</b>", "2", "</table>", "3"],
        ["<a>", "<table>", "<a>", "1", "</table>", "2"],
        ["<table>", "1", "<td>", "2"],
        ["<p>", "<table>", "<td>", "x"],
        ["<table>", "<td>", "1", "<table>", "<td>", "2"],
        ["<table>", "<td>", "<b>", "1", "<table>", "2", "</table>", "3"],
    ]:
        data = "".join(toks)
        if data not in seen:
            seen.add(data)
            cases.append("#data\n" + data + "\n#errors\n#document\n" + run(toks))
    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases ({trials} trials)\n")


if __name__ == "__main__":
    main()
