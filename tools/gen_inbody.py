#!/usr/bin/env python3
"""Spec-oracle generator: "in body" start/end-tag dispatch matrix.

Expected trees are derived from the spec's in-body insertion rules by
CLASS, encoded here independently of the engine:

  - p-closing containers (address..ul, pre/listing, form, headings)
    close an open <p> in button scope; everything else nests inside it
  - void elements (area/br/embed/img/keygen/wbr + input, param/source/
    track, hr which also closes p, image -> img alias)
  - formatting elements push onto the AFE list and are reconstructed
    after a block closes (<p><b>a</p>x duplicates the b)
  - applet/marquee/object insert an AFE MARKER (no reconstruction after
    they close), contrasted with generic containers (reconstruction)
  - li / dd+dt / option+optgroup / button auto-close their own kind,
    li through a <div> (div is not in list-item scope)
  - h1-h6 close an open heading (full 6x6 matrix) and </hN> closes any
    open heading
  - stray </p> inserts an empty p; </br> acts as <br>

Each template states its expected tree shape mechanically; review is
per-template. Any engine disagreement is a real finding on one side.
"""
import sys

P_CLOSERS = ["address", "article", "aside", "blockquote", "center",
             "details", "dialog", "dir", "div", "dl", "fieldset",
             "figcaption", "figure", "footer", "header", "hgroup", "main",
             "menu", "nav", "ol", "section", "summary", "ul", "pre",
             "listing", "form"]
VOIDS_AFE = ["area", "br", "embed", "img", "keygen", "wbr", "input"]
VOIDS_PLAIN = ["param", "source", "track"]
FORMATTING = ["b", "big", "code", "em", "font", "i", "s", "small",
              "strike", "strong", "tt", "u"]  # a/nobr handled separately
GENERIC = ["span", "abbr", "acronym", "bdi", "bdo", "cite", "data", "dfn",
           "kbd", "mark", "q", "samp", "sub", "sup", "time", "var",
           "output", "label", "canvas", "video", "audio", "map", "ins",
           "del", "noscript", "blink", "spacer", "foo-bar", "unknown"]
MARKERS = ["applet", "marquee", "object"]
HEADINGS = ["h1", "h2", "h3", "h4", "h5", "h6"]

cases = []


def add(data, *tree_lines):
    tree = "\n".join(["| <html>", "|   <head>", "|   <body>"] +
                     ["|     " + l for l in tree_lines]) + "\n"
    cases.append("#data\n" + data + "\n#errors\n#document\n" + tree)


def main():
    for x in P_CLOSERS:
        # closes an open <p>; then contains text
        add(f"<p>a<{x}>b",
            "<p>", '  "a"', f"<{x}>", '  "b"')
        # contains a <p> itself
        add(f"<{x}>a<p>b",
            f"<{x}>", '  "a"', "  <p>", '    "b"')
    for x in HEADINGS:
        add(f"<p>a<{x}>b",
            "<p>", '  "a"', f"<{x}>", '  "b"')
    # heading closes heading: full 6x6
    for hi in HEADINGS:
        for hj in HEADINGS:
            add(f"<{hi}>a<{hj}>b",
                f"<{hi}>", '  "a"', f"<{hj}>", '  "b"')
        # </hN> closes any open heading (mismatched name)
        other = "h1" if hi != "h1" else "h2"
        add(f"<{hi}>a</{other}>b",
            f"<{hi}>", '  "a"', '"b"')
    # hr: void AND closes p
    add("<p>a<hr>b", "<p>", '  "a"', "<hr>", '"b"')
    add("<hr>a", "<hr>", '"a"')
    # image -> img alias
    add("<p>a<image>b", "<p>", '  "a"', "  <img>", '  "b"')
    for x in VOIDS_AFE + VOIDS_PLAIN:
        add(f"<p>a<{x}>b",
            "<p>", '  "a"', f"  <{x}>", '  "b"')
        add(f"<{x}>a", f"<{x}>", '"a"')
    for x in FORMATTING:
        # does not close p; nests
        add(f"<p>a<{x}>b",
            "<p>", '  "a"', f"  <{x}>", '    "b"')
        # AFE reconstruction after </p>
        add(f"<p><{x}>a</p>x",
            "<p>", f"  <{x}>", '    "a"', f"<{x}>", '  "x"')
        # formatting contains p (inserted inside, not closed)
        add(f"<{x}>a<p>b",
            f"<{x}>", '  "a"', "  <p>", '    "b"')
    # a-in-a and nobr-in-nobr implicit close
    add("<a>1<a>2", "<a>", '  "1"', "<a>", '  "2"')
    add("<nobr>1<nobr>2", "<nobr>", '  "1"', "<nobr>", '  "2"')
    add("<p>a<a href=x>b", "<p>", '  "a"', '  <a>', '    href="x"', '    "b"')
    for x in GENERIC:
        add(f"<p>a<{x}>b",
            "<p>", '  "a"', f"  <{x}>", '    "b"')
        # <body> prefix: a bare <noscript> before head would instead enter
        # the in-head-noscript mode (empty noscript in head, text in body)
        add(f"<body><{x}>a</{x}>b",
            f"<{x}>", '  "a"', '"b"')
    # AFE marker vs reconstruction contrast
    for x in MARKERS:
        add(f"<{x}><b>c</{x}>d",
            f"<{x}>", "  <b>", '    "c"', '"d"')
    add("<span><b>c</span>d",
        "<span>", "  <b>", '    "c"', "<b>", '  "d"')
    # li auto-close, incl. through a div (div not in list-item scope)
    add("<ul><li>a<li>b",
        "<ul>", "  <li>", '    "a"', "  <li>", '    "b"')
    add("<ol><li>a<div>b<li>c",
        "<ol>", "  <li>", '    "a"', "    <div>", '      "b"',
        "  <li>", '    "c"')
    add("<li>a<li>b", "<li>", '  "a"', "<li>", '  "b"')
    add("<ul><li>a<ul><li>b<li>c</ul><li>d",
        "<ul>", "  <li>", '    "a"', "    <ul>", "      <li>", '        "b"',
        "      <li>", '        "c"', "  <li>", '    "d"')
    # dd/dt auto-close
    add("<dl><dd>a<dt>b<dd>c",
        "<dl>", "  <dd>", '    "a"', "  <dt>", '    "b"', "  <dd>", '    "c"')
    add("<dd>a<dd>b", "<dd>", '  "a"', "<dd>", '  "b"')
    # option/optgroup auto-close
    add("<option>a<option>b",
        "<option>", '  "a"', "<option>", '  "b"')
    add("<option>a<optgroup>b<option>c",
        "<option>", '  "a"', "<optgroup>", '  "b"', "  <option>", '    "c"')
    # optgroup only pops an open OPTION, not an optgroup -> nests
    add("<optgroup>a<optgroup>b",
        "<optgroup>", '  "a"', "  <optgroup>", '    "b"')
    # button closes button
    add("<button>a<button>b",
        "<button>", '  "a"', "<button>", '  "b"')
    # stray </p> manufactures an empty p; </br> acts as <br>
    add("x</p>y", '"x"', "<p>", '"y"')
    add("x</br>y", '"x"', "<br>", '"y"')
    # a lone </p> in before-html is ignored (only head/body/html/br end
    # tags act there); with body open it manufactures the empty p
    add("<body></p>", "<p>")
    add("</br>", "<br>")
    # p in button scope blocked by intervening button: <p>a<button>b<div>c
    # button is in the base scope list, so the inner div does NOT close p
    # (no p in button scope from inside the button)
    add("<p>a<button>b<div>c",
        "<p>", '  "a"', "  <button>", '    "b"', "    <div>", '      "c"')

    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
