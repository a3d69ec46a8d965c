#!/usr/bin/env python3
"""Spec-oracle generator: CDATA sections in foreign content.

Independent implementation of the CDATA tokenizer states (cdata
section / bracket / end): inside `<svg>`, `<![CDATA[` opens a section,
everything through `]]>` is literal text (no markup, no entities),
pending `]` / `]]` at EOF are emitted, `]]]>` emits one `]`, and the
`]]` + non-`>` sequence re-enters the section. Outside foreign content
`<![CDATA[...]>` is a bogus comment — two control cases assert that.
"""
import sys

cases = []


def tokenize_cdata(s):
    """s begins after '<![CDATA['. Returns (text, rest) — rest is input
    after the closing ']]>', or '' if EOF-terminated."""
    out = []
    i = 0
    n = len(s)
    state = "data"
    while i < n:
        c = s[i]
        if state == "data":
            if c == "]":
                state = "br"; i += 1
            else:
                out.append(c); i += 1
        elif state == "br":
            if c == "]":
                state = "end"; i += 1
            else:
                out.append("]"); state = "data"
        elif state == "end":
            if c == ">":
                return ("".join(out), s[i + 1:])
            elif c == "]":
                out.append("]"); i += 1
            else:
                out.append("]]"); state = "data"
    if state == "br":
        out.append("]")
    elif state == "end":
        out.append("]]")
    return ("".join(out), "")


def add(body, ns="svg"):
    text, rest = tokenize_cdata(body)
    if any(ch in rest for ch in "<>&\t\n\f "):
        return
    data = f"<{ns}><![CDATA[" + body
    lines = ["| <html>", "|   <head>", "|   <body>", f"|     <{ns} {ns}>"]
    if text:
        lines.append('|       "' + text + '"')
    if rest:
        # after ]]> still inside the foreign element: more foreign text
        if text:
            lines[-1] = '|       "' + text + rest + '"'
        else:
            lines.append('|       "' + rest + '"')
    cases.append("#data\n" + data + "\n#errors\n#document\n"
                 + "\n".join(lines) + "\n")


def main():
    bodies = [
        "", "x", "]", "]]", "]]]", "]]]]", "x]", "x]]", "x]]]",
        "]]>t", "]]]>t", "]]]]>t", "x]]>t", "x]]]>t",
        "]x", "]]x", "]x]]>t", "]]x]]>t",
        "<b>not a tag</b>]]>t", "&amp; literal]]>t", "<!--no comment-->]]>t",
        "a]b]]c", "a]>b]]>t", "]>x]]>t",
        "<![CDATA[nested?]]>t",
    ]
    for b in bodies:
        add(b, "svg")
        add(b, "math")
    # outside foreign content: bogus comment
    cases.append("#data\n<body>x<![CDATA[y]]>z\n#errors\n#document\n"
                 + "\n".join(["| <html>", "|   <head>", "|   <body>",
                              '|     "x"', "|     <!-- [CDATA[y]] -->",
                              '|     "z"']) + "\n")
    cases.append("#data\n<body>x<![CDATA[\n#errors\n#document\n"
                 + "\n".join(["| <html>", "|   <head>", "|   <body>",
                              '|     "x"', "|     <!-- [CDATA[ -->"]) + "\n")
    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
