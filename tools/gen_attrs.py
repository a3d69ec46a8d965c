#!/usr/bin/env python3
"""Spec-oracle generator: attribute tokenization battery.

Independent implementation of the WHATWG attribute states
(before/attr-name/after-name/before-value/value dq,sq,unquoted/
after-quoted/self-closing-start) including:

  - name case-folding, NUL→U+FFFD, '"' / "'" / '<' kept in names
  - duplicate attribute dropped (first wins)
  - '=' starting an attribute name ("=a" after before-attr-name error)
  - character references in VALUES with the attribute-context legacy
    rule (no-semicolon named entity NOT decoded when followed by
    alphanumeric or '='); numeric always decoded
  - stray '/' treated as before-attr-name; trailing '/>' ignored on
    HTML container elements (<div/>x still contains "x")
  - EOF inside a tag drops the whole tag

Every case is `<body>z<div ATTRS>x</div>` (or EOF-truncated); the tree
is body > "z", div(attrs sorted) > "x".
"""
import sys

# WHATWG character classes are ASCII-only; Python's str.isalnum()/isdigit()/
# isalpha() are Unicode-wide and would diverge from the spec (and the
# engine) on non-ASCII payloads (see gen_charref.py, r5 engine fix)
def _ascii_digit(c): return "0" <= c <= "9"
def _ascii_alpha(c): return "A" <= c <= "Z" or "a" <= c <= "z"
def _ascii_alnum(c): return _ascii_digit(c) or _ascii_alpha(c)


WS = "\t\n\f "
ENTITIES = {
    "amp;": "&", "amp": "&", "lt;": "<", "lt": "<", "gt;": ">", "gt": ">",
    "quot;": '"', "quot": '"', "nbsp;": " ", "nbsp": " ",
    "not;": "¬", "not": "¬", "notin;": "∉", "copy;": "©", "copy": "©",
}
C1 = {0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
      0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
      0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
      0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
      0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
      0x9E: 0x017E, 0x9F: 0x0178}


def numeric_value(v):
    if v == 0 or v > 0x10FFFF or 0xD800 <= v <= 0xDFFF:
        return "�"
    return chr(C1.get(v, v))


def char_ref_attr(s, i):
    """s[i] == '&' inside an attribute value. Returns (text, next_i)."""
    n = len(s)
    j = i + 1
    if j < n and s[j] == "#":
        j += 1
        hexmode = j < n and s[j] in "xX"
        if hexmode:
            j += 1
        digits = ""
        while j < n and (_ascii_digit(s[j]) or (hexmode and s[j].lower() in "abcdef")):
            digits += s[j]
            j += 1
        if not digits:
            return (s[i:j], j)
        if j < n and s[j] == ";":
            j += 1
        return (numeric_value(int(digits, 16 if hexmode else 10)), j)
    run = ""
    k = j
    while k < n and (_ascii_alnum(s[k]) or s[k] == ";"):
        run += s[k]
        k += 1
        if s[k - 1] == ";":
            break
    best = None
    for length in range(len(run), 0, -1):
        if run[:length] in ENTITIES:
            best = run[:length]
            break
    if best is None:
        return ("&", j)
    if not best.endswith(";"):
        nxt = j + len(best)
        if nxt < n and (_ascii_alnum(s[nxt]) or s[nxt] == "="):
            return ("&", j)  # historical: leave &name literal in attributes
    return (ENTITIES[best], j + len(best))


def parse_attrs(s):
    """s starts right after '<div'. Returns (attrs ordered list, rest) or
    (None, None) if EOF hits inside the tag (tag dropped)."""
    attrs = []
    seen = set()
    i = 0
    n = len(s)

    def put(name, value):
        if name not in seen:
            seen.add(name)
            attrs.append((name, value))

    state = "before_name"
    name = ""
    val = ""
    while i < n:
        c = s[i]
        if state == "before_name":
            if c in WS:
                i += 1
            elif c == "/":
                i += 1  # self-closing-start; '>' handled below
                if i < n and s[i] == ">":
                    return (attrs, s[i + 1:])
            elif c == ">":
                return (attrs, s[i + 1:])
            elif c == "=":
                name = "="; val = ""; state = "name"; i += 1
            else:
                name = ""; val = ""; state = "name"
        elif state == "name":
            if c in WS:
                state = "after_name"; i += 1
            elif c == "/" or c == ">":
                put(name, ""); state = "before_name"
            elif c == "=":
                state = "before_value"; i += 1
            elif c == "\x00":
                name += "�"; i += 1
            else:
                # ASCII case folding only (spec lowercases ASCII upper
                # alpha; Python's .lower() would also fold 'É' → 'é',
                # which the engine correctly does NOT)
                name += chr(ord(c) + 32) if "A" <= c <= "Z" else c
                i += 1
        elif state == "after_name":
            if c in WS:
                i += 1
            elif c == "/" or c == ">":
                put(name, ""); state = "before_name"
            elif c == "=":
                state = "before_value"; i += 1
            else:
                put(name, ""); name = ""; val = ""; state = "name"
        elif state == "before_value":
            if c in WS:
                i += 1
            elif c == '"':
                state = "dq"; i += 1
            elif c == "'":
                state = "sq"; i += 1
            elif c == ">":
                put(name, ""); return (attrs, s[i + 1:])
            else:
                state = "unq"
        elif state == "dq" or state == "sq":
            q = '"' if state == "dq" else "'"
            if c == q:
                put(name, val); state = "after_quoted"; i += 1
            elif c == "&":
                t, i = char_ref_attr(s, i); val += t
            elif c == "\x00":
                val += "�"; i += 1
            else:
                val += c; i += 1
        elif state == "after_quoted":
            if c in WS:
                state = "before_name"; i += 1
            elif c == "/":
                state = "before_name"  # handled there (self-closing)
            elif c == ">":
                return (attrs, s[i + 1:])
            else:
                state = "before_name"  # missing-ws error; new attr
        elif state == "unq":
            if c in WS:
                put(name, val); state = "before_name"; i += 1
            elif c == ">":
                put(name, val); return (attrs, s[i + 1:])
            elif c == "&":
                t, i = char_ref_attr(s, i); val += t
            elif c == "\x00":
                val += "�"; i += 1
            else:
                val += c; i += 1
    return (None, None)  # EOF in tag: tag dropped


cases = []


def add(attr_src):
    attrs, rest = parse_attrs(attr_src + ">x</div>")
    assert rest == "x</div>", (attr_src, rest)
    lines = ["| <html>", "|   <head>", "|   <body>", '|     "z"',
             "|     <div>"]
    for k, v in sorted(attrs):
        lines.append('|       ' + k + '="' + v + '"')
    lines.append('|       "x"')
    cases.append("#data\n<body>z<div" + attr_src + ">x</div>"
                 + "\n#errors\n#document\n" + "\n".join(lines) + "\n")


def add_eof(src_after_div):
    """EOF inside the tag: no div at all."""
    attrs, rest = parse_attrs(src_after_div)
    assert attrs is None
    cases.append("#data\n<body>z<div" + src_after_div
                 + "\n#errors\n#document\n"
                 + "\n".join(["| <html>", "|   <head>", "|   <body>",
                              '|     "z"']) + "\n")


def main():
    batt = [
        ' a=b', ' a="b"', " a='b'", ' a=b c=d', ' a="b" c=\'d\'', ' a',
        ' a b', ' a=""', " a=''", ' a=', ' a =b', ' a= b', ' a = b',
        ' a\t=\tb', ' A=b', ' ID=x', ' a=B', ' a=b/', ' a/b', ' a/b=c',
        # non-ASCII attribute names: case folding is ASCII-only, so 'É'
        # must survive UNfolded (Python .lower() would fold it — the
        # divergence class fixed across the generators in r5)
        ' É=1', ' DATA-É=x', ' é=2', ' naïve=y',
        ' /a', ' //', ' / a=b', ' a="b"c=d', " a='b'c", ' =a', ' =a=b',
        ' ==', ' a==b', ' a=b=c', ' a="b=c"', ' <b', ' a<b', ' a=b<c',
        ' "a"=b', " 'a'=b", ' a"b=c', ' a=`x`', ' a=b"', " a=b'",
        ' dup=1 dup=2', ' DUP=1 dup=2', ' a=1 b=2 a=3', ' a a=1',
        ' a="x y"', " a='x/y'", ' a="/>"', " a='>'", ' a="<div>"',
        ' a=&amp;', ' a=&amp', ' a=&ampx', ' a=&amp=1', ' a=&amp;x',
        ' a="&amp"', ' a="&ampx"', ' a="&amp;&lt;"', ' a=&gt', ' a=&gtx',
        ' a=&#65;', ' a=&#65', ' a="a&#65b"', ' a=&#x41;', ' a="&#x4G"',
        ' a=&#;', ' a=&#', ' a="&#xD800;"', ' a="&#0;"', ' a="&#x80;"',
        ' a=&not;b', ' a=&notb', ' a="&notin;"', ' a=&copy2',
        ' a="x"b="y"', ' a b c', ' a= ', ' x=y z', ' empty="" full=v',
        ' a="tab\there"', ' a=v1 a="v2" b=&quot;',
    ]
    for b in batt:
        add(b)
    # self-closing on an HTML container is ignored: <div/>x nests x
    attrs_src = "/"
    lines = ["| <html>", "|   <head>", "|   <body>", '|     "z"',
             "|     <div>", '|       "x"']
    cases.append("#data\n<body>z<div/>x\n#errors\n#document\n"
                 + "\n".join(lines) + "\n")
    # '/' is an ordinary char in an UNQUOTED value: a=b/ -> value "b/"
    cases.append("#data\n<body>z<div a=b/>x\n#errors\n#document\n"
                 + "\n".join(["| <html>", "|   <head>", "|   <body>",
                              '|     "z"', "|     <div>", '|       a="b/"',
                              '|       "x"']) + "\n")
    # quoted value + '/>' IS a self-closing tag (ignored on div)
    cases.append("#data\n<body>z<div a=\"b\"/>x\n#errors\n#document\n"
                 + "\n".join(["| <html>", "|   <head>", "|   <body>",
                              '|     "z"', "|     <div>", '|       a="b"',
                              '|       "x"']) + "\n")
    # EOF inside tags
    for src in [" a=b", " a=\"b", " a='b", " a=", " a", "", " a=b ",
                " a=\"b\"", " /", " a=&amp"]:
        add_eof(src)
    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
