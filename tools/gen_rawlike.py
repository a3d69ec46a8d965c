#!/usr/bin/env python3
"""Spec-oracle generator for RCDATA/RAWTEXT element content.

Independent Python implementation of the WHATWG RCDATA and RAWTEXT
tokenizer states (data, <, </, end-tag-name) plus, for RCDATA, the
character-reference machinery (named longest-match over a small closed
entity subset, decimal/hex numeric with the 0/oob/surrogate → U+FFFD and
C1 → windows-1252 remappings). Inputs are constrained to that subset so
the Python table is complete for every generated case.

Every case is `<body><EL>CONTENT...` so the element lands in <body> and
the expected tree is mechanical:

  | <html>
  |   <head>
  |   <body>
  |     <EL>
  |       "TEXT"
  |     "REST"

Elements: title, textarea (RCDATA); style, xmp, iframe, noembed,
noframes (RAWTEXT). No newlines (textarea leading-LF rule untouched).
"""
import sys

# WHATWG character classes are ASCII-only; Python's str.isalnum()/isdigit()/
# isalpha() are Unicode-wide and would diverge from the spec (and the
# engine) on non-ASCII payloads (see gen_charref.py, r5 engine fix)
def _ascii_digit(c): return "0" <= c <= "9"
def _ascii_alpha(c): return "A" <= c <= "Z" or "a" <= c <= "z"
def _ascii_alnum(c): return _ascii_digit(c) or _ascii_alpha(c)


WS = "\t\n\f "

# closed entity subset: name (without &) -> decoded text.
# Names NOT ending in ';' are the spec's legacy no-semicolon forms.
ENTITIES = {
    "amp;": "&", "amp": "&", "AMP;": "&", "AMP": "&",
    "lt;": "<", "lt": "<", "gt;": ">", "gt": ">",
    "quot;": '"', "quot": '"', "nbsp;": " ", "nbsp": " ",
    "not;": "¬", "not": "¬", "notin;": "∉",
    "copy;": "©", "copy": "©", "cent;": "¢", "cent": "¢",
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


def char_ref(body, i):
    """Called with body[i] == '&' in a TEXT (not attribute) context.
    Returns (decoded_or_literal_text, next_index)."""
    n = len(body)
    j = i + 1
    if j < n and body[j] in "#":
        j += 1
        hexmode = j < n and body[j] in "xX"
        if hexmode:
            j += 1
        digits = ""
        while j < n and (_ascii_digit(body[j]) or
                         (hexmode and body[j].lower() in "abcdef")):
            digits += body[j]
            j += 1
        if not digits:
            return (body[i:j], j)  # "&#" / "&#x" literal, reconsume after
        if j < n and body[j] == ";":
            j += 1
        return (numeric_value(int(digits, 16 if hexmode else 10)), j)
    # named: longest table match over [a-zA-Z0-9;]+
    run = ""
    k = j
    while k < n and (_ascii_alnum(body[k]) or body[k] == ";"):
        nxt = run + body[k]
        # stop extending past the first ';'
        run = nxt
        k += 1
        if body[k - 1] == ";":
            break
    best = None
    for length in range(len(run), 0, -1):
        if run[:length] in ENTITIES:
            best = run[:length]
            break
    if best is None:
        return ("&", j)  # ambiguous ampersand: '&' literal, rest rescanned
    return (ENTITIES[best], j + len(best))


def tokenize_rawlike(body, name, rcdata):
    out = []
    tmp = ""
    i = 0
    n = len(body)
    state = "data"
    while i < n:
        c = body[i]
        if state == "data":
            if c == "<":
                state = "lt"; i += 1
            elif c == "&" and rcdata:
                text, i = char_ref(body, i)
                out.append(text)
            elif c == "\x00":
                out.append("�"); i += 1
            else:
                out.append(c); i += 1
        elif state == "lt":
            if c == "/":
                tmp = ""; state = "end_open"; i += 1
            else:
                out.append("<"); state = "data"
        elif state == "end_open":
            if _ascii_alpha(c):
                state = "end_name"
            else:
                out.append("</"); state = "data"
        elif state == "end_name":
            if _ascii_alpha(c):
                tmp += c; i += 1
            elif (c in WS or c == "/" or c == ">") and tmp.lower() == name:
                if c == ">":
                    return ("".join(out), True, body[i + 1:])
                j = body.find(">", i)
                if j == -1:
                    return ("".join(out), False, "")
                return ("".join(out), True, body[j + 1:])
            else:
                out.append("</" + tmp); state = "data"
    if state == "end_open":
        out.append("</")
    elif state == "end_name":
        out.append("</" + tmp)
    elif state == "lt":
        out.append("<")
    return ("".join(out), False, "")


def tree_for(el, body, rcdata):
    text, closed, rest = tokenize_rawlike(body, el, rcdata)
    if any(ch in rest for ch in "<>&\t\n\f "):
        return None
    lines = ["| <html>", "|   <head>", "|   <body>", "|     <" + el + ">"]
    if text:
        lines.append('|       "' + text + '"')
    if rest:
        lines.append('|     "' + rest + '"')
    return "\n".join(lines) + "\n"


def main():
    rc = ["title", "textarea"]
    raw = ["style", "xmp", "iframe", "noembed", "noframes"]
    shared = [  # exercised for every element (E = element name)
        "", "x", "<", "</", "</{E}", "</{E}x>after", "</{Eu}", "</x>",
        "< /{E}>", "</ {E}>", "a<b", "a</b>c", "<!-- x -->", "<{E}>nest",
        "x</{E}", "x</{Ep}", "&amp;", "&#65;",
    ]
    rc_only = [
        "&amp; &ampx &amp", "&", "&x", "&;", "&#", "&#x", "&#;", "&#xZZ;",
        "&#65;&#x41;&#97;", "&#0;", "&#x110000;", "&#xD800;", "&#x80;",
        "&#153;", "&notin; &notinx &not; &notx", "&copy&copyx",
        "&lt;b&gt;no tag&lt;/b&gt;", "&quot;q&quot;", "&nbsp;&cent;",
        "&AMP;&AMP", "&#X41;", "&#x2209;", "x&amp", "&ltx",
        "&am p;", "&amp;&", "&&amp;&&", "&#9x;",
    ]
    out = []
    count = 0
    for el in rc + raw:
        rcdata = el in rc
        cores = shared + (rc_only if rcdata else
                          ["&amp; stays literal", "&#65; literal", "&", "&lt;"])
        for core in cores:
            body = (core.replace("{Eu}", el.upper())
                        .replace("{Ep}", el[:-1])
                        .replace("{E}", el))
            for full_body, suffix in ((body, ""),
                                      (body + "</" + el + ">rest", "rest")):
                tree = tree_for(el, full_body, rcdata)
                if tree is None:
                    continue
                data = "<body><" + el + ">" + full_body
                out.append("#data\n" + data + "\n#errors\n#document\n" + tree)
                count += 1
    sys.stdout.write("\n".join(out))
    sys.stderr.write(f"{count} cases\n")


if __name__ == "__main__":
    main()
