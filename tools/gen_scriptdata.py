#!/usr/bin/env python3
"""Spec-oracle generator for <script> content tokenization cases.

Implements the WHATWG HTML tokenizer's script-data state family
(script data, escaped, double-escaped, and their <, </, end-tag-name,
escape-start/end sub-states) INDEPENDENTLY of the Scala engine, from the
spec text (13.2.5.4.x). For an input `<script>BODY...` it computes:

  - the text that ends up inside the <script> element
  - whether/where the element is closed by a real </script> end tag
  - the trailing input after the close (parsed as plain body text here;
    the battery only ever emits '' or a bare word after the end tag)

and writes html5lib-format .dat cases with the spec-derived tree. Any
mismatch against the engine is a REAL finding in one of the two
implementations — this is an independent oracle, not TreeGen bootstrap.

Whitespace-only and edge placements are constrained so the surrounding
tree is always: html > head > script (+ optional text), body (+ optional
text). Inputs never contain newlines or quoted attributes with '>'.
"""
import sys

# WHATWG character classes are ASCII-only; Python's str.isalnum()/isdigit()/
# isalpha() are Unicode-wide and would diverge from the spec (and the
# engine) on non-ASCII payloads (see gen_charref.py, r5 engine fix)
def _ascii_digit(c): return "0" <= c <= "9"
def _ascii_alpha(c): return "A" <= c <= "Z" or "a" <= c <= "z"
def _ascii_alnum(c): return _ascii_digit(c) or _ascii_alpha(c)


WS = "\t\n\f "


def tokenize_script(body):
    """Return (script_text, closed, rest). `body` is everything after the
    <script> start tag. If a matching </script> end tag is emitted, `rest`
    is the untokenized remainder after its '>'."""
    out = []
    tmp = ""
    i = 0
    n = len(body)
    state = "data"

    def nul(c):
        return "�" if c == "\x00" else c

    while i < n:
        c = body[i]
        if state == "data":
            if c == "<":
                state = "lt"; i += 1
            elif c == "\x00":
                out.append("�"); i += 1
            else:
                out.append(c); i += 1
        elif state == "lt":
            if c == "/":
                tmp = ""; state = "end_open"; i += 1
            elif c == "!":
                out.append("<!"); state = "esc_start"; i += 1
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
            elif (c in WS or c == "/" or c == ">") and tmp.lower() == "script":
                # appropriate end tag: for '/' and whitespace the tokenizer
                # goes through attribute states; inputs here contain no
                # quoted '>', so the tag ends at the next '>'
                if c == ">":
                    return ("".join(out), True, body[i + 1:])
                j = body.find(">", i)
                if j == -1:
                    # EOF inside the end tag: tag never emitted, and the
                    # pending `</` + name chars were not emitted either
                    # (they were consumed into the tag); spec: EOF in
                    # before-attr-name etc. emits nothing further.
                    return ("".join(out), False, "")
                return ("".join(out), True, body[j + 1:])
            else:
                out.append("</" + tmp); state = "data"
        elif state == "esc_start":
            if c == "-":
                out.append("-"); state = "esc_start_dash"; i += 1
            else:
                state = "data"
        elif state == "esc_start_dash":
            if c == "-":
                out.append("-"); state = "esc_dash_dash"; i += 1
            else:
                state = "data"
        elif state == "esc":
            if c == "-":
                out.append("-"); state = "esc_dash"; i += 1
            elif c == "<":
                state = "esc_lt"; i += 1
            else:
                out.append(nul(c)); i += 1
        elif state == "esc_dash":
            if c == "-":
                out.append("-"); state = "esc_dash_dash"; i += 1
            elif c == "<":
                state = "esc_lt"; i += 1
            else:
                out.append(nul(c)); state = "esc"; i += 1
        elif state == "esc_dash_dash":
            if c == "-":
                out.append("-"); i += 1
            elif c == "<":
                state = "esc_lt"; i += 1
            elif c == ">":
                out.append(">"); state = "data"; i += 1
            else:
                out.append(nul(c)); state = "esc"; i += 1
        elif state == "esc_lt":
            if c == "/":
                tmp = ""; state = "esc_end_open"; i += 1
            elif _ascii_alpha(c):
                tmp = ""; out.append("<"); state = "dbl_start"
            else:
                out.append("<"); state = "esc"
        elif state == "esc_end_open":
            if _ascii_alpha(c):
                state = "esc_end_name"
            else:
                out.append("</"); state = "esc"
        elif state == "esc_end_name":
            if _ascii_alpha(c):
                tmp += c; i += 1
            elif (c in WS or c == "/" or c == ">") and tmp.lower() == "script":
                if c == ">":
                    return ("".join(out), True, body[i + 1:])
                j = body.find(">", i)
                if j == -1:
                    return ("".join(out), False, "")
                return ("".join(out), True, body[j + 1:])
            else:
                out.append("</" + tmp); state = "esc"
        elif state == "dbl_start":
            if c in WS or c == "/" or c == ">":
                state = "dbl" if tmp.lower() == "script" else "esc"
                out.append(c); i += 1
            elif _ascii_alpha(c):
                tmp += c.lower(); out.append(c); i += 1
            else:
                state = "esc"
        elif state == "dbl":
            if c == "-":
                out.append("-"); state = "dbl_dash"; i += 1
            elif c == "<":
                out.append("<"); state = "dbl_lt"; i += 1
            else:
                out.append(nul(c)); i += 1
        elif state == "dbl_dash":
            if c == "-":
                out.append("-"); state = "dbl_dash_dash"; i += 1
            elif c == "<":
                out.append("<"); state = "dbl_lt"; i += 1
            else:
                out.append(nul(c)); state = "dbl"; i += 1
        elif state == "dbl_dash_dash":
            if c == "-":
                out.append("-"); i += 1
            elif c == "<":
                out.append("<"); state = "dbl_lt"; i += 1
            elif c == ">":
                out.append(">"); state = "data"; i += 1
            else:
                out.append(nul(c)); state = "dbl"; i += 1
        elif state == "dbl_lt":
            if c == "/":
                tmp = ""; out.append("/"); state = "dbl_end"; i += 1
            else:
                state = "dbl"
        elif state == "dbl_end":
            if c in WS or c == "/" or c == ">":
                state = "esc" if tmp.lower() == "script" else "dbl"
                out.append(c); i += 1
            elif _ascii_alpha(c):
                tmp += c.lower(); out.append(c); i += 1
            else:
                state = "dbl"
    # EOF: pending partial end-tag text per the end-tag-name "anything
    # else"/EOF rules — </ + consumed name chars are emitted on EOF in
    # the *name* states (spec: EOF emits "</" + temp buffer chars).
    if state in ("end_open", "esc_end_open"):
        out.append("</")
    elif state in ("end_name", "esc_end_name"):
        out.append("</" + tmp)
    elif state in ("lt", "esc_lt"):
        out.append("<")
    return ("".join(out), False, "")


def tree_for(body):
    text, closed, rest = tokenize_script(body)
    lines = ["| <html>", "|   <head>", "|     <script>"]
    if text:
        lines.append('|       "' + text + '"')
    lines.append("|   <body>")
    if any(ch in rest for ch in "<>&\t\n\f "):
        return None  # trailing markup — skip; tree no longer mechanical
    if rest:
        lines.append('|     "' + rest + '"')
    return "\n".join(lines) + "\n"


def main():
    prefixes = ["", "<!--", "<!--x", "<!-- -->", "<!-", "<!x", "a<b"]
    middles = ["", "<script>", "<script >", "<script/>", "<script=>",
               "<scriptx>", "</script", "</scriptx>", "</scrip", "<s",
               "</", "<", "-", "--", "--->", "-- >", "-->x",
               "<!--<script>", "x<script>y-</script>-z",
               "<SCRIPT>", "</SCRIPT", "<script a=b>"]
    suffixes = ["", "-->", "--!>", "</script", "</script x", "x--", "<\x00-"]
    cases = []
    seen = set()
    k = 0
    for p in prefixes:
        for m in middles:
            s = suffixes[k % len(suffixes)]
            k += 1
            core = p + m + s
            for full in (
                "<script>" + core,                     # EOF variant
                "<script>" + core + "</script>x",      # closed variant
                "<script>" + core + "</SCRIPT >y",     # case+space close
            ):
                if full in seen:
                    continue
                seen.add(full)
                cases.append(full)
    # handwritten extras: end-tag attribute/self-closing forms, NULs,
    # boundary partial tags at EOF
    for full in [
        "<script></script x=1>t", "<script></script/>t", "<script></script >t",
        "<script></script\tx>t", "<script>a</scrip", "<script>a</scr\x00ipt>",
        "<script>\x00</script>x", "<script><!--\x00--></script>x",
        "<script><!--<script>\x00</script></script>x",
        "<script><", "<script></", "<script></s", "<script><!", "<script><!-",
        "<script><!--<", "<script><!--</", "<script><!--</scr",
        "<script><!--<script></", "<script><!--<script></script",
        "<script><!--<script>--</script>a</script>b",
        "<script><!--<script>-</script>c</script>d",
        "<script><!--<script>--></script>e",
        "<script><!--<script></script>--></script>f",
        "<script><!--<script></scripty></script>g",
        "<script><!--</scripty></script>h",
        "<script><!--<sCrIpT></ScRiPt a></script>i",
        "<script>a<</script>j", "<script>a</</script>k",
        "<script><!--a<</script>m", "<script><!--a</</script>n",
    ]:
        if full not in seen:
            seen.add(full)
            cases.append(full)

    out = []
    emitted = 0
    for full in cases:
        assert full.startswith("<script>")
        body = full[len("<script>"):]
        tree = tree_for(body)
        if tree is None:
            continue
        emitted += 1
        out.append("#data\n" + full + "\n#errors\n#document\n" + tree)
    sys.stdout.write("\n".join(out))
    sys.stderr.write(f"{emitted} cases emitted of {len(cases)}\n")


if __name__ == "__main__":
    main()
