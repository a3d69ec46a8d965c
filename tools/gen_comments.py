#!/usr/bin/env python3
"""Spec-oracle generator: comment + bogus-comment tokenization.

Independent Python implementation of the WHATWG comment state family
(comment start / start dash / comment / less-than sign (+bang, dash,
dash-dash) / end dash / end / end bang) and the bogus-comment entry
points (`<!x`, `<?`, `</` + non-alpha). For an input after `<body>x`,
computes the comment node's exact data and the following text.

The nested `<!--` / `--!>` / `<!-->` / `<!--->` edge cases and the
"comment less-than sign" states (which only matter for parse errors,
not data) are all exercised; data is what the spec's comment state
machine accumulates.
"""
import sys


def tokenize_comment(s):
    """s starts right after '<!--'. Returns (data, rest) where rest is the
    input after the comment closes ('' if EOF-terminated)."""
    data = []
    i = 0
    n = len(s)
    state = "start"

    def fin(rest):
        return ("".join(data), rest)

    while i < n:
        c = s[i]
        if state == "start":
            if c == "-":
                state = "start_dash"; i += 1
            elif c == ">":
                return fin(s[i + 1:])  # abrupt closing <!-->
            else:
                state = "comment"
        elif state == "start_dash":
            if c == "-":
                state = "end"; i += 1
            elif c == ">":
                return fin(s[i + 1:])  # abrupt closing <!--->
            else:
                data.append("-"); state = "comment"
        elif state == "comment":
            if c == "<":
                data.append("<"); state = "lt"; i += 1
            elif c == "-":
                state = "end_dash"; i += 1
            elif c == "\x00":
                data.append("�"); i += 1
            else:
                data.append(c); i += 1
        elif state == "lt":
            if c == "!":
                data.append("!"); state = "lt_bang"; i += 1
            elif c == "<":
                data.append("<"); i += 1
            else:
                state = "comment"
        elif state == "lt_bang":
            if c == "-":
                state = "lt_bang_dash"; i += 1
            else:
                state = "comment"
        elif state == "lt_bang_dash":
            if c == "-":
                state = "lt_bang_dash_dash"; i += 1
            else:
                data.append("-"); state = "comment"  # via end-dash anything-else
        elif state == "lt_bang_dash_dash":
            # reconsume in comment end: '>' closes (nested-comment error)
            state = "end"
        elif state == "end_dash":
            if c == "-":
                state = "end"; i += 1
            else:
                data.append("-"); state = "comment"
        elif state == "end":
            if c == ">":
                return fin(s[i + 1:])
            elif c == "!":
                state = "end_bang"; i += 1
            elif c == "-":
                data.append("-"); i += 1
            else:
                data.append("--"); state = "comment"
        elif state == "end_bang":
            if c == "-":
                data.append("--!"); state = "end_dash"; i += 1
            elif c == ">":
                return fin(s[i + 1:])  # incorrectly closed --!>
            else:
                data.append("--!"); state = "comment"
    # EOF: spec emits the comment token with data AS-IS in every comment
    # state (pending dashes/bangs in end-dash/end/end-bang are lost)
    return fin("")


def bogus_comment(s):
    """s starts right after the bogus-comment trigger; data is everything
    to the first '>' (NUL -> U+FFFD)."""
    j = s.find(">")
    body = s if j == -1 else s[:j]
    rest = "" if j == -1 else s[j + 1:]
    return (body.replace("\x00", "�"), rest)


cases = []


def add(data_src, comment_data, rest):
    if any(ch in rest for ch in "<>&\t\n\f "):
        return
    lines = ["| <html>", "|   <head>", "|   <body>", '|     "x"',
             "|     <!-- " + comment_data + " -->"]
    if rest:
        lines.append('|     "' + rest + '"')
    cases.append("#data\n<body>x" + data_src + "\n#errors\n#document\n"
                 + "\n".join(lines) + "\n")


def main():
    bodies = [
        "", "-", "--", "---", "x", "-x", "--x", "x-", "x--", "x---",
        "<", "<<", "<!", "<!-", "<!--", "<!--x", "<!---", "<x", "a<!b",
        "a<!-b", "a<!--b", "--!", "--!x", "--!-", "--!--", "a--!b",
        "-a-b--c", "a-->junk", "<!-->",
    ]
    closers = ["-->", "--!>", ""]
    for b in bodies:
        for cl in closers:
            src = "<!--" + b + cl
            data, rest = tokenize_comment(b + cl)
            add(src, data, rest)
            src2 = "<!--" + b + cl + "t"
            data2, rest2 = tokenize_comment(b + cl + "t")
            add(src2, data2, rest2)
    # abrupt closings
    for src, data, rest in [("<!-->t", "", "t"), ("<!--->t", "", "t"),
                            ("<!---->t", "", "t"), ("<!----->t", "-", "t")]:
        add(src, data, rest)
    # bogus comments: <!x, <?, </ + non-alpha
    for trig, after in [("<!", "x y"), ("<!", "[CDATA[z]]"), ("<!", "doctypo"),
                        ("<?", "php echo"), ("<?", "xml version=1"),
                        ("</", "#"), ("</", " div"), ("</", "%%"),
                        ("<!", "x\x00y")]:
        for tail in [">t", ""]:
            src = trig + after + tail
            data, rest = bogus_comment(after + tail)
            # bogus comment from "<?" includes the '?' in the data
            if trig == "<?":
                data = "?" + data
            # from "</" the non-alpha char starts the data
            add(src, data, rest)
    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
