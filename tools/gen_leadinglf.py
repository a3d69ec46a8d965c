#!/usr/bin/env python3
"""Spec-oracle generator: leading-newline skip for pre/listing/textarea.

The in-body rules for <pre>/<listing> and the RCDATA setup for
<textarea> drop a single LF that immediately follows the start tag;
a second LF survives, and an LF that arrives after any other character
survives. (CR forms are normalized to LF by the input stream first;
CR cases live in the in-house corpus since .dat files cannot carry
bare CR.)"""
import sys

cases = []


def add(data, *tree_lines):
    tree = "\n".join(["| <html>", "|   <head>", "|   <body>"] +
                     ["|     " + l for l in tree_lines]) + "\n"
    cases.append("#data\n" + data + "\n#errors\n#document\n" + tree)


def main():
    for el in ["pre", "listing"]:
        add(f"<body><{el}>\nx</{el}>y",
            f"<{el}>", '  "x"', '"y"')
        add(f"<body><{el}>\n\nx</{el}>y",
            f"<{el}>", '  "\nx"', '"y"')
        add(f"<body><{el}>x\ny</{el}>z",
            f"<{el}>", '  "x\ny"', '"z"')
        add(f"<body><{el}></{el}>y",
            f"<{el}>", '"y"')
    el = "textarea"
    add(f"<body><{el}>\nx</{el}>y",
        f"<{el}>", '  "x"', '"y"')
    add(f"<body><{el}>\n\nx</{el}>y",
        f"<{el}>", '  "\nx"', '"y"')
    add(f"<body><{el}>x\ny</{el}>z",
        f"<{el}>", '  "x\ny"', '"z"')
    add(f"<body><{el}>\n</{el}>y",
        f"<{el}>", '"y"')
    # the skip is ONE newline immediately after the tag, not trimming:
    # space + LF keeps both
    add("<body><pre> \nx</pre>y",
        "<pre>", '  " \nx"', '"y"')
    add("<body><textarea> \nx</textarea>y",
        "<textarea>", '  " \nx"', '"y"')
    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
