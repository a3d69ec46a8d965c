#!/usr/bin/env python3
"""Spec-oracle generator: insertion-mode placement battery.

Mechanical placement rules encoded independently of the engine:

  - comments: before doctype / between doctype and html -> document
    level; in after-body -> child of <html> (after body); in
    after-after-body -> document level again
  - late head elements: base/link/meta/style/title after </head> are
    re-routed INTO the head (after-head rule pushes head back)
  - whitespace after </head> stays out of body; text forces body
  - bgsound/basefont in head; noscript-in-head behavior is covered by
    the in-house corpus
  - </html>/</body> stray end tags and text-after-html re-entering body
"""
import sys

cases = []


def doc_case(data, *tree_lines):
    cases.append("#data\n" + data + "\n#errors\n#document\n"
                 + "\n".join(tree_lines) + "\n")


def main():
    doc_case("<!--a--><!DOCTYPE html><!--b--><html><body>x",
              "| <!-- a -->", "| <!DOCTYPE html>", "| <!-- b -->",
              "| <html>", "|   <head>", "|   <body>", '|     "x"')
    doc_case("<!DOCTYPE html>x<!--t-->",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "x"', "|     <!-- t -->")
    # after-body comments are inserted as the HTML element's last child
    doc_case("<!DOCTYPE html><body>x</body><!--after-->",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "x"', "|   <!-- after -->")
    doc_case("<!DOCTYPE html><body>x</body></html><!--end-->",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "x"', "| <!-- end -->")
    # NOTE: comment in after-body goes as the html element's LAST child in
    # the DOM, which the html5lib format prints at depth 1 after <body>;
    # after-after-body comments print at document level
    doc_case("<!DOCTYPE html><body>x</body><!--ab--></html><!--aab-->",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "x"', "|   <!-- ab -->", "| <!-- aab -->")
    # text after </html> re-enters body and appends
    doc_case("<!DOCTYPE html><body>x</body></html>y",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "xy"')
    # late head elements re-routed into head
    doc_case("<!DOCTYPE html><head></head><meta charset=u><body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>",
              "|     <meta>", '|       charset="u"', "|   <body>",
              '|     "x"')
    doc_case("<!DOCTYPE html><head></head><link rel=r><title>t</title><body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>",
              "|     <link>", '|       rel="r"', "|     <title>",
              '|       "t"', "|   <body>", '|     "x"')
    doc_case("<!DOCTYPE html><head></head><style>s{}</style><body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>",
              "|     <style>", '|       "s{}"', "|   <body>", '|     "x"')
    doc_case("<!DOCTYPE html><head></head><base href=h><body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>",
              "|     <base>", '|       href="h"', "|   <body>", '|     "x"')
    # bgsound/basefont belong in head by the in-head rules
    doc_case("<!DOCTYPE html><head><bgsound src=s><basefont size=1></head><body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>",
              "|     <bgsound>", '|       src="s"', "|     <basefont>",
              '|       size="1"', "|   <body>", '|     "x"')
    # whitespace between </head> and <body> is INSERTED into <html>
    # (after-head whitespace rule); only text forces the body open
    doc_case("<!DOCTYPE html><head></head> <body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", '|   " "',
              "|   <body>", '|     "x"')
    doc_case("<!DOCTYPE html><head></head>t<body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "tx"')
    # stray </body> / </html> before any content manufacture the frame
    doc_case("<!DOCTYPE html></body>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "x"')
    doc_case("<!DOCTYPE html></html>x",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "x"')
    # html attrs merge onto the existing html element (first wins)
    doc_case("<!DOCTYPE html><html lang=a><body>x</body><html lang=b dir=d>",
              "| <!DOCTYPE html>", "| <html>", '|   dir="d"',
              '|   lang="a"', "|   <head>", "|   <body>", '|     "x"')
    # body attrs merge likewise
    doc_case("<!DOCTYPE html><body class=a>x<body class=b id=i>y",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     class="a"', '|     id="i"', '|     "xy"')
    # frameset after real body content is ignored (frameset-ok off)
    doc_case("<!DOCTYPE html><body>words here<frameset></frameset>",
              "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
              '|     "words here"')
    # frameset before content replaces the empty body
    doc_case("<!DOCTYPE html><frameset><frame src=f></frameset>",
              "| <!DOCTYPE html>", "| <html>", "|   <head>",
              "|   <frameset>", "|     <frame>", '|       src="f"')

    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
