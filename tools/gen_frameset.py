#!/usr/bin/env python3
"""Spec-oracle generator: frameset-mode battery.

In-frameset / after-frameset rules encoded independently:
  - frameset replaces an uncommitted body (frameset-ok on); real body
    content cancels it
  - nested framesets; <frame> voids with attrs; rows/cols kept
  - noframes inside frameset parses RAWTEXT
  - characters inside frameset are dropped except whitespace
  - </frameset> pops one level; after the root pops -> after-frameset;
    stray content there is dropped; comments allowed
"""
import sys

cases = []


def doc(data, *tree_lines):
    cases.append("#data\n" + data + "\n#errors\n#document\n"
                 + "\n".join(tree_lines) + "\n")


def main():
    doc("<!DOCTYPE html><frameset cols='50%,*'><frame src=a><frame src=b></frameset>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        '|     cols="50%,*"', "|     <frame>", '|       src="a"',
        "|     <frame>", '|       src="b"')
    doc("<!DOCTYPE html><frameset rows='1,2'><frameset cols='3,4'><frame></frameset><frame></frameset>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        '|     rows="1,2"', "|     <frameset>", '|       cols="3,4"',
        "|       <frame>", "|     <frame>")
    doc("<!DOCTYPE html><frameset><noframes>fallback <b>text</b></noframes></frameset>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        "|     <noframes>", '|       "fallback <b>text</b>"')
    # non-whitespace chars in frameset are dropped; the interior space
    # of "drop me" IS whitespace and is kept
    doc("<!DOCTYPE html><frameset>drop me<frame></frameset>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        '|     " "', "|     <frame>")
    doc("<!DOCTYPE html><frameset> <frame> </frameset>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        '|     " "', "|     <frame>", '|     " "')
    # after-frameset: stray text/tags dropped, comments kept
    doc("<!DOCTYPE html><frameset><frame></frameset>junk<!--c-->",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        "|     <frame>", "|   <!-- c -->")
    # noframes after frameset is allowed
    doc("<!DOCTYPE html><frameset><frame></frameset><noframes>nf</noframes>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        "|     <frame>", "|   <noframes>", '|     "nf"')
    # frameset cancelled by real body content
    doc("<!DOCTYPE html><body>kept text here<frameset><frame></frameset>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
        '|     "kept text here"')
    # an EXPLICIT <body> start tag sets frameset-ok to "not ok" (the
    # after-head body rule), so even a whitespace-only explicit body
    # cancels the frameset; the frame and end tag are stray
    doc("<!DOCTYPE html><body> <frameset><frame></frameset>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <body>",
        '|     " "')
    # EOF inside frameset: tree as-built
    doc("<!DOCTYPE html><frameset><frameset><frame>",
        "| <!DOCTYPE html>", "| <html>", "|   <head>", "|   <frameset>",
        "|     <frameset>", "|       <frame>")

    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
