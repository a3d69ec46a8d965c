#!/usr/bin/env python3
"""Spec-oracle generator: in-table dispatch + foster-parenting matrix.

Encodes the "in table" insertion-mode rules independently of the engine:

  - anything-else start tags / character data are FOSTER-PARENTED before
    the table (text via the pending-table-character-tokens list)
  - whitespace-only pending text stays INSIDE the table
  - caption/colgroup/col/thead/tbody/tfoot/tr/td/th build table structure
    (tr implies tbody; td/th imply tbody+tr; col implies colgroup)
  - <form> inside table: inserted as a child of the table, popped
    immediately (element present, empty)
  - <input type=hidden> inside table: inserted in place, popped (not
    fostered); any other input IS fostered
  - <style>/<script> inside table: in-head rules -> child of the table
  - nested <table> start closes the open table ("ends" it) and opens a
    sibling

Probe shape: <body>x<table>…</table>y keeps placement unambiguous.
"""
import sys

cases = []


def add(data, *tree_lines):
    tree = "\n".join(["| <html>", "|   <head>", "|   <body>"] +
                     ["|     " + l for l in tree_lines]) + "\n"
    cases.append("#data\n" + data + "\n#errors\n#document\n" + tree)


def main():
    # fostered start tags: representative anything-else elements
    for x in ["div", "p", "span", "b", "h1", "ul", "button", "a"]:
        add(f"x<table><{x}>f</{x}><tr><td>c</table>y",
            '"x"', f"<{x}>", '  "f"', "<table>", "  <tbody>", "    <tr>",
            "      <td>", '        "c"', '"y"')
    # fostered voids
    for x in ["img", "br"]:
        add(f"x<table><{x}><tr><td>c</table>y",
            '"x"', f"<{x}>", "<table>", "  <tbody>", "    <tr>",
            "      <td>", '        "c"', '"y"')
    # fostered text: non-whitespace pending chars go before the table,
    # MERGING into the adjacent preceding text node (insert-a-character)
    add("x<table>abc<td>c</table>y",
        '"xabc"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "c"', '"y"')
    # whitespace-only pending chars stay in the table
    add("x<table> <tr><td>c</table>y",
        '"x"', "<table>", '  " "', "  <tbody>", "    <tr>", "      <td>",
        '        "c"', '"y"')
    # mixed: any non-space char spills the WHOLE pending list out
    # (merged into the preceding text node)
    add("x<table> a <tr><td>c</table>y",
        '"x a "', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "c"', '"y"')
    # structure implication chains
    add("x<table><td>c</table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "c"', '"y"')
    add("x<table><th>c</table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <th>",
        '        "c"', '"y"')
    add("x<table><tr><td>a<td>b</table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "a"', "      <td>", '        "b"', '"y"')
    add("x<table><tr><td>a<tr><td>b</table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "a"', "    <tr>", "      <td>", '        "b"', '"y"')
    add("x<table><col width=1><tr><td>c</table>y",
        '"x"', "<table>", "  <colgroup>", "    <col>", '      width="1"',
        "  <tbody>", "    <tr>", "      <td>", '        "c"', '"y"')
    add("x<table><colgroup><col><tr><td>c</table>y",
        '"x"', "<table>", "  <colgroup>", "    <col>",
        "  <tbody>", "    <tr>", "      <td>", '        "c"', '"y"')
    add("x<table><caption>t</caption><tr><td>c</table>y",
        '"x"', "<table>", "  <caption>", '    "t"',
        "  <tbody>", "    <tr>", "      <td>", '        "c"', '"y"')
    add("x<table><thead><tr><th>h</thead><tbody><tr><td>c</table>y",
        '"x"', "<table>", "  <thead>", "    <tr>", "      <th>",
        '        "h"', "  <tbody>", "    <tr>", "      <td>",
        '        "c"', '"y"')
    add("x<table><tfoot><tr><td>f</table>y",
        '"x"', "<table>", "  <tfoot>", "    <tr>", "      <td>",
        '        "f"', '"y"')
    # form in table: child of table, empty
    add("x<table><form><tr><td>c</table>y",
        '"x"', "<table>", "  <form>", "  <tbody>", "    <tr>", "      <td>",
        '        "c"', '"y"')
    # input type=hidden in table: in place; other inputs fostered
    add("x<table><input type=hidden><tr><td>c</table>y",
        '"x"', "<table>", "  <input>", '    type="hidden"',
        "  <tbody>", "    <tr>", "      <td>", '        "c"', '"y"')
    add("x<table><input type=text><tr><td>c</table>y",
        '"x"', "<input>", '  type="text"', "<table>",
        "  <tbody>", "    <tr>", "      <td>", '        "c"', '"y"')
    # style/script in table: in-head rules, stay as table children
    add("x<table><style>s{}</style><tr><td>c</table>y",
        '"x"', "<table>", "  <style>", '    "s{}"',
        "  <tbody>", "    <tr>", "      <td>", '        "c"', '"y"')
    add("x<table><script>var q</script><tr><td>c</table>y",
        '"x"', "<table>", "  <script>", '    "var q"',
        "  <tbody>", "    <tr>", "      <td>", '        "c"', '"y"')
    # nested <table> start tag closes the open table
    add("x<table><tr><td>a</td></tr><table><tr><td>b</table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "a"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "b"', '"y"')
    # fostering lands before the INNERMOST table when tables nest via cells
    add("x<table><tr><td><table><div>d<tr><td>i</table></td></tr></table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        "        <div>", '          "d"', "        <table>",
        "          <tbody>", "            <tr>", "              <td>",
        '                "i"', '"y"')
    # stray </tr>/</td> tokens are ignored without structure
    add("x<table></td></tr><tr><td>c</table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        '        "c"', '"y"')
    # cell end closes implied: td content then </table> closes everything
    add("x<table><tr><td><b>z</table>y",
        '"x"', "<table>", "  <tbody>", "    <tr>", "      <td>",
        "        <b>", '          "z"', '"y"')

    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
