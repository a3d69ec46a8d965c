#!/usr/bin/env python3
"""Spec-oracle generator: "in select" (+ in-select-in-table) matrix.

Classic in-select rules (pre-2023 relaxation, matching the reference's
vintage and the engine):

  - option pops an open option; optgroup pops open option AND optgroup
    (unlike in-body where optgroup nests)
  - </optgroup> closes via an open option; </option>/</select> as named
  - a nested <select> start tag acts as </select> (closes, no reopen)
  - input / keygen / textarea act as </select> then REPROCESS, landing
    outside the closed select
  - any other start tag is a parse error and IGNORED (text flows in)
  - in-select-in-table: table-structure end tags (td/tr/table...) close
    the select first, then reprocess
"""
import sys

cases = []


def add(data, *tree_lines):
    tree = "\n".join(["| <html>", "|   <head>", "|   <body>"] +
                     ["|     " + l for l in tree_lines]) + "\n"
    cases.append("#data\n" + data + "\n#errors\n#document\n" + tree)


def main():
    add("<select><option>a<option>b</select>x",
        "<select>", "  <option>", '    "a"', "  <option>", '    "b"', '"x"')
    add("<select><optgroup><option>a<optgroup><option>b</select>x",
        "<select>", "  <optgroup>", "    <option>", '      "a"',
        "  <optgroup>", "    <option>", '      "b"', '"x"')
    add("<select><option>a</option>b<option>c</select>",
        "<select>", "  <option>", '    "a"', '  "b"', "  <option>", '    "c"')
    add("<select><optgroup><option>a</optgroup><option>b</select>",
        "<select>", "  <optgroup>", "    <option>", '      "a"',
        "  <option>", '    "b"')
    # stray end tags
    add("<select></option></optgroup><option>a</select>",
        "<select>", "  <option>", '    "a"')
    # nested select acts as </select>
    add("<select>a<select>b",
        "<select>", '  "a"', '"b"')
    # input/keygen close the select and land OUTSIDE it
    add("<select><option>a<input name=n>b",
        "<select>", "  <option>", '    "a"', "<input>", '  name="n"', '"b"')
    add("<select><option>a<keygen>b",
        "<select>", "  <option>", '    "a"', "<keygen>", '"b"')
    # textarea closes select, then opens as RCDATA outside
    add("<select><option>a<textarea>t</textarea>x",
        "<select>", "  <option>", '    "a"', "<textarea>", '  "t"', '"x"')
    # other start tags ignored; their text flows into the select
    add("<select><b>x</b></select>y",
        "<select>", '  "x"', '"y"')
    add("<select><option><div>d</select>y",
        "<select>", "  <option>", '    "d"', '"y"')
    add("<select><p>p1</select>y",
        "<select>", '  "p1"', '"y"')
    # script in select: in-head rules apply
    add("<select><script>var v</script><option>o</select>",
        "<select>", "  <script>", '    "var v"', "  <option>", '    "o"')
    # select inside a cell: </td> closes the select first
    add("<table><tr><td><select><option>o</td><td>z</table>",
        "<table>", "  <tbody>", "    <tr>", "      <td>",
        "        <select>", "          <option>", '            "o"',
        "      <td>", '        "z"')
    # select directly in table: fostered before the table
    add("x<table><select><option>o</table>y",
        '"x"', "<select>", "  <option>", '    "o"', "<table>", '"y"')
    # </table> from inside a fostered select closes select then table
    add("x<table><tr><td>c</td></tr><select><option>o</table>y",
        '"x"', "<select>", "  <option>", '    "o"',
        "<table>", "  <tbody>", "    <tr>", "      <td>", '        "c"',
        '"y"')

    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
