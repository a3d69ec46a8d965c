#!/usr/bin/env python3
"""Spec-oracle generator: foreign-content (SVG/MathML) matrices.

Encodes, independently of the engine, the spec's table-driven foreign
rules (13.2.6.5 + "adjust SVG/foreign attributes"):

  1. SVG element-name case adjustments — all 36 renamed elements
     (lowercase input -> camelCase DOM name), plus a few non-renamed
     controls and unknown names
  2. SVG attribute case adjustments — the full adjust-svg-attributes
     table (attributename -> attributeName etc.)
  3. MathML definitionurl -> definitionURL
  4. HTML-breakout start tags inside foreign content — the full spec
     list pops the foreign context and re-processes in body; <font>
     breaks out ONLY with color/face/size attributes
  5. Integration points: svg foreignObject/desc/title and math
     annotation-xml (html encoding) parse HTML children in place;
     math mi/mo/mn/ms/mtext (text integration points) likewise

Tree shapes are uniform per matrix; review is per-template.
"""
import sys

SVG_RENAMED = [
    "altGlyph", "altGlyphDef", "altGlyphItem", "animateColor",
    "animateMotion", "animateTransform", "clipPath", "feBlend",
    "feColorMatrix", "feComponentTransfer", "feComposite",
    "feConvolveMatrix", "feDiffuseLighting", "feDisplacementMap",
    "feDistantLight", "feDropShadow", "feFlood", "feFuncA", "feFuncB",
    "feFuncG", "feFuncR", "feGaussianBlur", "feImage", "feMerge",
    "feMergeNode", "feMorphology", "feOffset", "fePointLight",
    "feSpecularLighting", "feSpotLight", "feTile", "feTurbulence",
    "foreignObject", "glyphRef", "linearGradient", "radialGradient",
    "textPath"]

SVG_ATTRS = [
    "attributeName", "attributeType", "baseFrequency", "baseProfile",
    "calcMode", "clipPathUnits", "diffuseConstant", "edgeMode",
    "filterUnits", "glyphRef", "gradientTransform", "gradientUnits",
    "kernelMatrix", "kernelUnitLength", "keyPoints", "keySplines",
    "keyTimes", "lengthAdjust", "limitingConeAngle", "markerHeight",
    "markerUnits", "markerWidth", "maskContentUnits", "maskUnits",
    "numOctaves", "pathLength", "patternContentUnits", "patternTransform",
    "patternUnits", "pointsAtX", "pointsAtY", "pointsAtZ", "preserveAlpha",
    "preserveAspectRatio", "primitiveUnits", "refX", "refY", "repeatCount",
    "repeatDur", "requiredExtensions", "requiredFeatures", "specularConstant",
    "specularExponent", "spreadMethod", "startOffset", "stdDeviation",
    "stitchTiles", "surfaceScale", "systemLanguage", "tableValues",
    "targetX", "targetY", "textLength", "viewBox", "viewTarget", "xChannelSelector",
    "yChannelSelector", "zoomAndPan"]

BREAKOUT = [
    "b", "big", "blockquote", "body", "br", "center", "code", "dd", "div",
    "dl", "dt", "em", "embed", "h1", "h2", "h3", "h4", "h5", "h6", "head",
    "hr", "i", "img", "li", "listing", "menu", "meta", "nobr", "ol", "p",
    "pre", "ruby", "s", "small", "span", "strong", "strike", "sub", "sup",
    "table", "tt", "u", "ul", "var"]

cases = []


def add(data, *tree_lines):
    tree = "\n".join(["| <html>", "|   <head>", "|   <body>"] +
                     ["|     " + l for l in tree_lines]) + "\n"
    cases.append("#data\n" + data + "\n#errors\n#document\n" + tree)


def main():
    # 1. element-name case adjustment (input all-lowercase)
    for name in SVG_RENAMED:
        add(f"<svg><{name.lower()}></{name.lower()}></svg>",
            "<svg svg>", f"  <svg {name}>")
        # matching is on the LOWERCASED tag name: mixed-case input adjusts too
        if name != name.lower():
            add(f"<svg><{name.upper()}></{name.upper()}></svg>",
                "<svg svg>", f"  <svg {name}>")
    # non-renamed controls keep their lowercase form
    for name in ["circle", "rect", "path", "g", "defs", "unknownelem"]:
        add(f"<svg><{name}/></svg>", "<svg svg>", f"  <svg {name}>")

    # 2. attribute case adjustment
    for attr in SVG_ATTRS:
        add(f"<svg {attr.lower()}=\"v\"></svg>",
            "<svg svg>", f'  {attr}="v"')
    # unadjusted attribute stays verbatim
    add('<svg unknownattr="v"></svg>', "<svg svg>", '  unknownattr="v"')

    # 3. MathML definitionURL
    add('<math definitionurl="d"><mi>x</mi></math>',
        "<math math>", '  definitionURL="d"', "  <math mi>", '    "x"')
    add('<math DEFINITIONURL="d"></math>',
        "<math math>", '  definitionURL="d"')

    # 4. breakout matrix: <svg><desc-less> content, breakout tag pops svg
    for x in BREAKOUT:
        void = x in ("br", "embed", "hr", "img", "meta")
        if x == "head":
            # head in body is ignored after breakout -> text lands in body
            add(f"<svg><g>1</g><{x}>2</svg>3",
                "<svg svg>", "  <svg g>", '    "1"', '"23"')
        elif x == "body":
            # body start tag merges onto the open body: text in body
            add(f"<svg><g>1</g><{x}>2</svg>3",
                "<svg svg>", "  <svg g>", '    "1"', '"23"')
        elif x == "table":
            add(f"<svg><g>1</g><{x}>2</svg>3",
                "<svg svg>", "  <svg g>", '    "1"', '"23"', "<table>")
        elif void:
            add(f"<svg><g>1</g><{x}>2</svg>3",
                "<svg svg>", "  <svg g>", '    "1"', f"<{x}>", '"23"')
        else:
            # the stray </svg> is ignored (x is still open), so "2" and
            # "3" coalesce into one text node inside x
            add(f"<svg><g>1</g><{x}>2</svg>3",
                "<svg svg>", "  <svg g>", '    "1"', f"<{x}>", '  "23"')
    # font WITH color/face/size breaks out; plain font stays foreign
    add("<svg><font color=red>1</svg>2",
        "<svg svg>", "<font>", '  color="red"', '  "12"')
    add("<svg><font weight=bold>1</font></svg>",
        "<svg svg>", "  <svg font>", '    weight="bold"', '    "1"')

    # 5. integration points: HTML parsing inside foreignObject/desc/title
    for ip in ["foreignObject", "desc", "title"]:
        add(f"<svg><{ip.lower()}><p>one paragraph</p></{ip.lower()}></svg>",
            "<svg svg>", f"  <svg {ip}>", "    <p>", '      "one paragraph"')
    # math text integration points: HTML start tags insert as HTML
    add("<math><mi><b>x</b></mi></math>",
        "<math math>", "  <math mi>", "    <b>", '      "x"')
    add("<math><annotation-xml encoding=\"text/html\"><p>h</p></annotation-xml></math>",
        "<math math>", "  <math annotation-xml>", '    encoding="text/html"',
        "    <p>", '      "h"')
    # non-html encoding: <p> breaks out of foreign instead
    add("<math><annotation-xml encoding=\"x\"><p>h</p></annotation-xml></math>",
        "<math math>", "  <math annotation-xml>", '    encoding="x"',
        "<p>", '  "h"')

    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
