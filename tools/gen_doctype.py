#!/usr/bin/env python3
"""Spec-oracle generator: doctype → quirks-mode matrix.

Encodes the spec's quirks / limited-quirks public-ID tables (13.2.6.4.1
"the initial insertion mode") independently of the engine. Quirks mode
is made observable through the `<p><table>` probe: in quirks mode a
<table> start tag does NOT close an open <p> (the in-body table rule
only closes p when the document is NOT in quirks mode), so

  quirks:     body > p > ["a", table]
  no-quirks:  body > p > "a",  table   (siblings)

limited-quirks behaves like no-quirks for this probe (the distinction
only affects line-height rendering), so the limited rows assert the
sibling shape — plus the doctype node itself is asserted byte-for-byte.
"""
import sys

QUIRKY_FULL_PUBLIC = [
    "-//W3O//DTD W3 HTML Strict 3.0//EN//",
    "-/W3C/DTD HTML 4.0 Transitional/EN",
    "HTML",
]
QUIRKY_PREFIX_PUBLIC = [
    "+//Silmaril//dtd html Pro v0r11 19970101//",
    "-//AS//DTD HTML 3.0 asWedit + extensions//",
    "-//AdvaSoft Ltd//DTD HTML 3.0 asWedit + extensions//",
    "-//IETF//DTD HTML 2.0 Level 1//",
    "-//IETF//DTD HTML 2.0 Level 2//",
    "-//IETF//DTD HTML 2.0 Strict Level 1//",
    "-//IETF//DTD HTML 2.0 Strict Level 2//",
    "-//IETF//DTD HTML 2.0 Strict//",
    "-//IETF//DTD HTML 2.0//",
    "-//IETF//DTD HTML 2.1E//",
    "-//IETF//DTD HTML 3.0//",
    "-//IETF//DTD HTML 3.2 Final//",
    "-//IETF//DTD HTML 3.2//",
    "-//IETF//DTD HTML 3//",
    "-//IETF//DTD HTML Level 0//",
    "-//IETF//DTD HTML Level 1//",
    "-//IETF//DTD HTML Level 2//",
    "-//IETF//DTD HTML Level 3//",
    "-//IETF//DTD HTML Strict Level 0//",
    "-//IETF//DTD HTML Strict Level 1//",
    "-//IETF//DTD HTML Strict Level 2//",
    "-//IETF//DTD HTML Strict Level 3//",
    "-//IETF//DTD HTML Strict//",
    "-//IETF//DTD HTML//",
    "-//Metrius//DTD Metrius Presentational//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 2.0 Tables//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 3.0 Tables//",
    "-//Netscape Comm. Corp.//DTD HTML//",
    "-//Netscape Comm. Corp.//DTD Strict HTML//",
    "-//O'Reilly and Associates//DTD HTML 2.0//",
    "-//O'Reilly and Associates//DTD HTML Extended 1.0//",
    "-//O'Reilly and Associates//DTD HTML Extended Relaxed 1.0//",
    "-//SQ//DTD HTML 2.0 HoTMetaL + extensions//",
    "-//SoftQuad Software//DTD HoTMetaL PRO 6.0::19990601::extensions to HTML 4.0//",
    "-//SoftQuad//DTD HoTMetaL PRO 4.0::19971010::extensions to HTML 4.0//",
    "-//Spyglass//DTD HTML 2.0 Extended//",
    "-//Sun Microsystems Corp.//DTD HotJava HTML//",
    "-//Sun Microsystems Corp.//DTD HotJava Strict HTML//",
    "-//W3C//DTD HTML 3 1995-03-24//",
    "-//W3C//DTD HTML 3.2 Draft//",
    "-//W3C//DTD HTML 3.2 Final//",
    "-//W3C//DTD HTML 3.2//",
    "-//W3C//DTD HTML 3.2S Draft//",
    "-//W3C//DTD HTML 4.0 Frameset//",
    "-//W3C//DTD HTML 4.0 Transitional//",
    "-//W3C//DTD HTML Experimental 19960712//",
    "-//W3C//DTD HTML Experimental 970421//",
    "-//W3C//DTD W3 HTML//",
    "-//W3O//DTD W3 HTML 3.0//",
    "-//WebTechs//DTD Mozilla HTML 2.0//",
    "-//WebTechs//DTD Mozilla HTML//",
]
# quirks only when there is NO system id; limited-quirks when there is one
QUIRKY_IF_NO_SYSTEM = [
    "-//W3C//DTD HTML 4.01 Frameset//",
    "-//W3C//DTD HTML 4.01 Transitional//",
]
LIMITED_PREFIX_PUBLIC = [
    "-//W3C//DTD XHTML 1.0 Frameset//",
    "-//W3C//DTD XHTML 1.0 Transitional//",
]
QUIRKY_SYSTEM = "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd"

PROBE = "<p>a<table>"
cases = []


def dt_line(name, pub, sysid):
    if pub is None and sysid is None:
        return "| <!DOCTYPE " + name + ">"
    p = pub if pub is not None else ""
    s = sysid if sysid is not None else ""
    return '| <!DOCTYPE ' + name + ' "' + p + '" "' + s + '">'


def add(doctype_src, dt_node, quirks):
    if quirks:
        body = ["|     <p>", '|       "a"', "|       <table>"]
    else:
        body = ["|     <p>", '|       "a"', "|     <table>"]
    tree = "\n".join([dt_node, "| <html>", "|   <head>", "|   <body>"]
                     + body) + "\n"
    cases.append("#data\n" + doctype_src + PROBE +
                 "\n#errors\n#document\n" + tree)


def main():
    add("<!DOCTYPE html>", "| <!DOCTYPE html>", False)
    add("<!doctype HTML>", "| <!DOCTYPE html>", False)
    # name != html -> quirks
    add("<!DOCTYPE foo>", "| <!DOCTYPE foo>", True)
    # missing doctype -> quirks (no doctype node)
    if True:
        tree = "\n".join(["| <html>", "|   <head>", "|   <body>",
                          "|     <p>", '|       "a"', "|       <table>"]) + "\n"
        cases.append("#data\n" + PROBE + "\n#errors\n#document\n" + tree)
    for pub in QUIRKY_FULL_PUBLIC:
        add(f'<!DOCTYPE html PUBLIC "{pub}">', dt_line("html", pub, None), True)
    for pub in QUIRKY_PREFIX_PUBLIC:
        # exact prefix and prefix + junk, case-twisted, with/without system
        add(f'<!DOCTYPE html PUBLIC "{pub}">', dt_line("html", pub, None), True)
        ext = pub + "EN"
        add(f'<!DOCTYPE html PUBLIC "{ext}" "x">', dt_line("html", ext, "x"),
            True)
    # case-insensitive public id match
    add('<!DOCTYPE html PUBLIC "-//ietf//dtd html//">',
        dt_line("html", "-//ietf//dtd html//", None), True)
    add('<!DOCTYPE HTML PUBLIC "-//W3C//dtd html 3.2//EN">',
        dt_line("html", "-//W3C//dtd html 3.2//EN", None), True)
    # 4.01 frameset/transitional: quirks WITHOUT system id, limited WITH
    for pub in QUIRKY_IF_NO_SYSTEM:
        add(f'<!DOCTYPE html PUBLIC "{pub}EN">', dt_line("html", pub + "EN", None),
            True)
        add(f'<!DOCTYPE html PUBLIC "{pub}EN" "sys">',
            dt_line("html", pub + "EN", "sys"), False)
    # XHTML 1.0 frameset/transitional: limited-quirks (probe: no-quirks)
    for pub in LIMITED_PREFIX_PUBLIC:
        add(f'<!DOCTYPE html PUBLIC "{pub}EN">', dt_line("html", pub + "EN", None),
            False)
    # quirky system id (full case-insensitive match)
    add(f'<!DOCTYPE html SYSTEM "{QUIRKY_SYSTEM}">',
        dt_line("html", None, QUIRKY_SYSTEM), True)
    add(f'<!DOCTYPE html SYSTEM "{QUIRKY_SYSTEM.upper()}">',
        dt_line("html", None, QUIRKY_SYSTEM.upper()), True)
    # non-quirky modern-ish doctypes
    add('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
        '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">',
        dt_line("html", "-//W3C//DTD XHTML 1.0 Strict//EN",
                "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd"), False)
    add('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
        '"http://www.w3.org/TR/html4/strict.dtd">',
        dt_line("html", "-//W3C//DTD HTML 4.01//EN",
                "http://www.w3.org/TR/html4/strict.dtd"), False)
    add('<!DOCTYPE html SYSTEM "about:legacy-compat">',
        dt_line("html", None, "about:legacy-compat"), False)
    # force-quirks doctype shapes: EOF-ish/bogus doctypes
    add("<!DOCTYPE>", "| <!DOCTYPE >", True)
    add("<!DOCTYPE >", "| <!DOCTYPE >", True)

    sys.stdout.write("\n".join(cases))
    sys.stderr.write(f"{len(cases)} cases\n")


if __name__ == "__main__":
    main()
