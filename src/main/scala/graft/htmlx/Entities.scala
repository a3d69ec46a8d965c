package graft.htmlx

/** WHATWG named character reference table + numeric char-ref rules.
  *
  * Data: `graft/entities.tsv` — the 2,231-entry spec table (names including
  * semicolon-less legacy variants, values as 1–2 UTF-16 code units). Same
  * public spec data the reference embeds
  * (reference: Core/NamedCharacters.cs:13,352); lookup here is a per-JVM
  * prefix trie rather than the reference's two-char packed acceleration
  * (Core/NamedCharacterAccel.cs:13).
  */
object Entities {

  private final class Node {
    var value: String = null        // non-null => name ending here is an entity
    var endsWithSemicolon = false
    val next = new java.util.HashMap[Character, Node]
  }

  private val root: Node = {
    val r = new Node
    val in = getClass.getResourceAsStream("/graft/entities.tsv")
    require(in != null, "entities.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().foreach { line =>
        val Array(name, cps) = line.split('\t')
        val value = cps.split(' ').map(h => Integer.parseInt(h, 16).toChar).mkString
        var n = r
        var i = 0
        while (i < name.length) {
          val c = Character.valueOf(name.charAt(i))
          var nx = n.next.get(c)
          if (nx == null) { nx = new Node; n.next.put(c, nx) }
          n = nx
          i += 1
        }
        n.value = value
        n.endsWithSemicolon = name.endsWith(";")
      }
    } finally src.close()
    r
  }

  /** Longest entity-name match starting at `s(from)` (the char right after
    * '&'). Returns (consumedLength, replacement, endedWithSemicolon), or
    * (0, null, false) when nothing matches.
    */
  def longestMatch(s: CharSequence, from: Int): (Int, String, Boolean) = {
    var n = root
    var i = from
    var bestLen = 0
    var bestVal: String = null
    var bestSemi = false
    var done = false
    while (!done && i < s.length) {
      val nx = n.next.get(Character.valueOf(s.charAt(i)))
      if (nx == null) done = true
      else {
        n = nx
        i += 1
        if (n.value != null) { bestLen = i - from; bestVal = n.value; bestSemi = n.endsWithSemicolon }
      }
    }
    (bestLen, bestVal, bestSemi)
  }

  /** Windows-1252 remap for numeric refs in 0x80–0x9F (spec table). */
  val windows1252: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178
  ).map(_.toChar)

  /** Map a numeric character reference value to its replacement string per
    * the spec (overflow, NUL, surrogates → U+FFFD; C1 → Windows-1252;
    * astral → surrogate pair).
    */
  /** Parse a numeric character reference whose '#' is at `from`. Returns
    * (consumed chars incl '#' and any ';', replacement, sawSemicolon);
    * (0, null, false) when no digits follow. Single home for the digit
    * fold with its < 0x110000 clamp and the overflow → U+FFFD mapping —
    * shared by the tokenizer and the decode_entities scalar function so
    * the two cannot drift. (The tuple costs one short-lived allocation
    * per numeric reference, next to the replacement String that was
    * always allocated — measured neutral on the entities_decode bench.) */
  def parseNumeric(s: CharSequence, from: Int): (Int, String, Boolean) = {
    val n = s.length
    var q = from + 1
    var hex = false
    if (q < n && (s.charAt(q) == 'x' || s.charAt(q) == 'X')) { hex = true; q += 1 }
    var digits = 0
    var value = 0L
    while (q < n && {
      val c = s.charAt(q)
      if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      else c >= '0' && c <= '9'
    }) {
      val c = s.charAt(q)
      val d = if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
      if (value < 0x110000) value = value * (if (hex) 16 else 10) + d
      digits += 1
      q += 1
    }
    if (digits == 0) (0, null, false)
    else {
      var semi = false
      if (q < n && s.charAt(q) == ';') { q += 1; semi = true }
      (q - from, numericToString(if (value > 0x10FFFF) 0x110000 else value.toInt), semi)
    }
  }

  def numericToString(value: Int): String = {
    if (value == 0 || value > 0x10FFFF || (value >= 0xD800 && value <= 0xDFFF)) "�"
    else if (value >= 0x80 && value <= 0x9F) windows1252(value - 0x80).toString
    else if (value <= 0xFFFF) value.toChar.toString
    else {
      val v = value - 0x10000
      new String(Array((0xD800 + (v >> 10)).toChar, (0xDC00 + (v & 0x3FF)).toChar))
    }
  }
}
