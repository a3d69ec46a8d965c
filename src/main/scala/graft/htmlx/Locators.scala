package graft.htmlx

/** Offset → line:column mapping for parse-error display.
  *
  * Engine errors carry flat char offsets ("eof-in-tag @123") because the
  * whole-document model makes the offset the cheap, exact locator (the
  * reference's Locator/TaintableLocator machinery tracks line:col during
  * streaming — here it is a pure display concern). This utility converts
  * on demand: one pass to index line starts, then binary search per error.
  * Offsets index the NORMALIZED input (CRLF/CR → LF), which is what the
  * tokenizer consumed and what `HtmlParser.normalize` returns.
  */
object Locators {

  /** Start offset of each line (line i, 0-based, begins at starts(i)). */
  def lineStarts(input: String): Array[Int] = {
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    starts += 0
    var i = 0
    while (i < input.length) {
      if (input.charAt(i) == '\n') starts += i + 1
      i += 1
    }
    starts.toArray
  }

  /** 1-based (line, column) of a char offset; offsets past the end clamp to
    * the final position. */
  def lineCol(starts: Array[Int], offset: Int): (Int, Int) = {
    var lo = 0
    var hi = starts.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (starts(mid) <= offset) lo = mid else hi = mid - 1
    }
    (lo + 1, offset - starts(lo) + 1)
  }

  def lineCol(input: String, offset: Int): (Int, Int) =
    lineCol(lineStarts(input), offset)

  private val OffsetSuffix = "(.*) @(\\d+)$".r

  /** Rewrite engine errors' trailing " @offset" to " @line:col"; messages
    * without an offset pass through unchanged. */
  def annotate(errors: Seq[String], input: String): Seq[String] = {
    val starts = lineStarts(input)
    errors.map {
      case OffsetSuffix(msg, off) =>
        val (l, c) = lineCol(starts, off.toInt)
        s"$msg @$l:$c"
      case other => other
    }
  }
}
