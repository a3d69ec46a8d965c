package graft.htmlx

/** Entry API — the analogue of the reference's SimpleHtmlParser
  * (reference: HtmlParserSharp/SimpleHtmlParser.cs:60-73): whole-document
  * and fragment parses over an in-memory string. Input normalization
  * reproduces the reference driver exactly: BOM swallowed at stream start
  * (SimpleHtmlParser.cs:114-122), CRLF/CR → LF (UTF16Buffer.cs:81-87),
  * decoding fixed to UTF-8 (SimpleHtmlParser.cs:35).
  */
object HtmlParser {

  /** BOM strip + newline normalization (must happen before tokenizing). */
  def normalize(input: String): String = {
    val s = if (input.nonEmpty && input.charAt(0) == '\uFEFF') input.substring(1) else input
    if (s.indexOf('\r') < 0) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c == '\r') {
          sb.append('\n')
          if (i + 1 < n && s.charAt(i + 1) == '\n') i += 1
        } else sb.append(c)
        i += 1
      }
      sb.toString
    }
  }

  def decodeUtf8(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)

  final case class ParseResult(doc: HDocument, errors: Seq[String], detectedCharset: Option[String])

  /** Reusable engine: one tokenizer + tree-builder pair whose scratch
    * structures persist across parses (the reference's per-task reuse,
    * SURVEY.md §4.1). One instance per thread/partition; not thread-safe. */
  final class Engine {
    private val tb = new TreeBuilder
    private val tok = new Tokenizer(tb)
    tb.startTokenization(tok)

    def parse(html: String): ParseResult = {
      tb.reset()
      tok.tokenize(normalize(html))
      ParseResult(tb.doc, tb.errors.toSeq, Option(tb.detectedCharset))
    }

    def parseBytes(bytes: Array[Byte]): ParseResult = parse(decodeUtf8(bytes))
  }

  def parseDocument(html: String): ParseResult = new Engine().parse(html)

  /** Per-thread reusable engine for row-at-a-time call sites (the scalar
    * Catalyst expressions) that sit outside the pipeline's per-partition
    * engine reuse. Safe because reset() starts every parse on a fresh
    * HDocument — previously returned trees are never touched again. */
  private val threadEngine: ThreadLocal[Engine] =
    ThreadLocal.withInitial(() => new Engine)
  def parseDocumentReusing(html: String): ParseResult = threadEngine.get.parse(html)

  def parseBytes(bytes: Array[Byte]): ParseResult = parseDocument(decodeUtf8(bytes))

  final case class FragmentResult(fragment: HFragment, errors: Seq[String])

  /** Fragment parsing with a context element name
    * (reference: SimpleHtmlParser.cs:67-73, TreeBuilder.cs:5769-5825). */
  def parseFragment(html: String, context: String, contextNs: String = Ns.html): FragmentResult = {
    val tb = new TreeBuilder
    val tok = new Tokenizer(tb)
    tb.startTokenization(tok)
    tb.setFragmentContext(context, contextNs)
    tok.tokenize(normalize(html))
    FragmentResult(tb.fragmentResult, tb.errors.toSeq)
  }
}
