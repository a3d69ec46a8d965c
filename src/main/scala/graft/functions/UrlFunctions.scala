package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Crawl-URL canonicalization — the normalization step URL-level dedup and
  * web-graph joins key on. Deterministic, total (malformed inputs pass
  * through unchanged rather than throwing), and scoped to the http(s) URL
  * shapes a crawl actually carries (no userinfo handling beyond
  * pass-through, IPv6 hosts kept verbatim inside brackets):
  *
  *   - scheme and host lowercased
  *   - default ports stripped (http:80, https:443); explicit others kept
  *   - fragment removed
  *   - path dot-segments resolved (RFC 3986 §5.2.4): /a/./b → /a/b,
  *     /a/../b → /b, leading ../ clamped at root
  *   - percent-escapes of UNRESERVED chars decoded (%41→A, %7E→~);
  *     all other escapes kept with uppercased hex (%3f → %3F)
  *   - empty path → "/"
  *   - utm_* tracking parameters dropped; an emptied query drops its '?'
  *     (query parameter ORDER is preserved — reordering changes semantics
  *     on enough real endpoints that aggressive canonicalizers skip it)
  */
object UrlFunctions {

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved %XX, uppercase the hex of the rest. */
  private[functions] def normalizeEscapes(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path. */
  private[functions] def resolveDots(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (s == "..") { if (out.nonEmpty) out.remove(out.length - 1) }
      else if (s != ".") out += s // empty segments ("//") preserved
      i += 1
    }
    // reassemble; a trailing "." / ".." means a trailing slash
    val last = segs(segs.length - 1)
    val sb = out.mkString("/")
    val res = if ((last == "." || last == "..") && !sb.endsWith("/")) sb + "/" else sb
    if (res.startsWith("/")) res else "/" + res
  }

  private def stripUtm(query: String): String =
    query.split("&", -1).filterNot(p => p.startsWith("utm_")).mkString("&")

  def canonicalize(url: String): String = {
    val ss = url.indexOf("://")
    if (ss <= 0) return url // not an absolute hierarchical URL: pass through
    val scheme = url.substring(0, ss).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return url
    var i = ss + 3
    val n = url.length
    // authority ends at '/', '?', or '#'
    var j = i
    if (j < n && url.charAt(j) == '[') { // IPv6 literal
      while (j < n && url.charAt(j) != ']') j += 1
    }
    while (j < n && url.charAt(j) != '/' && url.charAt(j) != '?' && url.charAt(j) != '#') j += 1
    val authority = url.substring(i, j)
    // userinfo passes through verbatim (credentials are case-sensitive);
    // only the host after the last '@' is case-folded and port-split
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostport = if (at >= 0) authority.substring(at + 1) else authority
    // split port (after the last ':' that is outside any [..])
    val close = hostport.lastIndexOf(']')
    val colon = hostport.lastIndexOf(':')
    var host = hostport
    var port = ""
    if (colon > close) { host = hostport.substring(0, colon); port = hostport.substring(colon + 1) }
    host = host.toLowerCase(java.util.Locale.ROOT)
    val defaultPort = if (scheme == "http") "80" else "443"
    val portPart = if (port.isEmpty || port == defaultPort) "" else ":" + port
    // path / query / fragment
    var rest = url.substring(j)
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    val qm = rest.indexOf('?')
    var path = if (qm >= 0) rest.substring(0, qm) else rest
    var query = if (qm >= 0) rest.substring(qm + 1) else null
    path = normalizeEscapes(if (path.isEmpty) "/" else path)
    path = resolveDots(path)
    if (query != null) {
      query = stripUtm(normalizeEscapes(query))
      if (query.isEmpty) query = null
    }
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(scheme).append("://").append(userinfo).append(host).append(portPart).append(path)
    if (query != null) sb.append('?').append(query)
    sb.toString
  }

  case class UrlCanon(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "url_canon"
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(canonicalize(v.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}
  def url_canon(c: Column): Column = toCol(UrlCanon(toExpr(c)))
}
