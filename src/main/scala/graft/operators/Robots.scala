package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL filtering (RFC 9309) — the crawl-pipeline
  * gate deciding which fetched URLs may be kept/refetched.
  *
  * Parser: line-oriented, '#' comments, case-insensitive directives,
  * multiple `User-agent` lines sharing one group, groups for the same
  * agent merged. Group selection: all groups whose user-agent token
  * matches the product token case-insensitively, else the `*` groups;
  * a specific-agent match suppresses the `*` groups entirely (RFC 9309
  * §2.2.1).
  *
  * Matching: `Allow`/`Disallow` patterns with `*` wildcards and `$` end
  * anchor; the rule with the LONGEST pattern (in characters) wins; on a
  * length tie Allow wins; no matching rule ⇒ allowed. An empty pattern
  * (`Disallow:`) matches nothing.
  *
  * Scale shape ([[filterAllowed]]): pages and robots are co-partitioned
  * by host; within a partition rows arrive host-clustered, so each
  * host's robots.txt is compiled ONCE and reused — the shuffle carries
  * (host, url, robots_txt-per-host) and never recompiles per row.
  */
object Robots {

  final case class Rule(pattern: String, allow: Boolean)
  final case class Rules(rules: Vector[Rule]) {
    def allowed(path: String): Boolean = {
      var bestLen = -1
      var bestAllow = true
      var i = 0
      while (i < rules.length) {
        val r = rules(i)
        if (r.pattern.nonEmpty && patternMatches(r.pattern, path)) {
          val len = r.pattern.length
          if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
            bestLen = len
            bestAllow = r.allow
          }
        }
        i += 1
      }
      bestAllow
    }
  }
  val allowAll: Rules = Rules(Vector.empty)

  /** Does an RFC 9309 pattern ('*' wildcard, '$' end anchor) match the
    * path? A non-anchored pattern is a PREFIX match, which is exactly a
    * full wildcard match of pattern+"*"; '$' is only special at the end
    * (literal elsewhere). */
  private[operators] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val base = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val pat = if (anchored) base else base + "*"
    // classic iterative two-pointer wildcard full-match with backtracking
    var pi = 0
    var si = 0
    var star = -1
    var mark = 0
    val pn = pat.length
    val sn = path.length
    while (si < sn) {
      if (pi < pn && pat.charAt(pi) != '*' && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (pi < pn && pat.charAt(pi) == '*') {
        star = pi; pi += 1; mark = si
      } else if (star >= 0) {
        pi = star + 1; mark += 1; si = mark
      } else return false
    }
    while (pi < pn && pat.charAt(pi) == '*') pi += 1
    pi == pn
  }

  /** Parse robots.txt for the given product token (e.g. "graftbot"). */
  def parse(txt: String, agent: String): Rules = {
    val agentLc = agent.toLowerCase
    var specific = Vector.empty[Rule]
    var wildcard = Vector.empty[Rule]
    var sawSpecific = false
    var groupAgents: List[String] = Nil
    var inRules = false // false: collecting user-agent lines for a group
    var current = Vector.empty[Rule]

    def flush(): Unit = {
      if (groupAgents.nonEmpty) {
        val matchesSpecific = groupAgents.exists(a => a == agentLc || agentLc.startsWith(a))
        val matchesAll = groupAgents.contains("*")
        if (matchesSpecific) { specific ++= current; sawSpecific = true }
        else if (matchesAll) wildcard ++= current
      }
      groupAgents = Nil
      current = Vector.empty
    }

    for (raw <- txt.linesIterator) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              if (inRules) { flush(); inRules = false }
              groupAgents ::= value.toLowerCase
            case "allow" =>
              inRules = true
              current :+= Rule(value, allow = true)
            case "disallow" =>
              inRules = true
              current :+= Rule(value, allow = false)
            case _ => inRules = true // sitemap, crawl-delay, unknown: ignore
          }
        }
      }
    }
    flush()
    if (sawSpecific) Rules(specific) else Rules(wildcard)
  }

  /** Path+query of a URL as robots matching input ("/", if none). */
  private[operators] def pathOf(url: String): String = {
    val ss = url.indexOf("://")
    val start = if (ss >= 0) {
      val i = url.indexOf('/', ss + 3)
      if (i < 0) return "/"
      i
    } else 0
    val hash = url.indexOf('#', start)
    val end = if (hash >= 0) hash else url.length
    url.substring(start, end)
  }

  /** Filter `pages(url, ...)` to the rows `robots(host, robots_txt)`
    * allows for `agent`. Both sides are repartitioned AND sorted by host,
    * so each partition sees host-contiguous rows and compiles each
    * robots.txt exactly once. */
  def filterAllowed(pages: DataFrame, robots: DataFrame, agent: String,
                    urlCol: String = "url", partitions: Int = 0): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val withHost = pages.withColumn("__host",
      lower(regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)))
    val joined = withHost
      .join(robots.select(lower(col("host")).as("__host"), col("robots_txt")),
        Seq("__host"), "left")
      .repartition(n, col("__host"))
      .sortWithinPartitions("__host")
    val urlIdx = joined.columns.indexOf(urlCol)
    val hostIdx = joined.columns.indexOf("__host")
    val txtIdx = joined.columns.indexOf("robots_txt")
    val enc = org.apache.spark.sql.Encoders.row(joined.schema)
    joined.mapPartitions { it =>
      var lastHost: String = null
      var lastRules: Rules = allowAll
      it.filter { row =>
        val host = row.getString(hostIdx)
        if (host != lastHost) {
          lastHost = host
          val txt = if (row.isNullAt(txtIdx)) null else row.getString(txtIdx)
          lastRules = if (txt == null) allowAll else parse(txt, agent)
        }
        lastRules.allowed(pathOf(row.getString(urlIdx)))
      }
    }(enc).drop("__host", "robots_txt")
  }
}
