package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309) for crawl-corpus curation — the
  * compliance filter every WARC-derived training pipeline needs
  * between link extraction and fetch/keep decisions.
  *
  * Scale shape: robots files are a per-HOST dimension (tiny — one
  * small text per host), so parsing happens dim-side in plain Scala
  * ([[parseRobots]], a typed map over the robots table), and the URL
  * fact side takes a BROADCAST join plus a MAP-SIDE verdict: the
  * matched-rule argmax runs inside `aggregate`/`filter` higher-order
  * functions over the host's rule array — no explode, no shuffle
  * beyond the broadcast, whole-stage-codegen friendly. A 100 TB URL
  * relation filters in one pass.
  *
  * Semantics per RFC 9309: group selection prefers the longest
  * user-agent token that case-insensitively prefixes the product
  * token, falling back to `*`; rule matching is LONGEST-MATCH-WINS
  * over octet length of the rule path, Allow beating Disallow on
  * ties; `*` matches any octet sequence and `$` anchors the end; no
  * matching rule (or no robots.txt for the host) means allowed; an
  * empty Disallow value matches nothing. */
object Robots {

  /** One matchable rule: `allow`, RFC specificity (octet length of the
    * raw path pattern), and the anchored regex it compiles to. */
  case class Rule(allow: Boolean, spec: Int, regex: String)

  case class HostRules(host: String, rules: Seq[Rule])

  /** Compile one robots path pattern to an anchored regex: literals
    * quoted, `*` → `.*`, trailing `$` → end anchor (a `$` anywhere
    * else is literal, per the RFC's ABNF). */
  private[operators] def pathRegex(pattern: String): String = {
    val endAnchored = pattern.endsWith("$")
    val body = if (endAnchored) pattern.dropRight(1) else pattern
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    if (endAnchored) sb.append("$")
    sb.toString
  }

  /** Parse a robots.txt body into the rule list for `userAgent`:
    * pick the most specific matching user-agent group (longest token
    * prefixing the agent, else `*`), keep its Allow/Disallow lines.
    * Unknown directives are ignored; comments stripped; blank lines
    * only end a group once rules have been seen (RFC group ABNF). */
  def parseRobots(robotsTxt: String, userAgent: String): Seq[Rule] = {
    val agent = userAgent.toLowerCase(java.util.Locale.ROOT)
    // collect (matchedAgentTokenLength, rules) per group, take best
    var best: (Int, List[Rule]) = (-1, Nil)
    var groupAgents = List.empty[String]
    var groupRules = List.empty[Rule]
    var inRules = false
    def closeGroup(): Unit = {
      if (groupAgents.nonEmpty) {
        val m = groupAgents.flatMap { a =>
          if (a == "*") Some(0)
          else if (agent.startsWith(a)) Some(a.length)
          else None
        }
        if (m.nonEmpty && m.max > best._1) best = (m.max, groupRules.reverse)
        // equal specificity: first group wins (keep existing)
      }
      groupAgents = Nil; groupRules = Nil; inRules = false
    }
    robotsTxt.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (inRules) closeGroup()
              groupAgents ::= value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              inRules = true
              if (value.nonEmpty) // empty Disallow matches nothing
                groupRules ::= Rule(key == "allow", value.length, pathRegex(value))
            case _ => if (groupAgents.nonEmpty) inRules = true // crawl-delay etc.
          }
        }
      }
    }
    closeGroup()
    best._2
  }

  /** Dim-side parse: (host, robotsTxt) → [[HostRules]]. Tiny relation,
    * typed map. */
  def hostRules(robots: DataFrame, hostCol: String, txtCol: String,
      userAgent: String): Dataset[HostRules] = {
    import robots.sparkSession.implicits._
    robots.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .map { case (h, t) => HostRules(h, parseRobots(Option(t).getOrElse(""), userAgent)) }
  }

  /** The verdict column: longest-match-wins over the rule array, Allow
    * beats Disallow on equal specificity, no match (or null rules —
    * host without robots.txt) allows. Pure higher-order functions —
    * map-side, codegen'd. */
  def allowedCol(rulesCol: Column, pathCol: Column): Column = {
    val matched = filter(rulesCol, r => regexp_like(pathCol, r.getField("regex")))
    val best = aggregate(matched,
      struct(lit(-1).as("spec"), lit(true).as("allow")),
      (acc, r) => when(
        r.getField("spec") > acc.getField("spec") ||
          (r.getField("spec") === acc.getField("spec") && r.getField("allow")),
        struct(r.getField("spec").as("spec"), r.getField("allow").as("allow")))
        .otherwise(acc))
    coalesce(best.getField("allow"), lit(true))
  }

  /** URL-relation filter: broadcast the per-host rules, verdict
    * map-side. Adds an `allowed` boolean; callers filter or audit. */
  def withAllowed(urls: DataFrame, rules: Dataset[HostRules],
      hostCol: String, pathCol: String): DataFrame =
    urls.join(broadcast(rules.toDF().withColumnRenamed("host", "__rb_host")),
        col(hostCol) === col("__rb_host"), "left")
      .withColumn("allowed", allowedCol(col("rules"), col(pathCol)))
      .drop("__rb_host", "rules")

  /** Politeness scheduling: turn a per-host frontier into a fetch
    * timetable. Each host is an independent rate-limited queue
    * (crawl-delay politeness), so the schedule is pure window
    * arithmetic: slot = rank within host (deterministic URL order),
    * fetch_at = slot x delay, and the horizon cut yields "this
    * window's fetch plan". ONE exchange (the host window); hosts are
    * the parallel unit at 100 TB - a 1000-executor cluster schedules
    * a billion-URL frontier with no cross-host coordination. */
  def schedule(frontier: DataFrame, hostCol: String, urlCol: String,
      delayMsCol: String, horizonMs: Long): DataFrame = {
    val byHost = org.apache.spark.sql.expressions.Window
      .partitionBy(hostCol).orderBy(urlCol)
    frontier
      .withColumn("slot", row_number().over(byHost) - 1)
      .withColumn("fetch_at_ms", col("slot") * col(delayMsCol))
      .withColumn("within_horizon", col("fetch_at_ms") < horizonMs)
  }
}
