package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val txt =
    """# site policy
      |User-agent: megabot
      |Disallow: /private
      |Allow: /private/press
      |
      |User-agent: *
      |Disallow: /tmp/*
      |Disallow: /exact$
      |Allow: /tmp/keep
      |Disallow:
      |""".stripMargin

  test("RFC 9309 semantics: longest match, allow tie-win, wildcards, anchors, groups") {
    val star = Robots.parseRobots(txt, "otherbot/1.0")
    // reference evaluation: longest spec wins, allow wins ties
    def allowed(rules: Seq[Robots.Rule], path: String): Boolean = {
      val hit = rules.filter(r => java.util.regex.Pattern.compile(r.regex).matcher(path).find())
      if (hit.isEmpty) true
      else {
        val top = hit.map(_.spec).max
        hit.filter(_.spec == top).exists(_.allow)
      }
    }
    // the * group
    assert(star.length == 3) // empty Disallow dropped
    assert(!allowed(star, "/tmp/scratch/x")) // wildcard disallow
    assert(allowed(star, "/tmp/keep/file")) // longer allow beats /tmp/*
    assert(!allowed(star, "/exact")) // anchored
    assert(allowed(star, "/exactly")) // $ anchor does not prefix-match
    assert(allowed(star, "/elsewhere"))
    // the megabot group (longest agent token wins over *)
    val mega = Robots.parseRobots(txt, "MegaBot/2.1")
    assert(!allowed(mega, "/private/cellar"))
    assert(allowed(mega, "/private/press/2026"))
    // no matching group at all -> empty rules -> allow
    assert(Robots.parseRobots("User-agent: onlybot\nDisallow: /", "freebot").isEmpty)
  }

  test("withAllowed: broadcast dim, map-side verdict, null-robots hosts allow") {
    val robots = Seq(("a.example", txt), ("b.example", "User-agent: *\nDisallow: /")).toDF("host", "txt")
    val rules = Robots.hostRules(robots, "host", "txt", "anybot")
    val urls = Seq(
      (1L, "a.example", "/tmp/scratch"),
      (2L, "a.example", "/tmp/keep/x"),
      (3L, "a.example", "/fine"),
      (4L, "b.example", "/anything"),
      (5L, "c.example", "/no/robots/here")).toDF("id", "host", "path")
    val got = Robots.withAllowed(urls, rules, "host", "path")
      .select("id", "allowed").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, false), (2L, true), (3L, true), (4L, false), (5L, true)))
    // plan: broadcast join + no explode/extra exchange on the fact side
    val plan = Robots.withAllowed(urls, rules, "host", "path").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rules dim must broadcast:\n$plan")
    assert(!plan.contains("Generate"), s"verdict must not explode rules:\n$plan")
  }
}
