package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RobotsCheckExpr]] against the RFC 9309 worked semantics:
  * longest-match rule selection with the allow tiebreak, `*`/`$`
  * patterns, agent-group selection (longest specific token, `*`
  * fallback, stacked user-agent lines, duplicate-group merge), the
  * crawl-delay extension, and the allow-by-default edges. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def check(robots: String, agent: String, path: String)
      : (Boolean, String, Int) = {
    val r = Seq((robots, agent, path)).toDF("r", "a", "p")
      .select(Multimodal.robotsCheck(col("r"), col("a"), col("p")).as("c"))
      .select("c.allowed", "c.matched_rule", "c.crawl_delay").head()
    (r.getBoolean(0), r.getString(1), r.getInt(2))
  }

  test("longest-match wins; length ties go to allow (RFC 9309 §2.2.2)") {
    val robots =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/public/
        |Disallow: /fish
        |Allow: /fish$
        |""".stripMargin
    assert(!check(robots, "bot", "/private/x")._1)
    assert(check(robots, "bot", "/private/public/y")._1) // longer allow
    assert(!check(robots, "bot", "/fishing")._1) // /fish prefix
    assert(check(robots, "bot", "/fish")._1) // tie-ish: $ rule longer
    assert(check(robots, "bot", "/open")._1) // no rule matches
  }

  test("wildcard patterns: * spans octets, $ anchors the end") {
    val robots =
      """User-agent: *
        |Disallow: /*.php$
        |Disallow: /tmp*
        |Allow: /tmp/keep/*.html$
        |""".stripMargin
    assert(!check(robots, "bot", "/index.php")._1)
    assert(check(robots, "bot", "/index.php5")._1) // $ anchored
    assert(!check(robots, "bot", "/tmpfiles/x")._1)
    assert(check(robots, "bot", "/tmp/keep/a.html")._1) // longest allow
    assert(!check(robots, "bot", "/tmp/keep/a.htmlx")._1) // anchor fails
  }

  test("agent groups: exact product-token match, * fallback, stacking, merge") {
    val robots =
      """User-agent: crawler
        |Disallow: /a
        |User-agent: crawler-news
        |User-agent: crawler-images
        |Disallow: /b
        |User-agent: *
        |Disallow: /c
        |User-agent: crawler
        |Disallow: /d
        |""".stripMargin
    // longest specific token: crawler-news group (stacked agents)
    assert(!check(robots, "crawler-news/2.0", "/b")._1)
    assert(check(robots, "crawler-news/2.0", "/a")._1)
    // plain crawler: BOTH crawler groups merge (/a and /d)
    assert(!check(robots, "crawler/1.0", "/a")._1)
    assert(!check(robots, "crawler/1.0", "/d")._1)
    assert(check(robots, "crawler/1.0", "/c")._1)
    // unknown agent falls to *
    assert(!check(robots, "otherbot", "/c")._1)
    assert(check(robots, "otherbot", "/a")._1)
    // RFC 9309: the match is the product TOKEN, never a prefix — a
    // 'crawler' group must not govern 'crawlerx'
    assert(!check(robots, "crawlerx/1.0", "/c")._1) // falls to *
    assert(check(robots, "crawlerx/1.0", "/a")._1)
  }

  test("crawl-delay reported from the selected group; -1 when absent") {
    val robots =
      """User-agent: slowbot
        |Crawl-delay: 7
        |Disallow: /x
        |User-agent: *
        |Disallow:
        |""".stripMargin
    assert(check(robots, "slowbot", "/ok")._3 == 7)
    assert(check(robots, "fastbot", "/ok")._3 == -1)
  }

  test("crawl-delay: first declaring group in DOCUMENT order wins on merge") {
    val robots =
      """User-agent: bot
        |Crawl-delay: 3
        |Disallow: /a
        |User-agent: bot
        |Crawl-delay: 9
        |Disallow: /b
        |""".stripMargin
    val r = check(robots, "bot", "/a")
    assert(r._3 == 3) // not the document-LAST group's 9
    assert(!r._1 && !check(robots, "bot", "/b")._1) // rules still merge
    // a delay-less first group defers to the first group that has one
    val robots2 =
      """User-agent: bot
        |Disallow: /a
        |User-agent: bot
        |Crawl-delay: 5
        |Disallow: /b
        |""".stripMargin
    assert(check(robots2, "bot", "/x")._3 == 5)
  }

  test("allow-by-default edges: empty file, comments, empty Disallow, garbage") {
    assert(check("", "bot", "/anything")._1)
    assert(check("# comments only\n", "bot", "/x")._1)
    // an empty Disallow value allows everything
    assert(check("User-agent: *\nDisallow:\n", "bot", "/x")._1)
    assert(check("<html>soft 404 page</html>", "bot", "/x")._1)
    // a matched empty-pattern must never be reported
    assert(check("User-agent: *\nDisallow:\n", "bot", "/x")._2 == null)
  }

  test("robots_sitemaps: Sitemap directives in document order, file-scoped") {
    def sitemaps(robots: String): Seq[String] =
      Seq(Tuple1(robots)).toDF("r")
        .select(Multimodal.robotsSitemaps(col("r")).as("s"))
        .head().getSeq[String](0)
    val robots = """User-agent: a
      |Disallow: /x
      |Sitemap: https://ex.com/sm1.xml
      |User-agent: b
      |sitemap: https://ex.com/sm2.xml # trailing comment
      |SITEMAP: https://ex.com/sm1.xml
      |Sitemap:
      |""".stripMargin
    // directives are file-scoped (collected across groups), order kept,
    // case-insensitive key, duplicates and empty values dropped
    assert(sitemaps(robots) ==
      Seq("https://ex.com/sm1.xml", "https://ex.com/sm2.xml"))
    assert(sitemaps("User-agent: *\nDisallow: /") == Seq.empty)
    assert(sitemaps("") == Seq.empty)
    // a Sitemap line between user-agent lines still ENDS the agent
    // run for group parsing (robots_check semantics unchanged)
    val split = "User-agent: a\nSitemap: https://s\nUser-agent: b\n" +
      "Disallow: /p"
    assert(check(split, "b", "/p")._1 == false)
    assert(check(split, "a", "/p")._1 == true)
  }
}
