package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Domains

class DomainsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String, String, String, Long)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("registrableDomain: longest PSL suffix match, multi-label subdomains, fallbacks") {
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.c.example.com" -> "example.com",
      "example.com" -> "example.com",
      // two-label suffix beats the one-label 'uk' match
      "news.bbc.co.uk" -> "bbc.co.uk",
      "bbc.co.uk" -> "bbc.co.uk",
      "deep.sub.shop.com.au" -> "shop.com.au",
      // unknown suffix → whole host unchanged (never merge unknowns)
      "intranet.local" -> "intranet.local",
      "localhost" -> "localhost",
      // bare two-label with known one-label suffix
      "x.io" -> "x.io")
    val out = cases.map(_._1).toDF("host")
      .select(org.apache.spark.sql.functions.col("host"),
        Domains.registrableDomain(org.apache.spark.sql.functions.col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((h, want) <- cases) assert(out(h) === want, s"host $h")
  }

  test("domainQuality groups all subdomain variants of one publisher into one row") {
    // doc_ids 0,1,2,3 all have doc_id % 3 giving suffixes .com/.co.uk/.org
    // — pick ids ≡ 0 (mod 3) so all land on 'srcA.com' under four
    // different subdomain shapes (% 4 = 0,1,2,3)
    val d = docs(
      (0L, "alpha beta", "en", "srcA", 0L),   // bare srcA.com
      (9L, "gamma delta", "en", "srcA", 0L),  // www.srcA.com (9%4=1)
      (6L, "epsilon", "en", "srcA", 0L),      // cdn.news.srcA.com (6%4=2)
      (3L, "zeta eta", "en", "srcA", 0L))     // a.b.c.srcA.com (3%4=3)
    val rows = Domains.domainQuality(d).collect()
    assert(rows.length === 1, rows.mkString(";"))
    assert(rows.head.getAs[String]("domain") === "srca.com".toUpperCase.toLowerCase
      || rows.head.getAs[String]("domain") === "srcA.com")
    assert(rows.head.getAs[Long]("n_docs") === 4L)
  }

  test("domainQuota caps per registrable domain, not per host") {
    // 8 docs, all srcB.org (ids ≡ 2 mod 3 → wait: use ids ≡ 2 (mod 3)
    // → '.org'), across subdomain variants; quota 3 keeps exactly 3
    val ids = Seq(2L, 5L, 8L, 11L, 14L, 17L, 20L, 23L)
    val d = docs(ids.map(i =>
      (i, s"some text body number $i with words", "en", "srcB", 0L)): _*)
    val out = Domains.domainQuota(d, quota = 3).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[String]("domain") === "srcB.org"))
    assert(out.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("domainDedup attributes subdomain-syndicated duplicates to ONE publisher") {
    // four copies of the same content on srcA.com under four subdomain
    // shapes (ids ≡ 0 mod 3 → .com; % 4 cycles the subdomain), plus one
    // unique doc on srcB.org — the feed label would show four clean
    // "sources"; the domain key shows one publisher at 3/4 dup rate
    val d = docs(
      (0L, "same syndicated body", "en", "srcA", 0L),
      (9L, "same  syndicated\tbody", "en", "srcA", 0L), // ws variant → same fp
      (6L, "same syndicated body", "en", "srcA", 0L),
      (3L, "same syndicated body", "en", "srcA", 0L),
      (2L, "something unique", "en", "srcB", 0L))
    val out = Domains.domainDedup(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("srcA.com") === ((4L, 3L, 750000L)))
    assert(out("srcB.org") === ((1L, 0L, 0L)))
    assert(out.size === 2)
  }

  test("asWebTable: url/host/domain are deterministic functions of (doc_id, source)") {
    val d = docs((9L, "t", "en", "pub", 0L))
    val r = Domains.asWebTable(d).collect().head
    // 9 % 4 = 1 → www., 9 % 3 = 0 → .com
    assert(r.getAs[String]("host") === "www.pub.com")
    assert(r.getAs[String]("domain") === "pub.com")
    assert(r.getAs[String]("url") === "https://www.pub.com/doc/9")
  }

  test("registrableDomainsFromPsl: the published algorithm on the canonical ck fixtures") {
    // the Mozilla wiki's own worked examples: *.ck makes every label
    // under ck a public suffix EXCEPT www.ck (the exception rule)
    // the raw published file's noise rides along: comments and blank
    // lines must be ignored, surrounding whitespace trimmed
    val psl = Seq("com", "co.uk", "*.ck", "!www.ck",
      "// ===BEGIN ICANN DOMAINS===", "", "  co.uk  ").toDF("rule")
    val cases = Seq(
      "b.example.com" -> "example.com",
      "example.com" -> "example.com",
      "news.bbc.co.uk" -> "bbc.co.uk",
      // wildcard: the * consumes one label, so a.ck IS a public suffix
      // and the registrable domain needs a third label
      "x.a.ck" -> "x.a.ck",
      "deep.x.a.ck" -> "x.a.ck",
      // exception beats the wildcard: www.ck is itself registrable
      "www.ck" -> "www.ck",
      "a.www.ck" -> "www.ck",
      // no rule matches → the implicit * rule (ps = last label)
      "example.qq" -> "example.qq",
      "sub.example.qq" -> "example.qq",
      // the host IS a public suffix → conservative fallback to itself
      "com" -> "com",
      "a.ck" -> "a.ck")
    val out = Domains.registrableDomainsFromPsl(
        cases.map(_._1).toDF("host"), psl)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((h, want) <- cases) assert(out(h) === want, s"host $h")
  }

  test("registrableDomainsFromPsl: a rule deeper than MaxPslLabels fails LOUDLY") {
    // a silently-inert deep rule would mis-merge publishers with no
    // error; 6 labels (the published list's 5 + an exception's extra)
    // resolve, 7 raise
    val six = Seq("a.b.c.d.e.com").toDF("rule") // 6-label plain rule
    val okOut = Domains.registrableDomainsFromPsl(
        Seq("x.a.b.c.d.e.com").toDF("host"), six)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(okOut("x.a.b.c.d.e.com") === "x.a.b.c.d.e.com")
    val seven = Seq("a.b.c.d.e.f.com").toDF("rule")
    val ex = intercept[Exception] {
      Domains.registrableDomainsFromPsl(
        Seq("x.com").toDF("host"), seven).collect()
    }
    assert(ex.getMessage.contains("PSL rule deeper") ||
      Option(ex.getCause).exists(_.getMessage.contains("PSL rule deeper")),
      s"unexpected error: ${ex.getMessage}")
  }

  test("registrableDomainsFromPsl: precedence is exception > most-labels > implicit *") {
    // plain s.wz AND wildcard *.s.wz both match x.b.s.wz — the wildcard
    // has more labels and must prevail (ps 3, not 2)
    val psl = Seq("s.wz", "*.s.wz", "!ok.s.wz").toDF("rule")
    val out = Domains.registrableDomainsFromPsl(
        Seq("x.b.s.wz", "y.x.b.s.wz", "z.ok.s.wz", "q.z.ok.s.wz", "b.s.wz")
          .toDF("host"), psl)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("x.b.s.wz") === "x.b.s.wz")   // wildcard ps=3 (+1 label)
    assert(out("y.x.b.s.wz") === "x.b.s.wz") // deeper host, same domain
    assert(out("z.ok.s.wz") === "ok.s.wz")   // exception ps=2 beats wildcard
    assert(out("q.z.ok.s.wz") === "ok.s.wz")
    // b.s.wz: wildcard matches (b consumed by *), host IS the public
    // suffix → fallback to itself
    assert(out("b.s.wz") === "b.s.wz")
  }

  test("domainAutoblock: the per-domain pass share decides, per doc, wholesale") {
    // publisher A (ids ≡ 0 mod 3 → one domain): 3 substantial docs →
    // margins positive → keep share 10⁶ → unblocked; publisher B
    // (ids ≡ 1 mod 3): 3 junk docs → share 0 → every doc blocked
    val good = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val d = docs(
      (3L, good, "en", "a", 0L), (6L, good + " one", "en", "a", 0L),
      (9L, good + " two", "en", "a", 0L),
      (1L, "zz", "en", "b", 0L), (4L, "zz", "en", "b", 0L),
      (7L, "zz", "en", "b", 0L))
    val out = Domains.domainAutoblock(d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("domain_keep_millionths"), r.getAs[Boolean]("blocked")))
      .toMap
    assert(out.size === 6)
    // the verdict is PER DOMAIN: every doc of a publisher shares it
    for (id <- Seq(3L, 6L, 9L)) assert(out(id) === ((1000000L, false)), s"doc $id")
    for (id <- Seq(1L, 4L, 7L)) assert(out(id) === ((0L, true)), s"doc $id")
  }

  test("registrableDomainsFromPsl with the embedded subset as plain rules ≡ registrableDomain") {
    // the documented swap path: feed the literal subset to the
    // full-algorithm operator and the two extractors agree on every
    // host a rule matches; the ONLY divergence is deep unknown-suffix
    // hosts, where the literal falls back to the whole host and the
    // real algorithm applies the implicit * rule — pinned explicitly
    val rules = (Domains.PslTwoLabel ++ Domains.PslOneLabel).toDF("rule")
    val matched = Seq("www.example.com", "a.b.c.example.com", "example.com",
      "news.bbc.co.uk", "bbc.co.uk", "deep.sub.shop.com.au", "x.io",
      "intranet.local", "localhost")
    val ext = Domains.registrableDomainsFromPsl(matched.toDF("host"), rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val lit = matched.toDF("host")
      .select(org.apache.spark.sql.functions.col("host"),
        Domains.registrableDomain(org.apache.spark.sql.functions.col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (h <- matched) assert(ext(h) === lit(h), s"host $h")
    // the divergence: 4 unknown labels — literal keeps the whole host
    // (never merges unknowns), the PSL algorithm's implicit * merges
    // onto the last two labels
    val deep = Domains.registrableDomainsFromPsl(
        Seq("a.b.intranet.local").toDF("host"), rules)
      .collect().head.getString(1)
    assert(deep === "intranet.local")
  }

  test("blockGate: stream flags ≡ batch flags ≡ domainAutoblock on the artifact's corpus") {
    import org.apache.spark.sql.functions.col
    val good = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val d = docs(
      (3L, good, "en", "a", 0L), (6L, good + " one", "en", "a", 0L),
      (1L, "zz", "en", "b", 0L), (4L, "zz", "en", "b", 0L))
    val verdict = Domains.domainBlockVerdict(d).localCheckpoint()
    // batch face agrees with the self-audited operator per doc
    val fromGate = Domains.blockGate(d.select("doc_id", "source"), verdict)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("blocked"))
      .toMap
    val fromAuto = Domains.domainAutoblock(d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("blocked"))
      .toMap
    assert(fromGate === fromAuto)
    // a publisher ABSENT from the artifact is not blocked (no evidence)
    val alien = Seq((999L, "unknown-feed")).toDF("doc_id", "source")
    assert(Domains.blockGate(alien, verdict)
      .filter(col("blocked")).count() === 0L)
    // stream face: same rows through an unbounded source, same flags —
    // stateless, so no watermark and batch ≡ stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rows = d.select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[(Long, String)]
    src.addData(rows: _*)
    val name = s"block_gate_out_${System.nanoTime()}"
    val q = Domains.blockGate(src.toDF().toDF("doc_id", "source"), verdict)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("blocked"))
      .toMap
    assert(streamed === fromGate, "stream verdicts diverged from batch")
  }

  test("domainQuotaExt and domainDedupExt key on the PSL-extracted domain") {
    // four hosts of one publisher across wildcard depths (%10 = 3/5)
    // → ONE wildcard domain; quota 2 must keep 2 of the 4
    val d = docs(
      (3L, "alpha beta gamma delta", "en", "s", 0L),
      (13L, "epsilon zeta eta theta", "en", "s", 0L),
      (15L, "iota kappa lambda", "en", "s", 0L),
      (25L, "mu nu xi", "en", "s", 0L))
    val q = Domains.domainQuotaExt(d, quota = 2).collect()
    assert(q.length === 2)
    assert(q.forall(_.getAs[String]("domain") === "x.b.s.wz"))
    // dedup attribution: plant an exact pair across two wildcard hosts
    val dd = docs(
      (3L, "same text here", "en", "s", 0L),
      (15L, "same text here", "en", "s", 0L),  // %10=5 → deeper host, same domain
      (5L, "other text", "en", "s", 0L))       // %10=5 → same domain too
    val row = Domains.domainDedupExt(dd)
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"))).toMap
    assert(row("x.b.s.wz") === ((3L, 1L)))
  }

  test("domainQualityExt groups wildcard and exception hosts onto one publisher row") {
    // doc ids picked so one source's hosts hit depths 3..6 of hostPslSql:
    // %10=3 and %10=5 must merge (wildcard), %10=4 and %10=6 must merge
    // (exception) — four docs, TWO domains
    val d = docs(
      (3L, "alpha beta", "en", "s", 0L),
      (15L, "gamma delta", "en", "s", 0L),
      (4L, "epsilon", "en", "s", 0L),
      (16L, "zeta eta", "en", "s", 0L))
    val out = Domains.domainQualityExt(d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("x.b.s.wz" -> 2L, "ok.s.wz" -> 2L))
  }

  test("domainQuotaThreshold ≡ domainQuota when no tie straddles; ties all kept") {
    import org.apache.spark.sql.functions.col
    // 8 docs in ONE publisher bucket (same source, doc_id % 12 = 0 keeps
    // host class and domain constant is not needed — distinct scores via
    // distinct token counts), quota 5: rank and threshold must agree
    val words = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    val distinctScored = docs(
      (0 until 8).map(i => ((i * 12).toLong, words(10 + 10 * i), "en", "srcA", 0L)): _*)
    val win = Domains.domainQuota(distinctScored).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id"))).toSet
    val thr = Domains.domainQuotaThreshold(distinctScored).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id"))).toSet
    assert(thr === win, "no straddling tie → row-identical (minus rnk)")

    // tie straddling the boundary: 3 top docs + 4 IDENTICAL mid docs at
    // quota 5 → windowed keeps 2 of the tied cell, threshold keeps ALL 4
    val tied = docs(
      ((0 until 3).map(i => ((i * 12).toLong, words(60 + 10 * i), "en", "srcB", 0L)) ++
        (3 until 7).map(i => ((i * 12).toLong, words(20), "en", "srcB", 0L))): _*)
    val winT = Domains.domainQuota(tied).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    val thrT = Domains.domainQuotaThreshold(tied).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(winT.size === 5)
    assert(thrT.size === 7, "every doc AT the threshold score is kept")
    assert(winT.subsetOf(thrT), "threshold face admits a superset on ties")

    // under-quota publisher keeps everything in both spellings
    val tiny = docs((0L, words(5), "en", "srcC", 0L), (12L, words(9), "en", "srcC", 0L))
    assert(Domains.domainQuotaThreshold(tiny).count() === 2L)
  }
}
