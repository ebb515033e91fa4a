package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")

  val base: String = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
    "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray yankee zulu one two three four five six " +
    "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen")
  val nearDup: String = base.replace("oscar", "OSCARX")
  val unrelated: String = "red green blue cyan magenta yellow black white " +
    "purple orange pink brown gray silver gold bronze copper iron lead zinc"
  // degenerate repetition → low distinct ratio + short → low quality score
  val lowQuality: String = "spam spam spam spam spam"

  test("corpusKeep: flags exact dups, near dups, and low quality; keeps the rest") {
    val out = Curation.corpusKeep(docs(
      (1L, base), (2L, base), (3L, nearDup), (4L, unrelated), (5L, lowQuality)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("is_exact_dup"), r.getAs[Boolean]("is_near_dup"),
          r.getAs[Boolean]("quality_ok"), r.getAs[Boolean]("keep")))).toMap
    // 1 is the keeper of the {1,2} exact family and the {1,2,3} component
    assert(out(1L)._1 === false && out(1L)._2 === false)
    assert(out(1L)._4 === true)
    // 2 = exact dup of 1 (also a near-dup component member) → dropped
    assert(out(2L) === ((true, true, true, false)))
    // 3 = near dup only → dropped, but not an exact dup
    assert(out(3L) === ((false, true, true, false)))
    // 4 = unique and decent quality → kept
    assert(out(4L) === ((false, false, true, true)))
    // 5 = unique but low quality → dropped
    assert(out(5L)._1 === false && out(5L)._2 === false)
    assert(out(5L)._3 === false && out(5L)._4 === false)
  }

  test("splitAssign: deterministic, stable under corpus growth, near-nominal proportions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (0L until 2000L).toDF("doc_id")
    def asg(df: org.apache.spark.sql.DataFrame) =
      graft.text.Curation.splitAssign(df).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val full = asg(ids)
    // determinism + growth stability: the first 500 docs' assignments are
    // unchanged when the other 1500 exist — the anti-leakage property a
    // count-proportional split does not have
    val prefix = asg(ids.filter(col("doc_id") < 500L))
    assert(prefix === full.filter { case (id, _) => id < 500L })
    // statistical proportions: 5%/5%/90% nominal, generous tolerance
    val n = full.size.toDouble
    val frac = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("test") - 0.05) < 0.03, s"test frac ${frac("test")}")
    assert(math.abs(frac("val") - 0.05) < 0.03, s"val frac ${frac("val")}")
    assert(frac("train") > 0.85)
  }

  test("pipelineManifest = the manual keep → split → pack composition") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(3)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(500)).mkString(" ")
    val texts = (0L until 40L).map(i => i -> words(30 + rnd.nextInt(30)))
    // doc 100 exactly duplicates doc 0 → dropped by the keep verdict
    val d = (texts ++ Seq(100L -> texts.head._2))
      .map { case (i, t) => (i, t, "en") }
      .toDF("doc_id", "text", "lang")
    val kept = graft.text.Curation.corpusKeep(d)
      .filter(col("keep")).select("doc_id")
    val keptDocs = d.join(kept, "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("tok_count"),
        r.getAs[Long]("seq_id"), r.getAs[String]("split"))).toSet
    val expected = rows(graft.text.Curation.packSequences(keptDocs)
      .join(graft.text.Curation.splitAssign(keptDocs).select("doc_id", "split"), "doc_id")
      .select("doc_id", "shard", "tok_count", "seq_id", "split"))
    val got = rows(graft.text.Curation.pipelineManifest(d))
    assert(got === expected)
    assert(got.nonEmpty)
    assert(!got.exists(_._1 == 100L), "dropped docs must not reach the manifest")
  }

  test("packSequences: contiguous bins fill to the token budget in doc_id order") {
    import spark.implicits._
    // 10 docs of exactly 10 tokens each, one shard, budget 25: running
    // sums 0,10,...,90 → seq ids 0,0,0,1,1,2,2,2,3,3 (a doc straddling a
    // boundary stays in the bin its first token lands in)
    val docs = (0L until 10L)
      .map(i => (i, "a b c d e f g h i j", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.text.Curation.packSequences(docs, budget = 25L, nShards = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("tok_count"), r.getAs[Long]("seq_id")))
      .toMap
    assert(out.values.forall { case (shard, tok, _) => shard == 0L && tok == 10L })
    val seqByDoc = (0L until 10L).map(i => out(i)._3)
    assert(seqByDoc === Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L))
  }

  test("pipelineManifestChunked = the manual keep → split → chunk composition") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(500)).mkString(" ")
    // doc 5 is overlong relative to the 64-token budget → must chunk
    val texts = (0L until 30L).map(i =>
      i -> words(if (i == 5L) 300 else 30 + rnd.nextInt(30)))
    val d = (texts ++ Seq(100L -> texts.head._2))
      .map { case (i, t) => (i, t, "en") }
      .toDF("doc_id", "text", "lang")
    val kept = graft.text.Curation.corpusKeep(d)
      .filter(col("keep")).select("doc_id")
    val keptDocs = d.join(kept, "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_tok"), r.getAs[Long]("seq_id"), r.getAs[String]("split")))
      .toSet
    val expected = rows(graft.text.Curation.packSequencesChunked(keptDocs, budget = 64L)
      .join(graft.text.Curation.splitAssign(keptDocs).select("doc_id", "split"), "doc_id")
      .select("doc_id", "shard", "chunk_id", "chunk_tok", "seq_id", "split"))
    val got = rows(graft.text.Curation.pipelineManifestChunked(d, budget = 64L))
    assert(got === expected)
    assert(got.count(_._1 == 5L) > 1L, "the overlong doc must appear as chunks")
    assert(!got.exists(_._1 == 100L), "dropped docs must not reach the manifest")
  }

  test("packSequencesChunked golden: a straddling doc splits at the exact boundary") {
    import spark.implicits._
    // one shard, budget 25, docs of 10 tokens: doc 2 occupies [20,30) and
    // must split into 5 tokens in bin 0 + 5 in bin 1; doc 7 at [70,80)
    // splits 5/5 across bins 2|3; all other docs stay whole
    val docs = (0L until 10L)
      .map(i => (i, "a b c d e f g h i j", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.text.Curation.packSequencesChunked(docs, budget = 25L, nShards = 1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[Long]("shard"), r.getAs[Long]("chunk_tok"), r.getAs[Long]("seq_id")))
      .toMap
    assert(out.values.forall(_._1 == 0L))
    assert(out((2L, 0L)) === ((0L, 5L, 0L)) && out((2L, 1L)) === ((0L, 5L, 1L)))
    assert(out((7L, 0L)) === ((0L, 5L, 2L)) && out((7L, 1L)) === ((0L, 5L, 3L)))
    assert(out((0L, 0L)) === ((0L, 10L, 0L)) && out((9L, 0L)) === ((0L, 10L, 3L)))
    assert(out.size === 12) // 10 docs + 2 extra boundary chunks
    // every bin except the shard's last holds exactly the budget
    val bins = out.values.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(bins === Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))
  }

  test("packSequencesChunked properties: bins never overflow, chunks tile each doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // adversarial mix: overlong docs (tok >> budget), exact-budget docs,
    // tiny docs, an empty doc — across several shards
    val rnd = new scala.util.Random(11)
    val texts = (0L until 60L).map { i =>
      val n = rnd.nextInt(4) match {
        case 0 => 5 + rnd.nextInt(20)        // small
        case 1 => 64                          // exactly one budget
        case 2 => 150 + rnd.nextInt(200)      // overlong (2-5 bins)
        case 3 => 0                           // empty
      }
      (i, Seq.fill(n)("t" + rnd.nextInt(900)).mkString(" "), "en")
    }
    val d = texts.toDF("doc_id", "text", "lang")
    val budget = 64L
    val rows = graft.text.Curation.packSequencesChunked(d, budget = budget, nShards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_tok"), r.getAs[Long]("seq_id")))
    // (1) no bin's token sum exceeds the budget, and every non-final bin
    //     of each shard is filled to exactly the budget
    val byBin = rows.groupBy(r => (r._2, r._5)).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = rows.groupBy(_._2).view.mapValues(_.map(_._5).max).toMap
    for (((shard, seq), tot) <- byBin) {
      assert(tot <= budget, s"bin ($shard,$seq) overflows: $tot > $budget")
      if (seq < lastBin(shard))
        assert(tot === budget, s"non-final bin ($shard,$seq) underfilled: $tot")
    }
    // (2) chunks tile the doc: per-doc chunk_tok sums to tok_count, and
    //     chunk count is bounded by ceil(tok/budget)+1
    val tokCounts = texts.map { case (i, t, _) =>
      i -> (if (t.isEmpty) 0L else t.split(" ").length.toLong) }.toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet === tokCounts.keySet) // empty doc keeps one chunk
    for ((id, chunks) <- byDoc) {
      assert(chunks.map(_._4).sum === tokCounts(id), s"doc $id chunks don't tile")
      val bound = (tokCounts(id) + budget - 1) / budget + 1
      assert(chunks.length <= math.max(bound, 1L), s"doc $id has ${chunks.length} chunks")
      // chunk_ids are contiguous from 0 over consecutive seq_ids
      val sorted = chunks.sortBy(_._3)
      assert(sorted.map(_._3).toList === (0L until sorted.length).toList)
      assert(sorted.map(_._5).distinct.length === sorted.length)
    }
    // (3) the first chunk of every doc lands in packSequences' bin (the
    //     two operators agree on where a doc STARTS)
    val whole = graft.text.Curation.packSequences(d, budget = budget, nShards = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("seq_id")).toMap
    for ((id, chunks) <- byDoc)
      assert(chunks.minBy(_._3)._5 === whole(id), s"doc $id first-bin mismatch")
  }

  test("the manifest's partitionBy(split) write really partition-prunes a split read") {
    // The claim in pipelineManifest's docs, proven on the ACTUAL manifest
    // (round-5 verdict #3: SinksSpec proved pruning generically, but no
    // test wrote this operator's output partitioned): write the manifest
    // partitionBy("split"), re-read one split, and the split filter must
    // become a PartitionFilter with fewer files scanned — plus row
    // identity against the unpartitioned DataFrame's own filter.
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val manifest = graft.text.Curation.pipelineManifest(docs).localCheckpoint()
    val path = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    graft.sources.Sinks.writePartitioned(manifest, path, Seq("split"))
    val read = spark.read.parquet(path).filter(col("split") === "train")
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*split[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"split filter not applied as a partition filter:\n$plan")
    // collect() executes THIS Dataset's own QueryExecution (a select()
    // would build a new one whose scan metrics we could not read after)
    def rows(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("tok_count"),
        r.getAs[Long]("seq_id"), r.getAs[String]("split"))).toSet
    val expected = rows(manifest.filter(col("split") === "train").collect())
    assert(rows(read.collect()) === expected)
    assert(expected.nonEmpty, "fixture must actually have train rows")
    // pruning is real: the pruned scan reads strictly fewer files
    val allFiles = spark.read.parquet(path).inputFiles.length
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pruned = scan.metrics("numFiles").value
    assert(pruned > 0 && pruned < allFiles, s"no files pruned ($pruned of $allFiles)")
  }

  test("trainingShards: written id slices tile each doc's encoding; bins fill exactly; re-read prunes") {
    import org.apache.spark.sql.functions.col
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val reread = Curation.trainingShards(d, path)
    val rows = reread.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("shard"), r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_tok"),
      r.getAs[Long]("seq_id"), r.getAs[String]("split"), r.getAs[scala.collection.Seq[Long]]("ids").toList))
    assert(rows.nonEmpty)
    // (1) every chunk's slice is exactly as long as the bin says
    for ((id, _, cid, ct, _, _, ids) <- rows)
      assert(ids.size.toLong === ct, s"doc $id chunk $cid slice length")
    // (2) concatenated ids per doc (chunk_id order) == the doc's encoding
    // under the merges learned on the KEPT corpus (the population the
    // operator actually trains the tokenizer on)
    val keptIds = rows.map(_._1).toSet
    val keptToks = d.filter(col("doc_id").isin(keptIds.toSeq: _*))
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("toks"))
    val expected = graft.text.TextAnalysis.bpeDocIdsFromToks(keptToks)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("ids").toList).toMap
    val assembled = rows.groupBy(_._1).view.mapValues(
      _.sortBy(_._3).flatMap(_._7).toList).toMap
    assert(assembled.keySet === expected.keySet, "one or more kept docs missing")
    for ((id, ids) <- assembled)
      assert(ids === expected(id), s"doc $id: written slices do not tile its encoding")
    // (3) every non-final bin of every shard holds exactly the budget
    val binFill = rows.groupBy(r => (r._2, r._5)).view.mapValues(_.map(_._4).sum)
    val lastBin = binFill.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    for (((shard, seq), fill) <- binFill if seq != lastBin(shard))
      assert(fill === 2048L, s"shard $shard bin $seq holds $fill tokens")
    // (4) a (split, shard) read of the written artifact partition-prunes
    val pick = rows.head
    val read = spark.read.parquet(path)
      .filter(col("split") === pick._6 && col("shard") === pick._2)
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*split[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"split/shard filter not applied as a partition filter:\n$plan")
    // collect() executes THIS Dataset's own QueryExecution (count() would
    // build a new one whose scan metrics we could not read after)
    assert(read.collect().nonEmpty)
    val allFiles = spark.read.parquet(path).inputFiles.length
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pruned = scan.metrics("numFiles").value
    assert(pruned > 0 && pruned < allFiles, s"no files pruned ($pruned of $allFiles)")
  }

  test("trainingShardsAppend: base files untouched, delta isolated, idempotent, frozen-merge slices") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("graft_shards_app").toString
    val baseCount = Curation.trainingShards(d, path).count()
    // snapshot every base file: the append must not touch a byte of them
    def snapshot(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_"))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
      finally s.close()
    }
    val before = snapshot()
    assert(before.nonEmpty)
    // frozen tokenizer via the production reconstitute path: the merge
    // table learned on the SAME kept corpus trainingShards trained on
    val kept = Curation.corpusKeep(d).filter(col("keep")).select("doc_id")
    val rounds = graft.text.TextAnalysis.bpeRoundsFromMergeTable(
      graft.text.TextAnalysis.bpeMerges(d.join(kept, "doc_id")))
    val batch = d.filter(col("doc_id") % 10 === 9)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat(col("text"), lit(" zzzappendonly")).as("text"))
    val delta = Curation.trainingShardsAppend(batch, rounds, path, 8L)
      .localCheckpoint()
    val deltaRows = delta.collect()
    assert(deltaRows.nonEmpty)
    assert(deltaRows.forall(_.getAs[Long]("shard") === 8L), "delta must land in its shard")
    // (1) every pre-append file survives byte-identical (size + mtime)
    val after = snapshot()
    for ((p, meta) <- before)
      assert(after.get(p).contains(meta), s"base file rewritten by append: $p")
    // (2) the combined artifact is base ∪ delta
    assert(spark.read.parquet(path).count() === baseCount + deltaRows.length)
    // (3) delta slices tile each batch doc's frozen-merge encoding
    val expected = graft.text.TextAnalysis.bpeDocIdsFromToksUnderRounds(
        batch.select(col("doc_id"),
          graft.text.TextAnalysis.tokens(col("text")).as("toks")), rounds)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[Long]]("ids").toList).toMap
    val assembled = deltaRows.groupBy(_.getAs[Long]("doc_id")).view.mapValues(
      _.sortBy(_.getAs[Long]("chunk_id"))
        .flatMap(_.getAs[scala.collection.Seq[Long]]("ids")).toList).toMap
    assert(assembled.keySet === expected.keySet)
    for ((id, ids) <- assembled)
      assert(ids === expected(id), s"doc $id: delta slices do not tile its encoding")
    // (4) re-running the same batch is idempotent (dynamic overwrite
    // replaces the shard's partitions; Append would double them)
    Curation.trainingShardsAppend(batch, rounds, path, 8L).count()
    assert(spark.read.parquet(path).count() === baseCount + deltaRows.length)
    // (5) a shard-8 read partition-prunes the base shards away
    val read = spark.read.parquet(path).filter(col("shard") === 8L)
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*shard[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"shard filter not applied as a partition filter:\n$plan")
    assert(read.collect().nonEmpty)
    val allFiles = spark.read.parquet(path).inputFiles.length
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pruned = scan.metrics("numFiles").value
    assert(pruned > 0 && pruned < allFiles, s"no files pruned ($pruned of $allFiles)")
  }

  test("corpusKeepFull: five gate families agree with their standalone operators") {
    // a 16-token benchmark doc quoted verbatim inside doc 6 → the
    // 13-window decontamination gate must flag exactly doc 6
    val benchText = "zebra yak xylophone wombat vulture tiger snake rhino " +
      "quail panda otter newt mole lemur koala jackal"
    val leak = "intro words then " + benchText + " trailing words here"
    val corpus = docs((1L, base), (2L, base), (3L, nearDup),
      (4L, unrelated), (5L, lowQuality), (6L, leak))
    val bench = docs((100L, benchText))
    val out = Curation.corpusKeepFull(corpus, bench)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    // dup/quality gates = corpusKeep's verbatim
    val three = Curation.corpusKeep(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- out.keys; c <- Seq("is_exact_dup", "is_near_dup", "quality_ok"))
      assert(out(id).getAs[Boolean](c) === three(id).getAs[Boolean](c), s"doc $id $c")
    // gopher gate = qualityRules' conjunction
    val gopher = graft.text.TextAnalysis.qualityRules(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("gopher_keep")).toMap
    // classifier gate = classifierScore's pred_keep
    val cls = graft.text.TextAnalysis.classifierScore(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pred_keep")).toMap
    // contamination flag = contamination's flagged set
    val cont = graft.text.Dedup.contamination(corpus, bench)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(cont === Set(6L), "only the planted quote may flag")
    for (id <- out.keys) {
      assert(out(id).getAs[Boolean]("gopher_keep") === gopher(id), s"doc $id gopher")
      assert(out(id).getAs[Boolean]("classifier_keep") === cls(id), s"doc $id classifier")
      assert(out(id).getAs[Boolean]("is_contaminated") === cont(id), s"doc $id contamination")
      val r = out(id)
      assert(r.getAs[Boolean]("keep") === (!r.getAs[Boolean]("is_exact_dup") &&
        !r.getAs[Boolean]("is_near_dup") && r.getAs[Boolean]("quality_ok") &&
        r.getAs[Boolean]("gopher_keep") && r.getAs[Boolean]("classifier_keep") &&
        !r.getAs[Boolean]("is_contaminated")), s"doc $id keep conjunction")
    }
  }

  test("corpusCard golden: counts, totals, dup rate; NULL text in n_docs only") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta gamma", "en", "web"),
      (2L, "alpha beta gamma", "en", "web"),    // exact copy
      (3L, "alpha  beta gamma", "en", "books"), // ws-collapse copy (same fp)
      (4L, "delta epsilon", "fr", "web"),
      (5L, null.asInstanceOf[String], "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Curation.corpusCard(fixture).first()
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_langs") === 2L)
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(r.getAs[Long]("n_chars_total") === (16L + 16L + 17L + 13L))
    assert(r.getAs[Long]("n_ws_tokens_total") === (3L + 3L + 3L + 2L))
    // distinct content: the alpha trio collapses to ONE fingerprint
    // (whitespace-normalized md5), NULL text has none
    assert(r.getAs[Long]("n_unique_content") === 2L)
    assert(r.getAs[Long]("exact_dup_millionths") === (3L * 1000000L) / 5L)
  }

  test("corpusKeepStats is exactly the verdict relation's combination rollup") {
    val benchText = "zebra yak xylophone wombat vulture tiger snake rhino " +
      "quail panda otter newt mole lemur koala jackal"
    val leak = "intro words then " + benchText + " trailing words here"
    val corpus = docs((1L, base), (2L, base), (3L, nearDup),
      (4L, unrelated), (5L, lowQuality), (6L, leak))
    val bench = docs((100L, benchText))
    val cols = Seq("is_exact_dup", "is_near_dup", "quality_ok",
      "gopher_keep", "classifier_keep", "is_contaminated", "keep")
    val expect = Curation.corpusKeepFull(corpus, bench).collect()
      .map(r => cols.map(r.getAs[Boolean]))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val got = Curation.corpusKeepStats(corpus, bench).collect()
      .map(r => cols.map(r.getAs[Boolean]) -> r.getAs[Long]("n_docs")).toMap
    assert(got === expect)
    assert(got.values.sum === 6L) // every doc in exactly one combination
  }

  test("the domain-quota gate drops exactly the over-quota publisher docs, reason set") {
    // nine docs of ONE publisher (ids ≡ 0 mod 3 → one registrable
    // domain under the synthesized host) + one doc of another — quota 7
    // must mark exactly 2 of the 9 domain_ok = false (worst quality
    // first, ties by doc_id), and keep must be false for those two
    val nine = (1L to 9L).map(i => (i * 3L, unrelated + s" extra$i"))
    val corpus = docs(nine :+ (100L, base): _*)
    val bench = docs((200L, "benchmark words nothing shared here at all"))
    val out = Curation.corpusKeepFull(corpus, bench)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val domFalse = out.filter(!_._2.getAs[Boolean]("domain_ok")).keySet
    assert(domFalse.size === 2, s"expected 2 over-quota drops, got $domFalse")
    assert(domFalse.forall(_ % 3 == 0), "drops must come from the 9-doc domain")
    assert(out(100L).getAs[Boolean]("domain_ok"),
      "the second publisher is under quota")
    for (id <- domFalse)
      assert(!out(id).getAs[Boolean]("keep"), s"doc $id kept despite quota")
    // the gate agrees with the standalone domainQuota window re-keyed on
    // the same host synthesis: lowest-quality (tie: highest doc_id) lose
    val inQuota = graft.text.Domains.domainQuota(
        corpus.withColumn("source", org.apache.spark.sql.functions.lit("s")),
        Curation.DomainKeepQuotaN)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    for ((id, r) <- out)
      assert(r.getAs[Boolean]("domain_ok") === inQuota.contains(id), s"doc $id")
  }

  test("trainingShardsUnigram: slices tile each kept doc's unigram id sequence; re-read prunes") {
    val corpus = docs((1L, base), (2L, base), (3L, nearDup),
      (4L, unrelated), (5L, lowQuality),
      (6L, "six seven eight nine ten eleven twelve thirteen fourteen " +
        "fifteen sixteen seventeen eighteen nineteen twenty alpha"))
    val dir = java.nio.file.Files.createTempDirectory("unigram_shards").toString
    val out = Curation.trainingShardsUnigram(corpus, dir + "/shards",
      dir + "/vocab", budget = 7L)
    val rows = out.collect()
    // every slice is exactly as long as its bin says
    rows.foreach(r => assert(
      r.getAs[scala.collection.Seq[Long]]("ids").size.toLong
        === r.getAs[Long]("chunk_tok")))
    // concatenated in chunk order, the slices reproduce the doc's
    // unigram_tokenize sequence over the SAME kept corpus (frozen ≡
    // induced, extended to the written artifact)
    val kept = Curation.corpusKeep(corpus).filter(org.apache.spark.sql.functions.col("keep"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === kept)
    val keptDocs = corpus.filter(org.apache.spark.sql.functions.col("doc_id")
      .isin(kept.toSeq: _*))
    val want = graft.text.Unigram.unigramTokenize(keptDocs)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("token_id")).toSeq }
    val got = rows.groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Long]("chunk_id"))
          .flatMap(_.getAs[scala.collection.Seq[Long]]("ids")).toSeq }
    assert(got === want)
    // the partitioned layout really prunes: a split+shard read plans
    // partition filters, not a full scan
    val pruned = spark.read.parquet(dir + "/shards")
      .filter(org.apache.spark.sql.functions.col("split") === "train")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(split"),
      s"no partition pruning in:\n$scan")
  }

  test("keep implies: not exact dup, not near dup, quality ok (decision consistency)") {
    val out = Curation.corpusKeep(docs(
      (1L, base), (2L, base), (3L, nearDup), (4L, unrelated), (5L, lowQuality)))
      .collect()
    out.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      val expect = !r.getAs[Boolean]("is_exact_dup") &&
        !r.getAs[Boolean]("is_near_dup") && r.getAs[Boolean]("quality_ok")
      assert(keep === expect, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("corpusMix: binding source keeps everything, others downsample to the weights") {
    import org.apache.spark.sql.functions.col
    // A: 3000 docs weight 1, B: 3000 docs weight 2 → caps are 9000 (A)
    // and 4500 (B); T = 4500, so B is binding (rate 1.0 — and because
    // weight 1 divides exactly, its threshold is EXACTLY the modulus,
    // deterministic full keep), A keeps at rate 0.5
    val d = ((0L until 3000L).map(i => (i, "A")) ++
      (3000L until 6000L).map(i => (i, "B")))
      .toDF("doc_id", "source")
    val kept = Curation.corpusMix(d, weights = Map("B" -> 2L))
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(kept("B") === 3000L, s"binding source must keep all: $kept")
    assert(math.abs(kept("A") - 1500L) < 150L, s"A should keep ~half: $kept")
  }

  test("corpusMix: verdicts are deterministic per doc and respect the hash threshold") {
    import org.apache.spark.sql.functions.col
    val d = (0L until 500L).map(i => (i, s"s${i % 5}")).toDF("doc_id", "source")
    val w = Map("s0" -> 3L)
    val once = Curation.corpusMix(d, w).collect().map(_.getLong(0)).sorted
    val twice = Curation.corpusMix(d, w).collect().map(_.getLong(0)).sorted
    assert(once === twice)
    // every surviving bucket is below its source's threshold by
    // construction; spot-check the up-weighted source keeps the most
    val bySrc = Curation.corpusMix(d, w)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(bySrc("s0") === bySrc.values.max)
  }

  test("corpusDiff: same/changed/added/removed with moved-content detection") {
    val old = docs(
      (1L, base),            // survives untouched → same
      (2L, unrelated),       // edited in v2 → changed
      (3L, nearDup),         // dropped in v2, content gone → removed
      (4L, lowQuality))      // dropped at id 4 but re-keyed to id 9 → moved
    val nw = docs(
      (1L, base + "   "),    // whitespace churn only — fp normalizes → same
      (2L, unrelated + " edited"),
      (5L, "brand new content never seen before"), // added, not moved
      (9L, lowQuality))      // same content as old id 4 → added + moved
    val out = Curation.corpusDiff(old, nw)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Boolean]("content_moved")))).toMap
    assert(out(1L) === (("same", false)))
    assert(out(2L) === (("changed", false)))
    assert(out(3L) === (("removed", false)))
    assert(out(4L) === (("removed", true)))
    assert(out(5L) === (("added", false)))
    assert(out(9L) === (("added", true)))
    assert(out.size === 6)
  }

  test("corpusDiff invariants: self-diff is all-same; disjoint ids are pure churn") {
    val snap = docs((1L, base), (2L, nearDup), (3L, unrelated))
    val self = Curation.corpusDiff(snap, snap).collect()
    assert(self.length === 3)
    assert(self.forall(r => r.getAs[String]("status") == "same" &&
      !r.getAs[Boolean]("content_moved")))
    // fully re-keyed snapshot: every id churns, but every CONTENT moved
    val rekeyed = docs((11L, base), (12L, nearDup), (13L, unrelated))
    val churn = Curation.corpusDiff(snap, rekeyed).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Boolean]("content_moved")))).toMap
    assert(churn.size === 6)
    for (id <- Seq(1L, 2L, 3L)) assert(churn(id) === (("removed", true)))
    for (id <- Seq(11L, 12L, 13L)) assert(churn(id) === (("added", true)))
  }

  test("pipelineManifestBpe: bins hold exactly the budget in BPE tokens, chunks tile the encode counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(13)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(200)).mkString(" ")
    // doc 5 is overlong in BPE terms; doc 100 duplicates doc 0 → dropped
    val texts = (0L until 30L).map(i =>
      i -> words(if (i == 5L) 120 else 15 + rnd.nextInt(15)))
    val d = (texts ++ Seq(100L -> texts.head._2))
      .map { case (i, t) => (i, t, "en") }
      .toDF("doc_id", "text", "lang")
    val budget = 64L
    val rows = Curation.pipelineManifestBpe(d, budget = budget, nShards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_tok"),
        r.getAs[Long]("seq_id"), r.getAs[String]("split")))
    assert(!rows.exists(_._1 == 100L), "dropped docs must not reach the manifest")
    // the packed counts are the TOKENIZER's, not whitespace's: per kept
    // doc, chunk_tok sums to bpeEncode's n_bpe_tokens over the SAME kept
    // corpus (merges learned on kept docs, as the operator composes it)
    val kept = Curation.corpusKeep(d).filter(col("keep")).select("doc_id")
    val keptDocs = d.join(kept, "doc_id")
    val bpe = graft.text.TextAnalysis.bpeEncode(keptDocs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet === bpe.keySet)
    for ((id, chunks) <- byDoc)
      assert(chunks.map(_._4).sum === bpe(id), s"doc $id chunks don't tile its BPE count")
    // whitespace counts would be very different — the loop is really closed
    val ws = keptDocs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keys.forall(id => bpe(id) > ws(id)), "BPE counts must exceed whitespace counts here")
    // bin invariant in BPE tokens: every non-final bin of every shard
    // holds exactly `budget`; no bin ever exceeds it
    val byBin = rows.groupBy(r => (r._2, r._5)).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = rows.groupBy(_._2).view.mapValues(_.map(_._5).max).toMap
    for (((shard, seq), tot) <- byBin) {
      assert(tot <= budget, s"bin ($shard,$seq) overflows: $tot > $budget")
      if (seq < lastBin(shard))
        assert(tot === budget, s"non-final bin ($shard,$seq) underfilled: $tot")
    }
    assert(rows.count(_._1 == 5L) > 1, "the BPE-overlong doc must chunk")
  }

  test("corpusMixEpochs: overweight sources repeat, verdicts follow the exact integer rates") {
    import spark.implicits._
    // A: 100 docs weight 6, B: 300 docs weight 1 → w_total 7, N 400;
    // rate_A = 400·6·1e6 // (7·100) = 3428571 (base 3, rem 428571);
    // rate_B = 400·1e6 // (7·300) = 190476 (base 0, rem 190476)
    val d = ((0L until 100L).map(i => (i, "A")) ++
      (100L until 400L).map(i => (i, "B")))
      .toDF("doc_id", "source")
    val out = Curation.corpusMixEpochs(d, weights = Map("A" -> 6L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("bucket"), r.getAs[Long]("n_repeats")))
    val rates = Map("A" -> (400L * 6L * 1000000L / (7L * 100L)),
      "B" -> (400L * 1000000L / (7L * 300L)))
    // every emitted verdict is exactly base + [bucket < rem]
    for ((_, src, bucket, nRep) <- out) {
      val (base, rem) = (rates(src) / 1000000L, rates(src) % 1000000L)
      assert(nRep === base + (if (bucket < rem) 1L else 0L),
        s"$src bucket=$bucket")
    }
    // the upsampled source keeps EVERY doc (base ≥ 1)
    assert(out.count(_._2 == "A") === 100)
    assert(out.filter(_._2 == "A").forall(_._4 >= 3L))
    // the downsampled source keeps a subset, all at exactly 1 repeat
    val bCount = out.count(_._2 == "B")
    assert(bCount > 0 && bCount < 300)
    assert(out.filter(_._2 == "B").forall(_._4 === 1L))
    // realized totals track the exact-rate targets closely (hash noise only)
    val realizedA = out.filter(_._2 == "A").map(_._4).sum
    assert(math.abs(realizedA - 100L * rates("A") / 1000000L) <= 15L,
      s"A realized $realizedA")
  }

  test("corpusMixEpochs: uniform weights are the identity mix (every doc once)") {
    import spark.implicits._
    val d = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val out = Curation.corpusMixEpochs(d, weights = Map.empty)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_repeats"))
    assert(out.length === 300)
    assert(out.forall(_._2 === 1L))
  }

  test("packSequencesEpochs: n_repeats copies materialize, scatter, and pack by (doc_id, epoch)") {
    import spark.implicits._
    // same A/B fixture as the corpusMixEpochs test (A upsamples to 3-4
    // repeats, B downsamples), plus a NULL-text doc that must pack nowhere
    val d = ((0L until 100L).map(i => (i, "A")) ++
      (100L until 400L).map(i => (i, "B")))
      .map { case (i, s) => (i, s, s"alpha beta tok$i") } // 3 tokens each
      .toDF("doc_id", "source", "text")
      .union(Seq((400L, "A", null: String)).toDF("doc_id", "source", "text"))
    val reps = Curation.corpusMixEpochs(d.select("doc_id", "source"),
        weights = Map("A" -> 6L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_repeats"))
      .toMap
    val budget = 7L
    val out = Curation.packSequencesEpochs(d, weights = Map("A" -> 6L),
        budget = budget, nShards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch"),
        r.getAs[Long]("shard"), r.getAs[Long]("tok_count"), r.getAs[Long]("seq_id")))
    // exactly n_repeats rows per kept doc, epochs tiling 0..n-1; the
    // NULL-text doc (funny rates aside) contributes nothing
    assert(!out.exists(_._1 === 400L), "NULL-text doc must pack nowhere")
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet === reps.keySet - 400L)
    for ((id, rows) <- byDoc)
      assert(rows.map(_._2).sorted.toSeq === (0L until reps(id)),
        s"doc $id epochs")
    // repeat copies scatter: the upsampled source's copies must not all
    // share one shard (3+ copies over 4 hash shards — collisions happen
    // per doc, but not for every doc)
    assert(byDoc.filter(_._2.length >= 3).exists(_._2.map(_._3).distinct.length >= 2),
      "no doc's repeat copies ever left one shard — the epoch key is dead")
    // seq assignment is the sharded running sum over (doc_id, epoch) order
    for ((shard, rows) <- out.groupBy(_._3)) {
      var cum = 0L
      for ((_, _, _, tok, seq) <- rows.sortBy(r => (r._1, r._2))) {
        assert(seq === cum / budget, s"shard $shard seq at cum=$cum")
        cum += tok
      }
    }
  }

  test("splitLeakReport flags only cross-split duplicated content") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // find ids in different splits deterministically from the assignment
    val asg = Curation.splitAssign((0L until 1000L).toDF("doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val trainIds = asg.collect { case (id, "train") => id }.toSeq.sorted
    val testId = asg.collect { case (id, "test") => id }.min
    val d = Seq(
      (trainIds(0), "leaked content here", "en"),   // train copy
      (testId, "leaked content here", "en"),        // test copy → LEAK
      (trainIds(1), "same split twice", "en"),      // train copy
      (trainIds(2), "same  split\ttwice", "en"),    // train copy (ws variant) → no leak
      (trainIds(3), "unique harmless doc", "en"),
      (trainIds(4), null, "en"), (testId + 1000L, null, "en")) // NULL carries no content
      .toDF("doc_id", "text", "lang")
    val out = Curation.splitLeakReport(d).collect()
    assert(out.length === 1, s"exactly the cross-split dup: ${out.toList}")
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 2L && r.getAs[Long]("n_splits") === 2L)
    assert(r.getAs[Long]("n_train") === 1L && r.getAs[Long]("n_test") === 1L
      && r.getAs[Long]("n_val") === 0L)
  }

  test("splitLeakFuzzy flags near-dup pairs spanning splits; exact copies stay the exact report's job") {
    import spark.implicits._
    val asg = Curation.splitAssign((0L until 1000L).toDF("doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val trainIds = asg.collect { case (id, "train") => id }.toSeq.sorted
    val testIds = asg.collect { case (id, "test") => id }.toSeq.sorted
    // three content families on disjoint token universes (no cross-family
    // shingle overlap): X = near-dup pair ACROSS splits (the leak), Y =
    // near-dup pair within train (not a leak), Z = exact copies across
    // splits (collapsed to one keeper before pairing — the EXACT report's
    // finding, asserted absent here)
    def fam(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    val d = Seq(
      (trainIds(0), fam("x")),
      (testIds(0), fam("x").replace("x30", "x31")),
      (trainIds(1), fam("y")),
      (trainIds(2), fam("y").replace("y30", "y31")),
      (trainIds(3), fam("z")),
      (testIds(1), fam("z")))
      .toDF("doc_id", "text")
    val out = Curation.splitLeakFuzzy(d)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_match"), r.getAs[String]("split_a"), r.getAs[String]("split_b")))
    assert(out.length === 1, s"exactly the cross-split near-dup: ${out.toList}")
    val (a, b, nMatch, sa, sb) = out.head
    assert(Set(a, b) === Set(trainIds(0), testIds(0)))
    assert(nMatch >= 8L && Set(sa, sb) === Set("train", "test"))
  }

  test("corpusDiff: NULL text diffs as content, not as an absent row") {
    val old = Seq((1L, "some words here", "en"), (2L, null, "en"))
      .toDF("doc_id", "text", "lang")
    val nw = Seq((1L, null, "en"), (2L, null, "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.corpusDiff(old, nw)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("status")).toMap
    assert(out(1L) === "changed") // text → NULL is a content change
    assert(out(2L) === "same")    // NULL on both sides is stable
  }

  test("sourceQuota: top-N per source by quality, tie-broken by doc_id") {
    val fixture = Seq(
      (1L, base, "en", "srcA"),
      (2L, lowQuality, "en", "srcA"),
      (3L, unrelated, "en", "srcA"),
      (4L, base, "en", "srcB"),
      (5L, lowQuality, "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Curation.sourceQuota(fixture, quota = 2).collect()
    // exactly 2 srcA rows and 2 srcB rows, ranks 1..2 in each
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("srcA").map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L))
    assert(bySrc("srcB").map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L))
    // the selected set per source is the top-2 of the directly-computed
    // quality ordering (desc score, asc doc_id) — the window agrees with
    // the standalone textStats expression
    val q = graft.text.TextAnalysis.textStats(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    for ((src, ids) <- Map("srcA" -> Seq(1L, 2L, 3L), "srcB" -> Seq(4L, 5L))) {
      val expected = ids.sortBy(id => (-q(id), id)).take(2)
      val got = bySrc(src).sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("doc_id")).toSeq
      assert(got === expected, src)
    }
    // quota >= per-source count keeps everything
    assert(Curation.sourceQuota(fixture, quota = 10).count() === 5L)
  }

  test("sourceQuota: NULL-quality (empty-token) docs rank strictly last") {
    val fixture = Seq(
      (1L, base, "en", "srcA"),
      (2L, "", "en", "srcA"),        // zero tokens → NULL quality_score
      (3L, unrelated, "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val ranks = Curation.sourceQuota(fixture, quota = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rnk")).toMap
    assert(ranks(2L) === 3L) // nulls last, after both scored docs
    // and a quota of 2 cuts the NULL-quality doc first
    assert(Curation.sourceQuota(fixture, quota = 2).collect()
      .map(_.getAs[Long]("doc_id")).toSet === Set(1L, 3L))
  }

  test("nightly production path: append under a PERSISTED merge table never re-learns or re-scans the base corpus") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = java.nio.file.Files.createTempDirectory("graft_shards_prod").toString
    val mergesPath = java.nio.file.Files.createTempDirectory("graft_merges").toString
    val batchPath = java.nio.file.Files.createTempDirectory("graft_batch").toString
    Curation.trainingShards(d, path).count() // the once-ever base build
    // the once-ever learn, PERSISTED: the ≤BpeRounds-row merge table is
    // the tokenizer artifact a nightly run loads
    val kept = Curation.corpusKeep(d).filter(col("keep")).select("doc_id")
    val learned = graft.text.TextAnalysis.bpeMerges(d.join(kept, "doc_id"))
    learned.write.mode("overwrite").parquet(mergesPath)
    val persisted = spark.read.parquet(mergesPath)
    // persist/reload fidelity: the reloaded table IS the learned one
    assert(persisted.collect().map(_.toSeq).toSet ===
      learned.collect().map(_.toSeq).toSet)
    val rounds = graft.text.TextAnalysis.bpeRoundsFromMergeTable(persisted)
    // plan-walk proof of "never re-learns": every frozen round's plan
    // reads ONLY the merge artifact — no file source of the base
    // corpus is reachable, so no append can re-scan or re-learn it
    for (r <- rounds) {
      val srcs = r.queryExecution.analyzed.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
      }.flatten
      assert(srcs.nonEmpty && srcs.forall(_.contains(mergesPath)),
        s"frozen round reads outside the merge artifact: $srcs")
    }
    // the nightly batch arrives from its own source, NOT the corpus
    d.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + lit(2000000L)).as("doc_id"),
        concat(col("text"), lit(" nightlybatch")).as("text"))
      .write.mode("overwrite").parquet(batchPath)
    val batch = spark.read.parquet(batchPath)
    val delta = Curation.trainingShardsAppend(batch, rounds, path, 9L)
      .collect()
    assert(delta.nonEmpty && delta.forall(_.getAs[Long]("shard") === 9L))
    // and the frozen encode under the persisted table matches the
    // in-memory learned rounds exactly (same merge table ⇒ same ids)
    val viaLearned = graft.text.TextAnalysis.bpeDocIdsFromToksUnderRounds(
        batch.select(col("doc_id"),
          graft.text.TextAnalysis.tokens(col("text")).as("toks")),
        graft.text.TextAnalysis.bpeRoundsFromMergeTable(learned))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Long]]("ids").toList).toMap
    val assembled = delta.groupBy(_.getAs[Long]("doc_id")).view.mapValues(
      _.sortBy(_.getAs[Long]("chunk_id"))
        .flatMap(_.getAs[scala.collection.Seq[Long]]("ids")).toList).toMap
    assert(assembled === viaLearned)
  }

  test("sourceQuotaThreshold == sourceQuota (minus rnk) when no cell straddles; ties kept") {
    import org.apache.spark.sql.functions.col
    val words = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    def mk(rows: (Long, String, String)*) =
      rows.toSeq.map { case (id, tx, src) => (id, tx, "en", src, 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // 20 distinct-score docs in one source at quota 15
    val docs = mk((0 until 20).map(i =>
      (i.toLong, words(10 + 10 * i), "srcA")): _*)
    val win = graft.text.Curation.sourceQuota(docs).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    val thr = graft.text.Curation.sourceQuotaThreshold(docs).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(thr === win)
    // a 6-doc tie straddling quota 15 after 12 better docs: windowed
    // keeps 3 of the tied cell, threshold keeps all 6
    val tied = mk(((0 until 12).map(i => (i.toLong, words(60 + 10 * i), "srcB")) ++
      (12 until 18).map(i => (i.toLong, words(20), "srcB"))): _*)
    val winT = graft.text.Curation.sourceQuota(tied).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    val thrT = graft.text.Curation.sourceQuotaThreshold(tied).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(winT.size === 15 && thrT.size === 18)
    assert(winT.subsetOf(thrT))
  }
}
