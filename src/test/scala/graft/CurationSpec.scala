package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Decontaminate, Packing, Sampling, Text}

/** Corpus-curation operators: benchmark decontamination, sequence packing,
  * deterministic sampling / domain mixing. */
class CurationSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ------------------------------------------------------------- decontaminate

  test("wordNgrams: sliding word windows, lowercased, short docs empty") {
    import spark.implicits._
    val df = Seq("The Quick  Brown fox", "one two", "").toDF("t")
      .select(Decontaminate.wordNgrams(col("t"), 3).as("g"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) === Seq("the quick brown", "quick brown fox"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("overlapReport: counts distinct train n-grams present in eval") {
    val train = docsDf(Seq(
      (0L, "a b c d e f"),          // ngrams(3): abc bcd cde def — abc+bcd in eval
      (1L, "x y z w"),              // xyz yzw — none in eval
      (2L, "a b")))                 // too short: 0 ngrams
    val eval = docsDf(Seq((100L, "a b c d q"), (101L, "zz")))
    val out = Decontaminate.overlapReport(train, eval, "text", "doc_id", n = 3)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    // doc 0: eval ngrams {abc, bcd, cdq}; train ngrams {abc,bcd,cde,def} -> 2 hits
    assert(out(0).getAs[Long]("n_overlap") === 2L)
    assert(out(0).getAs[Boolean]("contaminated"))
    assertRtol(out(0).getAs[Double]("overlap_frac"), 0.5, 1e-12, "overlap_frac")
    assert(out(1).getAs[Long]("n_overlap") === 0L)
    assert(!out(1).getAs[Boolean]("contaminated"))
    assert(out(2).getAs[Int]("n_ngrams") === 0)
    assert(out(2).getAs[Double]("overlap_frac") === 0.0)
    // shuffle-join path (broadcastEval = false) produces identical rows
    val shuffled = Decontaminate.overlapReport(train, eval, "text", "doc_id",
      n = 3, broadcastEval = false).orderBy("id").collect()
    assert(shuffled.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("crossDocDupScore: n-grams shared across documents, not within") {
    val docs = docsDf(Seq(
      (0L, "a b c d"),          // abc bcd
      (1L, "a b c x"),          // abc bcx — shares abc with 0
      (2L, "q r s t"),          // qrs rst — unique
      (3L, "a b c d")))         // exact dup of 0: both ngrams dup
    val out = Decontaminate.crossDocDupScore(docs, "text", "doc_id", n = 3)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_dup") === 2L) // abc (docs 0,1,3) + bcd (docs 0,3)
    assert(out(1).getAs[Long]("n_dup") === 1L) // abc only
    assert(out(2).getAs[Long]("n_dup") === 0L)
    assert(out(3).getAs[Long]("n_dup") === 2L)
  }

  test("ngramWindowHashKernel: equal windows hash equal, ordered, short arrays empty") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ws: String*) = ArrayData.toArrayData(ws.map(UTF8String.fromString).toArray)
    val h1 = Decontaminate.ngramWindowHashKernel(arr("a", "b", "c", "d"), 3)
    assert(h1.length === 2) // windows abc, bcd
    val h2 = Decontaminate.ngramWindowHashKernel(arr("z", "a", "b", "c"), 3)
    assert(h2(1) === h1(0)) // "a b c" hashes identically at any position
    assert(h2(0) !== h1(0))
    assert(Decontaminate.ngramWindowHashKernel(arr("a", "b"), 3).isEmpty)
    // order sensitivity: "a b c" != "c b a"
    val h3 = Decontaminate.ngramWindowHashKernel(arr("c", "b", "a"), 3)
    assert(h3(0) !== h1(0))
  }

  test("removeDupSpans: cross-doc duplicated spans cut, first occurrence kept") {
    val docs = docsDf(Seq(
      (0L, "a b c d e f"),      // first occurrence of every shared 3-gram
      (1L, "z a b c d e"),      // abc/bcd/cde at starts 1,2,3 -> covers pos 1..5
      (2L, "q r s t u")))       // untouched
    val out = Decontaminate.removeDupSpans(docs, "text", "doc_id", n = 3)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_removed") === 0L)
    assert(out(0).getAs[String]("text_dedup") === "a b c d e f")
    assert(out(1).getAs[Long]("n_removed") === 5L)
    assert(out(1).getAs[String]("text_dedup") === "z")
    assert(out(2).getAs[Long]("n_removed") === 0L)
  }

  test("removeDupSpans: within-doc repetition collapses to the first span") {
    val docs = docsDf(Seq((7L, "p q r p q r p q r")))
    val out = Decontaminate.removeDupSpans(docs, "text", "doc_id", n = 3).collect()
    assert(out.head.getAs[Long]("n_words") === 9L)
    assert(out.head.getAs[Long]("n_removed") === 6L)
    assert(out.head.getAs[String]("text_dedup") === "p q r")
  }

  // ------------------------------------------------------------------ packing

  test("packChunked: offsets are the per-group running sum; chunks cover the doc") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1L, 60L), ("g1", 2L, 50L), ("g1", 3L, 0L), ("g1", 4L, 10L),
      ("g2", 1L, 250L)).toDF("grp", "ord", "tok")
    val out = Packing.packChunked(df, col("tok"), maxTokens = 100, "grp", "ord")
      .orderBy("grp", "ord").collect()
    // g1: offsets 0,60,110,110; chunks: [0,0],[0,1],[1,1],[1,1]
    assert(out.map(_.getAs[Long]("start_offset")).toSeq === Seq(0L, 60L, 110L, 110L, 0L))
    assert(out.map(_.getAs[Long]("chunk_first")).toSeq === Seq(0L, 0L, 1L, 1L, 0L))
    assert(out.map(_.getAs[Long]("chunk_last")).toSeq === Seq(0L, 1L, 1L, 1L, 2L))
  }

  test("packChunked properties on random data: offsets cumulative, chunks cover and order") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = for (g <- Seq("x", "y"); i <- 0 until 400)
      yield (g, i.toLong, rnd.nextInt(5000).toLong)
    val out = Packing.packChunked(rows.toDF("grp", "ord", "tok"), col("tok"),
        maxTokens = 1024, "grp", "ord")
      .select("grp", "ord", "tok", "start_offset", "chunk_first", "chunk_last")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    for ((g, group) <- out.groupBy(_._1)) {
      val sorted = group.sortBy(_._2)
      var expectedOffset = 0L
      for ((_, _, tok, off, cf, cl) <- sorted) {
        assert(off === expectedOffset, s"$g offset")
        assert(cf === off / 1024, s"$g chunk_first")
        assert(cl === (if (tok > 0) (off + tok - 1) / 1024 else cf), s"$g chunk_last")
        assert(cf <= cl)
        expectedOffset += tok
      }
    }
  }

  /** Brute-force sequential reference for first-fit packing. */
  private def firstFitRef(tokens: Seq[Long], maxTokens: Long): Seq[Long] = {
    var bin = 0L; var fill = 0L
    tokens.map { n =>
      if (fill > 0L && fill + n > maxTokens) { bin += 1L; fill = 0L }
      fill += n
      bin
    }
  }

  test("packFirstFit matches the sequential reference per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 0 until 200
    } yield (g, i.toLong, rnd.nextInt(130).toLong) // some docs exceed maxTokens=100
    val df = rows.toDF("grp", "ord", "tok").repartition(7) // scramble layout
    val out = Packing.packFirstFit(df, "tok", maxTokens = 100, "grp", "ord")
      .select("grp", "ord", "bin_id").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    for ((g, rs) <- out) {
      val sorted = rs.sortBy(_._2)
      val expected = firstFitRef(sorted.map(r => rows.find(x => x._1 == g && x._2 == r._2).get._3).toSeq, 100L)
      assert(sorted.map(_._3).toSeq === expected, s"group $g")
    }
    // invariant: no bin (except singleton oversize docs) exceeds the budget
    val byBin = out.values.flatten.toSeq.groupBy(r => (r._1, r._3))
    for (((g, b), rs) <- byBin) {
      val toks = rs.map(r => rows.find(x => x._1 == g && x._2 == r._2).get._3)
      assert(toks.sum <= 100L || rs.size == 1, s"overfull bin $g/$b")
    }
  }

  test("packFirstFit: oversize and zero-token docs") {
    import spark.implicits._
    val df = Seq(("g", 1L, 300L), ("g", 2L, 50L), ("g", 3L, 0L), ("g", 4L, 60L))
      .toDF("grp", "ord", "tok")
    val out = Packing.packFirstFit(df, "tok", maxTokens = 100, "grp", "ord")
      .orderBy("ord").select("bin_id").collect().map(_.getLong(0)).toSeq
    // 300 fills bin 0 alone (overflow closes it when 50 arrives), 50+0 in bin 1
    // (0-token never opens a new bin), 60 overflows -> bin 2
    assert(out === Seq(0L, 1L, 1L, 2L))
  }

  test("classifierScore: sigmoid of the weighted feature sum; unknown feature rejected") {
    import graft.pipeline.Text
    val df = docsDf(Seq((0L, "the cat sat"), (1L, "zzz")))
    val out = Text.classifierScore(df, "text", Map("stopword_ratio" -> 3.0), bias = -1.0)
      .orderBy("doc_id").collect()
    // doc 0: stopword_ratio = 1/3 -> sigmoid(-1 + 1) = 0.5
    assertRtol(out(0).getAs[Double]("quality_score"),
      1.0 / (1.0 + math.exp(-(-1.0 + 3.0 / 3.0))), 1e-12, "score0")
    assert(out(0).getAs[Double]("quality_score") === 0.5)
    assertRtol(out(1).getAs[Double]("quality_score"),
      1.0 / (1.0 + math.exp(1.0)), 1e-12, "score1")
    intercept[IllegalArgumentException](
      Text.classifierScore(df, "text", Map("nope" -> 1.0)))
  }

  // ----------------------------------------------------------------- sampling

  test("hexThreshold endpoints and monotonicity") {
    assert(Sampling.hexThreshold(0.0) === "000000000000000")
    assert(Sampling.hexThreshold(1.0) === "fffffffffffffff")
    assert(Sampling.hexThreshold(0.25) === "400000000000000")
    assert(Sampling.hexThreshold(0.2) < Sampling.hexThreshold(0.5))
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.5))
  }

  test("hashSample: deterministic, partitioning-independent, ~fraction") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("k")
    val a = Sampling.hashSample(df, col("k"), 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(13), col("k"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.03)
    // nested property: a 0.1 sample is a subset of a 0.25 sample (same key hash)
    val c = Sampling.hashSample(df, col("k"), 0.10).collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("curriculumOrder: ntile balance, round-robin interleave, deterministic under repartition") {
    import spark.implicits._
    // 103 rows, k=8 -> ntile: first 103%8=7 buckets hold 13, last holds 12
    val df = (0L until 103L).map(i => (i, ((i * 37) % 103).toDouble))
      .toDF("doc_id", "d")
    val out = Sampling.curriculumOrder(df, "d", "doc_id", k = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length === 103)
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert((0L until 7L).forall(sizes(_) === 13) && sizes(7L) === 12)
    // positions are unique and encode (rank_in_bucket, bucket) exactly
    assert(out.map(_._5).distinct.length === 103)
    out.foreach { case (_, _, b, rib, pos) => assert(pos === rib * 8 + b) }
    // interleave: the first 8 positions are one row from EACH bucket,
    // in bucket order, and each bucket's rows appear in difficulty order
    val byPos = out.sortBy(_._5)
    assert(byPos.take(8).map(_._3).toSeq === (0L until 8L).toSeq)
    out.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4).map(_._2).toSeq
      assert(sorted === sorted.sorted, "rank_in_bucket must follow difficulty")
    }
    // bucket boundaries respect the global difficulty order: every member
    // of bucket b is <= every member of bucket b+1 (ties impossible here)
    val maxOf = out.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    val minOf = out.groupBy(_._3).view.mapValues(_.map(_._2).min).toMap
    (0L until 7L).foreach(b => assert(maxOf(b) <= minOf(b + 1)))
    // bit-stable under any partitioning
    val again = Sampling.curriculumOrder(df.repartition(17), "d", "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(again.toSeq === out.sortBy(_._1).toSeq)
    // n < k edge: every row its own bucket, positions = buckets
    val tiny = Sampling.curriculumOrder(
      (0L until 3L).map(i => (i, i.toDouble)).toDF("doc_id", "d"), "d", "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(tiny.toSeq === Seq((0L, 0L, 0L, 0L), (1L, 1L, 0L, 1L), (2L, 2L, 0L, 2L)))
    intercept[IllegalArgumentException](
      Sampling.curriculumOrder(df, "d", "doc_id", 0))
  }

  test("splitAssign: total coverage, ~fractions, dup co-location, membership stability") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("k")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitAssign(df, col("k"), splits)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 4000L) // every row assigned
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 4000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 4000.0 - 0.1) < 0.02)
    // same key -> same split regardless of the rest of the dataset
    // (membership stability: a 500-row subset decides identically)
    val sub = Sampling.splitAssign(df.filter(col("k") < 500), col("k"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = out.filter(col("k") < 500)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub === full)
    // content-keyed: exact dup texts land in the same split
    val docs = Seq((0L, "Same  Text"), (1L, "same text"), (2L, "other")).toDF("id", "text")
    val bySplit = Sampling.splitAssign(docs,
        graft.pipeline.Text.fingerprint(col("text")), splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(bySplit(0L) === bySplit(1L))
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, col("k"), Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, col("k"), Seq("a" -> 1.0)))
  }

  test("importanceSample: per-row probability, nested in p, agrees with hashSample") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("k")
    // constant prob == hashSample at the same fraction (same decision rule)
    val viaImp = Sampling.importanceSample(df, lit(0.25), col("k"))
      .collect().map(_.getLong(0)).toSet
    val viaHash = Sampling.hashSample(df, col("k"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(viaImp === viaHash)
    // endpoints clamp
    assert(Sampling.importanceSample(df, lit(-3.0), col("k")).count() === 0L)
    assert(Sampling.importanceSample(df, lit(7.0), col("k")).count() === 4000L)
    // per-row rates: rows with p=0.1 kept at ~10%, rows with p=0.9 at ~90%
    val mixed = df.withColumn("p", when(col("k") % 2 === 0, 0.1).otherwise(0.9))
    val kept = Sampling.importanceSample(mixed, col("p"), col("k"))
    val lowRate = kept.filter(col("k") % 2 === 0).count() / 2000.0
    val highRate = kept.filter(col("k") % 2 =!= 0).count() / 2000.0
    assert(math.abs(lowRate - 0.1) < 0.03, s"low-p rate $lowRate")
    assert(math.abs(highRate - 0.9) < 0.03, s"high-p rate $highRate")
    // monotone: raising a row's p never drops a previously-kept row
    val at50 = Sampling.importanceSample(df, lit(0.5), col("k"))
      .collect().map(_.getLong(0)).toSet
    assert(viaImp.subsetOf(at50))
  }

  test("corpusReport: cube totals are consistent at every rollup level") {
    import spark.implicits._
    val df = Seq(
      ("en", "web", 100L), ("en", "web", 300L), ("en", "book", 50L),
      ("de", "web", 200L), (null: String, "web", 70L)).toDF("lang", "source", "sz")
    val rep = graft.pipeline.Text.corpusReport(df, Seq("lang", "source"), "sz")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Int]("g_lang"), r.getAs[Int]("g_source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("total_size"))).toSet
    // grand total row
    assert(rep.contains((null, null, 1, 1, 5L, 720L)))
    // per-lang rollups
    assert(rep.contains(("en", null, 0, 1, 3L, 450L)))
    // a real NULL lang group is distinguishable from the rollup by g_lang=0
    assert(rep.contains((null, "web", 0, 0, 1L, 70L)))
    assert(rep.contains((null, "web", 1, 0, 4L, 670L)))
    // finest level
    assert(rep.contains(("en", "web", 0, 0, 2L, 400L)))
    assert(rep.size === 4 + 3 + 2 + 1) // cells + lang-rollups + src-rollups + total
  }

  test("stratifiedSample: exactly k per stratum, deterministic") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (s"s${i % 4}", i)).toDF("st", "k")
    val out = Sampling.stratifiedSample(df, Seq("st"), k = 10, key = col("k"))
    val counts = out.groupBy("st").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L, "s3" -> 10L))
    val again = Sampling.stratifiedSample(df.repartition(11), Seq("st"), 10, col("k"))
    assert(out.collect().toSet === again.collect().toSet)
  }

  test("domainMix exact: output counts hit the quota mixture") {
    import spark.implicits._
    // 600 a / 300 b / 100 c; targets 50/25/25 -> T bound by c: 100/0.25=400
    val df = ((0L until 600L).map(i => ("a", i)) ++
      (600L until 900L).map(i => ("b", i)) ++
      (900L until 1000L).map(i => ("c", i))).toDF("dom", "k")
    val out = Sampling.domainMix(df, "dom",
      Map("a" -> 0.50, "b" -> 0.25, "c" -> 0.25), col("k"), exact = true)
    val counts = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 200L, "b" -> 100L, "c" -> 100L))
    // threshold mode: same quotas in expectation, binomial tolerance
    val approx = Sampling.domainMix(df, "dom",
      Map("a" -> 0.50, "b" -> 0.25, "c" -> 0.25), col("k"), exact = false)
      .groupBy("dom").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(approx("a") - 200L) < 60, s"approx a: ${approx("a")}")
    // untargeted domains are dropped
    val dropped = Sampling.domainMix(df, "dom", Map("a" -> 1.0), col("k"))
    assert(dropped.select("dom").distinct().collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("semanticOverlap: planted eval-identical embedding flagged, orthogonal not") {
    import spark.implicits._
    val ev = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // identical to eval 0
      (101L, Array(0.0f, 0.9f, 0.1f, 0.0f)),   // near eval 1
      (102L, Array(0.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding") // orthogonal
    val out = Decontaminate.semanticOverlap(train, ev, threshold = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(100L)._1 === 0L && out(100L)._3, "identical vector must flag")
    assert(math.abs(out(100L)._2 - 1.0) < 1e-9)
    assert(out(101L)._1 === 1L && out(101L)._3, "0.9/sqrt(0.82) > 0.8 must flag")
    assert(out(102L)._2 < 1e-9 && !out(102L)._3, "orthogonal must not flag")
  }

  test("chunkDocs: overlapping windows cover the doc; short docs get one chunk") {
    import spark.implicits._
    val words = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, words), (1L, "short doc only"), (2L, "")).toDF("doc_id", "text")
    val out = Text.chunkDocs(df, "text", "doc_id", chunkWords = 10, strideWords = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    // 25 words, chunk 10, stride 5 -> 1 + ceil(15/5) = 4 chunks
    assert(d0.length === 4)
    assert(d0(0)._4.startsWith("w1 w2") && d0(0)._3 === 10)
    assert(d0(1)._4.startsWith("w6 w7"), "stride-5 overlap")
    assert(d0(3)._4.endsWith("w25"))
    assert(d0(3)._3 === 10) // words 16..25
    // consecutive chunks overlap by chunk - stride = 5 words
    val c0 = d0(0)._4.split(" ").toSeq
    val c1 = d0(1)._4.split(" ").toSeq
    assert(c0.drop(5) === c1.take(5))
    // short doc: exactly one (short) chunk
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length === 1 && d1(0)._3 === 3 && d1(0)._4 === "short doc only")
    // empty doc still yields one row (empty chunk)
    assert(out.count(_._1 == 2L) === 1)
    // every source word appears in some chunk
    assert(d0.flatMap(_._4.split(" ")).toSet === words.split(" ").toSet)
  }

  test("weightedSample: exact k, deterministic, weight-monotone inclusion") {
    import spark.implicits._
    // two interleaved weight classes: heavy rows weight 100, light weight 1
    val df = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) 100.0 else 1.0)).toDF("k", "w")
    val out = Sampling.weightedSample(df, col("w"), col("k"), k = 100)
    val got = out.select("k").collect().map(_.getLong(0)).toSet
    assert(got.size === 100)
    // determinism under repartitioning
    val again = Sampling.weightedSample(df.repartition(13), col("w"), col("k"), k = 100)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === again)
    // heavy rows dominate the sample (500 heavy vs 500 light, 100x weight)
    val heavy = got.count(_ % 2 == 0)
    assert(heavy > 85, s"expected heavy majority, got $heavy/100")
    // per-stratum variant: exactly k rows in each stratum
    val strat = df.withColumn("st", (col("k") % 3).cast("string"))
    val perStrat = Sampling.weightedSample(strat, col("w"), col("k"), k = 20,
        strataCols = Seq("st"))
      .groupBy("st").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStrat === Map("0" -> 20L, "1" -> 20L, "2" -> 20L))
    // non-positive weights lose to every positive weight
    val mixed = (0L until 50L).map(i => (i, if (i < 40) 1.0 else 0.0)).toDF("k", "w")
    val kept = Sampling.weightedSample(mixed, col("w"), col("k"), k = 40)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(kept === (0L until 40L).toSet)
  }

  test("standard curation pipeline: lang -> dedup -> decontaminate, deterministic") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the green forest where many other animals live quietly"
    val corpus = Seq(
      (0L, base),                                     // keeper
      (1L, base),                                     // exact dup of 0
      (2L, base.replace("green", "grene")),           // near dup of 0
      (3L, "a completely different english story about databases and the " +
        "engines that run them with joins and shuffles and many other things"),
      (4L, "this document quotes the famous benchmark question answer pair " +
        "verbatim so it must be dropped by decontamination rules here"),
      (5L, "\u4e2d\u6587\u6587\u6863\u5185\u5bb9\u6ca1\u6709\u7a7a\u683c" * 4)) // non-English
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the famous benchmark question answer pair verbatim"))
      .toDF("doc_id", "text")
    val cfg = Curation.CurationConfig(
      langs = Set("en"), applyGopherRules = false,
      nearDupThreshold = Some(0.7), evalCorpus = Some(eval),
      contaminationNgram = 6, keepProbability = None)
    val (out, report) = Curation.curateReport(spark, corpus, "text", "doc_id", cfg)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 3L), s"kept $kept")
    val stages = report.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stages("lang")._2 === 5L)           // d5 dropped
    assert(stages("dedup_exact")._2 === 4L)    // d1 dropped
    assert(stages("dedup_near")._2 === 3L)     // d2 dropped
    assert(stages("decontaminate")._2 === 2L)  // d4 dropped
    // counts chain: rows_in of each stage = rows_out of the previous
    val ordered = report.collect().map(r => (r.getLong(1), r.getLong(2)))
    ordered.sliding(2).foreach { case Array(a, b) => assert(b._1 === a._2); case _ => }
    // lazy path gives the same corpus, and re-running is deterministic
    val lazyOut = Curation.curate(spark, corpus, "text", "doc_id", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lazyOut === kept)
  }

  test("semanticOverlap: empty eval reports every train doc contaminated=false") {
    import spark.implicits._
    val ev = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Decontaminate.semanticOverlap(train, ev, threshold = 0.8).collect()
    assert(out.length === 2, "train docs must not vanish when eval is empty")
    assert(out.forall(r => !r.getBoolean(r.fieldIndex("contaminated"))))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("best_cosine"))))
  }
}
