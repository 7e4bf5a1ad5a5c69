package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Text-pipeline semantics: shingling, MinHash-vs-Jaccard concentration,
  * SimHash locality, fingerprint determinism. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: k-word windows, count = n_words - k + 1") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val sh = df.select(TextOps.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].head
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("shingles: text shorter than k yields no shingles") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val sh = df.select(TextOps.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].head
    assert(sh.isEmpty) // a 2-word doc is not a 3-gram
  }

  test("minhash candidates: identical docs always collide; disjoint docs never") {
    // identical pair (1,2); disjoint third doc
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different words entirely unrelated content here now today ok"
    val docs = Seq((1L, t1), (2L, t1), (3L, t2)).toDF("doc_id", "text")
    docs.createOrReplaceTempView("minhash_docs")
    // run the same pipeline shape against the temp fixture
    val pairs = minhashOn(docs)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => (a == 3L) || (b == 3L) })
  }

  private def minhashOn(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    // the PRODUCTION banding (not a test-local replica): whatever hash
    // family bandSignatures ships, these invariants must hold on it
    val banded = TextOps.bandSignatures(docs)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .as[(Long, Long)].collect().toSet
  }

  test("minhash candidates on testdata ⊇ high-Jaccard exact pairs") {
    // every exact pair with Jaccard ≥ 0.9 must be an LSH candidate
    // (8 bands × 4 rows: P[miss | J=0.9] = (1-0.9^4)^8 ≈ 4e-5)
    val exact = TextOps.ngramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cand = TextOps.minhashPairs(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cand), s"missed: ${exact.diff(cand)}")
  }

  test("simhash: identical texts get identical fingerprints; fingerprint is 64 bits") {
    val out = TextOps.simhash(spark, sf).as[(Long, String)].collect()
    assert(out.forall(_._2.length == 64))
    assert(out.forall(_._2.forall(c => c == '0' || c == '1')))
  }

  test("simhash LSH banding finds exactly the exhaustive pairs at dist <= 10") {
    // pigeonhole: 11 bands, <=10 differing bits => >=1 band agrees exactly,
    // so the band join misses nothing; the dist filter drops bucket false
    // positives, so the sets are EQUAL, not just a superset
    val exhaustive = TextOps.simhashNearDup(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = TextOps.simhashBandPairs(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == exhaustive,
      s"missed: ${exhaustive.diff(banded).take(5)}; extra: ${banded.diff(exhaustive).take(5)}")
  }

  test("fingerprint: stable across runs (pure function of text)") {
    val a = TextOps.fingerprint(spark, sf).as[(Long, Long)].collect().toMap
    val b = TextOps.fingerprint(spark, sf).as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("exact dedup keeps one row per distinct text") {
    val docs = Tables.documents(spark, sf)
    val n = TextOps.dedupExact(spark, sf).count()
    assert(n == docs.select("text").distinct().count())
  }

  test("bpe pair counts match a driver-side brute force") {
    val texts = Tables.documents(spark, sf)
      .select("text").as[String].collect()
    val brute = scala.collection.mutable.HashMap.empty[String, Long]
    texts.flatMap(_.split(" ")).filter(_.length >= 2).foreach { w =>
      w.sliding(2).foreach(p => brute(p) = brute.getOrElse(p, 0L) + 1L)
    }
    val expect = brute.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = TextOps.bpePairs(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got == expect)
  }

  test("bpeTrain: 5-merge trace matches a driver brute force") {
    val vocabDf = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("f"))
    val got = TextOps.bpeTrain(vocabDf, 5)

    // brute force with IDENTICAL greedy left-to-right merge semantics
    def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (acc.last + s)
        else acc :+ s
      }
    var vocab: Map[Vector[String], Long] = Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) =>
        w.split("").toVector -> ws.size.toLong }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    (1 to 5).foreach { _ =>
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
      expect += ((a, b))
      vocab = vocab.toSeq.map { case (syms, f) => (mergeWord(syms, a, b), f) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    assert(got == expect.toSeq)
  }

  test("bpeTrain: fully-merged single-symbol words stop contributing pairs") {
    // round 1 merges (a,b); "ab" then has ONE symbol and must fall out
    // of the pair counts — a descending sequence(1,0) would instead
    // fabricate weight-100 null pairs and hijack round 2
    val vocab = Seq(("ab", 100L), ("abc", 1L)).toDF("word", "f")
    val merges = TextOps.bpeTrain(vocab, 2)
    assert(merges == Seq(("a", "b"), ("ab", "c")))
  }

  test("bpeEncode: matches driver brute force, reconstructs, and compresses") {
    val vocabDf = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .localCheckpoint()
    // 18 merges forces the chunked fold across a checkpoint boundary
    val merges = TextOps.bpeTrain(vocabDf, 18)
    assert(merges.size > 8, "need enough rules to cross the 8-rule chunk")
    val got = TextOps.bpeEncode(vocabDf, merges)
      .select("word", "tokens").as[(String, Seq[String])]
      .collect().toMap

    def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (acc.last + s)
        else acc :+ s
      }
    got.foreach { case (word, tokens) =>
      val expect = merges.foldLeft(word.split("").toVector) {
        case (syms, (a, b)) => mergeWord(syms, a, b)
      }
      assert(tokens == expect, s"encode mismatch for '$word'")
      // reconstruction invariant: BPE only ever concatenates
      assert(tokens.mkString == word, s"'$word' does not reconstruct")
    }
    // training on this vocab must compress it: fewer tokens than chars
    // (toSeq first — Map.keys is a SET and would dedup equal lengths)
    val totTokens = got.toSeq.map(_._2.size).sum
    val totChars = got.toSeq.map(_._1.length).sum
    assert(totTokens < totChars, s"no compression: $totTokens vs $totChars")
  }

  test("bpeEncode: unseen words tokenize with trained rules") {
    val trainVocab = Seq(("abab", 50L), ("abc", 10L)).toDF("word", "f")
    val merges = TextOps.bpeTrain(trainVocab, 2) // (a,b) then (ab,ab)
    val got = TextOps.bpeEncode(
        Seq(("ababab", 1L), ("ba", 1L), ("cab", 1L)).toDF("word", "f"), merges)
      .select("word", "tokens").as[(String, Seq[String])].collect().toMap
    assert(merges.head == (("a", "b")))
    // greedy left-to-right: ababab → ab ab ab → (abab)(ab)
    assert(got("ababab") == Seq("abab", "ab"))
    assert(got("ba") == Seq("b", "a"))   // no rule applies
    assert(got("cab") == Seq("c", "ab")) // rule applies mid-word
  }

  test("heavy words: exact at the 2% boundary despite the sketch") {
    // n = 5000: "hot" sits EXACTLY on the 2% reporting line (100 =
    // 5000·0.02), "warm" one count below; the once-only tail hammers
    // MG decrements. k=64 ⇒ guarantee floor n/65 ≈ 76.9 < 99, so BOTH
    // boundary words are guaranteed sketch candidates — the exact
    // recount, not sketch noise, must make the keep/cut call.
    val words = (Seq.fill(100)("hot") ++ Seq.fill(99)("warm") ++
      (1 to 4801).map(i => s"tail_$i")).toDF("word").repartition(8)
    val out = TextOps.heavyWordsOf(words)
      .as[(String, Long, Long)].collect()
    assert(out.forall(_._3 == 5000L))
    val kept = out.map(r => r._1 -> r._2).toMap
    assert(kept.get("hot").contains(100L), s"hot must survive at 2%: $kept")
    assert(!kept.contains("warm"), s"warm (1.98%) must be cut: $kept")
  }

  // ------------------------------------------------- round-6 operators

  test("fuzzy join: deletion-key blocking recall == exhaustive cross join") {
    val cust = graft.Tables.customer(spark, sf).select(col("c_name"))
    // ground truth the expensive way (fine at sf0.001's 150 names)
    val exhaustive = cust.withColumnRenamed("c_name", "name_a")
      .crossJoin(cust.withColumnRenamed("c_name", "name_b"))
      .where(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 1)
      .as[(String, String)].collect().toSet
    val got = TextOps.fuzzyJoin(spark, sf).as[(String, String)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs in output")
    assert(got.toSet == exhaustive)
    // the fixture must actually exercise the match path
    assert(exhaustive.size > 100, s"only ${exhaustive.size} near pairs")
  }

  test("del1Keys: the string itself plus each delete-one variant") {
    val keys = Seq("abc").toDF("s")
      .select(TextOps.del1Keys(col("s")).as("k")).as[Seq[String]].head
    assert(keys.toSet == Set("abc", "bc", "ac", "ab"))
  }

  test("chunk overlap: stride starts, exact chunk sizes, full coverage") {
    val W = 24; val S = 16
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val out = TextOps.chunkOverlap(spark, sf)
    val byDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("chunks"), max("chunk_idx").as("last"))
      .join(docs, "doc_id")
      .as[(Long, Long, Int, Int)].collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, chunks, last, n) =>
      val expected = 1 + math.ceil(math.max(0, n - W) / S.toDouble).toInt
      assert(chunks == expected && last == expected - 1, s"doc $id")
      // last chunk reaches the final token: start + W >= n
      assert(last * S + W >= n, s"doc $id tail uncovered")
    }
    // every chunk's token count is exactly min(W, n - start)
    val sizes = out.join(docs, "doc_id")
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"), col("n"))
      .as[(Long, Int, Long, Int)].collect()
    sizes.foreach { case (id, ci, nt, n) =>
      assert(nt == math.min(W, n - ci * S), s"doc $id chunk $ci")
    }
    // a single-chunk doc's hash is the md5 of its whole text — pins that
    // chunk_hash really hashes the chunk TEXT, not some join artifact
    val single = out.join(docs.filter(col("n") <= W), "doc_id")
      .join(graft.Tables.documents(spark, sf)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h")), "doc_id")
      .where(col("chunk_hash") =!= col("h")).count()
    assert(single == 0L)
  }

  test("split: rollup is complete over the fixture") {
    val docs = graft.Tables.documents(spark, sf)
    val out = TextOps.splitAssign(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == docs.count())
    assert(out.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("split: duplicate contents co-locate; fractions track 80/10/10") {
    // the fixture has no exact-duplicate texts (only chunk-level dups),
    // so co-location needs constructed copies: 3 of each content, ids
    // distinct — content-keyed assignment must put all 3 together, and
    // would NOT if the key ever reverted to doc_id
    val base = (1 to 4000).map(i => s"document body number $i with words")
    val dup = base.flatMap(t => Seq(t, t, t)).zipWithIndex
      .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      .repartition(8)
    val assigned = dup.withColumn("split", TextOps.splitCol(col("text")))
    assert(assigned.groupBy("text")
      .agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count() == 0L)
    // md5 thresholds 'cd'/'e6' ⇒ expected 205/25/26 of 256; allow ±3%
    val frac = assigned.filter(col("doc_id") % 3 === 0) // one copy each
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = 4000.0
    assert(math.abs(frac("train") / n - 205.0 / 256) < 0.03, frac.toString)
    assert(math.abs(frac("val") / n - 25.0 / 256) < 0.03, frac.toString)
    assert(math.abs(frac("test") / n - 26.0 / 256) < 0.03, frac.toString)
  }

  test("distinct sketch: persisted shard sketches merge to the same estimate") {
    val toks = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val perShard = toks.groupBy("lang", "source")
      .agg(hll_sketch_agg(col("w"), lit(12)).as("sk"))
    def estimate(sk: org.apache.spark.sql.DataFrame): Map[String, Long] =
      sk.groupBy("lang")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .as[(String, Long)].collect().toMap
    val direct = estimate(perShard)
    // the 100 TB contract: sketches survive a parquet round-trip (binary
    // column) and merge WITHOUT rescanning the token stream
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    perShard.write.mode("overwrite").parquet(dir)
    val roundTrip = estimate(spark.read.parquet(dir))
    assert(roundTrip == direct, "round-tripped sketches diverged")
    val exact = toks.groupBy("lang").agg(countDistinct("w").as("x"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (lang, x) =>
      assert(math.abs(direct(lang) - x) * 20 <= x,
        s"$lang: est=${direct(lang)} exact=$x beyond 5%")
    }
  }

  test("sharedSpans: every reported span is a true verbatim match and maximal") {
    val texts = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ") }.toMap
    val spans = TextOps.sharedSpans(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.nonEmpty, "corpus should contain at least one 4-word span")
    spans.foreach { case (ia, ib, pa, pb, len) =>
      val a = texts(ia).slice(pa.toInt - 1, pa.toInt - 1 + len.toInt)
      val b = texts(ib).slice(pb.toInt - 1, pb.toInt - 1 + len.toInt)
      assert(a.sameElements(b), s"span ($ia,$ib,$pa,$pb,$len) is not verbatim")
      assert(len >= 4)
      // maximality: extending one word on either side must break the match
      val leftA = if (pa >= 2) texts(ia).lift(pa.toInt - 2) else None
      val leftB = if (pb >= 2) texts(ib).lift(pb.toInt - 2) else None
      assert(leftA.isEmpty || leftB.isEmpty || leftA != leftB,
        s"span ($ia,$ib,$pa,$pb) extends left")
      val rightA = texts(ia).lift(pa.toInt - 1 + len.toInt)
      val rightB = texts(ib).lift(pb.toInt - 1 + len.toInt)
      assert(rightA.isEmpty || rightB.isEmpty || rightA != rightB,
        s"span ($ia,$ib,$pa,$pb) extends right")
    }
  }

  test("PMI: a planted collocation outranks pairs of independent words") {
    // 'neural network' always adjacent (never apart); filler words vary.
    // PMI must rank the planted pair above any filler-filler pair.
    val docs = (1 to 20).map { i =>
      val filler = (1 to 8).map(j => s"w${(i * 3 + j) % 7}").mkString(" ")
      (i.toLong, s"neural network $filler neural network $filler")
    }.toDF("doc_id", "text")
    val out = TextOps.cooccurPmiOf(docs)
      .select("w1", "w2", "pmi").as[(String, String, Double)].collect()
    val planted = out.find(r => Set(r._1, r._2) == Set("neural", "network"))
    assert(planted.isDefined, s"planted pair missing from top-20: ${out.toSeq}")
    val fillers = out.filter(r => r._1.startsWith("w") && r._2.startsWith("w"))
    fillers.foreach { f =>
      assert(planted.get._3 > f._3,
        s"collocation pmi ${planted.get._3} not above filler $f")
    }
  }

  test("boilerplate: repeats removed per-source, cross-source immune, all-boiler doc dropped") {
    val boiler = (1 to 10).map(i => s"nav$i").mkString(" ") // one exact chunk
    val uniq = (1 to 10).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", s"$boiler $uniq"),              // boiler + unique
      (2L, "srcA", s"$boiler ${uniq.toUpperCase}"), // boiler + other unique
      (3L, "srcB", s"$boiler $uniq"),               // same chunk, OTHER source
      (4L, "srcA", boiler)                          // pure boilerplate
    ).toDF("doc_id", "source", "text")
    val out = TextOps.boilerplateOf(docs)
      .select("doc_id", "n_chunks", "n_removed")
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    // srcA: chunk appears in docs 1,2,4 → removed from all three
    assert(out(1L) == (2L, 1L))
    assert(out(2L) == (2L, 1L))
    // srcB never repeats the chunk within ITS source → untouched
    assert(out(3L) == (2L, 0L))
    // doc 4 reduced to nothing → dropped like the oracle's HAVING
    assert(!out.contains(4L))
  }

  test("gopher rules: each rule fails in isolation; attribution names it") {
    // 60 varied 4-char words incl. 2 stopwords — passes everything
    def body(n: Int) = (1 to n).map(i => f"w$i%03d").mkString(" ")
    val docs = Seq(
      (1L, s"the a ${body(58)}"),                       // pass
      (2L, s"the a ${body(8)}"),                        // <50 words
      (3L, s"the a ${ // 58 DISTINCT 2-char words: mean len < 3, topword ok
        (for (a <- 'a' to 'h'; b <- 'a' to 'h') yield s"$a$b").take(58).mkString(" ")}"),
      (4L, body(60)),                                   // no stopwords
      (5L, s"the a ${body(43)} ${(1 to 15).map(_ => "zzzz").mkString(" ")}")
    ).toDF("doc_id", "text")                            // topword 15/60 = 0.25
    val out = TextOps.gopherOf(docs)
      .select("doc_id", "failed", "keep")
      .as[(Long, String, Boolean)].collect()
      .map { case (k, f, p) => k -> (f, p) }.toMap
    assert(out(1L) == ("", true))
    assert(out(2L) == ("words", false))
    assert(out(3L) == ("wordlen", false))
    assert(out(4L) == ("stop", false))
    assert(out(5L) == ("topword", false))
  }

  test("bpe corpus stats: conservation invariants against raw corpus totals") {
    val out = TextOps.bpeCorpusStats(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // per-language totals must reconcile exactly with the raw corpus:
    // chars = sum of word lengths, and BPE tokens are bracketed by
    // [words, chars] (a merge only ever shrinks a word's token count
    // from chars toward 1, never below 1 per word)
    val raw = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("lang")
      .agg(count(lit(1)).as("w"), sum(length(col("word"))).as("c"))
      .as[(String, Long, Long)].collect()
      .map { case (l, w, c) => l -> (w, c) }.toMap
    out.foreach { case (lang, nWords, nTok, nChars) =>
      val (w, c) = raw(lang)
      assert(nWords == w, s"$lang words $nWords != $w")
      assert(nChars == c, s"$lang chars $nChars != $c")
      assert(nTok >= nWords && nTok <= nChars,
        s"$lang tokens $nTok outside [$nWords, $nChars]")
    }
    // 12 merges on real text must actually compress something
    assert(out.map(_._3).sum < out.map(_._4).sum, "no compression at all")
  }

  test("curriculum: NULL-text docs are excluded by policy, not silently phase-0") {
    // curriculum reads documents.parquet from a dir — stage a corpus
    // with one unscoreable (NULL text) doc among 40 scoreable ones
    val dir = java.nio.file.Files.createTempDirectory("graft_curr").toString
    val docs = (1 to 40).map { i =>
      (i.toLong, (1 to 20).map(j => s"w${(i * j) % 13}").mkString(" "),
        "en", "syn", 100L)
    } :+ ((41L, null: String, "en", "syn", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val phases = TextOps.curriculum(spark, dir)
      .select("phase", "n_docs").as[(Int, Long)].collect().toMap
    // the 40 scoreable docs split 4-way; the NULL doc is in NO phase
    assert(phases.values.sum == 40L,
      s"expected 40 ranked docs (NULL excluded), got ${phases.values.sum}")
    assert(phases.keySet == Set(1, 2, 3, 4))
  }
}
