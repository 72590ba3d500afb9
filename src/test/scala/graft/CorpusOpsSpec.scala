package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, SetOps}
import graft.text.CorpusStats

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
    rows.toDF("doc_id", "text")

  test("bm25 matches the hand-computed Okapi scores and ranking") {
    // N=3, avgdl=3; both query terms have df=2 → idf = ln(1.6)
    val d = docs((1L, "a a b"), (2L, "a c"), (3L, "c c c c"))
    val got = CorpusStats.bm25(d, queryTerms = Seq("a", "c"), k = 10)
      .as[(Long, Double, Int)].collect().toSeq
    val idf = math.log(1.6)
    def term(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Seq(
      (2L, r4(term(1, 2) + term(1, 2)), 1), // both terms, short doc
      (3L, r4(term(4, 4)), 2),
      (1L, r4(term(2, 3)), 3))
    assert(got == expect)
  }

  test("scrub redacts urls, emails, and long digit runs, in that order") {
    val d = docs(
      (1L, "see https://ex.com/a?b=1 or mail bob@ex.com code 1234567 end"),
      (2L, "clean text stays untouched"))
    val got = CorpusStats.scrub(d).orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got(0)._2 == "see <URL> or mail <EMAIL> code <NUM> end")
    assert((got(0)._3, got(0)._4, got(0)._5) == (1L, 1L, 1L))
    assert(got(1)._2 == "clean text stays untouched")
    assert((got(1)._3, got(1)._4, got(1)._5) == (0L, 0L, 0L))
  }

  test("scrub counts an email inside a url as url only") {
    val d = docs((1L, "x https://ex.com/u?e=a@b.co y"))
    val r = CorpusStats.scrub(d).as[(Long, String, Long, Long, Long)].head()
    assert(r._2 == "x <URL> y")
    assert(r._3 == 1L) // the url
  }

  test("pii scrub masks emails, ipv4, and separator-form phones with the Dolma sentinels") {
    val d = docs(
      (1L, "mail bob@ex.com from 10.0.0.1 or call (555) 123-4567 now"),
      (2L, "dial 555-123-4567 or 555.123.4567 or 555 123 4567"),
      (3L, "v999.999.999.999 is no address and 5551234567 no phone"),
      (4L, "clean text stays untouched"))
    val got = CorpusStats.piiScrub(d).orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got(0)._2 == "mail |||EMAIL_ADDRESS||| from |||IP_ADDRESS|||" +
      " or call |||PHONE_NUMBER||| now", got(0)._2)
    assert((got(0)._3, got(0)._4, got(0)._5) == (1L, 1L, 1L))
    // all three separator forms count; a bare 10-digit run does not
    assert(got(1)._5 == 3L && got(1)._2 ==
      "dial |||PHONE_NUMBER||| or |||PHONE_NUMBER||| or |||PHONE_NUMBER|||",
      got(1))
    assert((got(2)._3, got(2)._4, got(2)._5) == (0L, 0L, 0L), got(2))
    assert(got(3)._2 == "clean text stays untouched" &&
      (got(3)._3, got(3)._4, got(3)._5) == (0L, 0L, 0L))
  }

  test("pii scrub: overlapping PII counts per class over the ORIGINAL text but masks sequentially (documented divergence)") {
    // an email whose domain embeds a dotted-quad: the email pass masks
    // the whole address, so the IP pass finds nothing to mask — yet
    // n_ips counts the quad (counts are per-class over the original
    // text, independently; piiScrub's scaladoc documents exactly this).
    // Pinned so a refactor can't silently change either side.
    val d = docs((1L, "ping bob@10.0.0.1.example.com now"))
    val r = CorpusStats.piiScrub(d).as[(Long, String, Long, Long, Long)]
      .head()
    assert(r._2 == "ping |||EMAIL_ADDRESS||| now", r._2) // no IP mask
    assert((r._3, r._4, r._5) == ((1L, 1L, 0L)), r)      // but n_ips = 1
  }

  test("repetition: integer per-mille of non-distinct tokens") {
    val d = docs((1L, "a a a b"), (2L, "x y z"))
    val got = CorpusStats.repetition(d).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(got(0) == ((1L, 4L, 2L, 500L))) // 1000 - 2*1000/4
    assert(got(1) == ((2L, 3L, 3L, 0L)))
  }

  test("doc frequency and tf-idf rank the distinctive token first") {
    val d = docs((1L, "cat cat dog"), (2L, "dog bird"), (3L, "dog"))
    val dfreq = CorpusStats.docFreq(d).as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(dfreq("dog") == ((3L, 3L)))
    assert(dfreq("cat") == ((1L, 2L)))
    assert(dfreq("bird") == ((1L, 1L)))
    val top = CorpusStats.tfidfTop(d, k = 1)
      .as[(Long, String, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    // doc 1: cat tf=2 df=1 → 2e6 beats dog 1e6/3
    assert(top(1L) == "cat")
    assert(top(2L) == "bird")
    assert(top(3L) == "dog") // only token
  }

  test("stratified hash sample caps per stratum and is deterministic") {
    val d = (1L to 100L).map(i => (i, if (i <= 80) "en" else "de", s"t$i"))
      .toDF("doc_id", "lang", "text")
    val s1 = Sampling.stratifiedByHash(d, cap = 10)
    val rows = s1.as[(String, Long, Int)].collect()
    val byLang = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byLang("en") == 10)
    assert(byLang("de") == 10) // only 20 de docs, 10 kept
    val s2 = Sampling.stratifiedByHash(d, cap = 10).as[(String, Long, Int)].collect()
    assert(rows.sortBy(r => (r._1, r._3)).toSeq == s2.sortBy(r => (r._1, r._3)).toSeq)
    // different seed → different subset (overwhelmingly likely)
    val s3 = Sampling.stratifiedByHash(d, cap = 10, seed = 8)
      .as[(String, Long, Int)].collect()
    assert(s3.map(_._2).toSet != rows.map(_._2).toSet)
  }

  test("weighted sample is length-biased, capped, deterministic") {
    val d = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", (if (i <= 4) 0L else i)))
      .toDF("doc_id", "lang", "n_chars")
    val s1 = Sampling.weightedSample(d, cap = 20)
      .as[(String, Long, Long, Int)].collect()
    assert(s1.groupBy(_._1).view.mapValues(_.length).toMap
      == Map("en" -> 20, "de" -> 20))
    // bit-reproducible: the file's invariant
    val s2 = Sampling.weightedSample(d, cap = 20)
      .as[(String, Long, Long, Int)].collect()
    assert(s1.sortBy(r => (r._1, r._4)).toSeq == s2.sortBy(r => (r._1, r._4)).toSeq)
    // length bias: sampled docs average materially longer than the corpus
    val sampledMean = s1.map(_._2).map(i => if (i <= 4) 0L else i).sum.toDouble / s1.length
    val corpusMean = (1L to 200L).map(i => if (i <= 4) 0L else i).sum.toDouble / 200
    assert(sampledMean > corpusMean * 1.2,
      s"no weight bias: sampled mean $sampledMean vs corpus $corpusMean")
    // zero-weight docs are floored to w=1, not divided by zero
    assert(s1.forall(_._3 >= 0L))
  }

  test("temperature mixture flattens the stratum ratio to its sqrt") {
    val d = ((1L to 160L).map(i => (i, "en")) ++
      (161L to 200L).map(i => (i, "de"))).toDF("doc_id", "lang")
    val kept = Sampling.temperatureMixture(d)
      .as[(String, Long, Long, Long)].collect()
    val byLang = kept.groupBy(_._1).view.mapValues(_.length).toMap
    // hand-computed: isqrt weights 12/6 → ppm 666666/333333 → fill
    // t = min(240, 120) = 120 → keep 79 en, 39 de: corpus ratio 4
    // flattened to ≈ 2 (the sqrt), small stratum nearly whole
    assert(byLang == Map("en" -> 79, "de" -> 39))
    assert(kept.forall(r => r._3 <= r._4)) // rk never exceeds keep_n
  }

  test("set ops: except on user-days, intersect on user sets") {
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val d0 = ts("2024-01-01T10:00:00Z"); val d1 = ts("2024-01-02T10:00:00Z")
    val day0 = 19723L; val day1 = 19724L // epoch days of d0/d1
    val ev = Seq(
      (1L, "view", d0), (1L, "purchase", d0), // same-day purchase → excluded
      (1L, "view", d1),                       // next day: view only
      (2L, "view", d0), (2L, "view", d0),
      (3L, "purchase", d0),
      (4L, "view", d0),
    ).toDF("user_id", "event_type", "ts")
    val viewOnly = SetOps.viewersWhoNeverPurchased(ev)
      .as[(Long, Long)].collect().sorted
    assert(viewOnly.toSeq == Seq((1L, day1), (2L, day0), (4L, day0)))
    val both = SetOps.viewersWhoAlsoPurchased(ev).as[Long].collect().sorted
    assert(both.toSeq == Seq(1L))
  }

  test("importance weights rank target-like docs above off-domain docs") {
    // target = doc_ids < 2, all about zebras; docs 10/11 match the
    // target vocabulary, doc 12 is entirely off-domain. DSIR intent:
    // target-like docs must outscore off-domain ones (per-token, to
    // control for length).
    val docs = Seq(
      (0L, "zebra stripes zebra savanna zebra"),
      (1L, "zebra herd savanna stripes"),
      (10L, "zebra savanna stripes herd"),
      (11L, "stripes zebra zebra"),
      (12L, "quantum flux capacitor oscillates wildly today"),
    ).toDF("doc_id", "text")
    val got = CorpusStats.importanceWeights(docs, targetMaxId = 2, buckets = 16)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> s.toDouble / n }.toMap
    assert(got.keySet == Set(0L, 1L, 10L, 11L, 12L))
    assert(got(10L) > got(12L) && got(11L) > got(12L),
      s"target-vocabulary docs must outscore off-domain: $got")
  }

  test("nb quality model: learned log-odds separate the classes and are bit-deterministic") {
    val body = "the cat and the dog walked over a bridge and the sun rose " * 4
    val d = docs(
      (1L, body + "river"), (2L, body + "meadow"), (3L, body + "valley"),
      (10L, "zzz qqq www eee rrr flux"),
      (11L, "zzz qqq www rrr capacitor flux"),
      (12L, "qqq www eee capacitor zzz"),
      (13L, "   ")) // token-less doc must still get a verdict row
    val got = graft.text.QualityModel.nbQuality(d)
      .select("doc_id", "heur_pos", "nb_score_micro", "nb_pos")
      .as[(Long, Int, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L, 13L),
      "one verdict per input doc, including whitespace-only")
    // the empty doc scores the bare prior (comparable to scoreWith's
    // out-of-vocabulary case), never silently vanishes; its heuristic
    // label is neg (length 0 + punct 300 + stopword 0 = 300 < 600)
    assert(got(13L)._2 == 0, s"empty-doc heuristic label: ${got(13L)}")
    // the heuristic gate labels as constructed (stopword-rich long
    // prose pos, junk tokens neg)...
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 == 1) &&
      Seq(10L, 11L, 12L).forall(got(_)._2 == 0), s"labels: $got")
    // ...and the learned scorer separates the two vocabularies with a
    // real margin, agreeing with its own training labels on this
    // cleanly-separable corpus
    val posMin = Seq(1L, 2L, 3L).map(got(_)._3).min
    val negMax = Seq(10L, 11L, 12L).map(got(_)._3).max
    assert(posMin > 0 && negMax < 0 && posMin > negMax,
      s"class separation lost: posMin=$posMin negMax=$negMax")
    assert(Seq(1L, 2L, 3L).forall(got(_)._4 == 1) &&
      Seq(10L, 11L, 12L).forall(got(_)._4 == 0))
    // integer micro-nat arithmetic -> bit-identical rerun
    val rerun = graft.text.QualityModel.nbQuality(d)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
    assert(got.forall { case (id, r) => rerun(id) == r._3 },
      "nb_score must be bit-deterministic")
  }

  test("streamed NB model (monoid count deltas) is bit-equal to batch training") {
    val body = "the cat and the dog walked over a bridge and the sun rose " * 4
    val shard0 = docs((1L, body + "river"), (10L, "zzz qqq www eee flux"))
    val shard1 = docs((2L, body + "meadow"), (11L, "qqq www capacitor zzz"))
    val union = shard0.unionByName(shard1)
    val dir = java.nio.file.Files.createTempDirectory("qualrefresh").toString
    graft.streaming.QualityRefresh.writeCountsDelta(
      shard0, 0L, s"$dir/counts", s"$dir/dstats")
    graft.streaming.QualityRefresh.writeCountsDelta(
      shard1, 1L, s"$dir/counts", s"$dir/dstats")
    val (w, prior) = graft.streaming.QualityRefresh.modelState(
      spark, s"$dir/counts", s"$dir/dstats")
    val streamed = graft.text.QualityModel.scoreWith(union, w, prior)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
    val batch = graft.text.QualityModel.nbQuality(union)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
    assert(streamed == batch,
      s"streamed model diverged from batch: $streamed vs $batch")
    // crash-replay of the last delta is a no-op (partition overwrite)
    graft.streaming.QualityRefresh.writeCountsDelta(
      shard1, 1L, s"$dir/counts", s"$dir/dstats")
    val (w2, prior2) = graft.streaming.QualityRefresh.modelState(
      spark, s"$dir/counts", s"$dir/dstats")
    assert(prior2 == prior)
    assert(graft.text.QualityModel.scoreWith(union, w2, prior2)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
      == batch, "replayed delta changed the model")
    // count compaction is a lossless monoid fold: the model trained
    // from the compacted store is bit-equal, and re-running the
    // compaction (the crash-recovery instruction) changes nothing
    graft.streaming.QualityRefresh.compactCounts(
      spark, s"$dir/counts", s"$dir/dstats", upToBatch = 2L)
    graft.streaming.QualityRefresh.compactCounts(
      spark, s"$dir/counts", s"$dir/dstats", upToBatch = 2L)
    val (w3, prior3) = graft.streaming.QualityRefresh.modelState(
      spark, s"$dir/counts", s"$dir/dstats")
    assert(prior3 == prior)
    assert(graft.text.QualityModel.scoreWith(union, w3, prior3)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
      == batch, "compaction changed the model")
    // CRASH WINDOW: a new delta lands, then the fold write completes
    // but the crash hits before the source partitions are deleted —
    // the folded_hi watermark must make every read ignore the stale
    // (already-summed) delta, or the sums double-count
    val shard2 = docs((3L, body + "valley"), (12L, "www eee zzz resistor"))
    val union3 = union.unionByName(shard2)
    graft.streaming.QualityRefresh.writeCountsDelta(
      shard2, 2L, s"$dir/counts", s"$dir/dstats")
    graft.streaming.QualityRefresh.foldCounts(
      spark, s"$dir/counts", s"$dir/dstats", upToBatch = 3L)
    // stale delta partition 2 is still on disk next to the new fold
    assert(new java.io.File(s"$dir/counts/batch_id=2").exists,
      "crash window not reproduced: delta partition already gone")
    val batch3 = graft.text.QualityModel.nbQuality(union3)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
    val (w4, prior4) = graft.streaming.QualityRefresh.modelState(
      spark, s"$dir/counts", s"$dir/dstats")
    assert(graft.text.QualityModel.scoreWith(union3, w4, prior4)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
      == batch3, "crash-window read double-counted the folded delta")
    // a REGRESSED fold request (upToBatch below the current folded_hi,
    // stale delta still on disk) must not rewind the watermark — a
    // rewind would re-admit the already-folded delta into every read
    graft.streaming.QualityRefresh.foldCounts(
      spark, s"$dir/counts", s"$dir/dstats", upToBatch = 1L)
    val (w4b, prior4b) = graft.streaming.QualityRefresh.modelState(
      spark, s"$dir/counts", s"$dir/dstats")
    assert(prior4b == prior4)
    assert(graft.text.QualityModel.scoreWith(union3, w4b, prior4b)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
      == batch3, "regressed-watermark fold re-admitted the folded delta")
    // the prescribed recovery — re-running compaction — must be
    // idempotent, not compound the duplication
    graft.streaming.QualityRefresh.compactCounts(
      spark, s"$dir/counts", s"$dir/dstats", upToBatch = 3L)
    assert(!new java.io.File(s"$dir/counts/batch_id=2").exists)
    val (w5, prior5) = graft.streaming.QualityRefresh.modelState(
      spark, s"$dir/counts", s"$dir/dstats")
    assert(prior5 == prior4)
    assert(graft.text.QualityModel.scoreWith(union3, w5, prior5)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
      == batch3, "re-running compaction after the crash changed the model")
  }

  test("repetition signals: hand-computed Gopher rule values") {
    val clean = (0 until 60).map(i => f"w$i%02d").mkString(" ")
    val d = docs(
      (1L, "aa bb aa bb aa"),              // dominated by one 2-gram
      (2L, "one two three four five six"), // no repetition, short
      (3L, clean),                         // no repetition, long
      (4L, "solo"),                        // 1 word: no n-gram of any n
      (5L, ""),                            // empty text: zero words
      (6L, "x y\nx y\nzz\n\nppp\n\nppp"))  // duplicate lines + paragraphs
    val cols = Seq("doc_id", "n_words", "top2_ppm", "top3_ppm",
      "top4_ppm") ++ (5 to 10).map(n => s"dup${n}_ppm") ++
      Seq("dup_line_ppm", "dup_para_ppm",
        "dup_line_frac_ppm", "dup_para_frac_ppm", "gopher_pass")
    val got = graft.text.Repetition.repetitionSignals(d)
      .select(cols.head, cols.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (r.toSeq.dropRight(1), r.getInt(15)))
      .toMap
    def row(vals: Long*)(pass: Int) = (vals.toSeq, pass)
    // doc 1 (c=14): top2 "aa bb"x2 ties "bb aa" -> lexicographic wins,
    // 2*5 chars = 714285 ppm; top3 "aa bb aa"x2 = 16 chars -> capped;
    // top4 cnt-1 11 chars; no duplicate n-gram of any n (the single
    // 5-gram is unique; 6..10 produce none); one line, one paragraph
    assert(got(1L) == row(1L, 5L, 714285L, 1000000L, 785714L,
      0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)(0), s"doc1: ${got(1L)}")
    // doc 2 (c=27): every gram unique, top = lexicographically first
    // ("five six" / "four five six" / "one two three four")
    assert(got(2L) == row(2L, 6L, 296296L, 481481L, 666666L,
      0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)(0), s"doc2: ${got(2L)}")
    // doc 3: 60 distinct words -> every fraction tiny, passes Gopher
    assert(got(3L)._2 == 1 &&
      got(3L)._1(2).asInstanceOf[Long] < 200000L, s"doc3: ${got(3L)}")
    // docs shorter than any n (1 word / empty) must report zeros, not
    // crash (sequence(1, 0) is descending in Spark) and not vanish
    assert(got(4L) == row(4L, 1L, 0L, 0L, 0L,
      0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)(1), s"doc4: ${got(4L)}")
    assert(got(5L) == row(5L, 0L, 0L, 0L, 0L,
      0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)(1), s"doc5: ${got(5L)}")
    // doc 6 (c=20, words x y x y zz ppp ppp): dup lines "x y"x2 +
    // "ppp"x2 = 12 chars -> 600000, 4 of 5 line occurrences -> 800000;
    // dup paragraphs "ppp"x2 = 6 chars -> 300000, 2 of 3 -> 666666;
    // top2 "x y"x2 = 6 chars -> 300000; top3/top4 all-unique
    // lexicographic firsts "x y x" (5) / "x y x y" (7); every word
    // n-gram n>=5 unique (zz/ppp positions differ), 8..10 produce none
    assert(got(6L) == row(6L, 7L, 300000L, 250000L, 350000L,
      0L, 0L, 0L, 0L, 0L, 0L, 600000L, 300000L, 800000L, 666666L)(0),
      s"doc6: ${got(6L)}")
  }

  test("repetition signals: narrow run-length form equals the exploded relational form; executed plan has zero Exchange and zero Generate") {
    import graft.text.Repetition
    // varied corpus: heavy repeats, duplicate lines/paragraphs, empty
    // and one-word docs, long clean text, modular token collisions
    val rows = (0L until 300L).map { i =>
      val body = (i % 7) match {
        case 0 => "spam ham spam ham spam ham spam ham spam"
        case 1 => (0 until 40)
          .map(j => s"w${(i * 31 + j * 17) % 23}").mkString(" ")
        case 2 => s"line a $i\nline a $i\nline b\n\npara\n\npara"
        case 3 => ""
        case 4 => "solo"
        case 5 => ("the quick brown fox jumps over the lazy dog " * 3) + i
        case _ => (0 until 80).map(j => s"t${(i + j) % 11}").mkString(" ")
      }
      (i, body)
    }
    // parquet round-trip so ConvertToLocalRelation can't fold the plan
    val work = java.nio.file.Files.createTempDirectory("repnarrow").toString
    rows.toDF("doc_id", "text").write.parquet(s"$work/d")
    val d = spark.read.parquet(s"$work/d")
    val narrow = Repetition.repetitionSignals(d)
    val exploded = Repetition.signalsFromBaseExploded(
      Repetition.positionalBase(d).localCheckpoint())
    assert(narrow.columns.toSeq == exploded.columns.toSeq)
    val (ns, es) = (narrow.collect().toSet, exploded.collect().toSet)
    assert(ns == es, s"narrow/exploded diverge: ${(ns -- es).take(3)} vs " +
      s"${(es -- ns).take(3)}")
    // …and the r13 HOF fold (the native expression's equality twin):
    // same sort order, tie-break, char lengths, empty/short-doc zeros
    val hof = Repetition.signalsFromBaseHof(
      Repetition.positionalBase(d).localCheckpoint()).collect().toSet
    // public-API null contract (r16, ADVICE r15): null ELEMENTS are
    // dropped from counts AND act as a run break for n >= 2 — no gram
    // may span the gap where a null sat (pre-r16 compaction fabricated
    // a phantom 'a a' bigram here). In-repo producers never emit null
    // elements, but the expressions are exposed through TextFunctions.
    locally {
      import graft.functions.TextFunctions.{gram_run_stats, token_tfs}
      val withNulls = spark.sql(
        "SELECT array('a', CAST(NULL AS STRING), 'a', 'b') AS ws")
      val got = withNulls.select(gram_run_stats(col("ws"), 1).as("s"),
          gram_run_stats(col("ws"), 2).as("s2"))
        .selectExpr("s.top_cov", "s.tot_cnt", "s2.tot_cnt").collect()(0)
      // nulls dropped: 3 unigrams (run 'a a' top); bigrams only within
      // the null-free runs ['a'] and ['a','b'] → just 'a b'
      assert(got.getLong(0) == 2L && got.getLong(1) == 3L &&
        got.getLong(2) == 1L, s"null-element contract broken: $got")
      // content assertion: the surviving bigram is 'a b' — the
      // cross-gap 'a a' must NOT exist
      val pairs = withNulls
        .select(explode(token_tfs(col("ws"), 2)).as("p"))
        .selectExpr("p.token", "p.tf")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(pairs == Set(("a b", 1L)),
        s"n=2 grams must not span a dropped null: $pairs")
      // trailing/leading nulls and an all-null array stay well-defined
      val edge = spark.sql("SELECT array(CAST(NULL AS STRING), 'x', 'y', " +
          "CAST(NULL AS STRING)) AS ws")
        .select(explode(token_tfs(col("ws"), 2)).as("p"))
        .selectExpr("p.token", "p.tf")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(edge == Set(("x y", 1L)), s"edge-null grams wrong: $edge")
      val allNull = spark.sql(
          "SELECT array(CAST(NULL AS STRING), CAST(NULL AS STRING)) AS ws")
        .select(gram_run_stats(col("ws"), 2).as("s"))
        .selectExpr("s.tot_cnt").collect()(0).getLong(0)
      assert(allNull == 0L, s"all-null array must yield zero grams: $allNull")
      // misuse is an analysis-time error, not a runtime ClassCast
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT 1 AS x")
          .select(gram_run_stats(col("x"), 1)).collect()
      }
    }
    assert(hof == ns, s"native/HOF diverge: ${(ns -- hof).take(3)} vs " +
      s"${(hof -- ns).take(3)}")
    // the UNPINNED batch entry point stays single-evaluation: ws is
    // referenced by every rule family, but CollapseProject keeps the
    // non-cheap multiply-referenced regex in its own Project — exactly
    // ONE regexp_extract_all in the executed plan (the r13 tf narrow
    // probe's lambda-inlining trap, asserted never to return)
    // count on the final plan only: if positionalBase's width gate
    // fires (parquet packs into fewer partitions than cores on some
    // hosts), AQE prints both '== Final Plan ==' and '== Initial
    // Plan ==' sections and the raw string would count the regex twice
    val nRegex = "regexp_extract_all".r
      .findAllIn(narrow.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head).size
    assert(nRegex == 1,
      s"unpinned narrow plan evaluates the regex $nRegex times")
    // the narrow FOLD is a pure projection: over a pinned positional
    // frame the EXECUTED plan moves no data (no Exchange) and explodes
    // nothing (no Generate). (positionalBase itself may carry one
    // round-robin Exchange when its upward-only width gate fires —
    // asserted separately below.)
    val df = Repetition.signalsFromBase(
      Repetition.positionalBase(d).localCheckpoint())
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"narrow repetition plan not narrow:\n$plan")
    // width guarantee, GATED (r14): a NARROW input (fewer partitions
    // than cores) comes out of positionalBase at full parallelism —
    // the fold has no Exchange of its own to spread it (repdiag4) —
    val skewed = d.coalesce(1)
    val pb = Repetition.positionalBase(skewed)
    val widths = pb.rdd
      .mapPartitions(it => Iterator(if (it.hasNext) 1 else 0))
      .collect()
    assert(widths.sum > 1, s"positionalBase kept the input skew: " +
      s"${widths.sum} non-empty of ${widths.length} partitions")
    // — but an ALREADY-WIDE input is left untouched (no coalesce to
    // #cores, no full-text shuffle: at 100 TB that would replace
    // size-bounded file splits with corpus/cores tasks), and the
    // micro-batch path's forceSpread knob still widens it on request
    // (the 4/32-non-empty shard skew the count gate can't see).
    val par = spark.sparkContext.defaultParallelism
    val alreadyWide = d.repartition(par * 2)
    assert(Repetition.positionalBase(alreadyWide).rdd.getNumPartitions
      == par * 2, "positionalBase re-shuffled an already-wide input")
    assert(Repetition.positionalBase(alreadyWide, forceSpread = true)
      .rdd.getNumPartitions == par,
      "forceSpread did not apply the width guarantee")
  }

  test("gopher quality signals: hand-computed Table A1 left-column values") {
    // 16 words, 49 chars of words, repeated x4: 64 words, wlen_cpm
    // floor(19600/64) = 306, six stop words, all-alpha, no symbols
    val good = "the cat and the dog ran to the mill that day to have fun with it " * 4
    val d = docs(
      (1L, ""),                        // empty: fails the word floor
      (2L, "# # # the be"),            // hash ratio 3/5, wlen 160
      (3L, "one...\ntwo...\nthree"),   // ellipsis lines 2/3, words 2/3
      (4L, "- a\n- b\n* c"),           // all-bullet lines, half alpha
      (5L, good),                      // passes every rule
      (6L, "hmm… yes…\nokay"))         // typographic U+2026 counts too
    val cols = Seq("doc_id", "n_words", "wlen_cpm", "hash_word_ppm",
      "ellipsis_word_ppm", "bullet_line_ppm", "ellipsis_line_ppm",
      "alpha_word_ppm", "n_stop_hits", "gopher_quality_pass")
    val got = graft.text.GopherQuality.gopherQualitySignals(d)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0)),
      s"empty: ${got(1L)}")
    // '#' is not a bullet; words {#,#,#,the,be}: 8 chars, 2 alpha, 2 stops
    assert(got(2L) == ((2L, 5L, 160L, 600000L, 0L, 0L, 0L, 400000L, 2L, 0)),
      s"hash: ${got(2L)}")
    assert(got(3L) == ((3L, 3L, 566L, 0L, 666666L, 0L, 666666L,
      1000000L, 0L, 0)), s"ellipsis: ${got(3L)}")
    assert(got(4L) == ((4L, 6L, 100L, 0L, 0L, 1000000L, 0L, 500000L,
      0L, 0)), s"bullets: ${got(4L)}")
    assert(got(5L)._10 == 1 && got(5L)._2 == 64L && got(5L)._3 == 306L &&
      got(5L)._9 == 6L, s"good: ${got(5L)}")
    // U+2026 ellipses (ADVICE r12): 2 of 3 words carry '…' -> 666666;
    // the first of 2 lines ends in '…' -> 500000; 12 word chars / 3
    assert(got(6L) == ((6L, 3L, 400L, 0L, 666666L, 0L, 500000L,
      1000000L, 0L, 0)), s"unicode ellipsis: ${got(6L)}")
  }

  test("lang confusion diagonal dominates on marker-bearing docs") {
    val d = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "el gato que la casa", "es"),
      (3L, "der hund und die katze", "de"),
    ).toDF("doc_id", "text", "lang")
    val got = CorpusStats.langConfusion(d).as[(String, String, Long)].collect()
    assert(got.forall { case (l, p, _) => l == p })
    assert(got.map(_._3).sum == 3)
  }

  test("bigram surprisal: MLE conditionals, repeated text scores 0 bits") {
    // "a b a b a b": bigrams (a,b)x3? no - (a,b),(b,a),(a,b),(b,a),(a,b)
    // every a is followed only by b and every b only by a -> P=1 -> 0 bits
    val d = docs((1L, "a b a b a b"), (2L, "a b a c"))
    val got = CorpusStats.bigramSurprisal(d).orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    // doc1: all bigrams deterministic given corpus? corpus counts:
    // (a,b)=4 [3 from d1, 1 from d2], (b,a)=3 [2 from d1, 1 from d2],
    // (a,c)=1. left a: 5, left b: 3.
    // d1 bits: 3*(-log2(4/5)) + 2*(-log2(3/3)) over 5
    val d1 = (3.0 * -math.log(4.0 / 5.0) / math.log(2.0)) / 5.0
    assert(math.abs(got(0)._3 - BigDecimal(d1).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(0)._2 == 5L)
    // d2: (a,b): -log2(4/5); (b,a): -log2(3/3)=0; (a,c): -log2(1/5)
    val d2 = ((-math.log(4.0 / 5.0) - math.log(1.0 / 5.0)) / math.log(2.0)) / 3.0
    assert(math.abs(got(1)._3 - BigDecimal(d2).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("bigram surprisal: single-token and empty docs are excluded") {
    val d = docs((1L, "only"), (2L, ""), (3L, "a b"))
    val got = CorpusStats.bigramSurprisal(d).select("doc_id")
      .as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("tokenMixture: budgets respected, dominant stratum flattened, deterministic") {
    import org.apache.spark.sql.functions.{col, length}
    // stratum A: 16 docs × 16 words; stratum B: 4 docs × 4 words —
    // a 16:1 token imbalance the α=½ temperature should flatten to 4:1
    val rows =
      (0L until 16L).map(i => (i, "A", ((1 to 16).map(j => s"w${i}a$j")).mkString(" "))) ++
      (100L until 104L).map(i => (i, "B", ((1 to 4).map(j => s"w${i}b$j")).mkString(" ")))
    val d = rows.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = graft.operators.Sampling.tokenMixture(d)
      .select("lang", "doc_id", "tok", "cum", "budget_tok")
      .as[(String, Long, Long, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    // the prefix rule: every stratum's kept tokens fit its budget
    byLang.foreach { case (l, xs) =>
      assert(xs.map(_._3).sum <= xs.head._5, s"$l over budget")
    }
    // flattening: A's kept-token share is well under its 16/17 raw share
    val keptA = byLang("A").map(_._3).sum.toDouble
    val keptB = byLang("B").map(_._3).sum.toDouble
    assert(keptA / (keptA + keptB) < 0.9,
      s"dominant stratum not flattened: A=$keptA B=$keptB")
    assert(keptB > 0, "small stratum must keep data")
    // bit-deterministic
    val again = graft.operators.Sampling.tokenMixture(d)
      .select("lang", "doc_id", "tok", "cum", "budget_tok")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(again == out.toSet)
    // a zero-token stratum (whitespace-only docs) must not zero every
    // budget through the min-fill — it is excluded, others unaffected
    val withEmpty = (rows :+ (200L, "C", " ")).toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out2 = graft.operators.Sampling.tokenMixture(withEmpty)
      .select("lang", "doc_id", "tok", "cum", "budget_tok")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out2.toSet == out.toSet,
      s"zero-token stratum changed the sample: ${out2.toSeq}")
  }

  test("leakSafeSplit: near-dup cluster members never straddle the boundary") {
    import org.apache.spark.sql.functions.{col, length}
    val base = "the cat and the dog walked over a bridge and the sun rose " * 4
    val d = Seq(
      (1L, base + "zzz qqq 111"),   // near-dup cluster {1, 2}
      (2L, base + "zzz qqq 222"),
      (5L, "completely different prose about the sea and a ship " * 5),
      (9L, "the horse ran through the field and the moon rose high " * 4))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val rows = graft.operators.Sampling.leakSafeSplit(d)
      .select("doc_id", "root", "split")
      .as[(Long, Long, String)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    assert(rows.length == 4, "every doc gets a split")
    // the planted pair shares a root — and therefore a split
    assert(byId(1L)._2 == byId(2L)._2 && byId(1L)._2 == 1L)
    assert(byId(1L)._3 == byId(2L)._3, "cluster split leak")
    // singletons root at themselves
    assert(byId(5L)._2 == 5L && byId(9L)._2 == 9L)
    // deterministic: a second run is bit-identical
    val again = graft.operators.Sampling.leakSafeSplit(d)
      .select("doc_id", "root", "split")
      .as[(Long, Long, String)].collect().toSet
    assert(again == rows.toSet)
  }
}
