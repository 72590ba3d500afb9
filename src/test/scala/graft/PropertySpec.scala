package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.operators._

/** Property-based invariants over randomly generated event batches
  * (generator shaped like the reference's event factory,
  * tests/utils/ingestion/events.py:9-80 — FIXTURES.md §1). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 20 random batches per property (each batch runs a full Spark job). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  private val base = 1714867200000L
  private val genEvent = for {
    id <- Gen.choose(0L, 100000L)
    offset <- Gen.choose(0L, 7200000L) // 2h span
    user <- Gen.choose(1L, 50L)
    typ <- Gen.oneOf("view", "click", "purchase", "signup", "error")
    value <- Gen.choose(100.0, 3000.0)
  } yield (id, base + offset, user, typ, value)
  private val genBatch = Gen.listOfN(200, genEvent)

  private def toDF(events: List[(Long, Long, Long, String, Double)]) =
    events.toDF("event_id", "tms", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_millis($"tms"))

  test("window counts partition the filtered input exactly") {
    check(forAll(genBatch) { events =>
      val df = toDF(events)
      val total = EventAggregator.aggregate(df)
        .agg(coalesce(sum("event_count"), lit(0L))).as[Long].head()
      val expected = events.count(e =>
        EventAggregator.defaultAllowed.contains(e._4)).toLong
      total == expected
    })
  }

  test("distinct users per window never exceed event count; bounds hold") {
    check(forAll(genBatch) { events =>
      val rows = EventAggregator.aggregate(toDF(events))
        .select("event_count", "user_count").as[(Long, Long)].collect()
      rows.forall { case (n, u) => u >= 1 && u <= n }
    })
  }

  test("sessions partition page views: counts sum, gaps respected") {
    check(forAll(genBatch) { events =>
      val df = toDF(events)
      val sessions = SessionTracker.sessions(df)
        .select("user_id", "start_ms", "end_ms", "page_count")
        .as[(Long, Long, Long, Long)].collect()
      val views = events.filter(_._4 == "view")
      val countsOk = sessions.map(_._4).sum == views.size.toLong
      // sessions of the same user never overlap (end = last event + gap)
      val noOverlap = sessions.groupBy(_._1).forall { case (_, ss) =>
        ss.sortBy(_._2).sliding(2).forall {
          case Array(a, b) => a._3 <= b._2
          case _ => true
        }
      }
      countsOk && noOverlap
    })
  }

  test("p95 lies within min..max of each window's values") {
    check(forAll(genBatch) { events =>
      val df = toDF(events)
      val perf = PerformanceTracker.metrics(df)
        .select("avg_value", "p95_value").as[(Double, Double)].collect()
      val (lo, hi) = (events.map(_._5).min - 1, events.map(_._5).max + 1)
      perf.forall { case (a, p) => a >= lo && a <= hi && p >= lo && p <= hi && p >= 0 }
    })
  }

  test("lineDedup invariants: chunk accounting, word conservation, identity") {
    val genWord = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "common", "footer")
    val genDoc = Gen.choose(1, 17).flatMap(n => Gen.listOfN(n, genWord))
    val genCorpus = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, genDoc))
    check(forAll(genCorpus) { docsWords =>
      val docs = docsWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = graft.dedup.Dedup.lineDedup(docs, chunkWords = 2, minDocFrac = 0.5)
        .select($"doc_id", $"n_chunks", $"n_dropped", $"clean_text")
        .as[(Long, Long, Long, String)].collect()
      val byId = out.map(r => r._1 -> r).toMap
      docsWords.zipWithIndex.forall { case (ws, i) =>
        val (_, nChunks, nDropped, clean) = byId(i.toLong)
        val expChunks = (ws.size + 1) / 2
        val keptWords = if (clean.isEmpty) 0 else clean.split(" ").length
        // every word is either kept or inside a dropped chunk; dropped
        // chunks are 2 words except a dropped odd tail
        nChunks == expChunks && nDropped >= 0 && nDropped <= nChunks &&
          keptWords <= ws.size &&
          (keptWords + 2 * nDropped == ws.size ||
            keptWords + 2 * nDropped == ws.size + 1) &&
          // no boilerplate dropped → exact identity
          (nDropped > 0 || clean == ws.mkString(" "))
      }
    })
  }

  test("property: dedupOnRead is idempotent and replay-invariant") {
    // rows keyed (window, type) with batch ids: delivering the stream
    // twice, or deduping twice, must change nothing (consume-side
    // exactly-once over at-least-once delivery)
    val genRow = for {
      win <- Gen.choose(0L, 5L)
      typ <- Gen.oneOf("view", "click")
      cnt <- Gen.choose(1L, 100L)
      batch <- Gen.choose(0L, 4L)
    } yield (win * 60000L, typ, cnt, batch)
    check(forAll(Gen.listOfN(60, genRow)) { rows =>
      val df = rows.toDF("window_start_ms", "event_type", "event_count", "batch_id")
      def dedup(d: org.apache.spark.sql.DataFrame) =
        graft.streaming.Idempotence.dedupOnRead(
          d, keys = Seq("window_start_ms", "event_type"))
      val once = dedup(df).collect().map(_.toSeq).toSet
      val replayed = dedup(df.unionAll(df)).collect().map(_.toSeq).toSet
      val twice = dedup(dedup(df)).collect().map(_.toSeq).toSet
      once == replayed && once == twice
    })
  }

  // ---- native text expressions vs their declarative references ----

  // Includes non-BMP code points (emoji, math alphanumerics): the
  // native text expressions must agree with Spark's codepoint-based
  // substring/ascii/length on astral chars, not just ASCII.
  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 120)
    cs <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.alphaNumChar.map(_.toString)), (2, Gen.const(" ")),
      (1, Gen.oneOf(".", ",", "!", "?")),
      (1, Gen.oneOf("😀", "𝕊", "é", "中"))))
  } yield cs.mkString

  private val genDocs: Gen[List[String]] = Gen.listOfN(12, genText)

  test("property: CharShingles equals array_distinct(transform(substring))") {
    check(forAll(genDocs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = graft.dedup.Dedup.shingles(df)
        .as[(Long, String)].collect().toSet
      val declared = graft.Tables.spread(df).select($"doc_id",
          explode(array_distinct(expr(
            "transform(sequence(1, greatest(length(text) - 3, 1)), i -> substring(text, i, 4))")))
          .as("sh"))
        .as[(Long, String)].collect().toSet
      native == declared
    })
  }

  test("property: native minhash signatures equal the declarative aggregates") {
    // every sample additionally carries a null-text and an empty-text
    // doc: null docs must DROP (no signature row — an all-null row
    // would band-collide with every other null doc), empty docs keep
    // their well-defined ascii('')-based signature (ADVICE r5)
    check(forAll(genDocs) { texts =>
      val df = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        Seq((1000L, null.asInstanceOf[String]), (1001L, "")))
        .toDF("doc_id", "text")
      val fast = graft.dedup.Dedup.minhashSignatures(df)
        .collect().map(_.toSeq).toSet
      val ref = graft.dedup.Dedup.minhashSignaturesDeclarative(df)
        .collect().map(_.toSeq).toSet
      fast == ref && !fast.exists(_.head == 1000L) &&
        fast.exists(_.head == 1001L)
    })
  }

  test("property: TokenTfs run-length counts equal explode+groupBy, n=1 and n=2") {
    import graft.functions.TextFunctions.token_tfs
    check(forAll(genDocs) { texts =>
      val df = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        Seq((1000L, null.asInstanceOf[String]), (1001L, "")))
        .toDF("doc_id", "text")
        .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("ws"))
      def native(n: Int) = df
        .select($"doc_id", explode(token_tfs($"ws", n)).as("p"))
        .select($"doc_id", $"p.token", $"p.tf")
        .as[(Long, String, Long)].collect().toSet
      // declarative reference: explode the n-word space-joined grams,
      // count occurrences
      def ref(n: Int) = df
        .filter(size($"ws") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(ws) - ${n - 1}), i -> " +
            s"array_join(slice(ws, i, $n), ' '))")).as("token"))
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
        .as[(Long, String, Long)].collect().toSet
      val u = native(1); val b = native(2)
      // null/empty docs vanish from both forms
      u == ref(1) && b == ref(2) &&
        !u.exists(r => r._1 == 1000L || r._1 == 1001L)
    })
  }

  test("property: native winnow equals the per-position reference") {
    check(forAll(genDocs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val fast = graft.text.TextAnalysis.winnow(df)
        .as[(Long, Long, Long)].collect().toSet
      val ref = graft.text.TextAnalysis.winnowReference(df)
        .as[(Long, Long, Long)].collect().toSet
      fast == ref
    })
  }
}
