package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.ann.Similarity
import graft.text.TextAnalysis

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("seededHash matches the md5-hex construction DuckDB replicates") {
    // '0:abc' -> md5 -> first 15 hex digits -> bigint; cross-checked with
    // DuckDB ('0x'||substr(md5('0:abc'),1,15))::BIGINT
    val got = Seq("abc").toDF("s")
      .select(Dedup.seededHash(0, $"s").as("h")).as[Long].head()
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("0:abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == java.lang.Long.parseLong(md5hex.take(15), 16))
  }

  test("lineDedup removes corpus-repeated spans, preserves document order") {
    // the span "common footer" (one aligned 2-word chunk) appears in 3
    // of 4 docs → boilerplate at minDocFrac 0.5 (minDocs = 2); unique
    // spans survive in their original order
    val docs = Seq(
      (1L, "alpha beta common footer gamma delta"),
      (2L, "common footer epsilon zeta"),
      (3L, "eta theta common footer"),
      (4L, "iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, chunkWords = 2, minDocFrac = 0.5)
      .select($"doc_id", $"n_chunks", $"n_dropped", $"clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 3L, 1L, "alpha beta gamma delta"))
    assert(got(2L) == (2L, 2L, 1L, "epsilon zeta"))
    assert(got(3L) == (3L, 2L, 1L, "eta theta"))
    assert(got(4L) == (4L, 2L, 0L, "iota kappa lambda mu"))
  }

  test("lineDedup with no boilerplate reconstructs the text exactly (odd tail kept)") {
    val docs = Seq(
      (1L, "alpha beta gamma"), // odd word count → trailing 1-word chunk
      (2L, "delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, chunkWords = 2, minDocFrac = 1.1)
      .select($"doc_id", $"clean_text", $"n_dropped")
      .as[(Long, String, Long)].collect()
      .map { case (id, text, dropped) => id -> (text, dropped) }.toMap
    assert(got(1L) == ("alpha beta gamma", 0L))
    assert(got(2L) == ("delta epsilon zeta eta", 0L))
  }

  test("lineDedup emits empty text for a fully-boilerplate doc") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text")
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, chunkWords = 2, minDocFrac = 0.5)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "", 2L -> "", 3L -> ""))
  }

  test("exact dedup groups identical normalized texts") {
    val docs = Seq(
      (1L, "hello  world"), (2L, "Hello World"), (3L, "other text")
    ).toDF("doc_id", "text")
    val got = Dedup.exactDedup(docs)
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("incremental dedup drops shard docs already in the corpus, keeps shard-min of new ones") {
    // existing corpus: ids 0,1. new shard: id 10 duplicates 0 (dropped),
    // ids 11+12 share NEW content (11 kept as shard min), 13 is unique
    val docs = Seq(
      (0L, "alpha beta"), (1L, "gamma delta"),
      (10L, "Alpha  Beta"),     // normalized dup of 0 → gated out
      (11L, "epsilon zeta"), (12L, "epsilon zeta"),
      (13L, "unique text")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(docs, existingMaxId = 10)
      .select("keep_id", "shard_dups").as[(Long, Long)].collect().toSet
    assert(got == Set((11L, 2L), (13L, 1L)), s"got $got")
  }

  test("quality-aware survivorship keeps the best cluster member, not the min id") {
    val core = ("the quick brown fox jumps over a lazy dog and " * 5).trim
    val docs = Seq(
      (1L, core + " !!!!!!!!!!"), // near-dup, punct-spam tail → lower quality
      (2L, core),                 // clean copy, HIGHER id
      (3L, "completely different content about sailing ships")
    ).map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val best = graft.dedup.Clusters.survivorsBest(docs)
      .select($"doc_id").as[Long].collect().toSet
    assert(best == Set(2L, 3L),
      s"clean higher-id copy must win its cluster: $best")
    // contrast: min-id survivorship keeps the spammy first crawl
    val minId = graft.dedup.Clusters.survivors(docs)
      .select($"doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 3L))
  }

  test("identical docs are minhash candidates with est_jaccard 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content here with other words entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashCandidates(docs)
      .select("a_id", "b_id", "est_jaccard").as[(Long, Long, Double)].collect()
    assert(got.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }

  test("simhash: identical docs get identical fingerprints") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta")
    ).toDF("doc_id", "text")
    val fps = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("knnBrute returns k neighbors per query, self excluded, ranked") {
    val embs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0.5f, 0.5f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnBrute(embs, queryMaxId = 1, k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 2L)) // by cosine to (1,0): 0.9970, 0.7071, 0.0
  }

  test("quality score is integer per-mille in range") {
    val got = TextAnalysis.qualityScore(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .agg(min("quality_pm"), max("quality_pm")).as[(Long, Long)].head()
    assert(got._1 >= 0L && got._2 <= 1000L)
  }

  test("containment: an embedded quote has high containment but low Jaccard") {
    import org.apache.spark.sql.functions.{col, length}
    val quote = "the five boxing wizards jump quickly over the lazy dog tonight"
    val host = ("completely different narrative prose about rivers " * 6) +
      quote + (" and further unrelated discussion of mountains " * 6)
    val other = "entirely disjoint text with no shared content at all here"
    val d = Seq((1L, quote), (2L, host), (3L, other))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Dedup.containment(d)
      .select("a_id", "b_id", "cont_a_pm", "j_pm")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L,
      s"only the quote pair should clear the gate: ${got.toSeq}")
    // the asymmetric signal: near-total containment, weak Jaccard
    assert(got.head._3 >= 950000L, s"containment ${got.head._3}")
    assert(got.head._4 < 500000L, s"jaccard should stay low ${got.head._4}")
  }

  test("lshQuality: exact copies fully caught, recall climbs with true Jaccard") {
    import org.apache.spark.sql.functions.{col, length}
    // 40 mutually-dissimilar docs (distinct word streams) + 10 exact
    // copy pairs; identical shingle sets make identical signatures, so
    // the top decile is caught with probability 1 — structurally, not
    // statistically
    val base = (0L until 40L).map(i =>
      (i, (1 to 30).map(j => s"w${i}x$j").mkString(" ")))
    val copies = (0L until 10L).map(i => (100L + i, base(i.toInt)._2))
    val docs = (base ++ copies).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val rows = Dedup.lshQuality(docs)
      .select("j_decile", "n_pairs", "n_caught", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val top = rows.last
    assert(top._1 == 10L && top._2 == 10L && top._4 == 1000000L,
      s"exact copies must all be caught: $rows")
    // banding theory: low-similarity deciles are mostly NOT candidates
    val low = rows.filter(_._1 <= 2).map(_._4)
    assert(low.forall(_ < 500000L), s"low-j recall too high: ${rows.toSeq}")
    // weak monotonicity over populated deciles
    val populated = rows.filter(_._2 >= 5).map(_._4)
    assert(populated.zip(populated.tail).forall { case (a, b) => b >= a },
      s"recall should climb with true Jaccard: ${rows.toSeq}")
    // the SimHash sibling on the same fixtures: exact copies are
    // hamming 0 (structural), dissimilar docs stay uncaught
    val sq = Dedup.simhashQuality(docs)
      .select("j_decile", "n_pairs", "n_caught", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val sqTop = sq.last
    assert(sqTop._1 == 10L && sqTop._4 == 1000000L,
      s"simhash must catch exact copies: ${sq.toSeq}")
    assert(sq.filter(_._1 <= 2).forall(_._4 < 500000L),
      s"simhash low-j recall too high: ${sq.toSeq}")
  }
}
