package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE trainer against the literature's worked example (Sennrich et al.
  * 2016 §3.2 uses low/lower/newest/widest): the merge sequence is fully
  * determined by the weighted pair counts, so the first five merges are
  * checkable by hand. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 5×"low", 2×"lower", 6×"newest", 3×"widest" as documents
  def corpus: org.apache.spark.sql.DataFrame = Seq(
    (1L, List.fill(5)("low").mkString(" ")),
    (2L, List.fill(2)("lower").mkString(" ")),
    (3L, List.fill(6)("newest").mkString(" ")),
    (4L, List.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")

  test("wordFreq collapses the corpus to weighted distinct words") {
    val wf = Bpe.wordFreq(corpus).as[(String, Long)].collect().toMap
    assert(wf == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
  }

  test("pair counts are frequency-weighted over char symbols") {
    val pc = Bpe.pairCounts(corpus)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // 'es' rides newest(6) + widest(3); 'lo' rides low(5) + lower(2)
    assert(pc(("e", "s")) == 9L)
    assert(pc(("s", "t")) == 9L)
    assert(pc(("l", "o")) == 7L)
    assert(pc(("w", "</w>")) == 5L) // only 'low' ends in w
  }

  test("train learns the textbook merge sequence") {
    val (merges, words) = Bpe.train(corpus, nMerges = 5)
    assert(merges.map(m => (m.left, m.right)) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.n) == Seq(9L, 9L, 9L, 7L, 7L))
    val syms = words.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(syms("newest") == Seq("n", "e", "w", "est</w>"))
    assert(syms("low") == Seq("low", "</w>"))
    assert(syms("lower") == Seq("low", "e", "r", "</w>"))
  }

  test("greedy left-to-right merge: aaa + (a,a) -> [aa, a]") {
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(got == Seq("aa", "a"))
  }

  test("batched prefix-disjoint training equals one-at-a-time on the textbook corpus") {
    val (seqM, _, seqRounds) = Bpe.trainRounds(corpus, nMerges = 5, batchB = 1)
    val (batM, _, batRounds) = Bpe.trainRounds(corpus, nMerges = 5, batchB = 4)
    assert(batM == seqM, "batched merge list must match sequential")
    // round 3's leaderboard is (est,</w>) 9 then the disjoint (l,o) 7,
    // so one batch applies both: 4 pair-count rounds instead of 5
    assert(seqRounds == 5 && batRounds == 4)
  }

  test("disjoint leaderboard: one round applies the whole batch; lists agree") {
    // 6 families with globally distinct characters; family i's hot
    // pair (p_i,q_i) rides two words (counts 60-i and 50-i → 110-2i),
    // so the top-6 leaderboard is 6 mutually disjoint pairs and every
    // other pair counts ≤ 60 — the shape where batching pays ~B×.
    val docs = (0 until 6).flatMap { i =>
      val Seq(p, q, r, s) = (0 to 3).map(k => ('a' + 4 * i + k).toChar.toString)
      Seq((2L * i, List.fill(60 - i)(p + q + r).mkString(" ")),
          (2L * i + 1, List.fill(50 - i)(s + p + q).mkString(" ")))
    }.toDF("doc_id", "text")
    val (seqM, _, seqRounds) = Bpe.trainRounds(docs, nMerges = 6, batchB = 1)
    val (batM, _, batRounds) = Bpe.trainRounds(docs, nMerges = 6, batchB = 6)
    assert(batM == seqM)
    assert(seqM.map(m => (m.left, m.right)) == (0 until 6).map(i =>
      (('a' + 4 * i).toChar.toString, ('a' + 4 * i + 1).toChar.toString)))
    assert(seqRounds == 6 && batRounds == 1,
      s"expected 6 sequential vs 1 batched round, got $seqRounds/$batRounds")
  }

  test("encodeWords segments an unseen word with learned merges") {
    val (merges, _) = Bpe.train(corpus, nMerges = 5)
    val got = Bpe.encodeWords(Seq(Tuple1("lowest")).toDF("word"), merges)
      .select("syms").as[Seq[String]].head()
    assert(got == Seq("low", "est</w>"))
  }

  test("sennrichMerges IS the trainer's output on the paper corpus") {
    // the pinned constant exists so the DuckDB twin can replay the
    // merges as literals; this equality is what keeps it a TRAINED
    // artifact rather than an arbitrary list
    val docs = Seq((0L, Bpe.sennrichText)).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, nMerges = 8)
    assert(merges.map(m => (m.left, m.right)) == Bpe.sennrichMerges)
  }

  test("encode counts BPE tokens per doc under the pinned vocab") {
    // hand-derived under sennrichMerges: low → [low,</w>] (2),
    // lower → [low,e,r,</w>] (4), newest → [newest</w>] (1),
    // widest → [w,i,d,est</w>] (4); empty doc → 0
    val docs = Seq(
      (0L, "low lower"), (1L, "newest widest newest"), (2L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 6L, 1L -> 6L, 2L -> 0L))
  }

  test("fertility: per-language integer ppm ratios from hand-derived token counts") {
    // en doc: "low lower" -> 6 bpe tokens (hand-derived above), 9
    // chars, 2 words; es doc: "el que" -> e,l,</w> (3) + q,u,e,</w>
    // (4) = 7 bpe tokens, 6 chars, 2 words. langPred: 'the|a|and'
    // markers vs 'el|la|que' decide en/es.
    val d = Seq(
      (0L, "low lower the a and the a and"),
      (1L, "el que el que el que")).toDF("doc_id", "text")
    val got = Bpe.fertility(d)
      .select("lang_pred", "n_docs", "n_chars", "n_words", "n_bpe_tokens",
        "chars_per_token_ppm", "tokens_per_word_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("en", "es"), s"langs: ${got.keySet}")
    val en = got("en")
    // "low lower the a and the a and": words low,lower + 2x(the,a,and)
    // the->4 syms, a->2, and->4 under no matching merges; 6+2*(4+2+4)=26
    assert(en._4 == 8L && en._5 == 26L, s"en counts: $en")
    assert(en._6 == en._3 * 1000000L / en._5 &&
      en._7 == en._5 * 1000000L / en._4, s"en ppm arithmetic: $en")
    val es = got("es")
    // 3x(el -> 3, que -> 4) = 21 tokens over 6 words
    assert(es._4 == 6L && es._5 == 21L, s"es counts: $es")
    assert(es._7 == 3500000L, s"es tokens/word ppm: $es")
  }

  test("chunkDocs bpeMerges flag reports BPE-accurate n_tokens, same chunks") {
    val docs = Seq((0L, Seq.fill(6)("newest low").mkString(" ")))
      .toDF("doc_id", "text") // 12 words
    val ws = graft.text.Chunking.chunkDocs(docs, chunkTokens = 8, overlap = 2)
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    val bpe = graft.text.Chunking.chunkDocs(docs, chunkTokens = 8, overlap = 2,
        bpeMerges = Some(Bpe.sennrichMerges))
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    // identical chunk boundaries and text — only the count upgrades
    assert(ws.map(c => (c._1, c._2, c._3)).toSeq ==
      bpe.map(c => (c._1, c._2, c._3)).toSeq)
    // newest → 1 token, low → 2 tokens under the pinned vocab; each
    // 8-word chunk alternates newest/low → 4·1 + 4·2 = 12
    assert(ws.head._4 == 8 && bpe.head._4 == 12,
      s"ws=${ws.head._4} bpe=${bpe.head._4}")
  }

  test("tokenStats bpeMerges flag upgrades n_tokens, other columns unchanged") {
    val docs = Seq((0L, "low lower")).toDF("doc_id", "text")
    val ws = graft.text.TextAnalysis.tokenStats(docs)
      .select("n_tokens", "n_chars_calc").as[(Int, Int)].head()
    val bpe = graft.text.TextAnalysis.tokenStats(docs, Some(Bpe.sennrichMerges))
      .select("n_tokens", "n_chars_calc").as[(Int, Int)].head()
    assert(ws == ((2, 9)) && bpe == ((6, 9)), s"ws=$ws bpe=$bpe")
  }

  test("topPairs is deterministically ranked with pair tiebreak") {
    val top = Bpe.topPairs(corpus, k = 3)
      .as[(String, String, Long, Int)].collect().toSeq
    assert(top.map(_._4) == Seq(1, 2, 3))
    assert(top.map(t => (t._1, t._2)).toSet == Set(
      ("e", "s"), ("s", "t"), ("t", "</w>")))
    // all three have n=9; rank order is lexicographic on the pair
    assert(top.map(t => (t._1, t._2)) ==
      top.map(t => (t._1, t._2)).sorted)
  }
}
