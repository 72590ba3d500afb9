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

  test("encodeWords segments an unseen word with learned merges") {
    val (merges, _) = Bpe.train(corpus, nMerges = 5)
    val got = Bpe.encodeWords(Seq(Tuple1("lowest")).toDF("word"), merges)
      .select("syms").as[Seq[String]].head()
    assert(got == Seq("low", "est</w>"))
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
