package graft.text

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the classic BPE toy corpus (Sennrich 2016 §3.2 uses low/lower/
  // newest/widest); frequencies forced via repetition
  private def corpus(words: (String, Int)*) =
    words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")

  test("learns the expected first merges on the classic toy corpus") {
    // low x5, lower x2, newest x6, widest x3
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val (merges, _) = Bpe.train(docs, nMerges = 4)
    // pair counts round 1: "e s" 9, "s t" 9, "t </>"... no sentinel
    // token — pairs: l o (7), o w (7), w e (2+... ) etc.
    // e s: newest 6 + widest 3 = 9 ; s t: 9 ; tie -> lexicographic "e s"
    assert(merges(0).pair == "e s" && merges(0).pair_count == 9)
    // after merging es: "s t" is gone, "es t" = 9 wins
    assert(merges(1).pair == "es t" && merges(1).merged == "est")
    // then l o (7) and o w (7) tie -> "l o"
    assert(merges(2).pair == "l o")
    assert(merges(3).pair == "lo w" && merges(3).merged == "low")
  }

  test("merge is left-to-right non-overlapping on runs") {
    // "aaaa" x3: pair (a,a) count 9 (three per word); after merge the
    // word is [aa, aa] -> next round (aa, aa) count 3
    val docs = corpus("aaaa" -> 3)
    val (merges, words) = Bpe.train(docs, nMerges = 2)
    assert(merges(0).pair == "a a" && merges(0).pair_count == 9)
    assert(merges(1).pair == "aa aa" && merges(1).pair_count == 3)
    val state = words.select("s").as[String].collect().head
    assert(state == " aaaa ")
  }

  test("odd-length runs leave the dangling symbol unmerged") {
    // "aaa": merge (a,a) left-to-right -> [aa, a]; symbols are joined
    // by TWO spaces in the state representation
    val docs = corpus("aaa" -> 2)
    val (_, words) = Bpe.train(docs, nMerges = 1)
    assert(words.select("s").as[String].collect().head == " aa  a ")
  }

  test("encodedSymbolCounts weights by corpus frequency") {
    val docs = corpus("low" -> 5, "lower" -> 2)
    val counts = Bpe.encodedSymbolCounts(docs, nMerges = 2, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // merges: "l o" (7) then "lo w" (7) -> symbol "low" appears 7x
    assert(counts("low") == 7L)
    assert(counts("e") == 2L && counts("r") == 2L)
  }

  test("mergeTable output is deterministic across runs") {
    val docs = corpus("newest" -> 4, "widest" -> 4, "low" -> 3)
    val a = Bpe.mergeTable(docs, 5).collect().map(_.toSeq)
    val b = Bpe.mergeTable(docs.repartition(7), 5).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("encode applies learned merges to an unseen corpus in training order") {
    // train on low/lower: merges "l o" then "lo w"
    val (merges, _) = Bpe.train(corpus("low" -> 5, "lower" -> 2), nMerges = 2)
    assert(merges.map(_.pair) == Seq("l o", "lo w"))
    // "slow" contains l-o-w -> [s, low]; "lot" only l-o -> [lo, t];
    // "cat" shares no trained pair -> raw chars
    val enc = Bpe.encode(corpus("slow" -> 1, "lot" -> 1, "cat" -> 1), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(enc("slow") == Seq("s", "low"))
    assert(enc("lot") == Seq("lo", "t"))
    assert(enc("cat") == Seq("c", "a", "t"))
  }

  test("delta counting matches the full-recount reference bit-for-bit") {
    // >16 merges so the periodic word-table checkpoint path runs too;
    // mixed word lengths, shared prefixes/suffixes, and runs exercise
    // pair re-creation (a pair dropping to 0 then reappearing) and the
    // left-to-right run semantics inside the delta updates
    val docs = corpus("low" -> 9, "lower" -> 4, "lowest" -> 2,
      "newest" -> 7, "widest" -> 3, "aaaa" -> 5, "aaab" -> 4,
      "banana" -> 6, "bandana" -> 2, "estates" -> 3)
    val (delta, wordsDelta) = Bpe.train(docs, nMerges = 20)
    val (full, wordsFull) = Bpe.trainRecount(docs, nMerges = 20)
    assert(delta == full,
      s"merge tables diverged:\n${delta.zip(full).filter(p => p._1 != p._2)}")
    val sd = wordsDelta.select("word", "s").collect().map(_.toSeq).sortBy(_.toString)
    val sf = wordsFull.select("word", "s").collect().map(_.toSeq).sortBy(_.toString)
    assert(sd.toSeq == sf.toSeq, "final word states diverged")
  }

  test("merge table save/load round-trips in training order and refuses corruption") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val (merges, _) = Bpe.train(docs, nMerges = 4)
    val dir = tempDir("graft_bpe_rt")
    Bpe.save(merges, s"$dir/m", spark)
    assert(Bpe.load(spark, s"$dir/m") == merges)
    // encode under the reloaded table is identical to the fresh one
    val target = corpus("lowest" -> 1, "wide" -> 1)
    def enc(ms: Seq[Bpe.Merge]) = Bpe.encode(target, ms).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(enc(Bpe.load(spark, s"$dir/m")) == enc(merges))
    // a truncated merge table must refuse to load
    merges.take(3).toDF().write.mode("overwrite").parquet(s"$dir/m/merges")
    intercept[IllegalArgumentException] { Bpe.load(spark, s"$dir/m") }
  }

  test("rejects nMerges < 1 and fails fast when pairs run out") {
    val docs = corpus("ab" -> 1)
    intercept[IllegalArgumentException] { Bpe.train(docs, 0) }
    // "ab" has one pair; after merging it nothing remains
    intercept[IllegalArgumentException] { Bpe.train(docs, 3) }
    intercept[IllegalArgumentException] { Bpe.trainLocal(docs, 0) }
    intercept[IllegalArgumentException] { Bpe.trainLocal(docs, 3) }
  }

  test("trainLocal matches train bit-for-bit, merges and final word state") {
    // the trainRecount-equivalence fixture: runs, shared affixes, ties
    val docs = corpus("low" -> 9, "lower" -> 4, "lowest" -> 2,
      "newest" -> 7, "widest" -> 3, "aaaa" -> 5, "aaab" -> 4,
      "banana" -> 6, "bandana" -> 2, "estates" -> 3)
    val (dist, wordsDist) = Bpe.train(docs, nMerges = 20)
    val (local, wordsLocal) = Bpe.trainLocal(docs, nMerges = 20)
    assert(local == dist,
      s"merge tables diverged:\n${local.zip(dist).filter(p => p._1 != p._2)}")
    val sd = wordsDist.select("word", "freq", "s").collect()
      .map(_.toSeq).sortBy(_.toString)
    val sl = wordsLocal.select("word", "freq", "s").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(sl.toSeq == sd.toSeq, "final word states diverged")
  }

  test("trainLocal matches train at a 500-merge production vocabulary") {
    // enough distinct adjacent pairs to sustain 500 rounds: 700
    // seeded-random 12-char words (near-unique, so merge capacity is
    // thousands), skewed frequencies so argmax ties still occur
    val rng = new scala.util.Random(42)
    val words = (0 until 700).map { i =>
      val w = (0 until 12).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      w -> (i % 5 + 1)
    }
    val docs = corpus(words: _*)
    val (dist, _) = Bpe.train(docs, nMerges = 500)
    val (local, _) = Bpe.trainLocal(docs, nMerges = 500)
    assert(local == dist,
      s"first divergence: ${local.zip(dist).find(p => p._1 != p._2)}")
  }
}
