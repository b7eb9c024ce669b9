package graft.operators

import graft.SparkSpec

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  test("suffix ranks: banana + ana, dense ranks with cross-doc ties") {
    val docs = Seq((1L, "banana"), (2L, "ana")).toDF("doc_id", "text")
    val got = SuffixArray.build(docs).ranks.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // sorted suffixes: a | ana | anana | banana | na | nana
    val expected = Map(
      (1L, 5) -> 1L, (2L, 2) -> 1L, // "a" (tie)
      (1L, 3) -> 2L, (2L, 0) -> 2L, // "ana" (tie)
      (1L, 1) -> 3L,                // "anana"
      (1L, 0) -> 4L,                // "banana"
      (1L, 4) -> 5L, (2L, 1) -> 5L, // "na" (tie)
      (1L, 2) -> 6L)                // "nana"
    assert(got == expected, s"got: $got")
  }

  test("maxRepeatPerDoc: longest repeated substring, hand-checked") {
    val docs = Seq((1L, "banana"), (2L, "ana"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val got = SuffixArray.maxRepeatPerDoc(SuffixArray.build(docs))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // "ana" repeats inside banana (pos 1 overlap pos 3) and equals doc 2
    // wholesale; doc 3 shares nothing but trivial... not even 1 char
    assert(got == Map(1L -> 3, 2L -> 3, 3L -> 0), s"got: $got")
  }

  test("identical docs report full-length repeats") {
    val docs = Seq((1L, "abcd"), (2L, "abcd")).toDF("doc_id", "text")
    val got = SuffixArray.maxRepeatPerDoc(SuffixArray.build(docs))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 4, 2L -> 4), s"got: $got")
  }

  test("ranks and adjacent LCPs match a naive reference on random " +
      "corpora") {
    val rnd = new scala.util.Random(0xa5a5)
    val docs = (0 until 30).map { i =>
      val len = rnd.nextInt(13)
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString) // 3-letter alphabet forces ties and deep LCPs
    }
    val built = SuffixArray.build(docs.toDF("doc_id", "text"))
    // naive reference: materialize every suffix string, sort, dense-rank
    val suf = docs.flatMap { case (id, t) =>
      t.indices.map(p => (id, p, t.substring(p)))
    }
    val sorted = suf.sortBy { case (id, p, s) => (s, id, p) }
    val rankOf = sorted.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val expectRanks = suf.map { case (id, p, s) => (id, p) -> rankOf(s) }
      .toMap
    val gotRanks = built.ranks.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(gotRanks == expectRanks)
    // adjacent LCPs against direct common-prefix computation
    def lcp(a: String, b: String) =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val expectAdj = sorted.zip(sorted.tail).map { case (a, b) =>
      ((a._1, a._2, b._1, b._2), lcp(a._3, b._3))
    }.toMap
    val gotAdj = SuffixArray.adjacentLcp(built).collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)),
        r.getInt(4))).toMap
    assert(gotAdj == expectAdj)
  }

  test("pathological repeats: local doubling stays fast and matches " +
      "the distributed path") {
    // all-same-char content is the adversarial case for a comparator
    // suffix sort (quadratic char compares); integer doubling + Kasai
    // are content-immune
    val docs = Seq((1L, "a" * 200), (2L, "a" * 100 + "b"))
      .toDF("doc_id", "text")
    val local = SuffixArray.build(docs)
    assert(local.localAdjacent.isDefined)
    val dist = SuffixArray.build(docs, localThreshold = 0)
    def repeats(b: SuffixArray.Built) =
      SuffixArray.maxRepeatPerDoc(b).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = repeats(local)
    assert(got == repeats(dist), s"local $got != distributed")
    // "aaaa…" overlaps itself: longest repeat = len - 1
    assert(got == Set((1L, 199), (2L, 100)), s"got: $got")
  }

  test("char-total bound elects the distributed path even under the " +
      "doc-count bound") {
    // few docs but chars over the budget: the probe must sum lengths
    // DISTRIBUTED and refuse the driver collect (doc count alone does
    // not bound bytes — the 100 TB hazard this guards)
    val docs = Seq((1L, "x" * 60), (2L, "y" * 60)).toDF("doc_id", "text")
    val b = SuffixArray.build(docs, localThreshold = 100)
    assert(b.localAdjacent.isEmpty,
      "expected the distributed path when totalChars > localThreshold")
    assert(SuffixArray.build(docs, localThreshold = 200)
      .localAdjacent.isDefined, "within budget should stay local")
  }

  test("non-BMP text: local and distributed paths agree on code-point " +
      "positions and order") {
    // U+1F600 is a surrogate pair in UTF-16; both paths must index and
    // compare by CODE POINT (the distributed split/sort semantics)
    val docs = Seq((1L, "a😀b"), (2L, "😀b"),
      (3L, "zb")).toDF("doc_id", "text")
    def ranksOf(b: SuffixArray.Built) = b.ranks.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val local = SuffixArray.build(docs)
    assert(local.localAdjacent.isDefined, "expected the local path")
    val dist = SuffixArray.build(docs, localThreshold = 0)
    val lr = ranksOf(local)
    assert(lr == ranksOf(dist), s"local $lr != distributed")
    // doc 1 has exactly 3 code-point positions (not 4 UTF-16 units)
    assert(lr.collect { case (1L, p, _) => p } == Set(0, 1, 2))
    // order is by code point: 'b' < 'z' < U+1F600, so the suffix set
    // sorted is: b(x2) | 😀b(x2) | a😀b | zb — "zb" ranks BELOW "😀b"
    val rankBySuffix = lr.map { case (d, p, r) => (d, p) -> r }.toMap
    assert(rankBySuffix((3L, 0)) < rankBySuffix((2L, 0)),
      "zb must sort before 😀b under code-point order")
  }

  test("driver-local fast path = distributed doubling (ranks and LCPs)") {
    val docs = Seq((1L, "banana"), (2L, "ana"), (3L, "abcabcx"),
      (4L, ""), (5L, "banana")).toDF("doc_id", "text")
    val local = SuffixArray.build(docs) // under every probe bound
    assert(local.localAdjacent.isDefined, "expected the local path")
    val dist = SuffixArray.build(docs, localThreshold = 0) // pinned loop
    assert(dist.localAdjacent.isEmpty, "expected the distributed path")
    def ranksOf(b: SuffixArray.Built) = b.ranks.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ranksOf(local) == ranksOf(dist))
    def repeats(b: SuffixArray.Built) =
      SuffixArray.maxRepeatPerDoc(b).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(repeats(local) == repeats(dist))
  }
}
