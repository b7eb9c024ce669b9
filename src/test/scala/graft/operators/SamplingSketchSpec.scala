package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = spark.read
    .parquet(s"$sf001/documents.parquet")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  test("T=1 is natural sampling: every group gets the same rate") {
    val total = corpus.agg(sum("n_chars")).as[Long].head()
    val rates = Sampling
      .temperatureRates(corpus, "lang", "n_chars", 1.0, total / 2)
      .select("rate").as[Double].collect().toSet
    assert(rates.size == 1, s"expected one uniform rate, got $rates")
    val r = rates.head
    assert(math.abs(r - 0.5) < 0.01, s"rate $r should be ~budget/total=0.5")
  }

  test("T>1 boosts low-resource groups relative to T=1") {
    val total = corpus.agg(sum("n_chars")).as[Long].head()
    def rateOf(t: Double) = Sampling
      .temperatureRates(corpus, "lang", "n_chars", t, total / 2)
      .select("lang", "rate").as[(String, Double)].collect().toMap
    val flat = rateOf(1.0)
    val cooled = rateOf(3.0)
    val masses = corpus.groupBy("lang").agg(sum("n_chars").as("m"))
      .as[(String, Long)].collect().toMap
    val smallest = masses.minBy(_._2)._1
    val largest = masses.maxBy(_._2)._1
    assert(cooled(smallest) > flat(smallest),
      "low-resource language must be upsampled at higher temperature")
    assert(cooled(largest) < flat(largest),
      "dominant language must be downsampled at higher temperature")
  }

  test("sample is the exact deterministic hash-selected row set") {
    val sampled = Sampling
      .temperatureSample(corpus, "lang", "doc_id", "n_chars", 2.0, 60000L)
    val again = Sampling
      .temperatureSample(corpus.repartition(13), "lang", "doc_id", "n_chars",
        2.0, 60000L)
    val a = sampled.select("doc_id").as[Long].collect().sorted.toSeq
    val b = again.select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "selection must be independent of partitioning")
    assert(a.nonEmpty && a.size < corpus.count(),
      "a half-budget sample must be a proper nonempty subset")
    // every kept row actually clears its group's threshold
    val violations = sampled.where(
      Sampling.hashU24(col("doc_id")) >=
        floor(col("rate") * lit(16777216.0)).cast("long")).count()
    assert(violations == 0)
  }

  test("mixture sampling honors explicit shares and drops unlisted groups") {
    val rates = Sampling
      .mixtureRates(corpus, "lang", "n_chars",
        Map("en" -> 0.6, "de" -> 0.4), 50000L)
      .select("lang", "rate").as[(String, Double)].collect().toMap
    assert(rates.keySet == Set("en", "de"),
      "only weighted groups may receive a rate")
    val sampled = Sampling
      .mixtureSample(corpus, "lang", "doc_id", "n_chars",
        Map("en" -> 0.6, "de" -> 0.4), 50000L)
    val langs = sampled.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de")),
      s"unweighted languages must be excluded, got $langs")
    // a doubled budget can only widen the selection (rates are monotone)
    val wider = Sampling
      .mixtureSample(corpus, "lang", "doc_id", "n_chars",
        Map("en" -> 0.6, "de" -> 0.4), 100000L)
      .select("doc_id").as[Long].collect().toSet
    val narrow = sampled.select("doc_id").as[Long].collect().toSet
    assert(narrow.subsetOf(wider),
      "hash-coin selection must be nested across budgets")
  }

  test("perGroupSample caps every group and is partition-invariant") {
    val df = spark.range(0, 1000)
      .selectExpr("id", "CAST(id % 7 AS STRING) AS grp")
    val a = Sampling.perGroupSample(df, "grp", "id", 11)
    val counts = a.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 11L),
      s"every group of 140+ rows must yield exactly 11, got $counts")
    val b = Sampling.perGroupSample(df.repartition(17), "grp", "id", 11)
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq,
      "the sampled set must not depend on partitioning")
    // groups smaller than n survive whole
    val tiny = Sampling.perGroupSample(
      df.where(col("id") < 3), "grp", "id", 11)
    assert(tiny.count() == 3)
  }

  test("rejects non-positive temperature and budget") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureRates(corpus, "lang", "n_chars", 0.0, 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureRates(corpus, "lang", "n_chars", 1.0, 0L)
    }
  }
}

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  test("CMS heavy hitters certify both error bounds on a skewed stream") {
    // zipf-ish: item i appears ~ 1000/i times — heavy head, long tail
    val items = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))
    val df = items.toDF("token").repartition(8)
    // strictBound on: this fixture + seed is deterministic, so the
    // eps·N bound check is a regression guard here, not tail luck
    val out = Sketches
      .cmsHeavyHitters(df, "token", k = 10, eps = 0.001,
        confidence = 0.99, seed = 7, strictBound = true)
      .as[(String, Long, Long)].collect()
    assert(out.length == 10)
    val n = items.size
    assert(out.forall(r => r._3 >= r._2), "CMS must never undercount")
    assert(out.forall(r => r._3 <= r._2 + math.ceil(0.001 * n).toLong),
      "CMS overcount must stay within eps·N")
    val expectedTop = items.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).sorted
    assert(out.map(_._1).sorted.toSeq == expectedTop)
  }
}

class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  test("selection probability grows with weight") {
    // two weight classes: heavy rows (w=100) vs light rows (w=1); draw
    // 50 of 400 — heavies should dominate the sample
    val rows = (1L to 400L).map(i => (i, "g", if (i % 2 == 0) 100L else 1L))
    val df = rows.toDF("id", "g", "w")
    val picked = Sampling.weightedPerGroupSample(df, "g", "id", "w", n = 50)
      .select("w").as[Long].collect()
    val heavies = picked.count(_ == 100L)
    assert(heavies >= 40, s"expected heavy rows to dominate, got $heavies/50")
  }

  test("bit-identical across partitionings; nonpositive weights excluded") {
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", i % 7))
      .toDF("id", "g", "w")
    val a = Sampling.weightedPerGroupSample(df.repartition(1), "g", "id", "w", 5)
      .orderBy("g", "id").collect().toSeq
    val b = Sampling.weightedPerGroupSample(df.repartition(11), "g", "id", "w", 5)
      .orderBy("g", "id").collect().toSeq
    assert(a == b)
    // rows with w = 0 (i % 7 == 0) never appear
    assert(a.forall(_.getLong(2) > 0))
  }
}

class LeakageSplitSpec extends SparkSpec {

  import graft.operators.Sampling
  import spark.implicits._

  test("every member of a chained dup cluster draws one split") {
    // 0-1-2-3-4 is a path: 4 shares no edge with 0, yet transitivity must
    // put the whole chain in one split
    val ids = (0L to 20L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("id1", "id2")
    val out = Sampling.leakageSafeSplit(ids, pairs)
      .as[(Long, Long, String)].collect()
      .map { case (id, c, sp) => id -> ((c, sp)) }.toMap
    val chain = (0L to 4L).map(out)
    assert(chain.map(_._1).distinct == Seq(0L), s"canonical drift: $chain")
    assert(chain.map(_._2).distinct.size == 1, s"split leak: $chain")
  }

  test("singletons keep the plain per-id hash split") {
    val ids = (50L to 80L).toDF("id")
    val out = Sampling.leakageSafeSplit(ids,
        Seq.empty[(Long, Long)].toDF("id1", "id2"))
      .as[(Long, Long, String)].collect()
    assert(out.forall { case (id, canonical, _) => canonical == id })
    // matches the nibble rule on the id itself
    val nib = ids.select(col("id"),
      (expr("instr('0123456789abcdef', substring(md5(CAST(id AS STRING)), 1, 1))")
        - 1).cast("long").as("b")).as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, split) =>
      val expect =
        if (nib(id) < 10) "train" else if (nib(id) < 13) "val" else "test"
      assert(split == expect, s"id $id: $split != $expect")
    }
  }

  test("partition-invariant; bad nibble budgets rejected") {
    val ids = (0L to 99L).toDF("id")
    val pairs = (0L until 30L).map(i => (i, i + 1000L)).toDF("id1", "id2")
    val a = Sampling.leakageSafeSplit(ids.repartition(1), pairs)
      .orderBy("id").collect().toSeq
    val b = Sampling.leakageSafeSplit(ids.repartition(13), pairs)
      .orderBy("id").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(ids, pairs, trainNibbles = 17)
    }
  }
}

class HashNegativesSpec extends SparkSpec {

  import graft.operators.Sampling
  import spark.implicits._

  test("k negatives per anchor, never the anchor itself, deterministic") {
    val docs = (0L until 200L).toDF("doc_id")
    val got = Sampling.hashNegatives(docs, "doc_id", k = 4, seed = "s1")
      .as[(Long, Int, Long)].collect()
    assert(got.length == 200 * 4)
    assert(got.forall { case (a, _, n) => a != n },
      "an anchor drew itself as a negative")
    // every anchor has exactly k draws, j = 1..4
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.size == 200 &&
      byAnchor.values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4)))
    // same draws on a different partitioning
    val again = Sampling
      .hashNegatives(docs.repartition(7), "doc_id", k = 4, seed = "s1")
      .as[(Long, Int, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ==
      got.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("negatives spread over the corpus, not a fixed stride") {
    val docs = (0L until 300L).toDF("doc_id")
    val negs = Sampling.hashNegatives(docs, "doc_id", k = 2, seed = "s2")
      .select("neg_id").as[Long].collect()
    // uniform draws: many distinct negatives, no single dominator
    assert(negs.distinct.length > 150, s"only ${negs.distinct.length} distinct")
    val topShare = negs.groupBy(identity).values.map(_.length).max
    assert(topShare <= 10, s"one negative drawn $topShare times")
  }
}
