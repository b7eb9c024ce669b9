package graft
import org.apache.spark.sql.SparkSession

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--order")) {
      // print the Bench iteration order (HashMap order of queries keys)
      SparkEntry.queries.keys.zipWithIndex
        .foreach { case (k, i) => println(f"[order] $i%3d $k") }
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qnames =
      if (args.length > 1) args.drop(1).toSeq else Seq("q_vault_rating_slide")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    if (qnames == Seq("--ivf")) {
      // sub-step timing of the persisted-index lifecycle gates
      import org.apache.spark.sql.functions._
      import graft.operators.Similarity
      val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
      val idxDir = "/tmp/graft_probe_ivf"
      (1 to 2).foreach { rep =>
        time(s"fitCentroids rep$rep")(
          Similarity.fitCentroids(emb, 16))
        time(s"writeIndex rep$rep")(
          Similarity.writeIndex(emb, idxDir, nClusters = 16))
        val v = graft.functions.VectorFunctions.asDouble(col("embedding"))
        val batch = emb.where(col("vec_id") < 20)
          .select((col("vec_id") + 1000000).as("vec_id"),
            concat(array(element_at(v, 1) + 0.1), slice(v, 2, 63))
              .as("embedding"))
        time(s"append rep$rep")(Similarity.appendToIndex(batch, idxDir))
        time(s"search rep$rep")(
          Similarity.searchIndex(spark, idxDir,
            emb.where(col("vec_id") < 5), k = 10, nProbe = 4).count())
      }
      spark.stop(); return
    }
    if (qnames == Seq("--ivfpq")) {
      // recall margins for the IVFADC gate pins
      import org.apache.spark.sql.functions._
      import graft.operators.{IvfPq, Similarity}
      val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
      val qs = emb.where(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(emb, qs, k = 10)
        .select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nProbe = sys.env.getOrElse("IVFPQ_NPROBE", "8").toInt
      val rerank = sys.env.getOrElse("IVFPQ_RERANK", "100").toInt
      val mdl = time("fit")(IvfPq.fit(emb, nClusters = 16))
      val codes = time("encode")({
        val c = graft.operators.StagingCaches.cache(IvfPq.encode(emb, mdl))
        c.count(); c
      })
      val approx = time("ivfpqTopK")(
        IvfPq.ivfpqTopK(emb, qs, k = 10, nClusters = 16, nProbe = nProbe,
            rerank = rerank, model = Some(mdl), codes = Some(codes))
          .select("query_id", "cand_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))))
      val perQ = exact.groupBy(_._1).map { case (q, rows) =>
        val hits = rows.toSet & approx.filter(_._1 == q).toSet
        (q, hits.size, rows.length)
      }.toSeq.sortBy(_._1)
      perQ.foreach { case (q, h, n) =>
        println(f"[probe] ivfpq recall q$q = $h/$n") }
      val mh = perQ.map(_._2).sum; val mn = perQ.map(_._3).sum
      println(f"[probe] ivfpq mean recall = $mh/$mn = ${mh.toDouble / mn}%.3f")
      spark.stop(); return
    }
    if (qnames == Seq("--pqdel")) {
      // sub-step timing of the PQ-index deletion gate
      import org.apache.spark.sql.functions._
      import graft.operators.{IvfPq, Similarity}
      val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
      val qs = emb.where(col("vec_id") < 5)
      val dead = col("vec_id") % 17 === 3 && col("vec_id") < 1700
      val idxDir = "/tmp/graft_probe_pqdel"
      (1 to 2).foreach { rep =>
        val cents = time(s"fitCentroids rep$rep")(
          Similarity.fitCentroids(emb, 16))
        time(s"writeIndex rep$rep")(
          IvfPq.writeIndex(emb, idxDir, nClusters = 16,
            centroids = Some(cents)))
        time(s"delete rep$rep")(
          IvfPq.deleteFromIndex(emb.where(dead).select("vec_id"), idxDir))
        time(s"brute rep$rep")(
          Similarity.bruteForceTopK(emb.where(!dead), qs, k = 10).count())
        time(s"search1 rep$rep")(
          IvfPq.searchIndex(spark, idxDir, qs, k = 10, nProbe = 10,
            rerank = 300).count())
        time(s"vacuum rep$rep")(IvfPq.vacuumIndex(spark, idxDir))
        time(s"search2 rep$rep")(
          IvfPq.searchIndex(spark, idxDir, qs, k = 10, nProbe = 10,
            rerank = 300).count())
      }
      spark.stop(); return
    }
    if (qnames == Seq("--bm25del")) {
      // sub-step timing of the BM25 delete-with-debt gate (r19: it read
      // 14.3s in the driver-methodology bench vs 3.96 for its r18
      // clean-path shape — find where the fused fold pays)
      import org.apache.spark.sql.functions._
      import graft.operators.Bm25
      import spark.implicits._
      val docs = graft.engine.Tables.t(spark, sfDir, "documents")
      val idxDir = "/tmp/graft_probe_bm25del"
      val queries = Seq((1L, "spark"), (1L, "window"),
        (2L, "customer"), (2L, "table"), (3L, "vector"))
        .toDF("query_id", "term")
      (1 to 2).foreach { rep =>
        time(s"writeIndex rep$rep")(Bm25.writeIndex(docs, idxDir))
        val batch = docs.where(col("doc_id") < 30)
          .select((col("doc_id") + 500000).as("doc_id"), col("text"))
        time(s"appendBatchDir rep$rep")(
          Bm25.appendBatchDir(batch, idxDir, "debt", 0L))
        time(s"delete rep$rep")(Bm25.deleteFromIndex(
          docs.where(col("doc_id") % 11 === 4 && col("doc_id") < 1100)
            .select("doc_id")
            .union(batch.where((col("doc_id") - 500000) % 11 === 4)
              .select("doc_id")), idxDir))
        time(s"search1 rep$rep")(
          Bm25.searchIndex(spark, idxDir, queries, k = 10).count())
        time(s"vacuum rep$rep")(Bm25.vacuumIndex(spark, idxDir))
        time(s"search2 rep$rep")(
          Bm25.searchIndex(spark, idxDir, queries, k = 10).count())
        graft.operators.OperatorCaches.releaseAll(spark)
      }
      spark.stop(); return
    }
    if (qnames == Seq("--sketchmaint")) {
      // sub-step timing of the q_index_maintenance gate shape
      import org.apache.spark.sql.functions._
      import graft.operators.{IndexMaintenance, SketchIndex}
      import spark.implicits._
      val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
      val idxDir = "/tmp/graft_probe_sketchmaint"
      val v = graft.functions.VectorFunctions.asDouble(col("embedding"))
      val batch = emb.where(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"),
          concat(array(element_at(v, 1) + 0.1), slice(v, 2, 63))
            .as("embedding"))
      (1 to 2).foreach { rep =>
        time(s"writeIndex rep$rep")(SketchIndex.writeIndex(emb, idxDir))
        for ((lo, hi, b) <- Seq((0, 10, 0L), (10, 20, 1L)))
          time(s"appendBatchDir$b rep$rep")(SketchIndex.appendBatchDir(
            batch.where(col("vec_id") >= 1000000L + lo &&
              col("vec_id") < 1000000L + hi), idxDir, "crawl", b))
        time(s"delete rep$rep")(SketchIndex.deleteFromIndex(
          Seq(40L, 41L).toDF("vec_id"), idxDir))
        val qs = emb.where(col("vec_id") < 5)
        time(s"search1 rep$rep")(SketchIndex.searchIndex(
          spark, idxDir, qs, k = 10, shortlist = 50).count())
        time(s"maintain rep$rep")(IndexMaintenance.maintain(
          spark, idxDir, "sketch", maxLiveBatches = 1, maxTombstones = 1))
        time(s"idle rep$rep")(IndexMaintenance.maintain(
          spark, idxDir, "sketch", maxLiveBatches = 1, maxTombstones = 1))
        time(s"search2 rep$rep")(SketchIndex.searchIndex(
          spark, idxDir, qs, k = 10, shortlist = 50).count())
        graft.operators.OperatorCaches.releaseAll(spark)
      }
      spark.stop(); return
    }
    if (qnames == Seq("--maxsimdel")) {
      // sub-step timing of the MaxSim token-index deletion gate
      import org.apache.spark.sql.functions._
      import graft.operators.MaxSim
      val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
      val dead = col("vec_id") % 17 === 3 && col("vec_id") < 1700
      val docToks = MaxSim.subvectorTokens(emb, "vec_id", "embedding", 8)
        .withColumnRenamed("vec_id", "doc_id")
      val qToks = MaxSim.subvectorTokens(
          emb.where(col("vec_id") < 3), "vec_id", "embedding", 8)
        .withColumnRenamed("vec_id", "query_id")
      val idxDir = "/tmp/graft_probe_maxsimdel"
      (1 to 2).foreach { rep =>
        time(s"writeTokenIndex rep$rep")(
          MaxSim.writeTokenIndex(docToks, idxDir, nClusters = 16))
        time(s"delete rep$rep")(MaxSim.deleteFromTokenIndex(
          emb.where(dead).select(col("vec_id").as("doc_id")), idxDir))
        time(s"exact30 rep$rep")(
          MaxSim.maxSimTopK(docToks, qToks, k = 30).count())
        time(s"search1 rep$rep")(
          MaxSim.searchTokenIndex(spark, idxDir, qToks, k = 10,
            nProbe = 6, tokenTopT = 64).count())
        time(s"vacuum rep$rep")(MaxSim.vacuumTokenIndex(spark, idxDir))
        time(s"search2 rep$rep")(
          MaxSim.searchTokenIndex(spark, idxDir, qToks, k = 10,
            nProbe = 6, tokenTopT = 64).count())
      }
      spark.stop(); return
    }
    if (qnames == Seq("--maxsim")) {
      // recall margins for the pruned-MaxSim gate pins
      import org.apache.spark.sql.functions._
      import graft.operators.MaxSim
      val emb = graft.engine.Tables.t(spark, sfDir, "embeddings")
      val docToks = MaxSim.subvectorTokens(emb, "vec_id", "embedding", 8)
        .withColumnRenamed("vec_id", "doc_id")
      val qToks = MaxSim.subvectorTokens(
          emb.where(col("vec_id") < 5), "vec_id", "embedding", 8)
        .withColumnRenamed("vec_id", "query_id")
      val exact = MaxSim.maxSimTopK(docToks, qToks, k = 10)
        .select("query_id", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nProbe = sys.env.getOrElse("MAXSIM_NPROBE", "4").toInt
      val topT = sys.env.getOrElse("MAXSIM_TOPT", "32").toInt
      val approx = time("pruned")(
        MaxSim.maxSimTopKPruned(docToks, qToks, k = 10,
            nClusters = 16, nProbe = nProbe, tokenTopT = topT)
          .select("query_id", "doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))))
      val perQ = exact.groupBy(_._1).map { case (qid, rows) =>
        (qid, (rows.toSet & approx.filter(_._1 == qid).toSet).size,
          rows.length)
      }.toSeq.sortBy(_._1)
      perQ.foreach { case (qid, h, n) =>
        println(f"[probe] maxsim recall q$qid = $h/$n") }
      val mh = perQ.map(_._2).sum; val mn = perQ.map(_._3).sum
      println(f"[probe] maxsim mean = $mh/$mn = ${mh.toDouble / mn}%.3f")
      spark.stop(); return
    }
    if (qnames == Seq("--spans")) {
      // sub-step timing of the substring-dup span machinery
      import org.apache.spark.sql.functions._
      import graft.operators.{Dedup, StagingCaches}
      val docs = graft.engine.Tables.t(spark, sfDir, "documents")
      val baseFps = time("winnow base")(
        Dedup.winnowPosFingerprints(docs, "doc_id", "text", k = 12, w = 8).transform(StagingCaches.cache))
      println(s"[probe] baseFps rows = ${time("baseFps count")(baseFps.count())}")
      val capped = time("cap base")(
        Dedup.capPosFps(baseFps).transform(StagingCaches.cache))
      println(s"[probe] capped rows = ${time("capped count")(capped.count())}")
      val pairRows = time("self-join pairs")(
        Dedup.spanPairRows(capped)
          .repartition(col("id1"), col("id2"))
          .sortWithinPartitions("id1", "id2").transform(StagingCaches.cache))
      println(s"[probe] pairRows rows = ${time("pairRows count")(pairRows.count())}")
      val baseSpans = time("spans agg")(
        Dedup.spansFromPairRows(pairRows).transform(StagingCaches.cache))
      println(s"[probe] baseSpans rows = ${time("baseSpans count")(baseSpans.count())}")
      val basePos = time("positions semi")(
        Dedup.positionsForQualifiedPairs(pairRows, baseSpans))
      println(s"[probe] basePos rows = ${time("basePos count")(basePos.count())}")
      val extras = docs
        .where(col("doc_id") < 40 && length(col("text")) >= 250)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(substring(col("text"), 1, 90), lit(" <<"),
            md5(col("doc_id").cast("string")), lit(">> "),
            substring(col("text"), 120, 90)).as("text"))
      val deltaFps = time("winnow+cap delta")(Dedup.capPosFps(
        Dedup.winnowPosFingerprints(extras, "doc_id", "text",
          k = 12, w = 8)))
      val deltaRows = Dedup.spanPairRowsDelta(capped, deltaFps)
      val deltaPos = time("delta positions")(
        Dedup.positionsFromPairRows(deltaRows))
      println(s"[probe] deltaPos rows = ${time("deltaPos count")(deltaPos.count())}")
      val aug = docs.select("doc_id", "text").union(extras)
      val posns = basePos.union(deltaPos)
        .transform(StagingCaches.cache)
      println(s"[probe] posns rows = ${time("posns count")(posns.count())}")
      time("surgery")(
        Dedup.removeMatchedSpans(aug, "doc_id", "text", posns,
            k = 12, w = 8)
          .select(col("id").as("doc_id"), col("n_islands"),
            length(col("clean")).as("clean_n"),
            md5(col("clean")).as("clean_md5"))
          .orderBy("doc_id").count())
      time("surgery rerun")(
        Dedup.removeMatchedSpans(aug, "doc_id", "text", posns,
            k = 12, w = 8).count())
      println(s"[probe] distinct (pair,b_pos) = ${time("triples")(
        pairRows.select("id1", "id2", "b_pos").distinct().count())}")
      println(s"[probe] distinct pairs = ${time("pairs")(
        pairRows.select("id1", "id2").distinct().count())}")
      spark.stop(); return
    }
    qnames.foreach { qname =>
      val fn = SparkEntry.queries(qname)
      time(s"$qname cold")(fn(spark, sfDir).count())
      time(s"$qname warm")(fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
