package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Bucketing, Runner}
import graft.operators.Salting

class SaltingSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin returns exactly the plain join result on skewed keys") {
    // 90% of rows share one hot key.
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (20L, "a"), (40L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size > 1500) // the hot key actually joined
  }

  test("left salted join preserves unmatched rows") {
    val big = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val small = Seq((1L, "m")).toDF("k", "name")
    val out = Salting.saltedJoin(big, small, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toSet
    assert(out == Set((1L, false), (2L, true)))
  }
}

class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed co-located join plans without a shuffle exchange") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dims = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8)
    val joined = Bucketing.table(spark, "b_facts")
      .hint("merge")
      .join(Bucketing.table(spark, "b_dims"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 1000)
  }
}

class WarehousePersistSpec extends SparkSpec {

  import spark.implicits._

  test("parquet-backed warehouse survives atomically across puts") {
    val dir = Files.createTempDirectory("graft-wh").toString
    val wh = new Runner.Warehouse(spark, Some(dir))
    wh.put("t", Seq((1, "a")).toDF("id", "v"))
    assert(wh("t").count() == 1)
    wh.put("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(wh("t").count() == 2)
    // no staging leftovers
    assert(!Files.exists(java.nio.file.Paths.get(dir, ".t.staging")))
    // table readable from a fresh reader (the swap completed)
    assert(spark.read.parquet(s"$dir/t").count() == 2)
  }
}

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct lands within 5% of exact") {
    val l = engine.Tables.t(spark, sf001, "lineitem")
    val exact = l.select(countDistinct("l_partkey")).head.getLong(0)
    val approx = l.select(approx_count_distinct("l_partkey", 0.02))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}

class DynamicPruningSpec extends SparkSpec {

  test("dynamic partition pruning reaches the partitioned fact scan") {
    // fact partitioned by year on disk; dim rows select a year subset via
    // a NON-foldable filter (flag lives only in the dim file), so static
    // partition pruning cannot fire — only DPP can skip fact partitions.
    // At 100 TB this is the difference between scanning one year and
    // scanning the warehouse.
    val base = Files.createTempDirectory("graft-dpp").toString
    val orders = graft.engine.Tables.t(spark, sf001, "orders")
      .withColumn("oyear", year(col("o_orderdate")))
    orders.write.partitionBy("oyear").mode("overwrite")
      .parquet(s"$base/fact")
    orders.select(col("oyear")).distinct()
      .withColumn("flag", (col("oyear") % 2).cast("int"))
      .write.mode("overwrite").parquet(s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim").where(col("flag") === 0)
    val joined = fact.join(dim, "oyear")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    // and the pruned plan returns exactly the statically-filtered result
    val expected = orders.where((col("oyear") % 2) === 0).count()
    assert(joined.count() == expected)
  }
}

class BloomFilterJoinSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("runtime bloom filter prunes the probe side of a selective join") {
    // The row-level twin of DPP: a selective filter on the build side of
    // a shuffle join injects a bloom filter onto the probe-side SCAN, so
    // probe rows that cannot match die before the exchange — at 100 TB
    // the difference between shuffling the fact table and shuffling the
    // matching slice. Thresholds scaled to test volume; broadcast
    // disabled so the join actually shuffles (a broadcast join needs no
    // bloom — the filter exists to cut exchange volume).
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val line = spark.read.parquet(s"$sf001/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf001/orders.parquet")
        .where(col("o_totalprice") > 400000.0)
      val joined = line.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      val got = joined.head
      // bloom is a pre-filter, never a semantics change: same result with
      // the injection disabled
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "false")
      val expect = line.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .head
      assert(got == expect, s"$got != $expect")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
