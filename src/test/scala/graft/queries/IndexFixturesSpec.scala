package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The prebuilt-index fixture tier's contract: a clone of the memoized
  * snapshot is REBUILD-EQUIVALENT (search-row-identical to a fresh
  * writeIndex — determinism is what licenses sharing the write), and
  * clones are isolated (one invocation's tombstones/vacuum never leak
  * into the next — the idempotency the per-gate rebuild used to buy). */
class IndexFixturesSpec extends SparkSpec {

  test("cloned snapshot ≡ fresh rebuild, the snapshot builds once, and " +
      "a mutated clone never leaks into the next clone") {
    val emb = graft.engine.Tables.t(spark, sf001, "embeddings")
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_fixt_fresh").toString
    Similarity.writeIndex(emb, fresh, nClusters = 8)
    def rows(dir: String) =
      Similarity.searchIndex(spark, dir, emb.where(col("vec_id") < 5),
          k = 10, nProbe = 4)
        .collect().map(_.toString).sorted.toSeq
    val want = rows(fresh)
    var builds = 0
    val c1 = IndexFixtures.cloned(spark, sf001, "spec_ivf") { p =>
      builds += 1; Similarity.writeIndex(emb, p, nClusters = 8)
    }
    assert(rows(c1) == want, "clone diverged from a fresh rebuild")
    // mutate clone 1 through the full delete lifecycle — tombstone docs
    // that actually appear in the results, so the mutation is visible
    val victims = Similarity.searchIndex(spark, c1,
        emb.where(col("vec_id") < 5), k = 10, nProbe = 4)
      .where(col("rank") === 1).select("cand_id").distinct()
    Similarity.deleteFromIndex(
      victims.withColumnRenamed("cand_id", "vec_id"), c1)
    Similarity.vacuumIndex(spark, c1)
    assert(rows(c1) != want, "the mutation must be observable in clone 1")
    val c2 = IndexFixtures.cloned(spark, sf001, "spec_ivf") { p =>
      builds += 1; Similarity.writeIndex(emb, p, nClusters = 8)
    }
    assert(builds == 1, "snapshot must build once per (sf, kind) per JVM")
    assert(c2 != c1 && rows(c2) == want, "clone 2 saw clone 1's mutations")
  }
}
