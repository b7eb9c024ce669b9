package graft.queries

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Shared PREBUILT clean-index snapshots for the `*_index_delete`
  * lifecycle gates.
  *
  * Every index-lifecycle gate is idempotent per invocation: it must
  * start from a clean index no matter how many times the bench re-runs
  * it. Until r14 each delete gate guaranteed that by REBUILDING its
  * index per invocation — principled, but the bench then re-pays five
  * full `writeIndex` passes per run while the clean index it rebuilds
  * is byte-identical every time (deterministic fits, deterministic
  * writes). This tier keeps the contract but amortizes the write: the
  * FIRST gate to ask for a kind builds one snapshot per (sf dir, kind)
  * in this JVM, and every invocation gets its own cheap local COPY to
  * mutate (tombstones, vacuum swaps) — a fresh copy is
  * rebuild-equivalent by determinism, and IndexFixturesSpec pins
  * exactly that (cloned snapshot ≡ fresh rebuild, search-row-identical,
  * including after delete+vacuum).
  *
  * The snapshot is keyed in MEMORY, not trusted from disk: a stale
  * on-disk snapshot from an older binary must never serve this run, so
  * first touch per JVM always rebuilds (the build target is wiped
  * first). At 100 TB the same shape holds with the snapshot on shared
  * storage and the "copy" a cheap metadata clone — the point is that
  * the delete lifecycle's cost is the DELETE work, not a rebuild of
  * what it deletes from.
  */
object IndexFixtures {

  private val built = scala.collection.concurrent.TrieMap
    .empty[(String, String), String] // (sfDir, kind) -> snapshot dir

  /** A fresh, private, mutable copy of the memoized clean `kind` index
    * for `sfDir` (built via `build` on first touch per JVM). */
  def cloned(s: SparkSession, sfDir: String, kind: String)
            (build: String => Unit): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val snap = built.getOrElseUpdate((sfDir, kind), {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_fixture_$kind",
        sfDir.replace('/', '_').replace(':', '_')).toString
      val sp = new Path(p)
      val fs = sp.getFileSystem(conf)
      fs.delete(sp, true) // never inherit a previous JVM's layout
      build(p)
      p
    })
    val work = java.nio.file.Files
      .createTempDirectory(s"graft_${kind}_clone").toString
    val fs = new Path(work).getFileSystem(conf)
    // the temp dir already exists — copy each child so the clone has
    // the snapshot's layout directly under `work` (no nesting)
    fs.listStatus(new Path(snap)).foreach { st =>
      FileUtil.copy(fs, st.getPath, fs,
        new Path(work, st.getPath.getName), false, conf)
    }
    work
  }
}
