package graft.queries

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Shared PREBUILT clean-index snapshots for the persisted-index
  * lifecycle gates (search / append / recenter / delete, all five
  * kinds: IVF, IVF-PQ, BM25, phrase, MaxSim tokens).
  *
  * Every index-lifecycle gate is idempotent per invocation: it must
  * start from a clean index no matter how many times the bench re-runs
  * it. Until r14 each gate guaranteed that by REBUILDING its index per
  * invocation — principled, but one bench run then paid ~15 full
  * `writeIndex` passes while the clean index each rebuild produces is
  * byte-identical every time (deterministic fits, deterministic
  * writes). This tier keeps the contract but amortizes the write: ONE
  * snapshot per (sf dir, kind) per JVM (pre-built by the staging
  * warmup, or by the first gate to touch the kind), read directly by
  * search-only gates ([[shared]]) and copied cheaply for mutating
  * gates ([[cloned]]) — a fresh copy is rebuild-equivalent by
  * determinism, and IndexFixturesSpec pins exactly that (cloned
  * snapshot ≡ fresh rebuild, search-row-identical, including after
  * delete+vacuum).
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

  /** The memoized clean `kind` snapshot for `sfDir` (built via `build`
    * on first touch per JVM) — for READ-ONLY consumers (search-only
    * gates) and the staging warmup; mutating gates go through
    * [[cloned]]. */
  def shared(s: SparkSession, sfDir: String, kind: String)
            (build: String => Unit): String =
    built.getOrElseUpdate((sfDir, kind), {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_fixture_$kind",
        sfDir.replace('/', '_').replace(':', '_')).toString
      val sp = new Path(p)
      val fs = sp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(sp, true) // never inherit a previous JVM's layout
      build(p)
      p
    })

  /** Clones handed out by [[cloned]] this JVM — deleted on exit so
    * repeated bench reps / long-lived hosts never accumulate full index
    * copies in the temp dir (each mutating-gate invocation clones; a
    * multi-rep bench would otherwise leave reps×gates copies behind). */
  private val clones =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    clones.forEach { p =>
      try {
        val sp = new Path(p)
        sp.getFileSystem(new org.apache.hadoop.conf.Configuration())
          .delete(sp, true)
        ()
      } catch { case _: Throwable => () }
    }))

  /** A fresh, private, mutable copy of the memoized clean `kind` index
    * for `sfDir` — for gates that tombstone/append/vacuum/recenter.
    * Registered for deletion at JVM exit.
    *
    * Files HARDLINK to the snapshot instead of copying: parquet data
    * files are immutable once written (every mutation in this library
    * is write-new-then-swap or append-new-file — nothing rewrites a
    * file in place), so a link-clone behaves identically to a copy at
    * near-zero cost, and deleting the clone merely unlinks. Falls back
    * to a byte copy per file when linking is unsupported (non-local
    * fs, cross-device temp). This is dev-fixture machinery — the
    * production clone of an index is a storage-layer copy job. */
  def cloned(s: SparkSession, sfDir: String, kind: String)
            (build: String => Unit): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val snap = shared(s, sfDir, kind)(build)
    val work = java.nio.file.Files
      .createTempDirectory(s"graft_${kind}_clone").toString
    clones.add(work)
    val fs = new Path(work).getFileSystem(conf)
    def linkTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(from)) {
        java.nio.file.Files.createDirectories(to)
        val it = java.nio.file.Files.list(from).iterator()
        while (it.hasNext) {
          val c = it.next()
          linkTree(c, to.resolve(c.getFileName))
        }
      } else java.nio.file.Files.createLink(to, from)
    }
    fs.listStatus(new Path(snap)).foreach { st =>
      val from = java.nio.file.Paths.get(st.getPath.toUri.getPath)
      val to = java.nio.file.Paths.get(work, st.getPath.getName)
      try linkTree(from, to)
      catch {
        case scala.util.control.NonFatal(_) =>
          // clear any partial link tree, then fall back to a byte copy
          fs.delete(new Path(work, st.getPath.getName), true)
          FileUtil.copy(fs, st.getPath, fs,
            new Path(work, st.getPath.getName), false, conf)
      }
    }
    work
  }
}
