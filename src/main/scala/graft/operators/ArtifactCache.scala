package graft.operators

/** Install-once management of the fingerprint-keyed /tmp artifact
  * caches (the S12 IVF index, the S16 packed store). Contract shared
  * by every user:
  *
  *  - the cache dir name is `<corpus-name>-<content-fingerprint>`, so
  *    a REGENERATED corpus gets a fresh artifact instead of silently
  *    serving the stale one;
  *  - the build lands in a `.build-<uuid>` temp dir and is RENAMED
  *    into place atomically, so a concurrent process either sees the
  *    complete artifact or builds its own;
  *  - on a lost cross-process rename race the losing build is removed
  *    BEFORE asserting the winner's artifact is usable, so the orphan
  *    cannot leak behind a throwing `require` (the r19 ADVICE
  *    finding);
  *  - STALE SIBLINGS are GC'd at build time: each regeneration of the
  *    same corpus produces a new fingerprint, and without collection
  *    the old dirs accumulate unboundedly (the caches must survive
  *    JVM exit — that is their point — so a shutdown-hook reap would
  *    defeat them; build-time sibling GC bounds the footprint to one
  *    live artifact per corpus name instead). Orphaned `.build-*`
  *    dirs from crashed builds are reaped once they are older than
  *    [[orphanMs]] — young ones may belong to a live concurrent
  *    build.
  *
  * Known narrow window (accepted trade of the GC): a process still
  * lazily reading a PRIOR fingerprint's artifact while another
  * process installs the regenerated corpus's cache loses its files
  * (unlink-during-read keeps open handles alive, but later actions
  * over the lazy frame re-list the dir and fail LOUDLY). That takes
  * a corpus regeneration mid-flight of a concurrent reader; the
  * pre-GC behavior was unbounded /tmp growth on every regeneration.
  */
private[graft] object ArtifactCache {

  /** Age past which a `.build-*` temp dir is assumed orphaned. */
  private val orphanMs = 24L * 3600 * 1000

  def rm(f: java.io.File): Unit = {
    // listFiles() is null on permission errors / concurrent removal:
    // treat as empty rather than NPE mid-cleanup
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(): Unit
  }

  /** Ensure `<root>/<corpusName>-<fingerprint>` holds a complete
    * artifact (per `complete`), building it via `build(tmpDir)` +
    * atomic rename when absent. Returns the cache dir. One JVM-wide
    * lock: concurrent in-process callers must not double-build, and
    * artifact builds are seconds-long, not contended.
    */
  def ensure(root: java.io.File, corpusName: String, fingerprint: String,
      complete: java.io.File => Boolean)(
      build: java.io.File => Unit): java.io.File = synchronized {
    val cache = new java.io.File(root, s"$corpusName-$fingerprint")
    if (!complete(cache)) {
      val now = System.currentTimeMillis()
      Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
        val stale = f.getName.startsWith(s"$corpusName-") &&
          f.getName != cache.getName
        val orphan = f.getName.startsWith(".build-") &&
          now - f.lastModified() > orphanMs
        if (stale || orphan) rm(f)
      }
      val tmp = new java.io.File(root,
        s".build-${java.util.UUID.randomUUID}")
      build(tmp)
      if (!tmp.renameTo(cache)) {
        // lost a cross-process race: drop our build FIRST, then
        // assert the winner's artifact is complete (rename is atomic,
        // so a complete cache dir is the only way the rename fails
        // against a healthy filesystem)
        rm(tmp)
        require(complete(cache),
          s"artifact cache $cache unusable and rename failed")
      }
    }
    cache
  }
}
