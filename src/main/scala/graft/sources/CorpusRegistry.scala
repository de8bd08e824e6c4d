package graft.sources

/** Staleness-guarded build-once registry for corpus-derived artifacts
  * (search indexes, persisted edge aggregates, generated fixtures).
  *
  * The r11 registries were keyed by directory string alone and
  * assumed corpora immutable for the process lifetime — correct under
  * the bench/oracle contract, but a long-lived serving session
  * pointed at a REFRESHED directory silently kept answering from the
  * stale artifact. Every lookup here also compares a cheap content
  * signature of the corpus path (file count + total length + max
  * modification time, one recursive listing, no data read — the
  * ZOrderedCorpus (dir, numFiles) pattern generalized); a changed
  * signature evicts the stale entry (running its release hook, e.g.
  * `unpersist`) and rebuilds. Lookups on an unchanged corpus stay
  * O(listing).
  *
  * Scale note: on an object store a recursive listing of a huge
  * corpus costs RPCs, but it is the *minimum* evidence that the
  * artifact still describes the data; deployments that version
  * corpus directories immutably (the recommended layout) pay it only
  * on first build per directory name.
  */
final class CorpusRegistry[V](onEvict: V => Unit) {

  /** key -> (corpus signature at build time, artifact). */
  private val entries =
    scala.collection.mutable.Map.empty[String, (String, V)]

  /** The artifact for `dir` (plus an optional variant discriminator
    * for registries holding several artifacts per corpus), rebuilt
    * via `build` when absent OR when the corpus signature changed
    * since the cached build. */
  def get(dir: String, variant: String = "")(build: => V): V =
    synchronized {
      val key = if (variant.isEmpty) dir else s"$dir#$variant"
      val tag = CorpusRegistry.signature(dir)
      entries.get(key) match {
        case Some((t, v)) if t == tag => v
        case prev =>
          prev.foreach { case (_, v) => onEvict(v) }
          val v = build
          entries(key) = (tag, v)
          v
      }
    }

  /** Evicts everything (running the release hook on each artifact). */
  def clear(): Unit = synchronized {
    entries.values.foreach { case (_, v) => onEvict(v) }
    entries.clear()
  }
}

object CorpusRegistry {

  /** Content signature of a file or directory: file count, total
    * byte length, and max modification time folded into one hex tag.
    * Hadoop-FS so it works on any supported filesystem; `absent` for
    * a missing path (the build itself will raise the real error). */
  def signature(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) return "absent"
    var sz = 0L; var mt = 0L; var n = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      sz += s.getLen; mt = math.max(mt, s.getModificationTime); n += 1
    }
    java.lang.Long.toHexString((sz * 31L) ^ (mt * 17L) ^ n)
  }
}
