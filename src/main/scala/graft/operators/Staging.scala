package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Shared commit protocol for every persisted on-disk artifact the
  * engine stages under `/root/repo/target` (LSH dedup index, IVF
  * vector index, roundtrip/evolution/corrupt-json/compaction/
  * csv-dialect/snapshot layouts). One implementation of the
  * `stageTextDir` convention instead of eight inlined copies
  * (ADVICE r12 #3): `_SOURCE` freshness check, fresh temp sibling,
  * atomic swap (rename aside + rename into place), bottom-up delete
  * of the displaced tree — a concurrent reader never sees a
  * half-written staging and a repeat call is a marker read.
  */
object Staging {

  /** 8-hex MD5 key of the absolute source path — keeps SF sweeps
    * inside one session from colliding in a shared staging root.
    */
  def dirKey(dir: String): String = {
    val abs = Paths.get(dir).toAbsolutePath.normalize
    java.security.MessageDigest.getInstance("MD5")
      .digest(abs.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
  }

  /** `<root>/<basename>_<key>` — the staging-path rule every root
    * shares.
    */
  def pathFor(root: String, dir: String): String = {
    val abs = Paths.get(dir).toAbsolutePath.normalize
    s"$root/${abs.getFileName}_${dirKey(dir)}"
  }

  /** Bottom-up recursive delete with the walk stream CLOSED (ADVICE
    * r9 #5 — a bare `Files.walk(...).iterator()` leaks the directory
    * stream's file handle).
    */
  def deleteTree(root: Path): Unit = {
    val walk = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    } finally walk.close()
  }

  /** The `_SOURCE` marker: source path PLUS a cheap content
    * fingerprint (file count, total bytes, max mtime over the source
    * tree — one directory walk, no data read). A corpus regenerated
    * IN PLACE therefore forces a rebuild instead of silently serving
    * an index of the old data (ADVICE r12 #4); a spurious marker
    * change only costs a re-stage, never a stale read.
    */
  def sourceMarker(dir: String): String = {
    val root = Paths.get(dir).toAbsolutePath.normalize
    var n = 0L; var bytes = 0L; var mtime = 0L
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(Files.isRegularFile(_)).foreach { p =>
          n += 1; bytes += Files.size(p)
          mtime = math.max(mtime, Files.getLastModifiedTime(p).toMillis)
        }
      } finally walk.close()
    }
    s"$root\nfiles=$n bytes=$bytes mtime=$mtime"
  }

  /** Stage (once, idempotently) the artifact for `dir` under `root`:
    * if `_SOURCE` no longer matches `sourceMarker(dir)`, run `write`
    * into a fresh temp sibling and atomically swap it into place.
    * Returns the staging path.
    */
  def stagedDir(root: String, dir: String)(write: Path => Unit): String =
    synchronized {
      val stage = pathFor(root, dir)
      val stagePath = Paths.get(stage)
      val marker = sourceMarker(dir)
      val cur =
        try new String(Files.readAllBytes(stagePath.resolve("_SOURCE")), "UTF-8")
        catch { case _: Exception => "" }
      if (cur != marker) {
        val nonce = System.nanoTime()
        val tmp = Paths.get(s"$stage.tmp-$nonce")
        write(tmp)
        Files.write(tmp.resolve("_SOURCE"), marker.getBytes("UTF-8"))
        val old = Paths.get(s"$stage.old-$nonce")
        if (Files.exists(stagePath))
          Files.move(stagePath, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, stagePath, StandardCopyOption.ATOMIC_MOVE)
        if (Files.exists(old)) deleteTree(old)
      }
      stage
    }
}
