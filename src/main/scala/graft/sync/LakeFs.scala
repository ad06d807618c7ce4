package graft.sync

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem seam for the lake layer ([[LakeTable]], [[ChangeLog]],
  * [[graft.state.SyncStateStore]]).
  *
  * All metadata IO — pointer files, commit-dir publishing, listings, GC —
  * goes through the Hadoop FileSystem API resolved from each path's URI
  * scheme, so the delta-commit layout works unchanged on `file:`, `hdfs:`,
  * `viewfs:`, `abfs(s):` — the storage a 100 TB table actually lives on —
  * with the local filesystem as just another scheme (and the default for
  * scheme-less paths when no `fs.defaultFS` is configured).
  *
  * Atomicity contract: [[replace]] publishes a file over an existing one
  * atomically where the scheme supports it — POSIX rename on `file:` (the
  * `FileSystem.rename` fast path), `rename2(OVERWRITE)` on `hdfs:` (the
  * `FileContext` fallback). Object stores (`s3a:`, `gs:`, …) emulate rename
  * with copy+delete; [[warnIfNonAtomic]] logs once per scheme that commit
  * visibility degrades there. A torn pointer is still recoverable:
  * `LakeTable.resolve` degrades a corrupt pointer to table-missing (the
  * marks-style degrade-to-standard rule) rather than failing the table.
  */
object LakeFs {

  /** Hadoop conf from the active Spark session when present (so `fs.*`
    * settings — endpoints, credentials, defaultFS — flow through), else a
    * vanilla conf (local filesystem). */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Scheme-resolved (and instance-cached, by Hadoop) filesystem for `p`.
    * On the local scheme the CHECKSUM wrapper is bypassed (`getRaw`):
    * metadata files then carry no `.crc` sidecar, so the pointer swap is
    * exactly ONE atomic rename syscall — with the wrapper, data and crc
    * rename separately and a concurrent reader could transiently pair new
    * data with the old checksum. HDFS/object stores checksum internally
    * and are unaffected. */
  def fs(p: String): FileSystem =
    new Path(p).getFileSystem(hadoopConf) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
      case other => other
    }

  def exists(p: String): Boolean = fs(p).exists(new Path(p))

  def mkdirs(p: String): Unit = { fs(p).mkdirs(new Path(p)); () }

  def mkdirsParent(p: String): Unit = {
    val parent = new Path(p).getParent
    if (parent != null) { fs(p).mkdirs(parent); () }
  }

  /** Child statuses of `p`; empty when the path doesn't exist. */
  def list(p: String): Seq[FileStatus] = {
    val f = fs(p)
    val hp = new Path(p)
    if (!f.exists(hp)) Seq.empty else f.listStatus(hp).toSeq
  }

  def readUtf8(p: String): String = {
    val f = fs(p)
    val hp = new Path(p)
    val len = f.getFileStatus(hp).getLen.toInt
    val buf = new Array[Byte](len)
    val in = f.open(hp)
    try in.readFully(0, buf)
    finally in.close()
    new String(buf, "UTF-8")
  }

  def writeUtf8(p: String, body: String): Unit = {
    val out = fs(p).create(new Path(p), true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
  }

  /** Replace `dst` with `src`, atomically where the scheme supports it.
    * `FileSystem.rename` replaces atomically on `file:` (POSIX rename) but
    * refuses an existing dst on `hdfs:` (returns false); the `FileContext`
    * fallback is hdfs's atomic `rename2(OVERWRITE)`. A scheme with neither
    * primitive (object stores: no `AbstractFileSystem` binding, rename
    * refuses existing dst) degrades to delete+rename — NON-atomic: a
    * concurrent reader can observe dst briefly missing, which
    * `LakeTable.resolve` already treats as table-missing/degrade
    * (same recovery as a torn pointer; [[warnIfNonAtomic]] flags the
    * scheme once). */
  def replace(src: String, dst: String): Unit = {
    val f = fs(dst)
    if (!f.rename(new Path(src), new Path(dst))) {
      val renamed2 =
        try {
          val fc = FileContext.getFileContext(f.getUri, hadoopConf)
          fc.rename(new Path(src), new Path(dst), Options.Rename.OVERWRITE)
          true
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException => false
        }
      if (!renamed2) {
        f.delete(new Path(dst), false)
        if (!f.rename(new Path(src), new Path(dst)))
          throw new IllegalStateException(s"pointer replace failed: $src -> $dst")
      }
    }
  }

  /** Publish rename that expects `dst` to be absent (commit-dir publish);
    * false signals a collision or failure. (On `file:` an existing dst file
    * would be replaced — same POSIX semantics the pre-Hadoop implementation
    * had; commit numbering is derived from a fresh listing under the
    * single-writer rule, so collisions indicate a protocol bug upstream.) */
  def rename(src: String, dst: String): Boolean =
    fs(dst).rename(new Path(src), new Path(dst))

  /** Recursive delete; no-op when missing. */
  def delete(p: String): Unit = { fs(p).delete(new Path(p), true); () }

  /** Total bytes under `p` (file or directory tree). */
  def sizeBytes(p: String): Long = {
    val f = fs(p)
    val hp = new Path(p)
    if (!f.exists(hp)) 0L else f.getContentSummary(hp).getLength
  }

  // Schemes whose rename is a real metadata operation. Everything else
  // (s3a:, s3:, gs:, oss:, swift:, …) emulates rename with copy+delete.
  private val AtomicRenameSchemes =
    Set("file", "hdfs", "viewfs", "abfs", "abfss", "ofs", "o3fs")

  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Warn once per scheme when the commit protocol's rename is emulated.
    * Returns whether `p`'s scheme is a rename-emulating one (the warning
    * condition), so callers/tests can assert the classification. */
  def warnIfNonAtomic(p: String): Boolean = {
    val scheme = Option(fs(p).getUri.getScheme).getOrElse("file")
    val nonAtomic = !AtomicRenameSchemes.contains(scheme)
    if (nonAtomic && warned.add(scheme))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"filesystem scheme '$scheme' emulates rename (copy+delete): lake pointer " +
          "swaps are not atomic there; a concurrent reader may transiently observe a " +
          "missing/torn pointer (recovered as table-missing, degrade-to-standard). " +
          "Prefer hdfs:/abfs: for the commit metadata at scale.")
    nonAtomic
  }
}
