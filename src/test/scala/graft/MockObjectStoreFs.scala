package graft.testfs

import java.net.URI
import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Test stand-in for an object store's FileSystem semantics (s3a:/gs:
  * shape), backed by the local disk:
  *
  *  - `rename` is NOT a metadata operation: it refuses an existing
  *    destination (returns false, the s3a contract) and otherwise runs as
  *    copy + delete-source — so nothing it does is atomic;
  *  - no `AbstractFileSystem` binding exists for the scheme, so
  *    `FileContext.getFileContext` throws `UnsupportedFileSystemException`
  *    — exactly the situation `LakeFs.replace` must degrade through.
  *
  * Registered in tests via `fs.mockos.impl`; no such connector ships in
  * this container, which is why the contract is exercised against a mock.
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockos:///")
  override def getScheme: String = "mockos"

  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false
    else FileUtil.copy(this, src, this, dst, /*deleteSource=*/ true, getConf)
}
