package graft

import graft.sync.LakeFs
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the lake layer's Hadoop filesystem seam (file:
  * scheme — the only one in this container; hdfs:/s3a: resolve through the
  * same API by scheme). */
class LakeFsSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lakefs").toString

  test("writeUtf8/readUtf8 round trip, exists, list") {
    val d = tmp()
    assert(!LakeFs.exists(s"$d/a.txt"))
    LakeFs.writeUtf8(s"$d/a.txt", "hello\tworld")
    assert(LakeFs.exists(s"$d/a.txt"))
    assert(LakeFs.readUtf8(s"$d/a.txt") == "hello\tworld")
    LakeFs.mkdirs(s"$d/sub")
    val names = LakeFs.list(d).map(_.getPath.getName).toSet
    assert(names.contains("a.txt") && names.contains("sub"))
    assert(LakeFs.list(s"$d/missing").isEmpty)
  }

  test("replace is an overwrite publish; rename refuses nothing on fresh dst") {
    val d = tmp()
    LakeFs.writeUtf8(s"$d/ptr", "old")
    LakeFs.writeUtf8(s"$d/ptr.tmp", "new")
    LakeFs.replace(s"$d/ptr.tmp", s"$d/ptr")
    assert(LakeFs.readUtf8(s"$d/ptr") == "new")
    assert(!LakeFs.exists(s"$d/ptr.tmp"))
    // publish-style rename to an absent destination
    LakeFs.mkdirs(s"$d/.tmp-0")
    LakeFs.writeUtf8(s"$d/.tmp-0/f", "x")
    assert(LakeFs.rename(s"$d/.tmp-0", s"$d/0"))
    assert(LakeFs.readUtf8(s"$d/0/f") == "x")
    assert(!LakeFs.exists(s"$d/.tmp-0"))
  }

  test("delete is recursive and tolerant of missing paths; sizeBytes totals a tree") {
    val d = tmp()
    LakeFs.writeUtf8(s"$d/t/x", "12345")
    LakeFs.writeUtf8(s"$d/t/sub/y", "abc")
    assert(LakeFs.sizeBytes(s"$d/t") == 8L)
    LakeFs.delete(s"$d/t")
    assert(!LakeFs.exists(s"$d/t"))
    LakeFs.delete(s"$d/never-existed") // no-op, no throw
    assert(LakeFs.sizeBytes(s"$d/never-existed") == 0L)
  }

  test("replace is atomic under a concurrent reader (file: commit contract)") {
    val d = tmp()
    def content(i: Int) = f"base-$i%06d\t$i%06d" // fixed width: isolates rename
    LakeFs.writeUtf8(s"$d/ptr", content(0))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val s =
          try LakeFs.readUtf8(s"$d/ptr")
          catch { case e: Throwable => "EXC:" + e.getClass.getSimpleName }
        if (!s.matches("base-\\d{6}\t\\d{6}")) torn.compareAndSet(null, s)
      }
    })
    reader.start()
    (1 to 400).foreach { i =>
      LakeFs.writeUtf8(s"$d/ptr.tmp", content(i))
      LakeFs.replace(s"$d/ptr.tmp", s"$d/ptr")
    }
    stop.set(true)
    reader.join(10000)
    assert(torn.get == null, s"reader observed torn pointer state: ${torn.get}")
    assert(LakeFs.readUtf8(s"$d/ptr") == content(400))
  }

  test("scheme-qualified file: URIs resolve to the same store as bare paths") {
    val d = tmp()
    LakeFs.writeUtf8(s"file:$d/q.txt", "via-uri")
    assert(LakeFs.readUtf8(s"$d/q.txt") == "via-uri")
    LakeFs.replace(s"file:$d/q.txt", s"file:$d/q2.txt")
    assert(LakeFs.readUtf8(s"$d/q2.txt") == "via-uri")
  }
}
