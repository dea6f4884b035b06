package graft.store

import java.io.{FileNotFoundException, IOException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Filesystem-contract edges the domain pipeline depends on (committer
  * renames, recursive deletes, seekable reads) — kept separate from the
  * end-to-end memory-domain battery in DomainStoreSpec. */
class RamFileSystemSpec extends AnyFunSuite {

  // Scoped clears only: DomainStoreSpec's memory battery may be running
  // concurrently in this JVM on its own authority.
  private def freshFs(): FileSystem = {
    RamFileSystem.clear("t")
    RamFileSystem.clear("other")
    val conf = new Configuration()
    RamFileSystem.register(conf)
    new Path("ramfs://t/").getFileSystem(conf)
  }

  private def put(fs: FileSystem, p: String, body: String): Unit = {
    val out = fs.create(new Path(p), true)
    out.write(body.getBytes("UTF-8"))
    out.close()
  }

  private def get(fs: FileSystem, p: String): String = {
    val in = fs.open(new Path(p))
    val bytes = new Array[Byte](fs.getFileStatus(new Path(p)).getLen.toInt)
    in.readFully(0L, bytes)
    in.close()
    new String(bytes, "UTF-8")
  }

  test("create/open round-trip with seek and positioned read") {
    val fs = freshFs()
    put(fs, "ramfs://t/a/b/file.bin", "hello ramfs")
    assert(get(fs, "ramfs://t/a/b/file.bin") === "hello ramfs")
    val in = fs.open(new Path("ramfs://t/a/b/file.bin"))
    in.seek(6)
    val rest = new Array[Byte](5)
    in.readFully(rest)
    assert(new String(rest, "UTF-8") === "ramfs")
    assert(in.getPos === 11)
    val mid = new Array[Byte](4)
    in.readFully(2L, mid) // positioned read must not move the cursor
    assert(new String(mid, "UTF-8") === "llo ")
    assert(in.getPos === 11)
    in.close()
    // parents materialized as directories
    assert(fs.getFileStatus(new Path("ramfs://t/a")).isDirectory)
    assert(fs.listStatus(new Path("ramfs://t/a")).map(_.getPath.getName).toSeq === Seq("b"))
  }

  test("rename: plain move, and move-into-existing-directory semantics") {
    val fs = freshFs()
    put(fs, "ramfs://t/src/x.txt", "x")
    put(fs, "ramfs://t/src/sub/y.txt", "y")
    // committer-style directory rename to a fresh path
    assert(fs.rename(new Path("ramfs://t/src"), new Path("ramfs://t/dst")))
    assert(get(fs, "ramfs://t/dst/x.txt") === "x")
    assert(get(fs, "ramfs://t/dst/sub/y.txt") === "y")
    assert(!fs.exists(new Path("ramfs://t/src")))
    // renaming onto an existing directory moves the source inside it
    fs.mkdirs(new Path("ramfs://t/into"))
    assert(fs.rename(new Path("ramfs://t/dst"), new Path("ramfs://t/into")))
    assert(get(fs, "ramfs://t/into/dst/sub/y.txt") === "y")
    // renaming a missing source reports false, not an exception
    assert(!fs.rename(new Path("ramfs://t/nope"), new Path("ramfs://t/x")))
  }

  test("delete: non-recursive on a non-empty dir throws; recursive wipes subtree") {
    val fs = freshFs()
    put(fs, "ramfs://t/d/one", "1")
    put(fs, "ramfs://t/d/deep/two", "2")
    intercept[IOException](fs.delete(new Path("ramfs://t/d"), false))
    assert(fs.delete(new Path("ramfs://t/d"), true))
    assert(!fs.exists(new Path("ramfs://t/d")))
    assert(!fs.exists(new Path("ramfs://t/d/deep/two")))
    // deleting a missing path reports false
    assert(!fs.delete(new Path("ramfs://t/d"), true))
  }

  test("missing paths: open and listStatus throw FileNotFoundException") {
    val fs = freshFs()
    intercept[FileNotFoundException](fs.open(new Path("ramfs://t/absent")))
    intercept[FileNotFoundException](fs.listStatus(new Path("ramfs://t/absent")))
    intercept[FileNotFoundException](fs.getFileStatus(new Path("ramfs://t/absent")))
  }

  test("file mtimes advance on every rewrite (the tokenMtime fingerprint)") {
    // VersionedStore.tokenMtime is the same-version-rebuild cache
    // fingerprint (IndexMarker keys marker verdicts by it) — a constant
    // mtime would make it inert on exactly the filesystem memory-format
    // domains must use, so a ramfs rebuild at the same version id would
    // serve pre-rebuild cached verdicts
    val fs = freshFs()
    put(fs, "ramfs://t/mt/f", "one")
    val m1 = fs.getFileStatus(new Path("ramfs://t/mt/f")).getModificationTime
    put(fs, "ramfs://t/mt/f", "two")
    val m2 = fs.getFileStatus(new Path("ramfs://t/mt/f")).getModificationTime
    assert(m2 > m1, s"rewrite did not advance mtime ($m1 -> $m2)")
    // rename stamps the destination fresh (a re-created token must never
    // alias an older fingerprint)
    put(fs, "ramfs://t/mt/g", "three")
    val g1 = fs.getFileStatus(new Path("ramfs://t/mt/g")).getModificationTime
    assert(fs.rename(new Path("ramfs://t/mt/g"), new Path("ramfs://t/mt/h")))
    val h = fs.getFileStatus(new Path("ramfs://t/mt/h")).getModificationTime
    assert(h > g1)
  }

  test("namespaces are per-authority; scoped clear wipes only its own") {
    val fs = freshFs()
    put(fs, "ramfs://t/f", "t-data")
    val conf = new Configuration()
    RamFileSystem.register(conf)
    val other = new Path("ramfs://other/").getFileSystem(conf)
    intercept[FileNotFoundException](other.open(new Path("ramfs://other/f")))
    put(other, "ramfs://other/f", "other-data")
    RamFileSystem.clear("other")
    assert(get(fs, "ramfs://t/f") === "t-data")
    intercept[FileNotFoundException](other.open(new Path("ramfs://other/f")))
  }
}
