package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Atomic put-if-absent primitives shared by the at-rest state formats
 * ([[Versioned]] version slots, [[graft.pipeline.Search]] index
 * generations). On `file://` the exclusive create uses NIO
 * `Files.createFile` — a true O_CREAT|O_EXCL, atomic against every
 * other process on the machine; on HDFS `create(overwrite = false)`
 * is a single atomic namenode op. Object stores without put-if-absent
 * need a metastore CAS instead (the standard Delta/Iceberg LogStore
 * caveat).
 */
private[graft] object FsCas {

  /** Atomically create `p` iff absent; true when this caller won. */
  def createExclusive(f: FileSystem, p: Path): Boolean =
    if (f.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }

  /** Write `content` to `p` ATOMICALLY: stage to a hidden sibling,
    * publish with one rename. `p`'s slot must already be claimed (no
    * destination conflict). A reader never observes a partial file. */
  def writeAtomic(f: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent,
      s".tmp-${p.getName}-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (!f.rename(tmp, p)) {
      f.delete(tmp, true)
      sys.error(s"atomic publish of $p failed: destination occupied")
    }
  }

  /** Read a small text file fully (driver-side metadata only). */
  def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
