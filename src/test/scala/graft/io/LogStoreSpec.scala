package graft.io

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Search

/**
 * In-memory CAS store — a metastore stand-in for object-store
 * deployments: the put-if-absent race is decided by a JVM-wide
 * `putIfAbsent` (never the filesystem), atomic publishes are
 * lock-guarded plain writes. Every call is counted so the spec can
 * prove the at-rest formats route commits through the CONFIGURED
 * store instead of filesystem primitives.
 */
class MemLogStore extends LogStore {
  import MemLogStore._

  def createExclusive(f: FileSystem, p: Path): Boolean = {
    claimCalls.incrementAndGet()
    val won = claims.putIfAbsent(p.toString, java.lang.Boolean.TRUE) == null
    // the marker file still lands on disk for listings/age-sweeps; the
    // EXCLUSIVITY came from the map, not the filesystem
    if (won) f.create(p, true).close()
    won
  }

  def writeAtomic(f: FileSystem, p: Path, content: String): Unit =
    lock.synchronized {
      writeCalls.incrementAndGet()
      val out = f.create(p, true)
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }

  def readSmall(f: FileSystem, p: Path): String = {
    readCalls.incrementAndGet()
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

object MemLogStore {
  val claims = new ConcurrentHashMap[String, java.lang.Boolean]()
  val claimCalls = new AtomicInteger(0)
  val writeCalls = new AtomicInteger(0)
  val readCalls = new AtomicInteger(0)
  val lock = new Object
}

class LogStoreSpec extends SparkSpec {

  // a SEPARATE session (shared SparkContext, own runtime conf) carries
  // the store override, so the suite never pollutes the shared session
  private lazy val s2 = {
    val s = spark.newSession()
    s.conf.set(LogStore.ConfKey, classOf[MemLogStore].getName)
    s
  }

  test("Versioned commits route slot claims through the configured " +
      "store; concurrent writers get distinct versions off the map CAS") {
    import s2.implicits._
    val path = "target/tmp/logstore-vt"
    Versioned.drop(s2, path)
    val before = MemLogStore.claimCalls.get()
    val vs = Await.result(Future.sequence((1 to 3).map(i => Future {
      Versioned.append(Seq((i.toLong, s"w$i")).toDF("k", "v"), path)
    })), 2.minutes)
    assert(MemLogStore.claimCalls.get() > before,
      "claims must go through the configured LogStore")
    assert(vs.toSet.size == 3, s"writers must take distinct slots: $vs")
    assert(Versioned.current(s2, path, "k").count() == 3)
  }

  test("Search generation commits publish markers through the " +
      "configured store and read them back through it") {
    import s2.implicits._
    val path = "target/tmp/logstore-idx"
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val (w0, r0) = (MemLogStore.writeCalls.get(), MemLogStore.readCalls.get())
    val idx = Search.writeIndex(docs, "doc_id", "text", path, nBuckets = 4)
    assert(MemLogStore.writeCalls.get() > w0,
      "the generation marker publish must go through the store")
    assert(Search.searchAll(s2, idx, Seq("beta")).count() == 2)
    assert(MemLogStore.readCalls.get() > r0,
      "marker read-back must go through the store")
  }

  test("the default session stays on FsLogStore (no bleed from the " +
      "overridden session)") {
    import spark.implicits._
    val path = "target/tmp/logstore-default"
    Versioned.drop(spark, path)
    val before = MemLogStore.claimCalls.get()
    Versioned.append(Seq((1L, "x")).toDF("k", "v"), path)
    assert(MemLogStore.claimCalls.get() == before,
      "default session must not touch the in-memory store")
    assert(Versioned.current(spark, path, "k").count() == 1)
  }
}
