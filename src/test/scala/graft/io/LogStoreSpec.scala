package graft.io

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

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

  // reclamation frees the authoritative map slot, not just the mirror
  // file — the same contract JdbcLogStore honors against its DB rows
  override def delete(f: FileSystem, p: Path): Unit = {
    claims.remove(p.toString)
    f.delete(p, false)
    ()
  }

  def readSmall(f: FileSystem, p: Path): String = lock.synchronized {
    // reads share the writers' lock: this stand-in publishes with a
    // plain in-place write, so the lock is what makes a concurrent
    // reader see ABSENT-or-COMPLETE (a real store gets this from
    // rename or a transactional row instead)
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

/**
 * The [[LogStore]] CONFORMANCE KIT: every implementation must pass
 * these — primitive semantics (one CAS winner under contention,
 * atomic publish/read-back) and the two at-rest formats committing
 * end-to-end through the configured store. Mix into a suite per
 * implementation; [[FsLogStoreContractSpec]], [[MemLogStoreContractSpec]]
 * and [[JdbcLogStoreContractSpec]] instantiate it for the shipped
 * stores, and a deployment adding its own store (an S3-metastore CAS)
 * reruns the identical contract by adding one subclass here.
 */
trait LogStoreContract { this: SparkSpec =>

  /** Display name, and the tag keeping per-impl work dirs disjoint. */
  def storeName: String

  /** Apply the implementation's session configuration. */
  def configure(s: SparkSession): Unit

  // a SEPARATE session (shared SparkContext, own runtime conf) carries
  // the store override, so the contract never pollutes the shared
  // session other suites use
  protected lazy val s2: SparkSession = {
    val s = spark.newSession()
    configure(s)
    s
  }

  private def store: LogStore = LogStore.forSession(s2)

  private def fsFor(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test(s"$storeName: concurrent createExclusive elects exactly ONE " +
      "winner; the claimed slot is visible on the filesystem") {
    val p = new Path(s"target/tmp/logstore-$storeName-claim-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = fsFor(p)
    val wins = Await.result(Future.sequence((1 to 16).map(_ => Future {
      store.createExclusive(f, p)
    })), 2.minutes).count(identity)
    assert(wins == 1, s"$wins winners for one slot")
    assert(f.exists(p), "winner must leave the slot marker on disk")
    // the slot stays taken on a later probe
    assert(!store.createExclusive(f, p))
  }

  test(s"$storeName: writeAtomic publishes content readSmall returns") {
    // publish-once per path — all the formats need (markers and
    // per-version sidecars are fresh paths). Re-publish over an
    // existing path is a metastore-store extension, tested there.
    val p = new Path(s"target/tmp/logstore-$storeName-pub-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = fsFor(p)
    store.writeAtomic(f, p, "v1:payload")
    assert(store.readSmall(f, p) == "v1:payload")
  }

  test(s"$storeName: a reader never observes a partial publish — the " +
      "path is ABSENT or COMPLETE while a slow write is in flight") {
    val p = new Path(s"target/tmp/logstore-$storeName-atomic-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = fsFor(p)
    val payload = "x" * 65536
    val writer = Future { store.writeAtomic(f, p, payload) }
    var sawPartial = false
    while (!writer.isCompleted) {
      Thread.sleep(1)
      if (f.exists(p)) {
        val got = try Some(store.readSmall(f, p)) catch { case _: Exception => None }
        got.foreach(s => if (s.nonEmpty && s != payload) sawPartial = true)
      }
    }
    Await.result(writer, 1.minute)
    assert(!sawPartial, "observed a torn publish")
    assert(store.readSmall(f, p) == payload)
  }

  test(s"$storeName: delete frees a claimed slot — createExclusive " +
      "wins it again afterwards") {
    val p = new Path(s"target/tmp/logstore-$storeName-free-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = fsFor(p)
    assert(store.createExclusive(f, p))
    assert(!store.createExclusive(f, p))
    store.delete(f, p)
    assert(!f.exists(p), "delete must remove the mirror file")
    assert(store.createExclusive(f, p),
      "a deleted slot must be claimable again (never burned forever)")
    store.delete(f, p)
  }

  test(s"$storeName: listClaims surfaces a fresh claim under its dir " +
      "and delete removes it from the listing") {
    val dir = new Path(s"target/tmp/logstore-$storeName-ls-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = fsFor(dir)
    f.mkdirs(dir)
    assert(store.listClaims(f, dir).isEmpty)
    assert(store.createExclusive(f, new Path(dir, ".claim-7")))
    assert(store.listClaims(f, dir).contains(".claim-7"))
    // deeper claims (another log's) must not leak into this dir's list
    assert(store.createExclusive(f, new Path(dir, "sub/.claim-9")))
    assert(!store.listClaims(f, dir).contains(".claim-9"))
    store.delete(f, new Path(dir, ".claim-7"))
    assert(!store.listClaims(f, dir).contains(".claim-7"))
  }

  test(s"$storeName: Versioned concurrent appends take distinct " +
      "version slots through the store") {
    import s2.implicits._
    val path = s"target/tmp/logstore-$storeName-vt"
    Versioned.drop(s2, path)
    val vs = Await.result(Future.sequence((1 to 3).map(i => Future {
      Versioned.append(Seq((i.toLong, s"w$i")).toDF("k", "v"), path)
    })), 2.minutes)
    assert(vs.toSet.size == 3, s"writers must take distinct slots: $vs")
    assert(Versioned.current(s2, path, "k").count() == 3)
  }

  test(s"$storeName: Search generation markers commit and read back " +
      "through the store") {
    import s2.implicits._
    val path = s"target/tmp/logstore-$storeName-idx"
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val idx = Search.writeIndex(docs, "doc_id", "text", path, nBuckets = 4)
    assert(Search.searchAll(s2, idx, Seq("beta")).count() == 2)
  }
}

/** The default filesystem store, run through the identical contract. */
class FsLogStoreContractSpec extends SparkSpec with LogStoreContract {
  def storeName = "fs"
  def configure(s: SparkSession): Unit =
    s.conf.set(LogStore.ConfKey, classOf[FsLogStore].getName)
}

/** The in-memory metastore stand-in, plus routing proofs (its call
  * counters show the formats touched the CONFIGURED store). */
class MemLogStoreContractSpec extends SparkSpec with LogStoreContract {
  def storeName = "mem"
  def configure(s: SparkSession): Unit =
    s.conf.set(LogStore.ConfKey, classOf[MemLogStore].getName)

  test("Versioned commits route slot claims through the configured " +
      "store, not filesystem primitives") {
    import s2.implicits._
    val path = "target/tmp/logstore-mem-route-vt"
    Versioned.drop(s2, path)
    val before = MemLogStore.claimCalls.get()
    Versioned.append(Seq((1L, "x")).toDF("k", "v"), path)
    assert(MemLogStore.claimCalls.get() > before,
      "claims must go through the configured LogStore")
  }

  test("Search generation commits publish + read markers through the " +
      "configured store") {
    import s2.implicits._
    val path = "target/tmp/logstore-mem-route-idx"
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

/** The production-shaped metastore CAS ([[JdbcLogStore]]) against
  * embedded Derby — the database's unique constraint decides every
  * race, exactly as a DynamoDB/Postgres commit coordinator would on
  * an object store without put-if-absent. */
class JdbcLogStoreContractSpec extends SparkSpec with LogStoreContract {
  def storeName = "jdbc"
  def configure(s: SparkSession): Unit = {
    System.setProperty("derby.system.home", "target/tmp/derby")
    new java.io.File("target/tmp/derby").mkdirs()
    s.conf.set(LogStore.ConfKey, classOf[JdbcLogStore].getName)
    s.conf.set(JdbcLogStore.UrlKey, "jdbc:derby:graft-logstore;create=true")
  }

  test("jdbc: the DB row is authoritative — readSmall serves DB " +
      "content even when the filesystem mirror lags") {
    val p = new Path("target/tmp/logstore-jdbc-auth-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = LogStore.forSession(s2)
    store.writeAtomic(f, p, "authoritative")
    // clobber the filesystem mirror — a reader must still see the
    // transactional copy (this is what "atomic on S3" rests on)
    val out = f.create(p, true)
    out.write("torn partial wr".getBytes("UTF-8"))
    out.close()
    assert(store.readSmall(f, p) == "authoritative")
  }

  test("jdbc: re-publish over an existing path upserts (metastore " +
      "extension beyond the write-once portable contract)") {
    val p = new Path("target/tmp/logstore-jdbc-repub-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = LogStore.forSession(s2)
    store.writeAtomic(f, p, "v1")
    store.writeAtomic(f, p, "v2:replacement")
    assert(store.readSmall(f, p) == "v2:replacement")
  }

  test("jdbc: claim discovery is AUTHORITATIVE — a claim whose " +
      "filesystem mirror vanished is still listed, and the in-flight " +
      "guard (GenLog.unpublishedGens) still sees the writer") {
    val path = "target/tmp/logstore-jdbc-authclaim-" +
      java.util.UUID.randomUUID().toString.take(8)
    val dir = GenLog.commitsDir(path)
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = LogStore.forSession(s2)
    val g = GenLog.claimGen(s2, f, path)
    // simulate the mirror lagging/lost (crash between DB insert and
    // file create, or an object store eventually-consistent listing):
    // the DB row must still reveal the in-flight writer
    f.delete(new Path(dir, s".claim-$g"), false)
    assert(store.listClaims(f, dir).contains(s".claim-$g"),
      "claim must be discoverable from the DB without its mirror file")
    assert(GenLog.unpublishedGens(s2, f, path).contains(g),
      "structural-commit guard must see the DB-only claim")
    store.delete(f, new Path(dir, s".claim-$g"))
    assert(GenLog.unpublishedGens(s2, f, path).isEmpty)
  }

  test("jdbc: a failed filesystem mirror rolls the DB claim back and " +
      "surfaces — the slot is not silently burned") {
    val base = new Path("target/tmp/logstore-jdbc-mirror-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // make the would-be parent a FILE so the mirror create must fail
    val out = f.create(base, true)
    out.write("blocker".getBytes("UTF-8"))
    out.close()
    val store = LogStore.forSession(s2)
    val p = new Path(base, ".claim-1")
    intercept[Exception] { store.createExclusive(f, p) }
    // unblock: the rolled-back slot must be winnable now
    f.delete(base, false)
    f.mkdirs(base)
    assert(store.createExclusive(f, p),
      "rolled-back claim must leave the slot free")
    store.delete(f, p)
  }

  test("jdbc: file-only metadata (predating the store switch) still " +
      "reads through the fallback") {
    val p = new Path("target/tmp/logstore-jdbc-legacy-" +
      java.util.UUID.randomUUID().toString.take(8))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    out.write("legacy-marker".getBytes("UTF-8"))
    out.close()
    assert(LogStore.forSession(s2).readSmall(f, p) == "legacy-marker")
  }
}
