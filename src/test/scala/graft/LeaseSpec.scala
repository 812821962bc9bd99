package graft

import graft.util.Lease
import java.nio.file.{Files, Paths}

/** The shared lease primitive's contract (VERDICT r10 #4 — ONE
  * liveness discipline for `_ptrlock`, `awaitAdvance`, and the ANN
  * index root, replacing three ad-hoc timeout idioms):
  *   - create-exclusive elects exactly one winner under contention;
  *   - a stale lease is broken identity-checked, and a FRESH lease
  *     observed stale by a laggard breaker is handed back untouched;
  *   - a heartbeat keeps a lease live past any stale window and
  *     releases (deletes) it on close;
  *   - awaitProgress distinguishes live competition (free retry)
  *     from a dead claimant (budget burn).
  */
class LeaseSpec extends SparkSuite {

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpLock(): (java.nio.file.Path, org.apache.hadoop.fs.Path) = {
    val dir = Files.createTempDirectory("graft_leasespec_")
    val nio = dir.resolve("_lock")
    (nio, new org.apache.hadoop.fs.Path("file://" + nio.toAbsolutePath))
  }

  test("create-exclusive elects exactly one winner across 16 racing threads") {
    val (_, lock) = tmpLock()
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 16).map { i =>
      new Thread(() =>
        if (Lease.createExclusive(conf, lock, s"t$i\n")) wins.incrementAndGet())
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1)
  }

  test("a stale lease is broken; a refreshed one observed stale is handed back") {
    val (nio, lock) = tmpLock()
    assert(Lease.createExclusive(conf, lock, "holder\n"))
    val observed = Lease.mtimeOf(conf, lock).get
    // holder refreshes between the breaker's observation and its break:
    // the identity check must hand the lease back, not kill it
    Thread.sleep(1100) // local-FS mtime granularity can be 1 s
    Lease.refresh(conf, lock)
    val refreshed = Lease.mtimeOf(conf, lock).get
    assert(refreshed != observed, "refresh must move the mtime")
    Lease.breakIfStillStale(conf, lock, observed)
    assert(Files.exists(nio), "a refreshed lease must survive a stale break")
    assert(Lease.mtimeOf(conf, lock).contains(refreshed))
    // genuinely stale: same observation, no refresh — the break lands
    Lease.breakIfStillStale(conf, lock, refreshed)
    assert(!Files.exists(nio), "an unrefreshed stale lease must be broken")
  }

  test("acquire blocks on a live lease and steals a dead one") {
    val (nio, lock) = tmpLock()
    // dead claimant: lease exists, nobody refreshes it
    assert(Lease.createExclusive(conf, lock, "dead\n"))
    Files.setLastModifiedTime(nio,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    val t0 = System.nanoTime()
    Lease.acquire(conf, lock, "me\n", staleMs = 2000)
    assert((System.nanoTime() - t0) / 1e6 < 2000,
      "a dead lease must be stolen without waiting out the window again")
    assert(new String(Files.readAllBytes(nio), "UTF-8").startsWith("me"))
    Files.delete(nio)
  }

  test("heartbeat keeps a lease live past the stale window; close releases it") {
    val (nio, lock) = tmpLock()
    val hb = Lease.heartbeat(conf, lock, intervalMs = 100)
    try {
      Thread.sleep(1500)
      assert(Lease.isLive(conf, lock, staleMs = 700),
        "a 100 ms heartbeat must keep a 700 ms-stale lease live at t=1.5 s")
    } finally hb.close()
    assert(!Files.exists(nio), "close must release (delete) the lease")
  }

  test("a broken-then-superseded holder's close leaves the successor's lease intact") {
    val (nio, lock) = tmpLock()
    // holder A claims and heartbeats slowly enough for us to simulate a break
    val a = Lease.heartbeat(conf, lock, intervalMs = 60000)
    try {
      // a breaker adjudicates A dead (in reality: A's JVM paused past the
      // stale window) and steals the lease; successor B claims it
      Files.delete(nio)
      val b = Lease.heartbeat(conf, lock, intervalMs = 60000)
      try {
        val bBody = new String(Files.readAllBytes(nio), "UTF-8")
        // A comes back and closes — the unconditional-delete bug would kill
        // B's live lease here, opening B's build to a spurious reclaim
        a.close()
        assert(Files.exists(nio),
          "a superseded holder's close must not delete the successor's lease")
        assert(new String(Files.readAllBytes(nio), "UTF-8") == bBody,
          "the successor's lease body must be untouched by the laggard close")
      } finally b.close()
      assert(!Files.exists(nio), "the successor's own close still releases")
    } finally a.close() // idempotent: nothing of A's remains to release
  }

  test("awaitProgress: free retry on live competition, budget burn on a dead world") {
    @volatile var v = 0L
    val mover = new Thread(() => { Thread.sleep(150); v = 1L })
    mover.start()
    assert(Lease.awaitProgress(5000, 0L)(v), "a live competitor = progress")
    mover.join()
    val t0 = System.nanoTime()
    assert(!Lease.awaitProgress(300, 5L)(v), "nothing moved = no progress")
    assert((System.nanoTime() - t0) / 1e6 >= 300, "the full deadline is waited")
  }
}
