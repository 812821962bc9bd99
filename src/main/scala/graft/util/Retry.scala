package graft.util

import scala.annotation.tailrec
import scala.util.control.NonFatal

/** O15: retry/backoff wrapper (reference `server.py:25-27,61-68` — 5
  * attempts, 10 s sleep, absorbing source warm-up flakiness).
  *
  * In a Spark engine, task-level transient failure is already subsumed by
  * Spark's own task retries; this utility is the *driver-side* analogue
  * for non-task actions the scheduler doesn't guard — establishing a JDBC
  * connection (O1) before the first load, an HDFS `FileSystem` call, a
  * sink commit that races an external writer. Pure function, no Spark
  * dependency, so it wraps anything.
  */
object Retry {

  /** Run `f`, retrying up to `attempts` times total with a fixed
    * `delayMs` sleep between attempts (the reference's policy). The last
    * failure propagates; earlier ones are reported to `onRetry`.
    */
  def retry[T](attempts: Int = 5, delayMs: Long = 10000L,
               onRetry: (Int, Throwable) => Unit = (_, _) => ())(f: => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    @tailrec def loop(remaining: Int): T = {
      val r =
        try Right(f)
        catch { case NonFatal(e) if remaining > 1 => Left(e) }
      r match {
        case Right(v) => v
        case Left(e) =>
          onRetry(attempts - remaining + 1, e)
          if (delayMs > 0) Thread.sleep(delayMs)
          loop(remaining - 1)
      }
    }
    loop(attempts)
  }
}
