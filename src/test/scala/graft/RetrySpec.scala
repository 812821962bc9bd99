package graft

import graft.util.Retry
import org.scalatest.funsuite.AnyFunSuite

/** O15 retry wrapper semantics (reference `server.py:61-68`: 5 attempts,
  * fixed sleep, last error propagates). */
class RetrySpec extends AnyFunSuite {

  test("succeeds immediately without retries") {
    var calls = 0
    val out = Retry.retry(attempts = 5, delayMs = 0) { calls += 1; 42 }
    assert(out == 42 && calls == 1)
  }

  test("retries transient failures then succeeds") {
    var calls = 0
    var retriesSeen = Vector.empty[Int]
    val out = Retry.retry(attempts = 5, delayMs = 0,
      onRetry = (n, _) => retriesSeen :+= n) {
      calls += 1
      if (calls < 3) sys.error(s"flaky #$calls")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(retriesSeen == Vector(1, 2))
  }

  test("exhausts attempts and rethrows the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.retry(attempts = 4, delayMs = 0) { calls += 1; sys.error(s"boom $calls") }
    }
    assert(calls == 4)
    assert(e.getMessage == "boom 4")
  }

  test("fatal errors are not retried") {
    var calls = 0
    intercept[InterruptedException] {
      Retry.retry(attempts = 5, delayMs = 0) {
        calls += 1; throw new InterruptedException("stop")
      }
    }
    assert(calls == 1)
  }
}
