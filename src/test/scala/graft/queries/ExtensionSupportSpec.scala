package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite

/** The fixture-memo contract behind the benched WET entries
  * (x81/x90): exactly ONE write per (JVM, path), and no caller may
  * proceed before that write has fully completed — a check-then-act
  * race here would hand a concurrent caller a half-written dump. */
class ExtensionSupportSpec extends AnyFunSuite {

  test("wetFixtureOnce: 8 concurrent callers on one path produce " +
      "exactly one write, and every caller observes it complete") {
    val writes = new AtomicInteger(0)
    @volatile var completed = false
    val path = s"memo-test-${System.nanoTime()}"
    val callers = (1 to 8).map { _ =>
      Future {
        ExtensionSupport.wetFixtureOnce(path) {
          writes.incrementAndGet()
          Thread.sleep(100) // widen the window a naive race would hit
          completed = true
        }
        // duplicate callers await the winner's per-path future — so
        // by the time ANY caller gets here the write must be complete
        assert(completed, "caller proceeded before the write finished")
      }
    }
    Await.result(Future.sequence(callers), 1.minute)
    assert(writes.get() == 1, s"expected exactly one write, got ${writes.get()}")
    // a later caller on the same path still skips
    ExtensionSupport.wetFixtureOnce(path) { writes.incrementAndGet() }
    assert(writes.get() == 1)
    // a DIFFERENT path writes independently
    var other = 0
    ExtensionSupport.wetFixtureOnce(path + "-b") { other += 1 }
    assert(other == 1)
  }

  test("wetFixtureOnce: a failed write retracts its claim — the next " +
      "caller retries instead of memoizing the failure") {
    val path = s"memo-fail-${System.nanoTime()}"
    val writes = new AtomicInteger(0)
    val boom = intercept[RuntimeException] {
      ExtensionSupport.wetFixtureOnce(path) {
        writes.incrementAndGet()
        throw new RuntimeException("disk full")
      }
    }
    assert(boom.getMessage == "disk full")
    ExtensionSupport.wetFixtureOnce(path) { writes.incrementAndGet() }
    assert(writes.get() == 2, "second caller must re-run the write")
    // and the successful retry is memoized as usual
    ExtensionSupport.wetFixtureOnce(path) { writes.incrementAndGet() }
    assert(writes.get() == 2)
  }
}
