package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Spec for [[ExponentialRetryBackoffWithJitter]] — SURVEY.md §2a #15.
  * Reference behavior: ExponentialRetryBackoffWithJitter.java:42-51. */
class BackoffSpec extends AnyFunSuite {

  private def fixed(frac: Double): Double => Double = bound => frac * bound

  test("no-jitter limit: pure capped exponential") {
    // rng always returns ~0 → jitter 0 → backoff = min(max, base·2^n)
    val b = new ExponentialRetryBackoffWithJitter(10, 30000, 1.0, 30000, fixed(0.0))
    assert((0 to 11).map(b.getRetryBackoffTimeMs) ==
      Seq(10, 20, 40, 80, 160, 320, 640, 1280, 2560, 5120, 10240, 20480))
    assert(b.getRetryBackoffTimeMs(12) == 30000) // capped
    assert(b.getRetryBackoffTimeMs(1000) == 30000) // 2^1000 → +Inf → capped
  }

  test("jitter subtracts a bounded fraction of the backoff") {
    // rng at the midpoint of [0, jitterPct): jitter = 0.25·backoff
    val b = new ExponentialRetryBackoffWithJitter(100, 30000, 0.5, 30000, fixed(0.5))
    assert(b.getRetryBackoffTimeMs(0) == 75) // 100 − 0.25·100
    assert(b.getRetryBackoffTimeMs(4) == 1200) // 1600 − 400
  }

  test("maxJitterMs clamps the jitter, not the backoff") {
    val b = new ExponentialRetryBackoffWithJitter(100, 30000, 1.0, 50, fixed(1.0))
    // backoff 6400, raw jitter 6400 → clamped to 50
    assert(b.getRetryBackoffTimeMs(6) == 6350)
  }

  test("argument validation mirrors the reference preconditions") {
    intercept[IllegalArgumentException](
      new ExponentialRetryBackoffWithJitter(0, 1000, 0.5, 10, fixed(0.0)))
    intercept[IllegalArgumentException](
      new ExponentialRetryBackoffWithJitter(10, 0, 0.5, 10, fixed(0.0)))
    intercept[IllegalArgumentException](
      new ExponentialRetryBackoffWithJitter(10, 1000, 0.0, 10, fixed(0.0)))
    intercept[IllegalArgumentException](
      new ExponentialRetryBackoffWithJitter(10, 1000, 1.5, 10, fixed(0.0)))
  }

  test("random schedule stays within the deterministic envelope") {
    val b = new ExponentialRetryBackoffWithJitter(50, 10000, 0.3)
    for (attempt <- 0 to 20; _ <- 1 to 5) {
      val ms = b.getRetryBackoffTimeMs(attempt)
      val pure = math.min(10000.0, 50.0 * math.pow(2.0, attempt))
      assert(ms <= pure && ms >= (pure * 0.7 - 1))
    }
  }
}
