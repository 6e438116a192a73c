package graft.cdc

/** Retry backoff policies for the streaming consumer's task loop.
  *
  * Reference semantics: scylla-cdc-base .../model/RetryBackoff.java and
  * ExponentialRetryBackoffWithJitter.java:42-51 — backoff =
  * min(maxBackoff, base · 2^attempt) computed in doubles (overflow →
  * +Inf → clamped), jitter = min(U(0, jitterPct) · backoff, maxJitter),
  * result = backoff − jitter.
  *
  * The random source is injectable so the schedule is deterministic
  * under test and in Spark task retries (seed by task id for
  * reproducible retry storms).
  */
trait RetryBackoff {
  /** Backoff in ms before retry number `tryAttempt` (0-based). */
  def getRetryBackoffTimeMs(tryAttempt: Int): Int
}

final class ExponentialRetryBackoffWithJitter(
    backoffBase: Int,
    maximumBackoffMs: Int,
    jitterPercentage: Double,
    maxJitterMs: Int,
    /** uniform sample in [0, bound) — injectable for determinism */
    nextDouble: Double => Double) extends RetryBackoff {

  require(maximumBackoffMs > 0, "maximumBackoffMs must be positive")
  require(backoffBase > 0, "backoffBase must be positive")
  require(jitterPercentage > 0.0 && jitterPercentage <= 1.0,
    "jitterPercentage must be in (0, 1]")
  require(maxJitterMs >= 0, "maxJitterMs must be non-negative")

  private val effectiveMaxJitterMs = math.min(maxJitterMs, maximumBackoffMs)

  def this(backoffBase: Int, maximumBackoffMs: Int, jitterPercentage: Double) =
    this(backoffBase, maximumBackoffMs, jitterPercentage, maximumBackoffMs,
      bound => scala.util.Random.nextDouble() * bound)

  override def getRetryBackoffTimeMs(tryAttempt: Int): Int = {
    // double math: 2^attempt overflows int but saturates to +Inf in
    // double, which min() then clamps (reference line 47)
    val backoff = math.min(maximumBackoffMs.toDouble,
      backoffBase.toDouble * math.pow(2.0, tryAttempt.toDouble))
    val jitter = math.min(nextDouble(jitterPercentage) * backoff, effectiveMaxJitterMs.toDouble)
    (backoff - jitter).toInt
  }
}
