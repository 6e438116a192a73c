package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Clock-injected pacing contract of the master discovery loop — the
  * reference's MasterConfiguration sleep trio must be honored at the
  * exact points the reference sleeps (first-generation poll, done
  * re-check, exception recovery). No Spark involved: the loop is
  * driven synchronously through a fake sleeper. */
class GenerationMasterSpec extends AnyFunSuite {

  private val pacing =
    MasterPacing(sleepBeforeFirstGenerationMs = 11L,
      sleepBeforeGenerationDoneMs = 23L, sleepAfterExceptionMs = 37L)

  private def gen(id: Int): CdcGeneration = CdcGeneration(id, id * 100L, None, Seq(1L))

  test("polls at sleepBeforeFirstGenerationMs until the first generation exists") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var polls = 0
    var timeline: Seq[CdcGeneration] = Nil
    val m = new GenerationMaster(
      () => { polls += 1; if (polls <= 3) None else Some(Seq(gen(0))) },
      pacing,
      ms => sleeps.synchronized { sleeps += ms; Thread.sleep(1) },
      tl => timeline = tl)
    val t = m.startThread("spec-master-first")
    eventually(m.hasDiscovered)
    m.stopMaster(); t.join(2000)
    // three empty polls → three first-generation pauses, in order,
    // BEFORE any done-cadence pause
    assert(sleeps.synchronized(sleeps.takeWhile(_ == pacing.sleepBeforeFirstGenerationMs).size) == 3)
    assert(timeline.map(_.generationId) == Seq(0))
    assert(polls >= 4)
  }

  test("re-checks at sleepBeforeGenerationDoneMs and picks up timeline growth") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    @volatile var snapshots = Vector.empty[Seq[Int]]
    @volatile var grown = false
    val m = new GenerationMaster(
      () => Some(if (grown) Seq(gen(0), gen(1)) else Seq(gen(0))),
      pacing,
      ms => { sleeps.synchronized { sleeps += ms }; Thread.sleep(1) },
      tl => { snapshots :+= tl.map(_.generationId); if (snapshots.size >= 1) grown = true })
    val t = m.startThread("spec-master-refresh")
    eventually(snapshots.exists(_ == Seq(0, 1)))
    m.stopMaster(); t.join(2000)
    // discovery took no pause (timeline existed), every refresh was
    // preceded by exactly the done-cadence pause
    assert(sleeps.synchronized(sleeps.forall(_ == pacing.sleepBeforeGenerationDoneMs)))
    assert(snapshots.head == Seq(0))
  }

  test("sleeps sleepAfterExceptionMs after a supplier failure, then retries forever") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var polls = 0
    val m = new GenerationMaster(
      () => { polls += 1; if (polls <= 2) throw new RuntimeException("cql down") else Some(Seq(gen(0))) },
      pacing,
      ms => { sleeps.synchronized { sleeps += ms }; Thread.sleep(1) },
      _ => ())
    val t = m.startThread("spec-master-exc")
    eventually(m.hasDiscovered)
    m.stopMaster(); t.join(2000)
    val s = sleeps.synchronized(sleeps.toVector)
    // two failures → two fixed exception pauses before discovery
    assert(s.take(2) == Vector(pacing.sleepAfterExceptionMs, pacing.sleepAfterExceptionMs))
  }

  test("refresh-phase supplier failure pauses and the loop survives") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    @volatile var polls = 0
    @volatile var snapshots = 0
    val m = new GenerationMaster(
      () => {
        polls += 1
        if (polls == 2) throw new RuntimeException("transient")
        Some(Seq(gen(0)))
      },
      pacing,
      ms => { sleeps.synchronized { sleeps += ms }; Thread.sleep(1) },
      _ => snapshots += 1)
    val t = m.startThread("spec-master-refresh-exc")
    eventually(snapshots >= 2)
    m.stopMaster(); t.join(2000)
    assert(sleeps.synchronized(sleeps.contains(pacing.sleepAfterExceptionMs)))
  }

  test("MasterPacing rejects negative values; defaults are the reference's") {
    intercept[IllegalArgumentException](MasterPacing(sleepBeforeFirstGenerationMs = -1))
    intercept[IllegalArgumentException](MasterPacing(sleepBeforeGenerationDoneMs = -1))
    intercept[IllegalArgumentException](MasterPacing(sleepAfterExceptionMs = -1))
    val d = MasterPacing()
    assert(d.sleepBeforeFirstGenerationMs == 10000L) // MasterConfiguration.java:15
    assert(d.sleepBeforeGenerationDoneMs == 30000L)  // MasterConfiguration.java:16
    assert(d.sleepAfterExceptionMs == 10000L)        // MasterConfiguration.java:17
  }

  private def eventually(cond: => Boolean, timeoutMs: Long = 10000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(5)
    assert(cond, "condition not met within timeout")
  }
}
