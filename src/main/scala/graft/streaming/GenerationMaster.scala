package graft.streaming

import scala.util.control.NonFatal

/** Pacing for the generation-discovery master loop — the reference's
  * `MasterConfiguration` sleep trio (scylla-cdc-base
  * .../model/master/MasterConfiguration.java:15-41):
  *
  *  - `sleepBeforeFirstGenerationMs`: wait between polls while the
  *    cluster has no first generation yet
  *    (GenerationBasedCDCMetadataModel.getGenerationId's inner loop,
  *    GenerationBasedCDCMetadataModel.java:36-45)
  *  - `sleepBeforeGenerationDoneMs`: cadence of the "is the current
  *    generation done / did the timeline grow" re-check
  *    (runMasterLoop's inner sleep, GenerationBasedCDCMetadataModel
  *    .java:133-139; the tablet model polls at the same cadence,
  *    TabletBasedCDCMetadataModel.java:36-40)
  *  - `sleepAfterExceptionMs`: fixed backoff before restarting the
  *    master routine after ANY exception (Master.java:29-43 — the
  *    master retries forever with a FIXED pause, unlike the worker's
  *    exponential schedule)
  *
  * Defaults are the reference's (10 s / 30 s / 10 s). */
final case class MasterPacing(
    sleepBeforeFirstGenerationMs: Long = 10000L,
    sleepBeforeGenerationDoneMs: Long = 30000L,
    sleepAfterExceptionMs: Long = 10000L) {
  require(sleepBeforeFirstGenerationMs >= 0, "sleepBeforeFirstGenerationMs must be >= 0")
  require(sleepBeforeGenerationDoneMs >= 0, "sleepBeforeGenerationDoneMs must be >= 0")
  require(sleepAfterExceptionMs >= 0, "sleepAfterExceptionMs must be >= 0")
}

/** Driver-side generation-discovery loop — the Spark re-expression of
  * the reference master thread (scylla-cdc-base
  * .../model/master/Master.java + GenerationBasedCDCMetadataModel).
  *
  * The reference master owns two jobs: DISCOVER the timeline (poll
  * until the first generation exists, then keep refreshing the open
  * generation's end / fetch the next one) and DECIDE switchover
  * (areTasksFullyConsumedUntil). In graft the switchover decision is
  * the confidence-window watermark inside the delivery path
  * ([[GraftCdcConsumerBuilder.withGenerations]]'s barrier note), so
  * this class carries the remaining job: timeline discovery and
  * refresh, at the reference's pacing, with the reference's
  * fixed-pause exception recovery.
  *
  * `supplier` is the `fetchFirstGenerationId`/`refreshEnd` stand-in:
  * None = no generation exists yet; Some(timeline) = the current
  * known timeline (it may GROW between calls — new generations
  * appended, the open end closed). `onTimeline` receives every
  * refreshed snapshot; `sleeper` is injectable so specs drive the
  * loop with a fake clock. */
final class GenerationMaster(
    supplier: () => Option[Seq[CdcGeneration]],
    pacing: MasterPacing,
    sleeper: Long => Unit,
    onTimeline: Seq[CdcGeneration] => Unit) {

  @volatile private var running = true
  @volatile private var discovered = false

  /** True once the first non-empty timeline reached `onTimeline`. */
  def hasDiscovered: Boolean = discovered

  def stopMaster(): Unit = running = false

  /** One blocking master run: poll for the first generation at
    * `sleepBeforeFirstGenerationMs`, then refresh at
    * `sleepBeforeGenerationDoneMs`, pausing `sleepAfterExceptionMs`
    * after any supplier/listener exception (retry forever — the
    * reference master never gives up, Master.java:29-43). Returns when
    * [[stopMaster]] is called. Normally driven by [[startThread]]. */
  def run(): Unit = {
    // getGenerationId parity: poll until a first generation exists
    while (running && !discovered) {
      try {
        supplier() match {
          case Some(gens) if gens.nonEmpty =>
            onTimeline(gens)
            discovered = true
          case _ =>
            sleeper(pacing.sleepBeforeFirstGenerationMs)
        }
      } catch {
        case NonFatal(_) => sleeper(pacing.sleepAfterExceptionMs)
      }
    }
    // runMasterLoop parity: re-check / refresh at the done-poll cadence
    while (running) {
      sleeper(pacing.sleepBeforeGenerationDoneMs)
      if (running) {
        try supplier().filter(_.nonEmpty).foreach(onTimeline)
        catch { case NonFatal(_) => sleeper(pacing.sleepAfterExceptionMs) }
      }
    }
  }

  /** Run the loop on a daemon thread (the reference's MasterThread). */
  def startThread(name: String): Thread = {
    val t = new Thread(() => run(), name)
    t.setDaemon(true)
    t.start()
    t
  }
}
