package graft.pipeline

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import scala.concurrent.duration.Duration
import scala.util.control.NonFatal

/** Task-level execution policy: bounded retries with a fixed delay and
  * a wall-clock timeout per attempt — the orchestration guarantees the
  * reference declares per task (`default_args` in
  * `/root/reference/dags/wine_etl_kaggle.py:22-30`: `retries`,
  * `retry_delay=1m`, `execution_timeout=30m`) re-expressed as a library
  * seam instead of scheduler machinery, so ANY pipeline stage (a fetch,
  * a sink write, a whole [[WinePipeline]] run) can be wrapped without
  * depending on an orchestrator.
  *
  * Semantics mirror the reference's scheduler contract:
  *  - an attempt that exceeds `timeout` is abandoned (its thread is
  *    interrupted) and counts as a failure;
  *  - failures re-run after `retryDelay`, at most `retries` times
  *    (`retries = 0` ≡ the reference's `retries: None` — one attempt);
  *  - the LAST failure propagates; earlier ones are recorded in
  *    [[Attempt]]s for the caller's log sink.
  *
  * Abandonment is BEST-EFFORT, exactly like the reference scheduler's
  * `execution_timeout`: the interrupt stops interruption-aware work,
  * but a thunk blocked in a non-interruptible call (a socket read, a
  * Spark action awaiting executors) may keep running as a zombie past
  * the timeout. Consequences the caller must own:
  *  - a retry can overlap the zombie, so attempts must write to
  *    attempt-private scratch (or idempotent destinations), never
  *    append-shared state — KaggleSource's download path extracts
  *    into an attempt-private directory and promotes files with
  *    atomic moves for exactly this reason;
  *  - interrupting a thread blocked in a Spark action does NOT cancel
  *    the job on the executors; a caller that needs hard Spark
  *    cancellation should run the thunk under `setJobGroup` and
  *    `cancelJobGroup` on timeout.
  * Nothing here touches executors — the policy is pure driver-side
  * control flow, exactly like the scheduler it replaces.
  */
object TaskPolicy {

  final case class Attempt(n: Int, error: String, elapsedMs: Long)

  final case class Policy(
      retries: Int = 0,
      retryDelay: Duration = Duration(1, TimeUnit.MINUTES),
      timeout: Duration = Duration(30, TimeUnit.MINUTES))

  /** Run `task` under `policy`; returns the value plus the failed
    * attempts that preceded it. Throws the final error (after
    * exhausting retries) with prior attempts attached as suppressed
    * exceptions, so a log sink sees the whole history either way. */
  def run[A](policy: Policy, label: String = "task")(task: => A): (A, Seq[Attempt]) = {
    require(policy.retries >= 0, "retries must be >= 0")
    val failures = Seq.newBuilder[Attempt]
    var previous = List.empty[Throwable]
    var attempt = 0
    while (true) {
      attempt += 1
      val t0 = System.nanoTime()
      try {
        return (runWithTimeout(policy.timeout, label)(task), failures.result())
      } catch {
        case NonFatal(e) =>
          val elapsed = (System.nanoTime() - t0) / 1000000L
          failures += Attempt(attempt, s"${e.getClass.getSimpleName}: ${e.getMessage}", elapsed)
          previous ::= e
          if (attempt > policy.retries) {
            previous.tail.foreach(e.addSuppressed)
            throw e
          }
          Thread.sleep(policy.retryDelay.toMillis)
      }
    }
    sys.error("unreachable")
  }

  /** One attempt with a wall-clock bound. The task runs on a dedicated
    * thread; on timeout the thread is interrupted and a
    * [[TimeoutException]] is thrown to the caller. */
  def runWithTimeout[A](timeout: Duration, label: String)(task: => A): A = {
    val exec = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, s"graft-task-$label")
      t.setDaemon(true)
      t
    })
    try {
      val fut = exec.submit(new java.util.concurrent.Callable[A] {
        override def call(): A = task
      })
      try fut.get(timeout.toMillis, TimeUnit.MILLISECONDS)
      catch {
        case _: TimeoutException =>
          fut.cancel(true) // interrupts the attempt thread
          throw new TimeoutException(
            s"$label exceeded ${timeout.toMillis} ms")
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    } finally exec.shutdownNow()
  }
}
