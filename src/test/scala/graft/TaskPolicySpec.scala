package graft

import java.util.concurrent.TimeoutException
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.duration.Duration
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TaskPolicy
import graft.pipeline.TaskPolicy.Policy

/** The reference's per-task orchestration guarantees (retries,
  * retry_delay, execution_timeout — wine_etl_kaggle.py:22-30) as a
  * library seam: recovery, exhaustion, timeout interruption, and the
  * zero-retry (`retries: None`) configuration. */
class TaskPolicySpec extends AnyFunSuite {

  private val fast = Policy(retries = 2,
    retryDelay = Duration("10ms"), timeout = Duration("5s"))

  test("flaky task recovers within the retry budget; history is kept") {
    val calls = new AtomicInteger(0)
    val (v, attempts) = TaskPolicy.run(fast, "flaky") {
      if (calls.incrementAndGet() < 3) sys.error(s"boom ${calls.get}")
      "ok"
    }
    assert(v == "ok" && calls.get == 3)
    assert(attempts.map(_.n) == Seq(1, 2))
    assert(attempts.forall(_.error.contains("boom")))
  }

  test("exhausted retries rethrow the LAST error with priors suppressed") {
    val calls = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      TaskPolicy.run(fast, "dead") {
        sys.error(s"always ${calls.incrementAndGet()}")
      }
    }
    assert(calls.get == 3) // 1 attempt + 2 retries
    assert(e.getMessage == "always 3")
    assert(e.getSuppressed.length == 2)
  }

  test("retries = 0 means exactly one attempt (the reference's None)") {
    val calls = new AtomicInteger(0)
    intercept[RuntimeException] {
      TaskPolicy.run(Policy(retries = 0, retryDelay = Duration("1ms"),
        timeout = Duration("5s")), "once") {
        sys.error(s"n=${calls.incrementAndGet()}")
      }
    }
    assert(calls.get == 1)
  }

  test("a hung attempt times out, is interrupted, and the next succeeds") {
    val calls = new AtomicInteger(0)
    val interrupted = new AtomicInteger(0)
    val (v, attempts) = TaskPolicy.run(
      Policy(retries = 1, retryDelay = Duration("10ms"),
        timeout = Duration("300ms")), "hung") {
      if (calls.incrementAndGet() == 1) {
        try Thread.sleep(60000L)
        catch { case _: InterruptedException =>
          interrupted.incrementAndGet(); throw new RuntimeException("interrupted")
        }
        "never"
      } else "recovered"
    }
    assert(v == "recovered")
    assert(attempts.length == 1 && attempts.head.error.contains("exceeded"))
    // the abandoned attempt's thread actually got the interrupt
    assert(interrupted.get == 1)
  }

  test("a Spark stage wraps cleanly: flaky sink write retried to success") {
    val spark = TestSpark.spark
    val out = java.nio.file.Files.createTempDirectory("policy_sink").toString
    val calls = new AtomicInteger(0)
    val (n, attempts) = TaskPolicy.run(fast, "sink") {
      if (calls.incrementAndGet() < 2) sys.error("transient sink failure")
      val df = Tables.documents(spark, TestSpark.sf0001)
      df.write.mode("overwrite").parquet(out)
      spark.read.parquet(out).count()
    }
    assert(n == 500 && attempts.length == 1)
  }
}
