package graft

import org.apache.spark.sql.SparkSession

/** A query exceeded its repository's configured timeout and was cancelled. */
final class QueryTimeoutException(val seconds: Int)
  extends RuntimeException(
    s"query exceeded the repository timeout of ${seconds}s and was cancelled")

/** Query-timeout enforcement — the reference repository's fourth config knob
  * (`queryTimeout: 30`, `/root/reference/init-graphdb.sh:66-70`): a runaway
  * query on a shared cluster must be killed at the bound, not run forever.
  *
  * Spark-native mechanism (SURVEY §4.1): the eager part of a query (the
  * collect/serialize actions) runs inside a dedicated JOB GROUP with
  * `interruptOnCancel`, and a daemon watchdog calls `cancelJobGroup` when
  * the bound elapses. Cancellation is cooperative at task granularity —
  * running tasks are interrupted, queued stages are dropped — which is
  * exactly the semantics of the reference's engine-side timeout. Only the
  * caller's group is cancelled; concurrent queries in other groups are
  * untouched.
  */
object QueryTimeout {

  /** Run `body` (which triggers Spark actions on THIS thread) under an
    * optional timeout. `None` = no watchdog, zero overhead. On timeout the
    * in-flight jobs of this query are cancelled and a
    * [[QueryTimeoutException]] (cause: the Spark cancellation error) is
    * thrown; a body that finishes first just interrupts the watchdog.
    */
  def run[T](spark: SparkSession, timeoutSec: Option[Int])(body: => T): T =
    timeoutSec match {
      case None => body
      case Some(sec) =>
        require(sec > 0, s"queryTimeoutSec must be positive, got $sec")
        val sc = spark.sparkContext
        val group = s"graft-timeout-${java.util.UUID.randomUUID()}"
        val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
        val watchdog = new Thread(() => {
          try {
            Thread.sleep(sec * 1000L)
            timedOut.set(true)
            sc.cancelJobGroup(group)
          } catch { case _: InterruptedException => () } // query won the race
        }, s"$group-watchdog")
        watchdog.setDaemon(true)
        // Job-group state is per-thread, so this tags exactly the actions
        // `body` runs here — not concurrent queries on other threads.
        sc.setJobGroup(group, s"graft query (timeout ${sec}s)",
          interruptOnCancel = true)
        watchdog.start()
        try body
        catch {
          case e: Throwable if timedOut.get() =>
            val ex = new QueryTimeoutException(sec)
            ex.initCause(e)
            throw ex
        } finally {
          watchdog.interrupt()
          sc.clearJobGroup()
        }
    }
}
