package graft

import org.apache.spark.sql.SparkSession

/** Session hardening for local (single-JVM) Spark.
  *
  * In `local[n]` mode the driver and the one executor share a JVM, so
  * executor-liveness machinery can only ever produce FALSE positives:
  * under heavy load (parallel test suites, multi-GB sort spills) a
  * long GC/CPU stall lets the driver's HeartbeatReceiver expire the
  * in-process executor after `spark.network.timeout` (default 120 s);
  * local mode never re-registers it, every subsequent heartbeat gets
  * "Told to re-register" (a send failure), and after
  * `spark.executor.heartbeat.maxFailures` (60) of those the executor
  * calls `System.exit(56)` (HEARTBEAT_FAILURE) — killing the whole
  * JVM out from under whatever else it was running. Observed killing
  * the forked test JVM mid-suite twice, ~600 s after one early stall.
  *
  * Raising the expiry to an hour and slowing the heartbeat makes the
  * false positive unreachable while leaving cluster deployments (which
  * build their own sessions) untouched.
  */
object LocalSpark {

  /** Liveness settings that make a single-JVM session immune to
    * heartbeat-expiry self-termination. Interval must stay well below
    * the timeout (Spark asserts it). */
  def hardened(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.network.timeout", "3600s")
      .config("spark.executor.heartbeatInterval", "60s")
}
