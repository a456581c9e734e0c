package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {

  test("counters export with sorted labels; histograms emit sum/count/p95") {
    val m = new MetricsRegistry
    m.inc("ai_requests_total", Map("route" -> "chat"))
    m.inc("ai_requests_total", Map("route" -> "chat"))
    m.inc("dq_checks_total", Map("passed" -> "true"), value = 3)
    (1L to 100L).foreach(v => m.observeMs("ai_sql_exec_ms", v))
    val out = m.exportPrometheus()
    assert(out.contains("ai_requests_total{route=\"chat\"} 2"))
    assert(out.contains("dq_checks_total{passed=\"true\"} 3"))
    assert(out.contains("ai_sql_exec_ms_sum 5050"))
    assert(out.contains("ai_sql_exec_ms_count 100"))
    // reference p95 index formula: sorted[max(0, int(0.95*100) - 1)] = sorted[94] = 95
    assert(out.contains("ai_sql_exec_ms_p95 95"))
  }

  test("single observation p95 uses index 0") {
    val m = new MetricsRegistry
    m.observeMs("t_ms", 42)
    assert(m.exportPrometheus().contains("t_ms_p95 42"))
  }

  test("external exporter output is prepended; failures are swallowed") {
    val m = new MetricsRegistry
    m.inc("c")
    m.setExternalExporter(() => "external_metric 1\n")
    val out = m.exportPrometheus()
    assert(out.startsWith("external_metric 1\n"))
    assert(out.contains("c 1"))
    m.setExternalExporter(() => throw new RuntimeException("boom"))
    assert(m.exportPrometheus().contains("c 1"))
  }
}
