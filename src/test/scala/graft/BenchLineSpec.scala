package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line IS the driver's round-over-round ground
  * truth: the r11–r13 lines silently failed its parse and PERF lost
  * three rounds of per-query comparisons (`prev_bench_ok: false`,
  * r14 verdict item 2). This spec pins the contract without a Spark
  * session: the line must be one newline-free JSON object carrying
  * every catalog query under `queries` (wall) and `queries_cpu`
  * (executor CPU), and the short-key fallback must be lossless —
  * which requires the `takeWhile(_ != '_')` prefixes to stay unique
  * across the catalog. Jackson (shipped with Spark) stands in for the
  * driver's json.load. */
class BenchLineSpec extends AnyFunSuite {

  private val keys = SparkEntry.queries.keys.toSeq.sorted

  test("catalog keys shorten to UNIQUE prefixes — the short line stays lossless") {
    val pre = keys.map(_.takeWhile(_ != '_'))
    val dup = pre.groupBy(identity).collect { case (p, g) if g.size > 1 => p }
    assert(dup.isEmpty,
      s"duplicate short prefixes ${dup.mkString(", ")} — the short-line " +
        "fallback would merge distinct queries; rename one of them")
  }

  test("rendered line is one JSON object with every query's wall AND cpu") {
    val (base, rest) = keys.partition(Bench.ExactBaselines)
    assert(base.toSet == Set("e01_self_knn", "e02_cosine_pairs"))
    val line = Bench.renderLine(
      rest.map(_ -> 0.123), base.map(_ -> 1.234), keys.map(_ -> 0.5),
      total = 12.345, baseTotal = 2.468, cpuTotal = 99.999,
      sfDir = "/root/testdata/sf0.1")
    assert(!line.contains("\n") && !line.contains("\r"),
      "the driver parses ONE line; embedded newlines break it")

    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(math.abs(node.get("value").asDouble() - 12.345) < 1e-9)
    assert(node.get("exact_baselines_total").isNumber)
    assert(node.get("cpu_total").isNumber)
    assert(node.get("sf").asText().endsWith("sf0.1"))

    val qs = node.get("queries")
    val cpu = node.get("queries_cpu")
    // the renderer may fall back to unique short prefixes; accept
    // either form but require EVERY query present in both sections
    val shortMode = !qs.has(rest.head)
    def k(full: String) = if (shortMode) full.takeWhile(_ != '_') else full
    rest.foreach(q => assert(qs.has(k(q)), s"queries missing ${k(q)}"))
    keys.foreach(q => assert(cpu.has(k(q)), s"queries_cpu missing ${k(q)}"))
    assert(qs.size() == rest.size && cpu.size() == keys.size)
    base.foreach(b =>
      assert(node.get("exact_baselines").has(k(b)), s"baseline ${k(b)}"))
  }
}
