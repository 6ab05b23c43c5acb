package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's stdout contract — the ONE artifact the round's
  * perf grade is parsed from (VERDICT r12 item 2's closing check:
  * "verify the driver's tail-parser still reads the final total
  * line"). The driver keeps only a ~2 KB stdout tail and json-loads
  * the LAST line of the brief's shape, so the guarantees here are
  * load-bearing for every future sample:
  *
  *  - both lines parse with a REAL JSON parser (json4s/jackson — the
  *    same class of parser the driver uses);
  *  - the total line stays under 1.7 KB even at 1000 queries, and its
  *    "value" equals the sum over ALL queries (not just the headline
  *    subset that fits);
  *  - the headline map is the cost-DESCENDING prefix, so when
  *    truncation bites it is the cheap entries that drop out;
  *  - locale safety: numbers always render with '.' decimal points
  *    (formatLocal(ROOT) — a comma-locale host would otherwise emit
  *    unparseable JSON).
  */
class BenchLinesSpec extends AnyFunSuite {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def parseObj(line: String): Map[String, JValue] =
    JsonMethods.parse(line) match {
      case JObject(fields) => fields.toMap
      case other => fail(s"not a JSON object: $other")
    }

  test("both lines are valid JSON of the brief's shape; total = sum over ALL queries") {
    val results = Map("q_a" -> 1.25, "q_b" -> 0.333, "q_c" -> 10.0)
    val (allLine, totalLine) = Bench.renderLines(results, "/root/testdata/sf0.1")
    val all = parseObj(allLine)
    assert(all("metric") == JString("queries_all"))
    assert(all("queries").asInstanceOf[JObject].obj.size == 3)
    val tot = parseObj(totalLine)
    assert(tot("metric") == JString("total"))
    assert(tot("unit") == JString("sec"))
    assert(tot("sf") == JString("/root/testdata/sf0.1"))
    val JDouble(v) = tot("value")
    assert(math.abs(v - 11.583) < 1e-9, s"value $v != 11.583")
  }

  test("the total line always fits the driver's tail window, even at 1000 queries") {
    // far beyond the real 168 — the headline must truncate, the line
    // must stay bounded, and the value must STILL be the full sum
    val results = (1 to 1000).map(i => f"q_stress_query_name_$i%04d" -> i * 0.001).toMap
    val (_, totalLine) = Bench.renderLines(results, "/root/testdata/sf0.1")
    assert(totalLine.length < 1700, s"total line ${totalLine.length} chars")
    val tot = parseObj(totalLine)
    val JDouble(v) = tot("value")
    val expected = (1 to 1000).map(_ * 0.001).sum
    assert(math.abs(v - expected) < 0.001, s"value $v != full sum $expected")
    // the headline kept fewer than all queries (truncation really bit)
    val kept = tot("queries").asInstanceOf[JObject].obj
    assert(kept.size < 1000 && kept.nonEmpty)
    // ...and what it kept is the cost-descending prefix: every kept
    // value >= every dropped value
    val keptNames = kept.map(_._1).toSet
    val minKept = kept.map { case (_, JDouble(d)) => d }.min
    val maxDropped = results.collect {
      case (k, t) if !keptNames.contains(k) => t }.max
    assert(minKept >= maxDropped,
      s"headline dropped a more expensive query ($maxDropped) than it kept ($minKept)")
  }

  test("empty results still render parseable lines with value 0") {
    val (allLine, totalLine) = Bench.renderLines(Map.empty, "/x")
    parseObj(allLine)
    val JDouble(v) = parseObj(totalLine)("value")
    assert(v == 0.0)
  }
}
