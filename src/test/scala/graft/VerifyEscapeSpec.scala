package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip tripwire for Verify's hand-rolled JSON escaping (r12,
  * VERDICT item 5): oracle_sql.json is load-bearing for every round's
  * certification — a mis-escaped SQL string would make the driver's
  * json.load fail and zero the round's correctness. Each case is
  * escaped by [[Verify.jsonEscape]] and parsed back with a REAL JSON
  * parser (json4s, the one Spark ships), asserting exact identity.
  * Companion probes (r12, not automatable here): the DuckDB-side
  * comparator was exercised against a 0-row oracled query (matches),
  * NaN/±0.0 divergence (bitwise compare flags both sign and
  * NaN-vs-null), and multiline quoted SQL (parses and runs) — all
  * behaved; results recorded in BASELINE.md.
  */
class VerifyEscapeSpec extends AnyFunSuite {

  private def roundTrip(s: String): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(s"""{"k": ${Verify.jsonEscape(s)}}""") \ "k" match {
      case JString(v) => v
      case other => fail(s"parsed to non-string: $other")
    }
  }

  test("SQL with embedded quotes, backslashes, newlines, tabs and CRs round-trips exactly") {
    val cases = Seq(
      "SELECT 'a\"b\\c' AS s",
      "SELECT *\nFROM lineitem\n\t-- a \"quoted\" comment with \\backslash\r\n",
      "regexp_extract(s, '([\\\\w]+)@([\\\\w.]+)', 2)",
      "line1\u0000line2\u001fline3", // raw control chars must become \\u escapes
      "", // empty SQL must stay a valid empty string
      "plain ascii with no escapes at all",
      "unicode: µs — π ≈ 3.14159, 中文, emoji \ud83d\ude00"
    )
    cases.foreach { c =>
      assert(roundTrip(c) == c, s"round-trip diverged for: ${c.take(60)}")
    }
  }

  test("a whole oracle-map-shaped document with hostile keys and values parses") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val m = Map("q_a\"weird" -> "SELECT '\\'\n", "q_plain" -> "SELECT 1")
    val doc = m.map { case (k, v) => s"${Verify.jsonEscape(k)}: ${Verify.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    val parsed = JsonMethods.parse(doc) match {
      case JObject(fields) => fields.map { case (k, JString(v)) => k -> v }.toMap
      case other => fail(s"not an object: $other")
    }
    assert(parsed == m)
  }
}
