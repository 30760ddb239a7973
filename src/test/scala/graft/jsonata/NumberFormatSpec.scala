package graft.jsonata

import org.scalatest.funsuite.AnyFunSuite

/** ECMA-262 Number::toString conformance for $string / string casting —
  * jsonata-js inherits JS number formatting, so these are the reference
  * semantics. Java <= 18 Double.toString is NOT shortest-round-trip (e.g.
  * "2.4999999999999998E22" for 2.5e22) and uses different notation
  * boundaries ("1.0E-4" for 0.0001); Values.jsDouble reimplements the JS
  * algorithm with a shortest-digits search. */
class NumberFormatSpec extends AnyFunSuite {

  private def str(expr: String): String = {
    val out = Jsonata.compile(expr).evaluate(Jsonata.parseJson("{}"))
    out.textValue()
  }

  test("integral doubles print without a decimal point") {
    assert(str("$string(1.0)") == "1")
    assert(str("$string(2.5 * 2)") == "5")
    assert(str("$string(1.5e3)") == "1500")
  }

  test("decimal notation for exponents in (-6, 21]") {
    assert(str("$string(123.456)") == "123.456")
    assert(str("$string(0.0001)") == "0.0001")       // Java toString says 1.0E-4
    assert(str("$string(0.000001)") == "0.000001")
    assert(str("$string(-0.00025)") == "-0.00025")
    assert(str("$string(1/3)") == "0.3333333333333333")
    assert(str("$string(0.1 + 0.2)") == "0.30000000000000004")
  }

  test("exponential notation with bare mantissa outside (-6, 21]") {
    assert(str("$string(1e21)") == "1e+21")          // not 1.0e+21
    assert(str("$string(1e-7)") == "1e-7")
    assert(str("$string(1.5e-9)") == "1.5e-9")
  }

  test("shortest round-trip digits (Java <= 18 toString is not shortest)") {
    assert(str("$string(2.5e22)") == "2.5e+22")      // Java: 2.4999999999999998E22
    assert(str("$string(5e-324)") == "5e-324")       // Java: 4.9E-324
  }

  test("negative zero prints as 0") {
    assert(str("$string(-0)") == "0")
  }
}
