package graft.jsonata

import org.scalatest.funsuite.AnyFunSuite

/** Typed lambda signature enforcement (JSONata 1.8 "Function signatures";
  * T0410 on violation, matching jsonata-js / JSONata4Java at the reference's
  * delegation site, JsonataTransformation.java:104). */
class SignatureSpec extends AnyFunSuite {

  private def eval(expr: String, json: String = "{}"): String = {
    val out = Jsonata.compile(expr).evaluate(Jsonata.parseJson(json))
    if (out == null) null else Values.jsonSerialize(out, prettify = false)
  }

  private def expectError(expr: String, code: String, json: String = "{}"): Unit = {
    val e = intercept[JsonataException](eval(expr, json))
    assert(e.code == code, s"expected $code, got ${e.code}: ${e.getMessage}")
  }

  test("<s:s> accepts a string") {
    assert(eval("($up := function($x)<s:s>{ $uppercase($x) }; $up('abc'))") == "\"ABC\"")
  }

  test("<s:s> rejects a number with T0410") {
    expectError("($up := function($x)<s:s>{ $uppercase($x) }; $up(5))", "T0410")
  }

  test("<s:s> rejects a JSON null with T0410 (null is not undefined)") {
    expectError("($up := function($x)<s:s>{ $x }; $up(null))", "T0410")
  }

  test("undefined argument passes through a typed signature") {
    assert(eval("($up := function($x)<s:s>{ $x }; $up(nosuch.field))") == null)
  }

  test("<n:n> arithmetic works and rejects strings") {
    assert(eval("($sq := function($x)<n:n>{ $x * $x }; $sq(7))") == "49")
    expectError("($sq := function($x)<n:n>{ $x * $x }; $sq('7'))", "T0410")
  }

  test("<a<n>:n> accepts a number array and validates elements") {
    assert(eval("($sum2 := function($xs)<a<n>:n>{ $sum($xs) }; $sum2([1,2,3]))") == "6")
    expectError("($sum2 := function($xs)<a<n>:n>{ $sum($xs) }; $sum2(['a','b']))", "T0410")
  }

  test("array parameter coerces a singleton (and element-validates it)") {
    assert(eval("($sum2 := function($xs)<a<n>:n>{ $sum($xs) }; $sum2(5))") == "5")
    expectError("($sum2 := function($xs)<a<n>:n>{ $sum($xs) }; $sum2('x'))", "T0410")
  }

  test("choice type (sn) accepts either branch, rejects others") {
    val f = "($f := function($x)<(sn):s>{ $string($x) }; "
    assert(eval(f + "$f('a'))") == "\"a\"")
    assert(eval(f + "$f(5))") == "\"5\"")
    expectError(f + "$f(true))", "T0410")
  }

  test("optional parameter may be omitted; surplus arguments raise T0410") {
    assert(eval("($f := function($x, $y)<sn?:s>{ $y ? $string($y) : $x }; $f('a'))") == "\"a\"")
    assert(eval("($f := function($x, $y)<sn?:s>{ $y ? $string($y) : $x }; $f('a', 2))") == "\"2\"")
    expectError("($f := function($x)<s:s>{ $x }; $f('a', 'b'))", "T0410")
  }

  test("one-or-more consumes the rest and validates every argument") {
    assert(eval("($f := function($xs)<n+:n>{ $xs }; $f(1))") == "1")
    expectError("($f := function($x, $y)<nn+:n>{ $y }; $f(1, 'x'))", "T0410")
  }

  test("function-typed parameter accepts lambdas, rejects data") {
    assert(eval("($ap := function($g, $v)<fn:n>{ $g($v) }; $ap(function($x){ $x + 1 }, 41))") == "42")
    expectError("($ap := function($g, $v)<fn:n>{ $g($v) }; $ap(9, 41))", "T0410")
  }

  test("boolean and object and null symbols") {
    assert(eval("($f := function($b)<b:b>{ $not($b) }; $f(false))") == "true")
    assert(eval("($f := function($o)<o:n>{ $count($keys($o)) }; $f({'a':1,'b':2}))") == "2")
    assert(eval("($f := function($l)<l:b>{ $l = null }; $f(null))") == "true")
    expectError("($f := function($o)<o:n>{ 1 }; $f([1]))", "T0410")
  }

  test("untyped lambdas remain unrestricted") {
    assert(eval("($f := function($x){ $x }; $f(5))") == "5")
    assert(eval("($f := function($x){ $x }; $f('a', 'extra'))") == "\"a\"")
  }

  test("higher-order: typed lambda inside $map enforces per element") {
    assert(eval("$map([1,2,3], function($x)<n:n>{ $x * 2 })") == "[2,4,6]")
  }

  test("partial application still validates at the final call") {
    assert(eval("($add := function($a, $b)<nn:n>{ $a + $b }; ($inc := $add(?, 1); $inc(41)))") == "42")
    expectError("($add := function($a, $b)<nn:n>{ $a + $b }; ($inc := $add(?, 1); $inc('x')))", "T0410")
  }
}
