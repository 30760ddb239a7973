package graft.jsonata

import org.scalatest.funsuite.AnyFunSuite

/** Fourth conformance wave: partial application, comparator sorts, grouping
  * aggregation shapes, object/array builtin corners, integer pictures, and
  * truthiness of composite values — jsonata.org 1.8 semantics. */
class ParityWave4Spec extends AnyFunSuite {

  private val UNDEF = " UNDEF "

  private def check(expr: String, input: String, expected: String): Unit = {
    val actual = Jsonata.evalString(expr, input)
    if (expected == UNDEF) assert(actual == null, s"expr: $expr — expected no result, got $actual")
    else {
      assert(actual != null, s"expr: $expr — expected $expected, got no result")
      assert(Values.deepEquals(Jsonata.parseJson(expected), Jsonata.parseJson(actual)),
        s"expr: $expr — expected $expected, got $actual")
    }
  }
  private def t(name: String, expr: String, input: String, expected: String): Unit =
    test(name) { check(expr, input, expected) }

  // ---- partial application ----
  t("partial application of a builtin",
    "( $first5 := $substring(?, 0, 5); $first5('Hello World') )", "{}", "\"Hello\"")
  t("partial application of a lambda",
    "( $add := function($a, $b){ $a + $b }; $add10 := $add(?, 10); $add10(32) )", "{}", "42")
  t("chain with extra args is application, not partial",
    "'hello' ~> $substring(0, 3)", "{}", "\"hel\"")

  // ---- comparator sorts / reductions ----
  t("$sort with comparator", "$sort([3,1,2], function($l,$r){ $l > $r })", "{}", "[1,2,3]")
  t("$sort comparator descending", "$sort([3,1,2], function($l,$r){ $l < $r })", "{}", "[3,2,1]")
  t("$reduce with init", "$reduce([1..4], function($a,$b){ $a + $b }, 10)", "{}", "20")
  t("$reduce without init", "$reduce([1..4], function($a,$b){ $a * $b })", "{}", "24")
  t("$single happy path", "$single([1,2,3], function($v){ $v = 2 })", "{}", "2")

  // ---- multi-key order-by ----
  t("order-by two keys, first descending",
    "items^(>a, b).id",
    """{"items": [
      {"id": 1, "a": 1, "b": 2}, {"id": 2, "a": 2, "b": 1},
      {"id": 3, "a": 1, "b": 1}, {"id": 4, "a": 2, "b": 2}]}""",
    "[2,4,3,1]")

  // ---- grouping: singleton values stay scalar, repeats collect ----
  t("group-by collects repeats, keeps singletons scalar",
    "items{lang: id}",
    """{"items": [{"lang": "en", "id": 1}, {"lang": "de", "id": 2}, {"lang": "en", "id": 3}]}""",
    """{"en": [1,3], "de": 2}""")
  t("group-by key from expression",
    "items{$uppercase(lang): $count($)}",
    """{"items": [{"lang": "en"}, {"lang": "de"}, {"lang": "en"}]}""",
    """{"EN": 2, "DE": 1}""")

  // ---- object/array builtin corners ----
  t("$each over object", "$each({'a': 1, 'b': 2}, function($v, $k){ $k & '=' & $v })",
    "{}", """["a=1", "b=2"]""")
  t("$spread object", "$spread({'a': 1, 'b': 2})", "{}", """[{"a": 1}, {"b": 2}]""")
  t("$keys of object array is the union", "$keys([{'a': 1}, {'b': 2}, {'a': 3}])",
    "{}", """["a", "b"]""")
  t("$lookup across object array", "$lookup([{'a': 1}, {'b': 2}, {'a': 3}], 'a')",
    "{}", "[1,3]")
  t("$zip three-way truncates to shortest", "$zip([1,2],[3,4,5],[6,7])",
    "{}", "[[1,3,6],[2,4,7]]")
  t("$distinct preserves first-seen order", "$distinct([3,1,3,2,1])", "{}", "[3,1,2]")
  t("$type of values", "[$type(1), $type('x'), $type(true), $type(null), $type([1]), $type({})]",
    "{}", """["number", "string", "boolean", "null", "array", "object"]""")
  t("$average of empty is undefined", "$average(v)", """{"v": []}""", UNDEF)

  // ---- integer pictures ----
  t("$formatBase binary", "$formatBase(100, 2)", "{}", "\"1100100\"")
  t("$formatInteger roman", "$formatInteger(1999, 'I')", "{}", "\"MCMXCIX\"")
  t("$parseInteger roman", "$parseInteger('MCMXCIX', 'I')", "{}", "1999")
  t("$formatInteger words", "$formatInteger(2789, 'w')", "{}",
    "\"two thousand, seven hundred and eighty-nine\"")

  // ---- $formatNumber scientific notation (XPath 'e' exponent separator) ----
  t("$formatNumber scientific", "$formatNumber(1234.5678, '00.000e0')", "{}", "\"12.346e2\"")
  t("$formatNumber scientific negative exponent", "$formatNumber(0.234, '0.0e0')", "{}", "\"2.3e-1\"")
  t("$formatNumber regex surface unaffected", "$formatNumber(1234.5678, '#,##0.00')", "{}", "\"1,234.57\"")

  // ---- regex surface ----
  t("$replace with lambda replacement",
    "$replace('abc', /b/, function($m){ $uppercase($m.match) })", "{}", "\"aBc\"")
  t("$match structure", "$match('ababab', /ab/)[1]", "{}",
    """{"match": "ab", "index": 2, "groups": []}""")
  t("case-insensitive flag", "$match('ABC', /abc/i).match", "{}", "\"ABC\"")
  t("$split on regex", "$split('a1b2c', /\\d/)", "{}", """["a", "b", "c"]""")
  t("$contains with regex", "$contains('hello', /l+/)", "{}", "true")

  // ---- datetime picture names ----
  t("weekday name", "$fromMillis(0, '[FNn]')", "{}", "\"Thursday\"")
  t("ordinal day + month name", "$fromMillis(0, '[D1o] [MNn]')", "{}", "\"1st January\"")
  t("roman year", "$fromMillis(1510067557121, '[YI]')", "{}", "\"MMXVII\"")
  t("date-only toMillis", "$toMillis('1970-01-01')", "{}", "0")
  t("toMillis month-name picture", "$toMillis('7 Nov 2017', '[D] [MNn,3-3] [Y]')", "{}", "1510012800000")
  t("toMillis day-of-year picture round-trips fromMillis",
    "$toMillis($fromMillis(1510012800000, '[Y]-[d]'), '[Y]-[d]')", "{}", "1510012800000")
  t("toMillis time-only picture", "$toMillis('13:45', '[H]:[m]')", "{}", "49500000")

  // ---- truthiness of composite values ----
  t("empty array is falsy", "[] ? 'y' : 'n'", "{}", "\"n\"")
  t("array of falsy values is falsy", "[0, false, ''] ? 'y' : 'n'", "{}", "\"n\"")
  t("array with one truthy member is truthy", "[0, 1] ? 'y' : 'n'", "{}", "\"y\"")
  t("empty object is falsy", "{} ? 'y' : 'n'", "{}", "\"n\"")
  t("non-empty object is truthy", "{'a': 0} ? 'y' : 'n'", "{}", "\"y\"")

  // ---- deep equality on structures ----
  t("deep object equality", "{'a': [1, {'b': 2}]} = {'a': [1, {'b': 2}]}", "{}", "true")
  t("deep inequality on nested value", "{'a': [1, {'b': 2}]} = {'a': [1, {'b': 3}]}", "{}", "false")

  // ---- keep-array marker ----
  t("keep-array marker preserves singleton as array", "a[].b", """{"a": {"b": 1}}""", "[1]")
  t("keep-array marker on result step", "a.b[]", """{"a": {"b": 1}}""", "[1]")
}
