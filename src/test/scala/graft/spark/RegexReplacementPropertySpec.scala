package graft.spark

import java.util.regex.Pattern

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.jsonata.Jsonata

/** The compile-time $replace replacement re-expansion (javaReplacement) must
  * agree with the ENGINE's own replacement algorithm for arbitrary
  * replacement strings — including every `$` corner: `$$`, `$0`, group
  * numbers at/over the group count, greedy multi-digit resolution, dangling
  * `$`, and literal backslashes (which Java's appendReplacement treats as
  * escapes where the engine is literal). The Java side runs through
  * Matcher.replaceAll — the exact machinery Spark's regexp_replace uses —
  * so agreement here IS compiled-tier/interpreted-tier agreement for any
  * input data, not just fixture text. */
class RegexReplacementPropertySpec extends AnyFunSuite {

  /** Deterministic forAll replacement: n seeded samples (the
    * scalatest-scalacheck bridge isn't in the offline cache). */
  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  // patterns with 0, 1, 2, and 11 capture groups (11 exercises multi-digit
  // greedy resolution: $10/$11 valid, $12 = group 1 + literal "2")
  private val patterns = Seq(
    "x",
    "(a)",
    "(a)(b)?",
    "(.)(.)",
    "(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)")

  private val inputs = Seq(
    "xaxbx", "abcdefghijk", "aa bb ab ba", "", "ab", "no-match-here", "a$b\\c")

  private val replChar =
    Gen.frequency(6 -> Gen.oneOf('a', 'b', 'z', ' '), 4 -> Gen.const('$'),
      3 -> Gen.choose('0', '9'), 2 -> Gen.const('\\'))
  private val replGen: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, replChar).map(_.mkString))

  private def engineReplace(input: String, pat: String, repl: String): String = {
    // literal-safe embedding: input via the context ($), replacement via a
    // quoted literal with ' and \ escaped
    val quoted = repl.replace("\\", "\\\\").replace("'", "\\'")
    Jsonata.compile(s"$$replace($$, /$pat/, '$quoted')")
      .evaluate(com.fasterxml.jackson.databind.node.TextNode.valueOf(input)).textValue()
  }

  test("javaReplacement through Matcher.replaceAll equals the engine for arbitrary replacements") {
    val caseGen = for {
      pat <- Gen.oneOf(patterns)
      input <- Gen.oneOf(inputs)
      repl <- replGen
    } yield (pat, input, repl)
    forSamples(caseGen, 2000) { case (pat, input, repl) =>
      val p = Pattern.compile(pat)
      val converted = JsonataCompiler.javaReplacement(repl, p.matcher("").groupCount())
      val viaJava = p.matcher(input).replaceAll(converted)
      val viaEngine = engineReplace(input, pat, repl)
      assert(viaJava == viaEngine,
        s"pattern=/$pat/ input='$input' repl='$repl' converted='$converted'")
    }
  }

  test("documented corners resolve exactly") {
    val p2 = Pattern.compile("(a)(b)?").matcher("").groupCount()
    assert(JsonataCompiler.javaReplacement("$$", p2) == "\\$")
    assert(JsonataCompiler.javaReplacement("$0", p2) == "\\$0") // $0 is literal in the engine
    assert(JsonataCompiler.javaReplacement("$1$2", p2) == "$1$2")
    assert(JsonataCompiler.javaReplacement("$3", p2) == "\\$3") // over groupCount -> literal
    assert(JsonataCompiler.javaReplacement("$", p2) == "\\$") // dangling
    assert(JsonataCompiler.javaReplacement("\\", p2) == "\\\\") // literal backslash
    val p11 = Pattern.compile("(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)").matcher("").groupCount()
    assert(JsonataCompiler.javaReplacement("$11", p11) == "$11") // greedy: group 11
    assert(JsonataCompiler.javaReplacement("$12", p11) == "$1" + "2") // 12 > 11 -> group 1 + '2'
  }
}
