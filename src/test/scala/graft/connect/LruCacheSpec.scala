package graft.connect

import org.scalatest.funsuite.AnyFunSuite

/** Pins the compile cache's LRU behavior (reference: Guava LRU capped at 100,
  * JsonataTransformation.java:57-63): overflowing evicts only the
  * least-recently-used entry, and touching an entry protects it.
  */
class LruCacheSpec extends AnyFunSuite {

  test("entry 101 evicts only the least-recently-used, not everything") {
    // distinctive literals so these keys can't collide with other suites
    def expr(i: Int): String = s"${1000000 + i} + 0"
    val n = JsonataTransform.MaxCacheSize
    (0 until n).foreach(i => JsonataTransform.compile(expr(i)))
    // touch expr(0) so expr(1) becomes the LRU entry
    JsonataTransform.compile(expr(0))
    // overflow by one
    JsonataTransform.compile(expr(n))
    assert(!JsonataTransform.isCached(expr(1)), "LRU entry must be evicted")
    assert(JsonataTransform.isCached(expr(0)), "recently-touched entry must survive")
    assert(JsonataTransform.isCached(expr(n)), "new entry must be cached")
    // every other entry survives — the old clear-on-full behavior would have
    // dropped all of them
    (2 until n).foreach { i =>
      assert(JsonataTransform.isCached(expr(i)), s"entry $i must survive a single eviction")
    }
  }
}
