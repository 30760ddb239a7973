package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The analyzer rule: jsonata_typed SQL calls in the compiled subset rewrite
  * to native expressions at plan time; everything else keeps the interpreter.
  * Semantics pinned against the interpreted tier's contract: tombstone
  * conditions, null input structs, key-absent declared fields, and — the
  * capture hazard specific to a plan-time rewrite — struct fields shadowing
  * same-named plan-scope columns. */
class JsonataRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark
    import sp.implicits._
    Seq((1L, "ab"), (2L, "cd"), (3L, "ef"))
      .toDF("id", "s").createOrReplaceTempView("t")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("compiled subset rewrites to native expressions — no interpreter in the plan") {
    val df = spark.sql("""
      SELECT r.x, r.y FROM (
        SELECT jsonata_typed(named_struct('a', id, 'b', s),
                 '{''x'': value.a + 1, ''y'': $uppercase(value.b)}',
                 'x BIGINT, y STRING') AS r FROM t)
      ORDER BY r.x""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("jsonata"),
      "compilable query must not reach the interpreter\n" + plan.take(2000))
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "AB"), (3L, "CD"), (4L, "EF")))
  }

  test("struct fields do not capture same-named plan-scope columns") {
    // the struct binds a = id + 100; the FROM relation ALSO has a column
    // that a naive attribute rewrite would resolve `value.a` against
    val df = spark.sql("""
      SELECT r.x FROM (
        SELECT id AS a, jsonata_typed(named_struct('a', id + 100),
                 '{''x'': value.a}', 'x BIGINT') AS r FROM t)
      ORDER BY r.x""")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(101L, 102L, 103L))
  }

  test("outside the subset the interpreter stays — fallback by construction") {
    // range-backed source: a LocalRelation would let the optimizer fold the
    // interpreter call at plan time, which (correctly) hides it from the plan
    val df = spark.sql("""
      SELECT r.x FROM (
        SELECT jsonata_typed(named_struct('a', CAST(id AS STRING)),
                 '{''x'': $eval(''"1"'')}', 'x STRING') AS r FROM range(1, 4))""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("jsonata"), plan.take(2000))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("1", "1", "1"))
  }

  test("tombstone condition compiles to a null row; IS NOT NULL filters it") {
    val df = spark.sql("""
      SELECT r.x FROM (
        SELECT jsonata_typed(named_struct('a', id),
                 'value.a > 1 ? {''x'': value.a}', 'x BIGINT') AS r FROM t)
      WHERE r IS NOT NULL ORDER BY r.x""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("jsonata"), plan.take(2000))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("inverted tombstone: an UNDEFINED condition is falsy and keeps the record") {
    // a = null for id 2: `value.a > 1` is undefined there — the engine takes
    // the else branch ({} decodes to an all-null row), so the compiled
    // negation must coalesce, not propagate, the null condition
    val df = spark.sql("""
      SELECT r FROM (
        SELECT jsonata_typed(named_struct('a', IF(id = 2, CAST(NULL AS BIGINT), id)),
                 'value.a > 1 ? null : {''x'': value.a}', 'x BIGINT') AS r FROM t)
      WHERE r IS NOT NULL""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("jsonata"), plan.take(2000))
    val rows = df.collect().map(r =>
      if (r.getStruct(0).isNullAt(0)) None else Some(r.getStruct(0).getLong(0))).toSet
    // id 1 -> x=1 (1 > 1 false); id 2 -> undefined cond, kept, x absent ->
    // null; id 3 -> 3 > 1 truthy -> tombstone, filtered
    assert(rows == Set(Some(1L), None), s"got $rows")
  }

  test("NULL input struct yields a NULL result row, like nullSafeEval") {
    val df = spark.sql("""
      SELECT r FROM (
        SELECT jsonata_typed(IF(id = 2, CAST(NULL AS STRUCT<a: BIGINT>),
                                named_struct('a', id)),
                 '{''x'': value.a}', 'x BIGINT') AS r FROM t)""")
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.filterNot(_.isNullAt(0))
      .map(_.getStruct(0).getLong(0)).toSet == Set(1L, 3L))
  }

  test("jx09's SQL surface auto-compiles under the rule: no interpreter in the driver plan") {
    // the registry query runs verbatim (the same builder Verify/Bench call;
    // both sessions now carry the extension) — with the rule, its
    // jsonata_typed projection must reach execution as native expressions
    val df = graft.SparkEntry.queries("jx09_sql_typed")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("jsonata"),
      "jx09 must run compiled under the analyzer rule\n" + plan.take(2000))
    assert(df.count() > 0)
  }

  test("nested struct paths re-root as extraction chains (value.a.b)") {
    val df = spark.sql("""
      SELECT r.x FROM (
        SELECT jsonata_typed(named_struct('a', named_struct('b', id * 10)),
                 '{''x'': value.a.b}', 'x BIGINT') AS r FROM t)
      ORDER BY r.x""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("jsonata"), plan.take(2000))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L))
  }

  test("compiled HOF lambdas survive the re-rooting (lambda vars untouched)") {
    val df = spark.sql("""
      SELECT r.s FROM (
        SELECT jsonata_typed(named_struct('xs', array(id, id + 1)),
                 '{''s'': $sum($map(value.xs, function($v){$v * 2}))}',
                 's BIGINT') AS r FROM t)
      ORDER BY r.s""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("jsonata"), plan.take(2000))
    // id in 1..3: sum(2*id + 2*(id+1)) = 4id + 2
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(6L, 10L, 14L))
  }

  test("200 fuzz-grammar shapes through the SQL surface agree with the interpreter") {
    // the same grammar FuzzDifferentialSpec drives through the DataFrame
    // tier, here routed through `jsonata_typed` + the analyzer rule: shapes
    // in the compiled subset execute rewritten, the rest interpreted — both
    // must equal the reference transformAs row-for-row
    val sp = spark
    import sp.implicits._
    val df = FuzzGrammar.rows.toDF("k", "num_a", "num_b", "str_a", "str_b", "arr")
    df.createOrReplaceTempView("fuzz_t")
    val gen = new FuzzGrammar.Gen(new scala.util.Random(777L))
    (1 to 200).foreach { n =>
      val (expr, ddl) = gen.top()
      val sqlExpr = expr.replace("'", "''")
      val out = sp.sql(
        s"""SELECT r.* FROM (
              SELECT jsonata_typed(named_struct('k', k, 'num_a', num_a,
                       'num_b', num_b, 'str_a', str_a, 'str_b', str_b,
                       'arr', arr), '$sqlExpr', '$ddl') AS r FROM fuzz_t)
            WHERE r IS NOT NULL ORDER BY r.k""")
      val a = out.collect().map(_.toSeq).toSeq
      val b = JsonataDF.transformAs(df, expr,
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(a.size == b.size, s"[sql-fuzz #$n] rows ${a.size} != ${b.size}\n  $expr")
      a.zip(b).foreach { case (ra, rb) =>
        val same = ra.zip(rb).forall {
          case (x: Double, y: Double) =>
            (x.isNaN && y.isNaN) || math.abs(x - y) <= math.abs(x).max(1.0) * 1e-12
          case (x, y) => x == y
        }
        assert(same, s"[sql-fuzz #$n] $expr\n  sql:         $ra\n  interpreted: $rb")
      }
    }
  }

  test("declared-but-absent output fields decode as typed nulls") {
    val df = spark.sql("""
      SELECT r.x, r.z FROM (
        SELECT jsonata_typed(named_struct('a', id),
                 '{''x'': value.a}', 'x BIGINT, z STRING') AS r FROM t)
      ORDER BY r.x""")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.forall(_.isNullAt(1)))
  }
}
