package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType, VariantType}
import org.apache.spark.unsafe.types.UTF8String

import graft.connect.JsonataTransform
import graft.jsonata.{Ast, Jsonata, JsonataException, Values}

/** Static analysis over a compiled JSONata AST, used for Catalyst integration:
  *
  *  - determinism: expressions touching $random/$shuffle/$now/$millis/$eval
  *    must not be constant-folded or re-executed assuming stable results
  *    (SURVEY.md §4.1);
  *  - envelope field pruning: if the expression provably never references an
  *    envelope field (no `$`/`$$`/wildcard/descendant/parent escape, no
  *    object-introspection builtins, and the name never appears as a path
  *    step), the field can be dropped before serialization (SURVEY.md §4.2).
  */
object JsonataAnalysis {
  import Ast._

  private val nondetFns = Set("random", "shuffle", "now", "millis", "eval")

  private def walk(a: Ast)(f: Ast => Unit): Unit = { f(a); Ast.children(a).foreach(walk(_)(f)) }

  def isDeterministic(a: Ast): Boolean = {
    var det = true
    walk(a) {
      case VarRef(n) if nondetFns(n) => det = false
      case _ =>
    }
    det
  }

  /** Which fields of the envelope's `value` object can the expression read?
    * None = all of them (the expression reaches `value` — or the whole
    * envelope — without naming sub-fields); Some(names) = a sound superset.
    *
    * Soundness argument: `value`'s sub-fields can only be reached (a) by a
    * path step immediately following a `value` step — those names are
    * collected — or (b) by obtaining the `value` object (or the envelope root)
    * wholesale and introspecting it. Case (b) escapes: a path that *ends* at
    * `value` (including bare `value` used as a function argument), a `value`
    * step carrying predicates/bindings, `$`/`$$`, wildcard/descendant/parent
    * steps, transforms, zero-arg context-injected builtins, and 1-arg $eval
    * (whose dynamic expression runs against the call context). A 2-arg $eval
    * evaluates against its explicit context argument only, so it is safe. */
  def referencedValueFields(a: Ast): Option[Set[String]] = {
    var escape = false
    var names = Set.empty[String]
    def scanPath(steps: Vector[Step]): Unit =
      steps.zipWithIndex.foreach { case (st, i) =>
        st.expr match {
          case NameStep("value") =>
            if (st.stages.nonEmpty || st.focus.isDefined || st.index.isDefined) escape = true
            else if (i + 1 < steps.length) steps(i + 1).expr match {
              case NameStep(n) => names += n
              case _ => escape = true
            }
            else escape = true // path yields the whole value object
          case _ =>
        }
      }
    def scan(node: Ast): Unit = node match {
      case Call(VarRef("eval"), args) if args.length >= 2 => args.foreach(scan)
      case Call(VarRef("eval"), _) => escape = true
      case Call(proc @ VarRef(fn), args) =>
        // zero-arg contextable builtins read the whole context ($string() etc.);
        // $now/$millis/$random take no input at all
        if (args.isEmpty && !Set("now", "millis", "random")(fn)) escape = true
        else { scan(proc); args.foreach(scan) }
      case VarRef("") | VarRef("$") => escape = true // $ / $$ expose the whole envelope
      case Wildcard() | Descendant() | ParentRef() => escape = true
      case TransformExpr(_, _, _) => escape = true
      case NameStep("value") => escape = true // bare `value` outside a path
      case p: Path =>
        scanPath(p.steps)
        // recurse into non-name step exprs, stages and the group
        p.steps.foreach { st =>
          st.expr match {
            case NameStep(_) =>
            case e => scan(e)
          }
          st.stages.foreach {
            case FilterStage(e) => scan(e)
            case SortStage(ts) => ts.foreach(t => scan(t.expr))
            case IndexStage(_) =>
          }
        }
        p.group.foreach(scan)
      case other => Ast.children(other).foreach(scan)
    }
    scan(a)
    if (escape) None else Some(names)
  }
}

/** Analysis-time input validation shared by the jsonata expressions: a
  * wrong-typed column becomes a clean AnalysisException instead of an
  * executor-side ClassCastException mid-job. */
trait JsonataInputCheck { self: UnaryExpression =>
  protected def acceptedInput: String
  protected def acceptsInput(dt: DataType): Boolean
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (acceptsInput(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $acceptedInput input, got ${child.dataType.sql}")
}

/** `jsonata(jsonString, expr)` as a native Catalyst expression.
  *
  * CodegenFallback (the evaluator is interpreted), null-tolerant, returns the
  * JSON-serialized result or null for "no match" (tombstone) — the Spark
  * mapping of the reference's apply() (SURVEY.md §2.A A1/A3). The compiled AST
  * lives in a per-JVM cache keyed by source, so executors compile once
  * (SURVEY.md §2.A A12).
  *
  * `permissive = true` is the per-record error policy (the Spark analog of
  * Connect's errors.tolerance=all + DLQ routing around the reference's
  * DataException wrap, JsonataTransformation.java:96-107): the result becomes
  * `struct<out string, error string>`, and a record whose evaluation raises —
  * type error, timeout, depth overflow, malformed input JSON — yields
  * (null, message) instead of failing the job. Expression *parse* errors still
  * throw at analysis time in both modes: a bad expression is a config error,
  * not a data error.
  */
case class JsonataExpression(
    child: Expression,
    exprSource: String,
    timeoutMs: Long = 5000L,
    maxDepth: Int = 1000,
    permissive: Boolean = false)
  extends UnaryExpression with CodegenFallback with JsonataInputCheck {

  @transient private lazy val compiled = JsonataTransform.compile(exprSource)

  override protected def acceptedInput: String = "a JSON string"
  override protected def acceptsInput(dt: DataType): Boolean = dt == StringType

  override def dataType: DataType =
    if (permissive)
      StructType(Seq(StructField("out", StringType, nullable = true),
        StructField("error", StringType, nullable = true)))
    else StringType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean =
    JsonataAnalysis.isDeterministic(compiled.ast) && child.deterministic

  private def evalOne(input: Any): UTF8String = {
    val node = Jsonata.parseJsonBytes(input.asInstanceOf[UTF8String].getBytes)
    val out = compiled.evaluate(node, timeoutMs, maxDepth)
    // no-match AND explicit null both drop the record (reference
    // jsonNodeToRecord:295-297 treats a JSON-null result as a tombstone)
    if (out == null || out.isNull) null
    else UTF8String.fromString(Values.jsonSerialize(out, prettify = false))
  }

  override def nullSafeEval(input: Any): Any =
    if (!permissive) evalOne(input)
    else try InternalRow(evalOne(input), null)
    catch {
      case e: JsonataException =>
        InternalRow(null, UTF8String.fromString(s"Could not evaluate expression: ${e.getMessage}"))
      case e: com.fasterxml.jackson.core.JacksonException =>
        InternalRow(null, UTF8String.fromString(s"Could not parse record JSON: ${e.getMessage}"))
    }

  override def prettyName: String = if (permissive) "jsonata_try" else "jsonata"
  override protected def withNewChildInternal(newChild: Expression): JsonataExpression =
    copy(child = newChild)
}

/** Typed record transform: struct in, declared struct out — no JSON text
  * anywhere on the hot path.
  *
  * Where [[JsonataExpression]] round-trips JSON strings (row -> to_json ->
  * Jackson parse -> eval -> serialize -> from_json -> row: two parses and two
  * serializations per record), this expression converts the InternalRow to a
  * Jackson tree directly, evaluates, and decodes the result tree into the
  * declared output schema — the reference's tree-in/tree-out apply()
  * (JsonataTransformation.java:133-156) mapped onto Catalyst. Null return =
  * tombstone (the whole struct is null; callers filter it).
  */
case class JsonataRowExpression(
    child: Expression,
    exprSource: String,
    outputSchema: StructType,
    topic: String = "rows",
    timeoutMs: Long = 5000L,
    maxDepth: Int = 1000)
  extends UnaryExpression with CodegenFallback with JsonataInputCheck {

  @transient private lazy val compiled = JsonataTransform.compile(exprSource)
  @transient private lazy val childSchema = child.dataType.asInstanceOf[StructType]

  override protected def acceptedInput: String = "a struct"
  override protected def acceptsInput(dt: DataType): Boolean = dt.isInstanceOf[StructType]

  override def dataType: DataType = outputSchema
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean =
    JsonataAnalysis.isDeterministic(compiled.ast) && child.deterministic

  override def nullSafeEval(input: Any): Any = {
    val env = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
    env.put("topic", topic)
    env.put("kafkaPartition", 0)
    env.set[com.fasterxml.jackson.databind.JsonNode]("value",
      RowJson.rowToJson(input.asInstanceOf[InternalRow], childSchema))
    val out = compiled.evaluate(env, timeoutMs, maxDepth)
    if (out == null || out.isNull) null
    else RowJson.jsonToRow(out, outputSchema)
  }

  override def prettyName: String = "jsonata_row"
  override protected def withNewChildInternal(newChild: Expression): JsonataRowExpression =
    copy(child = newChild)
}

/** JSON-string output with a direct struct input: encode InternalRow ->
  * Jackson tree (no to_json, no input parse), evaluate, serialize the result
  * once. One text operation per record where the string-column form
  * ([[JsonataExpression]]) needs three (to_json + parse + serialize).
  *
  * `wrapValue = true` builds the standard `{topic, kafkaPartition, value}`
  * envelope around the row; `false` treats the row itself as the envelope
  * (the transformRecords surface, where the caller reifies topic/key/value/
  * headers columns directly).
  *
  * `permissive = true` is the same per-record error policy as
  * [[JsonataExpression]], with the original envelope serialized into the
  * third field ONLY for error rows (DLQ replay) — `struct<out, error,
  * record>`.
  */
case class JsonataRowJsonExpression(
    child: Expression,
    exprSource: String,
    topic: String = "rows",
    timeoutMs: Long = 5000L,
    maxDepth: Int = 1000,
    wrapValue: Boolean = true,
    permissive: Boolean = false)
  extends UnaryExpression with CodegenFallback with JsonataInputCheck {

  @transient private lazy val compiled = JsonataTransform.compile(exprSource)
  @transient private lazy val childSchema = child.dataType.asInstanceOf[StructType]

  override protected def acceptedInput: String = "a struct"
  override protected def acceptsInput(dt: DataType): Boolean = dt.isInstanceOf[StructType]

  override def dataType: DataType =
    if (permissive)
      StructType(Seq(
        StructField("out", StringType, nullable = true),
        StructField("error", StringType, nullable = true),
        StructField("record", StringType, nullable = true)))
    else StringType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean =
    JsonataAnalysis.isDeterministic(compiled.ast) && child.deterministic

  private def envelopeOf(input: Any): com.fasterxml.jackson.databind.JsonNode = {
    val row = RowJson.rowToJson(input.asInstanceOf[InternalRow], childSchema)
    if (!wrapValue) row
    else {
      val env = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
      env.put("topic", topic)
      env.put("kafkaPartition", 0)
      env.set[com.fasterxml.jackson.databind.JsonNode]("value", row)
      env
    }
  }

  private def evalOne(env: com.fasterxml.jackson.databind.JsonNode): UTF8String = {
    val out = compiled.evaluate(env, timeoutMs, maxDepth)
    if (out == null || out.isNull) null
    else UTF8String.fromString(Values.jsonSerialize(out, prettify = false))
  }

  override def nullSafeEval(input: Any): Any = {
    val env = envelopeOf(input)
    if (!permissive) evalOne(env)
    else try InternalRow(evalOne(env), null, null)
    catch {
      case e: JsonataException =>
        InternalRow(null,
          UTF8String.fromString(s"Could not evaluate expression: ${e.getMessage}"),
          UTF8String.fromString(Values.jsonSerialize(env, prettify = false)))
    }
  }

  override def prettyName: String = if (permissive) "jsonata_try" else "jsonata"
  override protected def withNewChildInternal(newChild: Expression): JsonataRowJsonExpression =
    copy(child = newChild)
}

/** Variant envelope tier (SURVEY.md §1.4 design target): `jsonata_variant`
  * evaluates against a JSON-string OR VariantType input and returns
  * `VariantType` — the binary-encoded dynamic-column format — instead of a
  * JSON string. Downstream traversal stays native (`variant_get` /
  * `try_variant_get`, codegen'd, shreddable at the scan) rather than
  * re-parsing JSON text per access. The result tree feeds Spark's
  * VariantBuilder through a Jackson tree-traversing parser — no JSON text is
  * produced on the output side. Tombstone (null / JSON-null result) stays a
  * SQL NULL. The JSON-string tier ([[JsonataExpression]]) remains the
  * fallback surface.
  */
case class JsonataVariantExpression(
    child: Expression,
    exprSource: String,
    timeoutMs: Long = 5000L,
    maxDepth: Int = 1000)
  extends UnaryExpression with CodegenFallback with JsonataInputCheck {

  @transient private lazy val compiled = JsonataTransform.compile(exprSource)
  @transient private lazy val inputIsVariant = child.dataType == VariantType

  override protected def acceptedInput: String = "a JSON string or variant"
  override protected def acceptsInput(dt: DataType): Boolean =
    dt == StringType || dt == VariantType

  override def dataType: DataType = VariantType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean =
    JsonataAnalysis.isDeterministic(compiled.ast) && child.deterministic

  override def nullSafeEval(input: Any): Any = {
    val node =
      if (inputIsVariant) {
        val vv = input.asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
        // direct binary walk — no JSON text on the input side (VariantJson
        // pins equivalence with the old toJson+parse form)
        VariantJson.toJsonNode(new org.apache.spark.types.variant.Variant(
          vv.getValue, vv.getMetadata))
      } else Jsonata.parseJsonBytes(input.asInstanceOf[UTF8String].getBytes)
    val out = compiled.evaluate(node, timeoutMs, maxDepth)
    if (out == null || out.isNull) null
    else {
      val p = out.traverse() // tree-traversing parser: no JSON text produced
      p.nextToken() // position on the first token (the String overload does this itself)
      val v = org.apache.spark.types.variant.VariantBuilder.parseJson(p, false)
      new org.apache.spark.unsafe.types.VariantVal(v.getValue, v.getMetadata)
    }
  }

  override def prettyName: String = "jsonata_variant"
  override protected def withNewChildInternal(newChild: Expression): JsonataVariantExpression =
    copy(child = newChild)
}

object JsonataFunctions {
  import org.apache.spark.sql.graftshim.Shims

  /** Column function: evaluate a JSONata expression against a JSON-string column. */
  def jsonata(json: Column, expr: String,
              timeoutMs: Long = 5000L, maxDepth: Int = 1000): Column =
    Shims.column(JsonataExpression(Shims.expression(json), expr, timeoutMs, maxDepth))

  /** Variant-output tier: evaluate against a JSON-string or variant column,
    * return VariantType (see [[JsonataVariantExpression]]). */
  def jsonataVariant(json: Column, expr: String,
                     timeoutMs: Long = 5000L, maxDepth: Int = 1000): Column =
    Shims.column(JsonataVariantExpression(Shims.expression(json), expr, timeoutMs, maxDepth))

  /** Permissive variant: `struct<out, error>` per record — evaluation errors
    * are captured, never thrown (the DLQ analog; see [[JsonataExpression]]). */
  def jsonataTry(json: Column, expr: String,
                 timeoutMs: Long = 5000L, maxDepth: Int = 1000): Column =
    Shims.column(JsonataExpression(Shims.expression(json), expr, timeoutMs, maxDepth,
      permissive = true))

  /** Register `jsonata(json, expr)` and `jsonata_try(json, expr)` for SQL use
    * (UDF form: the expression argument is dynamic, so the compile cache does
    * the memoization). `jsonata_try` returns `struct<out, error>` like the
    * permissive Column form. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("jsonata", (json: String, expr: String) => {
      if (json == null) null
      else {
        val out = JsonataTransform.compile(expr).evaluate(Jsonata.parseJson(json))
        if (out == null || out.isNull) null else Values.jsonSerialize(out, prettify = false)
      }
    })
    spark.udf.register("jsonata_try", (json: String, expr: String) => {
      if (json == null) (null: String, null: String)
      else try {
        val out = JsonataTransform.compile(expr).evaluate(Jsonata.parseJson(json))
        (if (out == null || out.isNull) null else Values.jsonSerialize(out, prettify = false),
          null: String)
      } catch {
        case e: JsonataException =>
          (null, s"Could not evaluate expression: ${e.getMessage}")
        case e: com.fasterxml.jackson.core.JacksonException =>
          (null, s"Could not parse record JSON: ${e.getMessage}")
      }
    })
    registerNativeSql(spark)
  }

  /** Extract a foldable string argument (the JSONata source / output DDL must
    * be a literal — it shapes the plan, it cannot vary per row). */
  private def foldableString(e: Expression, what: String): String = e match {
    case lit if lit.foldable && lit.dataType == StringType =>
      val v = lit.eval(null)
      if (v == null) throw new IllegalArgumentException(s"$what must not be NULL")
      v.toString
    case _ => throw new IllegalArgumentException(
      s"$what must be a string literal, got ${e.sql}")
  }

  private def foldableLong(e: Expression, what: String): Long = e match {
    case lit if lit.foldable =>
      val v = lit.eval(null)
      if (v == null) throw new IllegalArgumentException(s"$what must not be NULL")
      v.toString.toLong
    case _ => throw new IllegalArgumentException(s"$what must be a literal, got ${e.sql}")
  }

  /** Shared native-function builders — ONE definition behind both SQL
    * registration surfaces (post-startup [[registerNativeSql]] and the
    * startup [[GraftExtensions]] catalog injection), so argument validation
    * cannot drift between them. */
  private[spark] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "jsonata" -> {
      case args if args.length >= 2 && args.length <= 4 =>
        JsonataExpression(args.head, foldableString(args(1), "jsonata expression"),
          if (args.length > 2) foldableLong(args(2), "jsonata timeoutMs") else 5000L,
          if (args.length > 3) foldableLong(args(3), "jsonata maxDepth").toInt else 1000)
      case _ => throw new IllegalArgumentException(
        "jsonata(json, 'expr'[, timeoutMs[, maxDepth]])")
    },
    "jsonata_row" -> {
      case Seq(child, exprArg) =>
        JsonataRowJsonExpression(child, foldableString(exprArg, "jsonata_row expression"))
      case args => throw new IllegalArgumentException(
        s"jsonata_row(struct, 'expr') takes 2 arguments, got ${args.length}")
    },
    "jsonata_row_try" -> {
      case Seq(child, exprArg) =>
        JsonataRowJsonExpression(child,
          foldableString(exprArg, "jsonata_row_try expression"), permissive = true)
      case args => throw new IllegalArgumentException(
        s"jsonata_row_try(struct, 'expr') takes 2 arguments, got ${args.length}")
    },
    "jsonata_typed" -> {
      case Seq(child, exprArg, ddlArg) =>
        JsonataRowExpression(child,
          foldableString(exprArg, "jsonata_typed expression"),
          StructType.fromDDL(foldableString(ddlArg, "jsonata_typed output schema")))
      case args => throw new IllegalArgumentException(
        s"jsonata_typed(struct, 'expr', 'ddl') takes 3 arguments, got ${args.length}")
    },
    "jsonata_variant" -> {
      case Seq(child, exprArg) =>
        JsonataVariantExpression(child, foldableString(exprArg, "jsonata_variant expression"))
      case args => throw new IllegalArgumentException(
        s"jsonata_variant(json_or_variant, 'expr') takes 2 arguments, got ${args.length}")
    })

  /** Direct-codec SQL surface — the struct path the Column API already has
    * (JsonataRowJsonExpression / JsonataRowExpression), reachable from
    * `spark.sql`:
    *
    *  - `jsonata_row(struct, 'expr')` -> JSON string: the input row is encoded
    *    straight to a Jackson tree (no `to_json`), one serialization on the
    *    way out — 1 text op/record where the string-UDF form needs 3;
    *  - `jsonata_typed(struct, 'expr', 'a INT, b STRING')` -> typed struct:
    *    tree-in/tree-out with the declared schema — 0 text ops/record, the
    *    SQL analog of `JsonataDF.transformAs`. NULL result = tombstone
    *    (filter with `IS NOT NULL`);
    *  - `jsonata_row_try(struct, 'expr')` -> `struct<out, error, record>`:
    *    the permissive per-record error policy (DLQ analog) on the struct
    *    path — poison records yield (null, message, original-envelope JSON)
    *    instead of failing the job.
    *
    * Both wrap the struct as the standard `{topic, kafkaPartition, value}`
    * envelope, matching every other entry point.
    *
    * NOTE: like `spark.udf.register`, this (re)binds the function names
    * session-wide — an explicit, caller-opted API action (the registry demo
    * queries call it), not a hidden side effect; a session temp function the
    * caller already registered under one of these names is replaced. */
  def registerNativeSql(spark: org.apache.spark.sql.SparkSession): Unit =
    // the struct/variant surface only: the name `jsonata` stays bound to the
    // dynamic-expression UDF that registerSql installs (the catalog-extension
    // route, GraftExtensions, binds the native form instead)
    builders.filter(_._1 != "jsonata").foreach { case (name, b) =>
      Shims.registerFunction(spark, name, b)
    }
}
