package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two `array<float>` columns.
  *
  * The composed form `aggregate(zip_with(a, b, multiply), 0.0, add)`
  * allocates an intermediate array and walks three lambda closures per
  * row; this expression is one fused loop inside whole-stage codegen —
  * the "custom Catalyst `Expression` beats a UDF" path for the one hot
  * scalar kernel in the similarity operators. Accumulation is the same
  * strict left-to-right double fold, so results are bit-identical to the
  * composed form (and to the DuckDB `list_reduce` oracles). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // Always nullable: a runtime length mismatch yields NULL even when both
  // inputs are non-nullable (and nullable=false would make ev.isNull a
  // non-assignable `false` literal in the generated code).
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  // Unequal lengths or a null element yield NULL — same contract as the
  // composed aggregate(zip_with(...)) form this kernel replaced, so the
  // scaladoc's bit-identical claim holds on malformed inputs too.
  private def mayContainNullElements: Boolean = Seq(left, right).exists {
    e => e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // Elide the per-element null check when both array types declare
      // containsNull=false (the fixture embeddings and plane literals) —
      // keeps the hot loop a straight fused multiply-add.
      val nullCheck = if (mayContainNullElements) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over two `array<bigint>` columns — the
  * hot kernel of IVF/PQ quantizer training and ADC encoding. The
  * composed `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, add)`
  * form walks three interpreted lambda closures per element (the r7
  * scale probe measured 139 s of IVF training at amplified sf0.1,
  * dominated by exactly this); one fused codegen loop removes the
  * per-element interpretation entirely. Pure long arithmetic, so the
  * result is identical to the composed form and to the DuckDB
  * `list_reduce` oracle twins — swapping the kernel cannot move a
  * single centroid. */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  // Same contract as DotProduct: length mismatch / null element → NULL.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sqdist"

  private def mayContainNullElements: Boolean = Seq(left, right).exists {
    e => e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck = if (mayContainNullElements) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

/** Size of the intersection of two SORTED long arrays — the hot
  * kernel of neighbor-set similarity (`graph_neighbor_jaccard`
  * intersects two adjacency arrays for every edge). The composed
  * `size(array_intersect(a, b))` builds a hash set over one side AND
  * materializes the intersection array per row, only for `size` to
  * throw it away; this expression is one allocation-free two-pointer
  * merge inside whole-stage codegen. Inputs MUST be sorted ascending
  * with no null elements — `sort_array(collect_set(...))` produces
  * exactly that, and the type check refuses `containsNull=true`
  * array types outright rather than miscounting at runtime (nulls
  * sort first and would desynchronize the pointers). Count semantics
  * match `size(array_intersect(...))` on set-valued inputs: each
  * distinct common element counts once. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_sorted_isect requires two array<bigint> arguments with " +
        s"non-null elements, got ${left.dataType.simpleString} and " +
        s"${right.dataType.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_isect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** The intersection VALUES of two SORTED long arrays — the per-edge
  * kernel of `graph_triangles`, which needs the common higher-rank
  * neighbors themselves (each one is a triangle's third corner, fed
  * to `explode` for corner crediting), not just their count.
  * `array_intersect` builds a hash set over one side per row before
  * materializing the result; this is one two-pointer merge into a
  * primitive long buffer, inside whole-stage codegen, with no hashing
  * and no boxing. Same input contract as [[SortedIntersectSize]]:
  * sorted ascending, no null elements (the type check refuses
  * `containsNull=true` outright), as `sort_array(collect_list(...))`
  * over a distinct edge set produces. On set-valued inputs the output
  * matches `array_intersect` element-for-element: each distinct
  * common value once, in ascending (= first-seen sorted) order. */
case class SortedIntersectValues(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_sorted_isect_vals requires two array<bigint> arguments " +
        s"with non-null elements, got ${left.dataType.simpleString} " +
        s"and ${right.dataType.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_isect_vals"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val buf = new Array[Long](math.min(n, m))
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { buf(c) = xv; c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (c == buf.length) buf else java.util.Arrays.copyOf(buf, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val buf = ctx.freshName("buf")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long[] $buf = new long[$n < $m ? $n : $m];
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $buf[$c++] = $xv; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(
         |    $c == $buf.length ? $buf : java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectValues =
    copy(left = newLeft, right = newRight)
}

/** Extension installer: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (set by every session builder in this library — Verify, Bench, Probe,
  * tests). Registers `graft_dot` in the session function registry so it
  * is callable from both the Column API (`call_function`) and SQL. */
/** All overlapping word n-grams of a token array, as the single fused
  * loop `transform(sequence(1, greatest(size(tk)-(n-1), 1)),
  * i => concat_ws(" ", slice(tk, i, n)))` evaluates to — but inside
  * whole-stage codegen instead of four nested interpreted
  * higher-order-function closures (sequence materialization, one boxed
  * lambda call, one slice allocation and one concat per gram). The
  * gram EXPLOSION is the per-task hot loop of every corpus/dedup gram
  * pipeline (decontamination, substring spans, the e2e pipeline), and
  * interpreted HOF lambdas measured ~6× slower than tight loops on the
  * text_entropy experiment (OPTIMIZATION_r16.md).
  *
  * Bit-exact contract with the composed form, including the clamps:
  * `max(len-(n-1), 1)` grams always (a shorter-than-n document yields
  * exactly one gram of all its tokens; an empty array yields [""]
  * because slice past the end is empty and concat_ws of nothing is
  * ""), and null ELEMENTS are skipped by the join exactly as concat_ws
  * skips them. A null ARRAY yields null (the composed form's sequence
  * over null size is null). GramsEquivalenceSpec pins the identity
  * property against the composed form. */
case class WordGrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"graft_word_grams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_word_grams requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGrams.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordGrams = copy(child = newChild)
}

object WordGrams {
  private val Sep =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** One pass over the token array; each gram is one concatWs over a
    * reused parts buffer — no per-gram boxing, no slice copies. */
  def compute(toks: ArrayData, n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val len = toks.numElements()
    val cnt = math.max(len - (n - 1), 1)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      val end = math.min(i + n, len)
      val parts =
        new Array[org.apache.spark.unsafe.types.UTF8String](math.max(end - i, 0))
      var j = i
      while (j < end) {
        parts(j - i) =
          if (toks.isNullAt(j)) null else toks.getUTF8String(j)
        j += 1
      }
      out(i) =
        org.apache.spark.unsafe.types.UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredL2].getCanonicalName, "graft_sqdist"),
      (children: Seq[Expression]) => SquaredL2(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_isect"),
      new ExpressionInfo(classOf[SortedIntersectSize].getCanonicalName,
        "graft_sorted_isect"),
      (children: Seq[Expression]) =>
        SortedIntersectSize(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_isect_vals"),
      new ExpressionInfo(classOf[SortedIntersectValues].getCanonicalName,
        "graft_sorted_isect_vals"),
      (children: Seq[Expression]) =>
        SortedIntersectValues(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_word_grams"),
      new ExpressionInfo(classOf[WordGrams].getCanonicalName,
        "graft_word_grams"),
      (children: Seq[Expression]) => WordGrams(children(0),
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions
              .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            "graft_word_grams(tokens, n): n must be an int literal, " +
              s"got $other")
        })))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getCanonicalName,
        "graft_minhash"),
      (children: Seq[Expression]) =>
        MinhashSignature(children(0), MinhashKernel.DefaultNumHashes)))
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // internal runtime filters but does not register them as SQL
    // functions; exposing them makes the classic bloom pre-filter
    // pattern (build a compact sketch over the small side, broadcast,
    // prune the big side before any shuffle) declarable as a plain
    // aggregation + predicate. graft_bloom_agg(xxhash64(x), items,
    // bits) → binary sketch; graft_might_contain(bf, xxhash64(x)).
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getCanonicalName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_bloom_agg(hash, items, bits) takes 3 arguments, " +
            s"got ${children.length}")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getCanonicalName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_might_contain(bloom, hash) takes 2 arguments, " +
            s"got ${children.length}")
        new org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(children(0), children(1))
      }))
    // Mergeable HLL sketch aggregates as plain SQL (the sketch-partials
    // pattern: per-partition sketches stored once, any rollup answered
    // by union — see HllExpressions).
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_sketch"),
      new ExpressionInfo(classOf[HllSketchAgg].getCanonicalName,
        "graft_hll_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_hll_sketch takes 1 argument, got ${children.length}")
        HllSketchAgg(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_union"),
      new ExpressionInfo(classOf[HllUnionAgg].getCanonicalName,
        "graft_hll_union"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_hll_union takes 1 argument, got ${children.length}")
        HllUnionAgg(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_estimate"),
      new ExpressionInfo(classOf[HllEstimateExpr].getCanonicalName,
        "graft_hll_estimate"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_hll_estimate takes 1 argument, got ${children.length}")
        HllEstimateExpr(children.head)
      }))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // SQL views on GraftCatalog: vanilla Spark has the ViewCatalog API
    // but no analyzer path that calls it — the Hints-batch rule
    // intercepts view DDL and substitutes stored view SQL on read
    // (the wiring Iceberg ships in its own extensions).
    ext.injectHintResolutionRule(graft.plans.GraftViewRule)
    // Table-valued function over the custom DSv2 source:
    // `SELECT * FROM graft_series(n[, slices])` resolves straight to a
    // SeriesTable relation — the whole pushdown stack (filter → slice
    // pruning, column pruning, limit, CBO stats) applies exactly as it
    // does to the reader-API path, now addressable from plain SQL.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_series"),
      new ExpressionInfo(
        classOf[graft.sources.SeriesTable].getCanonicalName,
        "graft_series"),
      (args: Seq[Expression]) => {
        def longOf(e: Expression, what: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions
              .Literal(v, _) if v != null => v.toString.toLong
          case org.apache.spark.sql.catalyst.expressions
              .Literal(null, _) => throw new IllegalArgumentException(
            s"graft_series $what must be a non-NULL literal")
          case other => throw new IllegalArgumentException(
            s"graft_series $what must be a literal, got $other")
        }
        require(args.nonEmpty && args.length <= 2,
          "usage: graft_series(n[, slices])")
        val n = longOf(args(0), "n")
        val slices =
          if (args.length > 1) longOf(args(1), "slices").toInt else 8
        org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation.create(
            new graft.sources.SeriesTable(n, slices), None, None)
      }))
  }
}

object GraftExtensions {
  val ConfKey = "spark.sql.extensions"
  val ClassName = "graft.functions.GraftExtensions"

  /** Standard session builder for this library's entry points. */
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config(ConfKey, ClassName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // storage-partitioned joins: deliberate session-wide (only
      // affects scans reporting KeyGroupedPartitioning, i.e.
      // partitioned graft-log tables) — set here, not ad hoc inside
      // individual queries, so no query runs under an
      // order-dependent planner conf
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // AQE sort-merge → shuffled-hash rewrite (r16, guide §3.1): let
      // AQE replace an unhinted SortMergeJoin with a shuffled hash
      // join when EVERY post-shuffle partition of the build side is
      // under this many bytes at runtime (default 0 = never). The
      // decision is made from measured partition sizes, not estimates,
      // so it is scale-adaptive by construction: at 100 TB a fact-fact
      // join's partitions exceed the bound and stay sort-merge (spill-
      // safe); only joins whose per-partition build side is genuinely
      // small lose their two sorts. Bounded by the advisory partition
      // size so a "small" build side is one AQE itself would coalesce.
      .config(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.props.getOrElse("spark.graft.shjLocalMapThreshold", "64m"))
      // AQE partition coalescing: keep Spark's default
      // parallelismFirst=true. r16 set this false (guide §2.2 "fewer,
      // larger reduce partitions"), which coalesces any shuffle under
      // the 64 MB advisory size to ONE partition — and that serializes
      // the per-round aggregates of the iterative queries: r17 A/B
      // under the bench's own `.count()` action measured graph_pagerank
      // 1.83 s (false) vs 0.91 s (true) min-of-4, graph_kcore_peel
      // 1.10 vs 0.97, and the driver's r16 run regressed exactly the
      // small-shuffle family (pagerank 0.68→2.24, window_rank_topk
      // 0.14→0.52, dedup_exact 0.13→0.27). At 100 TB the flag is moot:
      // post-shuffle partitions exceed the advisory size, so the
      // coalescer never consults parallelismFirst there — false only
      // changes (and hurt) the small-data regime. Kept overridable for
      // cluster deployments that want byte-sized task counts.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.props.getOrElse("spark.graft.coalesceParallelismFirst",
          "true"))
}
