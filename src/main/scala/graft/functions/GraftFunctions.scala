package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's custom expressions, two ways:
  *
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the SparkSessionExtensions injection path — what a deployment
  *    sets once in spark-defaults);
  *  - [[GraftFunctions.register]] for an already-built session (tests,
  *    notebooks).
  *
  * After either, `SELECT cosine_similarity(a, b)` works in spark.sql.
  */
object GraftFunctions {

  private def binary(name: String, f: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, name),
      { exprs =>
        require(exprs.length == 2, s"$name expects 2 arguments")
        f(exprs(0), exprs(1))
      })

  private def unary(name: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, name),
      { exprs =>
        require(exprs.length == 1, s"$name expects 1 argument")
        f(exprs(0))
      })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      binary("cosine_similarity", CosineSimilarity(_, _)),
      binary("dot_product", DotProduct(_, _)),
      binary("sorted_intersect_count", SortedIntersectCount(_, _)),
      binary("sorted_jaccard", SortedJaccard(_, _)),
      binary("sorted_first_common", SortedFirstCommon(_, _)),
      binary("long_dot_product", LongDotProduct(_, _)),
      binary("byte_dot_product", ByteDotProduct(_, _)),
      unary("pack_int8", PackInt8(_)),
      unary("hashed_sorted_tokens", HashedSortedTokens(_)),
      unary("nfc_lower", NfcLower(_)),
      unary("simhash64", SimHash64(_)),
      unary("token_counts", TokenCounts(_)),
      // char_ngrams(text, n) with n a literal int
      (FunctionIdentifier("char_ngrams"),
        new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
        { exprs =>
          require(exprs.length == 2, "char_ngrams expects (text, n)")
          val n = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"char_ngrams n must be an int literal, got $other")
          }
          CharNgrams(exprs(0), n)
        }),
      // winnow_grams_md5(text, k) with k a literal int
      (FunctionIdentifier("winnow_grams_md5"),
        new ExpressionInfo(classOf[WinnowGramHashes].getName,
          "winnow_grams_md5"),
        { exprs =>
          require(exprs.length == 2, "winnow_grams_md5 expects (text, k)")
          val k = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"winnow_grams_md5 k must be an int literal, got $other")
          }
          WinnowGramHashes(exprs(0), k)
        }))

  // Sessions this object has registered on. The guard must be OUR
  // record, not `functionRegistry.functionExists`: that predicate also
  // matches Spark built-ins and user temp functions, so a name
  // collision (e.g. a future Spark adding a builtin cosine_similarity)
  // would silently keep the OTHER function and change SQL semantics.
  // First registration per session is an unconditional replace; repeat
  // calls skip (no WARN-spam from GraftSql's per-facade-call binds) —
  // but a memo hit still probes ONE sentinel function: if a user
  // dropped graft's temp functions mid-session (DROP TEMPORARY
  // FUNCTION, registry reset), the memo alone would make that
  // unrecoverable and facade SQL would fail or silently bind a
  // colliding builtin. The probe is a registry lookup (cheap) and
  // re-runs the registration loop when the sentinel is gone.
  // Weak keys: the Boolean holds no reference back to its session.
  // check+register+put are synchronized on the map so two threads
  // can't interleave (registration itself is idempotent — this just
  // keeps the record coherent).
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  private val sentinel = FunctionIdentifier(all.head._1.funcName)

  def register(spark: SparkSession): Unit = {
    registered.synchronized {
      val reg = spark.sessionState.functionRegistry
      if (!registered.containsKey(spark) || !reg.functionExists(sentinel)) {
        all.foreach { case (ident, _, builder) =>
          reg.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
        }
        registered.put(spark, java.lang.Boolean.TRUE)
      }
    }
    // the already-built-session path for the optimizer rule and planner
    // strategy the extensions inject at session build time
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.TokenHashKernelRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TokenHashKernelRule
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.MinhashSqlKernelRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.MinhashSqlKernelRule
    }
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.TokenHashKernelRule)
    e.injectOptimizerRule(_ => graft.plans.MinhashSqlKernelRule)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
