package graft.plans

import graft.functions.HashedSortedTokens
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

/** Optimizer rule demonstrating the `Rule[LogicalPlan]` extension tier
  * (SURVEY §7.4 ladder, step (c) lite): queries written with the
  * COMPOSABLE form
  *
  * {{{
  *   sort_array(array_distinct(transform(
  *     filter(split(text, "\\s+"), t => length(t) > 0),
  *     t => xxhash64(t))))
  * }}}
  *
  * are rewritten to the single-pass [[HashedSortedTokens]] kernel, so
  * users of the plain functions API get the fused byte-level loop
  * (no interpreted per-token lambdas, no intermediate arrays) without
  * knowing the kernel exists. Semantics are identical by construction —
  * the kernel's equivalence to exactly this expression tree is pinned
  * in FunctionsSpec.
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`), the deployment-config path
  * (`spark.sql.extensions`).
  */
object TokenHashKernelRule extends Rule[LogicalPlan] {

  /** filter(split(text, "\s+"), t => length(t) > 0) */
  private object WsTokens {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayFilter(
            StringSplit(text, Literal(re, _), Literal(-1, _)),
            LambdaFunction(
              GreaterThan(Length(lv1: NamedLambdaVariable), Literal(0, _)),
              Seq(lv2: NamedLambdaVariable), _))
          if re != null && re.toString == "\\s+" && lv1.exprId == lv2.exprId =>
        Some(text)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SortArray(
            ArrayDistinct(ArrayTransform(
              WsTokens(text),
              LambdaFunction(
                XxHash64(Seq(hv1: NamedLambdaVariable), 42L),
                Seq(hv2: NamedLambdaVariable), _))),
            Literal(true, _)) if hv1.exprId == hv2.exprId =>
        HashedSortedTokens(text)
    }
}

/** Fuses the MinHash building blocks the spec-pinned SQL faces spell
  * COMPOSABLY (q_sql_dedup_minhash's statement is drift-pinned to its
  * DuckDB oracle, so its text cannot change) into the tight-loop
  * kernels the DataFrame twin already uses pieces of. Two shapes:
  *
  *   array_min(transform(hh, h -> (h * a + b) % p))
  *     -> affine_min_mod(hh, a, b, p)         (one per permutation)
  *   transform(ss, s -> CAST(conv(substring(md5(CAST(s AS BINARY)),
  *       1, 8), 16, 10) AS BIGINT) % p)
  *     -> md5_head8_mod(ss, p)
  *
  * Spark's higher-order functions evaluate an interpreted lambda per
  * element (r19 JobProf: the SQL face's two signature projections ran
  * 1.15 s + 1.05 s single-task over 5000 docs; the DataFrame twin's
  * fully-fused kernel does the same corpus in ~0.1 s). Equivalence is
  * pinned element-wise in FunctionsSpec and by the unchanged DuckDB
  * oracle over the rewritten query. Constants are extracted from the
  * matched tree, so the rule is value-generic; arithmetic cannot
  * overflow for the matched family (operands < 2^31 by construction
  * of the mod-prime pipeline), so the kernel's wrapping long math is
  * exact where the ANSI operators would have been.
  */
object MinhashSqlKernelRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayMin(ArrayTransform(hh, LambdaFunction(
            Remainder(
              Add(
                Multiply(hv1: NamedLambdaVariable,
                  Literal(a: Long, LongType), _),
                Literal(b: Long, LongType), _),
              Literal(p: Long, LongType), _),
            Seq(hv2: NamedLambdaVariable), _)))
          if hv1.exprId == hv2.exprId =>
        graft.functions.AffineMinMod(hh, a, b, p)
      case ArrayTransform(ss, LambdaFunction(
            Remainder(
              Cast(
                Conv(
                  Substring(
                    Md5(Cast(sv1: NamedLambdaVariable, BinaryType, _, _)),
                    Literal(1, IntegerType), Literal(8, IntegerType)),
                  Literal(16, IntegerType), Literal(10, IntegerType), _),
                LongType, _, _),
              Literal(p: Long, LongType), _),
            Seq(sv2: NamedLambdaVariable), _))
          if sv1.exprId == sv2.exprId =>
        graft.functions.Md5Head8Mod(ss, p)
    }
}
