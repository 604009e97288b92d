package graft.tools

import graft.SparkEntry
import graft.core.Graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.{ExplainMode, SparkPlan}

/** Generates PLANS.md: one row per driver query summarizing the
  * scale-relevant physical-plan properties (shuffle count, join
  * strategies, scan pushdown, codegen). The human-readable companion
  * to PlanSpec's hard asserts — regenerate with
  * `sbt 'runMain graft.tools.PlanAudit [sfDir]'` after plan-affecting
  * changes.
  *
  * BroadcastNestedLoop GATE: a BNL join is O(|left|·|right|) and at
  * corpus scale is only acceptable when its build side is provably a
  * handful of rows (the `crossJoin(broadcast(oneRowStats))` pattern).
  * For every BNL in every plan the audit walks the build subtree and
  * classifies it (global aggregate → 1 row; LocalTableScan/limit ≤
  * [[TinyRows]] rows; unions/projections thereof). Any BNL whose build
  * side can NOT be proven tiny fails the audit (non-zero exit) — a
  * corpus-sized cross join cannot slip into PLANS.md unannotated.
  */
object PlanAudit {
  /** Max provably-bounded build-side rows a BNL may carry. */
  val TinyRows = 1024

  /** Proof that a BNL build subtree is answer-sized, or None.
    * Conservative: anything unrecognized is NOT tiny.
    */
  def tinyBuildReason(p: SparkPlan): Option[String] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange._
    p match {
      case e: BroadcastExchangeExec => tinyBuildReason(e.child)
      case e: ShuffleExchangeExec => tinyBuildReason(e.child)
      case e: ReusedExchangeExec => tinyBuildReason(e.child)
      case q: BroadcastQueryStageExec => tinyBuildReason(q.plan)
      case q: ShuffleQueryStageExec => tinyBuildReason(q.plan)
      case a: AdaptiveSparkPlanExec => tinyBuildReason(a.executedPlan)
      case w: WholeStageCodegenExec => tinyBuildReason(w.child)
      case i: InputAdapter => tinyBuildReason(i.child)
      case agg: BaseAggregateExec if agg.groupingExpressions.isEmpty =>
        Some("1-row global agg")
      case l: GlobalLimitExec if l.limit <= TinyRows =>
        Some(s"limit ${l.limit}")
      case l: LocalLimitExec if l.limit <= TinyRows =>
        Some(s"limit ${l.limit}")
      case t: TakeOrderedAndProjectExec if t.limit <= TinyRows =>
        Some(s"top-${t.limit}")
      case l: LocalTableScanExec if l.rows.lengthCompare(TinyRows) <= 0 =>
        Some(s"local ${l.rows.length} rows")
      case r: RangeExec if r.numElements <= BigInt(TinyRows) =>
        // range(N) states its cardinality in the plan node itself —
        // the SQL faces' band-expansion `CROSS JOIN range(4)` is a
        // statically-bounded flat-map, not a corpus-sized cross
        Some(s"range ${r.numElements}")
      case r: RDDScanExec if r.name == "ParallelCollectionRDD" =>
        None // row count unknowable statically — refuse to bless
      case _: OneRowRelationExec => Some("1-row relation")
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        // a cross of two tiny sides (e.g. two 1-row stat aggregates)
        // is itself tiny: |product| ≤ TinyRows·TinyRows is too loose,
        // so require one side to be 1-row-ish (an aggregate)
        (tinyBuildReason(b.left), tinyBuildReason(b.right)) match {
          case (Some(l), Some(r))
            if l.contains("1-row") || r.contains("1-row") =>
            Some(s"cross of [$l] x [$r]")
          case _ => None
        }
      case u: UnionExec =>
        val rs = u.children.map(tinyBuildReason)
        if (rs.forall(_.isDefined) && u.children.length <= 8)
          Some(s"union of ${u.children.length} tiny")
        else None
      case p: ProjectExec => tinyBuildReason(p.child)
      case f: FilterExec => tinyBuildReason(f.child)
      case s: SortExec => tinyBuildReason(s.child)
      case c: CoalesceExec => tinyBuildReason(c.child)
      case g: GenerateExec =>
        // explode of a tiny relation is bounded by child rows × per-row
        // output. Bless (a) explode of a COMPILE-TIME-LITERAL array
        // over a 1-row child (the SQL faces' folded band expansion,
        // `CROSS JOIN range(4)` → Generate explode([0,1,2,3]) over
        // OneRowRelation — cardinality is the literal's length) and
        // (b) any explode of a 1-row aggregate
        val litLen = g.generator match {
          case e: org.apache.spark.sql.catalyst.expressions.ExplodeBase
              if e.child.foldable =>
            Option(e.child.eval(null)).map(
              _.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
                .numElements())
          case _ => None
        }
        tinyBuildReason(g.child) match {
          case Some(r) if r.startsWith("1-row") &&
              litLen.exists(_ <= TinyRows) =>
            Some(s"explode of ${litLen.get}-elem literal")
          case Some(r) if r == "1-row global agg" => Some(s"explode of $r")
          case _ => None
        }
      case _ => None
    }
  }

  /** All (buildSubtree) pairs for BNLs in the plan, descending into
    * AQE wrappers (AdaptiveSparkPlanExec is a leaf to collect()).
    */
  def bnlBuildSides(plan: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    inner.collect {
      case b: BroadcastNestedLoopJoinExec =>
        Seq(b.buildSide match {
          case BuildLeft => b.left
          case BuildRight => b.right
        })
      case a: AdaptiveSparkPlanExec => bnlBuildSides(a.executedPlan)
    }.flatten
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // optional extra args: restrict to named queries (debug iteration —
    // PLANS.md is only written on a full, unfiltered run)
    val only = args.drop(1).toSet
    val spark = Graft.session("plan-audit", "local[4]")
    val out = new StringBuilder
    val bnlViolations = scala.collection.mutable.ArrayBuffer[String]()
    out ++= "# PLANS — physical-plan audit of every driver query\n\n"
    out ++= s"Generated by `graft.tools.PlanAudit` against `$sfDir`.\n"
    out ++= "Exchanges exclude broadcasts; `pushdown` = a non-empty " +
      "PushedFilters on some scan; `codegen` = at least one " +
      "whole-stage-codegen stage (AQE-wrapped plans resolve codegen at " +
      "runtime and report `aqe`); `bnl` = every BroadcastNestedLoop's " +
      s"build side with its tininess proof (≤ $TinyRows rows by " +
      "construction) — the audit FAILS if any BNL build side cannot " +
      "be proven tiny.\n\n"
    out ++= "| query | exchanges | joins | pushdown | codegen | bnl |\n"
    out ++= "| --- | --- | --- | --- | --- | --- |\n"
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val p = qe.explainString(ExplainMode.fromString("formatted"))
        val lines = p.linesIterator.toSeq
        val exchanges = lines.count(l =>
          l.trim.startsWith("(") && l.contains(" Exchange") &&
            !l.contains("Broadcast"))
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin")
          .flatMap { j =>
            val n = lines.count(l => l.trim.startsWith("(") && l.contains(j))
            if (n > 0) Some(s"$n ${j.replace("Join", "")}") else None
          }
        val pushdown =
          if (p.contains("PushedFilters: [") &&
            !p.contains("PushedFilters: []")) "yes"
          else "-"
        val codegen =
          if (p.contains("codegen id")) "yes"
          else if (p.contains("AdaptiveSparkPlan")) "aqe"
          else "-"
        val builds = bnlBuildSides(qe.executedPlan)
        val bnlCol =
          if (builds.isEmpty) "-"
          else builds.map { b =>
            tinyBuildReason(b) match {
              case Some(r) => r
              case None =>
                bnlViolations += s"$name: BNL build side not provably " +
                  s"tiny:\n${b.treeString.linesIterator.take(8)
                    .mkString("\n")}\nclasses: ${b.collect {
                      case n => n.getClass.getSimpleName }.mkString(" / ")}"
                s"**UNBOUNDED ${b.nodeName}**"
            }
          }.mkString("; ")
        out ++= s"| $name | $exchanges | ${
          if (joins.isEmpty) "-" else joins.mkString(", ")} | $pushdown " +
          s"| $codegen | $bnlCol |\n"
      } catch {
        case e: Throwable =>
          out ++= s"| $name | ERROR: ${e.getMessage.take(60)} | | | | |\n"
      }
    }
    if (only.isEmpty) {
      Files.writeString(Paths.get("PLANS.md"), out.toString)
      println(
        s"[planaudit] wrote PLANS.md (${SparkEntry.queries.size} queries)")
    } else print(out.toString)
    spark.stop()
    if (bnlViolations.nonEmpty) {
      bnlViolations.foreach(v => System.err.println(s"[planaudit] FAIL $v"))
      sys.exit(1)
    }
  }
}
