package graft

import graft.core.Tables
import graft.llm.{Dedup, Similarity}
import graft.ops.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** Plan-audit tier: the properties that decide whether a query survives
  * a 100x scale-up are visible in the physical plan — assert them
  * instead of hoping. (SURVEY §4.1: these are exactly the optimizations
  * the reference lacks and we get from Catalyst only if the plan stays
  * declarative.)
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1: shipdate predicate is pushed to the parquet scan") {
    val p = plan(Relational.q1Pricing(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"predicate not pushed:\n$p")
  }

  test("runtime bloom filter injected on the fact side of a selective join") {
    // InjectRuntimeFilter: a selective dim-side predicate becomes a
    // bloom filter applied to the fact scan BEFORE the shuffle — at
    // 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the ~1% that can possibly join. Thresholds
    // are sized for real tables; drop them so the sf test data
    // qualifies, and disable broadcast (bloom only arms shuffle joins).
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // creationSideThreshold is an UPPER bound (only a small side is
      // worth building a bloom from) — leave it at the 10 MB default;
      // the application-side threshold is a LOWER bound (only a big
      // scan is worth filtering), which the sf test scan is under
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val li = Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val p = plan(j)
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"no runtime bloom filter in plan:\n$p")
      // and it still computes the right thing
      assert(j.count() > 0)
    } finally keep.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q6: all three predicates pushed; scan pruned to 4 columns") {
    val p = plan(Relational.q6Forecast(spark, sfDir))
    assert(p.contains("PushedFilters:"), p)
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(p.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains(c)),
        s"$c not pushed:\n$p")
    }
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_returnflag"), s"unpruned scan: $readSchema")
  }

  test("q10: top-20 is TakeOrdered, nation join broadcast") {
    val p = plan(Relational.q10Returns(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q1: column pruning — scan reads only the 6 needed columns") {
    val p = plan(Relational.q1Pricing(spark, sfDir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"))
  }

  test("q1: aggregation is partial (map-side combine before shuffle)") {
    val p = plan(Relational.q1Pricing(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    assert("partial_sum|Functions: \\[partial".r.findFirstIn(p).isDefined ||
      p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("q3/q5: dimension joins are broadcast, not shuffled") {
    val p3 = plan(Relational.q3Shipping(spark, sfDir))
    assert(p3.contains("BroadcastHashJoin"), s"customer join not broadcast:\n$p3")
    val p5 = plan(Relational.q5LocalSupplier(spark, sfDir))
    assert(p5.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p5")
  }

  test("q_topk compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.qTopK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"top-k does a full sort:\n$p")
  }

  test("q_filter_project: whole plan stays inside whole-stage codegen") {
    val p = plan(Relational.qFilterProject(spark, sfDir))
    // formatted mode tags codegen'd operators with `[codegen id : N]`
    assert(p.contains("codegen id"), p)
    assert(p.linesIterator.count(_.contains("codegen id")) >= 2,
      s"scan->filter->project should share one codegen stage:\n$p")
  }

  test("knn brute force: broadcast + partial top-k before the shuffle") {
    val df = Similarity.bruteForceTopK(Tables.load(spark, sfDir, "embeddings"))
    val p = plan(df)
    assert(p.contains("cosine_similarity"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    // WindowGroupLimit(Partial) cuts each partition to top-k before the
    // exchange — without it, every scored pair crosses the shuffle
    assert(p.contains("WindowGroupLimit"), s"no partial top-k pushdown:\n$p")
  }

  test("cosine_similarity expression itself is whole-stage-codegen'd") {
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, sfDir, "embeddings")
    val p = plan(e.select(
      graft.functions.vector.cosine_similarity(col("embedding"), col("embedding"))
        .as("s")))
    assert(p.contains("codegen id"), s"expression fell back to interpreted eval:\n$p")
  }

  test("minhash pairs: banded self-join does not carry signature arrays") {
    val df = Dedup.minhashPairs(Tables.load(spark, sfDir, "documents"))
    val p = plan(df)
    // the band-bucket join must join on (band, bucket) longs
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("optimizer rule rewrites composed tokenize+hash+sort to the kernel") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val composed = sort_array(array_distinct(transform(
      filter(split(col("text"), "\\s+"), t => length(t) > 0),
      t => xxhash64(t))))
    val d = Tables.load(spark, sfDir, "documents")
    val df = d.select(composed.as("toks"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("hashed_sorted_tokens"),
      s"rule did not fire:\n$opt")
    // rewrite preserves results exactly (vs the kernel called directly)
    val viaKernel = d.select(
      graft.functions.text.hashed_sorted_tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[Long](0).toVector).sortBy(_.hashCode)
    val viaRule = df.collect().map(_.getSeq[Long](0).toVector)
      .sortBy(_.hashCode)
    assert(viaRule === viaKernel)
  }

  test("dedup defaults carry no broadcast hint (the corpus must never broadcast)") {
    import org.apache.spark.sql.functions.col
    val d = Tables.load(spark, sfDir, "documents")
    val e = Tables.load(spark, sfDir, "embeddings")
    for ((name, df) <- Seq[(String, DataFrame)](
        "jaccard" -> Dedup.jaccardPairs(d),
        "shingle" -> Dedup.jaccardShinglePairs(d),
        "edit" -> Dedup.editVerifiedPairs(d),
        "simhash_banded" -> Dedup.simhashPairsBanded(d),
        "minhash" -> Dedup.minhashPairs(d),
        "embedding" -> Dedup.embeddingPairs(e),
        // decontam broadcasts only the reference's DISTINCT shingle
        // hashes (an Aggregate — the allowed reduction shape), never
        // the corpus side
        "decontam" -> Dedup.decontaminate(
          d.filter(col("doc_id") % 97 =!= 0),
          d.filter(col("doc_id") % 97 === 0)))) {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, LocalRelation, ResolvedHint}
      // the prefix-rank join pins SMJ via a merge hint (join cost is in
      // the key-equal multiset, not the input sizes) — that is fine;
      // what must never broadcast is PER-ROW corpus data. Broadcast
      // hints are only allowed above a reduction (e.g. the hot-rank
      // salting table: ranks whose prefix membership exceeds the salt
      // target — bounded by prefix-rows/target by construction).
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      hints.filter(_.hints.strategy.exists(_.toString.toLowerCase.contains("broadcast")))
        .foreach { h =>
          val isReduction = h.child.collectFirst {
            case _: Aggregate => ()
            case _: Deduplicate => () // .distinct() pre-optimization
            case _: LocalRelation => ()
          }.isDefined
          assert(isReduction,
            s"$name: broadcast hint over non-reduced corpus data:\n$h")
        }
    }
  }

  test("jaccard candidate join stays sort-merge through AQE finalization") {
    // AQE's size-triggered broadcast conversion on the (small-looking)
    // exploded prefix side is a measured ~6x regression — the join's
    // cost is the hot-key multiset, not the inputs. The merge hint must
    // survive into the FINAL adaptive plan.
    val d = Tables.load(spark, sfDir, "documents")
    val q = Dedup.jaccardPairs(d)
    q.collect() // finalize the adaptive plan of THIS QueryExecution
    val finalPlan = q.queryExecution.executedPlan.toString
    assert(finalPlan.contains("SortMergeJoin"),
      s"candidate join lost the merge pin:\n$finalPlan")
  }

  test("prefixDups result plan: id re-attach joins carry no broadcast hint") {
    // the only explicit broadcasts inside prefixDups are the
    // partition-first candidate sets (numPartitions x chain-depth
    // strings, materialized in the eager closure phase); the returned
    // plan — ancestor pairs joined back to doc ids — must be plain
    // shuffled joins on text
    val d = Tables.load(spark, sfDir, "documents")
    val analyzed = Dedup.prefixDups(d).queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"prefixDups output joins must not hint-broadcast:\n$analyzed")
  }

  test("as-of join costs exactly one shuffle") {
    import spark.implicits._
    val left = Seq((1, 10L, "x")).toDF("k", "lt", "lv")
    val right = Seq((1, 5L, "y")).toDF("k", "rt", "rv")
    val p = plan(graft.ops.AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt"))
    val exchanges = p.linesIterator.count(l =>
      l.trim.startsWith("(") && l.contains(" Exchange"))
    assert(exchanges === 1, s"expected 1 Exchange, got $exchanges:\n$p")
  }

  test("no query plans a global unpartitioned window (single-reducer at scale)") {
    // Window.orderBy with no partitionBy moves the WHOLE table to one
    // task ("WindowExec: No Partition Defined" at runtime) — the defect
    // class q_multimodal_batches used to carry. Assert it never comes
    // back anywhere in the registered query surface.
    //
    // Checked on the OPTIMIZED LOGICAL plan, not executedPlan: under
    // AQE the executed plan is a leaf AdaptiveSparkPlanExec whose
    // collect() traverses nothing, which made the physical-plan version
    // of this check pass vacuously (it missed q_pct_of_total's
    // `sum OVER ()`). The logical check also catches windows whose
    // literal partition keys the optimizer folds away
    // (EliminateWindowPartitions), which execute just as globally.
    import org.apache.spark.sql.catalyst.plans.logical.Window
    for ((name, fn) <- SparkEntry.queries) {
      val offenders = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      assert(offenders.isEmpty,
        s"$name: unpartitioned global window:\n${offenders.headOption}")
    }
  }

  test("semi/anti joins use dedicated join types (no fallback to inner+distinct)") {
    val ps = plan(Relational.qSemiJoin(spark, sfDir))
    assert(ps.contains("LeftSemi"), ps)
    val pa = plan(Relational.qAntiJoin(spark, sfDir))
    assert(pa.contains("LeftAnti"), pa)
  }

  test("freqTerms recount joins the candidate set by broadcast") {
    // Pass 2 of the Misra-Gries frequent-items op must semi-join the
    // corpus tokens against the (answer-sized) candidate list with a
    // broadcast — a shuffled join here would re-shuffle O(corpus
    // tokens) and defeat the sketch entirely.
    val p = plan(graft.llm.CorpusOps.freqTerms(
      Tables.load(spark, sfDir, "documents")))
    assert(p.contains("BroadcastHashJoin"), s"candidate join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-shuffling join:\n$p")
  }

  test("bm25 top-k is TakeOrderedAndProject, stats broadcast") {
    val p = plan(graft.llm.CorpusOps.bm25(
      Tables.load(spark, sfDir, "documents")))
    assert(p.contains("TakeOrderedAndProject"), s"bm25 does a full sort:\n$p")
    // the |terms|-row df table and the 1-row (N, avgdl) stats must both
    // arrive by broadcast; the only shuffled join key is doc_id
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), s"stats not broadcast:\n$p")
  }

  test("jlProject is map-only: zero exchanges") {
    val p = plan(graft.llm.Similarity.jlProject(
      Tables.load(spark, sfDir, "embeddings")))
    val exchanges = p.linesIterator.count(l =>
      l.trim.startsWith("(") && l.contains(" Exchange"))
    assert(exchanges === 0, s"projection should not shuffle:\n$p")
  }

  test("PLANS.md covers exactly the registered query set (no drift)") {
    // The BNL gate in PlanAudit only protects queries it has seen: a
    // query registered in SparkEntry.queries but absent from PLANS.md
    // has never been through the ≤1024-row BroadcastNestedLoop proof.
    // This drifted twice (r11, r12) — make it impossible to merge.
    val plansFile = new java.io.File("PLANS.md")
    assert(plansFile.exists, "PLANS.md missing — run graft.tools.PlanAudit")
    val src = scala.io.Source.fromFile(plansFile, "UTF-8")
    val audited =
      try src.getLines()
        .filter(_.startsWith("| q"))
        .map(_.split("\\|")(1).trim)
        .filter(_ != "query") // table header row
        .toSet
      finally src.close()
    val registered = SparkEntry.queries.keySet
    val unaudited = registered -- audited
    val stale = audited -- registered
    assert(unaudited.isEmpty,
      s"queries registered but never plan-audited (run PlanAudit and commit " +
        s"PLANS.md): ${unaudited.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"PLANS.md rows for queries that no longer exist: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("classifierScore is map-only: zero exchanges, no explode") {
    val p = plan(graft.llm.TextOps.classifierScore(
      Tables.load(spark, sfDir, "documents")))
    val exchanges = p.linesIterator.count(l =>
      l.trim.startsWith("(") && l.contains(" Exchange"))
    assert(exchanges === 0, s"classifier sweep should not shuffle:\n$p")
    assert(!p.contains("Generate"),
      s"classifier should fold over the token array, not explode it:\n$p")
  }
}
