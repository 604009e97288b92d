package graft

import graft.core.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.DataFrame

/** SURVEY §7.5 item 5: collect_set/collect_list accumulate in
  * partition-dependent order, so every ordered aggregate must be
  * wrapped in sort_array — assert that results are identical under
  * shuffle.partitions ∈ {1, 4, 17} for the order-sensitive queries.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def underPartitions[A](n: Int)(f: => A): A = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  private val cases: Seq[(String, () => DataFrame)] = Seq(
    ("sorted_join (ordered string-agg)",
      () => TextOps.sortedJoin(Tables.load(spark, sfDir, "documents"))),
    ("inverted_index (sorted collect_set)",
      () => TextOps.invertedIndex(Tables.load(spark, sfDir, "documents"))),
    ("dedup_canonical (sorted members csv)",
      () => Dedup.canonical(Tables.load(spark, sfDir, "documents"))),
    ("minhash_pairs (min aggregates)",
      () => Dedup.minhashPairs(Tables.load(spark, sfDir, "documents"))),
    ("tfidf (rank tie-breaks)",
      () => TextOps.tfidf(Tables.load(spark, sfDir, "documents"))),
    ("sample_per_group (hash-ordered reservoir)",
      () => graft.llm.Sampling.samplePerGroup(
        Tables.load(spark, sfDir, "documents"), "lang")),
    ("dup_clusters (iterative min-label propagation)",
      () => Dedup.dupClusters(Tables.load(spark, sfDir, "documents"))),
    ("pack_sequences (per-lang cumsum bins)",
      () => graft.llm.Curation.packSequences(
        Tables.load(spark, sfDir, "documents"))),
    ("interval_join (bucketized equi-join)",
      () => graft.ops.EventOps.intervalPurchaseClick(
        Tables.load(spark, sfDir, "events"))),
    ("jaccard_pairs (rank assignment + emit-once join)",
      () => Dedup.jaccardPairs(Tables.load(spark, sfDir, "documents"))),
    ("prefix_dups (range-sorted stack scan + closure)",
      () => Dedup.prefixDups(Tables.load(spark, sfDir, "documents"))),
    ("simhash_banded (band-bucket join)",
      () => Dedup.simhashPairsBanded(Tables.load(spark, sfDir, "documents"))),
    ("decontaminate (asymmetric shingle-hit join)",
      () => {
        import org.apache.spark.sql.functions.col
        val d = Tables.load(spark, sfDir, "documents")
        Dedup.decontaminate(d.filter(col("doc_id") % 97 =!= 0),
          d.filter(col("doc_id") % 97 === 0))
      }),
    ("embedding_pairs (lsh candidates + exact verify)",
      () => Dedup.embeddingPairs(Tables.load(spark, sfDir, "embeddings"))),
    ("freq_terms (partition-local sketch + exact recount)",
      // the MG sketch's CANDIDATE set depends on partitioning; the
      // recount must erase that dependence from the final answer
      () => graft.llm.CorpusOps.freqTerms(
        Tables.load(spark, sfDir, "documents"))),
    ("duplicate_spans (islands merge over per-doc windows)",
      () => Dedup.duplicateSpans(Tables.load(spark, sfDir, "documents"))),
    ("shard_shuffle (per-shard hash-rank positions)",
      () => graft.llm.Sampling.shardShuffle(
        Tables.load(spark, sfDir, "documents"))),
    ("substring_clean (span-list reconstruction)",
      () => Dedup.duplicateSpanRemove(Tables.load(spark, sfDir, "documents"))),
    ("bigram_lp (co-partitioned model joins)",
      () => graft.llm.CorpusOps.bigramLogProb(
        Tables.load(spark, sfDir, "documents"))),
    ("bpe_train (pair-count argmax rounds)",
      () => graft.llm.Curation.bpeTrain(
        Tables.load(spark, sfDir, "documents"), nMerges = 5)),
    ("markov_transitions (per-user lag sequences)",
      () => graft.ops.EventOps.markovTransitions(
        Tables.load(spark, sfDir, "events"))),
    ("vocab_coverage (top-k boundary ties)",
      () => graft.llm.CorpusOps.vocabCoverage(
        Tables.load(spark, sfDir, "documents"))),
    ("gapfill (grid join + forward-fill windows)",
      () => graft.ops.EventOps.gapFill(
        Tables.load(spark, sfDir, "events"))),
    ("scd2 (change detection + interval windows)",
      () => graft.ops.EventOps.scd2States(
        Tables.load(spark, sfDir, "events"))),
    ("feature_binning (ntile tiebreaks)",
      () => graft.ops.Relational.qFeatureBinning(spark, sfDir)),
    ("winnow_pairs (frame-min fingerprints + emit-once join)",
      () => graft.llm.TextOps.winnowPairs(
        Tables.load(spark, sfDir, "documents"))),
    ("winnow digest (collect_set ordering)",
      () => graft.llm.TextOps.winnow(
        Tables.load(spark, sfDir, "documents"))),
    ("survivors_best (cluster argmax windows)",
      () => graft.llm.Dedup.dedupSurvivorsBest(
        Tables.load(spark, sfDir, "documents"))),
    ("attribution (journey windows + remainder credits)",
      () => graft.ops.EventOps.attribution(
        Tables.load(spark, sfDir, "events"))),
    ("triangles (degree-ordered wedge join)",
      () => graft.ops.GraphOps.triangleCounts(
        graft.ops.GraphOps.coOccurrenceEdges(
          Tables.load(spark, sfDir, "lineitem")))),
    ("knn_classify (majority-vote window tie-break)",
      () => graft.llm.Similarity.knnClassify(
        Tables.load(spark, sfDir, "embeddings"))),
    ("contrastive_pairs (argmax windows + bucket anti-join)",
      () => Dedup.contrastivePairs(Tables.load(spark, sfDir, "documents"))),
    ("rake (ordered phrase collect + top-k boundary)",
      () => graft.llm.TextOps.rakeKeyphrases(
        Tables.load(spark, sfDir, "documents"))),
    ("session_paths (gap-cut windows + rank-conditional path build)",
      () => graft.ops.EventOps.sessionPaths(
        graft.ops.EventOps.events(spark, sfDir))),
    ("pmi (top-k boundary under the lift total order)",
      () => graft.llm.CorpusOps.pmiCollocations(
        Tables.load(spark, sfDir, "documents"))),
    ("conversion_lag (running last-view + rank quantiles)",
      () => graft.ops.EventOps.conversionLag(
        graft.ops.EventOps.events(spark, sfDir))),
    ("kcore (iterative peel rounds)",
      () => graft.ops.GraphOps.kCore(
        graft.ops.GraphOps.coOccurrenceEdges(
          Tables.load(spark, sfDir, "lineitem")))),
    ("holt (sorted collect_list fold)",
      () => graft.ops.EventOps.holtForecast(
        graft.ops.EventOps.events(spark, sfDir))),
    ("sssp (iterative min-plus relaxation rounds)",
      () => graft.ops.GraphOps.ssspScaled(
        graft.ops.GraphOps.coOccurrenceWeighted(
          Tables.load(spark, sfDir, "lineitem")))),
    ("cluster_split (split keyed on propagated min-labels)",
      () => graft.llm.Sampling.clusterSplit(
        Tables.load(spark, sfDir, "documents"))),
    ("rfm_segments (value-histogram quintile boundaries)",
      () => graft.ops.EventOps.rfmSegments(
        graft.ops.EventOps.events(spark, sfDir))),
    ("rolling_actives (7-day distinct fan-out)",
      () => graft.ops.EventOps.rollingActives(
        graft.ops.EventOps.events(spark, sfDir))),
    ("pq encode (sampled Lloyd codebooks + kernel assignment)",
      () => {
        val e = Tables.load(spark, sfDir, "embeddings")
        graft.llm.Similarity.pqEncode(e, graft.llm.Similarity.pqCodebooks(e))
      }),
    ("ivf-pq (residual codebooks + probed ADC)",
      () => {
        val e = Tables.load(spark, sfDir, "embeddings")
        val cents = graft.llm.Similarity.ivfCentroidsInt8(e)
        graft.llm.Similarity.ivfPqTopK(e, cents,
          graft.llm.Similarity.pqCodebooksQ(
            graft.llm.Similarity.ivfResiduals(e, cents)
              .select("vec_id", "qn")))
      }),
    ("classifier_train (per-round gradient aggregations)",
      () => graft.llm.Curation.classifierTrain(
        Tables.load(spark, sfDir, "documents"))),
    ("kll_sketch (level samples + weighted-rank pick)",
      () => graft.llm.CorpusOps.kllSketch(
        Tables.load(spark, sfDir, "documents"))),
    ("pca_power (scatter partial-aggs + matvec rounds)",
      () => graft.llm.Similarity.pcaPower(
        Tables.load(spark, sfDir, "embeddings"))),
    ("pca_top2 (deflated second-component rounds)",
      () => graft.llm.Similarity.pcaTop2(
        Tables.load(spark, sfDir, "embeddings"))),
    ("pca_project (map-only component scores)",
      () => graft.llm.Similarity.pcaProject(
        Tables.load(spark, sfDir, "embeddings"))),
    ("embed_scatter (label-keyed additive scatter buffers)",
      () => graft.llm.Similarity.scatterByLabel(
        Tables.load(spark, sfDir, "embeddings"))),
    ("embed_drift (bucketed PSI over component scores)",
      () => graft.llm.Similarity.embeddingDrift(
        Tables.load(spark, sfDir, "embeddings"))))

  cases.foreach { case (name, mk) =>
    test(s"$name is invariant under shuffle.partitions in {1, 4, 17}") {
      val r1 = underPartitions(1)(rows(mk()))
      val r4 = underPartitions(4)(rows(mk()))
      val r17 = underPartitions(17)(rows(mk()))
      assert(r1 === r4, s"$name differs between 1 and 4 partitions")
      assert(r4 === r17, s"$name differs between 4 and 17 partitions")
      assert(r1.nonEmpty)
    }
  }
}
