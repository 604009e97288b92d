package graft.tools

import graft.core.{Graft, Tables}
import graft.llm.{CorpusOps, Curation, Dedup}
import org.apache.spark.sql.functions._

/** One-shot corpus DATA CARD: the report a dataset ships with
  * (Gebru et al. 2021, "Datasheets for Datasets"), assembled from the
  * engine's own oracle-checked panels — per-stratum composition,
  * Zipf shape, Gopher quality pass rates, duplication levels, and the
  * per-language tokenizer fertility. Markdown to stdout; every number
  * comes from the same operators the driver gates, so the card is as
  * trustworthy as the query suite.
  *
  * Usage: runMain graft.tools.DataCard <sfDir>
  */
object DataCard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Graft.session("graft-datacard")
    try {
      val docs = Tables.load(spark, sfDir, "documents")
      val out = new StringBuilder
      out ++= s"# Data card — $sfDir/documents.parquet\n\n"

      val summary = CorpusOps.corpusSummary(docs).collect()
      out ++= "## Composition (source x lang)\n\n"
      out ++= "| source | lang | docs | tokens | mean chars | exact dups |\n"
      out ++= "| --- | --- | --- | --- | --- | --- |\n"
      summary.sortBy(r => (r.getString(0), r.getString(1))).take(12)
        .foreach { r =>
          out ++= s"| ${r.getString(0)} | ${r.getString(1)} | ${r.get(2)} " +
            s"| ${r.get(3)} | ${r.get(4)} | ${r.get(5)} |\n"
        }
      if (summary.length > 12)
        out ++= s"| … (${summary.length - 12} more strata) |\n"

      out ++= "\n## Vocabulary shape (Zipf buckets)\n\n"
      out ++= "| log2-rank bucket | terms | occurrences | max cnt | min cnt |\n"
      out ++= "| --- | --- | --- | --- | --- |\n"
      CorpusOps.zipfPanel(docs).collect().sortBy(_.getLong(0)).foreach { r =>
        out ++= s"| ${r.getLong(0)} | ${r.getLong(1)} | ${r.getLong(2)} " +
          s"| ${r.getLong(3)} | ${r.getLong(4)} |\n"
      }

      val gopher = Curation.gopherRules(docs)
        .agg(count(lit(1)).as("n"),
          sum("keep_doc").as("keep"),
          sum("f_words").as("f_words"), sum("f_mwl").as("f_mwl"),
          sum("f_symbol").as("f_symbol"), sum("f_alpha").as("f_alpha"),
          sum("f_stop").as("f_stop"))
        .collect()(0)
      val n = gopher.getLong(0).max(1L)
      def pct(i: Int): String = f"${gopher.getLong(i) * 100.0 / n}%.1f%%"
      out ++= "\n## Gopher quality rules\n\n"
      out ++= s"- documents: ${gopher.getLong(0)}, keep: ${pct(1)}\n"
      out ++= s"- pass rates: word-count ${pct(2)}, mean-word-len ${pct(3)}, " +
        s"symbol-ratio ${pct(4)}, alpha-words ${pct(5)}, stop-words ${pct(6)}\n"

      val exact = Dedup.exact(docs)
        .agg(count(lit(1)).as("distinct"), sum("n_copies").as("total"))
        .collect()(0)
      out ++= "\n## Duplication\n\n"
      out ++= s"- exact: ${exact.getLong(1)} docs -> ${exact.getLong(0)} " +
        f"distinct texts (${(exact.getLong(1) - exact.getLong(0)) * 100.0 /
          exact.getLong(1).max(1L)}%.1f%% duplicate mass)\n"

      out ++= "\n## Topic clusters (hashed-TF KMeans)\n\n"
      out ++= "| cluster | docs | mean sq dist |\n| --- | --- | --- |\n"
      CorpusOps.topicClusters(docs)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), avg("sq_dist").as("msd"))
        .collect().sortBy(_.getLong(0)).foreach { r =>
          out ++= f"| ${r.getLong(0)} | ${r.getLong(1)} " +
            f"| ${r.getDouble(2)}%.0f |\n"
        }

      out ++= "\n## Median length by source (histogram sketch vs exact)\n\n"
      out ++= "| source | docs | sketch bucket | exact p50 |\n"
      out ++= "| --- | --- | --- | --- |\n"
      CorpusOps.quantileSketch(docs).collect()
        .sortBy(_.getString(0)).take(8).foreach { r =>
          out ++= s"| ${r.getString(0)} | ${r.getLong(1)} " +
            s"| [${r.getLong(3)}, ${r.getLong(4)}] | ${r.getLong(5)} |\n"
        }

      out ++= "\n## Median length by source (KLL level sample, " +
        "rank-error bound)\n\n"
      out ++= "| source | docs | kll est p50 | exact p50 | rank err " +
        "| 3-sigma bound |\n"
      out ++= "| --- | --- | --- | --- | --- | --- |\n"
      CorpusOps.kllSketch(docs).collect()
        .sortBy(_.getString(0)).take(8).foreach { r =>
          out ++= s"| ${r.getString(0)} | ${r.getLong(1)} " +
            s"| ${r.getLong(5)} | ${r.getLong(6)} | ${r.getLong(7)} " +
            s"| ${r.getLong(8)} |\n"
        }

      val embT = Tables.load(spark, sfDir, "embeddings")
      val pca2 = graft.llm.Similarity.pcaTop2(embT).collect()
      out ++= "\n## Embedding geometry (64-dim, unit-int8)\n\n"
      out ++= s"- top-2 principal variance shares: " +
        s"${pca2.head.getLong(3)} / ${pca2.head.getLong(4)} permille; " +
        s"cross-component cos^2 ${pca2.head.getLong(5)} ppm\n"
      val drift = graft.llm.Similarity.embeddingDrift(embT)
        .collect().head.getDouble(4)
      out ++= f"- even/odd cohort PSI over pc1 buckets: $drift%.6f " +
        "(>0.2 = investigate)\n\n"
      out ++= "| label | vecs | dominant dim | offdiag permille |\n"
      out ++= "| --- | --- | --- | --- |\n"
      graft.llm.Similarity.scatterByLabel(embT).collect()
        .sortBy(_.getLong(0)).foreach { r =>
          out ++= s"| ${r.getLong(0)} | ${r.getLong(1)} | ${r.getLong(3)} " +
            s"| ${r.getLong(4)} |\n"
        }

      out ++= "\n## Quality classifier calibration (teacher-distilled " +
        "GD model)\n\n"
      out ++= "| p decile | docs | mean predicted | empirical keep | gap |\n"
      out ++= "| --- | --- | --- | --- | --- |\n"
      Curation.classifierCalibration(docs).collect()
        .sortBy(_.getLong(0)).foreach { r =>
          out ++= s"| ${r.getLong(0)} | ${r.getLong(1)} | ${r.getLong(2)} " +
            s"| ${r.getLong(3)} | ${r.getLong(4)} |\n"
        }

      val kap = graft.llm.TextOps.labelKappa(docs).collect()
      out ++= "\n## Label quality (language-ID vs gold lang)\n\n"
      out ++= s"- raw agreement ${kap.head.getLong(6)} permille, " +
        s"Cohen's kappa ${kap.head.getLong(7)} permille " +
        "(chance-corrected)\n"

      val leak = graft.llm.Sampling.splitLeakage(docs).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
      out ++= "\n## Split hygiene\n\n"
      out ++= s"- exact dup classes crossing splits: ${leak("exact")._1} " +
        "(0 by construction of the content-hash split)\n"
      out ++= s"- canonical dup classes crossing splits: " +
        s"${leak("canonical")._1} (${leak("canonical")._2} docs at risk)\n"

      val kanon = Curation.kAnonymity(docs)
        .agg(sum("n_classes").as("c"), sum("n_small_classes").as("sc"),
          sum("total_docs").as("t"), sum("n_docs_at_risk").as("ar"))
        .collect()(0)
      out ++= "\n## Re-identification risk (k = 5 over lang x source x " +
        "length bucket)\n\n"
      out ++= s"- equivalence classes: ${kanon.getLong(0)}, below k: " +
        s"${kanon.getLong(1)}; docs at risk: ${kanon.getLong(3)} of " +
        s"${kanon.getLong(2)}\n"

      val parts = graft.core.Tables.load(spark, sfDir, "part")
      val golden = graft.ops.EntityOps.goldenRecords(parts)
      val ent = golden.agg(
        count(lit(1)).as("n_entities"),
        sum("n_listings").as("n_listings"),
        sum(expr("CAST(n_listings > 1 AS BIGINT)")).as("n_multi"))
        .collect()(0)
      out ++= "\n## Catalog entity resolution (part listings)\n\n"
      out ++= s"- ${ent.getLong(1)} listings resolve to " +
        s"${ent.getLong(0)} entities; ${ent.getLong(2)} entities carry " +
        "duplicate listings (blocked fuzzy match, edit distance <= 1)\n"

      out ++= "\n## Tokenizer fertility (trained BPE, tokens per word)\n\n"
      out ++= "| lang | bpe tokens | words | fertility |\n"
      out ++= "| --- | --- | --- | --- |\n"
      Curation.bpeFertility(docs,
          Curation.trainedMergesFor(spark, sfDir)).collect()
        .sortBy(_.getString(0)).foreach { r =>
          out ++= f"| ${r.getString(0)} | ${r.getLong(1)} | ${r.getLong(2)} " +
            f"| ${r.getLong(3) / 10000.0}%.4f |\n"
        }
      println(out.result())
    } finally spark.stop()
  }
}
