package graft.tools

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 REHEARSAL CORPUS (round-15 verdict #7): derives a 10x database
  * from sf0.1 with the ScaleProbe replication discipline, so a bench
  * pass at "sf1" measures per-family scaling exponents the synthetic
  * vocabulary-saturated sf0.1 corpus can hide. Deterministic — replica
  * i (0..9) is the base database with every join KEY offset by
  * i*1e8 (replica 0 IS the original), so each replica is a disjoint
  * sub-database and every FK join's structure is preserved exactly.
  *
  * Content columns get the per-replica bijections the probes use, so
  * duplicate-detection structure scales LINEARLY instead of squaring
  * on cross-replica identical content (10 verbatim copies of each doc
  * would put 45 extra true pairs on every document — a corpus that is
  * 98% duplicate measures the pathological case, not scaling):
  *  - documents.text: per-replica token prefix (z<i>tok) — within-
  *    replica jaccard/shingle/winnow/minhash structure identical,
  *    cross-replica overlap exactly 0;
  *  - part.p_name: "<name> q<i><i>" suffix (>= 2 edits between any two
  *    replicas, >= 2 to the original) — ER blocks replicate without
  *    cross-replica fuzzy matches; p_brand stays, so brand-equality
  *    filters in the TPC-H analogs keep their selectivity;
  *  - embeddings.embedding: per-replica deterministic sign mask (flip
  *    component c iff bit (c mod 4) of i is set) — norms preserved,
  *    cross-replica cosine of a vector with its own copy drops from
  *    1.0 to <= 0.5, below every near-dup threshold in the suite.
  *
  * Dimension tables (region, nation) are NOT replicated — TPC-H scales
  * facts, not nations — and customer/supplier nation FKs stay valid.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [factor]
  * (defaults /root/testdata/sf0.1 target/sf1 10). Writes one parquet
  * dir per table, loadable by Tables.load like any sf dir.
  */
object ScaleUp {

  private val Off = 100000000L

  private def replicate(base: DataFrame, n: Int)(
      f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(i => f(base, i)).reduce(_ unionByName _)

  private def offset(df: DataFrame, i: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = Tables.load(spark, src, name)
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> $dst/$name.parquet")
    }
    // dimensions: verbatim
    write("region", t("region"))
    write("nation", t("nation"))
    // facts: disjoint key-offset replicas
    write("customer", replicate(t("customer"), n)(offset(_, _, "c_custkey")))
    write("supplier", replicate(t("supplier"), n)(offset(_, _, "s_suppkey")))
    write("part", replicate(t("part"), n) { (d, i) =>
      val keyed = offset(d, i, "p_partkey")
      if (i == 0) keyed
      else keyed.withColumn("p_name", concat(col("p_name"), lit(s" q$i$i")))
    })
    write("orders",
      replicate(t("orders"), n)(offset(_, _, "o_orderkey", "o_custkey")))
    write("lineitem", replicate(t("lineitem"), n)(
      offset(_, _, "l_orderkey", "l_partkey", "l_suppkey")))
    write("events",
      replicate(t("events"), n)(offset(_, _, "event_id", "user_id")))
    write("documents", replicate(t("documents"), n) { (d, i) =>
      val keyed = offset(d, i, "doc_id")
      if (i == 0) keyed
      else keyed.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"z$i$$1"))
    })
    write("embeddings", replicate(t("embeddings"), n) { (d, i) =>
      val keyed = offset(d, i, "vec_id")
      if (i == 0) keyed
      else keyed.withColumn("embedding",
        expr(s"transform(embedding, (x, c) -> " +
          s"IF((($i >> (c % 4)) & 1) = 1, -x, x))"))
    })
    spark.stop()
  }
}
