package graft.ops

import graft.core.Barrier.BarrierOps
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ENTITY RESOLUTION over structured records — the record-linkage /
  * survivorship pipeline (Fellegi-Sunter shape: block, compare, fuse)
  * that master-data and catalog teams run beside the document dedup
  * this engine already has. Text dedup asks "are these two documents
  * the same content"; entity resolution asks "are these two ROWS the
  * same real-world thing", with per-field comparators and a fused
  * golden record as the product.
  *
  * The part table is the catalog: 64 distinct names across 2000 rows
  * at sf0.01 means the base data carries NATURAL duplicate listings
  * (same name re-listed under different keys within a brand/type/size
  * block); a planted 1-in-25 slice of typo'd re-listings (the
  * multimodal planted-copy observability convention) exercises the
  * fuzzy comparator.
  *
  * Scale: the standard ER shape — a BLOCKED self-join (candidates
  * bounded by block sizes, never catalog x catalog) with the
  * Levenshtein verifier evaluated INSIDE the join stage, so only
  * (key, name, block) columns move; hot blocks are adaptively SALTED
  * (see [[pairsFrom]] — the bandedHammingPairs discipline, proven on
  * a planted 5k-listing block by `ScaleProbe entity`). Components
  * live inside a block by
  * construction, so the min-label propagation that turns pairs into
  * entities converges in a handful of rounds (diameter = name-variant
  * chain length, not corpus size).
  */
object EntityOps {

  private def part(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")

  /** Catalog with planted variant listings: 1-in-25 parts re-listed
    * under offset keys with a one-character name typo and a 50-cent
    * price drift. Deterministic, so the DuckDB oracle derives the
    * same corpus from the table.
    */
  private[graft] def withVariants(p: DataFrame): DataFrame =
    p.select("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
      .unionByName(p.filter(col("p_partkey") % 25 === 0).select(
        (col("p_partkey") + 10000000L).as("p_partkey"),
        concat(col("p_name"), lit("x")).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"),
        (col("p_retailprice") + 0.5).as("p_retailprice")))

  /** Blocked candidate join with adaptive HOT-BLOCK salting via the
    * shared [[Salting.saltedSides]] (which carries the exactly-once
    * pairing invariant, the probe re-spread, and — since round 15 —
    * the in-operator anti-coalescing pin, so the salt survives AQE
    * under a default session config; all proven on this operator's
    * planted 5k-listing block by `ScaleProbe entity`: unsalted 101 s
    * one-task vs 18 s salted in the shuffle-join regime).
    */
  private def pairsFrom(c: DataFrame, maxEdit: Int,
      saltTarget: Int = 1024): DataFrame = {
    val keyed = c.select(col("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"))
    val (probe, build) = Salting.saltedSides(keyed,
      Seq("p_brand", "p_type", "p_size"), col("p_partkey"), saltTarget)
    probe.as("a").join(build.as("b"),
      col("a.p_brand") === col("b.p_brand") &&
        col("a.p_type") === col("b.p_type") &&
        col("a.p_size") === col("b.p_size") &&
        col("a.salt") === col("b.salt") &&
        col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("part_a"),
        col("b.p_partkey").as("part_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("bigint")
          .as("name_edit"))
      .filter(col("name_edit") <= maxEdit)
  }

  /** Match pairs: same (brand, type, size) block AND name edit
    * distance <= maxEdit — exact re-listings score 0, planted typos 1.
    */
  def entityPairs(p: DataFrame, maxEdit: Int = 1,
      saltTarget: Int = 1024): DataFrame =
    pairsFrom(withVariants(p), maxEdit, saltTarget)

  val entityPairsSql: String =
    """WITH c AS (
      |  SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      |  UNION ALL
      |  SELECT p_partkey + 10000000, p_name || 'x', p_brand, p_type, p_size
      |  FROM part WHERE p_partkey % 25 = 0)
      |SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS name_edit
      |FROM c a JOIN c b
      |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
      |  AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 1""".stripMargin

  /** GOLDEN RECORDS: match pairs -> connected entities (min-label
    * propagation with pointer jumping, the dupClusters discipline —
    * loud failure if the cap is hit, which at block-bounded diameters
    * would take a pathological catalog) -> one fused row per entity:
    * survivor key/name (lowest key wins, the usual "oldest record"
    * rule), listing count, distinct-name count, and the price range
    * across the matched listings in exact cents — the fields a
    * master-data steward reviews before merging.
    */
  def goldenRecords(
      p: DataFrame, maxEdit: Int = 1, maxIters: Int = 8): DataFrame =
    goldenFrom(withVariants(p), maxEdit, maxIters)

  /** Fusion over an ALREADY-EXPANDED catalog (no variant planting) —
    * the core [[goldenRecords]] wraps, and the batch reference the
    * streaming [[graft.streaming.StatefulOps.goldenOnArrival]] spec
    * compares against on its own fixtures.
    */
  private[graft] def goldenFrom(
      cIn: DataFrame, maxEdit: Int = 1, maxIters: Int = 8): DataFrame = {
    val c = cIn.barrier() // pairs + fusion share it
    val pairs = pairsFrom(c, maxEdit).select("part_a", "part_b")
      .barrier() // referenced twice below (answer-sized)
    val edges = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"),
        col("part_a").as("dst")))
      .barrier()
    // shared min-label loop — see GraphOps.minLabelPropagation (one
    // copy of the convergence/checkpointing subtleties, serving this
    // and Dedup.dupClusters identically)
    val labels = graft.ops.GraphOps.minLabelPropagation(
      edges, maxIters, broadcastLabels = true)
    c.join(labels.withColumnRenamed("id", "p_partkey"),
      Seq("p_partkey"), "left")
      .select(coalesce(col("label"), col("p_partkey")).as("entity_id"),
        col("p_partkey"), col("p_name"),
        expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_listings"),
        countDistinct("p_name").as("n_names"),
        min_by(col("p_name"), col("p_partkey")).as("survivor_name"),
        min("cents").as("price_cents_lo"),
        max("cents").as("price_cents_hi"))
  }

  val goldenRecordsSql: String =
    """WITH RECURSIVE c AS (
      |  SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      |  FROM part
      |  UNION ALL
      |  SELECT p_partkey + 10000000, p_name || 'x', p_brand, p_type,
      |    p_size, p_retailprice + 0.5
      |  FROM part WHERE p_partkey % 25 = 0),
      |pairs AS (
      |  SELECT a.p_partkey AS part_a, b.p_partkey AS part_b
      |  FROM c a JOIN c b
      |    ON a.p_brand = b.p_brand AND a.p_type = b.p_type
      |    AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
      |  WHERE levenshtein(a.p_name, b.p_name) <= 1),
      |edges AS (
      |  SELECT part_a AS src, part_b AS dst FROM pairs
      |  UNION ALL SELECT part_b, part_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      |comp AS (SELECT id, min(r) AS entity_id FROM reach GROUP BY id),
      |lab AS (
      |  SELECT c.p_partkey, c.p_name,
      |    CAST(round(c.p_retailprice * 100, 0) AS BIGINT) AS cents,
      |    CAST(coalesce(comp.entity_id, c.p_partkey) AS BIGINT) AS entity_id
      |  FROM c LEFT JOIN comp ON c.p_partkey = comp.id)
      |SELECT entity_id, count(*) AS n_listings,
      |  count(DISTINCT p_name) AS n_names,
      |  arg_min(p_name, p_partkey) AS survivor_name,
      |  min(cents) AS price_cents_lo, max(cents) AS price_cents_hi
      |FROM lab GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entity_pairs" -> ((s, d) => entityPairs(part(s, d))),
    "q_entity_golden" -> ((s, d) => goldenRecords(part(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_entity_pairs" -> entityPairsSql,
    "q_entity_golden" -> goldenRecordsSql)
}
