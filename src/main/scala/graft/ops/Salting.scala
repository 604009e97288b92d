package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adaptive HOT-BLOCK salting for blocked SELF-joins — the shared
  * carrier of an invariant that used to live in per-module copies
  * (bandedHammingPairs, EntityOps.pairsFrom): a duplicate-heavy block
  * puts n co-keyed rows in one bucket whose self-join emits n²/2 pairs
  * from ONE task, and AQE's skew split cannot help because it detects
  * byte-skew of join INPUTS while here the OUTPUT explodes.
  *
  * Scheme: blocks whose membership exceeds `saltTarget` split
  * deterministically — the probe side picks
  * pmod(xxhash64(probeKey), nsalt), the build side replicates across
  * all nsalt sub-buckets — so a join on blockCols + salt +
  * (probeKey < buildKey) still meets every unordered pair EXACTLY
  * once, and per-task candidates drop to ~n·saltTarget. Block sizes
  * come from a count-over-window (NOT a broadcast-joined aggregate:
  * the window's exchange is shared by both join sides, so any
  * expensive upstream computation — a media decode, a hash pass —
  * still runs once).
  *
  * Two measured lessons are baked in (round-14 entity probe):
  *  - The salt must reach the DATA DISTRIBUTION, not just the join
  *    key: the count window leaves the probe side partitioned by the
  *    block alone, which under a BROADCAST join put a whole planted
  *    5k-listing block in one task (81 s vs 5.8 s). The probe side is
  *    therefore re-spread by (blockCols, salt).
  *  - AQE partition COALESCING re-merges salt sub-buckets in the
  *    shuffle-join regime (it reads input bytes; the output explodes):
  *    measured salted peak == unsalted peak with coalescing on, and
  *    101 s -> 18 s with it off. Round 15 moved this from a caveat to
  *    CODE: the probe re-spread pins an EXPLICIT partition count
  *    (`repartition(n, cols)` -> shuffle origin REPARTITION_BY_NUM),
  *    which AQE's CoalesceShufflePartitions treats as
  *    user-specified — it skips the entire coalesce group containing
  *    that shuffle, so the join's salt sub-buckets survive under a
  *    DEFAULT session config (`ScaleProbe entity` proves the
  *    peak-task ratio with coalescing left on). Cost: salted joins
  *    always run at shuffle-partition parallelism even when tiny —
  *    exactly the trade a hot-block operator wants.
  *
  * Cold blocks pay nothing (nsalt = 1, probe salt 0, build explodes a
  * 1-element range). `saltTarget < 0` disables the window entirely and
  * restores the symmetric self-join. The nsalt cap (65536) only
  * coarsens the split: the build side materializes a sequence per row
  * before exploding.
  *
  * The prefix-rank threshold join and containment join carry a
  * ROLE-SWAPPED variant of this scheme (their fat side is the index,
  * so the index splits and the small probe replicates) — see
  * [[graft.llm.Dedup]]; this helper covers the symmetric self-join
  * shape.
  */
object Salting {

  /** Returns (probe, build), each `keyed` plus a `salt` column; join
    * them on blockCols + salt + an anti-reflexive key order.
    */
  def saltedSides(keyed: DataFrame, blockCols: Seq[String],
      probeKey: Column, saltTarget: Int): (DataFrame, DataFrame) = {
    require(saltTarget != 0, "saltTarget must be nonzero (negative disables)")
    if (saltTarget < 0) {
      val p = keyed.withColumn("salt", lit(0))
      (p, p)
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(blockCols.map(col): _*)
      val withN = keyed.withColumn("nsalt",
        when(count(lit(1)).over(w) > saltTarget,
          least(ceil(count(lit(1)).over(w).cast("double") / saltTarget),
            lit(65536)))
          .otherwise(lit(1)).cast("int"))
      // Explicit partition count = the session's shuffle parallelism:
      // REPARTITION_BY_NUM is the anti-coalescing pin (see scaladoc).
      val nPart = graft.core.Layout.shufflePartitions(keyed.sparkSession)
      (withN.withColumn("salt",
        pmod(xxhash64(probeKey), col("nsalt")).cast("int"))
        .repartition(nPart, (blockCols.map(col) :+ col("salt")): _*),
        withN.withColumn("salt",
          explode(sequence(lit(0), col("nsalt") - 1))))
    }
  }
}
